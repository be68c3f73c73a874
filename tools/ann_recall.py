"""Measure ANN recall@k against brute-force ground truth (dev tool).

The engine's ANN tiers trade exactness for scale: IVF prunes cells
(q45/q253), PQ compresses vectors to codes (q251), residual encoding
tightens the quantized distribution (q256). The oracle gate proves each
tier computes ITS OWN contract bit-exactly; this audit measures the
QUALITY ladder those contracts imply — recall@k of each tier's top-k
against the exact L2 top-k — so "residual beats flat PQ at equal code
budget" is a recorded number, not a docstring claim.

The models mirror the engine operators' semantics (subspace split,
k-codeword Lloyd fitted with 2 iterations from the first-k-ids init,
top-nprobe cell routing by L2, LUT scoring; q256's codebooks fit on
x - centroid[cell] with the LUT per (query, probed cell)) in numpy
float64 — the engine's decimal/round-6 determinism conventions are
deliberately omitted: they exist for oracle reproducibility and move
recall by nothing measurable.

Usage:
  python tools/ann_recall.py /root/testdata/sf0.01            # both configs
  python tools/ann_recall.py /root/testdata/sf0.01 --k 10 --queries 64
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pyarrow.parquet as pq


def load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    x = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    finite = np.isfinite(x).all(axis=1) & (np.abs(x) < 1e15).all(axis=1)
    usable = finite & (x != 0).any(axis=1)
    return (
        t["vec_id"].to_numpy()[usable],
        t["label"].to_numpy()[usable],
        x[usable],
    )


def lloyd(x: np.ndarray, k: int, iters: int = 2) -> np.ndarray:
    """First-k-rows init (ids are sorted), `iters` mean updates — the
    engine's kmeans_fit shape."""
    c = x[:k].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = x[m].mean(axis=0)
    return c


def pq_fit(x: np.ndarray, m: int, k: int):
    """Split into m equal subspaces, fit k codewords each; return
    (codebooks, codes)."""
    d = x.shape[1] // m
    books, codes = [], []
    for s in range(m):
        sub = x[:, s * d : (s + 1) * d]
        c = lloyd(sub, k)
        books.append(c)
        codes.append(
            ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        )
    return books, np.stack(codes, axis=1)


def adc(qsub: list[np.ndarray], books, codes) -> np.ndarray:
    """Asymmetric distances: sum over subspaces of ||q_s - c_{s,code}||²."""
    out = np.zeros(codes.shape[0])
    for s, b in enumerate(books):
        lut = ((qsub[s][None, :] - b) ** 2).sum(axis=1)
        out += lut[codes[:, s]]
    return out


def recall_at_k(approx_rank_ids, truth_ids) -> float:
    return len(set(approx_rank_ids) & set(truth_ids)) / len(truth_ids)


def audit(
    sf_dir: str,
    n_queries: int,
    k: int,
    m: int,
    kc: int,
    nprobe: int,
    cell_mode: str = "label",
):
    ids, labels, x = load(sf_dir)
    n, d = x.shape
    qidx = np.arange(min(n_queries, n))
    if cell_mode == "kmeans":
        # Production cells: Lloyd on the vectors themselves. The fixture
        # `label` column is assignment-arbitrary (no geometric meaning),
        # so residuals against label centroids don't concentrate —
        # kmeans cells are the shape a real IVF index builds and the one
        # where residual encoding pays.
        cents = lloyd(x, len(np.unique(labels)), iters=5)
        d2c = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        labels = d2c.argmin(axis=1)
    cells = np.unique(labels)
    cents = np.stack([x[labels == c].mean(axis=0) for c in cells])
    dsub = d // m

    # Ground truth: exact L2 top-k excluding self.
    def truth(qi):
        d2 = ((x - x[qi]) ** 2).sum(axis=1)
        d2[qi] = np.inf
        return ids[np.argsort(d2, kind="stable")[:k]]

    # Flat PQ and residual PQ codebooks at the SAME code budget.
    books_f, codes_f = pq_fit(x, m, kc)
    resid = x - cents[np.searchsorted(cells, labels)]
    books_r, codes_r = pq_fit(resid, m, kc)

    rec = {t: [] for t in ("ivf", "pq_flat", "ivfpq_flat", "ivfpq_resid")}
    for qi in qidx:
        t_ids = truth(qi)
        qc2 = ((cents - x[qi]) ** 2).sum(axis=1)
        probed = cells[np.argsort(qc2, kind="stable")[:nprobe]]
        in_cell = np.isin(labels, probed)
        in_cell[qi] = False

        # IVF: exact L2 within probed cells.
        d2 = ((x - x[qi]) ** 2).sum(axis=1)
        d2_ivf = np.where(in_cell, d2, np.inf)
        rec["ivf"].append(
            recall_at_k(ids[np.argsort(d2_ivf, kind="stable")[:k]], t_ids)
        )

        # Flat PQ over the whole corpus.
        qsub = [x[qi][s * dsub : (s + 1) * dsub] for s in range(m)]
        a = adc(qsub, books_f, codes_f)
        a[qi] = np.inf
        rec["pq_flat"].append(
            recall_at_k(ids[np.argsort(a, kind="stable")[:k]], t_ids)
        )

        # IVF+PQ flat (q253): flat codes restricted to probed cells.
        a_cell = np.where(in_cell, a, np.inf)
        rec["ivfpq_flat"].append(
            recall_at_k(ids[np.argsort(a_cell, kind="stable")[:k]], t_ids)
        )

        # IVF+PQ residual (q256): residual codes, LUT per probed cell.
        a_res = np.full(n, np.inf)
        for c in probed:
            mask = (labels == c) & in_cell
            if not mask.any():
                continue
            qr = x[qi] - cents[np.searchsorted(cells, c)]
            qrs = [qr[s * dsub : (s + 1) * dsub] for s in range(m)]
            a_res[mask] = adc(qrs, books_r, codes_r[mask])
        rec["ivfpq_resid"].append(
            recall_at_k(ids[np.argsort(a_res, kind="stable")[:k]], t_ids)
        )

    row = {
        "config": f"m={m} kc={kc} nprobe={nprobe} cells={cell_mode}",
        "n_vectors": int(n),
        "n_cells": int(len(cells)),
        "queries": int(len(qidx)),
        "k": k,
    }
    for t, vals in rec.items():
        row[f"recall@{k}_{t}"] = round(float(np.mean(vals)), 4)
    print(json.dumps(row))
    return row


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        raise SystemExit(__doc__.strip().split("Usage:")[1])
    flags = dict(
        zip(
            [a.lstrip("-") for a in sys.argv[1:] if a.startswith("--")],
            [
                sys.argv[i + 1]
                for i, a in enumerate(sys.argv[:-1])
                if a.startswith("--")
            ],
        )
    )
    k = int(flags.get("k", 10))
    nq = int(flags.get("queries", 64))
    # Engine config (2 subspaces x 4 codewords, nprobe 2, fixture label
    # cells — q251/q253/q256's declared shape) and the scale config the
    # docstrings point to (wider code budget, kmeans cells — the shape
    # a production IVF index builds).
    rows = [
        audit(args[0], nq, k, m=2, kc=4, nprobe=2, cell_mode="label"),
        audit(args[0], nq, k, m=8, kc=16, nprobe=4, cell_mode="label"),
        audit(args[0], nq, k, m=2, kc=4, nprobe=2, cell_mode="kmeans"),
        audit(args[0], nq, k, m=8, kc=16, nprobe=4, cell_mode="kmeans"),
    ]
    worse = [
        cfg["config"]
        for cfg in rows
        if cfg[f"recall@{k}_ivfpq_resid"] < cfg[f"recall@{k}_ivfpq_flat"]
    ]
    print(
        f"\n=== ANN RECALL === residual>=flat in "
        f"{len(rows) - len(worse)}/{len(rows)} configs"
        + (f"  (worse: {worse})" if worse else "")
    )


if __name__ == "__main__":
    main()
