"""Regenerate COVERAGE.md's per-query table from CORRECTNESS_r*.json.

The prose sections (round outcomes, next-window plan) stay hand-written;
everything below the ``## Per-query driver history`` marker is replaced
with a table compiled from the driver's own correctness records, so the
table can never drift from the facts again.

Usage: python tools/update_coverage.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Per-query driver history"


def load_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        with open(p) as fh:
            rounds[int(m.group(1))] = json.load(fh)
    return rounds


def third_engine_models(queries) -> dict[str, str]:
    """query name -> comma-joined third-engine test files mentioning it
    (the VERDICT r8 grep proxy, made a generated ledger column). A
    mention means the file re-derives (or directly pins) that query's
    output without the repo's SQL; absence means only the Spark↔DuckDB
    shared-SQL tiers cover it.

    Matches are token-classified: the short ``qNN`` form counts only
    inside STRING/COMMENT tokens (docstring references like "q81's
    definition"), never as a bare code identifier — a local variable
    that happens to be named ``q15`` must not credit q15 with a model
    (a committed false ledger entry the r9 code review caught). The
    full query name counts anywhere."""
    import io
    import tokenize

    hits: dict[str, set] = {q: set() for q in queries}
    for p in sorted(glob.glob(os.path.join(REPO, "tests", "test_third_engine_*.py"))):
        with open(p) as fh:
            text = fh.read()
        prose = " ".join(
            tok.string
            for tok in tokenize.generate_tokens(io.StringIO(text).readline)
            if tok.type in (tokenize.STRING, tokenize.COMMENT)
        )
        short = os.path.basename(p)[len("test_third_engine_"):-3]
        for q in queries:
            prefix = q.split("_")[0]  # qNN
            if q in text or re.search(rf"\b{prefix}\b", prose):
                hits[q].add(short)
    return {q: ",".join(sorted(s)) for q, s in hits.items()}


def main() -> None:
    from hadoop_trans_spark.queries import QUERIES

    rounds = load_rounds()
    history: dict[str, list[tuple[int, str]]] = {}
    # Iterate by numeric round so history rows (and the "latest" cell)
    # stay correct even if filenames stop zero-padding (r10 vs r2).
    for rnd in sorted(rounds):
        data = rounds[rnd]
        for name, row in data.items():
            ok = bool(
                row.get("hash_match")
                or (row.get("rows_match") and row.get("oracle_rows") is None)
            )
            status = "green" if ok else "RED"
            history.setdefault(name, []).append((rnd, status))

    t3 = third_engine_models(list(QUERIES))
    lines = [
        MARKER,
        "",
        "| # | query | driver rows | latest | third-engine |",
        "|---|---|---|---|---|",
    ]
    n_green = n_never = 0
    for i, name in enumerate(QUERIES, 1):
        h = history.get(name, [])
        if not h:
            n_never += 1
            cells = ("—", "never checked")
        else:
            if any(s == "green" for _, s in h):
                n_green += 1
            cells = (
                ", ".join(f"r{r}:{s}" for r, s in h),
                f"r{h[-1][0]} {h[-1][1]}",
            )
        lines.append(
            f"| {i} | {name} | {cells[0]} | {cells[1]} | {t3[name] or '—'} |"
        )
    orphans = sorted(set(history) - set(QUERIES))
    if orphans:
        lines += [
            "",
            "Orphan CORRECTNESS records (driver rows whose query name is "
            "no longer registered — renamed/removed queries; their history "
            "must not silently vanish):",
        ]
        lines += [
            f"- {name}: " + ", ".join(f"r{r}:{s}" for r, s in history[name])
            for name in orphans
        ]
    n_t3 = sum(1 for v in t3.values() if v)
    unmodeled = sorted(q for q, v in t3.items() if not v)
    lines += [
        "",
        f"Totals: {len(QUERIES)} declared — {n_green} ever-green, "
        f"{n_never} never driver-checked, "
        f"{len(QUERIES) - n_green - n_never} checked-but-never-green"
        + (f"; {len(orphans)} orphan record(s) listed above." if orphans else "."),
        "",
        f"Third-engine ledger: {n_t3}/{len(QUERIES)} queries have an "
        "independent non-SQL model in tests/test_third_engine_*.py"
        + (
            f"; without a model: {', '.join(unmodeled)}."
            if unmodeled
            else "; every declared query is modeled."
        ),
        "",
    ]

    # Latest-green vintage histogram: how stale is each query's newest
    # green driver row? The re-confirmation target is "no green older
    # than 3 rounds"; this section makes that checkable at a glance.
    latest_green: dict[str, int] = {}
    for name in QUERIES:
        greens = [r for r, s in history.get(name, []) if s == "green"]
        if greens:
            latest_green[name] = max(greens)
    if latest_green:
        newest = max(max(rounds), max(latest_green.values()))
        hist: dict[int, int] = {}
        for r in latest_green.values():
            hist[r] = hist.get(r, 0) + 1
        lines += [
            "## Latest-green vintage histogram",
            "",
            "| latest green round | queries | age (rounds) |",
            "|---|---|---|",
        ]
        lines += [
            f"| r{r} | {hist[r]} | {newest - r} |" for r in sorted(hist)
        ]
        over = sorted(
            n for n, r in latest_green.items() if newest - r > 3
        )
        lines += [
            "",
            f"Re-confirmation target: no green older than 3 rounds — "
            + (
                f"{len(over)} over target: " + ", ".join(over)
                if over
                else "met (0 over target)."
            ),
            "",
        ]

    path = os.path.join(REPO, "COVERAGE.md")
    with open(path) as fh:
        head = fh.read().split(MARKER)[0].rstrip()
    with open(path, "w") as fh:
        fh.write(head + "\n\n" + "\n".join(lines))
    print(f"COVERAGE.md: {len(QUERIES)} queries, {n_green} ever-green, {n_never} never checked")


if __name__ == "__main__":
    main()
