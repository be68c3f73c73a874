"""Build a NULL-injected copy of a fixture dir for differential probing.

The driver's fixtures contain ZERO NULLs in the nullable business columns
(events.event_type/value/props, documents.text/lang/source), so any
Spark-vs-oracle NULL-semantics asymmetry is invisible to every existing
gate — ADVICE r9 found exactly one such latent divergence (q239's
uniform-seed denominator counted a NULL source state in DuckDB but not in
the driver-side fold). This tool makes that bug class sweepable: it
copies a fixture dir and deterministically NULLs a slice of each nullable
column IN PLACE (mid-sequence, so lead/lag windows straddle the NULLs),
then the standard sweeps run against the copy:

  python tools/null_probe.py /root/testdata/sf0.001 /tmp/nullprobe
  python tools/vanilla_sweep.py /tmp/nullprobe            # full compare

Both engines read the SAME injected parquet, so every reported mismatch
is a genuine engine-semantics divergence, never fixture noise. Strides
are primes so multi-column NULLs coincide on some rows (compound-NULL
rows exercised too).

Flags: --tables events,documents,embeddings (default: all three); --stride N scales all
strides (default 1 = ~1-1.5% of rows per column).
"""

from __future__ import annotations

import os
import shutil
import sys

import pandas as pd

# column -> prime stride (row_index % stride == 0 gets NULL).
EVENT_STRIDES = {"event_type": 67, "value": 71, "props": 73}
DOC_STRIDES = {"text": 79, "lang": 83, "source": 89}
EMB_STRIDES = {"embedding": 61}

# --mode=edge: non-NULL degenerate values. Empty text, whitespace-only
# text, and multibyte UTF-8 (chars != bytes — the fixtures are pure
# ASCII, so every char-vs-byte length assumption is untested), plus an
# empty event_type. Distinct primes so each value lands on its own rows.
EDGE_DOC_TEXT = {
    97: "",
    101: "   ",
    103: "héllo wörld 日本語 text \U0001f642",
}
EDGE_EVENT_TYPE = {107: ""}

# --mode=nan: IEEE NaN planted in float value columns — distinct from
# NULL (SQL aggregates SKIP NULL but PROPAGATE NaN; ordering treats NaN
# as largest in both engines, but canon and round/comparison paths may
# not agree).
NAN_EVENT_VALUE_STRIDE = 109

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def inject(df: pd.DataFrame, strides: dict[str, int], scale: int) -> pd.DataFrame:
    df = df.copy()
    for col, stride in strides.items():
        idx = df.index[:: stride * scale]
        df.loc[idx, col] = None
    return df


def inject_edges(
    df: pd.DataFrame, col: str, values: dict[int, str], scale: int
) -> pd.DataFrame:
    df = df.copy()
    for stride, value in values.items():
        idx = df.index[:: stride * scale]
        df.loc[idx, col] = value
    return df


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/root/testdata/sf0.001"
    dst = args[1] if len(args) > 1 else "/tmp/nullprobe"
    tables = ["events", "documents", "embeddings"]
    scale = 1
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            tables = a.split("=", 1)[1].split(",")
        if a.startswith("--stride="):
            scale = int(a.split("=", 1)[1])

    mode = "null"
    for a in sys.argv[1:]:
        if a.startswith("--mode="):
            mode = a.split("=", 1)[1]

    os.makedirs(dst, exist_ok=True)
    strides_by_table = {
        "events": EVENT_STRIDES,
        "documents": DOC_STRIDES,
        "embeddings": EMB_STRIDES,
    }
    edge_by_table = {
        "events": ("event_type", EDGE_EVENT_TYPE),
        "documents": ("text", EDGE_DOC_TEXT),
    }
    for t in TABLES:
        s, d = os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet")
        if mode == "empty" and t in tables:
            # Zero-row tables with the EXACT source schema (a pandas
            # empty write degrades object columns to null types and
            # every string function binder-errors — use pyarrow).
            import pyarrow.parquet as pq

            tab = pq.read_table(s)
            pq.write_table(tab.slice(0, 0), d)
            print(f"{t}: emptied (schema preserved)")
        elif mode == "nan" and t == "events" and t in tables:
            df = pd.read_parquet(s)
            idx = df.index[:: NAN_EVENT_VALUE_STRIDE * scale]
            df.loc[idx, "value"] = float("nan")
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, NaN value on {len(idx)} rows")
        elif mode == "edge" and t in edge_by_table and t in tables:
            col, values = edge_by_table[t]
            df = inject_edges(pd.read_parquet(s), col, values, scale)
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, edge-injected {col} at strides "
                  f"{sorted(values)}")
        elif mode == "null" and t in tables and t in strides_by_table:
            df = inject(pd.read_parquet(s), strides_by_table[t], scale)
            nulls = {c: int(df[c].isna().sum()) for c in strides_by_table[t]}
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, injected NULLs {nulls}")
        else:
            shutil.copyfile(s, d)
    print(f"wrote {dst} — probe with: python tools/vanilla_sweep.py {dst}")


if __name__ == "__main__":
    main()
