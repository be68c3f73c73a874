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

Modes (--mode=...):
  null     (default) NULL a strided slice of the nullable value columns
  edge     empty / whitespace-only / multibyte-UTF-8 text, empty event_type
  nan      IEEE NaN in events.value (aggregates skip NULL but propagate NaN)
  empty    zero-row tables with exact schema (pick victims via --tables;
           r10 ran events/documents/embeddings and lineitem/orders)
  emptydim zero-row DIMENSION tables (region/nation/customer/supplier/
           part) — flips broadcast sides and FK-join semantics (r11)
  ties     duplicate (user_id, ts) under distinct event_ids, duplicate
           doc texts under distinct doc_ids, duplicate embedding vectors
           under distinct ids — forces every ordering-tie path (r11)
  extreme  extreme numerics in events.value (-0.0, ±1e15, subnormal,
           +inf), NUL-byte and ~20 KB documents.text, overflow/unicode
           JSON in events.props — magnitude-absorb, sign-of-zero, and
           JSON-number-overflow asymmetries (r11)
  time     boundary timestamps in events.ts (1 µs before epoch, epoch
           0, leap day, year-end .999999) — date-function rounding and
           negative-epoch floor-division asymmetries (r11)
  vec      degenerate embedding VECTORS (all-zero → 0-norm cosine 0/0,
           NaN / +inf components, ±1e30 magnitudes, float32 subnormals)
           — similarity/clustering/quantization rank and NaN-score
           asymmetries (r11)
  money    extreme values in the TPC-H money/measure columns
           (lineitem.l_extendedprice ±1e15/-0.0/inf, l_discount > 1,
           l_quantity negative, orders.o_totalprice, customer.c_acctbal)
           — the relational revenue/stats paths the events-only extreme
           mode never reaches (r11)
  confuse  Unicode confusables + mixed-script documents.text (Cyrillic
           lookalikes, NFC-vs-NFD normalization twins, zero-width
           chars, RTL runs, combining-mark stacks, full-width Latin) —
           the shingle/token/lang-id/regex paths are byte-exact-or-
           diverge on exactly this class (r12)
  skew     hot-key skew: one mega-basket order in lineitem (every
           37th row's l_orderkey rewritten to the hottest key) and one
           mega-user in events (every 31st row's user_id) — exercises
           the C(k,2) in-array expansion, per-user windows, and
           sessionization on the skew shape the fixtures never draw
           (r12)
  hostile  scalar-battery hostile inputs: NUL-containing / separator-
           free customer.c_name values and lineitem.l_quantity at
           1e154 / -1e155 / -1.0 — the string-split and divisor
           assumptions ANSI mode turns into job-killers (r12)
  date     boundary DATEs in the RELATIONAL date columns (the time
           mode only reaches events.ts): year 0001, 9999-12-31,
           the 1582 Gregorian-gap week, pre-epoch, leap day — into
           lineitem.l_shipdate and orders.o_orderdate (r12)
  negkey   negative / ±2^62 events.user_id — integer division, modulo
           and overflow surfaces on signed keys (r12: zero finds —
           DuckDB's // and % are C-style truncation like Spark's
           div/%, pinned as canaries)
  monolabel every embeddings row in ONE cell — degenerate IVF layout:
           routing has a single candidate cell, label-blocked near-dup
           becomes a whole-corpus block, residual encoding collapses
           to x - global-mean (r14)
  uniqlabel every embeddings row its OWN cell — singleton cells:
           centroid == the vector, residuals all-zero (PQ fit on
           identical points → empty-cluster drop + pure tiebreak
           ranks), label blocks emit zero pairs (r14)

Streaming (r13): every injected dir also feeds the state-store RESTART
probe — stop mid-stream, resume from the checkpoint, compare against a
never-stopped run across all ten stateful operator families:

  python tools/null_probe.py /root/testdata/sf0.001 /tmp/p --mode=time
  python tools/stream_probe.py /tmp/p

Corrupt-container (footer) class (r13): NOT a fixture mode here, by
design — a corrupt fixture TABLE must fail queries loudly (garbage in a
query's input is a configuration error), while quarantine-and-report is
a PIPELINE contract. It is probed where the contract lives: q246 runs
byte-level footer corruption through the real migrate pipeline under
the driver's hash gate (queries/pipelines.py), pipelines/health.py
holds the scan, and tests/test_migrate.py + tests/test_compact.py pin
both pipelines' behavior (migrate: quarantine the file; compact: fail
only that partition, originals intact).
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

# --mode=emptydim: zero-row DIMENSION tables (r10 covered empty facts —
# lineitem/orders — and empty entity tables; empty dims flip broadcast
# sides, FK joins, and any denominator counted off the dim side).
DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]

# --mode=ties: duplicate-key/ordering-tie injection — the one asymmetry
# class value injection can't force. Equal ts WITHIN a user (distinct
# event_ids), duplicate doc texts under distinct doc_ids, duplicate
# embedding vectors under distinct ids: any window/rank/min_by/max_by/
# top-k cut whose ORDER BY lacks a full tie-break diverges between the
# engines only on data like this. Distinct primes per table.
TIE_EVENT_STRIDE = 41
TIE_DOC_STRIDE = 43
TIE_EMB_STRIDE = 47

# --mode=extreme: legal-but-extreme values the generators never draw.
# Doubles: -0.0 (sign-of-zero grouping/format), ±1e15 (any aggregate NOT
# going through the decimal-sum path absorbs neighbors and turns
# order-dependent — the probe makes the dsum discipline enforceable),
# 5e-324 (subnormal; underflows decimal scale 6 to exactly 0), +inf
# (propagates through sums where NULL/NaN semantics differ). Text: an
# embedded NUL byte (chars-vs-bytes and C-string truncation paths) and a
# ~20 KB repeated-token doc (shingle/token fan-out on one hot row).
# JSON: a number past double range (1e999 — engines disagree on inf vs
# NULL vs string passthrough) and a backslash-u0000 escape. Distinct primes.
EXTREME_EVENT_VALUE = {
    113: -0.0,
    127: 1e15,
    131: 5e-324,
    137: -1e15,
    139: float("inf"),
}
EXTREME_DOC_TEXT = {
    149: "pre\x00post nul byte doc",
    151: ("lorem ipsum repeated token block " * 600).strip(),  # ~19.8 KB
}
EXTREME_EVENT_PROPS = {
    157: '{"amount": 1e999, "note": "\\u0000 unicode \\u65e5"}',
}

# --mode=time: boundary instants. Negative epoch exercises every
# floor-division/date_trunc path on values < 0 (integer division
# truncates toward zero, calendar math floors — any site mixing the two
# diverges); epoch 0 is the time_bucket/week anchor; the leap day and
# the year-end .999999 µs hit calendar-edge truncation. All within the
# parquet MICROS range; distinct primes.
TIME_EVENT_TS = {
    163: "1969-12-31 23:59:59.999999",
    167: "2024-02-29 12:00:00",
    173: "2024-12-31 23:59:59.999999",
    179: "1970-01-01 00:00:00",
}

# --mode=vec: degenerate embedding vectors. The all-zero vector has
# norm 0 — cosine against it is 0/0 (NULL vs NaN vs crash is engine
# policy); a NaN/inf COMPONENT poisons dot products and then top-k
# ranking order (NaN sorts largest in both engines, but only if both
# PRODUCE NaN rather than NULL/error); ±1e30 magnitudes overflow
# float32 squares; 1e-40 is a float32 subnormal. Keys: transform mode
# (z=zero, n=NaN component, i=inf component, b=big, s=subnormal).
VEC_STRIDES = {
    53: "z",
    59: "n",
    61: "i",
    67: "b",
    71: "s",
    73: "e",  # element NULL — parquet lists carry per-element nulls
}

# --mode=money: the TPC-H fact/dim measures. These columns are NOT
# nullable in the schema contract, so NULL is out of scope — the probe
# plants legal-but-extreme doubles: huge magnitudes (the 2^53 class),
# -0.0, +inf (the decimal-crash class), a negative quantity (returns/
# corrections feed Benford/log/sqrt paths), and a discount > 1 (the
# revenue formula goes negative). Distinct primes per column.
MONEY_INJECT = {
    # table -> column -> {stride: value}
    "lineitem": {
        "l_extendedprice": {181: 1e15, 191: -0.0, 193: float("inf")},
        "l_discount": {197: 1.5},
        "l_quantity": {199: -7.0},
    },
    "orders": {
        "o_totalprice": {181: -1e15, 191: float("inf")},
    },
    "customer": {
        "c_acctbal": {97: 1e15, 101: float("inf"), 103: -0.0},
    },
}


# --mode=confuse: Unicode confusables and script-mixing in
# documents.text. The fixtures are pure ASCII, so every lower()/regex-
# split/length/substring assumption in the text family is untested on
# exactly the input class a real web corpus is full of. Values are
# REPLACEMENTS (like edge mode) at distinct primes:
#   - Cyrillic lookalikes inside Latin words (а=U+0430, е=U+0435,
#     о=U+043E) + a full-width Latin token — confusable dedup, lang-id
#     n-grams, [a-z] regex classes silently split these differently
#     than the eye expects;
#   - an NFC/NFD twin pair in ONE doc ("café" as U+00E9 then as
#     e+U+0301) — normalization-sensitive shingles/fingerprints and
#     char-vs-grapheme length;
#   - zero-width space/joiner/BOM inside tokens — tokenizers that split
#     on \s+ keep them glued, length() counts them;
#   - an RTL Hebrew/Arabic run mixed with Latin — script-boundary
#     tokenization;
#   - a combining-mark stack (zalgo) — many codepoints, few graphemes.
CONFUSE_DOC_TEXT = {
    211: "pаypаl sеcurity аlert frоm ＰＡＹＰＡＬ suppоrt dеsk",
    223: "café menu and café menu list the same item",
    227: "zero​width‍glued﻿tokens stay one word",
    229: "שלום mixed مرحبا with latin hello",
    233: "ź̴å͇ĺ̴g͇̊ó̴ marks stack deep",
}

# --mode=skew: hot-key rewrites. Primes chosen so the hot order's
# basket is ~n/37 lines (sf0.001: ~160 lines ≈ dozens of distinct
# brands → thousands of in-array pairs) and the hot user owns ~n/31
# events (one giant window partition / session chain).
SKEW_LINEITEM_STRIDE = 37
SKEW_EVENT_STRIDE = 31


# --mode=hostile: the r11-verdict item-7 canary class. c_name values
# break the fixtures' universal "Customer#<digits>" shape: embedded
# NUL bytes (length/regex/hash paths), a name with NO '#' separator
# (split_part part-2 is '' in DuckDB; plain element_at is an ANSI
# ArrayIndexOutOfBounds job-killer — found live), and double-'#'.
# l_quantity values: 1e154 (pow2 huge but finite), -1e155 (pow2
# overflows to +inf in both engines), -1.0 (quantity+1 divisor hits
# exact zero: ANSI DIVIDE_BY_ZERO job-killer — found live).
HOSTILE_CUSTOMER_NAME = {
    7: "Customer\x00#000000007",
    11: "\x00Customer#11",
    13: "Cust\x00omer#13x",
    17: "tail-nul\x00",
    19: "mid\x00dle#cut\x00#z",
}
HOSTILE_LINEITEM_QTY = {23: 1e154, 29: -1e155, 31: -1.0}


# --mode=date: boundary instants for the RELATIONAL date columns
# (timestamp[us] in the fixtures; the values exceed pandas' ns range,
# so injection goes through pyarrow like the nan/vec modes). Finds:
# Spark date_format renders years > 9999 as ISO-expanded '+10000-…'
# while DuckDB strftime emits '10000-…' — q26's add-then-format now
# declares the 4-digit-year domain (NULL beyond) on both sides.
DATE_BOUNDARY = {
    41: (1, 1, 1, 0, 0, 0),          # proleptic minimum year
    43: (9999, 12, 31, 23, 59, 59),  # last 4-digit-year instant
    47: (1582, 10, 5, 12, 0, 0),     # inside the Gregorian adoption gap
    53: (1969, 12, 31, 23, 0, 0),    # pre-epoch
    59: (2000, 2, 29, 0, 0, 0),      # leap day
}
DATE_COLUMNS = {"lineitem": "l_shipdate", "orders": "o_orderdate"}

# --mode=negkey: signed-key hostility in events.user_id. -1 and a
# negative prime exercise the %/div sign conventions (both engines are
# C-style truncation — verified, not assumed); ±2^62 sits one shift
# from int64 overflow for any key-scaling expression.
NEGKEY_USER_ID = {61: -1, 67: -1000003, 71: -(2**62), 73: 2**62}


def inject_ties(df: pd.DataFrame, table: str, scale: int) -> tuple[pd.DataFrame, int]:
    """Copy a key value from the PREVIOUS row (same user for events) onto
    strided rows, creating exact duplicates under distinct ids."""
    df = df.copy()
    if table == "events":
        # ts := previous event's ts for the SAME user -> duplicate
        # (user_id, ts) pairs with distinct event_ids.
        prev_ts = df.groupby("user_id")["ts"].shift(1)
        mask = prev_ts.notna()
        mask &= pd.Series(df.index % (TIE_EVENT_STRIDE * scale) == 0, index=df.index)
        df.loc[mask, "ts"] = prev_ts[mask]
        return df, int(mask.sum())
    col, stride = ("text", TIE_DOC_STRIDE) if table == "documents" else (
        "embedding", TIE_EMB_STRIDE)
    prev = df[col].shift(1)
    mask = prev.notna() if table == "documents" else prev.map(
        lambda v: v is not None and not isinstance(v, float))
    mask &= pd.Series(df.index % (stride * scale) == 0, index=df.index)
    df.loc[mask, col] = prev[mask]
    return df, int(mask.sum())

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

    if mode == "emptydim" and tables == ["events", "documents", "embeddings"]:
        # Default target set for the dim mode is the dim tables.
        tables = list(DIM_TABLES)
    if mode == "skew" and tables == ["events", "documents", "embeddings"]:
        # Default target set for the skew mode is the hot-key tables.
        tables = ["lineitem", "events"]
    if mode == "hostile" and tables == ["events", "documents", "embeddings"]:
        tables = ["customer", "lineitem"]
    if mode == "date" and tables == ["events", "documents", "embeddings"]:
        tables = list(DATE_COLUMNS)

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
        if mode in ("empty", "emptydim") and t in tables:
            # Zero-row tables with the EXACT source schema (a pandas
            # empty write degrades object columns to null types and
            # every string function binder-errors — use pyarrow).
            import pyarrow.parquet as pq

            tab = pq.read_table(s)
            pq.write_table(tab.slice(0, 0), d)
            print(f"{t}: emptied (schema preserved)")
        elif mode == "ties" and t in ("events", "documents", "embeddings") and t in tables:
            df, n_ties = inject_ties(pd.read_parquet(s), t, scale)
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, {n_ties} tie rows injected")
        elif mode == "nan" and t == "events" and t in tables:
            # pandas' parquet writer converts float NaN to NULL (NaN is
            # pandas' missing marker) — the r10 nan sweeps silently
            # probed NULLs, not NaN (r11 find). Go through pyarrow with
            # from_pandas=False so real IEEE NaNs reach the file.
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq

            tab = pq.read_table(s)
            v = tab.column("value").to_numpy(zero_copy_only=False).copy()
            idx = list(range(0, len(v), NAN_EVENT_VALUE_STRIDE * scale))
            v[idx] = np.nan
            arr = pa.array(v, from_pandas=False)
            assert arr.null_count == 0, "NaN must stay NaN, not NULL"
            tab = tab.set_column(
                tab.schema.get_field_index("value"), "value", arr
            )
            pq.write_table(tab, d)
            print(f"{t}: {len(v)} rows, true-NaN value on {len(idx)} rows")
        elif mode == "edge" and t in edge_by_table and t in tables:
            col, values = edge_by_table[t]
            df = inject_edges(pd.read_parquet(s), col, values, scale)
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, edge-injected {col} at strides "
                  f"{sorted(values)}")
        elif mode == "money" and t in MONEY_INJECT:
            df = pd.read_parquet(s)
            hits = []
            for col, plan in MONEY_INJECT[t].items():
                for stride, value in plan.items():
                    idx = df.index[:: stride * scale]
                    df.loc[idx, col] = value
                    hits.append(f"{col}@{stride}")
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, money-injected {hits}")
        elif mode == "time" and t == "events" and t in tables:
            df = pd.read_parquet(s)
            for stride, iso in TIME_EVENT_TS.items():
                idx = df.index[:: stride * scale]
                df.loc[idx, "ts"] = pd.Timestamp(iso)
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, boundary ts at strides "
                  f"{sorted(TIME_EVENT_TS)}")
        elif (
            mode in ("monolabel", "uniqlabel")
            and t == "embeddings"
            and t in tables
        ):
            df = pd.read_parquet(s)
            dt = df["label"].dtype
            if mode == "monolabel":
                df["label"] = df["label"].iloc[0] if len(df) else 0
            else:
                df["label"] = df["vec_id"]
            df["label"] = df["label"].astype(dt)
            df.to_parquet(d, index=False)
            print(
                f"{t}: {len(df)} rows, label -> "
                f"{df['label'].nunique()} distinct cell(s)"
            )
        elif mode == "vec" and t == "embeddings" and t in tables:
            # pyarrow path: pandas' writer converts NaN to NULL even
            # inside LIST elements (the r11 nan-mode find), so the
            # NaN/inf kinds must bypass pandas to reach the file.
            import math

            import pyarrow as pa
            import pyarrow.parquet as pq

            tab = pq.read_table(s)
            vecs = tab.column("embedding").to_pylist()
            n_hit = 0
            for stride, kind in VEC_STRIDES.items():
                for i in range(0, len(vecs), stride * scale):
                    v = [float(x) for x in vecs[i]]
                    if kind == "z":
                        v = [0.0] * len(v)
                    elif kind == "n":
                        v[0] = math.nan
                    elif kind == "i":
                        v[0] = math.inf
                    elif kind == "b":
                        v = [1e30 if x >= 0 else -1e30 for x in v]
                    elif kind == "s":
                        v = [1e-40] * len(v)  # float32 subnormal
                    elif kind == "e":
                        v[0] = None
                    vecs[i] = v
                    n_hit += 1
            arr = pa.array(
                vecs, type=pa.list_(pa.float32()), from_pandas=False
            )
            assert any(
                x is not None and math.isnan(x)
                for vrow in arr.to_pylist()
                for x in (vrow or [])
            ), "true NaN components must reach the file"
            tab = tab.set_column(
                tab.schema.get_field_index("embedding"), "embedding", arr
            )
            pq.write_table(tab, d)
            print(f"{t}: {len(vecs)} rows, {n_hit} degenerate vectors "
                  f"({sorted(VEC_STRIDES.values())})")
        elif mode == "extreme" and t in ("events", "documents") and t in tables:
            df = pd.read_parquet(s)
            if t == "events":
                df = inject_edges(df, "value", EXTREME_EVENT_VALUE, scale)
                df = inject_edges(df, "props", EXTREME_EVENT_PROPS, scale)
                strides = sorted(EXTREME_EVENT_VALUE) + sorted(EXTREME_EVENT_PROPS)
            else:
                df = inject_edges(df, "text", EXTREME_DOC_TEXT, scale)
                strides = sorted(EXTREME_DOC_TEXT)
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, extreme-injected at strides {strides}")
        elif mode == "negkey" and t == "events" and t in tables:
            df = pd.read_parquet(s)
            for stride, v in NEGKEY_USER_ID.items():
                df.loc[df.index[:: stride * scale], "user_id"] = v
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, signed user_id at strides "
                  f"{sorted(NEGKEY_USER_ID)}")
        elif mode == "date" and t in DATE_COLUMNS and t in tables:
            # pyarrow path: the year-1/9999 instants overflow pandas'
            # datetime64[ns]; build the timestamp[us] array directly.
            from datetime import datetime

            import pyarrow as pa
            import pyarrow.parquet as pq

            tab = pq.read_table(s)
            col = DATE_COLUMNS[t]
            vals = tab.column(col).to_pylist()
            n_hit = 0
            for stride, parts in DATE_BOUNDARY.items():
                for i in range(0, len(vals), stride * scale):
                    vals[i] = datetime(*parts)
                    n_hit += 1
            arr = pa.array(vals, type=pa.timestamp("us"))
            tab = tab.set_column(tab.schema.get_field_index(col), col, arr)
            pq.write_table(tab, d)
            print(f"{t}: {len(vals)} rows, boundary {col} on {n_hit} hits")
        elif mode == "hostile" and t in ("customer", "lineitem") and t in tables:
            df = pd.read_parquet(s)
            col, plan = (
                ("c_name", HOSTILE_CUSTOMER_NAME)
                if t == "customer"
                else ("l_quantity", HOSTILE_LINEITEM_QTY)
            )
            for stride, value in plan.items():
                df.loc[df.index[:: stride * scale], col] = value
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, hostile {col} at strides "
                  f"{sorted(plan)}")
        elif mode == "confuse" and t == "documents" and t in tables:
            df = inject_edges(pd.read_parquet(s), "text", CONFUSE_DOC_TEXT, scale)
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, confusable-injected text at strides "
                  f"{sorted(CONFUSE_DOC_TEXT)}")
        elif mode == "skew" and t in ("lineitem", "events") and t in tables:
            df = pd.read_parquet(s)
            key, stride = (
                ("l_orderkey", SKEW_LINEITEM_STRIDE)
                if t == "lineitem"
                else ("user_id", SKEW_EVENT_STRIDE)
            )
            # Hot key := the source's already-most-frequent key, so the
            # rewrite keeps referential integrity (the key exists in the
            # parent table) while concentrating ~1/stride of all rows.
            hot = df[key].mode().iloc[0]
            idx = df.index[:: stride * scale]
            df.loc[idx, key] = hot
            df.to_parquet(d, index=False)
            print(f"{t}: {len(df)} rows, {len(idx)} rows rewritten to hot "
                  f"{key}={hot}")
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
