"""Query registry + cross-engine determinism helpers.

The driver's t2 gate runs each ``QUERIES[name]`` on Spark and the matching
``ORACLE[name]`` on DuckDB over the same parquet, then compares row count,
schema, and an order-insensitive value hash (columns sorted by name). The
helpers below exist to make Spark and DuckDB produce *bitwise identical*
values:

  * Money/double aggregates: sum in DECIMAL(38,6) (exact, order-independent)
    then round+cast back to double — float summation order can differ
    between engines and between Spark task schedules, decimals cannot.
  * Timestamps: compared as epoch-microseconds (bigint) or formatted
    strings, never as raw timestamp values (naive-vs-UTC repr differs).
  * Arrays: joined to strings after an explicit sort where order is not
    semantic.
  * Every query ends with a deterministic ORDER BY on a key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --- determinism helpers (Spark side) ---------------------------------------

DEC = "decimal(38,6)"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent sum of a double column, returned as double.

    Decimal addition is exact, so the result is identical regardless of
    partitioning / AQE decisions / engine — unlike naive double summation.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent average of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(DEC)) / F.count(c), scale
    ).cast("double")


def ts_micros(col: Column | str) -> Column:
    """Timestamp → epoch microseconds (bigint); DuckDB: epoch_us(ts).

    Parquet timestamps without timezone load as TIMESTAMP_NTZ, which
    unix_micros rejects; with the session pinned to UTC the cast to
    TIMESTAMP preserves the wall-clock instant exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ts_day(col: Column | str) -> Column:
    """Timestamp → 'yyyy-MM-dd' string; DuckDB: strftime(ts, '%Y-%m-%d')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


# DuckDB-side fragments mirroring the helpers above.
def o_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,6))), {scale}) AS DOUBLE)"


def o_davg(expr: str, scale: int = 6, count: str | None = None) -> str:
    """Exact HALF_UP decimal mean — DuckDB's `/` on a decimal goes
    through DOUBLE (4797.0070425/80 evaluates to …2499999 and ROUND
    drops the tie) while Spark's decimal division is exact with HALF_UP
    at scale 6, so a mean landing exactly on a .5 tie at the output
    scale diverges between the engines (r10 edge-probe find on q159;
    the tie class is data-dependent, not NULL/edge-specific). Computed
    integer-side instead: the DECIMAL(38,6) sum is exactly
    Si·10⁻⁶ with Si a HUGEINT, and HALF_UP(N/n) for N ≥ 0 is
    (2N + n) // (2n) — bit-exact, no double anywhere until the final
    correctly-rounded cast."""
    assert scale >= 6
    n = count or f"COUNT({expr})"
    si = f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) * 1000000 AS HUGEINT)"
    num = si if scale == 6 else f"({si} * {10 ** (scale - 6)})"
    cnt = f"CAST({n} AS HUGEINT)"
    half_up = (
        f"(CASE WHEN {num} >= 0 THEN (2*{num} + {cnt}) // (2*{cnt}) "
        f"ELSE -((2*(-{num}) + {cnt}) // (2*{cnt})) END)"
    )
    return f"(CAST({half_up} AS DOUBLE) / {10 ** scale})"
