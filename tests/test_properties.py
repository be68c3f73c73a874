"""Property-based checks (SURVEY §5.2): the partition enumerator vs an
independent pure-Python oracle, over randomized date ranges and patterns.

The enumerator reproduces the reference's R3 semantics
(`CommonUtils.java:151-163`): inclusive endpoints, pattern-formatted,
deduplicated, ascending.
"""

from __future__ import annotations

from datetime import date, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_trans_spark.pipelines.migrate import enumerate_partition_keys

PATTERNS = {"yyyyMM": "%Y%m", "yyyyMMdd": "%Y%m%d", "yyyy": "%Y"}


def python_oracle(start: date, end: date, strf: str) -> list[str]:
    out: set[str] = set()
    d = start
    while d <= end:  # inclusive endpoints (reference semantic 1)
        out.add(d.strftime(strf))
        d += timedelta(days=1)
    return sorted(out)


@st.composite
def date_ranges(draw):
    start = draw(
        st.dates(min_value=date(1990, 1, 1), max_value=date(2030, 12, 31))
    )
    span = draw(st.integers(min_value=0, max_value=400))
    return start, start + timedelta(days=span)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rng=date_ranges(), pattern=st.sampled_from(sorted(PATTERNS)))
def test_enumerator_matches_python_oracle(spark, rng, pattern):
    start, end = rng
    got = enumerate_partition_keys(
        spark, start.isoformat(), end.isoformat(), pattern
    )
    assert got == python_oracle(start, end, PATTERNS[pattern])


def test_enumerator_empty_range(spark):
    assert enumerate_partition_keys(spark, "2024-02-01", "2024-01-01") == []


def test_enumerator_single_day_inclusive(spark):
    assert enumerate_partition_keys(spark, "2024-02-29", "2024-02-29", "yyyyMMdd") == [
        "20240229"
    ]


@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        min_size=0,
        max_size=24,
    )
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lit_doubles_roundtrips_bit_exactly(spark, values):
    """lit_doubles renders shortest-repr double literals into ONE parsed
    SQL expression (the py4j-per-element F.lit replacement); the parse
    must reproduce every IEEE double bit-exactly — including -0.0,
    subnormals, and exponent forms — or sign-LSH signatures and k-means
    assignments would silently drift from their oracles."""
    import struct

    from hadoop_trans_spark.operators.similarity import lit_doubles

    got = spark.range(1).select(lit_doubles(values).alias("a")).collect()[0]["a"]
    assert len(got) == len(values)
    for orig, back in zip(values, got):
        assert struct.pack("d", float(orig)) == struct.pack("d", back), (
            orig,
            back,
        )
