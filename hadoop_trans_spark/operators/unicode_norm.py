"""Unicode normalization / confusable-skeleton operators (round 12).

Web corpora are full of text the pure-ASCII fixtures never draw:
NFC/NFD normalization twins ("café" spelled two ways), zero-width
characters glued inside tokens, and Cyrillic lookalikes inside Latin
words ("pаypаl"). A curation pipeline that fingerprints or dedups raw
bytes silently splits those clusters; these operators produce the
canonical forms the dedup family should key on.

Execution split (the 100 TB rule):
- Zero-width stripping (regexp_replace) and confusable skeletonization
  (translate + lower) are pure ``pyspark.sql.functions`` — whole-stage
  codegen, zero Python in the row path.
- NFC canonical composition has NO JVM builtin, so it runs as an
  Arrow-batched pandas UDF (``unicodedata.normalize``) — the documented
  slow-path rule: vectorized Python only where the built-in operators
  genuinely can't express the semantics. At scale, apply it once and
  persist the normalized column rather than recomputing per consumer.

Oracle parity: DuckDB exposes ``nfc_normalize``/``translate``/
``regexp_replace``, so every output is SQL-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# U+200B ZERO WIDTH SPACE, U+200C ZWNJ, U+200D ZWJ, U+FEFF BOM — the
# invisible separators crawled text is full of. Kept as a regex class
# usable verbatim by BOTH Java regex and DuckDB's RE2.
ZERO_WIDTH_CLASS = "[\u200b\u200c\u200d\ufeff]"

# Cyrillic codepoints whose glyphs are indistinguishable from Latin in
# most fonts (the homoglyph-spoofing set), mapped onto the Latin they
# imitate. One-to-one by position — usable by translate() in BOTH
# engines. (Full-width Latin would need NFKC, which DuckDB lacks; out
# of scope for the skeleton, documented here.)
CONFUSABLE_FROM = "аеорсхуіѕј"
CONFUSABLE_TO = "aeopcxyisj"


def strip_zero_width(c: Column) -> Column:
    """Remove zero-width/BOM characters (JVM-side)."""
    return F.regexp_replace(c, ZERO_WIDTH_CLASS, "")


@F.pandas_udf(T.StringType())
def nfc(series: pd.Series) -> pd.Series:
    """NFC canonical composition, Arrow-batched (no JVM builtin).
    NULL passes through as NULL."""
    import unicodedata

    return series.map(
        lambda t: unicodedata.normalize("NFC", t) if isinstance(t, str) else t
    )


def nfc_normalized(c: Column) -> Column:
    """The canonical text form: strip zero-width FIRST (they have
    combining class 0 and would block composition), then NFC."""
    return nfc(strip_zero_width(c))


def confusable_skeleton(c: Column) -> Column:
    """Homoglyph skeleton for dedup keying: zero-width stripped,
    Cyrillic lookalikes folded onto Latin, lowercased. Entirely
    JVM-side — safe to key a 100 TB shuffle on."""
    return F.lower(
        F.translate(strip_zero_width(c), CONFUSABLE_FROM, CONFUSABLE_TO)
    )
