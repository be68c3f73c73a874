"""Text analysis operators (E33): normalization, token/word/line counts,
punctuation & stopword ratios, a composite quality score, heuristic
language ID, and rolling-hash document fingerprints.

All expressions are built-in `pyspark.sql.functions` — the whole operator
set runs inside whole-stage codegen with zero Python in the row path,
which is what makes it viable over 100 TB of documents. (The pandas-UDF
tokenizer in queries/udf.py exists to exercise the UDF surface, not as
the default path.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small deterministic stopword list (shared with the DuckDB oracles).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_CLASS = r"[.,!?;:]"


def normalize_text(c: Column) -> Column:
    """lower + collapse whitespace + trim — the canonical form used by
    exact dedup and fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def words(c: Column) -> Column:
    return F.split(F.trim(c), r"\s+")


def n_words(c: Column) -> Column:
    return F.size(words(c))


def n_lines(c: Column) -> Column:
    return F.size(F.split(c, r"\n")).cast("long")


def token_count(c: Column) -> Column:
    """Regex token count (JVM-side regexp_extract_all)."""
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0)).cast("long")


def punct_ratio(c: Column) -> Column:
    removed = F.regexp_replace(c, PUNCT_CLASS, "")
    return F.round(
        (F.length(c) - F.length(removed)).cast("double")
        / F.greatest(F.length(c), F.lit(1)),
        6,
    )


def stopword_ratio(c: Column) -> Column:
    ws = words(F.lower(c))
    stop = F.filter(ws, lambda w: w.isin(*STOPWORDS))
    return F.round(
        F.size(stop).cast("double") / F.greatest(F.size(ws), F.lit(1)), 6
    )


def quality_score(c: Column) -> Column:
    """Composite heuristic in [0,1]: long enough, low punctuation noise,
    natural stopword density. Deterministic; mirrors the oracle SQL."""
    length_term = F.least(F.length(c).cast("double") / 500.0, F.lit(1.0))
    punct_term = 1.0 - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    stop = stopword_ratio(c)
    stop_term = 1.0 - F.least(F.abs(stop - 0.15) * 4.0, F.lit(1.0))
    return F.round((length_term + punct_term + stop_term) / 3.0, 6)


def lang_guess(c: Column) -> Column:
    """N-gram/stopword-vote language heuristic. Honest limitation: the
    fixture corpus is synthetic English-like text for every lang label, so
    accuracy against the label is meaningless — the operator's contract
    (deterministic vote over class markers) is what's tested."""
    lw = words(F.lower(c))
    votes_en = F.size(F.filter(lw, lambda w: w.isin("the", "a", "and", "of")))
    votes_es = F.size(F.filter(lw, lambda w: w.isin("el", "la", "los", "de", "y")))
    votes_de = F.size(F.filter(lw, lambda w: w.isin("der", "die", "das", "und")))
    votes_fr = F.size(F.filter(lw, lambda w: w.isin("le", "la", "les", "et")))
    has_cjk = F.length(F.regexp_replace(c, r"[\x00-\x7F]", "")) > 0
    return (
        F.when(has_cjk, "zh")
        .when((votes_en >= votes_es) & (votes_en >= votes_de) & (votes_en >= votes_fr) & (votes_en > 0), "en")
        .when((votes_es >= votes_de) & (votes_es >= votes_fr) & (votes_es > 0), "es")
        .when((votes_de >= votes_fr) & (votes_de > 0), "de")
        .when(votes_fr > 0, "fr")
        .otherwise("und")
    )


def char_shingle_fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Karp-Rabin-style rolling fingerprint: hash every k-char window,
    keep (min, max) — a compact content signature robust to small edits
    at the ends. explode(sequence) keeps it JVM-side; the shuffle is one
    groupBy on the doc id."""
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(text_col) - (k - 1), F.lit(1)))
    ).alias("i")
    return (
        df.select(id_col, F.col(text_col), pos)
        .select(id_col, F.md5(F.substring(F.col(text_col), F.col("i").cast("int"), F.lit(k))).alias("h"))
        .groupBy(id_col)
        .agg(F.min("h").alias("fp_min"), F.max("h").alias("fp_max"))
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats column block."""
    c = F.col(text_col)
    return df.select(
        "*",
        F.length(c).cast("long").alias("n_chars_calc"),
        n_words(c).cast("long").alias("n_words"),
        n_lines(c).alias("n_lines"),
        token_count(c).alias("n_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_guess(c).alias("lang_pred"),
    )
