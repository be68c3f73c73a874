"""Corpus-curation queries: benchmark decontamination, repetition-based
quality filters, deterministic splits/sampling, PII redaction, embedding
quantization, and corpus vocabulary — the steps between "raw crawl" and
"training set" in an LLM data pipeline (operators/curation.py,
operators/similarity.py quantize_int8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..operators.curation import (
    chunk_documents,
    weighted_sample,
    decontaminate,
    hash_split,
    pii_counts,
    redact_pii,
    repetition_stats,
    stratified_sample,
)
from ..operators.similarity import quantize_int8
from .base import dterm, query


@query(
    "q71_decontaminate",
    # Benchmark set = doc_id % 97 == 0 (a stand-in for a held-out eval
    # set); a training doc is contaminated if it shares any distinct
    # word 4-gram with any benchmark doc.
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents WHERE text IS NOT NULL),
    g AS (
      SELECT doc_id,
             array_to_string(list_slice(w, i, i + 3), ' ') AS gram
      FROM (SELECT doc_id, w,
                   unnest(range(1, greatest(len(w) - 3, 1) + 1)) AS i
            FROM w)
    ),
    dg AS (SELECT DISTINCT doc_id, gram FROM g),
    bg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 97 = 0)
    SELECT doc_id, COUNT(*) AS n_shared
    FROM dg JOIN bg USING (gram)
    WHERE doc_id % 97 <> 0
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q71_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: training docs sharing a word 4-gram with
    the benchmark subset. Benchmark grams broadcast; corpus grams are
    filtered map-side before the only shuffle (per-doc count)."""
    d = table(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return (
        decontaminate(corpus, bench, k=4)
        .select(F.col("id").alias("doc_id"), "n_shared")
        .orderBy("doc_id")
    )


@query(
    "q72_repetition_quality",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS g
      FROM documents WHERE text IS NOT NULL
    ),
    wf AS (
      SELECT doc_id,
             CAST(ROUND(MAX(n)::DOUBLE / SUM(n), 6) AS DOUBLE) AS top_word_frac
      FROM (SELECT doc_id, g, COUNT(*) AS n FROM words GROUP BY 1, 2)
      GROUP BY doc_id
    ),
    bw AS (SELECT doc_id, string_split(trim(lower(text)), ' ') AS w
           FROM documents WHERE text IS NOT NULL),
    bigrams AS (
      SELECT doc_id,
             array_to_string(list_slice(w, i, i + 1), ' ') AS g
      FROM (SELECT doc_id, w,
                   unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS i
            FROM bw)
    ),
    bf AS (
      SELECT doc_id,
             CAST(ROUND(MAX(n)::DOUBLE / SUM(n), 6) AS DOUBLE) AS top_bigram_frac
      FROM (SELECT doc_id, g, COUNT(*) AS n FROM bigrams GROUP BY 1, 2)
      GROUP BY doc_id
    ),
    ml AS (
      SELECT doc_id,
             CAST(ROUND(
               list_sum(list_transform(
                 string_split_regex(trim(lower(text)), '\s+'), x -> length(x)
               ))::DOUBLE
               / len(string_split_regex(trim(lower(text)), '\s+')), 6
             ) AS DOUBLE) AS mean_word_len
      FROM documents WHERE text IS NOT NULL
    )
    SELECT wf.doc_id, top_word_frac, top_bigram_frac, mean_word_len,
           (top_word_frac <= 0.1 AND top_bigram_frac <= 0.06) AS keep
    FROM wf JOIN bf ON wf.doc_id = bf.doc_id JOIN ml ON wf.doc_id = ml.doc_id
    ORDER BY wf.doc_id
    """,
)
def q72_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): drop docs
    whose most common word/bigram dominates the text."""
    d = table(spark, sf_dir, "documents")
    stats = repetition_stats(d)
    return (
        stats.select(
            F.col("id").alias("doc_id"),
            "top_word_frac",
            "top_bigram_frac",
            "mean_word_len",
            (
                (F.col("top_word_frac") <= 0.1)
                & (F.col("top_bigram_frac") <= 0.06)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query(
    "q73_hash_split",
    oracle="""
    SELECT lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
    FROM documents
    GROUP BY 1, 2
    ORDER BY lang, split
    """,
)
def q73_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from md5(doc_id) hex —
    12/2/2 sixteenths. Pure projection: re-runs, engines, and
    partitionings all agree, so the split is stable as the corpus grows."""
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("split", hash_split("doc_id"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .orderBy("lang", "split")
    )


@query(
    "q74_stratified_sample",
    oracle="""
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 20
    ORDER BY lang, rk
    """,
)
def q74_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-per-language sample (rank by md5(doc_id) within
    stratum) — reproducible eval subsets without a seed parameter.
    WindowGroupLimit keeps the shuffle at ≤ k rows per stratum per task."""
    d = table(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "lang", "doc_id", k=20)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )


@query(
    "q75_pii_redaction",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  || CASE WHEN doc_id % 3 = 0 THEN ' admin@test.org' ELSE '' END
                  || ' or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
           len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS red_md5
    FROM aug
    ORDER BY doc_id
    """,
)
def q75_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (emails / IPv4 / phone-shaped tokens) —
    three JVM regex passes, no Python in the row path. The fixture text
    has no PII, so a deterministic synthetic tail is appended per doc;
    the operator under test is `redact_pii`/`pii_counts`."""
    d = table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(F.col("doc_id") % 3 == 0, " admin@test.org").otherwise(""),
        F.lit(" or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    t = d.select("doc_id", aug.alias("t"))
    return t.select(
        "doc_id",
        *pii_counts(F.col("t")),
        F.md5(redact_pii(F.col("t"))).alias("red_md5"),
    ).orderBy("doc_id")


@query(
    "q76_embedding_quantize",
    oracle="""
    WITH p AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE (embedding IS NOT NULL AND len(list_filter(embedding, x -> NOT coalesce(isfinite(x) AND abs(x) < 1000000000000000, FALSE))) = 0)
    ),
    s AS (
      SELECT vec_id, v,
             127.0 / greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS scale
      FROM p
    )
    SELECT vec_id,
           CAST(ROUND(scale, 6) AS DOUBLE) AS scale,
           array_to_string(list_transform(v, x -> CAST(floor(x * scale) AS INT)), ',') AS q_str,
           CAST(ROUND(list_sum(list_transform(v,
               x -> (x - CAST(floor(x * scale) AS DOUBLE) / scale)
                  * (x - CAST(floor(x * scale) AS DOUBLE) / scale))), 6) AS DOUBLE) AS sq_err
    FROM s
    ORDER BY vec_id
    """,
)
def q76_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization + reconstruction error — the prep step
    before shipping embeddings to an ANN index (4× smaller vectors).
    floor (not round) keeps tie-break behavior engine-portable."""
    e = table(spark, sf_dir, "embeddings")
    out = quantize_int8(e)
    return out.select(
        F.col("id").alias("vec_id"),
        "scale",
        F.array_join("q", ",").alias("q_str"),
        "sq_err",
    ).orderBy("vec_id")


@query(
    "q77_vocab_topk",
    oracle=r"""
    SELECT g AS token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS g
      FROM documents
    )
    GROUP BY g
    ORDER BY n DESC, token
    LIMIT 100
    """,
)
def q77_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by frequency with doc frequency —
    the tokenizer-training / stopword-discovery primitive. One explode +
    one hash agg (map-side combined); ties broken by token for
    cross-engine determinism."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
        )
        .groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n").desc(), "token")
        .limit(100)
    )


@query(
    "q87_tfidf_top_terms",
    # Linear (ratio) idf instead of log keeps the score engine-portable:
    # ln() is not guaranteed bit-identical across libm implementations,
    # division and multiplication are.
    oracle=r"""
    WITH w AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf_n FROM w GROUP BY 1, 2),
    wc AS (SELECT doc_id, CAST(SUM(tf_n) AS BIGINT) AS n_words FROM tf GROUP BY 1),
    idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_total FROM documents)
    SELECT doc_id, term, score, rn AS rank FROM (
      SELECT tf.doc_id, tf.term,
             CAST(ROUND((tf.tf_n::DOUBLE / wc.n_words)
                        * (n.n_total::DOUBLE / idf.df), 6) AS DOUBLE) AS score,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY ROUND((tf.tf_n::DOUBLE / wc.n_words)
                              * (n.n_total::DOUBLE / idf.df), 6) DESC, tf.term
             ) AS rn
      FROM tf JOIN wc USING (doc_id) JOIN idf USING (term) CROSS JOIN n
    ) WHERE rn <= 3
    ORDER BY doc_id, rank
    """,
)
def q87_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf·idf (linear smoothing-free
    idf = N/df — a ratio, so both engines agree bit-for-bit; ln() is not
    guaranteed identical across libm implementations). Two hash aggs
    (term counts, doc lengths), one tiny idf table joined back, window
    top-k per doc — the keyword-extraction primitive for corpus search
    and topic labeling."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )
    tf = w.groupBy("doc_id", "term").agg(F.count("*").alias("tf_n"))
    wc = tf.groupBy("doc_id").agg(F.sum("tf_n").alias("n_words"))
    idf = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_total"))
    score = F.round(
        (F.col("tf_n").cast("double") / F.col("n_words"))
        * (F.col("n_total").cast("double") / F.col("df")),
        6,
    )
    scored = (
        tf.join(wc, "doc_id")
        .join(idf, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
    )
    rk = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "score", "rank")
        .orderBy("doc_id", "rank")
    )


@query(
    "q97_sequence_packing",
    oracle="""
    WITH toks AS (
        SELECT source, doc_id, CAST(n_chars // 4 AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT source, n_tokens,
               CAST(FLOOR((SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens) / 2048) AS BIGINT) AS bin
        FROM toks
    )
    SELECT source, bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(n_tokens) > 2048 AS INT) AS overflow
    FROM packed GROUP BY source, bin ORDER BY source, bin
    """,
)
def q97_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing (`operators/curation.py
    pack_sequences`): docs fill 2048-token training bins within their
    source shard, a doc starting inside a bin stays there (boundary
    spill, ≤1 doc overflow per bin). Token counts use the 4-chars-per-
    token heuristic so both engines agree exactly. Scale: the cumulative
    sum is per-shard — parallelism = #shards, no global sort."""
    from ..operators.curation import pack_sequences

    d = table(spark, sf_dir, "documents")
    packed = pack_sequences(
        d.select("source", "doc_id", "n_chars"),
        group_col="source",
        order_col="doc_id",
        tokens_col=F.floor(F.col("n_chars") / 4).cast("long"),
        budget=2048,
    )
    return (
        packed.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tokens_total"),
            (F.sum("n_tokens") > 2048).cast("int").alias("overflow"),
        )
        .orderBy("source", "bin")
    )


@query(
    "q98_mixture_sample",
    oracle="""
    SELECT lang, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
          CASE lang WHEN 'en' THEN 'ff' WHEN 'zh' THEN 'bf' ELSE '7f' END
    GROUP BY lang ORDER BY lang
    """,
)
def q98_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus mixture (`operators/curation.py
    mixture_sample`): per-language keep rates (en≈100%, zh≈75%, rest
    ≈50%) enforced by an md5 hex cutoff — seedless, engine-portable,
    stable under repartitioning AND corpus growth, so incremental
    pipeline reruns sample the same documents. This is the up-weighting
    /down-weighting step of training-mixture construction as a pure
    filter (no shuffle until the audit aggregation)."""
    from ..operators.curation import mixture_sample

    d = table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", "ff")
        .when(F.col("lang") == "zh", "bf")
        .otherwise("7f")
    )
    return (
        mixture_sample(d, rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .orderBy("lang")
    )


@query(
    "q103_chunk_documents",
    oracle="""
    SELECT doc_id, off,
           length(substr(text, off + 1, 200)) AS chunk_len,
           md5(substr(text, off + 1, 200)) AS chunk_hash
    FROM (SELECT doc_id, text,
                 UNNEST(generate_series(0, length(text) - 1, 150)) AS off
          FROM documents)
    ORDER BY doc_id, off
    """,
)
def q103_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character chunking (operators/curation.py
    chunk_documents): 200-char windows at stride 150. Chunk offsets are
    generated per row (`sequence`+`explode`) so the operator never
    shuffles; output row count is sum(ceil(len/stride)) and each chunk is
    carried as md5 to keep the result narrow."""
    docs = table(spark, sf_dir, "documents")
    return chunk_documents(docs, size=200, stride=150).orderBy(
        "doc_id", "off"
    )


@query(
    "q108_weighted_sample",
    oracle="""
    SELECT doc_id, n_chars, sample_key FROM (
        SELECT doc_id, n_chars,
               ROUND(pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)
                               AS BIGINT) + 1) / 16777217.0,
                         1.0 / CAST(n_chars AS DOUBLE)), 6) AS sample_key
        FROM documents WHERE n_chars > 0
    ) QUALIFY ROW_NUMBER() OVER (ORDER BY sample_key DESC, doc_id) <= 50
    ORDER BY doc_id
    """,
)
def q108_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (A-ES, operators/curation.py
    weighted_sample): 50 documents drawn with probability ∝ n_chars.
    Seedless per-id uniforms from an md5-prefix hash (identical hex text
    in both engines, no int64-overflow or sign edge cases) make the draw
    reproducible as the corpus grows."""
    docs = table(spark, sf_dir, "documents")
    return (
        weighted_sample(docs, k=50, weight_col="n_chars")
        .select("doc_id", "n_chars", "sample_key")
        .orderBy("doc_id")
    )


@query(
    "q135_contrastive_pairs",
    oracle="""
    WITH chunks AS (
        SELECT doc_id,
               CAST((off / 200) AS BIGINT) AS idx,
               substr(text, off + 1, 200) AS chunk
        FROM (SELECT doc_id, text,
                     UNNEST(generate_series(0, length(text) - 1, 200)) AS off
              FROM documents)
        WHERE length(substr(text, off + 1, 200)) >= 64
    )
    SELECT a.doc_id AS doc_id,
           a.idx AS pair_idx,
           md5(a.chunk) AS anchor_hash,
           md5(b.chunk) AS positive_hash,
           length(a.chunk) AS anchor_len,
           length(b.chunk) AS positive_len
    FROM chunks a
    JOIN chunks b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
    ORDER BY doc_id, pair_idx
    """,
)
def q135_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training pair generation: adjacent 200-char chunks of
    the same document become (anchor, positive) pairs — the standard
    self-supervised construction for embedding-model training data
    (in-batch negatives come free at trainer time). Runts under 64 chars
    are dropped so no pair carries a near-empty positive. Plan shape:
    chunks are built per-row (sequence+explode, zero shuffle) and the
    pairing is done INSIDE the row over the chunk array before the
    explode, so there is no self-join and no shuffle at any width — at
    100 TB this is a pure map pipeline whose output is ~1 row per 200
    input chars. Chunks are carried as md5 to keep rows narrow."""
    docs = table(spark, sf_dir, "documents")
    # Stride == size, so only the FINAL chunk can be shorter than 64 —
    # filtering the array keeps surviving positions equal to the original
    # chunk indexes (the oracle joins on those).
    with_chunks = docs.withColumn(
        "chunks_arr",
        F.filter(
            F.expr(
                "transform(sequence(0, greatest(length(text) - 1, 0), 200),"
                " off -> substring(text, off + 1, 200))"
            ),
            lambda c: F.length(c) >= 64,
        ),
    )
    paired = with_chunks.select(
        "doc_id",
        F.explode(
            F.expr(
                """
                filter(
                  transform(chunks_arr,
                            (c, i) -> struct(CAST(i AS BIGINT) AS pair_idx,
                                             md5(c) AS anchor_hash,
                                             md5(try_element_at(chunks_arr, i + 2))
                                               AS positive_hash,
                                             length(c) AS anchor_len,
                                             length(try_element_at(chunks_arr, i + 2))
                                               AS positive_len)),
                  s -> s.positive_hash IS NOT NULL)
                """
            )
        ).alias("p"),
    )
    out = paired.select("doc_id", "p.*")
    return out.orderBy("doc_id", "pair_idx")


@query(
    "q197_k_anonymity",
    # Pure integer counting over the quasi-identifier pair — exact in
    # both engines; the suppression rate is one double division rounded
    # at 1e-6.
    oracle="""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, group_size,
           CAST(group_size < 5 AS INT) AS suppressed,
           CAST(ROUND(CAST(SUM(CASE WHEN group_size < 5 THEN group_size
                                    ELSE 0 END) OVER () AS DOUBLE)
                      / SUM(group_size) OVER (), 6) AS DOUBLE)
               AS corpus_suppression_rate
    FROM g ORDER BY c_nationkey, c_mktsegment
    """,
)
def q197_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (nation,
    market segment): per-equivalence-class sizes, a k<5 suppression
    flag, and the corpus-wide share of rows that would need suppression
    — the release gate run before publishing a derived dataset
    (complements the PII redaction in q74/q75). One hash agg over a
    2-column projection; the only window runs over the equivalence
    CLASSES (|nations|×|segments| rows, metadata-sized at any scale,
    never the raw customer table)."""
    g = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
    )
    w = Window.partitionBy()
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        (F.col("group_size") < 5).cast("int").alias("suppressed"),
        F.round(
            F.sum(
                F.when(F.col("group_size") < 5, F.col("group_size")).otherwise(
                    0
                )
            )
            .over(w)
            .cast("double")
            / F.sum("group_size").over(w),
            6,
        )
        .cast("double")
        .alias("corpus_suppression_rate"),
    ).orderBy("c_nationkey", "c_mktsegment")


@query(
    "q206_winsorize_acctbal",
    # Cutoffs are percentile_disc-style (smallest value whose cumulative
    # count reaches ceil(p*n)) computed from exact integer cumulative
    # counts — no interpolated-quantile arithmetic, which differs by
    # ulps across engines (the q124 lesson). Clipped sums are decimal.
    oracle="""
    WITH vals AS (
        SELECT c_mktsegment AS seg, c_acctbal AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM customer GROUP BY c_mktsegment, c_acctbal
    ),
    cum AS (
        SELECT seg, v, cnt,
               SUM(cnt) OVER (PARTITION BY seg ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER (PARTITION BY seg) AS n
        FROM vals
    ),
    cuts AS (
        SELECT seg, CAST(MAX(n) AS BIGINT) AS n,
               MIN(CASE WHEN cum >= CEIL(0.05 * n) THEN v END) AS p05,
               MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN v END) AS p95
        FROM cum GROUP BY seg
    )
    SELECT c.c_mktsegment AS seg, k.n, k.p05, k.p95,
           CAST(SUM(CASE WHEN c.c_acctbal < k.p05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN c.c_acctbal > k.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
           (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*)) < 1000000000 THEN (CASE WHEN ABS(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*)) < 1000000000 THEN CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*), 6) AS DOUBLE) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*), 0) AS DECIMAL(38,0)) AS DOUBLE) END) ELSE CAST(CAST(ROUND(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) THEN (LEAST(GREATEST(c.c_acctbal, k.p05), k.p95)) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) / COUNT(*), 0) AS DECIMAL(38,0)) AS DOUBLE) END)
               AS winsorized_mean
    FROM customer c JOIN cuts k ON k.seg = c.c_mktsegment
    GROUP BY c.c_mktsegment, k.n, k.p05, k.p95
    ORDER BY seg
    """,
)
def q206_winsorize_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment winsorization of account balances at discrete
    p05/p95 (outlier clipping before feature scaling — a standard
    training-data curation step). Cutoffs use percentile_disc
    semantics built from cumulative counts over DISTINCT values per
    segment — the window runs on the value-histogram table, not raw
    customers, and clipping is a broadcast-sized cutoff join back to
    the fact. Exact at any scale; no interpolated quantiles."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("v")
    )
    vals = cust.groupBy("seg", "v").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("seg")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wseg = Window.partitionBy("seg")
    cum = vals.select(
        "seg",
        "v",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wseg).alias("n"),
    )
    cuts = cum.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.ceil(0.05 * F.col("n")), F.col("v"))
        ).alias("p05"),
        F.min(
            F.when(F.col("cum") >= F.ceil(0.95 * F.col("n")), F.col("v"))
        ).alias("p95"),
    )
    clipped = cust.join(F.broadcast(cuts), "seg")
    return (
        clipped.groupBy("seg", "n", "p05", "p95")
        .agg(
            F.sum((F.col("v") < F.col("p05")).cast("int")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("v") > F.col("p95")).cast("int")).alias(
                "n_clipped_high"
            ),
            F.round(
                F.sum(
                    F.least(
                        F.greatest(F.col("v"), F.col("p05")), F.col("p95")
                    ).cast("decimal(38,6)")
                )
                / F.count("*"),
                6,
            )
            .cast("double")
            .alias("winsorized_mean"),
        )
        .orderBy("seg")
    )


@query(
    "q227_neyman_sample",
    # Per-stratum std is computed from decimal moments with one double
    # formula (identical operand order); the allocation denominator
    # Σ n_h·sd_h is staged deterministically (each term rounded at 1e-9,
    # summed through DECIMAL(38,9), cast back to double) so its value
    # does not depend on window-aggregation order; each row's inclusion
    # test then compares an exact md5-derived uniform against the rate —
    # bit-identical decisions in both engines, so sampled counts are
    # EXACT, not statistical.
    oracle="""
    WITH m AS (
        SELECT c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM((CASE WHEN ABS((CASE WHEN ISFINITE(c_acctbal) THEN (c_acctbal) END)) < 1000000000 THEN CAST(ROUND((CASE WHEN ISFINITE(c_acctbal) THEN (c_acctbal) END), 6) AS DECIMAL(38,6)) WHEN ABS((CASE WHEN ISFINITE(c_acctbal) THEN (c_acctbal) END)) < 9007199254740992 THEN CAST(CAST(ROUND((CASE WHEN ISFINITE(c_acctbal) THEN (c_acctbal) END), 0) AS DECIMAL(38,0)) AS DECIMAL(38,6)) END)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(19,6))
                        * CAST(c_acctbal AS DECIMAL(19,6))) AS DOUBLE) AS sxx
        FROM customer WHERE ABS(c_acctbal) < 1000000000.0
        GROUP BY c_mktsegment
    ),
    s AS (
        SELECT seg, n,
               SQRT((sxx - sx * sx / n) / (n - 1)) AS sd
        FROM m
    ),
    alloc AS (
        SELECT seg, n, sd,
               LEAST(1.0, (1000.0 * (n * sd)
                   / CAST(SUM(CAST(ROUND(n * sd, 9) AS DECIMAL(38,9)))
                          OVER () AS DOUBLE)) / n) AS rate
        FROM s
    ),
    drawn AS (
        SELECT c.c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS n_sampled
        FROM customer c JOIN alloc a ON a.seg = c.c_mktsegment
        WHERE ABS(c.c_acctbal) < 1000000000.0
          AND CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR)),
                                   1, 8)) AS BIGINT)
              / 4294967296.0 < a.rate
        GROUP BY c.c_mktsegment
    )
    SELECT a.seg, a.n,
           CAST(ROUND(a.sd, 6) AS DOUBLE) AS sd,
           CAST(ROUND(a.rate, 6) AS DOUBLE) AS rate,
           COALESCE(d.n_sampled, 0) AS n_sampled
    FROM alloc a LEFT JOIN drawn d ON d.seg = a.seg
    ORDER BY a.seg
    """,
)
def q227_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling: a 1000-row budget is
    allocated across market segments proportional to N_h·S_h (stratum
    size × stratum std of account balance — the variance-minimizing
    design from survey sampling, vs q73/q77's proportional splits).
    Two passes: a per-stratum moment agg derives the rates, then a
    deterministic md5-uniform inclusion test draws rows — the same
    reproducible-sampling hash used repo-wide, so the draw is exact
    and engine-portable, never RNG. At 100 TB both passes are one
    shuffle each and the 5-row rate table broadcasts."""
    from .base import DEC

    cust = (
        table(spark, sf_dir, "customer")
        # Exact-moment domain: a corrupt-magnitude balance leaves the
        # DECIMAL(19,6) square envelope; excluded from the whole
        # sampling design symmetrically (r11 money probe).
        .where(F.abs("c_acctbal") < 1e9)
        .select(
            F.col("c_mktsegment").alias("seg"),
            "c_custkey",
            F.col("c_acctbal").alias("v"),
        )
    )
    d6 = "decimal(19,6)"
    m = cust.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum(dterm("v", 6)).cast("double").alias("sx"),
        F.sum(F.col("v").cast(d6) * F.col("v").cast(d6))
        .cast("double")
        .alias("sxx"),
    )
    s = m.select(
        "seg",
        "n",
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    alloc = s.select(
        "seg",
        "n",
        "sd",
        F.least(
            F.lit(1.0),
            (
                F.lit(1000.0)
                * (F.col("n") * F.col("sd"))
                / F.sum(
                    F.round(F.col("n") * F.col("sd"), 9).cast("decimal(38,9)")
                )
                .over(Window.partitionBy())
                .cast("double")
            )
            / F.col("n"),
        ).alias("rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    drawn = (
        cust.join(F.broadcast(alloc), "seg")
        .where(u < F.col("rate"))
        .groupBy("seg")
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        alloc.join(drawn, "seg", "left")
        .select(
            "seg",
            "n",
            F.round("sd", 6).cast("double").alias("sd"),
            F.round("rate", 6).cast("double").alias("rate"),
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
        .orderBy("seg")
    )


# --- q258: learned quality filter (logistic regression in-engine) -----------

# Feature expressions shared verbatim (as SQL text for the oracle, as
# Column builders for Spark). All three are plain double arithmetic
# over character counts, so both engines produce bit-identical feature
# vectors; every rounded quantity goes through the dterm/o_dterm
# portable-rounding pair and every mean through the integer-side
# HALF_UP division (o_davg's formula), so the unrolled training run is
# engine-reproducible — the same discipline as the kmeans/pagerank
# iterative oracles.
_LOGREG_ITERS = 3
_LOGREG_FEATS = ["b", "x1_len", "x2_thrate", "x3_wordlen"]


def _logreg_feature_sql() -> str:
    return """
      SELECT doc_id, lang,
             CAST(LEAST(len(text), 2000) AS DOUBLE) / 1000.0 AS x1,
             CAST(len(text) - len(replace(text, 'th', '')) AS DOUBLE)
                  / 2.0 / GREATEST(len(text), 1) * 100.0 AS x2,
             CAST(LEAST(len(text), 2000) AS DOUBLE)
                  / len(string_split(text, ' ')) / 10.0 AS x3,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents WHERE text IS NOT NULL"""


def _logreg_m9(expr: str) -> str:
    """Exact HALF_UP mean of ROUND(expr, 9) at scale 9, integer-side
    (o_davg's formula at 9dp term grain), emitted as DOUBLE."""
    s_ = (
        f"SUM(CASE WHEN ABS({expr}) < 1000000.0 THEN "
        f"CAST(ROUND({expr}, 9) AS DECIMAL(38,9)) END)"
    )
    si = (
        f"(CAST(TRUNC({s_}) AS HUGEINT) * 1000000000 "
        f"+ CAST(({s_} - TRUNC({s_})) * 1000000000 AS HUGEINT))"
    )
    n = "CAST(COUNT(*) AS HUGEINT)"
    hu = (
        f"(CASE WHEN {si} >= 0 THEN (2*{si} + {n}) // (2*{n}) "
        f"ELSE -((2*(-{si}) + {n}) // (2*{n})) END)"
    )
    return f"(CAST({hu} AS DOUBLE) / 1000000000)"


def _logreg_train_ctes() -> tuple[str, str]:
    """Unrolled GD CTE chain: iteration k computes z from the running
    weights, p = 1/(1+exp(-z)) (identical input double -> exp ulp
    class, the q241 convention), per-doc terms 0.5*(y-p)*x_j, and adds
    their exact mean to each weight. Returns (ctes_sql, final_cte) so
    q258 (report) and q259 (apply) share the trained weights."""
    xs = ["1.0", "x1", "x2", "x3"]
    ctes = [f"d AS ({_logreg_feature_sql()})"]
    prev = None
    for k in range(1, _LOGREG_ITERS + 1):
        if prev is None:
            p = "0.5"  # w=0 -> z=0 -> sigmoid exactly one half
            src = "d"
        else:
            z = (
                f"({prev}.w0 + {prev}.w1*x1 + {prev}.w2*x2 "
                f"+ {prev}.w3*x3)"
            )
            p = f"(1.0 / (1.0 + exp(-{z})))"
            src = f"d CROSS JOIN {prev}"
        terms = [f"(0.5 * (y - {p}) * {x})" for x in xs]
        cols = []
        for j, t in enumerate(terms):
            base = f"{prev}.w{j} + " if prev else ""
            cols.append(f"{base}{_logreg_m9(t)} AS w{j}")
        group = (
            f" GROUP BY {prev}.w0, {prev}.w1, {prev}.w2, {prev}.w3"
            if prev
            else ""
        )
        ctes.append(
            f"i{k} AS (SELECT {', '.join(cols)} FROM {src}{group})"
        )
        prev = f"i{k}"
    return ",\n".join(ctes), prev


def _logreg_oracle() -> str:
    ctes, prev = _logreg_train_ctes()
    zf = f"({prev}.w0 + {prev}.w1*x1 + {prev}.w2*x2 + {prev}.w3*x3)"
    return (
        "WITH "
        + ctes
        + f""",
    acc AS (
      SELECT CAST(ROUND(AVG(CASE WHEN ({zf} >= 0) = (y = 1.0)
                               THEN 1.0 ELSE 0.0 END), 6) AS DOUBLE) AS v
      FROM d CROSS JOIN {prev}
      GROUP BY {prev}.w0, {prev}.w1, {prev}.w2, {prev}.w3
    )
    SELECT feature, value FROM (
      SELECT 'b' AS feature, w0 AS value FROM {prev}
      UNION ALL SELECT 'x1_len', w1 FROM {prev}
      UNION ALL SELECT 'x2_thrate', w2 FROM {prev}
      UNION ALL SELECT 'x3_wordlen', w3 FROM {prev}
      UNION ALL SELECT 'train_acc', v FROM acc
    ) ORDER BY feature
    """
    )


@query("q258_quality_logreg", oracle=_logreg_oracle())
def q258_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter: full-batch logistic regression TRAINED
    IN-ENGINE (3 GD steps, lr folded into the 0.5 gradient scale) on
    three cheap text features (length, 'th'-digram rate, mean word
    length) against the lang=='en' pseudo-label — the trainable tier
    above the heuristic quality score (q36), the fastText/CCNet-style
    filter of LLM curation run as pure DataFrame aggregations.

    Scale shape: each GD step is ONE map-side-combined aggregation over
    the corpus (4 decimal sums) collected to the driver — the model (4
    doubles) is literal-broadcast back into the next step's expressions
    exactly like kmeans' centroids; no shuffle grows with the corpus,
    and the step count is fixed. Determinism: features are integer
    ratios (bit-identical doubles), gradient terms go through dterm(9),
    means through the integer-side HALF_UP division, so both engines
    walk the same weight trajectory; the only cross-engine surface is
    exp's ulp (q241's accepted class), buffered by the 9dp term
    rounding.

    Output: the trained weights + training accuracy, (feature, value)
    rows."""
    d = _logreg_features(spark, sf_dir)
    w = _logreg_train(d)
    zf = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )
    acc = d.agg(
        F.round(
            F.avg(
                F.when((zf >= 0) == (F.col("y") == 1.0), 1.0).otherwise(
                    0.0
                )
            ),
            6,
        )
        .cast("double")
        .alias("value")
    ).select(F.lit("train_acc").alias("feature"), "value")
    weights = spark.createDataFrame(
        list(zip(_LOGREG_FEATS, [float(v) for v in w])),
        "feature string, value double",
    )
    return weights.unionAll(acc).orderBy("feature")


def _logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, x1, x2, x3, y) — the exact twin of
    _logreg_feature_sql's projection."""
    return (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            (
                F.least(F.length("text"), F.lit(2000)).cast("double")
                / F.lit(1000.0)
            ).alias("x1"),
            (
                (
                    F.length("text")
                    - F.length(F.expr("replace(text, 'th', '')"))
                ).cast("double")
                / F.lit(2.0)
                / F.greatest(F.length("text"), F.lit(1))
                * F.lit(100.0)
            ).alias("x2"),
            (
                # LEAST caps like x1: keeps every gradient term far
                # inside dterm's 1e6 branch cap, where the Spark and
                # oracle rounding paths are the identical one.
                F.least(F.length("text"), F.lit(2000)).cast("double")
                / F.size(F.split(F.col("text"), " "))
                / F.lit(10.0)
            ).alias("x3"),
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        )
    )


def _logreg_train(d: DataFrame) -> list[float]:
    """The 3-step GD loop over a feature frame; returns the weights as
    exact 1e-9-multiple floats (see q258's determinism notes)."""
    xs = [F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")]
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(_LOGREG_ITERS):
        if all(v == 0.0 for v in w):
            p = F.lit(0.5)
        else:
            z = (
                F.lit(w[0])
                + F.lit(w[1]) * F.col("x1")
                + F.lit(w[2]) * F.col("x2")
                + F.lit(w[3]) * F.col("x3")
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = d.agg(
            *[
                F.sum(dterm(F.lit(0.5) * (F.col("y") - p) * x, 9)).alias(
                    f"s{j}"
                )
                for j, x in enumerate(xs)
            ],
            F.count("*").alias("n"),
        ).collect()[0]
        n = int(row["n"])
        for j in range(4):
            si = int(row[f"s{j}"].scaleb(9))  # exact scaled integer
            hu = (
                (2 * si + n) // (2 * n)
                if si >= 0
                else -((2 * -si + n) // (2 * n))
            )
            w[j] = w[j] + hu / 1e9
    return w


def _logreg_apply_oracle() -> str:
    ctes, prev = _logreg_train_ctes()
    zf = f"({prev}.w0 + {prev}.w1*x1 + {prev}.w2*x2 + {prev}.w3*x3)"
    return (
        "WITH "
        + ctes
        + f""",
    scored AS (
      SELECT doc_id, lang,
             ROUND(1.0 / (1.0 + exp(-{zf})), 6) AS score
      FROM d CROSS JOIN {prev}
    ),
    med AS (SELECT quantile_cont(score, 0.5) AS m FROM scored)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score > med.m THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(ROUND(AVG(CASE WHEN score > med.m THEN 1.0 ELSE 0.0 END),
                6) AS DOUBLE) AS kept_rate
    FROM scored CROSS JOIN med
    GROUP BY lang, med.m
    ORDER BY lang
    """
    )


@query("q259_quality_filter_apply", oracle=_logreg_apply_oracle())
def q259_quality_filter_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the learned quality filter: train (q258's GD
    walk), score every document with the model as literal expressions,
    keep everything above the corpus median score, and report the
    per-language funnel. This is the filter as it runs at 100 TB —
    scoring is a pure projection (4 multiplies + a sigmoid per row, no
    shuffle; the model rides the closure exactly like kmeans
    centroids), the median is one exact-interpolated percentile over
    the 6dp-rounded scores (both engines interpolate the same sorted
    6dp values, so the threshold is bit-identical), and the funnel is
    one hash agg on lang. Median-thresholding (rather than p>=0.5)
    keeps the contract meaningful on a weak-signal corpus: the filter
    always yields the top half by learned quality."""
    d = _logreg_features(spark, sf_dir)
    w = _logreg_train(d)
    zf = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )
    scored = d.select(
        "doc_id",
        "lang",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zf)), 6).alias("score"),
    )
    med = scored.agg(F.expr("percentile(score, 0.5)").alias("m"))
    return (
        scored.crossJoin(F.broadcast(med))
        .groupBy("lang", "m")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("score") > F.col("m"), 1).otherwise(0)
            ).alias("n_kept"),
            F.round(
                F.avg(
                    F.when(F.col("score") > F.col("m"), 1.0).otherwise(0.0)
                ),
                6,
            )
            .cast("double")
            .alias("kept_rate"),
        )
        .select("lang", "n_docs", "n_kept", "kept_rate")
        .orderBy("lang")
    )
