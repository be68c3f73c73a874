"""Text-analysis queries (E33) over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.textstats import (
    char_shingle_fingerprint,
    lang_guess,
    text_stats,
)
from .base import dterm, o_davg, query


@query(
    "q35_text_stats",
    oracle=r"""
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len(string_split_regex(trim(text), '\s+')) AS n_words,
           len(string_split(text, chr(10))) AS n_lines,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens,
           CAST(ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
                      / greatest(length(text), 1), 6) AS DOUBLE) AS punct_ratio,
           CAST(ROUND(len(list_filter(string_split_regex(lower(text), '\s+'),
                                      w -> w IN ('the','a','of','and','to','in','is','it')))::DOUBLE
                      / greatest(len(string_split_regex(lower(text), '\s+')), 1), 6) AS DOUBLE)
             AS stopword_ratio
    FROM documents
    ORDER BY doc_id
    """,
)
def q35_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char/word/line/token counts + punctuation & stopword ratios —
    all JVM-side string ops (operators.textstats)."""
    d = table(spark, sf_dir, "documents")
    return (
        text_stats(d)
        .select(
            "doc_id",
            "n_chars_calc",
            "n_words",
            "n_lines",
            "n_tokens",
            "punct_ratio",
            "stopword_ratio",
        )
        .orderBy("doc_id")
    )


@query(
    "q36_corpus_quality_profile",
    oracle=f"""
    SELECT lang,
           source,
           COUNT(*) AS n_docs,
           {o_davg('n_chars')} AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def q36_corpus_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: per (lang, source) doc counts + length stats —
    the filter/profile step before training-data selection."""
    from .base import davg

    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            davg("n_chars").alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "q37_lang_id",
    # Reproduces lang_guess's full five-way vote (operators/textstats.py),
    # not just the zh/en/und branches the fixture happens to exercise — a
    # non-English corpus keeps the two pipelines semantically identical.
    oracle="""
    WITH lw AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\\s+') AS w,
             length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) > 0 AS has_cjk
      FROM documents
    ), v AS (
      SELECT doc_id, lang, has_cjk,
             len(list_filter(w, x -> x IN ('the','a','and','of')))   AS v_en,
             len(list_filter(w, x -> x IN ('el','la','los','de','y'))) AS v_es,
             len(list_filter(w, x -> x IN ('der','die','das','und'))) AS v_de,
             len(list_filter(w, x -> x IN ('le','la','les','et')))   AS v_fr
      FROM lw
    )
    SELECT doc_id, lang AS lang_label,
           CASE
             WHEN has_cjk THEN 'zh'
             WHEN v_en >= v_es AND v_en >= v_de AND v_en >= v_fr AND v_en > 0 THEN 'en'
             WHEN v_es >= v_de AND v_es >= v_fr AND v_es > 0 THEN 'es'
             WHEN v_de >= v_fr AND v_de > 0 THEN 'de'
             WHEN v_fr > 0 THEN 'fr'
             ELSE 'und'
           END AS lang_pred
    FROM v
    ORDER BY doc_id
    """,
)
def q37_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword vote + CJK char detection).

    Honest limitation: the fixture text is synthetic English-like for
    every lang label, so predictions are ~all 'en'; the oracle checks the
    deterministic heuristic, not linguistic accuracy."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        lang_guess(F.col("text")).alias("lang_pred"),
    ).orderBy("doc_id")


@query(
    "q38_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           min(md5(substring(text, i, 8))) AS fp_min,
           max(md5(substring(text, i, 8))) AS fp_max
    FROM (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text)-7, 1) + 1)) AS i
      FROM documents
    )
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q38_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 8-char-window hash fingerprint (min/max of window hashes) —
    compact content signature for incremental-crawl change detection."""
    d = table(spark, sf_dir, "documents")
    return char_shingle_fingerprint(d, "doc_id", "text", k=8).orderBy("doc_id")


@query(
    "q110_inverted_index",
    oracle=r"""
    WITH terms AS (
        SELECT DISTINCT doc_id, g AS term
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS g
              FROM documents)
        WHERE length(g) >= 4
    )
    SELECT term, COUNT(*) AS df,
           array_to_string(list_sort(list(doc_id))[:10], ',') AS postings10
    FROM terms
    GROUP BY term HAVING COUNT(*) >= 25
    ORDER BY term
    """,
)
def q110_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (the search-side twin of the corpus: term →
    document frequency + posting list): lowercase alpha tokens ≥ 4 chars,
    distinct per doc. Postings are carried as the first-10 sorted doc
    ids joined to a string, taken via a rank-limited per-term window
    (row_number <= 10 compiles to WindowGroupLimit — each map task
    forwards at most 10 ids per term, so a stopword-like term never
    builds a df-sized aggregation buffer the way collect-then-slice
    would); df is a plain count aggregate on the same term key, joined
    back co-partitioned. The terms table materializes once for its two
    consumers (the q133 tf convention). At 100 TB the full posting
    lists shard by term (the groupBy IS the sharding) and the capped
    prefix is what a dictionary/stats table stores."""
    from ..operators.stage import materialize_stage

    d = table(spark, sf_dir, "documents")
    terms = materialize_stage(
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .where(F.length("term") >= 4)
        .distinct()
    )
    stats = terms.groupBy("term").agg(F.count("*").alias("df"))
    wt = Window.partitionBy("term").orderBy("doc_id")
    top = (
        terms.withColumn("rk", F.row_number().over(wt))
        .where(F.col("rk") <= 10)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id"))
            ).alias("postings10")
        )
    )
    return (
        stats.join(top, "term")
        .where(F.col("df") >= 25)
        .select("term", "df", "postings10")
        .orderBy("term")
    )


@query(
    "q118_unigram_logprob",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, g AS w
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS g
              FROM documents)
        WHERE length(g) >= 1
    ),
    vocab AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM toks)
    SELECT t.doc_id AS doc_id, COUNT(*) AS n_tokens,
           CAST(ROUND(SUM(CAST(ROUND(ln(v.c * 1.0 / tot.total), 9)
                          AS DECIMAL(38,9))) / COUNT(*), 4) AS DOUBLE)
             AS mean_logprob
    FROM toks t JOIN vocab v ON t.w = v.w CROSS JOIN tot
    GROUP BY 1 ORDER BY 1
    """,
)
def q118_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: mean log-probability of each
    document's tokens under the corpus's own unigram distribution — the
    cheap stand-in for the perplexity quality filter every LLM data
    pipeline runs. The vocab is a corpus-wide word count joined back to
    the token stream as a plain equi-join: real vocabularies follow
    Heaps' law (~n^0.4-0.6), so at 100 TB the vocab is tens of GB and
    must NOT be forced broadcast — AQE picks broadcast only when the
    measured size allows. Each log term is rounded to 1e-9 and summed
    through decimal(38,9) (the repo-wide dsum pattern; the fine scale
    keeps a Math.log-vs-libm ulp flip at a rounding boundary from
    moving the 1e-4 mean), making the per-doc score independent of
    partitioning/AQE order and bitwise stable against the DuckDB
    oracle."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).where(F.length("w") >= 1)
    vocab = toks.groupBy("w").agg(F.count("*").alias("c"))
    # Corpus token total = Σ vocab counts: a 1-row aggregate cross-joined
    # in, keeping the whole computation one lazy plan (no eager re-scan).
    total = vocab.agg(F.sum("c").cast("double").alias("total"))
    logterm = F.round(F.log(F.col("c") / F.col("total")), 9).cast(
        "decimal(38,9)"
    )
    return (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(logterm) / F.count("*"), 4)
            .cast("double")
            .alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


@query(
    "q126_pmi_bigrams",
    oracle=r"""
    WITH arr AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           w -> length(w) >= 1) AS a
        FROM documents
    ),
    toks AS (SELECT unnest(a) AS w FROM arr),
    bigrams AS (
        SELECT unnest(list_transform(range(1, len(a)),
                                     i -> a[i] || ' ' || a[i + 1])) AS bg
        FROM arr
    ),
    uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1),
    tu AS (SELECT COUNT(*) AS t FROM toks),
    bi AS (SELECT bg, COUNT(*) AS c FROM bigrams GROUP BY 1),
    tb AS (SELECT COUNT(*) AS t FROM bigrams)
    SELECT string_split(b.bg, ' ')[1] AS w1,
           string_split(b.bg, ' ')[2] AS w2,
           b.c AS n_pair,
           CAST(ROUND(ln(((CAST(b.c AS DOUBLE) / tb.t)
                          / (CAST(u1.c AS DOUBLE) / tu.t))
                         / (CAST(u2.c AS DOUBLE) / tu.t)), 6) AS DOUBLE)
             AS pmi
    FROM bi b
    JOIN uni u1 ON string_split(b.bg, ' ')[1] = u1.w
    JOIN uni u2 ON string_split(b.bg, ' ')[2] = u2.w
    CROSS JOIN tu CROSS JOIN tb
    WHERE b.c >= 5
    ORDER BY w1, w2
    """,
)
def q126_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent word pairs — the
    collocation detector ("new york" vs chance co-occurrence) used for
    phrase mining and tokenizer-vocabulary induction in LLM data
    pipelines. PMI = ln(p(ab) / (p(a)·p(b))) with all counts corpus-wide.
    Plan shape: one pass builds per-doc token arrays; bigrams come from a
    JVM-side transform over array indices (order preserved, no window
    function, no shuffle until the count aggregations); the bigram table
    then equi-joins the unigram vocabulary twice. Like q118, the
    vocabulary sides are NEVER force-broadcast (Heaps' law); the two
    1-row totals are. Division/log expression shape is mirrored
    character-for-character in the oracle so both engines produce the
    same doubles before the 1e-6 rounding."""
    d = table(spark, sf_dir, "documents")
    arr = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"),
            lambda w: F.length(w) >= 1,
        ).alias("a"),
    )
    toks = arr.select(F.explode("a").alias("w"))
    bigrams = arr.select(
        F.explode(
            F.when(
                F.size("a") >= 2,
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg")
    )
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    tu = toks.agg(F.count("*").alias("tu"))
    bi = bigrams.groupBy("bg").agg(F.count("*").alias("c"))
    tb = bigrams.agg(F.count("*").alias("tb"))
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    u1 = uni.select(F.col("w").alias("w1k"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2k"), F.col("c").alias("c2"))
    joined = (
        bi.where(F.col("c") >= 5)
        .withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(u1, F.col("w1") == F.col("w1k"))
        .join(u2, F.col("w2") == F.col("w2k"))
        .crossJoin(F.broadcast(tu))
        .crossJoin(F.broadcast(tb))
    )
    pmi = F.round(
        F.log(
            (F.col("c").cast("double") / F.col("tb"))
            / (F.col("c1").cast("double") / F.col("tu"))
            / (F.col("c2").cast("double") / F.col("tu"))
        ),
        6,
    ).cast("double")
    return (
        joined.select(
            "w1",
            "w2",
            F.col("c").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy("w1", "w2")
    )


@query(
    "q130_token_ids",
    oracle=r"""
    WITH arr AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           w -> length(w) >= 1) AS a
        FROM documents
    ),
    toks AS (
        SELECT doc_id, s.w AS w, s.ord AS ord FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(a) + 1),
                          i -> struct_pack(w := a[i], ord := i))) AS s
            FROM arr)
    ),
    vocab AS (
        SELECT w, COUNT(*) AS c FROM toks GROUP BY 1
    ),
    ids AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS tok_id
        FROM vocab
    )
    SELECT t.doc_id AS doc_id,
           COUNT(*) AS n_tokens,
           string_agg(CASE WHEN t.ord <= 12 THEN CAST(i.tok_id AS VARCHAR) END,
                      ',' ORDER BY t.ord) AS ids12
    FROM toks t JOIN ids i ON t.w = i.w
    GROUP BY 1 ORDER BY 1
    """,
)
def q130_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer dictionary encoding: build a frequency-ranked vocabulary
    (id 1 = most common token, ties by token text) and re-encode each
    document's token stream as ids — the step between raw text and any
    training tensor. The id assignment runs over the O(vocab) count
    table as frequency-band × within-band rank (freq_banded_ids: exact
    count bands whose offset table is distinct-count-sized, then a
    token-prefix split inside each count so the hapax pileup never
    sorts in one task — the single-window row_number would funnel the
    whole vocabulary through one partition at 100 TB); the encode
    itself is a plain token→id equi-join (never broadcast — Heaps'
    law) with order carried by posexplode position. Output keeps
    the first 12 ids per doc as a string so the result stays narrow."""
    from ..operators.globalrank import freq_banded_ids

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"),
                lambda w: F.length(w) >= 1,
            )
        ).alias("pos", "w"),
    )
    from ..operators.stage import materialize_stage

    # freq_banded_ids consumes the vocab twice ((count, prefix) band
    # table + the ranked join-back) and exchange reuse does not dedup
    # the tokenize subtree — materialize it once.
    vocab = materialize_stage(
        toks.groupBy("w").agg(F.count("*").alias("c"))
    )
    ids = freq_banded_ids(vocab, "c", "w", "tok_id").select("w", "tok_id")
    return (
        toks.join(ids, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok_id"))
                        ),
                        1,
                        12,
                    ),
                    lambda s: s["tok_id"].cast("string"),
                ),
            ).alias("ids12"),
        )
        .orderBy("doc_id")
    )


@query(
    "q133_bm25_topk",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, g AS w
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS g
              FROM documents)
        WHERE length(g) >= 4
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, SUM(c) AS dl FROM tf GROUP BY 1),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    avgdl AS (
        SELECT """ + o_davg("dl", scale=9, count="COUNT(*)") + r""" AS avgdl
        FROM dl
    ),
    qterms AS (
        SELECT w, df FROM (
            SELECT w, df, ROW_NUMBER() OVER (ORDER BY df DESC, w) AS r
            FROM dfreq)
        WHERE r <= 3
    ),
    scored AS (
        SELECT tf.doc_id AS doc_id,
               COUNT(*) AS n_terms,
               CAST(ROUND(SUM(CAST(ROUND(
                   ln((n.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
                   * ((tf.c * 2.2)
                      / (tf.c + 1.2 * (0.25 + 0.75 * (dl.dl / avgdl.avgdl)))),
                   9) AS DECIMAL(38,9))), 6) AS DOUBLE) AS bm25
        FROM tf
        JOIN qterms q ON tf.w = q.w
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN n CROSS JOIN avgdl
        GROUP BY 1
    )
    SELECT * FROM (
        SELECT doc_id, n_terms, bm25
        FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20)
    ORDER BY doc_id
    """,
)
def q133_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75): score every document
    against the corpus's three highest-df terms and keep the top 20 — the
    classic search-side ranking that complements q131's TF-IDF cosine and
    q110's inverted index. Plan shape: one explode → one (doc, term) hash
    aggregate feeds term frequencies, doc lengths, AND document
    frequencies (shared subtree, no re-scan); the 3-term query set is a
    broadcast equi-join against the tf table, so the corpus-sized side is
    touched once and never sorted globally. N and avgdl ride as 1-row
    broadcasts. Per-term scores are rounded at 1e-9 and summed through
    decimal(38,9) (repo determinism pattern), so the top-20 cut ties
    identically in both engines. At 100 TB the tf aggregate shards by
    (doc, term) hash and the query-term join stays broadcast for any real
    query (terms ≪ vocab); nothing else is corpus-wide."""
    from ..operators.stage import materialize_stage

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).where(F.length("w") >= 4)
    # tf feeds FOUR branches (score join, doc lengths, document
    # frequencies, avgdl); without materialization each branch re-scans
    # and re-tokenizes the corpus (5 FileScans measured — at 100 TB,
    # five corpus passes). One eager localCheckpoint turns that into a
    # single tokenize + shuffle; the branches read stored blocks.
    tf = materialize_stage(
        toks.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("c").alias("dl"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    avgdl = dl.agg(
        F.round(F.sum(dterm("dl", 6)) / F.count("*"), 9)
        .cast("double")
        .alias("avgdl")
    )
    wq = Window.orderBy(F.col("df").desc(), F.col("w"))
    qterms = (
        dfreq.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= 3)
        .select("w", "df")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfc = (F.col("c") * F.lit(2.2)) / (
        F.col("c")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.col("avgdl")))
    )
    term_score = F.round(idf * tfc, 9).cast("decimal(38,9)")
    scored = (
        tf.join(F.broadcast(qterms), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum(term_score), 6).cast("double").alias("bm25"),
        )
    )
    return (
        scored.orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
        .orderBy("doc_id")
    )


@query(
    "q134_token_entropy",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, g AS w
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS g
              FROM documents)
        WHERE length(g) >= 1
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS n_tokens FROM tf GROUP BY 1)
    SELECT tf.doc_id AS doc_id,
           CAST(MAX(tot.n_tokens) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(ROUND(SUM(CAST(ROUND(
                 -(CAST(tf.c AS DOUBLE) / tot.n_tokens)
                  * ln(CAST(tf.c AS DOUBLE) / tot.n_tokens),
                 9) AS DECIMAL(38,9))), 6) AS DOUBLE) AS entropy,
           CAST(ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot.n_tokens), 6)
                AS DOUBLE) AS type_token_ratio
    FROM tf JOIN tot ON tf.doc_id = tot.doc_id
    GROUP BY 1
    ORDER BY 1
    """,
)
def q134_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy + type-token ratio per document — the
    lexical-diversity quality gate (low entropy = boilerplate/repetition,
    the same signal Gopher's repetition filters threshold differently in
    q72). Plan shape: one explode → one (doc, token) hash aggregate; the
    per-doc token total comes from a second hash aggregate on the SAME
    grouped table (map-side combinable, no window over the raw token
    stream). Each -p·ln(p) term is rounded at 1e-9 and summed through
    decimal(38,9) so the result is partition-order independent. At 100 TB
    both aggregates shard by doc hash; state is O(doc vocabulary), never
    corpus-wide."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).where(F.length("w") >= 1)
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    totals = tf.groupBy("doc_id").agg(F.sum("c").alias("n_tokens"))
    p = F.col("c").cast("double") / F.col("n_tokens")
    term = F.round(-p * F.log(p), 9).cast("decimal(38,9)")
    return (
        tf.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.round(F.sum(term), 6).cast("double").alias("entropy"),
            F.round(F.count("*").cast("double") / F.max("n_tokens"), 6)
            .cast("double")
            .alias("type_token_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "q174_boilerplate_coverage",
    oracle=r"""
    WITH arr AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           w -> length(w) >= 1) AS a
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(a)),
                      i -> a[i] || ' ' || a[i + 1])) AS g
        FROM arr
    ),
    df AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM bg GROUP BY 1),
    boiler AS (SELECT g FROM df WHERE df >= 25)
    SELECT b.doc_id AS doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN bo.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_templated,
           CAST(ROUND(CAST(SUM(CASE WHEN bo.g IS NOT NULL THEN 1 ELSE 0 END)
                           AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
             AS boiler_ratio
    FROM bg b LEFT JOIN boiler bo ON b.g = bo.g
    GROUP BY 1
    HAVING COUNT(*) >= 1
    ORDER BY 1
    """,
)
def q174_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated-span (boilerplate) coverage: the CCNet/RefinedWeb-style
    quality signal that measures how much of a document consists of
    spans repeated verbatim across the corpus (navigation chrome, cookie
    banners, license footers). A span here is a word bigram; a span is
    "templated" when it occurs in >= 25 distinct documents, and each
    document reports the fraction of its spans that are templated — the
    filter upstream pipelines threshold on before training. Plan shape:
    one pass builds per-doc token arrays, bigram occurrences explode
    from a JVM-side index transform (order irrelevant here, no window),
    the document-frequency table is one hash aggregate keyed on the
    span, and coverage is a span-keyed left join back to the occurrence
    stream + one per-doc aggregate. At 100 TB both shuffles are keyed on
    the span text (Zipf-skewed — the df AGGREGATE absorbs head spans
    map-side via partial combine; the coverage join's hot spans are
    linear fan-out against a 1-row-per-span df side, salt via
    operators/skew if one span truly dominates — AQE skew-split is not
    assumed, per the SCALE.md round-9 probe)
    and the df table is never broadcast — span vocabularies follow
    Heaps' law like word vocabularies (q118). The distinct-doc count
    per span is a partial-aggregated count(distinct) over (span, doc)
    pairs, not a collect."""
    d = table(spark, sf_dir, "documents")
    arr = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z]+"),
            lambda w: F.length(w) >= 1,
        ).alias("a"),
    )
    bg = arr.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("a") >= 2,
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    boiler = (
        bg.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= 25)
        .select("g", F.lit(1).alias("is_b"))
    )
    return (
        bg.join(boiler, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_b"), F.lit(0)))
            .cast("bigint")
            .alias("n_templated"),
            F.round(
                F.sum(F.coalesce(F.col("is_b"), F.lit(0))).cast("double")
                / F.count("*"),
                6,
            )
            .cast("double")
            .alias("boiler_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "q175_bigram_lm_interp",
    # Probability arithmetic is written with IDENTICAL operand order in
    # both engines (0.7 * (cb / c1) + 0.3 * (c2 / T)), each log term is
    # rounded at 1e-9, and the per-doc mean is a decimal(38,9) sum over
    # those rounded terms — partitioning/AQE order cannot move it.
    oracle=r"""
    WITH arr AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           w -> length(w) >= 1) AS a
        FROM documents
    ),
    toks AS (SELECT doc_id, unnest(a) AS w FROM arr),
    uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1),
    tu AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM toks),
    occ AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(a)),
                      i -> struct_pack(w1 := a[i], w2 := a[i + 1]))) AS s
        FROM arr
    ),
    occ2 AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM occ),
    bi AS (SELECT w1, w2, COUNT(*) AS cb FROM occ2 GROUP BY 1, 2)
    SELECT o.doc_id AS doc_id,
           COUNT(*) AS n_bigrams,
           CAST(ROUND(SUM(CAST(ROUND(ln(
                    0.7 * (CAST(b.cb AS DOUBLE) / u1.c)
                  + 0.3 * (CAST(u2.c AS DOUBLE) / tu.t)), 9)
                AS DECIMAL(38,9))) / COUNT(*), 4) AS DOUBLE) AS mean_logprob
    FROM occ2 o
    JOIN bi b ON o.w1 = b.w1 AND o.w2 = b.w2
    JOIN uni u1 ON o.w1 = u1.w
    JOIN uni u2 ON o.w2 = u2.w
    CROSS JOIN tu
    GROUP BY 1
    ORDER BY 1
    """,
)
def q175_bigram_lm_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram language-model scoring: mean log-probability
    of each document under a Jelinek-Mercer-smoothed bigram model
    (p = 0.7·p_bigram + 0.3·p_unigram) estimated from the corpus itself —
    the next step up from q118's unigram perplexity filter, sensitive to
    word ORDER, so shuffled/garbled text scores low even when its word
    histogram looks fine. Counts come from two hash aggregates (unigram,
    bigram); scoring joins the per-doc bigram occurrence stream back to
    both count tables by key. Like q118/q126, neither count table is
    force-broadcast (Heaps' law: at 100 TB the bigram table is far past
    the broadcast threshold; AQE decides), the 1-row token total is, and
    every join is a keyed equi-join — the scoring pass is exactly the
    TF-IDF shuffle shape. Backoff never hits zero because every scored
    bigram exists in the corpus it was counted from; a held-out variant
    would add the unigram floor the interpolation already provides."""
    from ..operators.stage import materialize_stage, parallelize_stage

    d = table(spark, sf_dir, "documents")
    # The token-array stage feeds both the unigram branch (toks→uni→tu)
    # and the bigram branch (occ→bi + scoring join); materialize it once
    # so tokenization doesn't re-run per branch (the q133 tf-stage rule),
    # parallelized first (tokenize is the CPU stage on a one-split scan).
    arr = materialize_stage(
        parallelize_stage(d).select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"),
                lambda w: F.length(w) >= 1,
            ).alias("a"),
        )
    )
    toks = arr.select(F.explode("a").alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    tu = toks.agg(F.count("*").cast("double").alias("t"))
    occ = arr.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("a") >= 2,
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> struct(element_at(a, i) AS w1,"
                    "             element_at(a, i + 1) AS w2))"
                ),
            ).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
    bi = occ.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    u1 = uni.select(F.col("w").alias("u1w"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("u2w"), F.col("c").alias("c2"))
    bik = bi.select(
        F.col("w1").alias("bw1"), F.col("w2").alias("bw2"), "cb"
    )
    p = F.lit(0.7) * (F.col("cb").cast("double") / F.col("c1")) + F.lit(
        0.3
    ) * (F.col("c2").cast("double") / F.col("t"))
    logterm = F.round(F.log(p), 9).cast("decimal(38,9)")
    return (
        occ.join(
            bik, (F.col("w1") == F.col("bw1")) & (F.col("w2") == F.col("bw2"))
        )
        .join(u1, F.col("w1") == F.col("u1w"))
        .join(u2, F.col("w2") == F.col("u2w"))
        .crossJoin(F.broadcast(tu))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum(logterm) / F.count("*"), 4)
            .cast("double")
            .alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


@query(
    "q188_zipf_slope",
    # Log terms are rounded at 1e-9 before the decimal moment sums
    # (q117's OLS closed form); slope/intercept arithmetic is written in
    # IDENTICAL operand order in both engines before the 1e-6 round.
    oracle="""
    WITH toks AS (
        SELECT g AS w
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS g
              FROM documents)
        WHERE length(g) >= 1
    ),
    vocab AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1),
    ranked AS (
        SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk
        FROM vocab
    ),
    pts AS (
        SELECT CAST(ROUND(ln(rnk), 9) AS DECIMAL(38,9)) AS x,
               CAST(ROUND(ln(c), 9) AS DECIMAL(38,9)) AS y
        FROM ranked WHERE rnk <= 200
    ),
    m AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(ROUND(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                        AS DECIMAL(38,9))) AS sxx,
               SUM(CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
                        AS DECIMAL(38,9))) AS sxy
        FROM pts
    )
    SELECT n AS n_points,
           CAST(ROUND(
               (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
               6) AS DOUBLE) AS zipf_slope,
           CAST(ROUND(
               (CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * CAST(sx AS DOUBLE)) / n,
               6) AS DOUBLE) AS intercept
    FROM m
    """,
)
def q188_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit: OLS slope of ln(count) on ln(rank) over
    the top-200 vocabulary — the corpus-health diagnostic (natural text
    fits slope ≈ −1; templated or synthetic corpora deviate sharply),
    run as a pre-training sanity gate. Plan: one token count aggregate,
    a row_number over the O(vocab) count table cut to 200 rows, then
    q117's closed-form OLS over decimal moments of 1e-9-rounded log
    terms — the whole fit is a 200-row computation after the count
    shuffle, and the vocab ranking at 100 TB uses the q130
    frequency-band trick instead of a single-partition sort."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).where(F.length("w") >= 1)
    vocab = toks.groupBy("w").agg(F.count("*").alias("c"))
    wr = Window.orderBy(F.col("c").desc(), "w")
    pts = (
        vocab.select("c", F.row_number().over(wr).alias("rnk"))
        .where(F.col("rnk") <= 200)
        .select(
            F.round(F.log("rnk"), 9).cast("decimal(38,9)").alias("x"),
            F.round(F.log("c"), 9).cast("decimal(38,9)").alias("y"),
        )
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("x").cast("double"), 9)
            .cast("decimal(38,9)")
        ).alias("sxx"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("y").cast("double"), 9)
            .cast("decimal(38,9)")
        ).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        n.alias("n_points"),
        F.round(slope, 6).cast("double").alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).cast("double").alias("intercept"),
    )


@query(
    "q201_rake_keywords",
    # Phrase segmentation is pure regex string algebra (identical RE2/
    # Java-regex subset in both engines; DuckDB needs the explicit 'g'
    # flag Spark applies by default). Word freq/degree are integer
    # counts; the degree/freq score and phrase sum are double ops in
    # identical order, rounded at 1e-6 BEFORE the top-20 ranking so the
    # cutoff is tie-broken identically (score DESC, phrase ASC).
    oracle=r"""
    WITH phr AS (
        SELECT trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
        FROM (
            SELECT UNNEST(string_split(
                regexp_replace(
                    regexp_replace(lower(text), '[^a-z]+', ' ', 'g'),
                    '\b(the|a|an|of|and|or|to|in|is|on|for|with|as|by|at|it)\b',
                    '|', 'g'),
                '|')) AS p
            FROM documents)
        WHERE trim(p) <> ''
    ),
    cand AS (
        SELECT phrase, string_split(phrase, ' ') AS ws
        FROM phr WHERE len(string_split(phrase, ' ')) BETWEEN 1 AND 4
    ),
    words AS (
        SELECT UNNEST(ws) AS w, len(ws) AS plen FROM cand
    ),
    stats AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(plen) AS BIGINT) AS degree
        FROM words GROUP BY w
    ),
    dphr AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               ANY_VALUE(ws) AS ws
        FROM cand GROUP BY phrase
    ),
    scored AS (
        SELECT d.phrase, d.n_occurrences,
               CAST(ROUND(SUM(CAST(s.degree AS DOUBLE) / s.freq), 6)
                    AS DOUBLE) AS score
        FROM (SELECT phrase, n_occurrences, UNNEST(ws) AS w FROM dphr) d
        JOIN stats s ON s.w = d.w
        GROUP BY d.phrase, d.n_occurrences
    )
    SELECT phrase, n_occurrences, score
    FROM scored ORDER BY score DESC, phrase LIMIT 20
    """,
)
def q201_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the corpus: candidate phrases are
    maximal stopword-free token runs (built with two regex passes — no
    per-doc window, no gaps-and-islands shuffle), word scores are
    corpus-wide degree/frequency, and a phrase scores the sum of its
    words. Everything is JVM-side string algebra + three keyed hash
    aggs; the per-phrase word join fans out by phrase length (≤4). At
    100 TB the word-stats table follows Heaps' law and is never
    force-broadcast — AQE decides from measured size."""
    stop = "the|a|an|of|and|or|to|in|is|on|for|with|as|by|at|it"
    phrases = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(
                    F.regexp_replace(
                        F.regexp_replace(F.lower("text"), "[^a-z]+", " "),
                        rf"\b({stop})\b",
                        "|",
                    ),
                    r"\|",
                )
            ).alias("p")
        )
        .select(
            F.trim(F.regexp_replace("p", " +", " ")).alias("phrase")
        )
        .where(F.col("phrase") != "")
    )
    cand = phrases.select(
        "phrase", F.split("phrase", " ").alias("ws")
    ).where(F.size("ws").between(1, 4))
    words = cand.select(
        F.explode("ws").alias("w"), F.size("ws").alias("plen")
    )
    stats = words.groupBy("w").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("degree")
    )
    dphr = cand.groupBy("phrase").agg(
        F.count("*").alias("n_occurrences"), F.any_value("ws").alias("ws")
    )
    scored = (
        dphr.select("phrase", "n_occurrences", F.explode("ws").alias("w"))
        .join(stats, "w")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.round(
                F.sum(F.col("degree").cast("double") / F.col("freq")), 6
            )
            .cast("double")
            .alias("score")
        )
    )
    return scored.select("phrase", "n_occurrences", "score").orderBy(
        F.col("score").desc(), "phrase"
    ).limit(20)


@query(
    "q226_vocab_coverage",
    # Token counts are exact integers; rank ties break on (count DESC,
    # token ASC) identically; coverage ratios are one double division
    # rounded at 1e-6.
    oracle=r"""
    WITH toks AS (
        SELECT UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents
    ),
    vocab AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM toks WHERE w <> '' GROUP BY w
    ),
    ranked AS (
        SELECT cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rk,
               SUM(cnt) OVER () AS total
        FROM vocab
    )
    SELECT k.k,
           CAST(SUM(CASE WHEN rk <= k.k THEN cnt ELSE 0 END) AS BIGINT)
               AS covered_tokens,
           CAST(MAX(total) AS BIGINT) AS total_tokens,
           CAST(ROUND(CAST(SUM(CASE WHEN rk <= k.k THEN cnt ELSE 0 END)
                           AS DOUBLE) / MAX(total), 6) AS DOUBLE)
               AS coverage
    FROM ranked CROSS JOIN (SELECT UNNEST([10, 50, 100, 500, 1000]) AS k) k
    GROUP BY k.k ORDER BY k.k
    """,
)
def q226_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what share of all corpus tokens the
    top-k vocabulary entries cover, at k ∈ {10,50,100,500,1000} — the
    first question of tokenizer/vocab design (Zipf's law makes small k
    cover most mass; q188 fits the slope, this reads the curve). One
    corpus hash agg builds the vocab; only ranks <= max(k)=1000 can
    contribute, so the rank runs AFTER a distributed top-1000 cut
    (orderBy+limit compiles to TakeOrderedAndProject — per-partition
    partial top-k, never the full vocabulary through one window task;
    same shape as q133/q188) and the in-window frame is 1000 rows at
    any scale. The corpus total is a plain aggregate, and the five
    cutoffs evaluate in one grouped pass over 1000x5 rows. The vocab
    table materializes once (tokenize runs a single time for its two
    consumers: the total aggregate and the top-1000 cut)."""
    from ..operators.stage import materialize_stage, parallelize_stage

    toks = (
        parallelize_stage(table(spark, sf_dir, "documents"))
        .select(
            F.explode(
                F.split(F.lower("text"), "[^a-z]+")
            ).alias("w")
        )
        .where(F.col("w") != "")
    )
    vocab = materialize_stage(
        toks.groupBy("w").agg(F.count("*").alias("cnt"))
    )
    tot = vocab.agg(F.sum("cnt").alias("total"))
    top = vocab.orderBy(F.col("cnt").desc(), "w").limit(1000)
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "w"))
        .alias("rk"),
    ).crossJoin(F.broadcast(tot))
    ks = spark.createDataFrame(
        [(10,), (50,), (100,), (500,), (1000,)], "k long"
    )
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("k"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
            F.max("total").cast("long").alias("total_tokens"),
            F.round(
                F.sum(
                    F.when(F.col("rk") <= F.col("k"), F.col("cnt")).otherwise(0)
                ).cast("double")
                / F.max("total"),
                6,
            )
            .cast("double")
            .alias("coverage"),
        )
        .orderBy("k")
    )


# --- Unicode normalization / homoglyph curation (round 12) -------------------
from ..operators.unicode_norm import (  # noqa: E402
    CONFUSABLE_FROM,
    CONFUSABLE_TO,
    ZERO_WIDTH_CLASS,
    confusable_skeleton,
    nfc_normalized,
)


@query(
    "q242_unicode_normalize",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_raw,
           CAST(length(nfc_normalize(
                  regexp_replace(text, '{ZERO_WIDTH_CLASS}', '', 'g')))
                AS BIGINT) AS n_norm,
           COALESCE(nfc_normalize(
                  regexp_replace(text, '{ZERO_WIDTH_CLASS}', '', 'g')) <> text,
                FALSE) AS changed
    FROM documents
    ORDER BY doc_id
    """,
)
def q242_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form for curation: strip zero-width/BOM chars
    (JVM regexp), then NFC-compose via an Arrow-batched pandas UDF —
    the one step Spark has no builtin for (operators/unicode_norm.py).
    `changed` is two-state (COALESCE FALSE on NULL text) because the
    tri-state boolean does not round-trip the pandas bridges
    identically (q30/q31 rule). Oracle: DuckDB nfc_normalize."""
    d = table(spark, sf_dir, "documents")
    norm = nfc_normalized(F.col("text"))
    return (
        d.select(
            "doc_id",
            F.length("text").cast("long").alias("n_raw"),
            F.length(norm).cast("long").alias("n_norm"),
            F.coalesce(norm != F.col("text"), F.lit(False)).alias("changed"),
        )
        .orderBy("doc_id")
    )


@query(
    "q243_confusable_skeleton_dedup",
    oracle=f"""
    SELECT min(doc_id) AS canonical_id,
           md5(lower(translate(regexp_replace(text, '{ZERO_WIDTH_CLASS}', '', 'g'),
                               '{CONFUSABLE_FROM}', '{CONFUSABLE_TO}'))) AS skeleton_hash,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_raw_variants
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY skeleton_hash
    HAVING COUNT(*) > 1
    ORDER BY canonical_id
    """,
)
def q243_confusable_skeleton_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homoglyph-aware exact dedup: key on the confusable SKELETON
    (zero-width stripped, Cyrillic lookalikes folded to Latin,
    lowercased — operators/unicode_norm.py) so "pаypаl" and "paypal"
    land in one cluster. Entirely JVM-side (translate/lower/regexp):
    one hash-shuffle on the skeleton digest, no pairwise work —
    contentless (NULL) docs excluded per the dedup-family rule.
    n_raw_variants > 1 inside a cluster = confusable-only variants the
    byte-exact dedup (q39) would have missed."""
    d = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sk = confusable_skeleton(F.col("text"))
    return (
        d.select("doc_id", F.md5(sk).alias("skeleton_hash"), "text")
        .groupBy("skeleton_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_docs"),
            F.countDistinct("text").alias("n_raw_variants"),
        )
        .where(F.col("n_docs") > 1)
        .select("canonical_id", "skeleton_hash", "n_docs", "n_raw_variants")
        .orderBy("canonical_id")
    )
