"""Corpus-curation operators: PII detection/redaction, lexical-diversity
and domain-shift statistics, and Zipf sanity checks over ``documents``.

These extend the training-data-pipeline surface (SURVEY.md §2.3
``text``/``dedup`` families) with the compliance + corpus-QA ops a
production pretraining pipeline runs before mixing: scan for personally
identifiable information, redact it, measure per-document lexical
diversity and per-source distribution shift, and sanity-check the
corpus rank-frequency curve.

Exactness playbook (same as ``text.py``): every aggregation is over
BIGINT counts or DECIMAL-accumulated per-term doubles — no
order-dependent float sums, no logarithms — so Spark and the DuckDB
oracle agree hash-exactly.  All hot paths are JVM built-ins
(regexp / array HOFs); zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_data_gen_spark.operators import register
from iceberg_data_gen_spark.operators.common import docs_table as _docs
from iceberg_data_gen_spark.operators.common import round_half_up, round_half_up_sql

# PII patterns, chosen from the RE2 ∩ java.util.regex common syntax so
# Spark (Java regex) and DuckDB (RE2) match identically: no lookarounds,
# no backreferences, only \d \b and bounded repetition.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONG_DIGITS = r"\d{9,}"  # SSN/phone/account-number-shaped runs


@register(
    "q_pii_scan",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN regexp_matches(text, '{PII_EMAIL}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(sum(CASE WHEN regexp_matches(text, '{PII_IPV4}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
           CAST(sum(CASE WHEN regexp_matches(text, '{PII_LONG_DIGITS}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_id_number,
           CAST(sum(coalesce(len(regexp_extract_all(text, '{PII_EMAIL}')), 0))
                AS BIGINT) AS n_emails,
           CAST(sum(coalesce(len(regexp_extract_all(text, '{PII_IPV4}')), 0))
                AS BIGINT) AS n_ips,
           CAST(sum(coalesce(len(regexp_extract_all(text, '{PII_LONG_DIGITS}')), 0))
                AS BIGINT) AS n_id_numbers
    FROM documents
    GROUP BY source
    """,
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII incidence report: how many documents (and how many
    total occurrences) match email / IPv4 / long-digit-run patterns —
    the compliance dashboard a curation pipeline gates a source on.

    One pass over the corpus: per-row regexp counts are map-side
    expressions inside WholeStageCodegen, reduced by a single
    ``groupBy(source)`` (map-side combinable) — at 100 TB the only
    exchange is |sources| rows.  The synthetic corpus is PII-free by
    construction, so at test scale this asserts the true-negative path
    end-to-end (zero false positives); the detection path is covered by
    ``tests/test_llm_ops.py::test_pii_detection_on_injected_fixtures``
    with planted PII.
    """
    docs = _docs(spark, sf_dir)
    n_email = F.regexp_count("text", F.lit(PII_EMAIL))
    n_ip = F.regexp_count("text", F.lit(PII_IPV4))
    n_id = F.regexp_count("text", F.lit(PII_LONG_DIGITS))
    # per-row coalesce (review r10): a NULL text yields NULL regexp
    # counts, and F.sum over an all-NULL group returns NULL where the
    # oracle's CASE...ELSE 0 / coalesce(len(...), 0) sums to 0 — the
    # same NULL-text parity class the r9 q_simpson_diversity fix closed
    def z(c) -> F.Column:
        return F.sum(F.coalesce(c, F.lit(0)))

    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        z((n_email > 0).cast("long")).alias("docs_with_email"),
        z((n_ip > 0).cast("long")).alias("docs_with_ip"),
        z((n_id > 0).cast("long")).alias("docs_with_id_number"),
        z(n_email.cast("long")).alias("n_emails"),
        z(n_ip.cast("long")).alias("n_ips"),
        z(n_id.cast("long")).alias("n_id_numbers"),
    )


@register(
    "q_pii_redact",
    oracle=f"""
    WITH r1 AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{PII_EMAIL}')) AS n1,
               regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
        FROM documents
    ),
    r2 AS (
        SELECT doc_id, n1,
               len(regexp_extract_all(t1, '{PII_IPV4}')) AS n2,
               regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
        FROM r1
    ),
    red AS (
        SELECT doc_id,
               n1 + n2 + len(regexp_extract_all(t2, '{PII_LONG_DIGITS}'))
                 AS n_redactions,
               regexp_replace(t2, '{PII_LONG_DIGITS}', '<ID>', 'g') AS redacted
        FROM r2
    )
    SELECT doc_id,
           CAST(n_redactions AS BIGINT) AS n_redactions,
           length(redacted) AS redacted_len,
           md5(redacted) AS redacted_md5
    FROM red
    WHERE n_redactions > 0 OR doc_id % 50 = 0
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: replace email / IPv4 / long-digit matches with
    typed placeholders and emit an audit row (redaction count + redacted
    length + md5 of the redacted text) for every touched document plus a
    2% sample of untouched ones — the md5 makes the oracle compare
    certify byte-identical redacted OUTPUT, not just matching counts.

    Each pattern's occurrence count is taken on the text AS THE CHAINED
    REWRITE SEES IT (after the earlier replacements), so n_redactions is
    exactly the number of substitutions performed — counting all three
    patterns on the original text would double-count overlaps (a
    ``\\d{9,}`` run inside an email's local part matches both patterns
    but is replaced once).

    Pure map: three chained ``regexp_replace`` expressions in one
    projection, no shuffle at all (the filter prunes the audit table,
    not the rewrite).  At 100 TB this is the shape you want — the
    rewrite streams through the scan and the sink, and the audit trail
    is a side output of the same pass.
    """
    docs = _docs(spark, sf_dir)
    t1 = F.regexp_replace("text", PII_EMAIL, "<EMAIL>")
    staged1 = docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).alias("n1"),
        t1.alias("t1"),
    )
    staged2 = staged1.select(
        "doc_id",
        "n1",
        F.regexp_count("t1", F.lit(PII_IPV4)).alias("n2"),
        F.regexp_replace("t1", PII_IPV4, "<IP>").alias("t2"),
    )
    staged3 = staged2.select(
        "doc_id",
        (F.col("n1") + F.col("n2") + F.regexp_count("t2", F.lit(PII_LONG_DIGITS)))
        .cast("long")
        .alias("n_redactions"),
        F.regexp_replace("t2", PII_LONG_DIGITS, "<ID>").alias("redacted"),
    )
    return (
        staged3.select(
            "doc_id",
            "n_redactions",
            F.length("redacted").alias("redacted_len"),
            F.md5("redacted").alias("redacted_md5"),
        )
        .where((F.col("n_redactions") > 0) | (F.col("doc_id") % 50 == 0))
    )


@register(
    "q_simpson_diversity",
    # round_half_up, not native round (r11 review: the same
    # representation-dependent tie class review r10 closed in text.py —
    # Spark BigDecimal HALF_UP vs DuckDB multiply-then-round)
    oracle=f"""
    WITH tok AS (
        -- doc_id IS NOT NULL (r11 keys pass): the oracle GROUPs BY
        -- doc_id (merging id-less docs) while Spark projects per row
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id IS NOT NULL
    ),
    c AS (SELECT doc_id, w, count(*) AS n FROM tok GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT)      AS n_tokens,
           CAST(sum(n * n) AS BIGINT)  AS sum_sq_counts,
           {round_half_up_sql(
               '1.0 - CAST(sum(n * n) AS DOUBLE) / (sum(n) * sum(n))', 6)}
               AS simpson_diversity
    FROM c
    GROUP BY doc_id
    """,
)
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity as the Simpson index
    ``1 - Σ n_w² / N²`` — the zero-logarithm entropy analog (high =
    varied vocabulary, low = repetitive boilerplate), a standard quality
    filter signal next to TTR and repetition score.

    ZERO shuffles: instead of explode → groupBy(doc, word) →
    groupBy(doc) (a corpus-sized exchange for a per-document statistic),
    ``Σ n_w²`` is computed inside the row — sort the word array, then
    one ``aggregate`` HOF pass sums the squares of the equal-adjacent
    run lengths.  Integer-exact until one final division, so the oracle
    (which uses the groupBy formulation) matches hash-exactly.
    """
    from iceberg_data_gen_spark.operators.common import run_length_fold

    # NULL-text docs drop on BOTH engines (review r9): the oracle's
    # unnest(string_split(NULL, ' ')) yields zero rows, removing the doc
    # before GROUP BY, while this pure projection would have emitted a
    # (doc_id, NULL, NULL, NULL) row — a rowcount mismatch on the
    # nullable corpus the fixture contract permits
    docs = _docs(spark, sf_dir).where(
        F.col("text").isNotNull()
        # id-less docs drop too (r11 keys pass — see the oracle comment)
        & F.col("doc_id").isNotNull()
    )
    words = F.split("text", " ")

    sum_sq = run_length_fold(
        words,
        extras=[("sumsq", F.lit(0).cast("long"))],
        # squared run length is banked when the run BREAKS (and once more
        # for the final run in finish)
        update=lambda acc, is_run, new_run: {
            "sumsq": F.when(is_run, acc["sumsq"]).otherwise(
                acc["sumsq"] + acc["run"] * acc["run"]
            )
        },
        finish=lambda a: a["sumsq"] + a["run"] * a["run"],
    )
    n = F.size(words).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        sum_sq.alias("sum_sq_counts"),
        round_half_up(
            F.lit(1.0) - F.col("sum_sq_counts").cast("double") / (n * n), 6
        ).alias("simpson_diversity"),
    )


@register(
    "q_source_divergence",
    # round_half_up, not native round (r11 review — see
    # q_simpson_diversity)
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    sw AS (SELECT source, w, count(*) AS c_sw FROM tok GROUP BY source, w),
    st AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY source),
    cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY w),
    tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n FROM cw)
    SELECT source,
           n_s AS n_tokens,
           count(*) AS n_shared_terms,
           {round_half_up_sql('''CAST(sum(CAST(
               (CAST(c_sw AS DOUBLE) / n_s - CAST(c_w AS DOUBLE) / n)
               * (CAST(c_sw AS DOUBLE) / n_s - CAST(c_w AS DOUBLE) / n)
               / (CAST(c_w AS DOUBLE) / n)
               AS DECIMAL(28, 18))) AS DOUBLE)''', 6)} AS chi2_divergence
    FROM sw JOIN st USING (source) CROSS JOIN tot JOIN cw USING (w)
    GROUP BY source, n_s
    """,
)
def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source domain shift: chi-square divergence between each
    source's unigram distribution and the whole-corpus distribution,
    over the source's observed vocabulary — the signal a data-mixture
    planner uses to spot off-distribution sources before weighting them.

    Plan: ONE explode + groupBy(source, word) builds the contingency
    table; the chi-square terms are exact IEEE expressions on
    bit-identical integer-ratio inputs, accumulated in DECIMAL so the
    sum is order-independent (the ``dsum`` playbook).  Broadcast hints
    only on the BOUNDED reductions — per-source totals (#sources rows)
    and the 1-row grand total; the word-totals side ``cw`` is
    VOCABULARY-sized and data-dependent, so it carries no hint (an
    explicit hint is honored UNCONDITIONALLY and would OOM the driver
    at that size — review r8): AQE broadcasts it while
    small and keeps the word-keyed shuffled join, which reuses the
    contingency table's own exchange, at web scale.  Everything
    upstream is map-side combinable.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    sw = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_sw"))
    st = sw.groupBy("source").agg(F.sum("c_sw").alias("n_s"))
    cw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    tot = cw.agg(F.sum("c_w").alias("n"))
    p_s = F.col("c_sw").cast("double") / F.col("n_s")
    p_c = F.col("c_w").cast("double") / F.col("n")
    term = ((p_s - p_c) * (p_s - p_c) / p_c).cast("decimal(28,18)")
    return (
        sw.join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        .join(cw, "w")
        .groupBy("source", "n_s")
        .agg(
            F.count(F.lit(1)).alias("n_shared_terms"),
            round_half_up(F.sum(term).cast("double"), 6).alias("chi2_divergence"),
        )
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_shared_terms",
            "chi2_divergence",
        )
    )


ZIPF_TOP = 10


@register(
    "q_zipf_check",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    freq AS (SELECT w, count(*) AS freq FROM tok GROUP BY w),
    ranked AS (
        SELECT w, freq,
               row_number() OVER (ORDER BY freq DESC, w) AS rnk
        FROM freq
    ),
    top1 AS (SELECT freq AS f1 FROM ranked WHERE rnk = 1)
    SELECT rnk, w AS word, CAST(freq AS BIGINT) AS freq,
           CAST(freq * rnk AS BIGINT) AS freq_x_rank,
           {round_half_up_sql('CAST(f1 AS DOUBLE) / freq', 4)} AS rank1_ratio
    FROM ranked CROSS JOIN top1
    WHERE rnk <= {ZIPF_TOP}
    """,
)
def q_zipf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rank-frequency (Zipf) sanity check: the top-ZIPF_TOP (10)
    words with ``freq × rank`` (≈ constant under Zipf's law) and the
    ratio of the top word's frequency to each — a one-glance corpus
    health panel that catches degenerate generations / boilerplate
    floods (the curve goes flat) without any logarithms (integer
    products + one division, engine-exact).

    Plan: explode → map-side-combined word count → top-ZIPF_TOP via a
    rank window over the vocabulary-sized aggregate (WindowGroupLimit
    keeps it a partial top-k at scale); the top frequency is a second
    window over the already-filtered ZIPF_TOP rows, so the heavy
    explode/count pipeline is planned exactly once (r11 review).
    """
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = freq.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("freq"), "w"))
    ).where(F.col("rnk") <= ZIPF_TOP)
    # f1 as a second window over the ALREADY-FILTERED <= ZIPF_TOP rows
    # (r11 review): the old rnk==1 branch + crossJoin re-planned the
    # whole explode/count/rank pipeline a second time (ReuseExchange
    # dedupes only the exchange, not the aggregation and window above
    # it) — this window sees ZIPF_TOP rows and stays in one lineage.
    # round_half_up, not native round (see q_simpson_diversity).
    f1 = F.max("freq").over(Window.partitionBy(F.lit(1)))
    return ranked.select(
        "rnk",
        F.col("w").alias("word"),
        "freq",
        (F.col("freq") * F.col("rnk")).cast("long").alias("freq_x_rank"),
        round_half_up(f1.cast("double") / F.col("freq"), 4).alias("rank1_ratio"),
    )
