"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, fingerprinting, word frequency).

All hot-path expressions are JVM built-ins (split / regexp / md5 /
higher-order array functions) — no Python UDFs — so they stay inside
WholeStageCodegen and scale linearly with a single shuffle per
aggregation.  Every query here is oracle-checked against DuckDB running
the same ANSI expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_data_gen_spark.operators import register
from iceberg_data_gen_spark.operators.common import (
    doc_order_key,
    md5_hash32_sql,
    ngram_expr,
    round_half_up,
    spread_scan,
    ttr_expr,
)
from iceberg_data_gen_spark.operators.common import docs_table as _docs

# language-marker stopword lists for the n-gram/stopword language-ID
# heuristic; priority order breaks score ties deterministically
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "de"],
    "es": ["el", "la", "los", "y", "es", "un", "de"],
    "zh": ["de", "shi", "le", "zai", "you", "he", "wo"],
}
_LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def _sql_marker_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({words})))"


def _spark_marker_count(lang: str):
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(F.split("text", " "), lambda x: F.array_contains(markers, x)))


@register(
    "q_text_stats",
    oracle="""
    SELECT doc_id,
           length(text)                                        AS text_len,
           len(string_split(text, ' '))                        AS n_words,
           len(list_distinct(string_split(text, ' ')))         AS n_distinct_words,
           floor(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0
                                                               AS avg_word_len,
           floor(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) * 10000.0 + 0.5) / 10000.0
                                                               AS ttr
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document length / word-count / type-token-ratio statistics."""
    docs = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    return docs.select(
        "doc_id",
        F.length("text").alias("text_len"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        # round_half_up, not F.round (review r10): native round() is
        # representation-dependent across engines on representable ties
        round_half_up(
            F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words, 4
        ).alias("avg_word_len"),
        round_half_up(ttr_expr(words), 4).alias("ttr"),
    )


@register(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                                  AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT)                      AS byte_len_est_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex (letter runs /
    digit runs / punctuation singletons), and the bytes/4 heuristic."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("long").alias("byte_len_est_tokens"),
    )


def _ngrams(arr: str, k: int) -> F.Column:
    """Positional k-grams over an ALIASED word-array column named ``arr``
    (the shared ``common.ngram_expr`` definition — see its docstring for
    the aliasing and ``size >= k`` guard contract)."""
    return F.expr(ngram_expr(arr, k))


def _lang_scores_spark(df: DataFrame) -> DataFrame:
    for lang in _LANG_ORDER:
        df = df.withColumn(f"s_{lang}", _spark_marker_count(lang))
    return df


# The argmax-with-fixed-tie-order classifier shared by q_lang_id and
# q_lang_confusion_matrix — ONE definition each for the SQL CASE and the
# Spark expression, so the confusion matrix can never desynchronize from
# the classifier it evaluates.
_PRED_LANG_SQL = """CASE WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
                WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
                WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
                WHEN s_es >= s_zh THEN 'es'
                ELSE 'zh' END"""


def _pred_lang_col() -> F.Column:
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_ORDER}
    return (
        F.when(s["en"] >= F.greatest(s["de"], s["fr"], s["es"], s["zh"]), "en")
        .when(s["de"] >= F.greatest(s["fr"], s["es"], s["zh"]), "de")
        .when(s["fr"] >= F.greatest(s["es"], s["zh"]), "fr")
        .when(s["es"] >= s["zh"], "es")
        .otherwise("zh")
    )


@register(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_sql_marker_count('en')} AS s_en,
               {_sql_marker_count('de')} AS s_de,
               {_sql_marker_count('fr')} AS s_fr,
               {_sql_marker_count('es')} AS s_es,
               {_sql_marker_count('zh')} AS s_zh
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang, s_en, s_de, s_fr, s_es, s_zh,
           {_PRED_LANG_SQL} AS pred_lang
    FROM scored
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language identification (deterministic argmax with
    fixed priority order en>de>fr>es>zh on ties)."""
    docs = _lang_scores_spark(_docs(spark, sf_dir))
    pred = _pred_lang_col()
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        "s_en",
        "s_de",
        "s_fr",
        "s_es",
        "s_zh",
        pred.alias("pred_lang"),
    )


@register(
    "q_quality_score",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               length(text) AS n,
               len(string_split(text, ' ')) AS n_words,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                   AS n_punct,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','a','of','and','is','to','in'))) AS n_stop
    FROM documents
    )
    SELECT doc_id,
           CAST(n_punct AS DOUBLE) / n                    AS punct_ratio,
           CAST(n_stop AS DOUBLE) / n_words               AS stopword_ratio,
           least(1.0, n / 500.0)                          AS length_score,
           0.4 * least(1.0, n / 500.0)
               + 0.4 * (CAST(n_stop AS DOUBLE) / n_words)
               + 0.2 * (1.0 - CAST(n_punct AS DOUBLE) / n) AS quality,
           CASE WHEN 0.4 * least(1.0, n / 500.0)
                    + 0.4 * (CAST(n_stop AS DOUBLE) / n_words)
                    + 0.2 * (1.0 - CAST(n_punct AS DOUBLE) / n) >= 0.5
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM m
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score: length, stopword ratio, and
    punctuation ratio — the standard pretraining-corpus filter features.

    Deliberately UNROUNDED: both engines evaluate the identical
    left-associative double expression, so the raw values are
    bit-identical — whereas rounding can land on a representable tie
    (0.52165 at 4dp did, at sf0.1) where HALF_UP and half-even engines
    disagree.  No rounding = no tie to disagree on.

    ``try_divide`` on both ratios (review r10): an EMPTY document makes
    ``n = 0``, which under Spark's default ANSI mode raised
    DIVIDE_BY_ZERO and killed the whole query while the DuckDB oracle
    returned a NULL-ratio row — the q_ols_per_source zero-variance
    class.  NULL ratios propagate to a NULL quality and a 'drop'
    verdict on both engines.
    """
    docs = _docs(spark, sf_dir)
    n = F.length("text")
    n_words = F.size(F.split("text", " "))
    n_punct = n - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
    n_stop = _spark_marker_count("en")
    punct_ratio = F.try_divide(n_punct.cast("double"), n)
    stop_ratio = F.try_divide(n_stop.cast("double"), n_words)
    length_score = F.least(F.lit(1.0), n / 500.0)
    quality = 0.4 * length_score + 0.4 * stop_ratio + 0.2 * (1.0 - punct_ratio)
    return docs.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        length_score.alias("length_score"),
        quality.alias("quality"),
        F.when(quality >= 0.5, "keep").otherwise("drop").alias("verdict"),
    )


@register(
    "q_word_freq",
    oracle="""
    SELECT w AS word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY n DESC, w
    LIMIT 50
    """,
)
def q_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word-frequency top-50 (explode → count → top-k).

    At scale: partial aggregation makes the shuffle carry one row per
    distinct word per partition, and the top-50 is TakeOrderedAndProject.
    """
    # r13 (guide §2.5): spread the degenerate one-row-group scan —
    # integer counts, deterministic (n, word) ordering: bit-identical.
    docs = spread_scan(_docs(spark, sf_dir), sf_dir, "documents", "doc_id")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(50)
    )


@register(
    "q_tfidf_top_terms",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df,
           floor(score * 1000000.0 + 0.5) / 1000000.0 AS tfidf, rn
    FROM (
        SELECT doc_id, term, tf, df,
               tf * (n_docs + 1.0) / (df + 1.0) AS score,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY tf * (n_docs + 1.0) / (df + 1.0) DESC, term
               ) AS rn
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    WHERE rn <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Uses the rational idf variant ``(N+1)/(df+1)`` (no logarithm): a
    single IEEE multiply+divide is bit-identical across engines, whereas
    ``ln`` differs in the last ulp between libm implementations and
    would make the ranking engine-dependent near ties.

    Plan shape (r7): term frequency per doc (one hash aggregation), then
    document frequency attached via ``count() OVER (PARTITION BY term)``
    — ONE exchange of the tf relation on term replaces the old
    groupBy(term)+join pair that exchanged tf on term TWICE; finally the
    per-doc top-k window (WindowGroupLimit partial top-k at scale).
    Measured 1.46s → 0.81s at sf0.1 and 3.62s → 2.02s on the 10× probe
    corpus, value-identical output.  Hot-term skew exposure is unchanged
    (the join shuffled every tf row by term too); at 100 TB a stopword
    pre-filter or df-threshold cuts both variants' skew the same way.
    """
    # r13: a spread_scan here measured inside noise (0.98 → 0.96 s) —
    # the tf aggregation's own exchange dominates — and cost a fifth
    # exchange against the four the plan lock pins; reverted (guide
    # §1.1: the empirical loop wins over the first-principles guess).
    docs = _docs(spark, sf_dir)
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    # r14 (guide §2.4 "two operations keyed the same way share one
    # exchange", VERDICT r13 #5): partitioning the exploded terms by
    # `term` BEFORE the tf aggregation lets both the groupBy(doc_id,
    # term) (hash-on-a-subset satisfies the clustered distribution —
    # all rows of a (doc, term) group share the term) and the df window
    # (partitionBy term) ride ONE exchange — the old shape shuffled the
    # tf relation twice (once on (doc_id, term) for the aggregate, once
    # on term for the window).  Exchange count 4 → 3 (plan-locked);
    # the term key also spreads the degenerate one-row-group testdata
    # scan, which is why the r13 spread_scan attempt is now subsumed.
    tf = (
        words.repartition("term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
    from pyspark.sql.window import Window

    wd = Window.partitionBy("term")
    w = Window.partitionBy("doc_id").orderBy(F.desc(score), "term")
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(wd))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "doc_id", "term", "tf", "df",
            round_half_up(score, 6).alias("tfidf"),
            "rn",
        )
    )


@register(
    "q_ngram_freq",
    oracle="""
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents)
    SELECT bigram, count(*) AS n
    FROM (
        SELECT unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS bigram
        FROM w
    )
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 30
    """,
)
def q_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency top-30 — the n-gram LM / contamination-
    check primitive.  Bigrams are built positionally with one array
    transform (no self-join), exploded, then hash-counted; the top-30 is
    TakeOrderedAndProject."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.split("text", " ").alias("w"))
        .where(F.size("w") >= 2)
        .select(F.explode(_ngrams("w", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(30)
    )


@register(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp,
           md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fp_normalized,
           substr(md5(text), 1, 8) AS fp_short
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: content hash + normalization-invariant hash."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.md5(F.lower(F.regexp_replace("text", " +", " "))).alias("fp_normalized"),
        F.substring(F.md5("text"), 1, 8).alias("fp_short"),
    )


@register(
    "q_contamination",
    oracle="""
    WITH grams AS (
        SELECT doc_id, source,
               unnest(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]))) AS g
        FROM documents
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE source = 'web'),
    hits AS (
        SELECT t.doc_id, count(*) AS n_shared
        FROM grams t JOIN bench b ON t.g = b.g
        WHERE t.source <> 'web'
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_shared FROM hits WHERE n_shared >= 3
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: training docs sharing ≥3
    distinct 3-grams with the held-out set (here: source='web' stands in
    for the benchmark corpus) — the n-gram-overlap decontamination
    pass every pretraining pipeline runs.

    Plan shape: both sides explode to distinct n-grams, the join is
    equi-keyed on the gram, and the per-doc hit count is one hash
    aggregation.  The broadcast hint on the benchmark side is the ONE
    deliberate exception to the no-hints-on-data-dependent-sides rule
    (review r8): a decontamination pass's build side is the EVAL SUITE's
    gram set — bounded by the benchmark corpus you ship, megabytes by
    design, not a function of training-corpus size — so pinning the
    broadcast is a design invariant, not a size guess.  At 100 TB the
    gram would be hashed to a 64-bit token before the join so the
    broadcast carries 8-byte keys.
    """
    docs = _docs(spark, sf_dir)
    grams = (
        docs.select("doc_id", "source", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(_ngrams("w", 3))).alias("g"),
        )
    )
    bench = grams.where(F.col("source") == "web").select("g").distinct()
    return (
        grams.where(F.col("source") != "web")
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 3)
    )


@register(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        -- doc_id IS NOT NULL (r11 keys pass): md5(NULL) sample keys
        -- sort engine-differently; id-less docs drop (entity rule)
        FROM documents WHERE doc_id IS NOT NULL
    )
    WHERE rn <= 20
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly 20 documents per
    language, chosen by md5-of-key order — reproducible across engines,
    runs, and partitionings (unlike sampleBy, whose outcome depends on
    the partition layout and seed stream).  The per-stratum quota is a
    rank-filter window, which Spark executes as a partial top-k
    (WindowGroupLimit) — no full sort of any stratum."""
    # id-less docs drop (r11 keys pass — see the oracle comment)
    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    from pyspark.sql.window import Window

    h = doc_order_key()
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "q_bpe_pair_counts",
    oracle="""
    WITH chars AS (
        SELECT string_split(lower(regexp_replace(text, '[^a-zA-Z]', '', 'g')), '') AS cs
        FROM documents
    )
    SELECT pair, count(*) AS n
    FROM (
        SELECT unnest(list_transform(range(1, len(cs)),
                                     i -> cs[i] || cs[i+1])) AS pair
        FROM chars
    )
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First iteration of byte-pair-encoding training: corpus-wide counts
    of adjacent symbol pairs (on the letters-only lowercased text), top
    20 — the merge-candidate table a BPE tokenizer trainer builds each
    round.  One explode + one hash aggregation + TakeOrderedAndProject."""
    docs = _docs(spark, sf_dir)
    cleaned = F.lower(F.regexp_replace("text", "[^a-zA-Z]", ""))
    base = docs.select(cleaned.alias("x")).where(F.length("x") >= 2)
    return (
        base.select(
            F.explode(
                F.expr("transform(sequence(1, length(x) - 1), i -> substring(x, i, 2))")
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


@register(
    "q_repetition_score",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents
        -- doc_id IS NOT NULL (r11 keys pass): the oracle GROUPs BY
        -- doc_id (merging id-less docs into one row) while Spark is a
        -- per-row projection — entity rule on both engines
        WHERE len(string_split(text, ' ')) >= 2 AND doc_id IS NOT NULL
    ),
    g AS (
        SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
        FROM w, UNNEST(range(1, len(ws))) AS t(i)
    ),
    c AS (
        SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           floor(CAST(max(cnt) AS DOUBLE) / sum(cnt) * 10000.0 + 0.5) / 10000.0
               AS top_bigram_frac
    FROM c
    GROUP BY doc_id
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal: the fraction of a document's
    word bigrams taken by its single most frequent bigram (high → boiler-
    plate / repeated spans; training pipelines drop docs above a cutoff).

    ZERO shuffles: the per-doc bigram histogram max is computed inside the
    row — sort the bigram array, then the longest run of equal adjacent
    elements IS the top bigram count (one ``aggregate`` HOF pass,
    O(n log n) per doc).  The explode → groupBy(doc, gram) → groupBy(doc)
    formulation shuffles one row per bigram occurrence — at 100 TB that
    is a corpus-sized exchange for a per-document statistic; this plan is
    a pure map over the scan, in WholeStageCodegen end-to-end.
    """
    # id-less docs drop (r11 keys pass — see the oracle comment)
    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    with_words = docs.select("doc_id", F.split("text", " ").alias("w"))
    grams = _ngrams("w", 2)

    from iceberg_data_gen_spark.operators.common import run_length_fold

    top_cnt = run_length_fold(
        grams,
        extras=[("best", F.lit(0).cast("long"))],
        update=lambda acc, is_run, new_run: {
            "best": F.greatest(acc["best"], new_run)
        },
        finish=lambda a: a["best"],
    )
    n = F.size(grams)
    return (
        with_words.where(F.size("w") >= 2)
        .select(
            "doc_id",
            n.cast("bigint").alias("n_bigrams"),
            round_half_up(top_cnt.cast("double") / n, 4).alias("top_bigram_frac"),
        )
    )


PACK_BUDGET = 2048  # tokens per packed training sequence


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH d AS (
        -- doc_id IS NOT NULL (r11 keys pass): the packing order IS
        -- doc_id — id-less docs have no deterministic slot
        SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM documents WHERE doc_id IS NOT NULL
    ),
    c AS (
        SELECT lang, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start_off
        FROM d
    )
    SELECT lang,
           CAST(floor(start_off / {PACK_BUDGET}.0) AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
    FROM c
    GROUP BY 1, 2
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for LLM pre-training: concatenate documents
    (per language, in deterministic doc_id order) and cut every
    PACK_BUDGET (2048) tokens; report how many docs and tokens land in each
    packed sequence.  A doc's sequence is determined by its cumulative
    start offset — the standard "pack then split at budget boundaries"
    layout a training-data writer uses to build fixed-length examples.

    One shuffle: the cumsum window partitions by lang and the
    (lang, seq_id) groupBy reuses that partitioning (seq_id is a
    function of data already clustered by lang).  NOTE on skew: a real
    100 TB run packs per (lang, shard) — the window key must carry the
    shard to parallelize beyond |langs| — the per-shard plan is this
    exact plan with a composite key.
    """
    # id-less docs drop (r11 keys pass — see the oracle comment)
    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    from pyspark.sql.window import Window

    n_tokens = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = docs.select("lang", "doc_id", n_tokens.alias("n_tokens"))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        d.withColumn("seq_id", F.floor(start / F.lit(float(PACK_BUDGET))).cast("bigint"))
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )


# first 8 md5 hex digits of the doc_id as a 32-bit uint — the ONE
# md5_hash32_sql definition shared with the simhash oracle (r11 review)
_SQL_HASH32 = md5_hash32_sql("CAST(doc_id AS VARCHAR)")


@register(
    "q_temperature_sample",
    oracle=f"""
    WITH counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    m AS (SELECT min(n) AS mn FROM counts),
    u AS (
        SELECT doc_id, source,
               ({_SQL_HASH32}) / 4294967296.0 AS frac
        FROM documents
    )
    SELECT u.doc_id, u.source
    FROM u JOIN counts USING (source) CROSS JOIN m
    WHERE frac * frac * CAST(counts.n AS DOUBLE) < CAST(m.mn AS DOUBLE)
    """,
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (T5/multilingual-style, α = 1/2):
    each source s is downsampled at rate sqrt(min_count / n_s), so the
    rarest source keeps everything and head sources shrink toward —
    but not to — parity.  The membership test is DETERMINISTIC: a doc
    survives iff u² · n_s < min_count where u is an md5-derived 32-bit
    fraction of its key.  Squaring instead of sqrt keeps the predicate
    to IEEE multiply/compare, bit-identical across engines, runs, and
    partition layouts — resampling a 100 TB corpus twice yields the
    same mixture.

    Plan shape: one tiny groupBy for the per-source counts (broadcast
    back), then a map-side filter over the corpus — no shuffle of the
    data itself.
    """
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("mn"))
    h32 = F.conv(
        F.substring(doc_order_key(), 1, 8),
        16,
        10,
    ).cast("long")
    frac = h32 / F.lit(4294967296.0)
    return (
        docs.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(mn))
        .where(frac * frac * F.col("n").cast("double") < F.col("mn").cast("double"))
        .select("doc_id", "source")
    )


@register(
    "q_bm25",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dlen FROM words GROUP BY doc_id),
    stats AS (
        SELECT count(*) AS n_docs, avg(CAST(dlen AS DOUBLE)) AS avgdl FROM dl
    ),
    q AS (
        SELECT term FROM words GROUP BY term
        ORDER BY count(*) DESC, term LIMIT 3
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM words
        WHERE term IN (SELECT term FROM q)
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               list_sum(list(
                   ((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (0.25 + 0.75 * (dlen / avgdl)))
                   ORDER BY term
               )) AS score
        FROM tf
        JOIN df USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, floor(score * 1000000.0 + 0.5) / 1000000.0 AS bm25
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against the corpus' three most
    frequent terms (a stand-in for a search query), top-20 — the lexical
    retrieval primitive for data curation (query-targeted corpus
    mining).

    Uses k1 = 1.2, b = 0.75 and the RATIONAL idf (N − df + ½)/(df + ½)
    (the classic Robertson idf without the log): every factor is one
    IEEE multiply/divide, so scores — and therefore the ranking — are
    bit-identical across engines, which a log-based idf cannot
    guarantee near ties.

    Plan shape: ONE corpus explode + one (doc, term) hash aggregation,
    materialized once (localCheckpoint) and reused by all downstream
    sides — doc lengths, query-term selection, and term frequencies all
    derive from it, so the corpus is scanned and exploded exactly once
    (three independent derivations would re-scan it three times) —
    then a broadcast join of tiny df/avgdl sides, one final per-doc
    sum, and a global top-20 (TakeOrderedAndProject).
    """
    # r13 (guide §2.5): the corpus explode + (doc, term) partial counts
    # ran single-task on the one-row-group testdata scan — spread first.
    # Counts are integers; the per-doc score fold is already sorted.
    docs = spread_scan(_docs(spark, sf_dir), sf_dir, "documents", "doc_id")
    tc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tc"))
        .localCheckpoint(eager=False)
    )
    dl = tc.groupBy("doc_id").agg(F.sum("tc").alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dlen").cast("double")).alias("avgdl"),
    )
    q = (
        tc.groupBy("term")
        .agg(F.sum("tc").alias("qn"))
        .orderBy(F.desc("qn"), "term")
        .limit(3)
        .select("term")
    )
    tf = tc.join(F.broadcast(q), "term").select(
        "doc_id", "term", F.col("tc").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    score_term = (
        idf
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dlen") / F.col("avgdl")))
        )
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        # deterministic fold (review r10): a plain double sum's
        # accumulation order follows the partial-aggregate merge order
        # and could drift from the oracle in the last ulp near the
        # top-20 cutoff; both engines now fold the (<= 3) per-term
        # scores in ascending term order — bit-identical by construction
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("term"), score_term.alias("s")))
            ).alias("ts")
        )
        .select(
            "doc_id",
            F.aggregate(
                "ts", F.lit(0.0), lambda acc, x: acc + x["s"]
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
        .select("doc_id", round_half_up(F.col("score"), 6).alias("bm25"))
    )


@register(
    "q_char_diversity",
    oracle="""
    WITH c AS (
      SELECT doc_id, string_split(text, '') AS chars FROM documents
    )
    SELECT doc_id,
           len(chars) AS n_chars_total,
           len(list_distinct(chars)) AS distinct_chars,
           CAST(CAST(list_sum(list_transform(list_distinct(chars),
                    ch -> CAST(len(list_filter(chars, x -> x = ch)) AS BIGINT)
                          * len(list_filter(chars, x -> x = ch)))) AS BIGINT)
                AS DOUBLE)
             / CAST(CAST(len(chars) AS BIGINT) * len(chars) AS DOUBLE)
             AS collision_prob
    FROM c
    """,
)
def q_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-collision probability (Simpson index) per document — a
    LOG-FREE quality proxy for gibberish/low-entropy text: the chance two
    random character draws collide, sum(c_i^2)/n^2.  High collision =
    repetitive/degenerate text; the rational form avoids libm entirely
    (exactness playbook — integer sums, ONE final division), unlike a
    Shannon-entropy score whose log2 drifts between engines.

    Shuffle-free and per-row: the whole computation is higher-order array
    functions over the row's own text (no explode, no groupBy) — at
    100 TB this is a map-only pass inside WholeStageCodegen.  ``Σ c_i²``
    rides the shared sorted-run-length fold (one O(n log n) sort + O(n)
    pass, same as curation's word-level Simpson) — the previous
    filter-per-distinct-char form was O(distinct × n) per row (review
    r7)."""
    from iceberg_data_gen_spark.operators.common import run_length_fold

    docs = _docs(spark, sf_dir)
    chars = F.split("text", "")
    ssq = run_length_fold(
        chars,
        extras=[("sumsq", F.lit(0).cast("long"))],
        update=lambda acc, is_run, new_run: {
            "sumsq": F.when(is_run, acc["sumsq"]).otherwise(
                acc["sumsq"] + acc["run"] * acc["run"]
            )
        },
        finish=lambda a: a["sumsq"] + a["run"] * a["run"],
    )
    n = F.size(chars).cast("long")
    return docs.select(
        "doc_id",
        F.size(chars).alias("n_chars_total"),
        F.size(F.array_distinct(chars)).alias("distinct_chars"),
        (ssq.cast("double") / (n * n).cast("double")).alias("collision_prob"),
    )


@register(
    "q_boilerplate_strip",
    oracle="""
    WITH toks AS (
      -- doc_id IS NOT NULL (r11 keys pass): the oracle GROUPs BY doc_id
      -- while Spark emits per-row — entity rule on both engines
      SELECT doc_id, string_split(text, ' ') AS arr
      FROM documents WHERE doc_id IS NOT NULL
    ), flat AS (
      SELECT doc_id, unnest(arr) AS tok,
             unnest(range(1, len(arr) + 1)) AS pos
      FROM toks
    ), top AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS c FROM flat GROUP BY tok
        ORDER BY c DESC, tok LIMIT 10
      )
    ), kept AS (
      SELECT doc_id, pos, tok FROM flat
      WHERE tok NOT IN (SELECT tok FROM top)
    )
    SELECT doc_id, count(*) AS n_kept,
           string_agg(tok, ' ' ORDER BY pos) AS cleaned
    FROM kept GROUP BY doc_id
    """,
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet/RefinedWeb 'strip the
    most common lines' step, token-granular here because the synthetic
    docs are single-line): find the 10 most frequent tokens corpus-wide
    (tie-break: token asc), delete them from every document, and emit the
    cleaned text with original token order preserved.

    Scale shape: ONE explode+groupBy computes the global top-10 (bounded
    driver collect — 10 scalars, like any global-threshold pipeline
    step); the strip itself is a shuffle-free higher-order filter against
    a literal array, applied per-row with order preserved — no second
    explode, no re-grouping, no sort."""
    # id-less docs drop (r11 keys pass — see the oracle comment);
    # the top-10 token census runs over the SAME filtered corpus
    docs = _docs(spark, sf_dir).where(F.col("doc_id").isNotNull())
    toks = F.split("text", " ")
    top = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(10)
        .collect()
    )
    top_arr = F.array(*[F.lit(r.tok) for r in top])
    kept = F.filter(toks, lambda t: ~F.array_contains(top_arr, t))
    return (
        docs.select(
            "doc_id",
            F.size(kept).alias("n_kept"),
            F.array_join(kept, " ").alias("cleaned"),
        )
        .where(F.col("n_kept") > 0)
    )


@register(
    "q_length_band_filter",
    oracle="""
    WITH ranked AS (
      -- the percentile spine excludes NULL n_chars (they cannot rank —
      -- Spark puts them first, DuckDB last, shifting every edge rank)
      -- and NULL doc_id (the rank tie-break) on BOTH engines; the final
      -- band filter below is unchanged — NULL n_chars rows fail BETWEEN
      -- identically on both (r11 keys pass)
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER () AS n
      FROM documents
      WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
    ), edges AS (
      SELECT max(CASE WHEN rn = ((n - 1) * 10) // 100 + 1 THEN n_chars END) AS p10_chars,
             max(CASE WHEN rn = ((n - 1) * 90) // 100 + 1 THEN n_chars END) AS p90_chars
      FROM ranked
    )
    SELECT d.doc_id, d.n_chars, d.lang, e.p10_chars, e.p90_chars
    FROM documents d, edges e
    WHERE d.n_chars BETWEEN e.p10_chars AND e.p90_chars
    """,
)
def q_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-band filtering (drop the shortest/longest tails, a standard
    pretraining-corpus step): keep documents whose n_chars lies between
    the exact 10th and 90th percentile ORDER STATISTICS (value at rank
    floor((n-1)*p)+1 under (n_chars, doc_id) order — pure integer rank
    arithmetic, no float interpolation, so both engines pick the
    identical element; exactness playbook).

    The exact order statistic needs a global sort (single-partition
    window) — fine for a threshold over scalar per-doc lengths; the
    100 TB variant swaps in approx_percentile over the same band filter,
    trading driver-exactness for a sample bound (documented, not
    default, because the oracle demands exactness)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    # percentile spine over non-null (n_chars, doc_id) only — see the
    # oracle comment (r11 keys pass); the band filter keeps `docs` whole
    spine = docs.where(F.col("n_chars").isNotNull() & F.col("doc_id").isNotNull())
    w = Window.orderBy("n_chars", "doc_id")
    ranked = spine.select(
        "n_chars",
        F.row_number().over(w).alias("rn"),
    ).crossJoin(F.broadcast(spine.agg(F.count(F.lit(1)).alias("n"))))
    edges = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("((n - 1) * 10) DIV 100 + 1"), F.col("n_chars")
            )
        ).alias("p10_chars"),
        F.max(
            F.when(
                F.col("rn") == F.expr("((n - 1) * 90) DIV 100 + 1"), F.col("n_chars")
            )
        ).alias("p90_chars"),
    )
    return (
        docs.select("doc_id", "n_chars", "lang")
        .crossJoin(F.broadcast(edges))
        .where(F.col("n_chars").between(F.col("p10_chars"), F.col("p90_chars")))
    )


def _chunk_slices(docs: DataFrame, width: int) -> DataFrame:
    """Shuffle-free fixed-width chunking core shared by q_doc_chunking
    and q_chunk_dedup (ONE definition of the slice arithmetic): one
    split + explode(sequence) per row; ``cw`` is the chunk's word-array
    slice, last chunk ragged."""
    w = F.split("text", " ")
    return (
        docs.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.ceil(F.size("w") / float(width))) - 1,
                )
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.slice(
                "w", (F.col("chunk_id") * width + 1).cast("int"), width
            ).alias("cw"),
        )
    )


@register(
    "q_doc_chunking",
    oracle="""
    WITH c AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    e AS (SELECT doc_id, w,
                 unnest(range(0, CAST(ceil(len(w) / 64.0) AS BIGINT))) AS chunk_id
          FROM c)
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(w, chunk_id * 64 + 1, chunk_id * 64 + 64), ' ')
               AS chunk_text,
           len(list_slice(w, chunk_id * 64 + 1, chunk_id * 64 + 64)) AS chunk_words
    FROM e
    """,
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size document chunking (training-sample prep): split each
    document into consecutive 64-token chunks, last chunk ragged.

    Spark-first: one ``split`` + ``explode(sequence(...))`` per row — no
    shuffle at all, perfectly parallel over input partitions, and the
    chunk text is built by ``slice``/``concat_ws`` inside codegen.  A
    stride < 64 (overlapping windows) is the same plan with the slice
    start multiplied by the stride instead of the width.  At 100 TB this
    is a pure map stage: output partitioning inherits input file splits.
    """
    return _chunk_slices(_docs(spark, sf_dir), 64).select(
        "doc_id",
        "chunk_id",
        F.concat_ws(" ", "cw").alias("chunk_text"),
        F.size("cw").cast("long").alias("chunk_words"),
    )


@register(
    "q_token_rarity",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents),
    cnt AS (SELECT word, count(*) AS c FROM tok GROUP BY word)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)           AS total_corpus_freq,
           count(*)                         AS n_tokens,
           CAST(sum(c) AS DOUBLE) / count(*) AS mean_token_freq
    FROM tok JOIN cnt USING (word)
    GROUP BY doc_id
    """,
)
def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality signal: mean corpus frequency of a
    document's tokens (documents of rare tokens score low -> "surprising"
    content; boilerplate of stock words scores high).

    Exactness: all aggregation is over BIGINT token counts (orderless),
    with ONE final double division — no float sums, no logs (playbook).
    Scale: the token->count map is VOCABULARY-sized — data-dependent,
    hundreds of millions of terms on a web corpus — so it carries NO
    broadcast hint (an explicit hint is honored unconditionally and
    would OOM the driver at that size; the _labels_to_clusters rule,
    review r8).  AQE broadcasts it while it measures small and keeps the
    word-keyed shuffled join — which reuses cnt's own word exchange —
    once it doesn't.
    """
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    cnt = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    return (
        tok.join(cnt, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("total_corpus_freq"),
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("c") / F.count(F.lit(1))).alias("mean_token_freq"),
        )
    )

@register(
    "q_chunk_dedup",
    oracle="""
    WITH c AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    e AS (SELECT doc_id, w,
                 unnest(range(0, CAST(ceil(len(w) / 32.0) AS BIGINT))) AS chunk_id
          FROM c),
    ch AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(w, chunk_id * 32 + 1, chunk_id * 32 + 32), ' '
               )) AS h
        FROM e
        WHERE len(list_slice(w, chunk_id * 32 + 1, chunk_id * 32 + 32)) = 32
    ),
    shared AS (
        SELECT h FROM ch GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT ch.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN s.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(sum(CASE WHEN s.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS dup_ratio
    FROM ch LEFT JOIN shared s ON ch.h = s.h
    GROUP BY ch.doc_id
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-SPAN detection (the cheap stand-in for
    suffix-array substring dedup): documents are cut into aligned
    32-token chunks, each chunk is content-hashed, and a chunk counts as
    duplicated when its hash occurs in >= 2 distinct documents.  Output:
    per-doc full-chunk count, duplicated-chunk count, and ratio (the
    usual drop/trim signal for template boilerplate).

    Plan: chunking is the shuffle-free map of ``q_doc_chunking``; the
    only shuffles are the hash groupBy (vocabulary of chunk hashes) and
    the per-doc re-aggregation.  The shared-hash side is data-dependent
    (every repeated template in the corpus), so it carries NO broadcast
    hint — AQE broadcasts it while small and falls back to the shuffled
    hash join (reusing the chunk-hash exchange) at corpus scale (review
    r8).  Integer counts + one final division keep both engines
    bit-equal.
    """
    chunks = (
        _chunk_slices(_docs(spark, sf_dir), 32)
        .where(F.size("cw") == 32)
        .select("doc_id", F.md5(F.concat_ws(" ", "cw")).alias("h"))
    )
    shared = (
        chunks.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_shared"))
    )
    return (
        chunks.join(shared, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce("is_shared", F.lit(0))).alias("n_dup_chunks"),
            (
                F.sum(F.coalesce("is_shared", F.lit(0))) / F.count(F.lit(1))
            ).alias("dup_ratio"),
        )
    )


@register(
    "q_quality_filter_funnel",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               len(string_split(text, ' ')) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS ttr
        FROM documents
    ),
    stages AS (
        SELECT 1 AS stage_no, 'ingest'        AS stage, count(*) AS survivors FROM scored
        UNION ALL
        SELECT 2, 'min_chars_150',  count(*) FROM scored WHERE n_chars >= 150
        UNION ALL
        SELECT 3, 'min_words_30',   count(*) FROM scored WHERE n_chars >= 150 AND n_words >= 30
        UNION ALL
        SELECT 4, 'ttr_above_0.25', count(*) FROM scored
         WHERE n_chars >= 150 AND n_words >= 30 AND ttr >= 0.25
        UNION ALL
        SELECT 5, 'lang_known',     count(*) FROM scored
         WHERE n_chars >= 150 AND n_words >= 30 AND ttr >= 0.25
           AND lang IN ('en', 'de', 'fr', 'es', 'zh')
    )
    SELECT stage_no, stage, survivors,
           floor(CAST(survivors AS DOUBLE)
                 / (SELECT count(*) FROM scored) * 10000.0 + 0.5) / 10000.0
               AS keep_rate
    FROM stages
    """,
)
def q_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor report for a chained C4-style quality filter
    (length -> word count -> type-token ratio -> language allowlist) —
    the acceptance dashboard every corpus-cleaning pipeline publishes.

    ONE scan, ONE aggregation: each stage's predicate becomes a
    conditional count in a single groupBy-less agg (no N passes, no
    self-joins), then the 5 stage rows are unpivoted from one row of
    counters — at 100 TB this costs exactly one map-side pass with a
    1-row reduce.  Counts are integers and the keep rate is one exact
    division, so both engines agree bitwise.
    """
    docs = _docs(spark, sf_dir)
    words = F.split("text", " ")
    d = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(words).alias("n_words"),
        ttr_expr(words).alias("ttr"),
    )
    s2 = F.col("n_chars") >= 150
    s3 = s2 & (F.col("n_words") >= 30)
    s4 = s3 & (F.col("ttr") >= 0.25)
    s5 = s4 & F.col("lang").isin("en", "de", "fr", "es", "zh")
    counters = d.agg(
        F.count(F.lit(1)).alias("c1"),
        F.sum(s2.cast("long")).alias("c2"),
        F.sum(s3.cast("long")).alias("c3"),
        F.sum(s4.cast("long")).alias("c4"),
        F.sum(s5.cast("long")).alias("c5"),
    )
    def _stage(no: int, name: str, col: str):
        return F.struct(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.col(col).alias("survivors"),
        )

    stages = F.array(
        _stage(1, "ingest", "c1"),
        _stage(2, "min_chars_150", "c2"),
        _stage(3, "min_words_30", "c3"),
        _stage(4, "ttr_above_0.25", "c4"),
        _stage(5, "lang_known", "c5"),
    )
    return (
        counters.select(F.col("c1"), F.explode(stages).alias("s"))
        .select(
            F.col("s.stage_no").alias("stage_no"),
            F.col("s.stage").alias("stage"),
            F.col("s.survivors").alias("survivors"),
            round_half_up(
                F.col("s.survivors").cast("double") / F.col("c1"), 4
            ).alias("keep_rate"),
        )
    )


BPE_ITERS = 3


def _bpe_train_oracle() -> str:
    """Chained-CTE twin of the iterative trainer: each iteration is a
    (pair-count, argmax, corpus-merge) CTE triple.  Weighted counts are
    integers and the argmax order (n DESC, pair ASC) is total, so every
    iteration is engine-exact."""
    sql = """
    WITH wf AS (
        SELECT w, count(*) AS wf
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 1 AND w NOT LIKE '%|%'
        GROUP BY w
    ),
    s0 AS (
        SELECT '||' || regexp_replace(w, '(.)', '\\1||', 'g') AS seq, wf FROM wf
    )
    """
    for i in range(1, BPE_ITERS + 1):
        p = i - 1
        sql += f""",
    p{i} AS (
        SELECT pair, CAST(sum(wf) AS BIGINT) AS n
        FROM (
            SELECT unnest(list_transform(range(1, len(ss)),
                                         j -> ss[j] || ' ' || ss[j+1])) AS pair,
                   wf
            FROM (SELECT list_filter(string_split(seq, '||'), x -> x <> '') AS ss,
                         wf
                  FROM s{p})
        )
        GROUP BY pair
    ),
    b{i} AS (SELECT pair, n FROM p{i} ORDER BY n DESC, pair LIMIT 1),
    s{i} AS (
        SELECT replace(seq,
                       '|' || split_part(pair, ' ', 1) || '||'
                           || split_part(pair, ' ', 2) || '|',
                       '|' || replace(pair, ' ', '') || '|') AS seq,
               wf
        FROM s{p}, b{i}
    )
    """
    sql += "\n    UNION ALL\n    ".join(
        f"SELECT {i} AS iter, pair, replace(pair, ' ', '') AS merged, n FROM b{i}"
        for i in range(1, BPE_ITERS + 1)
    )
    return sql


@register("q_bpe_train", oracle=_bpe_train_oracle())
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer training (the real loop, not just the
    first pair table): 3 rounds of corpus-wide weighted pair counting →
    argmax merge rule → merge applied to every word.

    Scale design: the corpus collapses to the DISTINCT-WORD table
    up front (BPE's standard trick — pair counts are weighted by word
    frequency, so each iteration shuffles |vocab| rows, not |corpus|).
    Each round is one explode + one hash aggregation; only the single
    argmax ROW is collected per round (the merge-rule table IS the
    trainer's output artifact, same as a production BPE trainer).

    Symbols are encoded with double-sentinel separators
    (``||sym||sym||``), so the literal ``replace('|x||y|' -> '|xy|')``
    consumes one sentinel from each side and adjacent occurrences still
    merge — exact greedy left-to-right BPE, bit-identical in Spark and
    DuckDB.
    """
    # r13 (guide §2.5): spread the degenerate scan feeding the
    # distinct-word table — integer weights, argmax ordering pinned by
    # (n DESC, pair): bit-identical.
    docs = spread_scan(_docs(spark, sf_dir), sf_dir, "documents", "doc_id")
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        # '|' is the sentinel byte of the symbol encoding below; a word
        # containing a literal pipe would make the encoding ambiguous
        # and the merges silently wrong, so such words are excluded from
        # training IN BOTH ENGINES (none exist in the synthetic corpus)
        .where((F.length("w") >= 1) & (~F.col("w").contains("|")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    cur = wf.select(
        F.concat(F.lit("||"), F.regexp_replace("w", "(.)", r"$1||")).alias("seq"),
        "wf",
    ).localCheckpoint(eager=False)
    rules = []
    for it in range(1, BPE_ITERS + 1):
        symbols = F.filter(F.split("seq", r"\|\|"), lambda x: x != F.lit(""))
        pairs = (
            cur.select(symbols.alias("ss"), "wf")
            # single-symbol words have no pairs; also guards Spark's
            # sequence(1, 0) which counts DOWN ([1, 0]) instead of empty
            .where(F.size("ss") >= 2)
            # shared gram construction (review r10: this was the fifth
            # hand-rolled copy of the bigram transform ngram_expr exists
            # to consolidate; same 'a b' strings, 0-based indexing)
            .select(
                F.explode(F.expr(ngram_expr("ss", 2))).alias("pair"),
                "wf",
            )
            .groupBy("pair")
            .agg(F.sum("wf").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("pair")).limit(1).collect()
        if not top:
            # no adjacent pairs left (all words single-symbol): the
            # oracle's argmax CTE goes empty here too, so training just
            # stops with the rules found so far
            break
        best = top[0]
        left, right = best["pair"].split(" ")
        merged = left + right
        rules.append((it, best["pair"], merged, int(best["n"])))
        cur = cur.select(
            F.replace(
                F.col("seq"),
                F.lit(f"|{left}||{right}|"),
                F.lit(f"|{merged}|"),
            ).alias("seq"),
            "wf",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(rules, "iter int, pair string, merged string, n long")


@register(
    "q_ols_per_source",
    oracle="""
    WITH m AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
               CAST(n_chars AS BIGINT) AS y
        FROM documents
    ),
    s AS (
        SELECT source,
               count(*)            AS n,
               CAST(sum(x) AS BIGINT)   AS sx,
               CAST(sum(y) AS BIGINT)   AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM m GROUP BY source
    )
    SELECT source, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / (n * sxx - sx * sx)                         AS slope,
           (sy - CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx) * sx) / n             AS intercept
    FROM s
    """,
)
def q_ols_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped model fit: closed-form OLS (chars ~ words) per source —
    the feature-engineering shape of "fit a small model per group" done
    WITHOUT Python: the sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
    INTEGER sums, so the one groupBy is map-side-combinable, order-
    independent, and engine-exact; the slope/intercept are then two
    IEEE-exact double expressions over those integers.  Compare
    applyInPandas-per-group (q_pandas_udaf territory): that ships rows
    to Python, this ships five longs per group."""
    docs = _docs(spark, sf_dir)
    x = F.size(F.split("text", " ")).cast("long")
    y = F.col("n_chars").cast("long")
    s = (
        docs.select("source", x.alias("x"), y.alias("y"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    # zero-variance guard (review r9): a source whose documents all have
    # the same word count makes the LONG denominator n·sxx − sx² zero;
    # ANSI Spark throws DIVIDE_BY_ZERO there while DuckDB returns NULL —
    # emit NULL explicitly so both engines agree (intercept inherits the
    # NULL through the slope term, same as the oracle's expression)
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        den != 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / den,
    )
    return s.select(
        "source",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


@register(
    "q_lang_confusion_matrix",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_sql_marker_count('en')} AS s_en,
               {_sql_marker_count('de')} AS s_de,
               {_sql_marker_count('fr')} AS s_fr,
               {_sql_marker_count('es')} AS s_es,
               {_sql_marker_count('zh')} AS s_zh
        FROM documents
    ),
    pred AS (
        SELECT lang AS labeled_lang,
               {_PRED_LANG_SQL} AS pred_lang
        FROM scored
    )
    SELECT labeled_lang, pred_lang,
           count(*) AS n_docs,
           CAST(count(*) AS DOUBLE)
               / sum(count(*)) OVER (PARTITION BY labeled_lang) AS row_share
    FROM pred
    GROUP BY labeled_lang, pred_lang
    """,
)
def q_lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a query: the confusion matrix of the
    stopword language-ID against the labeled language, with row-
    normalized shares — the model-eval aggregation an ML-data pipeline
    materializes after every classifier change.

    Reuses q_lang_id's exact scoring expressions (same markers, same
    deterministic tie order); one aggregation plus a per-label total
    window, integer counts, one exact division."""
    docs = _lang_scores_spark(_docs(spark, sf_dir))
    pred = _pred_lang_col()
    from pyspark.sql.window import Window

    counts = (
        docs.select(F.col("lang").alias("labeled_lang"), pred.alias("pred_lang"))
        .groupBy("labeled_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("labeled_lang")
    return counts.select(
        "labeled_lang",
        "pred_lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("row_share"),
    )


@register(
    "q_corpus_summary",
    oracle="""
    SELECT count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           count(DISTINCT md5(lower(trim(text)))) AS n_unique_docs,
           CAST(count(*) - count(DISTINCT md5(lower(trim(text)))) AS DOUBLE)
               / count(*) AS dup_rate,
           floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 10000.0 + 0.5)
               / 10000.0 AS mean_doc_chars
    FROM documents
    """,
)
def q_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus dashboard header: one row summarizing the whole
    training set — documents, tokens, characters, language/source
    diversity, exact duplication rate, mean length.

    ONE aggregation over one scan (the distincts plan via Expand with
    map-side partials); every number is an integer or one exact division
    of integers, so the headline the pipeline publishes is bit-stable
    run over run."""
    docs = _docs(spark, sf_dir)
    h = F.md5(F.lower(F.trim("text")))
    n_tok = F.size(F.split("text", " ")).cast("long")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(h).alias("n_unique_docs"),
        ((F.count(F.lit(1)) - F.countDistinct(h)).cast("double") / F.count(F.lit(1)))
        .alias("dup_rate"),
        round_half_up(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4)
        .alias("mean_doc_chars"),
    )
