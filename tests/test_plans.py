"""Physical-plan assertions — the 100 TB posture, regression-tested.

Correctness tests prove the operators compute the right answer at test
scale; these prove the *plans* are the ones that survive a 1000-executor
cluster: filters reach the parquet scan, projections prune the read
schema, dimension joins broadcast, top-k never materializes a full sort,
aggregations combine map-side, and rank-filter windows use the partial
top-k rewrite.  A regression here means a future edit silently bought a
plan that works at sf0.1 and dies at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from iceberg_data_gen_spark import operators

operators.load_all()

from tests.conftest import SF_DIR


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def q(name: str, spark):
    return operators.QUERIES[name](spark, SF_DIR)


def test_q1_filter_pushdown_and_column_pruning(spark):
    plan = plan_of(q("q1_pricing_summary", spark))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1].split("\n", 1)[0], plan
    # ReadSchema must NOT include columns the query never touches
    read_schema = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema, read_schema


def test_q6_tight_scan(spark):
    plan = plan_of(q("q6_forecast_revenue", spark))
    pushed = plan.split("PushedFilters", 1)[1].split("\n", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed, pushed
    read_schema = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "l_returnflag" not in read_schema, read_schema


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items",
     "q7_volume_shipping", "q8_market_share", "q9_product_type_profit"],
)
def test_star_joins_broadcast_dimensions(spark, name):
    plan = plan_of(q(name, spark))
    assert "BroadcastHashJoin" in plan, plan


def test_semi_anti_joins_are_semi_anti(spark):
    assert "LeftSemi" in plan_of(q("q_semi_join", spark))
    assert "LeftAnti" in plan_of(q("q_anti_join", spark))


def test_global_topk_is_take_ordered(spark):
    # global ORDER BY + LIMIT must compile to TakeOrderedAndProject
    # (per-partition top-k + driver merge), never a full Exchange+Sort
    plan = plan_of(q("q_topk", spark), mode="simple")
    assert "TakeOrderedAndProject" in plan, plan


def test_grouped_topk_uses_window_group_limit(spark):
    plan = plan_of(q("q_window_topk_per_group", spark))
    assert "WindowGroupLimit" in plan, plan


def test_aggregations_partial_then_final(spark):
    # two HashAggregate nodes (partial before the exchange, final after):
    # the shuffle carries one row per group per task, not raw rows
    plan = plan_of(q("q_distinct_agg", spark), mode="simple")
    assert plan.count("HashAggregate") >= 2, plan


def test_dedup_exact_single_shuffle(spark):
    plan = plan_of(q("q_dedup_exact", spark), mode="simple")
    assert plan.count("Exchange") == 1, plan


def test_scalar_functions_stay_in_codegen(spark):
    # the whole scalar surface must compile into WholeStageCodegen —
    # no BatchEvalPython (row-at-a-time UDF) anywhere
    plan = plan_of(q("q_scalar_string_date_math", spark), mode="simple")
    # "*(n)" node prefix == inside a WholeStageCodegen stage
    assert "*(1)" in plan and "BatchEvalPython" not in plan, plan


def test_correlated_subqueries_decorrelate(spark):
    # Catalyst must rewrite both correlated scalar subqueries into ONE
    # aggregate join (no per-row subplan nodes survive)
    plan = plan_of(q("q_correlated_scalar_subquery", spark), mode="simple")
    assert "InSubquery" not in plan and "ScalarSubquery" not in plan, plan


def test_streaming_uses_stateful_window_agg(spark):
    from iceberg_data_gen_spark.streaming.events import read_events_stream
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, SF_DIR)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .count()
    )
    # unexecuted streaming plan: watermark node must be present so state
    # eviction is bounded (no watermark = unbounded state at scale)
    plan = plan_of(agg, mode="simple")
    assert "EventTimeWatermark" in plan, plan


def test_partitioned_scan_prunes_directories(spark):
    # the year filter must be satisfied as a PartitionFilter (directory
    # pruning), not a data filter over all partitions
    plan = plan_of(q("q_partitioned_scan", spark))
    pf = plan.split("PartitionFilters", 1)
    assert len(pf) == 2 and "o_year" in pf[1].split("\n", 1)[0], plan


def test_exchange_reuse_dedupes_shuffles(spark):
    # the same aggregate consumed twice must reuse one exchange.  Exchange
    # reuse is a static planner rule; assert on the non-adaptive plan (AQE
    # re-derives the same reuse at runtime but renders it stage-by-stage,
    # which is shape-flaky to grep)
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(q("q_exchange_reuse", spark), mode="simple")
    finally:
        # restore the SAVED value, not a literal (review r8: a hardcoded
        # "true" force-enables AQE for every later test in the session)
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert "ReusedExchange" in plan, plan


def test_dpp_injects_dynamic_partition_filter(spark):
    # the dim-side filter must reach the fact scan as a
    # dynamicpruningexpression in PartitionFilters
    plan = plan_of(q("q_dpp_join", spark))
    assert "dynamicpruning" in plan.lower(), plan


def test_sessionize_single_exchange(spark):
    # lag window, running-sum window, and per-session groupBy must all
    # reuse ONE hash exchange on user_id — N exchanges here multiplies
    # the fact-table shuffle at scale
    plan = plan_of(q("q_sessionize", spark), mode="simple")
    assert plan.count("Exchange") == 1, plan


def test_funnel_has_no_joins(spark):
    # N-stage funnel must be conditional aggregation, never N self-joins
    plan = plan_of(q("q_funnel", spark), mode="simple")
    assert "Join" not in plan, plan


def test_gap_fill_broadcasts_dense_frame(spark):
    # the (entity × day) dense frame is tiny; it must broadcast, the
    # observed-counts side must not shuffle into a sort-merge join
    plan = plan_of(q("q_gap_fill", spark), mode="simple")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan


def test_repetition_score_is_shuffle_free(spark):
    # per-document statistic computed inside the row: zero exchanges
    plan = plan_of(q("q_repetition_score", spark), mode="simple")
    assert "Exchange" not in plan and "BatchEvalPython" not in plan, plan


def test_ngram_jaccard_is_equi_join(spark):
    # the pair join must stay equi-keyed on (lang, bucket) — a cartesian
    # or broadcast-nested-loop here is the quadratic blowup
    plan = plan_of(q("q_ngram_jaccard_pairs", spark), mode="simple")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Pre-bucketed, pre-sorted tables co-locate an equi-join: the plan
    has NO Exchange — the bucketing layout that turns a repeated 100 TB
    fact-fact join from two full shuffles into a local zip of bucket
    files.  (Broadcast disabled to force the sort-merge path.)"""
    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.session import load_tables

    t = load_tables(spark, SF_DIR, ("orders", "customer"))
    for name, df, key, path in (
        ("b_orders", t["orders"], "o_custkey", "bo"),
        ("b_customer", t["customer"], "c_custkey", "bc"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / path))
            .mode("overwrite")
            .saveAsTable(name)
        )
    joined = spark.table("b_orders").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(joined, mode="simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
    assert "SortMergeJoin" in plan and "Exchange" not in plan, plan


def test_ngram_jaccard_shares_one_shingle_exchange(spark):
    """The prefix-filter pipeline's four consumers of the shingle arrays
    (index a/b, verify a/b) must read ONE shared shuffle — a fork here
    recomputes the corpus-wide shingling per branch.  Also: constraint
    propagation must NOT push the shingle expression into the scan-side
    filter (the when()-wrap guards this)."""
    df = q("q_ngram_jaccard_pairs", spark)
    df.collect()  # a write would plan a SEPARATE execution; collect finalizes df's own
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed, executed[:200]
    assert "ReusedExchange" in executed or "ReusedQueryStage" in executed, executed
    # the scan filter must not contain the array_sort(transform(...)) expr
    scan_filters = [
        ln for ln in executed.splitlines()
        if "Filter" in ln and "array_sort" in ln and "Scan parquet" not in ln
    ]
    assert not any("split(text" in ln and "xxhash64" in ln for ln in scan_filters), scan_filters


def test_temperature_sample_no_corpus_shuffle(spark):
    # per-source counts are a tiny agg broadcast back; the corpus itself
    # is filtered map-side — its scan must feed the join without Exchange
    plan = plan_of(q("q_temperature_sample", spark), mode="simple")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_bm25_broadcasts_tiny_sides(spark):
    # query terms, df and corpus stats are tiny: all joins broadcast,
    # never a sort-merge shuffle of the exploded words
    plan = plan_of(q("q_bm25", spark), mode="simple")
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan  # global top-20, no full sort


def test_python_datasource_partitions_parallel(spark):
    # one input partition per generated "file" — executor-side generation
    df = q("q_python_datasource", spark)
    assert df.rdd.getNumPartitions() == 8
    plan = plan_of(df, mode="simple")
    assert "PythonDataSource" in plan or "BatchEvalPython" in plan or "Scan" in plan, plan


def test_mor_incremental_scan_is_plain_file_scan(spark):
    # incremental consumption must not pay the MoR anti-joins
    plan = plan_of(q("q_mor_incremental", spark), mode="simple")
    assert "Join" not in plan, plan


def test_mor_merge_scan_broadcasts_delete_side(spark):
    # after a merge, the scan's equality-delete anti-join must broadcast
    # the (tiny) delete side, never shuffle the data side.  The delete
    # side carries NO hint (data-dependent size — review r8): this
    # broadcast must come from the planner's own size estimate of the
    # delete-file scan, so a large delete set can degrade to a shuffle
    plan = plan_of(q("q_mor_merge", spark), mode="simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_lateral_topk_decorrelates_to_window(spark):
    """The correlated LATERAL ... ORDER BY ... LIMIT must decorrelate
    into a per-key window rank + equi-join — NOT re-execute the subquery
    per outer row (nested loop) — or it dies at the first big customer
    table."""
    plan = plan_of(q("q_lateral_topk", spark), mode="simple")
    assert "Window" in plan and "row_number" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_recursive_cte_executes(spark):
    # WITH RECURSIVE plans a UnionLoop/recursion node joined broadcast
    plan = plan_of(q("q_recursive_cte", spark), mode="simple")
    assert "BroadcastHashJoin" in plan, plan


def test_doc_chunking_no_shuffle(spark):
    """Chunking is a pure map stage: explode+slice must not introduce
    any Exchange — output partitioning inherits the input splits."""
    plan = plan_of(q("q_doc_chunking", spark))
    assert "Exchange" not in plan, plan


def test_token_rarity_vocab_join_adapts_to_broadcast(spark):
    """The vocabulary-count side carries NO broadcast hint — it is
    data-dependent (web-scale vocab would OOM an unconditional hint,
    review r8) — so the broadcast must come from AQE's runtime size
    measurement: assert it on the EXECUTED plan, where at test scale
    the join has converted to broadcast."""
    df = q("q_token_rarity", spark)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed, executed


def test_knn_classify_partial_topk(spark):
    """Per-query top-k runs the WindowGroupLimit partial rewrite before
    any shuffle of scored rows."""
    plan = plan_of(q("q_knn_classify", spark))
    assert "WindowGroupLimit" in plan, plan


def test_event_pagerank_broadcast_iterations(spark):
    """Every power-iteration join broadcasts the rank vector (hinted):
    the edge list is never shuffled across iterations."""
    plan = plan_of(q("q_event_pagerank", spark))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_column_profile_single_scan_expand(spark):
    """All per-column aggregates fold into one pass over orders (Catalyst
    plans the multi-distinct via Expand) — not one scan per column.

    r13 shape: the profile is TWO aggregates off one shared spread
    exchange — null/min/max (grouping-key-free fold) and the
    distinct-only Expand — because combining them forced the whole
    Expand output through SortAggregate (string min/max buffers are
    immutable) and a 1M-row Sort.  The unexecuted plan therefore prints
    two Scan nodes over the SAME exchange subtree (AQE reuses it at
    runtime — one physical scan+shuffle); the locks now pin the parts
    that matter at 100 TB: never a per-column scan loop, the Expand
    multi-distinct on the HashAggregate path, and NO Sort node anywhere
    in the profile."""
    plan = plan_of(q("q_column_profile", spark))
    # formatted mode prints each node twice (tree line + detail block),
    # so <= two scan nodes == at most four occurrences (6 columns would
    # print 12+ under the naive per-column loop)
    assert 0 < plan.count("Scan parquet") <= 4, plan
    assert "Expand" in plan, plan
    assert "HashAggregate" in plan, plan
    # the r13 split exists to kill the SortAggregate Sort: keep it dead
    import re

    assert not re.findall(r"\(\d+\) Sort\b", plan), plan
    # ADVICE r13: the two aggregate subtrees must actually SHARE the
    # spread exchange at runtime — "at most two scan nodes" alone would
    # also pass a refactor that forks into two full scans+shuffles.
    # Execute and check the final adaptive plan for stage/exchange reuse
    # (single-scan plans need none, so only multi-scan plans must reuse).
    df = q("q_column_profile", spark)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed, executed[:200]
    n_scans = executed.count("Scan parquet")
    assert n_scans == 1 or (
        "ReusedExchange" in executed or "ReusedQueryStage" in executed
    ), executed


def test_quality_filter_funnel_single_pass(spark):
    """The funnel must be ONE scan with conditional counters — not five
    scans of documents (the naive per-stage loop)."""
    import re

    plan = plan_of(q("q_quality_filter_funnel", spark))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    # final agg is a 1-row global aggregate, then generate/stack — no join
    assert "Join" not in plan, plan


def test_curriculum_order_no_global_sort_window(spark):
    """Global ranks must come from per-partition windows keyed on the
    range-partition id plus a broadcast offset join — never a
    single-partition window over the whole corpus."""
    import re

    df = q("q_curriculum_order", spark)
    plan = plan_of(df)
    # every Window node must carry a partition spec containing pid
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "pid" in m.group(1), plan
    assert "BroadcastHashJoin" in plan, plan


def test_stream_foreach_batch_sink_files(spark, tmp_path):
    """AvailableNow + foreachBatch lands parquet in the sink and the
    read-back aggregation broadcasts nothing (plain scan + agg)."""
    df = operators.QUERIES["q_stream_foreach_batch"](spark, SF_DIR)
    plan = plan_of(df)
    assert "Scan parquet" in plan and "HashAggregate" in plan, plan


def test_bucketed_join_no_exchange_below_smj(spark):
    """Both sides read bucketed, the SMJ consumes bucket layout directly,
    and the ONLY exchange in the plan is the final tiny groupBy — the
    amortized-shuffle property that makes bucketing worth the write."""
    import re

    plan = plan_of(q("q_bucketed_join", spark))
    assert plan.count("Bucketed: true") == 2, plan
    assert "SortMergeJoin" in plan, plan
    exchanges = re.findall(r"\(\d+\) Exchange\nInput.*\nArguments: ([^\n]*)", plan)
    assert len(exchanges) == 1 and "o_orderpriority" in exchanges[0], plan


def test_shard_manifest_never_reads_payload(spark):
    """The manifest must be computable from the metadata columns alone.
    On the synthetic source, meta.n_bytes derives from text, so text IS
    in the scan — the FALSIFIABLE property (review r8: the old
    presence-only check passed on any schema) is that the columns the
    manifest never touches (lang, source) are pruned out, i.e. the scan
    is not a full-row read."""
    plan = plan_of(q("q_multimodal_shard_manifest", spark))
    read_schema = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "doc_id" in read_schema, read_schema
    assert "lang" not in read_schema and "source" not in read_schema, read_schema


def test_embedding_quantize_shuffle_free(spark):
    """Per-vector quantization is a pure row-local map: zero exchanges,
    zero Python eval nodes."""
    plan = plan_of(q("q_embedding_quantize", spark), mode="simple")
    assert "Exchange" not in plan and "BatchEvalPython" not in plan, plan


def test_skew_salted_join_spreads_hot_keys(spark):
    """The salted join must actually shuffle on (key, salt) — a broadcast
    would bypass the pattern being demonstrated — and must not plan a
    cartesian/BNLJ."""
    plan = plan_of(q("q_skew_salted_join", spark), mode="simple")
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_event_latest_state_uses_window_group_limit(spark):
    """rank-filter rn=1 must compile to WindowGroupLimit (running top-1
    per reducer), never a full per-key sort + filter."""
    plan = plan_of(q("q_event_latest_state", spark))
    assert "WindowGroupLimit" in plan, plan


def test_top_p_single_exchange(spark):
    """Both windows (per-source total and running sum) plus the final
    groupBy must ride ONE hash exchange on source."""
    plan = plan_of(q("q_top_p_per_source", spark), mode="simple")
    assert plan.count("Exchange") == 1, plan


def test_pii_redact_pure_map(spark):
    """Redaction is a map-only rewrite: three chained regexp_replace in
    one projection, no Exchange anywhere — at 100 TB it streams scan to
    sink."""
    plan = plan_of(q("q_pii_redact", spark))
    assert "Exchange" not in plan, plan


def test_pii_scan_single_exchange(spark):
    """The PII incidence report pays exactly ONE exchange (the final
    groupBy(source) of map-side-combined partials)."""
    plan = plan_of(q("q_pii_scan", spark))
    assert plan.count("Exchange") <= 2, plan  # hash exchange (+AQE read)
    assert "HashAggregate" in plan, plan


def test_simpson_diversity_no_shuffle(spark):
    """Simpson Σn_w² is computed inside the row (sorted-run aggregate
    HOF) — the per-document statistic must NOT explode + shuffle a
    corpus-sized token table."""
    plan = plan_of(q("q_simpson_diversity", spark))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode at all


def test_source_divergence_broadcast_reductions(spark):
    """The BOUNDED reductions (per-source totals, 1-row grand total)
    are hinted broadcasts; the vocabulary-sized word-totals side is
    unhinted (data-dependent — review r8) and must still reach a
    broadcast via AQE at test scale: no sort-merge join anywhere in the
    executed plan."""
    df = q("q_source_divergence", spark)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed, executed
    assert "SortMergeJoin" not in executed, executed


def test_ann_ivfpq_single_corpus_pass(spark):
    """IVF+PQ scoring is ONE mapInPandas pass over the corpus scan; the
    only exchange in the plan is the final per-query top-k window (no
    join, no second scan, no corpus-sized shuffle)."""
    tree = plan_of(q("q_ann_ivfpq", spark)).split("\n\n")[0]
    assert tree.count("MapInPandas") == 1, tree
    assert tree.count("Exchange") == 1, tree
    assert "Join" not in tree, tree
    assert "WindowGroupLimit" in tree, tree


def test_tfidf_single_term_exchange_no_join(spark):
    """r7: document frequency rides count() OVER (PARTITION BY term)
    instead of groupBy(term)+join, so the tf relation is exchanged on
    term ONCE (measured 1.8x at sf0.1 and the 10x probe).  r14 tightened
    the shape again (VERDICT r13 #5): the exploded terms are partitioned
    by `term` BEFORE the tf aggregate, so the aggregate (hash on a
    subset of its grouping keys) and the df window share that ONE
    exchange — at most THREE shuffle exchanges total (term, the doc_id
    top-k window, and the 1-row n_docs reduction).  The only join
    allowed is the broadcast of that single n_docs row — a shuffled
    join on term reappearing means the old two-exchange plan
    regressed."""
    import re

    plan = plan_of(q("q_tfidf_top_terms", spark))
    body = plan.split("== Physical Plan ==", 1)[1]
    n_exchange = len(set(re.findall(r"\(\d+\) Exchange", body)))
    assert n_exchange <= 3, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan  # per-doc top-k stays partial


def test_char_diversity_no_shuffle(spark):
    """Character-collision Σc_i² is computed inside the row via the same
    sorted-run fold as the word-level Simpson (review r7 replaced an
    O(distinct×n) filter-per-distinct-char form) — the per-document
    statistic must stay a pure map over the pruned scan."""
    plan = plan_of(q("q_char_diversity", spark))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode at all


def test_asof_join_single_exchange_per_side_composite_keys(spark):
    """asof_join's union-sort plan (r8 composite-key support): ONE
    hash exchange on the full key tuple feeding ONE window sort — no
    cartesian/range-join explosion, no per-key Python.  The composite
    key must appear as a multi-column hashpartitioning, proving the
    window partitions on the whole tuple (per-key-tuple independence at
    the plan level)."""
    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.operators.asof import asof_join
    from iceberg_data_gen_spark.session import load_tables

    t = load_tables(spark, SF_DIR, ("orders", "events"))
    left = t["events"].select(
        "event_id",
        "user_id",
        (F.col("event_id") % 3).alias("k2"),
        "ts",
    )
    right = t["orders"].select(
        F.col("o_custkey").alias("user_id"),
        (F.col("o_orderkey") % 3).alias("k2"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("v"),
    )
    out = asof_join(
        left, right,
        left_key=["user_id", "k2"], right_key=["user_id", "k2"],
        left_ts="ts", right_ts="ts", value_cols=["v"],
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # the window's exchange hashes BOTH key columns together
    assert "hashpartitioning(__k0" in plan and "__k1" in plan, plan
    # exactly one window over the unioned sides
    assert plan.count("Window") >= 1
    # and the result is still correct on a spot key
    assert out.count() == left.count()  # left join preserves every row


@pytest.mark.parametrize(
    ("name", "min_bhj", "exact_shuffled"),
    [
        # (query, BroadcastHashJoin floor, exact count of shuffled joins
        #  allowed — the genuine fact-fact joins where BOTH sides scale
        #  with SF and a shuffle is the CORRECT 100 TB plan)
        ("q2_min_cost_supplier", 3, 1),   # partsupp min-cost self-join
        ("q3_shipping_priority", 2, 0),
        ("q5_local_supplier_volume", 3, 0),
        ("q7_volume_shipping", 3, 0),
        ("q8_market_share", 3, 0),
        ("q9_product_type_profit", 3, 0),
        ("q10_returned_items", 2, 0),
        ("q11_important_stock", 2, 0),
        ("q14_promo_revenue", 1, 0),
        ("q15_top_supplier", 2, 0),
        ("q16_supplier_part_count", 2, 0),
        ("q17_small_quantity_revenue", 2, 0),
        ("q18_large_volume_customer", 2, 0),
        ("q19_disjunctive_predicates", 1, 0),
        ("q20_potential_promotion", 3, 0),
        ("q21_waiting_supplier", 3, 1),   # lineitem anti/self-join
    ],
)
def test_unhinted_star_dimensions_adapt_to_broadcast(
    spark, name, min_bhj, exact_shuffled
):
    """customer/supplier/part lost their hard broadcast hints (review
    r9: they SCALE with SF — a hint is honored unconditionally and OOMs
    the driver at 100 TB), so at test scale the broadcasts must come
    from the planner's own size estimates instead (VERDICT r9 #2:
    parameterized over EVERY de-hinted TPC-H query, not just q7/q9).

    Two locks per query on the EXECUTED (post-AQE) plan:

    * every dimension side still broadcasts — BroadcastHashJoin count
      at or above the per-query floor;
    * the number of shuffled joins (SortMergeJoin + ShuffledHashJoin)
      equals the known fact-fact joins exactly, so a silent SMJ/SHJ
      flip on ANY dimension side fails this test by name instead of
      costing 2× at bench time."""
    df = q(name, spark)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    n_bhj = executed.count("BroadcastHashJoin")
    n_shuffled = executed.count("SortMergeJoin") + executed.count(
        "ShuffledHashJoin"
    )
    assert n_bhj >= min_bhj, (name, n_bhj, executed[:400])
    assert n_shuffled == exact_shuffled, (name, n_shuffled, executed[:400])
