"""NULL-robustness regression gate (VERDICT r10 #1).

FIXTURES.md permits NULLs in every family-B column and the driver
regenerates testdata each round, yet the shipped corpora carry zero
NULLs — so NULL-semantics divergences stay latent until a regeneration
flips the driver's hash gate.  Round 11 swept all 209 oracle queries
against a seeded NULL-injected copy of sf0.001 (scripts/null_sweep.py)
and fixed 29 divergences across six families; this test pins every one
of them (plus the r10 one-off NULL pins) by rebuilding the nulled
corpus and re-running the engine-pair compare.

The injection is deterministic (crc32-keyed per (table, column), seed
11, frac 0.08 — identical cells every run), covers every non-key
column including timestamps, and the full set below costs ~3-5 min —
the full-registry sweep stays in scripts/null_sweep.py for per-round
use.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest

from iceberg_data_gen_spark import operators

operators.load_all()

from tests.oracle import compare

REPO = Path(__file__).resolve().parents[1]

# Every query the r11 sweep caught diverging on a NULL-bearing corpus,
# by family, plus the r10 planted-fixture class re-proved corpus-wide.
NULL_SENSITIVE = [
    # similarity: NULL embedding crashed the numpy grid kernels; NULL
    # label diverged the knn vote tie-break
    "q_ann_bruteforce",
    "q_ann_recall",
    "q_ann_lsh",
    "q_knn_classify",
    "q_ann_ivf_recall_floor",
    "q_ann_pq_recall_floor",
    "q_ann_ivfpq_recall_floor",
    "q_semdedup_audit",
    # windows: Spark ASC=NULLS FIRST vs DuckDB NULLS LAST, plus the
    # DuckDB 1.0 window-over-GROUP-BY nondeterminism (window-free
    # rewrites) and the coalesce(date_trunc) NULL-propagation bug
    "q_window_running",
    "q_window_frames",
    "q_window_distribution",
    "q_cumulative_order_volume",
    "q_lag_features",
    "q_ntile_binning",
    "q_revenue_mom_change",
    "q_sessionize",
    "q_scd2",
    "q_event_pagerank",
    "q_event_latest_state",
    "q_group_concat_topk",  # NULL-name on an acctbal tie (seed-17 pass)
    "q_customer_rfm",  # all-NULL date/price customers bin differently (wave 4)
    # streaming: window()/session_window() drop NULL event times
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_static_join",
    "q_stream_to_mor",
    "q_stream_dedup",
    # misc engine-function NULL skew
    "q_asof_join",                    # DuckDB ASOF NULL-left-ts artifact
    "q_array_agg",                    # list() keeps NULLs, collect_list drops
    "q_pandas_udaf",                  # NaN-poisoned numpy sum vs SQL skip
    "q_python_udtf",                  # split_part(NULL) = '' in DuckDB
    "q_scalar_string_date_math",      # concat() renders NULL as ''
    "q_string_functions_ext",         # split_part(NULL) = ''
    "q_dynamic_partition_overwrite",  # <> dropped the NULL partition
    # r10 planted-fixture class, re-proved on a full nulled corpus
    "q_multimodal_decode",
    "q_pii_scan",
    "q_ewma",
    "q_quality_score",
    "q_dedup_incremental",
    "q_embedding_neardup",
]

# The r11 KEYS pass (--null-keys: id/join keys nulled too) found a
# second class: entity-keyed computations meeting id-less rows.  The
# uniform rule applied on BOTH engines — a row whose entity id is NULL
# drops from id-keyed computations (it cannot be ranked, joined,
# deduplicated, checksummed, or given per-entity state), and pure ASC
# tie-breaks on nullable keys pin NULLS FIRST (Spark's default).
KEY_NULL_SENSITIVE = [
    "q_boilerplate_strip",
    "q_cogroup",
    "q_cooccurrence",
    "q_curriculum_order",
    "q_domain_mixture",
    "q_event_pagerank",
    "q_ewma",
    "q_knn_classify",
    "q_lag_features",
    "q_length_band_filter",
    "q_multimodal_meta",
    "q_multimodal_decode",
    "q_multimodal_frame_stats",
    "q_multimodal_shard_manifest",
    "q_multimodal_codec_audit",
    "q_pack_sequences",
    "q_repetition_score",
    "q_scd2",
    "q_semdedup_audit",
    "q_simpson_diversity",
    "q_stratified_sample",
    "q_stream_dedup",
    "q_window_rank_dense",
    "q_window_running",
    # latent-tie hygiene pass (r11): pins/filters added BEFORE a tied
    # NULL key ever coincided on a regenerated corpus
    "q_top_p_per_source",
    "q_window_topk_per_group",
    "q_sessionize",
    "q_global_shuffle",
    # wave 4 (review-confirmed at heavier fractions): rfm entity rule +
    # bin pins, the all-NULL top-3 list, NOT IN's three-valued
    # emptying, and two more o_orderkey tie pins
    "q_customer_rfm",
    "q_group_concat_topk",
    "q16_supplier_part_count",
    "q_window_frames",
    "q_lateral_topk",
    # r12 keys sweep (seed 7) misplaced 77 q_window_distribution rows —
    # the o_orderkey tie-break lacked its NULLS FIRST pin; the audit
    # over every unpinned ASC key-column sort found three latent
    # siblings (ntile bucket assignment, LIMIT-boundary top-k, the
    # Gini rank weight), each pinned before a corpus hit them
    "q_window_distribution",
    "q_ntile_binning",
    "q_topk",
    "q_customer_order_gini",
]


def _load_sweep_module():
    spec = importlib.util.spec_from_file_location(
        "null_sweep", REPO / "scripts" / "null_sweep.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def nulled_sf_dir(tmp_path_factory):
    from tests.conftest import SF_SMALL

    sweep = _load_sweep_module()
    dst = str(tmp_path_factory.mktemp("nulled-corpus"))
    report = sweep.build_nulled_corpus(
        SF_SMALL, dst, frac=0.08, seed=11, null_keys=False
    )
    # the gate is only meaningful if the injection actually happened
    n_cells = sum(sum(v.values()) for v in report.values())
    assert n_cells > 1000, report
    # keys must stay intact — the sweep's contract
    assert not any(k in cols for cols in report.values() for k in sweep.KEY_COLS)
    return dst


@pytest.fixture(scope="session")
def nulled_keys_sf_dir(tmp_path_factory):
    from tests.conftest import SF_SMALL

    sweep = _load_sweep_module()
    dst = str(tmp_path_factory.mktemp("nulled-keys-corpus"))
    report = sweep.build_nulled_corpus(
        SF_SMALL, dst, frac=0.04, seed=5, null_keys=True
    )
    # the gate must not pass vacuously (r11 wave 5): assert cells were
    # nulled AND that KEY columns were actually injected — a broken
    # null_keys plumbing otherwise serves a NULL-free corpus to every
    # keys-class compare
    n_cells = sum(sum(v.values()) for v in report.values())
    assert n_cells > 500, report
    key_hits = {
        c for cols in report.values() for c in cols if c in sweep.KEY_COLS
    }
    assert {"doc_id", "o_custkey", "user_id", "vec_id"} <= key_hits, report
    return dst


@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_query_matches_oracle_on_nulled_corpus(spark, nulled_sf_dir, name):
    assert name in operators.ORACLES, f"{name} lost its oracle"
    errors = compare(
        spark, name, operators.QUERIES[name], operators.ORACLES[name], nulled_sf_dir
    )
    assert not errors, errors


@pytest.mark.parametrize("name", KEY_NULL_SENSITIVE)
def test_query_matches_oracle_on_nulled_keys_corpus(spark, nulled_keys_sf_dir, name):
    assert name in operators.ORACLES, f"{name} lost its oracle"
    errors = compare(
        spark,
        name,
        operators.QUERIES[name],
        operators.ORACLES[name],
        nulled_keys_sf_dir,
    )
    assert not errors, errors


def test_doc_counts_match_the_parametrized_lists():
    """VERDICT r11 #7: README/SURVEY advertise this module's coverage as
    'NN family-B + MM key-class' and all three copies drifted to
    different mid-round numbers.  One source of truth: the docs must
    state exactly len(NULL_SENSITIVE) / len(KEY_NULL_SENSITIVE)."""
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    claim = rf"{len(NULL_SENSITIVE)} family-B \+ {len(KEY_NULL_SENSITIVE)} key-class"
    stale = rf"\d+ family-B \+ \d+ key-class"
    for doc in ("README.md", "SURVEY.md"):
        text = (repo / doc).read_text()
        hits = re.findall(stale, text)
        assert hits, f"{doc} no longer states the NULL-program counts"
        bad = [h for h in hits if not re.fullmatch(claim, h)]
        assert not bad, f"{doc} states stale counts {bad}; lists are {claim!r}"


# r12 element-NULL class: vectors CONTAINING a NULL element (the corpus
# generator can't emit them and cell-level injection can't create them,
# but FIXTURES.md's nullability contract doesn't forbid them) — DuckDB's
# list_inner_product raises outright on such input and the numpy grid
# kernels see an inhomogeneous object array.  The uniform rule, one
# level below the r11 entity rule: a vector with a missing dimension is
# not a vector — it drops from the vector universe on BOTH engines
# (common.vec_complete / vec_complete_sql, applied at normalized_vectors
# and every embeddings-reading oracle).
ELEMENT_NULL_SENSITIVE = [
    "q_ann_bruteforce",
    "q_ann_lsh",
    "q_ann_recall",
    "q_ann_ivf_recall_floor",
    "q_ann_pq_recall_floor",
    "q_ann_ivfpq_recall_floor",
    "q_knn_classify",
    "q_embedding_stats",
    "q_embedding_quantize",
    "q_embedding_norm_outliers",
    "q_embedding_neardup",
    "q_semdedup_audit",
]


@pytest.fixture(scope="session")
def nulled_elements_sf_dir(tmp_path_factory):
    from tests.conftest import SF_SMALL

    sweep = _load_sweep_module()
    dst = str(tmp_path_factory.mktemp("nulled-elements-corpus"))
    report = sweep.build_nulled_corpus(
        SF_SMALL, dst, frac=0.05, seed=11, null_keys=False, null_elements=0.02
    )
    # not vacuous: element cells must actually have been nulled
    assert report["embeddings"].get("embedding[]", 0) > 100, report
    return dst


@pytest.mark.parametrize("name", ELEMENT_NULL_SENSITIVE)
def test_query_matches_oracle_on_element_nulled_corpus(
    spark, nulled_elements_sf_dir, name
):
    assert name in operators.ORACLES, f"{name} lost its oracle"
    errors = compare(
        spark,
        name,
        operators.QUERIES[name],
        operators.ORACLES[name],
        nulled_elements_sf_dir,
    )
    assert not errors, errors


def test_rows_only_vector_kernels_survive_element_nulls(
    spark, nulled_elements_sf_dir
):
    """The rows-only ANN/semdedup kernels have no oracle to diverge from,
    but they consume the same corpus — pre-guard they crashed on the
    inhomogeneous np.array.  Surviving with sane output shapes is their
    element-NULL contract."""
    for name in ("q_ann_ivf", "q_ann_pq", "q_ann_ivfpq", "q_semdedup"):
        df = operators.QUERIES[name](spark, nulled_elements_sf_dir)
        assert df.count() > 0, name


# ---------------------------------------------------------------------------
# r13 struct-NULL class (VERDICT r12 #5): a NULL *field inside* a
# non-NULL struct, or a NULL map VALUE under a live key — one structure
# level past the r12 element pass.  The shipped TPC-H-ish corpora carry
# no nested columns (every struct/map in this repo is DERIVED inside
# queries from scalar base columns, so the scalar sweep already reaches
# those paths: a nulled base column becomes a NULL struct field at the
# F.struct()/create_map() site).  These tests therefore pin three
# things: (a) the sweep's injection mechanics are correct and
# deterministic on nested types, ready for any future driver corpus
# that ships them; (b) Spark and DuckDB AGREE on NULL-field/NULL-value
# access semantics over a real nested parquet (the engine-pair contract
# the sweep would enforce); (c) a canary that flips if the corpus ever
# regenerates WITH nested columns, so the struct sweep gets armed
# instead of staying silently vacuous.
# ---------------------------------------------------------------------------


def _nested_probe_table():
    import pyarrow as pa

    n = 240
    structs = [
        None if i % 17 == 0 else {"a": i, "b": f"s{i % 7}", "inner": {"c": i * 2}}
        for i in range(n)
    ]
    maps = [
        None if i % 23 == 0 else [("k1", i * 1.5), ("k2", float(i % 5))]
        for i in range(n)
    ]
    lstructs = [
        None if i % 19 == 0 else [{"v": i + j} for j in range(i % 3 + 1)]
        for i in range(n)
    ]
    return pa.table(
        {
            "id": pa.array(range(n)),
            "s": pa.array(
                structs,
                type=pa.struct(
                    [
                        ("a", pa.int64()),
                        ("b", pa.string()),
                        ("inner", pa.struct([("c", pa.int64())])),
                    ]
                ),
            ),
            "m": pa.array(maps, type=pa.map_(pa.string(), pa.float64())),
            "ls": pa.array(
                lstructs, type=pa.list_(pa.struct([("v", pa.int64())]))
            ),
        }
    )


def test_struct_field_injection_mechanics():
    """_null_struct_fields: deterministic, parent-preserving, key-
    preserving, type-exact — on struct, map, and list<struct>."""
    sweep = _load_sweep_module()
    tbl = _nested_probe_table()

    assert sweep._type_has_nested(tbl.schema.field("s").type)
    assert sweep._type_has_nested(tbl.schema.field("m").type)
    assert sweep._type_has_nested(tbl.schema.field("ls").type)
    import pyarrow as pa

    assert not sweep._type_has_nested(pa.int64())
    assert not sweep._type_has_nested(pa.list_(pa.float32()))

    for col in ("s", "m", "ls"):
        arr = tbl.column(col).combine_chunks()
        out1, n1 = sweep._null_struct_fields(arr, "t", col, 0.4, seed=11)
        out2, n2 = sweep._null_struct_fields(arr, "t", col, 0.4, seed=11)
        # deterministic — identical cells every run
        assert out1.equals(out2) and n1 == n2
        # actually injected, type preserved exactly
        assert n1 > 20, (col, n1)
        assert out1.type == arr.type
        # the parent NULL mask is untouched: no new NULL parents, no
        # resurrected ones
        assert arr.is_null().equals(out1.is_null()), col
        # a different seed injects different cells
        out3, _ = sweep._null_struct_fields(arr, "t", col, 0.4, seed=12)
        assert not out1.equals(out3)

    # map KEYS survive verbatim (only values are nulled)
    m_in = tbl.column("m").combine_chunks().to_pylist()
    m_out, _ = sweep._null_struct_fields(
        tbl.column("m").combine_chunks(), "t", "m", 0.5, seed=11
    )
    for before, after in zip(m_in, m_out.to_pylist()):
        if before is None:
            assert after is None
        else:
            assert [k for k, _ in before] == [k for k, _ in after]


def test_struct_field_null_parity_spark_vs_duckdb(spark, tmp_path):
    """Engine-pair contract on a nested corpus WITH injected
    struct-field / map-value NULLs: field access, missing-key probes,
    NULL-skipping aggregates — the compare the sweep would run if the
    driver ever ships nested columns.  DuckDB 1.0 map extraction
    returns a LIST (``m['k'][1]`` is the scalar; missing key → empty
    list → NULL), which matches Spark's element_at semantics."""
    import duckdb
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    sweep = _load_sweep_module()
    tbl = _nested_probe_table()
    cols = []
    for field in tbl.schema:
        arr = tbl.column(field.name).combine_chunks()
        if sweep._type_has_nested(field.type):
            arr, n = sweep._null_struct_fields(arr, "probe", field.name, 0.3, 11)
            assert n > 0
        cols.append(arr)
    import pyarrow as pa

    path = str(tmp_path / "nested.parquet")
    pq.write_table(pa.table(cols, schema=tbl.schema), path)

    sdf = (
        spark.read.parquet(path)
        .select(
            "id",
            F.col("s.a").alias("a"),
            F.col("s.b").alias("b"),
            F.col("s.inner.c").alias("c"),
            F.element_at("m", F.lit("k1")).alias("k1"),
            F.element_at("m", F.lit("missing")).alias("k_miss"),
            F.size("m").alias("m_size"),
            F.element_at(F.col("ls"), 1).getField("v").alias("v0"),
        )
        .orderBy("id")
    )
    got = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT id, s.a AS a, s.b AS b, s.inner.c AS c,
               m['k1'][1] AS k1, m['missing'][1] AS k_miss,
               CAST(cardinality(m) AS INT) AS m_size,
               ls[1].v AS v0
        FROM '{path}' ORDER BY id
        """
    ).fetchall()
    assert got == want

    # NULL-skipping aggregates over an injected struct field agree
    agg_s = (
        spark.read.parquet(path)
        .agg(
            F.sum("s.a").alias("sum_a"),
            F.count("s.a").alias("cnt_a"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()[0]
    )
    agg_d = con.sql(
        f"SELECT SUM(s.a), COUNT(s.a), COUNT(*) FROM '{path}'"
    ).fetchone()
    assert (agg_s["sum_a"], agg_s["cnt_a"], agg_s["cnt"]) == agg_d


def test_shipped_corpus_has_no_nested_columns_yet():
    """Canary (r13): the struct sweep is VACUOUS on the shipped corpora
    because no table carries a struct/map column — every struct in the
    repo is derived from scalars, so the scalar+keys sweeps reach those
    paths.  If the driver ever regenerates testdata WITH nested
    columns, this flips: arm scripts/null_sweep.py --null-struct-fields
    and extend the sweep gates before trusting the round."""
    import pyarrow.parquet as pq

    from tests.conftest import SF_SMALL

    sweep = _load_sweep_module()
    from iceberg_data_gen_spark.session import TABLES

    nested = [
        (t, f.name)
        for t in TABLES
        for f in pq.read_schema(f"{SF_SMALL}/{t}.parquet")
        if sweep._type_has_nested(f.type)
    ]
    assert not nested, (
        f"corpus now ships nested columns {nested}: run the struct-NULL "
        "sweep (scripts/null_sweep.py --null-struct-fields) and pin any "
        "divergences before trusting this round"
    )


def test_vector_universe_guard_is_uniform():
    """Every embeddings-reading oracle must carry vec_complete_sql()
    VERBATIM — a hand-respelled guard can drift from the Spark twin
    (the md5_hash32_sql lesson, r11)."""
    from iceberg_data_gen_spark.operators.common import vec_complete_sql

    frag = vec_complete_sql()
    for name in ELEMENT_NULL_SENSITIVE:
        assert frag in operators.ORACLES[name], (
            f"{name} oracle lacks the verbatim vector-universe guard"
        )
