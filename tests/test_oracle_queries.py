"""Driver-style oracle comparison for every registered query with an oracle.

This is the same gate the round driver applies (CORRECTNESS_r{N}.json):
Spark result vs DuckDB running the oracle SQL on identical parquet inputs.
"""

from __future__ import annotations

import pytest

from iceberg_data_gen_spark import operators

operators.load_all()

from tests.conftest import SF_DIR
from tests.oracle import compare

ORACLE_NAMES = sorted(operators.ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    errors = compare(spark, name, operators.QUERIES[name], operators.ORACLES[name], SF_DIR)
    assert not errors, "\n".join(errors)


def test_every_query_has_entry_or_rowsonly_note(spark):
    # every registered query must at least run and return a schema'd DataFrame
    for name, fn in operators.QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_survey_inventory_matches_registry():
    """SURVEY.md §2.3 is the judge-facing per-query inventory; it must
    list exactly the registered queries with exactly the rows-only marks
    (a drifted inventory misreports coverage)."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    sec = text.split("### 2.3")[1].split("\n---")[0]
    listed = set(re.findall(r"q\w+", sec)) - {"queries", "query"}
    listed -= {"q2", "q11", "q20", "ql"}  # prose mentions, not entries
    reg = set(operators.QUERIES)
    assert listed == reg, (sorted(listed - reg), sorted(reg - listed))
    rows_only = {n for n in reg if n not in operators.ORACLES}
    marked = set(re.findall(r"(q\w+)\(rows-only", sec))
    assert rows_only == marked, rows_only ^ marked


def test_queries_ordering_surfaces_unverified_first():
    """The driver checks only the first ~50 queries() entries per round;
    coverage converges to the full registry ONLY because unverified
    entries sort first (oracle-bearing before rows-only).  Lock that
    ordering: after the first previously-verified entry, no unverified
    one may appear, and within the unverified prefix every oracle-bearing
    entry precedes every rows-only one."""
    import __spark_entry__ as e

    verified, _ = e._driver_history()
    names = list(e.queries())
    assert set(names) == set(operators.QUERIES)  # a permutation, no loss
    first_verified = next(
        (i for i, n in enumerate(names) if n in verified), len(names)
    )
    tail = names[first_verified:]
    assert all(n in verified for n in tail), [n for n in tail if n not in verified][:5]
    prefix = names[:first_verified]
    last_oracle = max(
        (i for i, n in enumerate(prefix) if n in operators.ORACLES), default=-1
    )
    first_rowsonly = next(
        (i for i, n in enumerate(prefix) if n not in operators.ORACLES),
        len(prefix),
    )
    assert last_oracle < first_rowsonly or first_rowsonly == len(prefix), (
        last_oracle, first_rowsonly,
    )


def test_queries_verified_tail_rotates_by_staleness():
    """With the registry fully driver-proven, the verified tail must be
    ordered by ascending last-driver-checked round (ties by registration
    order) so the ~50 capped slots cycle the whole registry every ~4
    rounds instead of re-checking the same oldest registrations forever
    (VERDICT r5 #1)."""
    import __spark_entry__ as e

    verified, last_round = e._driver_history()
    names = list(e.queries())
    reg_order = {n: i for i, n in enumerate(operators.QUERIES)}
    tail = [n for n in names if n in verified]
    keys = [(last_round.get(n, 0), reg_order[n]) for n in tail]
    assert keys == sorted(keys), "verified tail not sorted by staleness"
    # the head of the tail must be the most-starved slice: nothing checked
    # later than round R may precede anything last checked in round < R
    if tail:
        head_round = last_round.get(tail[0], 0)
        assert head_round == min(last_round.get(n, 0) for n in tail)


def test_history_fold_resurfaces_regressions():
    """A query green in round 1 but FAILED in round 3 must NOT count as
    verified (ADVICE r6 #1): the old fold kept it verified-forever AND the
    failure row made it look freshly-checked, so a regression waited ~4
    rounds for driver re-proof.  The latest recorded row decides."""
    import __spark_entry__ as e

    green = {"hash_match": True, "err": None}
    fail = {"hash_match": False, "err": "hash_mismatch"}
    rows_only = {"hash_match": None, "err": "no_oracle"}
    history = [
        (1, {"a": green, "b": green, "c": rows_only}),
        (3, {"a": fail, "d": fail}),
        (4, {"d": green}),
    ]
    verified, last_round = e._fold_history(history)
    # a regressed after its green -> not verified, re-surfaces in the head
    assert "a" not in verified
    # b stayed green, c rows-only-by-design, d failed then re-proved green
    assert {"b", "c", "d"} <= verified
    assert last_round == {"a": 3, "b": 1, "c": 1, "d": 4}
    # and a never-green failure is of course unverified
    assert "a" in last_round and last_round["a"] == 3
    # r8: a rows-only green row stops verifying once the query GAINS an
    # oracle — the new oracle must be driver-witnessed, so the name sorts
    # back into the unverified head instead of riding the staleness tail
    verified2, _ = e._fold_history(history, oracle_names={"c"})
    assert "c" not in verified2
    assert {"b", "d"} <= verified2


def test_no_raw_float_round_in_oracles():
    """Convention lock (r7 review): money/measure sums and averages must
    accumulate in DECIMAL (``dsum``/``dsum_sql``) before rounding — a raw
    ``round(sum(double_col))`` / ``round(avg(double_col))`` drifts with
    partition merge order and can flip a rounding boundary on ONE engine,
    failing the driver hash flakily.  This scans every registered oracle
    for the anti-pattern on the known double columns.  The old code
    coincided with the oracle on current testdata (the drift is latent),
    so this is a convention lock, not a fails-on-old regression test.

    Allowed exception: ``l_quantity`` is integer-valued (verified in
    testdata), and integer-valued doubles below 2**53 sum exactly in any
    order, so raw avg/sum over it is order-independent.
    """
    import re

    float_cols = (
        "value|o_totalprice|l_extendedprice|l_discount|l_tax"
        "|p_retailprice|c_acctbal|s_acctbal|ps_supplycost"
    )
    pat = re.compile(
        r"round\(\s*(sum|avg)\(\s*(" + float_cols + r")\b", re.IGNORECASE
    )
    offenders = {
        name: m.group(0)
        for name, sql in operators.ORACLES.items()
        for m in [pat.search(sql)]
        if m
    }
    assert not offenders, f"raw float round(sum/avg(..)) in oracles: {offenders}"


def test_broadcast_hint_census():
    """Convention lock (review r8): ``F.broadcast`` hints are reserved
    for join sides BOUNDED BY DESIGN (1-row aggregates, per-source /
    per-type reductions, dimension tables, fixed query sets, file-level
    metadata, the decontamination pass's eval-suite gram set) — a hint
    on a DATA-DEPENDENT side (vocabulary counts, shared-hash sets,
    delete sets, dup-node labels) is honored unconditionally and OOMs
    the driver at scale; AQE/size-estimation must make that call.

    Every current hint was audited against that rule this round (four
    data-dependent hints removed: q_token_rarity, q_chunk_dedup,
    q_source_divergence's word totals, the MoR scan's delete sides).
    This census pins the per-file count so ADDING a hint forces the
    author to re-justify it here and at the call site; removals only
    need the count updated.  Counted by walking the AST for real
    ``F.broadcast(...)`` CALL nodes (ADVICE r8: a text count would tick
    on comments/docstrings that merely mention the hint)."""
    import ast
    from pathlib import Path

    import iceberg_data_gen_spark

    base = Path(iceberg_data_gen_spark.__file__).parent
    expected = {
        # r13: 5 → 6 — q_column_profile's SortAggregate split joins its
        # two 1-ROW aggregate halves back with broadcast(distincts): a
        # bounded side by construction (one row regardless of SF), the
        # same class as the existing 1-row reduction hints
        "operators/analytics.py": 6,
        # r11: 3 → 2 — q_zipf_check's broadcast(top1) crossJoin is gone
        # (the top frequency is now a second window over the 10 already-
        # filtered rows, removing the double-planned explode pipeline)
        "operators/curation.py": 2,
        "operators/pipeline.py": 3,
        "operators/relational.py": 3,
        # r9 second pass: the q3/q5/q10 scaling-table rule applied to the
        # sibling files — customer/supplier/part (and their filters,
        # exclusion lists, and per-part/per-supplier aggregates) lose
        # their hard hints; only bounded nation/region projections and
        # 1-row aggregates keep theirs
        "operators/relational2.py": 3,
        "operators/relational3.py": 17,
        # similarity.py: 4 as of r10 — the recall-floor witness gained a
        # 1-row max_k bound frame (bounded side, hint justified)
        "operators/similarity.py": 4,
        "operators/text.py": 9,
        # streaming/events.py: 0 as of r10 — q_stream_static_join lost
        # its customer hard-hint (the last scaling-table hint; VERDICT
        # r9 #1); the micro-batch broadcast now comes from the size
        # estimate, executed-plan-asserted in
        # tests/test_streaming.py::test_stream_static_join_broadcasts_by_size_estimate
        "table/table.py": 1,
    }
    got = {}
    for p in sorted(base.rglob("*.py")):
        n = sum(
            1
            for node in ast.walk(ast.parse(p.read_text()))
            if isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "broadcast"
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "F"
        )
        if n:
            got[str(p.relative_to(base))] = n
    assert got == expected, (got, expected)


def test_oracle_kernels_use_sequential_folds():
    """Convention lock (review r8, measured): numpy kernels whose floats
    are ORACLE-compared must fold dot products strictly left-to-right
    and round half-away — ``np.einsum`` drifts from DuckDB's sequential
    ``list_dot_product`` in the last ulp (~73% of dim-64 dots) and
    ``np.round`` is half-even where DuckDB rounds half-away.  einsum /
    np.round are therefore allowed ONLY inside the rows-only family
    (no oracle demands their ulps) and its trainers.  This walks the
    AST and pins the owning functions."""
    import ast
    from pathlib import Path

    import iceberg_data_gen_spark

    allowed = {
        # rows-only queries (no oracle_sql entry) + their shared trainers
        "similarity.py": {
            "_kmeans_centroids",
            "q_ann_ivf",
            "_pq_codebooks",
            "q_ann_pq",
            "q_ann_ivfpq",
            "q_semdedup",
        },
    }
    def uses_drifting_numpy(fn: ast.AST) -> bool:
        # real CALL nodes only — docstrings/comments naming einsum (to
        # explain why it is NOT used) must not trip the lock
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Attribute)
                and node.attr in ("einsum", "round")
                and isinstance(node.value, ast.Name)
                and node.value.id == "np"
            ):
                return True
        return False

    base = Path(iceberg_data_gen_spark.__file__).parent / "operators"
    offenders = set()
    for p in sorted(base.glob("*.py")):
        tree = ast.parse(p.read_text())
        # TOP-LEVEL functions only: nested kernel helpers live inside a
        # top-level owner and inherit its allowance
        for fn in tree.body:
            if isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if uses_drifting_numpy(fn) and fn.name not in allowed.get(
                    p.name, set()
                ):
                    offenders.add((p.name, fn.name))
    assert not offenders, (
        "einsum/np.round in an oracle-bearing (non-allowlisted) top-level "
        f"function: {sorted(offenders)} — use the sequential fold + "
        "half-away rounding pattern (see similarity.grid_scores)"
    )


def test_compare_exact_probe_is_sign_of_zero_aware(spark):
    """ADVICE r11: the driver hashes STRINGIFIED values, so '-0.0' vs
    '0.0' is a driver mismatch — compare()'s exact-match strictness
    probe must flag it even though -0.0 == 0.0 in Python.  The -0.0
    fold now lives only in the row-sort key, so rows still align for
    the zipped tolerance compare (no false row mismatches), but the
    probe sees the sign."""
    from pyspark.sql import functions as F

    from tests.oracle import compare

    def neg_zero(s, _sf):
        return s.range(1).select(
            F.lit(-0.0).cast("double").alias("x"), F.lit("a").alias("y")
        )

    errors = compare(
        spark,
        "sign_probe",
        neg_zero,
        # a true IEEE -0.0: DuckDB's bare -0.0 literal is DECIMAL where
        # -0 == +0, so it must arrive via a string cast
        "SELECT CAST('-0.0' AS DOUBLE) AS x, 'a' AS y",
        SF_DIR,
    )
    assert not errors, errors  # same sign on both engines: clean

    errors = compare(
        spark,
        "sign_probe_drift",
        neg_zero,
        "SELECT CAST(0.0 AS DOUBLE) AS x, 'a' AS y",
        SF_DIR,
    )
    assert len(errors) == 1 and "EXACT-match drift" in errors[0], errors


def test_canon_rows_aligns_duplicate_signed_zero_rows():
    """Review r12: two engines holding the identical multiset
    {(-0.0, 'a'), (0.0, 'a')} in opposite input orders must sort to the
    same canonical order — the zero-fold makes the primary keys tie, so
    without the sign tie-break Python's stable sort kept each engine's
    input order and the exact probe false-fired on equal results."""
    from tests.oracle import _canon_rows

    a = _canon_rows([(-0.0, "a"), (0.0, "a")], ["x", "y"])
    b = _canon_rows([(0.0, "a"), (-0.0, "a")], ["x", "y"])
    assert [tuple(map(repr, r)) for r in a] == [tuple(map(repr, r)) for r in b]
    # the sign tie-break places +0.0 first deterministically ('+' < '-')
    assert repr(a[0][0]) == "0.0" and repr(a[1][0]) == "-0.0"
