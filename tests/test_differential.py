"""Property-based differential testing (SURVEY §5 item 4, widened):
randomized — but seeded, via hypothesis — filter/group/aggregate specs
rendered as ONE ANSI SQL string that both Spark and DuckDB execute on the
same parquet table.  This probes the engine-parity surface between the
hand-written oracle queries: any spec where Spark's semantics (null
handling, decimal sums, group pruning) diverge from DuckDB's fails here.

Exactness by construction, so there is no tolerance knob to hide bugs:
count/min/max are order-independent, and sums accumulate in DECIMAL(18,2)
(exact, order-independent) before the final double cast.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_data_gen_spark.session import load_tables
from tests.conftest import SF_SMALL
from tests.oracle import compare

NUM_COLS = {
    # col -> (lo, hi) spans observed at every SF (generator-fixed ranges)
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 105000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}
GRP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


def render_sql(grp: str, agg_col: str, filt_col: str, frac: float) -> str:
    lo, hi = NUM_COLS[filt_col]
    thr = round(lo + frac * (hi - lo), 4)
    return f"""
    SELECT {grp} AS g,
           count(*) AS n,
           min({agg_col}) AS mn,
           max({agg_col}) AS mx,
           CAST(sum(CAST({agg_col} AS DECIMAL(18,2))) AS DOUBLE) AS s
    FROM lineitem
    WHERE {filt_col} <= {thr!r}
    GROUP BY {grp}
    """


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    grp=st.sampled_from(GRP_COLS),
    agg_col=st.sampled_from(sorted(NUM_COLS)),
    filt_col=st.sampled_from(sorted(NUM_COLS)),
    frac=st.floats(0.05, 0.95),
)
def test_random_agg_spec_matches_duckdb(spark, grp, agg_col, filt_col, frac):
    sql = render_sql(grp, agg_col, filt_col, frac)

    def fn(spark, sf_dir, sql=sql):
        load_tables(spark, sf_dir, ("lineitem",))
        return spark.sql(sql)

    errors = compare(spark, f"prop[{grp},{agg_col},{filt_col},{frac:.3f}]",
                     fn, sql, SF_SMALL)
    assert not errors, errors
