"""Dtype-parity audit: Spark toPandas() vs DuckDB .df() for every oracle.

The driver's correctness check converts both result sets to pandas and
hashes values type-sensitively.  Two engines can agree on every VALUE and
still hash-mismatch when the pandas dtypes differ — the known offenders:

  * DuckDB ``sum()`` over any integer type returns HUGEINT (int128),
    which ``.df()`` renders as float64; Spark returns int64.
  * DECIMAL results: DuckDB -> float64, Spark toPandas -> object(Decimal).
  * list/array columns: the driver's canonicalizer crashes sorting them.

Run: python scripts/dtype_audit.py [--sf-dir /root/testdata/sf0.001] [names...]
Prints one line per query: OK / MISMATCH (with per-column dtypes) / ERR.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from iceberg_data_gen_spark import operators  # noqa: E402
from iceberg_data_gen_spark.session import get_spark  # noqa: E402
from tests.oracle import TABLES  # noqa: E402


def classify(series: pd.Series) -> str:
    """Dtype plus, for object columns, the python type of the first non-null."""
    d = str(series.dtype)
    if d == "object":
        nn = series.dropna()
        if len(nn):
            return f"object<{type(nn.iloc[0]).__name__}>"
    return d


def audit(names: list[str], sf_dir: str) -> int:
    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        oracle = operators.ORACLES.get(name)
        if oracle is None:
            continue
        try:
            sdf = operators.QUERIES[name](spark, sf_dir).toPandas()
            ddf = con.execute(oracle).df()
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERR      {name}: {type(e).__name__}: {e}")
            continue
        s_types = {c: classify(sdf[c]) for c in sdf.columns}
        d_types = {c: classify(ddf[c]) for c in ddf.columns}
        diffs = []
        for c in sorted(set(s_types) | set(d_types)):
            st, dt = s_types.get(c, "<missing>"), d_types.get(c, "<missing>")
            if st != dt and not _compatible(st, dt):
                diffs.append(f"{c}: spark={st} duckdb={dt}")
        arrays = [
            c
            for c in s_types
            if "list" in s_types[c] or "ndarray" in s_types[c]
            or "list" in d_types.get(c, "") or "ndarray" in d_types.get(c, "")
        ]
        if arrays:
            diffs.append(f"ARRAY-TYPED OUTPUT (driver canon crash): {arrays}")
        if diffs:
            bad += 1
            print(f"MISMATCH {name}: " + "; ".join(diffs))
        else:
            print(f"OK       {name}")
    return bad


def _compatible(st: str, dt: str) -> bool:
    """Dtype pairs the driver's hash treats as equal (empirically: none —
    be strict; allow only identical-width numeric synonyms)."""
    syn = {("int64", "Int64"), ("float64", "Float64")}
    return (st, dt) in syn or (dt, st) in syn


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
    operators.load_all()
    names = args or list(operators.ORACLES)
    rc = audit(names, sf_dir)
    print(f"\n{rc} queries flagged of {len(names)}")
    sys.exit(1 if rc else 0)
