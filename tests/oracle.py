"""Local twin of the driver's DuckDB-oracle comparison.

For a query name registered in the operator registry: run the Spark
DataFrame and the oracle SQL on the same parquet tables, then compare
row count, column-name set, and an order-insensitive canonical form of
every value.  Exact equality is required for non-floats; floats must
match to 1e-9 relative (queries are written so both engines produce
identically-rounded values — the tolerance exists to surface any drift
as a loud diagnostic rather than a silent hash mismatch at verify time).
"""

from __future__ import annotations

import math
from datetime import date, datetime, timezone
from decimal import Decimal

import duckdb

# ONE definition of the testdata table set (review r8): duplicating the
# tuple here invited drift — a table added to session.TABLES but not the
# twin would fail every oracle referencing it with 'table does not exist'
from iceberg_data_gen_spark.session import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# one connection per corpus path, shared by compare()'s hot path (review
# r7: the property-test families call compare() hundreds of times, and a
# fresh connect + 10 view bindings per call repeated the parquet-metadata
# reads).  The corpus at a path is immutable in-process; callers that
# need a private connection call duckdb_conn directly.
_CONNS: dict[str, duckdb.DuckDBPyConnection] = {}


def _shared_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    if sf_dir not in _CONNS:
        _CONNS[sf_dir] = duckdb_conn(sf_dir)
    return _CONNS[sf_dir]


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, datetime):
        # aware datetimes convert to the UTC instant BEFORE stripping
        # tzinfo (review r7): plain replace() compared wall-clock text,
        # false-mismatching equal instants rendered in different zones
        # (and vice versa).  Naive values pass through unchanged.
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def _zero_fold(v):
    """-0.0 → +0.0, recursively — used ONLY in the row-sort key.

    r11 wave 5 folded -0.0 inside _canon_value itself so repr-keyed row
    sorting wouldn't place one engine's '(-0.0, ...' row far from the
    other's '(0.0, ...'; ADVICE r11 flagged that the fold also blinded
    the exact-match strictness probe to a real sign-of-zero divergence
    the driver's STRINGIFIED hash does distinguish ('-0.0' != '0.0').
    The fold now lives only in the sort key: rows still align for the
    zipped compare, but the stored values keep their sign so _exact_eq
    stays as strict as the driver."""
    if isinstance(v, float) and v == 0.0:
        return 0.0
    if isinstance(v, tuple):
        return tuple(_zero_fold(x) for x in v)
    return v


def _zero_signs(v):
    """Sign tag for every zero float, recursively — the SECONDARY sort
    key.  Without it, duplicate rows differing only in ±0.0 tie under
    the folded primary key, so Python's stable sort preserves each
    engine's input order and the zipped exact probe can false-fire on
    an identical multiset held in opposite orders (review r12).  With
    the sign as tie-break, both engines place +0.0 rows before -0.0
    rows among folded ties ('+' < '-' in ASCII), aligning equal rows
    and still zipping a genuine -0.0-vs-0.0 divergence into the same
    row pair."""
    if isinstance(v, float) and v == 0.0:
        return "-" if math.copysign(1.0, v) < 0 else "+"
    if isinstance(v, tuple):
        return tuple(_zero_signs(x) for x in v)
    return ""


def _canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: (repr(_zero_fold(t)), _zero_signs(t)))


def _values_close(a, b, rel=1e-9):
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            # float-vs-nonnumeric type skew between engines is a MISMATCH
            # to report, not an exception to die on (review r7)
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=rel, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_close(x, y, rel) for x, y in zip(a, b))
    return a == b


def compare(spark, name: str, query_fn, oracle: str, sf_dir: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    sdf = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _shared_conn(sf_dir)
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    errors: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        errors.append(f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return errors
    if len(s_rows) != len(d_rows):
        errors.append(f"{name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")

    cs = _canon_rows(s_rows, s_cols)
    cd = _canon_rows(d_rows, d_cols)
    n_bad = 0
    for i, (rs, rd) in enumerate(zip(cs, cd)):
        if not _values_close(rs, rd):
            n_bad += 1
            if n_bad <= 3:
                errors.append(f"{name}: row {i} spark={rs!r} duckdb={rd!r}")
    if n_bad > 3:
        errors.append(f"{name}: ... {n_bad} mismatched rows total")
    # strictness probe: exact (non-tolerance) equality, the driver may hash
    # raw values.  NaN-aware: tuple `!=` treats two NaNs as different, so a
    # genuinely matching NaN cell (which _values_close accepts AND which
    # stringifies identically under the driver's hash) would false-fail the
    # probe (review r8).
    def _exact_eq(a, b) -> bool:
        if isinstance(a, float) and isinstance(b, float):
            if a == b:
                # sign-of-zero aware (ADVICE r11): -0.0 == 0.0 in
                # Python, but the driver hashes the stringified values
                # and '-0.0' != '0.0' — mirror the driver's strictness
                return a != 0.0 or math.copysign(1.0, a) == math.copysign(1.0, b)
            return math.isnan(a) and math.isnan(b)
        if isinstance(a, tuple) and isinstance(b, tuple):
            return len(a) == len(b) and all(_exact_eq(x, y) for x, y in zip(a, b))
        return a == b

    if not errors:
        diff = next(
            ((i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if not _exact_eq(a, b)),
            None,
        )
        if diff is not None:
            errors.append(
                f"{name}: EXACT-match drift (tolerance-close but not identical): {diff!r}"
            )
    return errors
