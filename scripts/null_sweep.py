"""NULL-robustness sweep (VERDICT r10 #1): inject NULLs into family-B
columns of a testdata copy, then run the engine-pair compare over every
oracle-bearing registered query on the nulled corpus.

FIXTURES.md declares every family-B column nullable and the driver
regenerates testdata each round, but the shipped corpora carry zero
NULLs — so any Spark-vs-DuckDB NULL-semantics divergence (NaN vs NULL,
NULL grouping keys, NULL-hostile IN, ANSI division, greatest/least NULL
skipping...) stays latent until a regeneration surfaces it in the
driver's hash gate.  R10's review waves found six such holes one query
at a time; this sweep exercises ALL 200+ oracle queries against a
NULL-bearing corpus in one pass.

Join/id keys stay non-NULL by default (TPC-H referential conventions —
the reference corpus generator never nulls keys), everything else gets
a seeded ~NULL_FRAC of NULLs.  --null-keys adds the key columns too for
an exploratory pass.

Usage:
    python scripts/null_sweep.py                 # full sweep, tmp corpus
    python scripts/null_sweep.py q_ewma q_gini   # just these names
    python scripts/null_sweep.py --frac 0.15     # heavier injection
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import zlib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# columns that stay intact unless --null-keys: join/identity keys whose
# NULLing changes query semantics wholesale rather than probing parity
KEY_COLS = {
    "r_regionkey",
    "n_nationkey",
    "n_regionkey",
    "c_custkey",
    "c_nationkey",
    "s_suppkey",
    "s_nationkey",
    "p_partkey",
    "o_orderkey",
    "o_custkey",
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "event_id",
    "user_id",
    "doc_id",
    "vec_id",
}


def _mask(table: str, col: str, n: int, frac: float, seed: int):
    """Deterministic per-(table, column) NULL mask — crc32-keyed RNG so
    re-runs and cross-machine runs inject the identical cells."""
    import numpy as np

    key = zlib.crc32(f"{seed}:{table}:{col}".encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(key)
    return rng.random(n) < frac


def _null_elements(arr, table: str, col: str, frac: float, seed: int):
    """NULL a deterministic ~frac of the ELEMENTS inside a list column
    (r12 element-NULL pass): a row whose array survives cell-level
    injection can still carry NULL elements — the class that turns a
    numpy kernel's np.array into an inhomogeneous object array.  A
    plain-Python rebuild on purpose: pyarrow's flatten/offsets
    arithmetic is treacherous around parent nulls, and the sweep's
    corpora are small enough that foolproof beats fast."""
    import numpy as np
    import pyarrow as pa

    vals = arr.to_pylist()
    key = zlib.crc32(f"{seed}:{table}:{col}:elem".encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(key)
    n_nulled = 0
    out = []
    for row in vals:
        if row is None:
            out.append(None)
            continue
        mask = rng.random(len(row)) < frac
        n_nulled += int(mask.sum())
        out.append([None if m else x for x, m in zip(row, mask)])
    return pa.array(out, type=arr.type), n_nulled


def _type_has_nested(typ) -> bool:
    """True if *typ* contains a struct or map anywhere — the columns the
    --null-struct-fields pass can inject into."""
    import pyarrow as pa

    if pa.types.is_struct(typ) or pa.types.is_map(typ):
        return True
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return _type_has_nested(typ.value_type)
    return False


def _null_struct_fields(arr, table: str, col: str, frac: float, seed: int):
    """NULL a deterministic ~frac of struct FIELDS (the parent struct
    stays non-NULL) and map VALUES (keys untouched — a NULL map key is
    invalid parquet) inside a nested column, recursing through structs,
    maps, and lists-of-structs (r13 struct-NULL pass, VERDICT r12 #5).

    This is the structure-level sibling of the r12 element pass: a row
    whose struct survives cell-level injection can still carry NULL
    *fields*, the shape ``F.struct(nullable_col, ...)`` produces
    naturally and engines disagree on more readily than whole-cell
    NULLs.  Plain-Python rebuild on purpose, same rationale as
    ``_null_elements``: foolproof beats fast at sweep-corpus sizes."""
    import numpy as np
    import pyarrow as pa

    key = zlib.crc32(f"{seed}:{table}:{col}:struct".encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(key)
    n_nulled = 0

    def walk(v, typ):
        nonlocal n_nulled
        if v is None:
            return None
        if pa.types.is_struct(typ):
            out = {}
            for f in typ:
                x = v.get(f.name)
                if x is not None and rng.random() < frac:
                    n_nulled += 1
                    out[f.name] = None
                else:
                    out[f.name] = walk(x, f.type)
            return out
        if pa.types.is_map(typ):
            # to_pylist() yields [(key, value), ...] per row
            out = []
            for k, val in v:
                if val is not None and rng.random() < frac:
                    n_nulled += 1
                    out.append((k, None))
                else:
                    out.append((k, walk(val, typ.item_type)))
            return out
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            # element-NULLing belongs to --null-elements; here the list
            # is only a container on the way to nested structs/maps
            return [walk(x, typ.value_type) for x in v]
        return v

    out = [walk(v, arr.type) for v in arr.to_pylist()]
    return pa.array(out, type=arr.type), n_nulled


def build_nulled_corpus(
    src: str, dst: str, frac: float, seed: int, null_keys: bool,
    null_elements: float = 0.0, null_struct_fields: float = 0.0,
) -> dict[str, dict[str, int]]:
    """Copy every parquet table from src to dst with NULLs injected.
    Returns {table: {column: n_nulled}} for the report."""
    import pyarrow as pa
    import pyarrow.compute as pc  # r11 review: pa.compute is NOT bound by
    import pyarrow.parquet as pq  # `import pyarrow` alone — it only worked
    # via a transitive import inside operators.load_all()

    from iceberg_data_gen_spark.session import TABLES

    os.makedirs(dst, exist_ok=True)
    report: dict[str, dict[str, int]] = {}
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        cols, injected = [], {}
        for field in tbl.schema:
            arr = tbl.column(field.name)
            if field.name in KEY_COLS and not null_keys:
                cols.append(arr)
                continue
            m = _mask(t, field.name, len(tbl), frac, seed)
            want_elem = bool(null_elements) and pa.types.is_list(field.type)
            want_struct = bool(null_struct_fields) and _type_has_nested(
                field.type
            )
            # the empty-mask shortcut must not skip ELEMENT or
            # STRUCT-FIELD injection (--frac 0 --null-elements X /
            # --null-struct-fields X are legitimate asks)
            if not m.any() and not want_elem and not want_struct:
                cols.append(arr)
                continue
            combined = arr.combine_chunks()
            # keep the arrow type EXACTLY (events.ts is timestamp[ns];
            # the repo's footer sniffer distinguishes physical types)
            keep = pa.array(~m)
            nulled = pc.if_else(
                keep, combined, pa.nulls(len(tbl), type=field.type)
            )
            injected[field.name] = int(m.sum())
            if want_elem:
                nulled, n_elem = _null_elements(
                    nulled, t, field.name, null_elements, seed
                )
                injected[f"{field.name}[]"] = n_elem
            if want_struct:
                nulled, n_sf = _null_struct_fields(
                    nulled, t, field.name, null_struct_fields, seed
                )
                injected[f"{field.name}{{}}"] = n_sf
            cols.append(nulled)
        out = pa.table(cols, schema=tbl.schema)
        pq.write_table(out, f"{dst}/{t}.parquet")
        report[t] = injected
    # manifest written LAST (review r12): it is both the completion
    # sentinel (a crash mid-build leaves no manifest, so --reuse
    # rebuilds instead of serving a partial corpus forever) and the
    # parameter record --reuse validates against (an explicit --dst
    # previously served a corpus built with different frac/seed/keys —
    # the exact vacuous-clean mode the r11 '-k1' dirname fix closed
    # only for the DEFAULT dir)
    with open(f"{dst}/_manifest.json", "w") as f:
        json.dump(
            {"src": src, "frac": frac, "seed": seed,
             "null_keys": null_keys, "null_elements": null_elements,
             "null_struct_fields": null_struct_fields},
            f,
        )
    return report


def _reusable(
    dst: str, src: str, frac: float, seed: int, null_keys: bool,
    null_elements: float, null_struct_fields: float = 0.0,
) -> bool:
    """A corpus is reusable only if its manifest exists AND matches the
    requested build parameters exactly — EVERY parameter, including the
    r12 element-NULL fraction (a stale-manifest reuse is the precise
    vacuous-clean mode the manifest exists to prevent)."""
    try:
        with open(f"{dst}/_manifest.json") as f:
            m = json.load(f)
    except (OSError, ValueError):
        return False
    return m == {"src": src, "frac": frac, "seed": seed,
                 "null_keys": null_keys, "null_elements": null_elements,
                 "null_struct_fields": null_struct_fields}


def main() -> int:
    ap = argparse.ArgumentParser(allow_abbrev=False)
    ap.add_argument("names", nargs="*", help="query names (default: all oracles)")
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default=None, help="nulled-corpus dir (default: tmp)")
    ap.add_argument("--frac", type=float, default=0.08)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--null-keys", action="store_true")
    ap.add_argument(
        "--null-elements", type=float, default=0.0, metavar="FRAC",
        help="also NULL ~FRAC of the ELEMENTS inside list columns "
             "(embedding) — the r12 element-NULL pass",
    )
    ap.add_argument(
        "--null-struct-fields", type=float, default=0.0, metavar="FRAC",
        help="also NULL ~FRAC of struct FIELDS / map VALUES inside "
             "nested columns (parents stay non-NULL) — the r13 "
             "struct-NULL pass.  NOTE: the shipped TPC-H-ish corpora "
             "carry no nested columns (structs/maps in this repo are "
             "DERIVED inside queries from scalar base columns), so on "
             "them this pass reports 'vacuous' and the derived "
             "struct/map paths are stressed via a heavy --frac scalar "
             "sweep instead; this flag arms the sweep for any future "
             "driver corpus that ships nested columns",
    )
    ap.add_argument("--reuse", action="store_true", help="skip corpus rebuild")
    args = ap.parse_args()

    from iceberg_data_gen_spark import operators
    from iceberg_data_gen_spark.operators import load_all

    load_all()
    unknown = [n for n in args.names if n not in operators.ORACLES]
    if unknown:
        ap.error(f"not oracle-bearing registered queries: {unknown}")

    dst = args.dst or os.path.join(
        tempfile.gettempdir(),
        # -k1 encodes --null-keys (r11 wave 5): without it, --reuse
        # silently served a keys-intact corpus to the exploratory keys
        # pass, reporting vacuous "clean" for every key-NULL divergence
        f"nulled-{Path(args.src).name}-f{args.frac}-s{args.seed}"
        f"{'-k1' if args.null_keys else ''}"
        f"{f'-e{args.null_elements}' if args.null_elements else ''}"
        f"{f'-sf{args.null_struct_fields}' if args.null_struct_fields else ''}",
    )
    if not (
        args.reuse
        and _reusable(dst, args.src, args.frac, args.seed, args.null_keys,
                      args.null_elements, args.null_struct_fields)
    ):
        report = build_nulled_corpus(
            args.src, dst, args.frac, args.seed, args.null_keys,
            null_elements=args.null_elements,
            null_struct_fields=args.null_struct_fields,
        )
        n_cells = sum(sum(v.values()) for v in report.values())
        print(f"corpus: {dst}  ({n_cells} cells nulled)", flush=True)
        if args.null_struct_fields:
            n_nested = sum(
                1 for v in report.values() for k in v if k.endswith("{}")
            )
            if n_nested:
                print(f"struct/map injection: {n_nested} nested columns hit")
            else:
                # NO silent vacuous-clean (the -k1 lesson, one level up):
                # a struct sweep over a corpus with no nested columns
                # proves nothing about struct-NULL parity
                print(
                    "struct/map injection: VACUOUS — corpus has no nested "
                    "columns; stress the derived struct/map paths with a "
                    "heavy --frac scalar sweep instead",
                )
    else:
        print(f"corpus: {dst}  (reused)", flush=True)

    from iceberg_data_gen_spark.session import get_spark
    from tests.oracle import compare

    spark = get_spark("null-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    names = args.names or sorted(operators.ORACLES)
    failures: dict[str, list[str]] = {}
    for i, name in enumerate(names, 1):
        try:
            errors = compare(
                spark, name, operators.QUERIES[name], operators.ORACLES[name], dst
            )
        except Exception as exc:  # a crash IS a finding, keep sweeping
            errors = [f"{name}: EXCEPTION {type(exc).__name__}: {exc}"]
        status = "ok" if not errors else "FAIL"
        print(f"[{i}/{len(names)}] {name}: {status}", flush=True)
        if errors:
            failures[name] = errors
            for e in errors[:4]:
                print(f"    {e}", flush=True)

    print(f"\n=== {len(names) - len(failures)}/{len(names)} clean on nulled corpus ===")
    if failures:
        print("failing:", " ".join(sorted(failures)))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
