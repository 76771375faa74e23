"""Spec-level Iceberg REST mapping (pure functions, no I/O).

``rest_catalog.RestMetadataIO`` commits this repo's metadata documents
with a whole-document version CAS — correct, but a private contract
only ``rest_server`` speaks.  Real Iceberg REST services (Polaris,
Lakekeeper, Tabular, ...) instead accept the spec's ``TableMetadata``
model and field-level ``UpdateTableRequest`` payloads
(apache/iceberg ``open-api/rest-catalog-open-api.yaml``): a commit is
a list of typed UPDATES (``add-snapshot``, ``set-snapshot-ref``, ...)
guarded by typed REQUIREMENTS (``assert-ref-snapshot-id``,
``assert-table-uuid``, ...) that each assert one field of the base
state rather than the whole document version.

This module is that mapping, slotted at the seam the catalog client
documents (``rest_catalog.py``: the ``_call`` layer):

- ``to_table_metadata(meta, ...)``    — repo document -> spec
  ``TableMetadata`` (format-version 2)
- ``commit_changes(base, target, ...)`` — two repo documents -> the
  spec ``(updates, requirements)`` pair expressing the delta

Both are PURE: no HTTP, no filesystem, no clock (timestamps are
caller-supplied), so they unit-test exhaustively without a service.
``tests/test_rest_catalog.py`` asserts the mapping's invariants and
carries one integration test gated on ``IDG_REAL_REST_URI`` for runs
against a real catalog service.

Reference parity: the reference connects through
``iceberg_catalog_rest::RestCatalog`` (``/root/reference/src/main.rs:
278-299``), whose Rust library performs exactly this TableMetadata /
update-requirement translation internally.
"""

from __future__ import annotations

MAIN_BRANCH = "main"

# Iceberg partition-field ids live in their own id space starting at
# 1000 (the spec's convention, so they never collide with column ids).
PARTITION_FIELD_ID_START = 1000

# Spark DDL type -> Iceberg primitive type name.  The repo's tables use
# the reference's three primitives plus the handful the query layer's
# schema-evolution tests add; anything unmapped raises loudly rather
# than emitting a payload a real service would reject opaquely.
_TYPES = {
    "string": "string",
    "int": "int",
    "integer": "int",
    "long": "long",
    "bigint": "long",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _iceberg_type(spark_ddl: str) -> str:
    t = spark_ddl.strip().lower()
    if t in _TYPES:
        return _TYPES[t]
    if t.startswith("decimal"):
        return t  # decimal(p, s) spells identically in both
    raise ValueError(f"no Iceberg mapping for Spark type: {spark_ddl!r}")


def _schema_to_spec(schema: dict) -> dict:
    """Repo schema JSON -> Iceberg ``Schema`` struct."""
    return {
        "type": "struct",
        "schema-id": schema.get("schema_id", 1),
        "identifier-field-ids": list(schema.get("identifier_field_ids", [])),
        "fields": [
            {
                "id": f["id"],
                "name": f["name"],
                "required": bool(f["required"]),
                "type": _iceberg_type(f["type"]),
            }
            for f in schema["fields"]
        ],
    }


def _transform_name(f: dict) -> str:
    t = f["transform"]
    if t in ("bucket", "truncate"):
        return f"{t}[{f['n']}]"
    if t == "identity":
        return "identity"
    raise ValueError(f"no Iceberg mapping for transform: {t!r}")


def _partition_field_ids(specs: list[dict]) -> dict[tuple, int]:
    """GLOBAL partition-field-id assignment over a document's whole spec
    history: Iceberg v2 requires partition field ids to be unique across
    ALL specs and stable for a given (source, transform, name) field —
    per-spec numbering would let two different fields collide on 1000
    and give one field two ids across evolved specs."""
    ids: dict[tuple, int] = {}
    nxt = PARTITION_FIELD_ID_START
    for spec in specs:
        for f in spec["fields"]:
            key = (f["source"], _transform_name(f), f["name"])
            if key not in ids:
                ids[key] = nxt
                nxt += 1
    return ids


def _spec_to_partition_spec(
    spec: dict, schema: dict, field_ids: dict[tuple, int]
) -> dict:
    """Repo partition spec -> Iceberg ``PartitionSpec`` struct, with
    field ids drawn from the document-global assignment."""
    by_name = {f["name"]: f["id"] for f in schema["fields"]}
    fields = []
    for f in spec["fields"]:
        transform = _transform_name(f)
        fields.append(
            {
                "field-id": field_ids[(f["source"], transform, f["name"])],
                "source-id": by_name[f["source"]],
                "name": f["name"],
                "transform": transform,
            }
        )
    return {"spec-id": spec["spec_id"], "fields": fields}


# The engine's ACTUAL snapshot operation strings (the _commit call sites
# in table.py) -> the spec's summary.operation enum.  Review r7: the old
# inline map keyed on file-KIND names (pos-delete/eq-delete/merge) that
# no snapshot ever carries, so every delete commit fell through .get()'s
# default and went on the wire as 'overwrite' — masked because the
# property fuzz and golden generator sampled the same wrong vocabulary.
# tests/test_rest_catalog.py::test_wire_map_covers_every_emitted_operation
# derives the emitted set from a real table and asserts coverage, so the
# vocabulary can never be retyped by hand again.
SNAPSHOT_OP_TO_SPEC = {
    "append": "append",
    "delete-position": "delete",
    "delete-equality": "delete",
    "overwrite": "overwrite",  # merge upsert
    "replace": "replace",  # compaction / clustering baselines
    "rollback": "replace",  # baseline restore of a prior state
}


def _snapshot_to_spec(snap: dict, location: str, schema_id: int = 1) -> dict:
    """Repo snapshot -> Iceberg ``Snapshot`` struct.

    The repo commits file lists inline; the spec transports them as a
    manifest-list file the engine wrote to the warehouse.  The path is
    derived deterministically from the snapshot id — the writer that
    adopts this mapping materializes the avro manifest list there.
    ``summary.operation`` maps the repo's operation vocabulary onto the
    spec's enum (append | replace | overwrite | delete)."""
    op = SNAPSHOT_OP_TO_SPEC.get(snap["operation"], "overwrite")
    summary = {
        "operation": op,
        # engine-specific detail rides in summary extras (spec-legal:
        # summary is an open string map)
        "idg-operation": snap["operation"],
        "idg-file-count": str(len(snap.get("files", []))),
    }
    if snap.get("staged"):
        summary["idg-staged"] = "true"
    if snap.get("branch"):
        summary["idg-branch"] = snap["branch"]
    if snap.get("cherry_picked_from") is not None:
        summary["idg-cherry-picked-from"] = str(snap["cherry_picked_from"])
    out = {
        "snapshot-id": snap["id"],
        "sequence-number": snap["sequence_number"],
        "timestamp-ms": snap.get("timestamp_ms", 0),
        "summary": summary,
        "manifest-list": f"{location}/metadata/snap-{snap['id']}.avro",
        # reference the document's actual schema id — a snapshot pointing
        # at a schema id absent from the schemas list is invalid metadata
        "schema-id": schema_id,
    }
    if snap.get("parent") is not None:
        out["parent-snapshot-id"] = snap["parent"]
    return out


def _main_head(meta: dict) -> int | None:
    """The repo's main-branch head: latest snapshot that is neither
    WAP-staged nor branch-committed (``MoRTable.current_snapshot_id``)."""
    live = [
        s
        for s in meta.get("snapshots", [])
        if not s.get("staged") and not s.get("branch")
    ]
    return live[-1]["id"] if live else None


def to_table_metadata(
    meta: dict, *, table_uuid: str, location: str, last_updated_ms: int = 0
) -> dict:
    """Repo metadata document -> Iceberg ``TableMetadata`` (format v2).

    Pure: the caller supplies identity (uuid), location, and the clock.
    Every structural element of the repo model maps to its spec
    counterpart; branch/tag refs (including the implicit ``main``)
    become spec ``refs`` entries, so ref-aware services see the same
    visibility the local engine enforces.
    """
    schema = meta["schema"]
    snaps = meta.get("snapshots", [])
    specs = meta.get("partition_specs", [{"spec_id": 0, "fields": []}])
    head = _main_head(meta)

    refs = {}
    if head is not None:
        refs[MAIN_BRANCH] = {"snapshot-id": head, "type": "branch"}
    for name, ref in meta.get("refs", {}).items():
        refs[name] = {"snapshot-id": ref["snapshot_id"], "type": ref["type"]}

    pfield_ids = _partition_field_ids(specs)
    spec_structs = [_spec_to_partition_spec(s, schema, pfield_ids) for s in specs]
    last_partition_id = max(
        pfield_ids.values(), default=PARTITION_FIELD_ID_START - 1
    )
    return {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": location,
        "last-sequence-number": max((s["sequence_number"] for s in snaps), default=0),
        "last-updated-ms": last_updated_ms,
        "last-column-id": max(f["id"] for f in schema["fields"]),
        "schemas": [_schema_to_spec(schema)],
        "current-schema-id": schema.get("schema_id", 1),
        "partition-specs": spec_structs,
        "default-spec-id": meta.get("default_spec_id", 0),
        "last-partition-id": last_partition_id,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "snapshots": [
            _snapshot_to_spec(s, location, schema.get("schema_id", 1))
            for s in snaps
        ],
        "current-snapshot-id": head if head is not None else -1,
        "refs": refs,
        "properties": {"write.delete.mode": "merge-on-read"},
    }


def commit_changes(base: dict, target: dict, *, table_uuid: str, location: str):
    """Two repo metadata documents -> spec ``(updates, requirements)``.

    The UPDATES replay what happened between ``base`` and ``target`` as
    the spec's typed actions; the REQUIREMENTS assert the fields of
    ``base`` the change depends on — the field-level optimistic
    concurrency real services check, replacing the fixture server's
    whole-document version CAS:

    - ``assert-table-uuid`` always (commit to the table we loaded);
    - ``assert-ref-snapshot-id`` on ``main`` whenever the commit adds
      snapshots or moves main (``snapshot-id: null`` asserts the ref
      must not exist yet — first commit);
    - ``assert-ref-snapshot-id`` on every OTHER ref the commit moves,
      pinning its base position (a racing writer that advanced the same
      branch conflicts server-side);
    - ``assert-current-schema-id`` when the commit evolves the schema,
      and ``assert-last-assigned-partition-id`` /
      ``assert-default-spec-id`` when it adds specs or moves the
      default — racing metadata-only evolutions must 409, not both
      commit (review r7).
    """
    updates: list[dict] = []
    requirements: list[dict] = [{"type": "assert-table-uuid", "uuid": table_uuid}]

    base_ids = {s["id"] for s in base.get("snapshots", [])}
    target_snaps = target.get("snapshots", [])
    target_ids = {s["id"] for s in target_snaps}
    added = [s for s in target_snaps if s["id"] not in base_ids]
    removed = [
        s["id"] for s in base.get("snapshots", []) if s["id"] not in target_ids
    ]

    if base.get("schema") != target.get("schema"):
        updates.append(
            {"action": "add-schema", "schema": _schema_to_spec(target["schema"])}
        )
        updates.append({"action": "set-current-schema", "schema-id": -1})
        # field-level concurrency for schema evolution (review r7): two
        # clients racing add_column from one base produce commits whose
        # only requirement was assert-table-uuid — a conforming service
        # accepted BOTH and the second replaced the first writer's
        # column.  Pinning the base's current schema id makes the loser
        # 409 and re-derive from the winner's schema, exactly the
        # assert-ref-snapshot-id story for data commits.
        requirements.append(
            {
                "type": "assert-current-schema-id",
                "current-schema-id": base["schema"].get("schema_id", 1),
            }
        )

    base_specs = {s["spec_id"] for s in base.get("partition_specs", [{"spec_id": 0, "fields": []}])}
    # field ids come from the TARGET document's global assignment so a
    # spec added on top of evolved history gets fresh, non-colliding ids
    tgt_pfield_ids = _partition_field_ids(
        target.get("partition_specs", [{"spec_id": 0, "fields": []}])
    )
    # ONE definition of "specs added in this commit" (review r8: the same
    # predicate used to be computed three times and could silently drift)
    added_specs = [
        s for s in target.get("partition_specs", []) if s["spec_id"] not in base_specs
    ]
    for s in added_specs:
        updates.append(
            {
                "action": "add-spec",
                "spec": _spec_to_partition_spec(s, target["schema"], tgt_pfield_ids),
            }
        )
    if added_specs:
        # racing spec evolutions: pin the base's last assigned partition
        # field id so two adds from one base cannot both commit with
        # colliding field ids (the spec's AssertLastAssignedPartitionId)
        base_pfield_ids = _partition_field_ids(
            base.get("partition_specs", [{"spec_id": 0, "fields": []}])
        )
        requirements.append(
            {
                "type": "assert-last-assigned-partition-id",
                "last-assigned-partition-id": max(
                    base_pfield_ids.values(), default=PARTITION_FIELD_ID_START - 1
                ),
            }
        )
    tgt_default = target.get("default_spec_id", 0)
    if base.get("default_spec_id", 0) != tgt_default:
        # -1 ("the spec added in this commit") is only valid when the new
        # default IS newly added; reverting to a pre-existing spec must
        # name it explicitly or a conforming service fails the commit
        newly_added = {s["spec_id"] for s in added_specs}
        # -1 binds to the LAST spec added in this commit; a default that
        # is an EARLIER same-commit addition has no spec-legal spelling
        # (its literal id is service-assigned) — unreachable from engine
        # flows (update_spec always defaults the newest), so refuse
        # loudly rather than aim a conforming service at the wrong spec
        # (review r7)
        # -1 resolves server-side to the LAST add-spec update EMITTED,
        # which is the target list's last entry — not max(spec_id)
        # (review r8: an unordered partition_specs list made the guard
        # pass while -1 bound to the wrong spec)
        last_added = added_specs[-1]["spec_id"] if added_specs else None
        if tgt_default in newly_added and tgt_default != last_added:
            raise ValueError(
                "unsupported batched delta: the new default spec is an "
                "earlier same-commit addition; -1 binds to the last one"
            )
        updates.append(
            {
                "action": "set-default-spec",
                "spec-id": -1 if tgt_default in newly_added else tgt_default,
            }
        )
        requirements.append(
            {
                "type": "assert-default-spec-id",
                "default-spec-id": base.get("default_spec_id", 0),
            }
        )

    tgt_schema_id = target["schema"].get("schema_id", 1)
    for s in added:
        updates.append(
            {
                "action": "add-snapshot",
                "snapshot": _snapshot_to_spec(s, location, tgt_schema_id),
            }
        )
    base_head, target_head = _main_head(base), _main_head(target)
    if added or base_head != target_head:
        requirements.append(
            {
                "type": "assert-ref-snapshot-id",
                "ref": MAIN_BRANCH,
                "snapshot-id": base_head,  # null => ref must not exist yet
            }
        )
    if target_head is not None and base_head != target_head:
        updates.append(
            {
                "action": "set-snapshot-ref",
                "ref-name": MAIN_BRANCH,
                "type": "branch",
                "snapshot-id": target_head,
            }
        )
    elif target_head is None and base_head is not None:
        # main's head vanished (e.g. its snapshot was removed from the
        # document): drop the ref too, or the service is left pointing
        # at a snapshot the same commit removes
        updates.append({"action": "remove-snapshot-ref", "ref-name": MAIN_BRANCH})

    base_refs = base.get("refs", {})
    for name, ref in target.get("refs", {}).items():
        old = base_refs.get(name)
        if old == ref:
            continue
        updates.append(
            {
                "action": "set-snapshot-ref",
                "ref-name": name,
                "type": ref["type"],
                "snapshot-id": ref["snapshot_id"],
            }
        )
        requirements.append(
            {
                "type": "assert-ref-snapshot-id",
                "ref": name,
                "snapshot-id": old["snapshot_id"] if old else None,
            }
        )
    for name in base_refs:
        if name not in target.get("refs", {}):
            updates.append({"action": "remove-snapshot-ref", "ref-name": name})
            requirements.append(
                {
                    "type": "assert-ref-snapshot-id",
                    "ref": name,
                    "snapshot-id": base_refs[name]["snapshot_id"],
                }
            )

    # remove-snapshots LAST, after every ref detach/move above: a
    # conforming service applying updates sequentially rejects removing
    # a snapshot some ref still points at (review r8 — the old order
    # emitted the removal before the ref updates that release it)
    if removed:
        updates.append({"action": "remove-snapshots", "snapshot-ids": sorted(removed)})

    return updates, requirements
