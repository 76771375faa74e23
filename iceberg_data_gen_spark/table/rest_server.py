"""In-memory Iceberg-REST-style catalog server (test double).

Implements a REST catalog wire contract MODELED ON the public Iceberg
REST catalog OpenAPI (https://github.com/apache/iceberg —
``open-api/rest-catalog-open-api.yaml``), covering the operations the
reference exercises through ``iceberg_catalog_rest::RestCatalog``
(``/root/reference/src/main.rs:278-299``): the config handshake,
namespace create/head/drop, table create/load/drop/list, and the table
COMMIT endpoint with an optimistic-concurrency requirement check — the
server-side compare-and-swap that makes two racing writers safe (one
gets HTTP 409, mirroring Iceberg's ``CommitFailedException``).  The
route shapes follow the spec; the payloads carry this repo's
``MoRTable`` metadata model rather than Iceberg ``TableMetadata``, so
this is the catalog for THIS engine's tables, not a drop-in for
Polaris/Lakekeeper (see ``rest_catalog`` module docstring).

Routes (all JSON):

    GET    /v1/config                              -> {defaults, overrides}
    POST   /v1/namespaces        {namespace:[ns]}  -> 200 | 409 exists
    GET    /v1/namespaces/{ns}                     -> 200 | 404
    DELETE /v1/namespaces/{ns}                     -> 204 | 404 | 409 not empty
    GET    /v1/namespaces/{ns}/tables              -> {identifiers: [...]}
    POST   /v1/namespaces/{ns}/tables {name, metadata}
                                                   -> 200 | 404 ns | 409 exists
    GET    /v1/namespaces/{ns}/tables/{t}          -> {version, metadata} | 404
    POST   /v1/namespaces/{ns}/tables/{t} {requirements, metadata}
                                                   -> 200 {version, metadata}
                                                    | 409 CAS failure
    DELETE /v1/namespaces/{ns}/tables/{t}          -> 204 | 404

Path segments are percent-decoded after splitting, so encoded names
round-trip.

The commit requirement is ``{"type": "assert-version", "version": N}`` —
the catalog-side metadata VERSION the client based its update on
(returned by every GET/commit), bumped on every successful commit.
DELIBERATE DEVIATION from the real Iceberg REST contract (ADVICE r8):
the spec allows an empty requirements list (an unconditional commit)
and carries the CAS through other requirement types
(assert-table-uuid, assert-ref-snapshot-id, ...); this server REQUIRES
an assert-version on every commit because its only client is
``RestMetadataIO`` (which always sends one) and an unconditional
commit here would silently clobber a racing writer — the exact bug
class the r8 review closed.  A spec-conforming external client doing
an unconditional commit would get 400; that narrowing is intentional
for a test double whose whole safety story is the CAS.
Versioning the whole document (rather than asserting only the snapshot
head) makes metadata-only racers safe too: a tag/schema/ref update
racing a snapshot commit conflicts instead of being silently clobbered
by the later full-document replacement — the role the spec's
``assert-ref-snapshot-id`` + finer-grained requirements play in real
Iceberg.  State is held in memory under a lock; metadata documents are
exactly the ``MoRTable`` metadata model, so everything the local table
supports (snapshots, refs, schema evolution, partition specs) round-trips
through the catalog unchanged.

This is intentionally single-process and unauthenticated: it is the
local stand-in a laptop test runs against, the same role Iceberg's own
``RESTCatalogServer`` test fixture plays.  Production deployments point
``RestCatalog`` at a real service (Polaris, Lakekeeper, Tabular, ...)
speaking the same wire contract.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _CatalogState:
    """The catalog's authoritative state: namespaces and, per table,
    ``(version, metadata)``.  All mutation happens under one lock — the
    commit CAS is check-and-swap inside the critical section."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.namespaces: set[str] = set()
        self.tables: dict[tuple[str, str], tuple[int, dict]] = {}

    # each handler returns (http_status, body_dict_or_none)

    def create_namespace(self, ns: str) -> tuple[int, dict | None]:
        with self.lock:
            if ns in self.namespaces:
                return 409, {"error": f"namespace exists: {ns}"}
            self.namespaces.add(ns)
            return 200, {"namespace": [ns]}

    def head_namespace(self, ns: str) -> tuple[int, dict | None]:
        with self.lock:
            if ns in self.namespaces:
                return 200, {"namespace": [ns]}
            return 404, {"error": f"no such namespace: {ns}"}

    def drop_namespace(self, ns: str) -> tuple[int, dict | None]:
        with self.lock:
            if ns not in self.namespaces:
                return 404, {"error": f"no such namespace: {ns}"}
            if any(k[0] == ns for k in self.tables):
                return 409, {"error": f"namespace not empty: {ns}"}
            self.namespaces.remove(ns)
            return 204, None

    def list_tables(self, ns: str) -> tuple[int, dict | None]:
        with self.lock:
            if ns not in self.namespaces:
                return 404, {"error": f"no such namespace: {ns}"}
            idents = [
                {"namespace": [n], "name": t} for (n, t) in self.tables if n == ns
            ]
            return 200, {"identifiers": idents}

    def create_table(self, ns: str, body: dict) -> tuple[int, dict | None]:
        name = body.get("name")
        meta = body.get("metadata")
        # name must be a STRING, not merely truthy — a dict/list name
        # would reach the `(ns, name) in self.tables` lookup and raise
        # an unhashable TypeError that dispatch answers 500, blaming the
        # server for a malformed client body (review r8)
        if not name or not isinstance(name, str) or not isinstance(meta, dict):
            return 400, {"error": "create needs {name: str, metadata: obj}"}
        with self.lock:
            if ns not in self.namespaces:
                return 404, {"error": f"no such namespace: {ns}"}
            if (ns, name) in self.tables:
                return 409, {"error": f"table exists: {ns}.{name}"}
            self.tables[(ns, name)] = (0, meta)
            return 200, {"version": 0, "metadata": meta}

    def load_table(self, ns: str, name: str) -> tuple[int, dict | None]:
        with self.lock:
            entry = self.tables.get((ns, name))
            if entry is None:
                return 404, {"error": f"no such table: {ns}.{name}"}
            version, meta = entry
            return 200, {"version": version, "metadata": meta}

    def commit_table(self, ns: str, name: str, body: dict) -> tuple[int, dict | None]:
        meta = body.get("metadata")
        reqs = body.get("requirements", [])
        if not isinstance(meta, dict):
            return 400, {"error": "commit needs {metadata}"}
        if not isinstance(reqs, list) or not all(isinstance(r, dict) for r in reqs):
            return 400, {"error": "requirements must be a list of objects"}
        # the CAS is the server's whole safety story (two racing writers
        # -> one 409); an empty requirements list would skip it and let a
        # stale client blindly overwrite another writer's commit with
        # HTTP 200 (review r8) — require the version assertion
        if not any(r.get("type") == "assert-version" for r in reqs):
            return 400, {
                "error": "commit requires an assert-version requirement"
            }
        with self.lock:
            entry = self.tables.get((ns, name))
            if entry is None:
                return 404, {"error": f"no such table: {ns}.{name}"}
            version, _ = entry
            for r in reqs:
                if r.get("type") == "assert-version":
                    if version != r.get("version"):
                        return 409, {
                            "error": (
                                f"commit conflict: based on version "
                                f"{r.get('version')}, current version {version}"
                            )
                        }
                else:
                    return 400, {"error": f"unknown requirement: {r.get('type')}"}
            self.tables[(ns, name)] = (version + 1, meta)
            return 200, {"version": version + 1, "metadata": meta}

    def drop_table(self, ns: str, name: str) -> tuple[int, dict | None]:
        with self.lock:
            if (ns, name) not in self.tables:
                return 404, {"error": f"no such table: {ns}.{name}"}
            del self.tables[(ns, name)]
            return 204, None


class _BadRequest(Exception):
    """Client-fault request defect (invalid JSON, wrong body shape) —
    raised at the parse/validation site, answered with HTTP 400."""


def _make_handler(state: _CatalogState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test output
            pass

        def _reply(self, status: int, body: dict | None) -> None:
            payload = b"" if body is None else json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            if payload:
                self.wfile.write(payload)

        def _body(self) -> dict:
            try:
                n = int(self.headers.get("Content-Length", 0))
            except ValueError as e:
                # client fault, not a server bug: same 400-vs-500
                # discipline as the JSON parse below (review r9)
                raise _BadRequest(f"invalid Content-Length header: {e}") from e
            if not n:
                return {}
            try:
                body = json.loads(self.rfile.read(n))
            except (json.JSONDecodeError, UnicodeDecodeError, ValueError) as e:
                raise _BadRequest(f"invalid JSON body: {e}") from e
            if not isinstance(body, dict):
                raise _BadRequest(
                    f"body must be a JSON object, got {type(body).__name__}"
                )
            return body

        def _route(self, method: str) -> tuple[int, dict | None]:
            # strip the query string first (review r9: self.path is the
            # raw request target, so a spec-legal
            # 'GET /v1/config?warehouse=wh' used to 404), then split
            # BEFORE unquoting so a %2F inside a name does not become a
            # path separator.  Query parameters themselves are ignored —
            # this toy server implements none of the spec's optional
            # behaviors they select.
            path = urllib.parse.urlsplit(self.path).path
            parts = [urllib.parse.unquote(p) for p in path.split("/") if p]
            if parts[:1] != ["v1"]:
                return 404, {"error": "unknown route"}
            parts = parts[1:]
            if parts == ["config"] and method == "GET":
                return 200, {"defaults": {}, "overrides": {}}
            if parts == ["namespaces"] and method == "POST":
                ns = self._body().get("namespace", [])
                # the single level must itself be a STRING: a nested
                # list passes the shape check but is unhashable in the
                # namespace set -> TypeError -> 500 misattribution
                # (review r8)
                if (
                    not isinstance(ns, list)
                    or len(ns) != 1
                    or not isinstance(ns[0], str)
                    # empty string would be unreachable by every
                    # namespace-addressed route (the path splitter drops
                    # empty segments) yet 409 on re-create (review r9)
                    or not ns[0]
                ):
                    return 400, {"error": "single-level namespaces only"}
                return state.create_namespace(ns[0])
            if len(parts) == 2 and parts[0] == "namespaces":
                if method == "GET":
                    return state.head_namespace(parts[1])
                if method == "DELETE":
                    return state.drop_namespace(parts[1])
            if len(parts) == 3 and parts[0] == "namespaces" and parts[2] == "tables":
                if method == "GET":
                    return state.list_tables(parts[1])
                if method == "POST":
                    return state.create_table(parts[1], self._body())
            if len(parts) == 4 and parts[0] == "namespaces" and parts[2] == "tables":
                ns, name = parts[1], parts[3]
                if method == "GET":
                    return state.load_table(ns, name)
                if method == "POST":
                    return state.commit_table(ns, name, self._body())
                if method == "DELETE":
                    return state.drop_table(ns, name)
            return 404, {"error": "unknown route"}

        def _dispatch(self, method: str) -> None:
            try:
                status, body = self._route(method)
            except _BadRequest as e:
                # a malformed body is the client's fault: answer 400
                # instead of letting the exception drop the connection,
                # which the client would misreport as "catalog
                # unreachable" (review r7).  Only parse/validation sites
                # raise _BadRequest — anything else is a SERVER defect
                # and must surface as 500, not be misattributed to the
                # client and hidden from error monitoring (ADVICE r7)
                status, body = 400, {"error": f"malformed request: {e}"}
            except Exception as e:  # noqa: BLE001 — boundary handler
                status, body = 500, {
                    "error": f"internal server error: {type(e).__name__}: {e}"
                }
            self._reply(status, body)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


class RestCatalogServer:
    """Run the in-memory catalog on ``127.0.0.1:<port>`` (port 0 picks a
    free one).  Use as a context manager::

        with RestCatalogServer() as srv:
            cat = RestCatalog(spark, srv.uri, warehouse)
    """

    def __init__(self, port: int = 0) -> None:
        self.state = _CatalogState()
        self._httpd = ThreadingHTTPServer(
            ("127.0.0.1", port), _make_handler(self.state)
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="rest-catalog", daemon=True
        )

    @property
    def uri(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def __enter__(self) -> "RestCatalogServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
