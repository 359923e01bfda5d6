"""In-process mock Elasticsearch speaking the `_bulk` and `_search`
wire shapes (moved here from tests/ so the certified es_roundtrip_query
operator can stand the cluster up too; tests/es_mock.py re-exports).


Implements just enough of the ES HTTP surface to certify the sink's
delivery semantics (reference es.go:160-213, main.go:173-202) without a
cluster:

- `POST /_bulk`: NDJSON body -> per-item response `{"errors": bool,
  "items": [{"index": {"_index", "_id", "status", "error"?}}]}`.
  Programmable: per-id failures (`fail_ids` -> item status 400 with a
  mapper_parsing_exception) and whole-request failures
  (`reject_queue` of HTTP statuses popped one per request -> the
  429/5xx retry path).
- `PUT /<index>`: index creation; repeat creation returns 400
  `resource_already_exists_exception` (the branch es.go:92-99 tolerates).
- `POST /_aliases`: records alias -> index.
- `GET /`: info ping (health probe, es.go:215-218).
- `POST /<index>/_pit?keep_alive=..` -> `{"id": ...}` and
  `DELETE /_pit`: point-in-time handles.  Real ES only accepts `slice`
  on scroll or PIT searches, and the mock ENFORCES that (400 on a
  sliced plain search) so the reader's request shape is proven
  real-ES-valid, not mock-only (round-4 ADVICE).
- `POST /<index>/_search` and `POST /_search` (PIT form): the READ
  side — slices (`slice: {id, max}` partitions docs by md5(_id) % max),
  `search_after` keyset pagination over `sort: [{"_shard_doc":
  "asc"}]` (the ES-8 PIT tiebreaker; `_id` sort is REJECTED like real
  ES does with fielddata disabled, and `_shard_doc` outside a PIT is
  400), per-hit `sort` cursor arrays, `_source: [fields]` projection
  filtering (hits carry ONLY the requested fields), and `match_all` /
  `term` / `terms` / `range` under `bool.filter` (the subset
  es_reader_sim pushes down); every request body is recorded for
  pushdown assertions.

Successful `index` actions store the doc under its `_id`
(last-write-wins), mirroring how ES doc-id indexing collapses
re-delivered messages (es.go:186).

The server binds an ephemeral localhost port and serves from a daemon
thread; Spark's Python workers (separate processes) reach it over TCP —
exactly the topology of executor-side bulk workers posting to a cluster.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MockEsState:
    def __init__(self):
        self.lock = threading.Lock()
        self.docs: dict[str, dict] = {}          # _id -> source (last write wins)
        self.doc_index: dict[str, str] = {}      # _id -> index name
        self.indices: dict[str, dict] = {}       # index name -> creation body
        self.aliases: dict[str, str] = {}        # alias -> index
        self.fail_ids: set[str] = set()          # per-item 400s
        self.reject_queue: list[int] = []        # whole-request statuses
        self.bulk_requests: list[dict] = []      # recorded request metadata
        self.search_requests: list[dict] = []    # recorded _search bodies
        self.pits: dict[str, str] = {}           # pit id -> index name
        self.pit_counter = 0


class _Handler(BaseHTTPRequestHandler):
    state: MockEsState  # set by make_server

    def log_message(self, *args):  # silence
        pass

    def _reply(self, status: int, payload: dict) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", "0"))
        return self.rfile.read(n) if n else b""

    def do_GET(self):
        # GET /_alias/<name> -> ES8 shape {"<index>": {"aliases":
        # {"<name>": {}}}} or 404 (the read half of the alias API the
        # mid-stream rollover's monotonic flip check needs)
        parts = self.path.rstrip("/").split("/")
        if len(parts) == 3 and parts[1] == "_alias":
            name = parts[2]
            with self.state.lock:
                index = self.state.aliases.get(name)
            if index is None:
                self._reply(
                    404,
                    {"error": {"type": "alias_missing_exception"}},
                )
            else:
                self._reply(200, {index: {"aliases": {name: {}}}})
            return
        self._reply(200, {"name": "mock-es", "version": {"number": "8.0.0-mock"}})

    def do_DELETE(self):
        if self.path.rstrip("/") != "/_pit":
            self._reply(404, {"error": "unknown path " + self.path})
            return
        body = json.loads(self._read_body() or b"{}")
        with self.state.lock:
            existed = self.state.pits.pop(body.get("id"), None) is not None
        self._reply(200 if existed else 404, {"succeeded": existed})

    def do_PUT(self):
        index = self.path.strip("/").split("/")[0]
        body = self._read_body()
        st = self.state
        with st.lock:
            if index in st.indices:
                self._reply(400, {"error": {
                    "type": "resource_already_exists_exception",
                    "reason": f"index [{index}] already exists"}})
                return
            st.indices[index] = json.loads(body or b"{}")
        self._reply(200, {"acknowledged": True, "index": index})

    @staticmethod
    def _matches(src: dict, query: dict) -> bool:
        """match_all / term / terms / range, AND-composed under
        bool.filter — the subset the engine's reader pushes down."""
        if not query or "match_all" in query:
            return True
        if "bool" in query:
            return all(
                _Handler._matches(src, q)
                for q in query["bool"].get("filter", [])
            )
        if "term" in query:
            ((field, spec),) = query["term"].items()
            want = spec["value"] if isinstance(spec, dict) else spec
            return src.get(field) == want
        if "terms" in query:
            ((field, vals),) = query["terms"].items()
            return src.get(field) in vals
        if "range" in query:
            ((field, spec),) = query["range"].items()
            v = src.get(field)
            if v is None:
                return False
            return (
                ("gte" not in spec or v >= spec["gte"])
                and ("gt" not in spec or v > spec["gt"])
                and ("lte" not in spec or v <= spec["lte"])
                and ("lt" not in spec or v < spec["lt"])
            )
        raise ValueError(f"unsupported query {query}")

    def _search(self, body: dict) -> None:
        """Sliced + search_after keyset pagination over one index (or
        alias): the ES read topology a partitioned reader needs —
        slice k of n sees docs with md5(_id) % n == k, pages are
        cursor-ordered after ``search_after``.  PIT form: ``POST
        /_search`` with ``pit: {id}`` in the body (index resolved from
        the pit).  Like real ES, ``slice`` is only legal with a PIT (or
        scroll), ``_shard_doc`` sort is only legal inside a PIT, and
        ``_id`` sort is REJECTED (fielddata disabled on _id in ES 8) —
        so the reader's request shape is proven real-ES-valid.  The
        mock's _shard_doc stand-in is the _id itself: opaque to a
        well-behaved client, which must echo each hit's ``sort`` array
        back verbatim."""
        import hashlib

        st = self.state
        pit = body.get("pit")
        sort_fields = [
            next(iter(s)) if isinstance(s, dict) else s
            for s in body.get("sort", [])
        ]
        if "_id" in sort_fields:
            self._reply(400, {"error": {
                "type": "illegal_argument_exception",
                "reason": "Fielddata access on the _id field is disallowed,"
                          " you can use doc values instead"}})
            return
        if "_shard_doc" in sort_fields and not pit:
            self._reply(400, {"error": {
                "type": "illegal_argument_exception",
                "reason": "[_shard_doc] sort field is only supported in"
                          " [point-in-time] requests"}})
            return
        with st.lock:
            if pit:
                index = st.pits.get(pit.get("id"))
                if index is None:
                    self._reply(404, {"error": {
                        "type": "search_context_missing_exception",
                        "reason": "no such point in time"}})
                    return
            else:
                index = self.path.strip("/").split("/")[0]
                index = st.aliases.get(index, index)
                if body.get("slice"):
                    # real-ES rule: slicing needs a scroll or PIT context
                    self._reply(400, {"error": {
                        "type": "illegal_argument_exception",
                        "reason": "[slice] can only be used with [scroll]"
                                  " or [point-in-time] requests"}})
                    return
            st.search_requests.append({"index": index, "body": body})
            ids = sorted(
                i for i, idx in st.doc_index.items() if idx == index
            )
            sl = body.get("slice")
            if sl:
                ids = [
                    i
                    for i in ids
                    if int(hashlib.md5(i.encode()).hexdigest(), 16)
                    % sl["max"]
                    == sl["id"]
                ]
            after = body.get("search_after")
            if after:
                ids = [i for i in ids if i > after[0]]
            query = body.get("query", {})
            wanted = body.get("_source")  # list -> source filtering
            hits = []
            for i in ids:
                if self._matches(st.docs[i], query):
                    src = st.docs[i]
                    if isinstance(wanted, list):
                        src = {k: v for k, v in src.items() if k in wanted}
                    # per-hit sort values = the keyset cursor the client
                    # echoes back (real ES: the _shard_doc value)
                    hits.append({"_id": i, "_source": src, "sort": [i]})
                    if len(hits) >= body.get("size", 10):
                        break
        self._reply(
            200,
            {
                "hits": {
                    "total": {"value": len(hits), "relation": "gte"},
                    "hits": hits,
                }
            },
        )

    def do_POST(self):
        body = self._read_body()
        st = self.state
        if self.path.rstrip("/").endswith("/_aliases"):
            import fnmatch

            actions = json.loads(body).get("actions", [])
            with st.lock:
                # ES applies the actions array ALL-OR-NOTHING: validate
                # every action against the pre-state first, mutate only
                # if all pass (a mid-loop 404 after an applied add would
                # leave state real ES never produces)
                for a in actions:
                    rm = a.get("remove")
                    if not rm or not rm.get("must_exist", True):
                        continue
                    cur = st.aliases.get(rm["alias"])
                    if cur is None or not fnmatch.fnmatch(
                        cur, rm["index"]
                    ):
                        # alias absent OR present on a non-matching
                        # index: real ES raises either way
                        self._reply(404, {"error": {
                            "type": "aliases_not_found_exception"}})
                        return
                for a in actions:
                    rm = a.get("remove")
                    if rm:
                        cur = st.aliases.get(rm["alias"])
                        if cur is not None and fnmatch.fnmatch(
                            cur, rm["index"]
                        ):
                            del st.aliases[rm["alias"]]
                    add = a.get("add")
                    if add:
                        st.aliases[add["alias"]] = add["index"]
            self._reply(200, {"acknowledged": True})
            return
        if self.path.rstrip("/").endswith("/_search") or (
            self.path.rstrip("/") == "/_search"
        ):
            self._search(json.loads(body or b"{}"))
            return
        if self.path.split("?")[0].rstrip("/").endswith("/_pit"):
            index = self.path.strip("/").split("/")[0]
            with st.lock:
                index = st.aliases.get(index, index)
                st.pit_counter += 1
                pit_id = f"pit-{st.pit_counter:06d}"
                st.pits[pit_id] = index
            self._reply(200, {"id": pit_id})
            return
        if not self.path.rstrip("/").endswith("/_bulk"):
            self._reply(404, {"error": "unknown path " + self.path})
            return
        with st.lock:
            if st.reject_queue:
                status = st.reject_queue.pop(0)
                self._reply(status, {"error": {
                    "type": "rejected", "reason": f"injected {status}"}})
                return
            lines = [ln for ln in body.decode("utf-8").split("\n") if ln.strip()]
            items = []
            errors = False
            i = 0
            while i < len(lines):
                action = json.loads(lines[i])
                op = next(iter(action))           # "index"
                meta = action[op]
                src = json.loads(lines[i + 1])
                i += 2
                doc_id = meta.get("_id")
                if doc_id in st.fail_ids:
                    errors = True
                    items.append({op: {
                        "_index": meta.get("_index"), "_id": doc_id,
                        "status": 400,
                        "error": {"type": "mapper_parsing_exception",
                                  "reason": f"injected parse failure for {doc_id}"}}})
                else:
                    created = doc_id not in st.docs
                    st.docs[doc_id] = src
                    st.doc_index[doc_id] = st.aliases.get(
                        meta.get("_index"), meta.get("_index")
                    )
                    items.append({op: {
                        "_index": meta.get("_index"), "_id": doc_id,
                        "status": 201 if created else 200,
                        "result": "created" if created else "updated"}})
            st.bulk_requests.append({"n_items": len(items)})
        self._reply(200, {"took": 1, "errors": errors, "items": items})


def make_server() -> tuple[ThreadingHTTPServer, MockEsState, str]:
    """Start the mock on an ephemeral port; returns (server, state, url).
    Caller must server.shutdown()."""
    state = MockEsState()
    handler = type("H", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, state, f"http://127.0.0.1:{srv.server_address[1]}"
