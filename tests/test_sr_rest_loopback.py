"""SchemaRegistryClient REST path exercised end-to-end over HTTP.

The sandbox has no Confluent deployment, so previous rounds could only
unit-test the wire format and use InMemorySchemaRegistry for flows.
This spins a LOOPBACK HTTP server implementing the two Confluent
endpoints the client speaks (POST /subjects/<s>/versions,
GET /schemas/ids/<id>) with Confluent's semantics (global ids keyed by
schema content, idempotent re-registration), so the REAL client —
urllib transport, headers, JSON bodies, caching — runs unmodified.
This is a protocol test double, not a claim of having talked to a
production registry (that stays environment-gated)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

SCHEMA_A = json.dumps(
    {"type": "record", "name": "A", "fields": [{"name": "x", "type": "long"}]}
)
SCHEMA_B = json.dumps(
    {
        "type": "record",
        "name": "A",
        "fields": [
            {"name": "x", "type": "long"},
            {"name": "y", "type": ["null", "string"], "default": None},
        ],
    }
)


class _SRState:
    def __init__(self):
        self.by_schema: dict[str, int] = {}
        self.by_id: dict[int, str] = {}
        self.subjects: dict[str, list[int]] = {}
        self.hits: list[str] = []


def _make_handler(state: _SRState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            state.hits.append(f"GET {self.path}")
            parts = self.path.strip("/").split("/")
            if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                sid = int(parts[2])
                if sid in state.by_id:
                    return self._json(200, {"schema": state.by_id[sid]})
                return self._json(404, {"error_code": 40403, "message": "Schema not found"})
            return self._json(404, {"error_code": 404, "message": "bad path"})

        def do_POST(self):
            state.hits.append(f"POST {self.path}")
            parts = self.path.strip("/").split("/")
            if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
                subject = parts[1]
                n = int(self.headers["Content-Length"])
                schema = json.loads(self.rfile.read(n))["schema"]
                canon = json.dumps(json.loads(schema), sort_keys=True)
                if canon not in state.by_schema:
                    sid = len(state.by_schema) + 1
                    state.by_schema[canon] = sid
                    state.by_id[sid] = schema
                sid = state.by_schema[canon]
                state.subjects.setdefault(subject, [])
                if sid not in state.subjects[subject]:
                    state.subjects[subject].append(sid)
                return self._json(200, {"id": sid})
            return self._json(404, {"error_code": 404, "message": "bad path"})

    return Handler


@pytest.fixture()
def sr_server():
    state = _SRState()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", state
    finally:
        srv.shutdown()
        srv.server_close()


def test_rest_register_fetch_and_confluent_id_semantics(sr_server):
    from goconnect_spark.functions.serde import SchemaRegistryClient

    url, state = sr_server
    c = SchemaRegistryClient(url)
    id_a = c.register("topic-value", SCHEMA_A)
    id_b = c.register("topic-value", SCHEMA_B)
    assert (id_a, id_b) == (1, 2)
    # Confluent ids are global per schema content: same schema under a
    # DIFFERENT subject returns the same id
    assert c.register("other-value", SCHEMA_A) == id_a
    assert state.subjects == {"topic-value": [1, 2], "other-value": [1]}
    # fetch round-trips the registered document
    assert json.loads(c.schema_by_id(id_b)) == json.loads(SCHEMA_B)
    # client caches: repeated fetch/register do not re-hit the server
    before = len(state.hits)
    assert c.schema_by_id(id_b) and c.register("topic-value", SCHEMA_A) == id_a
    assert len(state.hits) == before
    # a fresh client re-fetches over the wire
    c2 = SchemaRegistryClient(url)
    assert json.loads(c2.schema_by_id(id_a)) == json.loads(SCHEMA_A)
    assert len(state.hits) == before + 1


def test_sr_reencode_flow_over_rest(spark, sr_server):
    """The full batch re-encode flow (test_avro's
    test_sr1_to_sr2_reencode_byte_exact) with REAL REST clients on
    both sides: writer schema fetched over HTTP from registry 1,
    target schema registered over HTTP into registry 2."""
    from goconnect_spark.functions import avro_py
    from goconnect_spark.functions.serde import SchemaRegistryClient, sr_reencode

    url, state = sr_server
    boot = SchemaRegistryClient(url)
    v1_id = boot.register("user-value", SCHEMA_A)

    recs = [{"x": 7}, {"x": -3}]
    payloads = [
        bytes([0]) + v1_id.to_bytes(4, "big") + avro_py.encode(r, SCHEMA_A)
        for r in recs
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, value binary"
    )
    src = SchemaRegistryClient(url)  # cold caches: exercises GET path
    dst = SchemaRegistryClient(url)
    out, tid = sr_reencode(df, "value", src, dst, "user-value", SCHEMA_B)
    assert tid == 2 and any(h.startswith("GET /schemas/ids/") for h in state.hits)
    got = [bytes(r.value) for r in out.orderBy("i").collect()]
    want = [
        bytes([0]) + tid.to_bytes(4, "big")
        + avro_py.encode(avro_py.project(r, SCHEMA_A, SCHEMA_B), SCHEMA_B)
        for r in recs
    ]
    assert got == want
    assert avro_py.decode(got[0][5:], SCHEMA_B) == {"x": 7, "y": None}
