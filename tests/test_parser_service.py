"""S9: external parser-service client — retry / timeout / fallback
semantics exercised against a LOCAL fake Tika-protocol service
(reference ``src/extraction/parsers/tika.py`` + ``router.py:245-260``).

The fake server runs in-process on 127.0.0.1; executor-side pandas
workers reach it because local-mode workers share the host's loopback.
Behavior is programmed per URL path prefix so one server covers every
scenario, and a request counter (served via ``GET /_count``) lets
assertions check attempt budgets across process boundaries.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from car_etl_spark.operators.parser_service import (
    ParserService,
    PermanentServiceError,
    TransientServiceError,
    health_check,
    parse_documents_via_services,
    parse_one,
    parse_with_chain,
)


class _FakeTika(BaseHTTPRequestHandler):
    """Scenario router by path prefix:

    - ``/ok/tika``        -> 200 with the request body upper-cased
    - ``/ok/meta``        -> 200 JSON with xmpTPg:NPages=3
    - ``/nometa/tika``    -> 200; ``/nometa/meta`` -> 500 (optional path)
    - ``/flaky2/tika``    -> 500 for the first 2 hits, then 200
    - ``/err500/tika``    -> always 500 (transient class)
    - ``/err422/tika``    -> always 422 (permanent class)
    - ``/slow/tika``      -> sleeps 1.5 s, then 200
    """

    counts: dict[str, int] = {}
    lock = threading.Lock()

    def log_message(self, *a):  # silence
        pass

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def _send(self, code: int, body: bytes, ctype: str = "text/plain"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/_count":
            with self.lock:
                self._send(200, json.dumps(self.counts).encode(), "application/json")
        elif self.path.endswith("/tika"):
            self._send(200, b"Apache Tika says hi")
        else:
            self._send(404, b"")

    def do_PUT(self):
        body = self._body()
        with self.lock:
            self.counts[self.path] = self.counts.get(self.path, 0) + 1
            hits = self.counts[self.path]
        if self.path == "/ok/tika":
            self._send(200, body.upper())
        elif self.path == "/ok/meta":
            self._send(200, json.dumps({"xmpTPg:NPages": 3}).encode(), "application/json")
        elif self.path == "/nometa/tika":
            self._send(200, body.upper())
        elif self.path == "/flaky2/tika":
            if hits <= 2:
                self._send(500, b"boom")
            else:
                self._send(200, b"recovered:" + body)
        elif self.path == "/err500/tika":
            self._send(500, b"boom")
        elif self.path == "/err422/tika":
            self._send(422, b"unsupported")
        elif self.path == "/slow/tika":
            time.sleep(1.5)
            self._send(200, b"slow but fine")
        else:
            self._send(404, b"")


@pytest.fixture(scope="module")
def fake_tika():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FakeTika)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()


def _counts(base: str) -> dict:
    with urllib.request.urlopen(f"{base}/_count", timeout=5) as r:
        return json.loads(r.read())


def svc(base: str, prefix: str, **kw) -> ParserService:
    return ParserService(name=prefix, base_url=f"{base}/{prefix}", **kw)


def test_parse_one_success_with_page_split(fake_tika):
    res = parse_one(svc(fake_tika, "ok"), b"abcdefghij", "text/plain")
    assert res["text"] == "ABCDEFGHIJ"
    assert res["num_pages"] == 3  # from /meta xmpTPg:NPages
    # reference page split: equal char slices (tika.py:100-116)
    assert [p[0] for p in res["pages"]] == [1, 2, 3]
    assert "".join(p[1] for p in res["pages"]) == "ABCDEFGHIJ"
    assert res["parser_used"] == "ok"


def test_meta_failure_is_swallowed(fake_tika):
    res = parse_one(svc(fake_tika, "nometa"), b"xy", "text/plain")
    assert res["text"] == "XY"
    assert res["num_pages"] == 1
    assert res["pages"] == [(1, "XY")]


def test_transient_5xx_retries_then_succeeds(fake_tika):
    res = parse_one(svc(fake_tika, "flaky2", retries=2), b"doc", "text/plain")
    assert res["text"] == "recovered:doc"
    assert _counts(fake_tika)["/flaky2/tika"] == 3  # 2 failures + success


def test_transient_exhausts_retry_budget(fake_tika):
    with pytest.raises(TransientServiceError):
        parse_one(svc(fake_tika, "err500", retries=1), b"doc", "text/plain")
    assert _counts(fake_tika)["/err500/tika"] == 2  # initial + 1 retry


def test_permanent_4xx_does_not_retry(fake_tika):
    with pytest.raises(PermanentServiceError):
        parse_one(svc(fake_tika, "err422", retries=3), b"doc", "text/plain")
    assert _counts(fake_tika)["/err422/tika"] == 1  # retries NOT burned


def test_timeout_is_transient(fake_tika):
    with pytest.raises(TransientServiceError, match="timeout"):
        parse_one(svc(fake_tika, "slow", timeout_sec=0.3), b"doc", "text/plain")


def test_chain_falls_back_on_failure(fake_tika):
    # primary permanently fails -> fallback parses (router.py:252-259)
    res = parse_with_chain(
        (svc(fake_tika, "err422"), svc(fake_tika, "ok")), b"hello", "text/plain"
    )
    assert res["error"] is None
    assert res["parser_used"] == "ok"
    assert res["text"] == "HELLO"


def test_chain_all_failed_reports_error_as_data(fake_tika):
    res = parse_with_chain(
        (svc(fake_tika, "err422"), svc(fake_tika, "err500")), b"x", "text/plain"
    )
    assert res["parser_used"] is None and res["text"] is None
    assert "err422" in res["error"] and "err500" in res["error"]


def test_health_check(fake_tika):
    assert health_check(svc(fake_tika, "ok")) is True
    assert health_check(ParserService("down", "http://127.0.0.1:9")) is False


def test_distributed_parse_over_service_chain(spark, fake_tika):
    """The mapInPandas boundary: executor-side HTTP, fixed output
    schema, per-document error capture (one poison doc poisons only
    its own row)."""
    rows = [
        (1, bytearray(b"first doc"), "text/plain"),
        (2, bytearray(b"second doc"), "text/plain"),
        (3, None, "text/plain"),
    ]
    df = spark.createDataFrame(rows, "media_id int, content binary, mime_type string")
    chain = (svc(fake_tika, "err500"), svc(fake_tika, "ok"))
    out = parse_documents_via_services(df, chain).orderBy("media_id").collect()

    assert [r.media_id for r in out] == [1, 2, 3]
    assert out[0].parsed_text == "FIRST DOC"
    assert out[0].parser_used == "ok"
    assert out[0].error is None
    assert out[0].num_pages == 3
    assert [p.page_number for p in out[0].pages] == [1, 2, 3]
    assert out[1].parsed_text == "SECOND DOC"
    assert out[2].parsed_text is None and out[2].error == "null content"


def test_route_parse_with_service_fallback(spark, fake_tika):
    """Built-in parsers first; only unparseable rows hit the service
    chain; double failures carry the error as data."""
    from car_etl_spark.operators.parser_service import (
        route_parse_with_service_fallback,
    )

    before = _counts(fake_tika).get("/ok/tika", 0)
    rows = [
        # plain text: built-in plain_text parser wins, NO service call
        (1, bytearray(b"clean ascii text"), "text/plain"),
        # container mime: built-in chain is EMPTY (zips explode, not
        # parse) -> the service fallback gets it
        (2, bytearray(b"PK\x03\x04fakezip"), "application/zip"),
        # null content: nothing to parse anywhere
        (3, None, "text/plain"),
    ]
    df = spark.createDataFrame(rows, "media_id int, content binary, mime_type string")
    out = {
        r.media_id: r
        for r in route_parse_with_service_fallback(df, (svc(fake_tika, "ok"),)).collect()
    }
    assert out[1].parsed_text == "clean ascii text"
    assert out[1].parser_used == "plain_text"
    assert out[1].parse_error is None
    assert out[2].parser_used == "ok"          # service rescued it
    assert out[2].parsed_text                   # upper-cased replacement text
    assert out[3].parsed_text is None and out[3].parse_error == "null content"
    # exactly ONE service call was made (row 2 only)
    assert _counts(fake_tika).get("/ok/tika", 0) == before + 1


def test_route_parse_service_chain_all_down(spark, fake_tika):
    from car_etl_spark.operators.parser_service import (
        route_parse_with_service_fallback,
    )

    df = spark.createDataFrame(
        [(9, bytearray(b"PK\x03\x04x"), "application/zip")],
        "media_id int, content binary, mime_type string",
    )
    out = route_parse_with_service_fallback(
        df, (svc(fake_tika, "err422"), svc(fake_tika, "err500"))
    ).collect()[0]
    assert out.parsed_text is None
    assert "err422" in out.parse_error and "err500" in out.parse_error
