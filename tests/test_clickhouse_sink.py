"""HTTP ClickHouse sink (K1 wire parity) against an in-process server.

The reference inserts over the ClickHouse HTTP port (nginx.conf:61-63);
no ClickHouse exists in this sandbox, so a plain HTTP server stands in
and records what a real server would receive — URL query string and
JSONEachRow body are the actual protocol, so this pins the wire format.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

from rsyslog_nginx_clickhouse_spark.sinks.clickhouse import (
    clickhouse_http_writer,
    insert_url,
)


class _Recorder(BaseHTTPRequestHandler):
    received: list[tuple[str, bytes]] = []

    def do_POST(self):  # noqa: N802 (http.server API)
        body = self.rfile.read(int(self.headers["Content-Length"]))
        _Recorder.received.append((self.path, body))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # silence per-request stderr noise
        pass


def test_insert_url_encodes_query():
    url = insert_url("http://h:8123", "nginx")
    assert url.startswith("http://h:8123/?query=")
    q = parse_qs(urlparse(url).query)["query"][0]
    assert q == "INSERT INTO nginx FORMAT JSONEachRow"


def test_http_writer_posts_jsoneachrow(spark):
    _Recorder.received = []
    server = HTTPServer(("127.0.0.1", 0), _Recorder)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        batch = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, s string")
        sink = clickhouse_http_writer(f"http://127.0.0.1:{port}",
                                      table="nginx")
        sink(batch, epoch_id=0)
    finally:
        server.shutdown()
    rows = []
    for path, body in _Recorder.received:
        q = parse_qs(urlparse(path).query)["query"][0]
        assert q == "INSERT INTO nginx FORMAT JSONEachRow"
        rows += [json.loads(line) for line in body.decode().splitlines()]
    assert sorted(rows, key=lambda r: r["id"]) == [
        {"id": 1, "s": "a"}, {"id": 2, "s": "b"}, {"id": 3, "s": "c"}]


def test_http_writer_serializes_explicit_nulls(spark):
    _Recorder.received = []
    server = HTTPServer(("127.0.0.1", 0), _Recorder)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        batch = spark.createDataFrame([(1, None)], "id long, s string")
        clickhouse_http_writer(f"http://127.0.0.1:{port}",
                               table="nginx")(batch, 0)
    finally:
        server.shutdown()
    (_, body), = [x for x in _Recorder.received if x[1].strip()]
    assert json.loads(body.decode().strip()) == {"id": 1, "s": None}


class _Failer(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802
        self.rfile.read(int(self.headers["Content-Length"]))
        self.send_response(500)
        self.end_headers()
        self.wfile.write(b"Code: 62. DB::Exception: Syntax error")

    def log_message(self, *a):
        pass


def test_http_writer_surfaces_server_error_body(spark):
    import pytest

    server = HTTPServer(("127.0.0.1", 0), _Failer)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        batch = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(Exception, match="DB::Exception"):
            clickhouse_http_writer(f"http://127.0.0.1:{port}",
                                   table="nginx")(batch, 0)
    finally:
        server.shutdown()
