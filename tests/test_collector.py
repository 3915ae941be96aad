"""Collector against an in-process coordinator stub: state filter,
file-existence dedup, gzip sink, and handoff into extract_queryinfo."""

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from presto_workload_analyzer_spark.sources.collector import Client, collect

from queryinfo_fixtures import make_queryinfo

DOCS = {
    "20240101_080000_00001_aaaaa": make_queryinfo("20240101_080000_00001_aaaaa"),
    "20240101_090000_00002_aaaaa": make_queryinfo(
        "20240101_090000_00002_aaaaa", state="FAILED"
    ),
    "20240101_100000_00003_aaaaa": make_queryinfo("20240101_100000_00003_aaaaa"),
}
LISTING = [
    {"queryId": "20240101_080000_00001_aaaaa", "state": "FINISHED"},
    {"queryId": "20240101_090000_00002_aaaaa", "state": "FAILED"},
    {"queryId": "20240101_100000_00003_aaaaa", "state": "FINISHED"},
    {"queryId": "20240101_110000_00004_aaaaa", "state": "RUNNING"},  # skipped
]


class Handler(BaseHTTPRequestHandler):
    hits: list[str] = []

    def do_GET(self):
        Handler.hits.append(self.path)
        if self.path == "/v1/query":
            payload = json.dumps(LISTING).encode()
        else:
            qid = self.path.split("/")[-1].split("?")[0]
            if qid not in DOCS:
                self.send_error(404)
                return
            payload = json.dumps(DOCS[qid]).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def coordinator():
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    Handler.hits = []
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_collect_filters_and_dedups(coordinator, tmp_path):
    out = tmp_path / "landing"
    n = collect(coordinator, output_dir=out, delay=0.0)
    # RUNNING skipped; FINISHED + FAILED collected
    assert n == 3
    files = sorted(p.name for p in out.glob("*.json.gz"))
    assert files == [
        "20240101_080000_00001_aaaaa.json.gz",
        "20240101_090000_00002_aaaaa.json.gz",
        "20240101_100000_00003_aaaaa.json.gz",
    ]
    # round-trips as valid gzip JSON
    with gzip.open(out / files[0], "rt") as f:
        assert json.load(f)["queryId"] == "20240101_080000_00001_aaaaa"

    # second pass downloads nothing (file-existence dedup)
    before = len(Handler.hits)
    assert collect(coordinator, output_dir=out, delay=0.0) == 0
    # only the listing endpoint was hit again
    assert Handler.hits[before:] == ["/v1/query"]


def test_collect_handoff_to_extract(coordinator, tmp_path, spark):
    out = tmp_path / "landing"
    collect(coordinator, output_dir=out, delay=0.0)
    from presto_workload_analyzer_spark.sources.queryinfo import extract_queryinfo

    df = extract_queryinfo(spark, str(out))
    rows = {r.query_id: r.state for r in df.select("query_id", "state").collect()}
    assert rows == {
        "20240101_080000_00001_aaaaa": "FINISHED",
        "20240101_090000_00002_aaaaa": "FAILED",
        "20240101_100000_00003_aaaaa": "FINISHED",
    }


def test_client_custom_header_warning(caplog):
    c = Client(username_request_header="X-Wrong-User")
    assert "X-Wrong-User" in c._headers
