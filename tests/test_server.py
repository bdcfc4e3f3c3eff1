"""HTTP ``_search`` surface (webapi/restapi/handlers.go:92-183): a real
server round trip — ThreadingHTTPServer on an ephemeral port, stdlib
urllib client — over a real index, checking the reference's routing
contract (404 unknown index, 400 non-unique_key q=, unique_key lookup,
bool-DSL phrase search) and that the DSL path returns exactly what the
engine's parity search returns."""

import json
import shutil
import threading
import urllib.error
import urllib.parse
import urllib.request

import pytest

from watertower_spark.operators.index_build import build_index
from watertower_spark.operators.search import SearchEngine
from watertower_spark.server import make_server
from watertower_spark.sources import corpus


@pytest.fixture(scope="module")
def served(spark, tmp_index_root):
    rows = corpus.fixture_rows(("searchdata",))
    docs = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=corpus.DOC_SCHEMA,
    )
    tags = spark.createDataFrame(
        [(r["url"], r["tags"]) for r in rows], schema=corpus.TAG_SCHEMA
    )
    idx = f"{tmp_index_root}/http_srv"
    shutil.rmtree(idx, ignore_errors=True)
    build_index(docs, tags, idx, docs_per_shard=3, default_lang="en")
    eng = SearchEngine(spark, idx)
    server = make_server({"default": eng})
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, eng
    server.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_unknown_index_404(served):
    base, _ = served
    code, body = _get(f"{base}/indexes/nope/_search?q=unique_key:x")
    assert code == 404
    assert body["message"] == "index 'nope' is not found"


def test_q_requires_unique_key_prefix(served):
    base, _ = served
    code, body = _get(f"{base}/indexes/default/_search?q=hello")
    assert code == 400
    assert body["message"] == "q= query only supports searching unique_key"


def test_unique_key_lookup(served):
    base, _ = served
    key = urllib.parse.quote("unique_key:fixture://search/200 OK")
    code, body = _get(f"{base}/indexes/default/_search?q={key}")
    assert code == 200
    hits = body["hits"]["hits"]
    assert len(hits) == 1
    assert hits[0]["_type"] == "_doc"
    assert hits[0]["_index"] == "default"
    assert hits[0]["_source"]["unique_key"] == "fixture://search/200 OK"
    # miss → empty hit set, still a 200 (handlers.go:108-121)
    code, body = _get(
        f"{base}/indexes/default/_search?q=unique_key:no-such-doc")
    assert code == 200
    assert body["hits"]["hits"] == []
    assert body["hits"]["total"]["value"] == 0


def test_bool_dsl_matches_engine_parity(served):
    base, eng = served
    dsl = {
        "query": {
            "bool": {
                "must": {"match_phrase": {"content": {"query": "request"}}},
                "filter": {"terms": {"tags": ["NoBody"]}},
            }
        }
    }
    code, body = _post(f"{base}/indexes/default/_search", dsl)
    assert code == 200
    got = [(h["_id"], round(h["_score"], 9)) for h in body["hits"]["hits"]]
    want = [
        (f"d{int(r['doc_id']):x}", round(r["score"], 9))
        for r in eng.search("request", ["NoBody"], "en", mode="parity").collect()
    ]
    assert got == want and got
    assert body["hits"]["total"]["value"] == len(want)
    assert body["timed_out"] is False and "took" in body


def test_invalid_json_body_400(served):
    base, _ = served
    req = urllib.request.Request(
        f"{base}/indexes/default/_search", data=b"{not json",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
