"""HTTP gateway (S11): routes map onto the API facade and return the same
results over the wire."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from gofias_spark.api import FulltextAPI
from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.server import serve

CFG = IndexConfig(n_buckets=3, block_size=16)


@pytest.fixture(scope="module")
def gateway(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("srvidx"))
    docs = synth_corpus(spark, 100)
    build_segment(spark, docs, root, CFG)
    api = FulltextAPI(spark, root)
    api.engine.warm()
    server, _ = serve(api, port=0)  # ephemeral port
    port = server.server_address[1]
    yield api, f"http://127.0.0.1:{port}"
    server.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_routes(gateway):
    api, base = gateway

    status, health = _get(base, "/health")
    assert (status, health["status"]) == (200, "ok")

    status, ver = _get(base, "/api/v1/version")
    assert status == 200 and ver["n_docs"] == 100

    status, res = _get(base, "/api/v1/address/term?term=common_util&size=5")
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_by_term("common_util", size=5).collect()
    assert [i["doc_id"] for i in res["items"]] == [r["doc_id"] for r in direct]

    # filter composes through the query string
    status, res = _get(
        base, "/api/v1/address/term?term=common_util&size=5&lang=py"
    )
    assert status == 200
    assert all(i["lang"] == "py" for i in res["items"])

    status, res = _get(base, "/api/v1/count?term=common_util")
    assert status == 200 and res["count"] == 50

    row = direct[0]
    status, res = _get(
        base,
        "/api/v1/address/guid?repo="
        + urllib.parse.quote(row["repo"], safe="")
        + "&path="
        + urllib.parse.quote(row["path"], safe="")
        + "&commit="
        + urllib.parse.quote(row["commit"], safe=""),
    )
    assert status == 200 and len(res["items"]) == 1
    assert res["items"][0]["sha256"] == row["sha256"]

    status, _ = _get(base, "/api/v1/suggests?term=common_util&size=3")
    assert status == 200

    try:
        status, res = _get(base, "/nope")
        assert res.get("error")
    except urllib.error.HTTPError as e:
        assert e.code == 404
