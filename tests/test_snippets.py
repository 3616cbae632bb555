"""Highlight/snippets (ES-highlight analogue): one doc-store access per
result page, token-boundary matches, window-bounded fragments."""

import json
import urllib.error
import urllib.request

import pytest

from gofias_spark.api import FulltextAPI
from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.index.merge import apply_delta
from gofias_spark.query.engine import SearchEngine
from gofias_spark.server import serve

DOCS = [
    ("r", "a.py", "alpha beta gamma " * 10 + "needle stack " + "delta " * 10),
    ("r", "b.py", "needlework is not a needle match for needle queries"),
    ("r", "c.py", "NEEDLE uppercase first then lowercase needle again"),
    ("r", "d.py", "nothing relevant here at all"),
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(r, p, "c0", "py", t) for r, p, t in rows],
        "repo string, path string, commit string, lang string, content string",
    )


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snipidx"))
    build_segment(spark, _df(spark, DOCS), root,
                  IndexConfig(n_buckets=2, block_size=8))
    e = SearchEngine(spark, root)
    e.warm()
    return e


def _by_path(eng):
    rows = eng.get_doc().select("doc_id", "path").collect()
    return {r["path"]: int(r["doc_id"]) for r in rows}


def test_fragments_window_and_tags(eng):
    ids = _by_path(eng)
    out = eng.snippets("needle", [ids["a.py"]], window=12, max_matches=5)
    frags = out["fragments"][0]
    assert len(frags) == 1
    f = frags[0]
    assert "[h]needle[/h]" in f
    # window chars either side of the match, bounded by the text
    assert len(f) <= 12 + len("[h]needle[/h]") + 12


def test_token_boundary_and_max_matches(eng):
    ids = _by_path(eng)
    out = eng.snippets("needle", [ids["b.py"]], max_matches=2)
    frags = out["fragments"][0]
    # 'needlework' must NOT match; the doc has 2 whole-token needles kept
    # of 2 allowed (third occurrence dropped by the cap)
    assert len(frags) == 2
    assert all("[h]needle[/h]" in f for f in frags)
    assert not any("[h]needlework" in f or "[h]needle[/h]work" in f
                   for f in frags)


def test_case_insensitive_and_multi_term(eng):
    ids = _by_path(eng)
    out = eng.snippets("needle stack", [ids["c.py"], ids["a.py"]])
    assert "[h]NEEDLE[/h]" in out["fragments"][0][0]
    joined = " ".join(out["fragments"][1])
    assert "[h]needle[/h]" in joined and "[h]stack[/h]" in joined


def test_unknown_and_empty(eng):
    ids = _by_path(eng)
    out = eng.snippets("needle", [999_999, ids["d.py"]])
    assert list(out["fragments"]) == [[], []]
    assert list(eng.snippets("", [ids["a.py"]])["fragments"]) == [[]]
    assert list(eng.snippets("needle", [])["doc_id"]) == []


def test_tombstoned_doc_gets_no_fragments(spark, eng, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sniptomb"))
    build_segment(spark, _df(spark, DOCS), root,
                  IndexConfig(n_buckets=2, block_size=8))
    victim = None
    e0 = SearchEngine(spark, root)
    for r in e0.get_doc().collect():
        if r["path"] == "b.py":
            victim = r
    apply_delta(
        spark, root,
        deletes=spark.createDataFrame(
            [(victim["repo"], victim["path"])], "repo string, path string"
        ),
    )
    e = SearchEngine(spark, root)
    e.warm()
    out = e.snippets("needle", [int(victim["doc_id"])])
    assert list(out["fragments"]) == [[]]


def test_gateway_highlight_param(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sniphttp"))
    build_segment(spark, _df(spark, DOCS), root,
                  IndexConfig(n_buckets=2, block_size=8))
    api = FulltextAPI(spark, root)
    api.engine.warm()
    server, _ = serve(api, port=0)
    port = server.server_address[1]
    try:
        resp = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/address/term"
            "?term=needle&size=5&highlight=true"
        ))
        assert resp["items"]
        assert all("fragments" in it for it in resp["items"])
        assert any(
            "[h]" in f for it in resp["items"] for f in it["fragments"]
        )
        # fuzzy+highlight is a 400, not a silent no-op
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/v1/address/term"
                "?term=needl&match=fuzzy&highlight=true"
            )
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as exc:
            assert exc.code == 400
    finally:
        server.shutdown()
