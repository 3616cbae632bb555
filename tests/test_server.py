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

CFG = IndexConfig(n_buckets=3, block_size=16, positions=True)


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


def test_range_and_sort_params(gateway):
    """F4/O1 over the wire: <field>.gte/.lt range params and sort= reach the
    engine's filters/sort_by (reference route compilation,
    addressHandler.go:140-165)."""
    api, base = gateway

    status, res = _get(
        base,
        "/api/v1/address/term?term=common_util&size=5"
        "&doclen.gte=100&doclen.lt=800",
    )
    assert status == 200 and len(res["items"]) > 0
    direct = api.search_by_term(
        "common_util", size=5, filters={"doclen": {"gte": 100, "lt": 800}}
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]

    status, res = _get(
        base,
        "/api/v1/address/term?term=common_util&size=5"
        "&sort=lang:asc,_score:desc",
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_by_term(
        "common_util", size=5, sort_by=[("lang", "asc"), ("_score", "desc")]
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    langs = [i["lang"] for i in res["items"]]
    assert langs == sorted(langs)

    # range + sort compose on one route
    status, res = _get(
        base,
        "/api/v1/address/term?term=common_util&size=3"
        "&doclen.gte=100&sort=doclen:desc",
    )
    assert status == 200
    lens = [i["doclen"] for i in res["items"]] if res["items"] and "doclen" in res["items"][0] else None
    # doclen rides the result only when it is a sort attribute
    assert lens is not None and lens == sorted(lens, reverse=True)
    assert all(x >= 100 for x in lens)


def test_exclude_param(gateway):
    """bool.must_not over the wire: exclude= reaches the engine and agrees
    with the direct API; non-and matches reject it with 400."""
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/address/term?term=common_util&size=10&exclude=return",
    )
    assert status == 200
    direct = api.search_by_term(
        "common_util", size=10, must_not="return"
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    # the exclusion bit: the page differs from the unexcluded one
    status, plain = _get(
        base, "/api/v1/address/term?term=common_util&size=10"
    )
    assert {i["doc_id"] for i in res["items"]} != {
        i["doc_id"] for i in plain["items"]
    }
    # excluding the query term itself empties the page (AND semantics)
    status, res = _get(
        base,
        "/api/v1/address/term?term=common_util&size=5&exclude=common_util",
    )
    assert status == 200 and res["items"] == []
    try:
        status, res = _get(
            base,
            "/api/v1/address/term?term=common_util&match=phrase"
            "&exclude=common_util",
        )
        assert status == 400
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_histogram_route(gateway):
    api, base = gateway
    status, res = _get(
        base, "/api/v1/histogram?field=doclen&interval=100&term=common_util"
    )
    assert status == 200 and len(res["buckets"]) > 0
    direct = api.histogram("doclen", 100, "common_util")
    assert [b["bucket"] for b in res["buckets"]] == list(direct["bucket"])
    assert [b["cnt"] for b in res["buckets"]] == list(direct["cnt"])
    # buckets come back key-asc and count every matching doc exactly once
    keys = [b["bucket"] for b in res["buckets"]]
    assert keys == sorted(keys)
    assert sum(b["cnt"] for b in res["buckets"]) == api.count("common_util")
    for bad in (
        "/api/v1/histogram?field=doclen",  # no interval
        "/api/v1/histogram?interval=10",  # no field
        "/api/v1/histogram?field=lang&interval=10",  # non-numeric
        "/api/v1/histogram?field=doclen&interval=0",
    ):
        try:
            status, res = _get(base, bad)
            assert status == 400, bad
        except urllib.error.HTTPError as e:
            assert e.code == 400, bad


def test_search_after_param(gateway):
    """Cursor paging over the wire: the JSON score round-trips exactly
    (repr/parse of float64), so page 2 via search_after equals from=size
    paging."""
    api, base = gateway
    status, p1 = _get(base, "/api/v1/address/term?term=common_util&size=5")
    assert status == 200 and len(p1["items"]) == 5
    last = p1["items"][-1]
    status, p2 = _get(
        base,
        "/api/v1/address/term?term=common_util&size=5"
        f"&search_after={last['score']!r},{last['doc_id']}",
    )
    assert status == 200
    status, off = _get(
        base, "/api/v1/address/term?term=common_util&size=5&from=5"
    )
    assert [i["doc_id"] for i in p2["items"]] == [
        i["doc_id"] for i in off["items"]
    ]
    for bad in (
        "&search_after=1.0,2&from=5",
        "&search_after=1.0,2&sort=lang:asc",
        "&search_after=notafloat,2",
        "&search_after=1.0",
    ):
        try:
            status, res = _get(
                base, "/api/v1/address/term?term=common_util" + bad
            )
            assert status == 400, bad
        except urllib.error.HTTPError as e:
            assert e.code == 400, bad


def _get_status(base, path):
    try:
        with urllib.request.urlopen(base + path, timeout=60) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_paging_clamps(gateway):
    """size/from beyond the result-window cap return 400 instead of
    scheduling an unbounded top-k (ADVICE r02: accidental DoS guard,
    mirroring ES index.max_result_window)."""
    _, base = gateway
    assert _get_status(base, "/api/v1/address/term?term=x&size=100000000") == 400
    assert _get_status(base, "/api/v1/address/term?term=x&from=99999999") == 400
    assert _get_status(base, "/api/v1/address/term?term=x&size=-1") == 400
    assert _get_status(base, "/api/v1/address/term?term=x&size=abc") == 400
    assert _get_status(base, "/api/v1/address/term?term=x&sort=lang:sideways") == 400
    # equality + range on the same field is contradictory input
    assert _get_status(base, "/api/v1/address/term?term=x&lang=py&lang.gte=a") == 400
    assert _get_status(base, "/api/v1/suggests?term=x&size=5000") == 400
    # range ops on prefix-match or unknown fields are malformed requests
    # (400), not engine errors (500)
    assert _get_status(base, "/api/v1/address/term?term=x&path_prefix.gte=src") == 400
    assert _get_status(base, "/api/v1/address/term?term=x&nofield.gte=1") == 400


def test_concurrent_requests_consistent(gateway):
    """The gateway is a ThreadingHTTPServer: concurrent requests hit the
    engine's driver-side serve path from many threads at once and must
    all succeed with identical results (pyarrow dataset reads and the
    small-result materialization are thread-safe)."""
    import concurrent.futures

    _, base = gateway
    path = "/api/v1/address/term?term=common_util&size=5"

    def hit(_):
        return _get(base, path)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(hit, range(24)))
    statuses = {s for s, _ in results}
    assert statuses == {200}
    bodies = [
        [(row["doc_id"], round(row["score"], 9)) for row in b["items"]]
        for _, b in results
    ]
    assert all(b == bodies[0] for b in bodies)
    assert len(bodies[0]) > 0


def test_term_length_clamped(gateway):
    _, base = gateway
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/api/v1/address/term?term=" + "a" * 2000)
    assert e.value.code == 400


def test_string_field_range_operands_stay_strings(gateway):
    """commit.gte=5 must compare as the STRING "5" (type-aware coercion):
    previously the gateway coerced it to int, which 500'd on the
    driver-side evaluator and silently diverged on neq (r3 review)."""
    api, base = gateway

    status, res = _get(
        base, "/api/v1/address/term?term=common_util&size=5&commit.gte=5"
    )
    assert status == 200
    direct = api.search_by_term(
        "common_util", size=5, filters={"commit": {"gte": "5"}}
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]

    # neq on a string field: string comparison, same rows as direct
    status, res = _get(
        base, "/api/v1/count?term=common_util&lang.neq=py"
    )
    assert status == 200
    assert res["count"] == api.count(
        "common_util", filters={"lang": {"neq": "py"}}
    )

    # garbage operand on the numeric field is a 400, not a silent string
    assert _get_status(base, "/api/v1/address/term?term=x&doclen.gte=abc") == 400
    # unknown sort field is malformed input (400), same contract as an
    # unknown filter field — not an engine 500
    assert _get_status(base, "/api/v1/address/term?term=x&sort=bogus:asc") == 400


def test_match_phrase_and_fuzzy_routes(gateway):
    """match=phrase / match=fuzzy on /address/term (extensions beyond the
    reference's operator=and routes) round-trip through the gateway and
    agree with the API facade."""
    api, base = gateway

    status, res = _get(
        base,
        "/api/v1/address/term?term=common_util+helper&match=phrase&size=5",
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_phrase("common_util helper", size=5).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    # phrase docs really contain the adjacency (every even synth doc has
    # the literal line "common_util helper(common_util, 1)")
    assert all(i["doc_id"] % 2 == 0 for i in res["items"])

    status, res = _get(
        base, "/api/v1/address/term?term=common_utik&match=fuzzy&size=5"
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_fuzzy("common_utik", size=5).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]

    # slop= relaxes adjacency to in-order proximity on the phrase route:
    # 'helper 1' is adjacent NOWHERE (the planted line is "common_util
    # helper(common_util, 1)" — one token between), so exact returns 0
    # and slop=1 returns every even doc
    status, res_slop = _get(
        base,
        "/api/v1/address/term?term=helper+1&match=phrase&size=50&slop=1",
    )
    assert status == 200 and len(res_slop["items"]) == 50
    direct = api.search_phrase("helper 1", size=50, slop=1).collect()
    assert [i["doc_id"] for i in res_slop["items"]] == [
        r["doc_id"] for r in direct
    ]
    status, res_exact = _get(
        base, "/api/v1/address/term?term=helper+1&match=phrase&size=50"
    )
    assert status == 200 and res_exact["items"] == []

    # contract errors are 400s, not 500s
    assert _get_status(base, "/api/v1/address/term?term=x&match=bogus") == 400
    assert _get_status(
        base, "/api/v1/address/term?term=a+b&match=fuzzy"
    ) == 400
    assert _get_status(
        base, "/api/v1/address/term?term=a+b&match=phrase&sort=lang:asc"
    ) == 400
    assert _get_status(
        base, "/api/v1/address/term?term=a+b&match=phrase&slop=-1"
    ) == 400
    assert _get_status(
        base, "/api/v1/address/term?term=a+b&match=phrase&slop=999"
    ) == 400
    assert _get_status(
        base, "/api/v1/address/term?term=a+b&match=phrase&slop=x"
    ) == 400

    # span_first= bounds the span's end position (ES span_first); a huge
    # bound degenerates to plain phrase, and contract errors are 400s
    status, res_sf = _get(
        base,
        "/api/v1/address/term?term=common_util+helper&match=phrase"
        "&size=50&span_first=1000000",
    )
    assert status == 200
    direct = api.search_phrase("common_util helper", size=50).collect()
    assert [i["doc_id"] for i in res_sf["items"]] == [
        r["doc_id"] for r in direct
    ]
    status, res_sf2 = _get(
        base,
        "/api/v1/address/term?term=common_util+helper&match=phrase"
        "&size=50&span_first=4",
    )
    assert status == 200
    direct2 = api.search_phrase(
        "common_util helper", size=50, span_first=4
    ).collect()
    assert [i["doc_id"] for i in res_sf2["items"]] == [
        r["doc_id"] for r in direct2
    ]
    assert set(i["doc_id"] for i in res_sf2["items"]) <= set(
        i["doc_id"] for i in res_sf["items"]
    )
    assert _get_status(
        base, "/api/v1/address/term?term=a+b&match=phrase&span_first=0"
    ) == 400
    assert _get_status(
        base, "/api/v1/address/term?term=a+b&match=phrase&span_first=x"
    ) == 400


def test_match_wildcard_route(gateway):
    api, base = gateway
    status, res = _get(
        base, "/api/v1/address/term?term=common_*&match=wildcard&size=5"
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_wildcard("common_*", size=5).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    assert _get_status(
        base, "/api/v1/address/term?term=x*&match=wildcard&sort=lang:asc"
    ) == 400


def test_facets_route(gateway):
    api, base = gateway
    status, res = _get(base, "/api/v1/facets?field=lang&term=common_util&size=3")
    assert status == 200
    direct = api.facets("lang", "common_util", size=3)
    assert [(b["lang"], b["cnt"]) for b in res["buckets"]] == list(
        map(tuple, direct.values.tolist())
    )
    # no term: corpus-wide buckets
    status, res = _get(base, "/api/v1/facets?field=lang&size=2")
    assert status == 200 and len(res["buckets"]) == 2
    # errors surface as 400, not 500
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base, "/api/v1/facets?term=common_util")
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base, "/api/v1/facets?field=nope&term=common_util")
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base, "/api/v1/facets?field=lang&term=x&match=not")
    assert exc.value.code == 400


def test_bool_msm_boost_route(gateway):
    """match=or with minimum_should_match= and boost=term:w — the
    bool.should surface — round-trips through the gateway and matches the
    API facade."""
    api, base = gateway
    q = urllib.parse.quote("merge_6 update_7 shard_8")
    status, res = _get(
        base,
        f"/api/v1/address/term?term={q}&match=or&minimum_should_match=2"
        "&size=5",
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_bool(
        "merge_6 update_7 shard_8", size=5, mode="or",
        minimum_should_match=2,
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]

    # clause boost reorders; boosted gateway result == boosted facade result
    status, res = _get(
        base,
        f"/api/v1/address/term?term={q}&match=or&boost=shard_8:8.0&size=5",
    )
    assert status == 200
    boosted = api.search_bool(
        "merge_6 update_7 shard_8", size=5, mode="or",
        boosts={"shard_8": 8.0},
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in boosted
    ]

    # boost also applies on the and-path (routes through search_bool)
    q2 = urllib.parse.quote("merge_6 update_7")
    status, res = _get(
        base,
        f"/api/v1/address/term?term={q2}&match=and&boost=merge_6:2.0&size=5",
    )
    assert status == 200
    and_boosted = api.search_bool(
        "merge_6 update_7", size=5, mode="and", boosts={"merge_6": 2.0}
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in and_boosted
    ]

    # validation surfaces as 400, not 500
    assert _get_status(
        base, f"/api/v1/address/term?term={q}&match=and"
        "&minimum_should_match=2&boost=x:1"
    ) == 400
    assert _get_status(
        base, f"/api/v1/address/term?term={q}&match=or"
        "&minimum_should_match=nope"
    ) == 400
    assert _get_status(
        base, f"/api/v1/address/term?term={q}&match=or&boost=bad"
    ) == 400
    assert _get_status(
        base, f"/api/v1/address/term?term={q}&match=or&boost=shard_8:0"
    ) == 400
    assert _get_status(
        base, f"/api/v1/address/term?term={q}&match=or&sort=lang:asc"
    ) == 400


def test_agg_routes(gateway):
    """cardinality / percentiles / range aggregation routes round-trip and
    match the API facade."""
    api, base = gateway
    status, res = _get(
        base, "/api/v1/cardinality?field=repo&term=common_util"
    )
    assert status == 200
    assert res["cardinality"] == api.cardinality("repo", "common_util")

    status, res = _get(
        base, "/api/v1/percentiles?field=doclen&ps=50,95&term=common_util"
    )
    assert status == 200
    direct = api.percentiles("doclen", (50.0, 95.0), "common_util")
    assert res["values"] == {"50.0": direct[50.0], "95.0": direct[95.0]}

    status, res = _get(
        base,
        "/api/v1/range?field=doclen&ranges=*-100;100-200;200-*"
        "&term=common_util",
    )
    assert status == 200
    direct = api.range_agg(
        "doclen", [(None, 100.0), (100.0, 200.0), (200.0, None)],
        "common_util",
    )
    assert [(b["range"], b["cnt"]) for b in res["buckets"]] == list(
        map(tuple, direct.values.tolist())
    )

    # errors surface as 400
    assert _get_status(base, "/api/v1/cardinality?term=x") == 400
    assert _get_status(
        base, "/api/v1/percentiles?field=lang&term=common_util"
    ) == 400
    assert _get_status(
        base, "/api/v1/percentiles?field=doclen&ps=abc"
    ) == 400
    assert _get_status(
        base, "/api/v1/range?field=doclen&ranges=nonsense"
    ) == 400
    assert _get_status(
        base, "/api/v1/cardinality?field=lang&term=x&exact=false"
    ) == 400


def test_top_hits_route(gateway):
    api, base = gateway
    status, res = _get(
        base, "/api/v1/top_hits?field=lang&term=common_util&k=2&groups=3"
    )
    assert status == 200
    direct = api.top_hits("lang", "common_util", 2, groups=3)
    assert [
        (h["lang"], h["cnt"], h["doc_id"]) for h in res["hits"]
    ] == [
        (r["lang"], int(r["cnt"]), int(r["doc_id"]))
        for _, r in direct.iterrows()
    ]
    assert _get_status(base, "/api/v1/top_hits?field=lang") == 400
    assert _get_status(base, "/api/v1/top_hits?term=x") == 400
    assert _get_status(
        base, "/api/v1/top_hits?field=lang&term=x&k=1000"
    ) == 400


def test_query_string_route(gateway):
    """/api/v1/search?q= — ES URI-search analogue over the query_string
    compiler: fast path, composition (phrase + should), filters inside q,
    and the 400 contract for syntax/validation errors."""
    import urllib.parse

    api, base = gateway

    def enc(qs_str, extra=""):
        return "/api/v1/search?q=" + urllib.parse.quote(qs_str) + extra

    # fast path: +a +b == structured AND search
    status, res = _get(base, enc("+common_util +helper", "&size=5"))
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_by_term("common_util helper", size=5).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]

    # composition: phrase must + term should, filter inside q
    status, res = _get(
        base, enc('+"common_util helper" func lang:py', "&size=5")
    )
    assert status == 200
    assert all(i["lang"] == "py" for i in res["items"])
    direct = api.query_string(
        '+"common_util helper" func lang:py', size=5, as_pandas=True
    )
    assert [i["doc_id"] for i in res["items"]] == direct["doc_id"].tolist()
    # every hit really contains the adjacency
    pm = api.engine.phrase_matches("common_util helper")
    if not hasattr(pm, "iloc"):
        pm = pm.toPandas()
    phrase_ids = set(pm["doc_id"])
    assert all(i["doc_id"] in phrase_ids for i in res["items"])

    # default_operator + msm params pass through
    status, res = _get(
        base,
        enc("common_util helper func",
            "&minimum_should_match=2&size=5"),
    )
    assert status == 200 and len(res["items"]) == 5

    # 400 contract: missing q, bad syntax, unknown field, bad msm
    assert _get_status(base, "/api/v1/search") == 400
    assert _get_status(base, enc("bogusfield:x y")) == 400
    assert _get_status(base, enc("lang:py")) == 400  # only filters
    assert _get_status(base, enc("term~2")) == 400
    assert _get_status(
        base, enc("common_util", "&minimum_should_match=zero")
    ) == 400
    assert _get_status(base, enc("x" * 2000)) == 400


def test_terms_stats_route(gateway):
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/terms_stats?group=lang&metric=doclen&term=common_util"
        "&size=3",
    )
    assert status == 200 and res["buckets"]
    direct = api.terms_stats("lang", "doclen", "common_util", size=3)
    assert [b["lang"] for b in res["buckets"]] == list(direct["lang"])
    assert [b["cnt"] for b in res["buckets"]] == list(direct["cnt"])
    assert [b["sum"] for b in res["buckets"]] == list(direct["sum"])
    assert _get_status(base, "/api/v1/terms_stats?group=lang") == 400
    assert _get_status(
        base, "/api/v1/terms_stats?group=lang&metric=lang"
    ) == 400
    assert _get_status(
        base, "/api/v1/terms_stats?group=bogus&metric=doclen"
    ) == 400


def test_composite_route_pages(gateway):
    api, base = gateway
    # walk all lang buckets in 2-bucket pages via after_key
    walked, after = [], None
    while True:
        path = "/api/v1/composite?field=lang&term=common_util&size=2"
        if after is not None:
            path += f"&after={after}"
        status, res = _get(base, path)
        assert status == 200
        if not res["buckets"]:
            assert res["after_key"] is None
            break
        walked += res["buckets"]
        assert res["after_key"] == res["buckets"][-1]["lang"]
        after = res["after_key"]
    full = api.facets("lang", "common_util", size=1000)
    assert sorted(b["lang"] for b in walked) == sorted(full["lang"])
    assert {b["lang"]: b["cnt"] for b in walked} == {
        r[0]: r[1] for r in full.itertuples(index=False)
    }
    assert _get_status(base, "/api/v1/composite?term=x") == 400


def test_suggester_routes(gateway):
    api, base = gateway
    status, res = _get(base, "/api/v1/suggest_terms?term=common_utik")
    assert status == 200
    direct = api.suggest_terms("common_utik")
    assert [(s["term"], s["df"]) for s in res["suggestions"]] == list(
        direct.itertuples(index=False, name=None)
    )
    assert res["suggestions"][0]["term"] == "common_util"

    status, res = _get(base, "/api/v1/complete?prefix=common&size=3")
    assert status == 200
    direct = api.complete_prefix("common", size=3)
    assert [(s["term"], s["df"]) for s in res["suggestions"]] == list(
        direct.itertuples(index=False, name=None)
    )
    assert _get_status(base, "/api/v1/suggest_terms?term=a+b") == 400
    assert _get_status(base, "/api/v1/complete?prefix=") == 400


def test_rescore_route(gateway):
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/rescore?term=common_util&rescore=common_util"
        "&window=20&size=5&rescore_weight=2.0",
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.rescore(
        "common_util", "common_util", size=5, window_size=20,
        rescore_weight=2.0, as_pandas=True,
    )
    assert [i["doc_id"] for i in res["items"]] == [
        int(x) for x in direct["doc_id"]
    ]
    assert _get_status(base, "/api/v1/rescore?term=x") == 400  # no rescore=
    assert _get_status(
        base, "/api/v1/rescore?term=x&rescore=y&window=2&size=5"
    ) == 400  # window < size
    assert _get_status(
        base, "/api/v1/rescore?term=x&rescore=y&window=zz"
    ) == 400


def test_function_score_route(gateway):
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/function_score?term=common_util&field=doclen"
        "&modifier=log1p&factor=0.1&size=5",
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.function_score(
        "common_util", size=5, field="doclen", modifier="log1p",
        factor=0.1, as_pandas=True,
    )
    assert [i["doc_id"] for i in res["items"]] == [
        int(x) for x in direct["doc_id"]
    ]
    assert _get_status(
        base, "/api/v1/function_score?term=x&modifier=bogus"
    ) == 400
    assert _get_status(
        base, "/api/v1/function_score?term=x&field=lang"
    ) == 400  # non-numeric field
    assert _get_status(
        base, "/api/v1/function_score?term=x&factor=zz"
    ) == 400


def test_collapse_route(gateway):
    api, base = gateway
    status, res = _get(
        base, "/api/v1/collapse?field=lang&term=common_util&size=5"
    )
    assert status == 200 and len(res["hits"]) > 0
    direct = api.collapse("lang", "common_util", size=5)
    assert [
        (h["lang"], h["doc_id"]) for h in res["hits"]
    ] == [(r["lang"], int(r["doc_id"])) for _, r in direct.iterrows()]
    langs = [h["lang"] for h in res["hits"]]
    assert len(langs) == len(set(langs))  # one hit per group
    assert _get_status(base, "/api/v1/collapse?term=x") == 400  # no field
    assert _get_status(
        base, "/api/v1/collapse?field=nosuch&term=x"
    ) == 400


def test_regexp_route_and_exists_filter(gateway):
    api, base = gateway
    status, res = _get(
        base, "/api/v1/address/term?term=common_.til|common_util&match=regexp&size=5"
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_regexp("common_.til|common_util", size=5,
                               as_pandas=True)
    assert [i["doc_id"] for i in res["items"]] == [
        int(x) for x in direct["doc_id"]
    ]
    # unportable pattern -> 400, not 500
    assert _get_status(
        base,
        "/api/v1/address/term?term=" +
        urllib.parse.quote("(?=x).*") + "&match=regexp",
    ) == 400
    # exists filter param routes through
    status, res = _get(
        base, "/api/v1/address/term?term=common_util&size=5&lang.exists=true"
    )
    assert status == 200
    assert all(i["lang"] is not None for i in res["items"])
    assert _get_status(
        base, "/api/v1/address/term?term=x&lang.exists=maybe"
    ) == 400


def _get_with_headers(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, json.loads(r.read()), dict(r.headers)


def test_response_cache_and_metrics(spark, tmp_path):
    """ES request-cache analogue: repeated identical requests serve from
    the LRU (X-Cache MISS -> HIT, identical bodies); a delta import
    rotates the engine's query_state_token so the next request re-misses
    and reflects the new state. /metrics reports the counters."""
    from gofias_spark.index.merge import apply_delta

    root = str(tmp_path / "cidx")
    docs = synth_corpus(spark, 60)
    build_segment(spark, docs, root, CFG)
    api = FulltextAPI(spark, root)
    api.engine.warm()
    server, _ = serve(api, port=0, cache_size=64)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        p = "/api/v1/address/term?term=common_util&size=5"
        s1, b1, h1 = _get_with_headers(base, p)
        s2, b2, h2 = _get_with_headers(base, p)
        assert (s1, s2) == (200, 200)
        assert h1.get("X-Cache") == "MISS" and h2.get("X-Cache") == "HIT"
        assert b1 == b2
        # errors are not cached
        st = _get_status(base, "/api/v1/address/term?term=x&size=1e9")
        assert st == 400

        # delta import -> token rotates -> MISS with the new result
        victim = b1["items"][0]
        deletes = spark.createDataFrame(
            [(victim["repo"], victim["path"])], "repo string, path string"
        )
        apply_delta(spark, root, deletes=deletes)
        api._reopen()
        s3, b3, h3 = _get_with_headers(base, p)
        assert s3 == 200 and h3.get("X-Cache") == "MISS"
        assert victim["doc_id"] not in [i["doc_id"] for i in b3["items"]]

        status, m = _get(base, "/metrics")
        assert status == 200
        assert m["cache_hits"] >= 1 and m["cache_misses"] >= 2
        assert m["requests_total"] >= 4 and m["errors_4xx"] >= 1
        assert m["by_path"]["/api/v1/address/term"] >= 3
        assert m["cache_entries"] >= 1
    finally:
        server.shutdown()
        api.close()


def test_metrics_hygiene(gateway):
    """Error traffic must not skew the cache hit ratio, and by_path label
    cardinality is bounded so URL scanners can't grow /metrics forever."""
    _, base = gateway
    _, m0 = _get(base, "/metrics")
    # a 400 on a cacheable route: counted as error, NOT as a cache miss
    assert _get_status(base, "/api/v1/address/term?term=x&size=1e9") == 400
    _, m1 = _get(base, "/metrics")
    assert m1["errors_4xx"] == m0["errors_4xx"] + 1
    assert m1["cache_misses"] == m0["cache_misses"]
    # unique 404 paths collapse into _other once the label map is full
    for i in range(70):
        assert _get_status(base, f"/scanner/probe_{i}") == 404
    _, m2 = _get(base, "/metrics")
    assert len(m2["by_path"]) <= 65
    assert m2["by_path"].get("_other", 0) >= 5


def test_phrase_prefix_route(gateway):
    api, base = gateway
    q = urllib.parse.quote("common_util hel")
    status, res = _get(
        base, f"/api/v1/address/term?term={q}&match=phrase_prefix&size=5"
    )
    assert status == 200 and res["items"]
    direct = api.search_phrase_prefix("common_util hel", size=5,
                                      as_pandas=True)
    assert [i["doc_id"] for i in res["items"]] == [
        int(x) for x in direct["doc_id"]
    ]
    # cap validation
    try:
        status, _ = _get(
            base,
            f"/api/v1/address/term?term={q}&match=phrase_prefix"
            "&max_expansions=0",
        )
        assert status == 400
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_count_many_route(gateway):
    api, base = gateway
    qs = urllib.parse.urlencode(
        [("query", "cu:common_util"), ("query", "zz:zzzmissing")]
    )
    status, res = _get(base, f"/api/v1/count_many?{qs}")
    assert status == 200
    assert res["counts"]["cu"] == api.count("common_util")
    assert res["counts"]["zz"] == 0
    # malformed query param -> 400
    try:
        status, _ = _get(base, "/api/v1/count_many?query=nocolon")
        assert status == 400
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_adjacency_matrix_route(gateway):
    api, base = gateway
    qs = urllib.parse.urlencode(
        [("query", "cu:common_util"), ("query", "hl:helper")]
    )
    status, res = _get(base, f"/api/v1/adjacency_matrix?{qs}")
    assert status == 200
    assert res["buckets"]["cu"] == api.count("common_util")
    assert res["buckets"]["hl"] == api.count("helper")
    if "cu&hl" in res["buckets"]:
        assert res["buckets"]["cu&hl"] == api.count("common_util helper")


def test_suggest_phrase_route(gateway):
    api, base = gateway
    q = urllib.parse.quote("common_utl helpr")
    status, res = _get(base, f"/api/v1/suggest_phrase?term={q}&collate=true")
    assert status == 200
    direct = api.suggest_phrase("common_utl helpr", collate=True)
    assert [s["suggestion"] for s in res["suggestions"]] == list(
        direct["suggestion"]
    )
    if res["suggestions"]:
        assert res["suggestions"][0]["suggestion"] == "common_util helper"


def test_boosting_route(gateway):
    """negative= demotes (ES boosting query) on /address/term."""
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/address/term?term=common_util&size=10"
        "&negative=slow&negative_boost=0.3",
    )
    assert status == 200 and len(res["items"]) == 10
    direct = api.search_boosting(
        "common_util", "slow", negative_boost=0.3, size=10
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    # same doc count as plain search on a bigger page: demoted, not dropped
    status, res_all = _get(
        base,
        "/api/v1/address/term?term=common_util&size=100&negative=slow",
    )
    status, plain_all = _get(
        base, "/api/v1/address/term?term=common_util&size=100"
    )
    assert len(res_all["items"]) == len(plain_all["items"])
    # contract errors are 400s
    assert _get_status(
        base, "/api/v1/address/term?term=a&negative=b&negative_boost=2.0"
    ) == 400
    assert _get_status(
        base, "/api/v1/address/term?term=a&negative=b&negative_boost=x"
    ) == 400
    assert _get_status(
        base, "/api/v1/address/term?term=a&negative=b&sort=lang:asc"
    ) == 400


def test_bool_prefix_route(gateway):
    """match=bool_prefix: search-as-you-type without adjacency."""
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/address/term?term=common_ut&match=bool_prefix&size=5",
    )
    assert status == 200 and len(res["items"]) == 5
    direct = api.search_bool_prefix("common_ut", size=5).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    status, res_and = _get(
        base,
        "/api/v1/address/term?term=helper+common_ut&match=bool_prefix"
        "&operator=and&size=5",
    )
    assert status == 200 and len(res_and["items"]) == 5
    assert _get_status(
        base, "/api/v1/address/term?term=a&match=bool_prefix&operator=x"
    ) == 400
    assert _get_status(
        base,
        "/api/v1/address/term?term=a&match=bool_prefix&sort=lang:asc",
    ) == 400


def test_bool_prefix_default_cap_and_max_expansions_param(gateway):
    """The API wrapper inherits the engine's DEFAULT_MAX_EXPANSIONS
    rewrite bound (r4 advice: a public 1-char prefix must never trigger
    an unbounded expansion), and the route takes max_expansions= like
    phrase_prefix does."""
    import inspect

    from gofias_spark.api import FulltextAPI
    from gofias_spark.query.engine import DEFAULT_MAX_EXPANSIONS

    sig = inspect.signature(FulltextAPI.search_bool_prefix)
    assert (
        sig.parameters["max_expansions"].default == DEFAULT_MAX_EXPANSIONS
    )
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/address/term?term=common_ut&match=bool_prefix&size=5"
        "&max_expansions=1",
    )
    assert status == 200
    direct = api.search_bool_prefix(
        "common_ut", size=5, max_expansions=1
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    assert _get_status(
        base,
        "/api/v1/address/term?term=a&match=bool_prefix&max_expansions=0",
    ) == 400
    assert _get_status(
        base,
        "/api/v1/address/term?term=a&match=bool_prefix&max_expansions=x",
    ) == 400


def test_bulk_route(spark, tmp_path_factory):
    """POST /api/v1/bulk (ES _bulk / reference S6 sink): index + delete
    actions apply as one MERGE; own index so the shared gateway fixture
    stays immutable."""
    root = str(tmp_path_factory.mktemp("bulkidx"))
    docs = synth_corpus(spark, 40)
    build_segment(spark, docs, root, CFG)
    api = FulltextAPI(spark, root)
    api.engine.warm()
    server, _ = serve(api, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        victim = api.engine.search("common_util", k=1).collect()[0]
        n0 = api.engine.stats()["n_docs"]
        body = "\n".join([
            json.dumps({"index": {}}),
            json.dumps({"repo": "newrepo", "path": "a.py", "commit": "c1",
                        "lang": "py",
                        "content": "def bulk_added(): return 1"}),
            json.dumps({"delete": {"repo": victim["repo"],
                                   "path": victim["path"]}}),
        ])
        req = urllib.request.Request(
            base + "/api/v1/bulk", data=body.encode(),
            headers={"Content-Type": "application/x-ndjson"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            res = json.loads(r.read())
        assert res["indexed"] == 1 and res["deleted"] == 1
        assert res["errors"] is False
        # api reopened over the post-merge state
        assert api.engine.stats()["n_docs"] == n0  # -1 +1
        assert api.get_doc(repo=victim["repo"],
                           path=victim["path"]).collect() == []
        hits = api.engine.search("bulk_added", k=5).collect()
        assert len(hits) == 1 and hits[0]["repo"] == "newrepo"
        # reads through the gateway see the new state (token-keyed cache)
        status, res2 = _get(base, "/api/v1/address/term?term=bulk_added")
        assert status == 200 and len(res2["items"]) == 1

        # contract errors are 400s
        def post(b):
            req = urllib.request.Request(base + "/api/v1/bulk",
                                         data=b.encode())
            try:
                with urllib.request.urlopen(req, timeout=60) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        assert post("") == 400
        assert post("not json") == 400
        assert post(json.dumps({"index": {}})) == 400        # no source
        assert post(json.dumps({"upsert": {}})) == 400       # bad action
        assert post("\n".join([json.dumps({"index": {}}),
                               json.dumps({"repo": "x"})])) == 400
        assert post(json.dumps({"delete": {"repo": "x"}})) == 400
        # POST to a non-bulk path is a 404
        req = urllib.request.Request(base + "/api/v1/address/term",
                                     data=b"x")
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 404
    finally:
        server.shutdown()


def test_concurrent_bulk_no_lost_update(spark, tmp_path_factory):
    """Two concurrent mutators must BOTH land (r4 advice: apply_delta's
    read-manifest/compute/write-manifest cycle was outside the lock, so
    a ThreadingHTTPServer could drop one batch's manifest delta). The
    mutation lock now serializes the whole apply_delta + reopen
    sequence."""
    import threading as _t

    root = str(tmp_path_factory.mktemp("bulkrace"))
    build_segment(spark, synth_corpus(spark, 30), root, CFG)
    api = FulltextAPI(spark, root)
    try:
        n0 = api.engine.stats()["n_docs"]
        errs = []

        def add(i):
            try:
                api.bulk(upserts=[{
                    "repo": f"racer{i}", "path": "r.py", "commit": "c",
                    "lang": "py",
                    "content": f"def race_probe_{i}(): return {i}",
                }])
            except Exception as exc:  # noqa: BLE001 - fail the test below
                errs.append(exc)

        threads = [_t.Thread(target=add, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        assert api.engine.stats()["n_docs"] == n0 + 3
        for i in range(3):
            hits = api.engine.search(f"race_probe_{i}", k=2).collect()
            assert len(hits) == 1 and hits[0]["repo"] == f"racer{i}"
    finally:
        api.close()


def test_span_not_route(spark, tmp_path_factory):
    """match=phrase&span_not= on a positional index (per-span exclusion)."""
    root = str(tmp_path_factory.mktemp("snridx"))
    docs = synth_corpus(spark, 60)
    build_segment(spark, docs, root,
                  IndexConfig(n_buckets=2, block_size=16, positions=True))
    api = FulltextAPI(spark, root)
    api.engine.warm()
    server, _ = serve(api, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, plain = _get(
            base,
            "/api/v1/address/term?term=common_util+helper&match=phrase"
            "&size=50",
        )
        assert status == 200 and plain["items"]
        status, sn = _get(
            base,
            "/api/v1/address/term?term=common_util+helper&match=phrase"
            "&span_not=slow&span_not_pre=3&span_not_post=3&size=50",
        )
        assert status == 200
        direct = api.search_span_not("common_util helper", "slow",
                                     size=50, pre=3, post=3).collect()
        assert [i["doc_id"] for i in sn["items"]] == [
            r["doc_id"] for r in direct
        ]
        assert set(i["doc_id"] for i in sn["items"]) <= set(
            i["doc_id"] for i in plain["items"]
        )
        assert _get_status(
            base,
            "/api/v1/address/term?term=a+b&match=phrase&span_not=x"
            "&slop=1",
        ) == 400
        assert _get_status(
            base,
            "/api/v1/address/term?term=a+b&match=phrase&span_not=x"
            "&span_not_pre=-1",
        ) == 400
    finally:
        server.shutdown()


def test_new_agg_routes(gateway):
    """rare_terms / multi_terms / percentile_ranks / mad routes."""
    api, base = gateway
    status, rt = _get(
        base, "/api/v1/rare_terms?field=doclen&term=common_util"
              "&max_doc_count=3&max_buckets=5",
    )
    assert status == 200 and len(rt["buckets"]) <= 5
    direct = api.rare_terms("doclen", "common_util", max_doc_count=3,
                            max_buckets=5)
    assert [b["doclen"] for b in rt["buckets"]] == \
        direct["doclen"].tolist()

    status, mt = _get(
        base, "/api/v1/multi_terms?fields=lang,repo&term=common_util&size=4"
    )
    assert status == 200 and 1 <= len(mt["buckets"]) <= 4
    direct = api.multi_terms(["lang", "repo"], "common_util", size=4)
    assert [(b["lang"], b["repo"], b["cnt"]) for b in mt["buckets"]] == \
        list(map(tuple, direct[["lang", "repo", "cnt"]].values.tolist()))

    status, pr = _get(
        base,
        "/api/v1/percentile_ranks?field=doclen&values=10,100000"
        "&term=common_util",
    )
    assert status == 200
    assert pr["values"]["100000.0"] == 100.0

    status, md = _get(base, "/api/v1/mad?field=doclen&term=common_util")
    assert status == 200
    assert md["mad"] == api.mad("doclen", "common_util")

    for bad in (
        "/api/v1/rare_terms?term=x",                       # no field
        "/api/v1/rare_terms?field=bogus",                  # unknown field
        "/api/v1/multi_terms?fields=lang",                 # < 2 fields
        "/api/v1/percentile_ranks?field=doclen&values=x",  # bad values
        "/api/v1/mad?field=lang",                          # non-numeric
    ):
        assert _get_status(base, bad) == 400, bad


def test_bool_prefix_filter_params(gateway):
    """match=bool_prefix now applies the same filter params every other
    match mode honors (lang=, <field>.gte=), instead of silently
    returning unfiltered results."""
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/address/term?term=common_ut&match=bool_prefix"
        "&lang=py&size=10",
    )
    assert status == 200
    assert res["items"], "filtered bool_prefix should still match"
    assert all(i["lang"] == "py" for i in res["items"])
    direct = api.search_bool_prefix(
        "common_ut", size=10, filters={"lang": "py"}
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    # range filters reach the engine too
    status, res2 = _get(
        base,
        "/api/v1/address/term?term=common_ut&match=bool_prefix"
        "&doclen.gte=1&size=10",
    )
    assert status == 200 and res2["items"]


def test_negative_rejects_msm_and_boost(gateway):
    """negative= (boosting query) wins branch dispatch over the bool
    msm/boost branch — those params must 400, not silently drop."""
    _, base = gateway
    q = "term=common_util&match=or&negative=helper"
    assert _get_status(
        base, f"/api/v1/address/term?{q}&minimum_should_match=1"
    ) == 400
    assert _get_status(
        base, f"/api/v1/address/term?{q}&boost=common_util:2.0"
    ) == 400
    # sanity: without the conflicting params the boosting route still runs
    assert _get_status(base, f"/api/v1/address/term?{q}") == 200


def test_bulk_ordered_last_wins(spark, tmp_path_factory):
    """ES _bulk sequential semantics: within one NDJSON batch the LAST
    action on a (repo, path) key wins — index-then-delete leaves the doc
    absent, delete-then-index leaves it live (the pre-fix merge let the
    upsert always win)."""
    root = str(tmp_path_factory.mktemp("bulkorder"))
    docs = synth_corpus(spark, 30)
    build_segment(spark, docs, root, CFG)
    api = FulltextAPI(spark, root)
    api.engine.warm()
    server, _ = serve(api, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        victim = api.engine.search("common_util", k=1).collect()[0]
        doc_a = {"repo": "ord/r1", "path": "a.py", "commit": "c1",
                 "lang": "py", "content": "def ordered_batch_a(): pass"}
        body = "\n".join([
            # new doc indexed then deleted in the SAME batch -> absent
            json.dumps({"index": {}}),
            json.dumps(doc_a),
            json.dumps({"delete": {"repo": "ord/r1", "path": "a.py"}}),
            # pre-existing doc deleted then re-indexed -> live, new body
            json.dumps({"delete": {"repo": victim["repo"],
                                   "path": victim["path"]}}),
            json.dumps({"index": {}}),
            json.dumps({"repo": victim["repo"], "path": victim["path"],
                        "commit": "c2", "lang": victim["lang"],
                        "content": "def ordered_batch_b(): pass"}),
        ])
        req = urllib.request.Request(
            base + "/api/v1/bulk", data=body.encode(),
            headers={"Content-Type": "application/x-ndjson"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            res = json.loads(r.read())
        # counts report actions accepted, ES-style
        assert res["indexed"] == 2 and res["deleted"] == 2
        assert api.get_doc(repo="ord/r1", path="a.py").collect() == []
        assert api.engine.search("ordered_batch_a", k=5).collect() == []
        hits = api.engine.search("ordered_batch_b", k=5).collect()
        assert len(hits) == 1
        assert hits[0]["repo"] == victim["repo"]
        assert hits[0]["commit"] == "c2"
    finally:
        server.shutdown()


def test_bulk_two_list_form_upsert_wins(spark, tmp_path_factory):
    """The programmatic upserts=/deletes= form keeps its documented
    UPSERT-WINS semantics on keys present in both lists."""
    root = str(tmp_path_factory.mktemp("bulklists"))
    docs = synth_corpus(spark, 20)
    build_segment(spark, docs, root, CFG)
    api = FulltextAPI(spark, root)
    api.engine.warm()
    doc = {"repo": "ord/r2", "path": "b.py", "commit": "c9",
           "lang": "py", "content": "def twolist_doc(): pass"}
    res = api.bulk(upserts=[doc],
                   deletes=[{"repo": "ord/r2", "path": "b.py"}])
    assert res["indexed"] == 1 and res["deleted"] == 1
    assert len(api.engine.search("twolist_doc", k=5).collect()) == 1
    api.close()


def test_span_near_route(gateway):
    """match=phrase&in_order=false = Lucene span_near unordered: terms
    within the window in either order; the gateway mirrors the API
    facade, and bad in_order values / span_not combos are 400s."""
    api, base = gateway
    q = urllib.parse.quote("batch_450 query_300")
    status, res = _get(
        base,
        f"/api/v1/address/term?term={q}&match=phrase&slop=3"
        "&in_order=false&size=10",
    )
    assert status == 200
    direct = api.search_span_near(
        "batch_450 query_300", slop=3, in_order=False, size=10
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    # unordered must be a superset of (or equal to) the ordered match set
    status, res_ord = _get(
        base,
        f"/api/v1/address/term?term={q}&match=phrase&slop=3&size=10",
    )
    assert status == 200
    assert {i["doc_id"] for i in res_ord["items"]} <= {
        i["doc_id"] for i in res["items"]
    } or len(res["items"]) == 10
    assert _get_status(
        base,
        f"/api/v1/address/term?term={q}&match=phrase&in_order=maybe",
    ) == 400
    assert _get_status(
        base,
        f"/api/v1/address/term?term={q}&match=phrase&in_order=false"
        "&span_not=key",
    ) == 400


def test_analyze_route(gateway):
    """GET /api/v1/analyze (ES _analyze analogue): token stream +
    positions under the index analyzer or an explicit mode."""
    api, base = gateway
    status, res = _get(
        base, "/api/v1/analyze?text=" + urllib.parse.quote("Foo_bar BAZ!")
    )
    assert status == 200 and res["analyzer"] == "standard"
    assert [t["token"] for t in res["tokens"]] == ["foo_bar", "baz"]
    assert [t["position"] for t in res["tokens"]] == [0, 1]
    status, res2 = _get(
        base, "/api/v1/analyze?text=scan&mode=edge_ngram"
    )
    assert status == 200
    assert "sc" in [t["token"] for t in res2["tokens"]]
    assert _get_status(base, "/api/v1/analyze") == 400          # no text
    assert _get_status(
        base, "/api/v1/analyze?text=x&mode=bogus"
    ) == 400


def test_sampler_route(gateway):
    """GET /api/v1/sampler (ES sampler/diversified_sampler + terms):
    facet counts over only the top-shard_size scoring matches; diversify
    caps docs per value; param validation is a 400."""
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/sampler?term=common_util&field=lang&shard_size=20&size=5",
    )
    assert status == 200
    direct = api.sampler_facets("lang", "common_util", shard_size=20, k=5)
    assert [(b["lang"], b["cnt"]) for b in res["buckets"]] == [
        (r["lang"], int(r["cnt"])) for _, r in direct.iterrows()
    ]
    assert sum(b["cnt"] for b in res["buckets"]) <= 20
    status, res_div = _get(
        base,
        "/api/v1/sampler?term=common_util&field=lang&shard_size=20"
        "&size=5&diversify=repo&max_docs_per_value=1",
    )
    assert status == 200
    # <=1 doc per repo: sample can only shrink
    assert sum(b["cnt"] for b in res_div["buckets"]) <= sum(
        b["cnt"] for b in res["buckets"]
    )
    for bad in (
        "/api/v1/sampler?field=lang",                      # no term
        "/api/v1/sampler?term=x",                          # no field
        "/api/v1/sampler?term=x&field=bogus",              # unknown field
        "/api/v1/sampler?term=x&field=lang&shard_size=0",  # bad size
        "/api/v1/sampler?term=x&field=lang&diversify=bogus",
    ):
        assert _get_status(base, bad) == 400, bad


def test_synonyms_route(gateway):
    """match=and|or with synonyms=token:alt1|alt2 widens each token to
    an OR-group (ES search-time synonym filter); conflicts are 400s."""
    api, base = gateway
    q = urllib.parse.quote("func common_util")
    syn = urllib.parse.quote("func:def")
    status, res = _get(
        base,
        f"/api/v1/address/term?term={q}&synonyms={syn}&size=10",
    )
    assert status == 200 and res["items"]
    direct = api.search_synonyms(
        "func common_util", {"func": ["def"]}, size=10
    ).collect()
    assert [i["doc_id"] for i in res["items"]] == [
        r["doc_id"] for r in direct
    ]
    # widening can only add matches vs the plain AND query
    status, plain = _get(
        base, f"/api/v1/address/term?term={q}&size=100"
    )
    status2, wide = _get(
        base, f"/api/v1/address/term?term={q}&synonyms={syn}&size=100"
    )
    assert status == status2 == 200
    assert {i["doc_id"] for i in plain["items"]} <= {
        i["doc_id"] for i in wide["items"]
    }
    for bad in (
        f"/api/v1/address/term?term={q}&synonyms=noseparator",
        f"/api/v1/address/term?term={q}&synonyms={syn}&synonyms={syn}",
        f"/api/v1/address/term?term={q}&synonyms={syn}&boost=func:2.0",
        f"/api/v1/address/term?term={q}&synonyms={syn}&negative=def",
    ):
        assert _get_status(base, bad) == 400, bad


def test_function_score_decay_route(gateway):
    """function_score decay mode (gauss/exp/linear): origin/scale params
    switch the function from field_value_factor; validation is 400."""
    api, base = gateway
    status, res = _get(
        base,
        "/api/v1/function_score?term=common_util&field=doclen"
        "&shape=gauss&origin=100&scale=80&size=5",
    )
    assert status == 200 and res["items"]
    direct = api.function_score(
        "common_util", size=5, field="doclen",
        decay={"shape": "gauss", "origin": 100.0, "scale": 80.0},
        as_pandas=True,
    )
    assert [i["doc_id"] for i in res["items"]] == [
        int(x) for x in direct["doc_id"]
    ]
    for bad in (
        "/api/v1/function_score?term=x&shape=gauss",        # no origin
        "/api/v1/function_score?term=x&origin=1&scale=abc",
        "/api/v1/function_score?term=x&origin=1&scale=0",   # scale > 0
        "/api/v1/function_score?term=x&origin=1&scale=5&shape=bogus",
    ):
        assert _get_status(base, bad) == 400, bad
