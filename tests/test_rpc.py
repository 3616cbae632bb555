"""gRPC service facade (S11's proto half, fias.proto:64-119): the
transport-independent servicer answers like the API facade, the filter
message compiles like the reference handler's prepareFilter
(addressHandler.go:140-165), and the grpcio binding is import-gated."""

import json

import pytest

from gofias_spark.api import FulltextAPI
from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark import rpc
from gofias_spark.rpc import (
    Doc,
    FilterObject,
    FulltextServicer,
    GuidRequest,
    InvalidArgument,
    ListRequest,
    NotFound,
    NumberFilter,
    SimpleTermFilterRequest,
    StringFilter,
    TermFilterRequest,
    compile_filter_object,
    from_dict,
    serve_grpc,
    to_dict,
)

CFG = IndexConfig(n_buckets=3, block_size=16)


@pytest.fixture(scope="module")
def servicer(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rpcidx"))
    build_segment(spark, synth_corpus(spark, 100), root, CFG)
    api = FulltextAPI(spark, root)
    api.engine.warm()
    yield FulltextServicer(api), api


def test_filter_object_compiles_like_prepare_filter():
    fo = FilterObject(
        doclen=NumberFilter(min=10, max=50),
        lang=StringFilter(values=["go", "py"]),
        repo=StringFilter(values=["r1"]),
    )
    assert compile_filter_object(fo) == {
        "doclen": {"gte": 10, "lte": 50},
        "lang": ["go", "py"],
        "repo": ["r1"],
    }
    # Values win over Min/Max (the reference emits a terms query when
    # Values is set, a range otherwise)
    fo2 = FilterObject(doclen=NumberFilter(values=[7.0], min=1, max=2))
    assert compile_filter_object(fo2) == {"doclen": [7]}
    assert compile_filter_object(None) is None
    assert compile_filter_object(FilterObject()) is None


def test_get_address_by_term_matches_api(servicer):
    sv, api = servicer
    resp = sv.GetAddressByTerm(TermFilterRequest(term="func", size=5))
    want = api.search_by_term("func", size=5, as_pandas=True)
    assert [d.doc_id for d in resp.items] == [int(x) for x in want["doc_id"]]
    assert [d.path for d in resp.items] == list(want["path"])
    assert all(isinstance(d, Doc) and d.score > 0 for d in resp.items)


def test_term_search_filtered_and_paged(servicer):
    sv, api = servicer
    fo = FilterObject(doclen=NumberFilter(min=1))
    full = sv.GetAddressByTerm(TermFilterRequest(term="func", size=10))
    page = sv.GetAddressByTerm(
        TermFilterRequest(term="func", size=3, from_=2, filter=fo)
    )
    assert [d.doc_id for d in page.items] == [
        d.doc_id for d in full.items[2:5]
    ]
    with pytest.raises(InvalidArgument):
        sv.GetAddressByTerm(TermFilterRequest(term="x", size=-1))


def test_suggests_and_guid_roundtrip(servicer):
    sv, _ = servicer
    resp = sv.GetSuggests(SimpleTermFilterRequest(term="func", size=3))
    assert 0 < len(resp.items) <= 3
    hit = resp.items[0]
    doc = sv.GetByGuid(GuidRequest(guid=str(hit.doc_id)))
    assert (doc.repo, doc.path, doc.sha256) == (
        hit.repo, hit.path, hit.sha256,
    )
    with pytest.raises(NotFound):
        sv.GetByGuid(GuidRequest(guid="999999999"))
    with pytest.raises(InvalidArgument):
        sv.GetByGuid(GuidRequest(guid="not-an-id"))


def test_list_docs_requires_filter(servicer):
    sv, api = servicer
    got = sv.ListDocs(ListRequest(filter=FilterObject(
        doclen=NumberFilter(min=1)
    )))
    assert len(got.items) == api.count(filters={"doclen": {"gte": 1}})
    # stable (repo, path) order, the GetAllCities contract
    keys = [(d.repo, d.path) for d in got.items]
    assert keys == sorted(keys)
    with pytest.raises(InvalidArgument):
        sv.ListDocs(ListRequest())


def test_health_and_version(servicer):
    sv, api = servicer
    h = sv.CheckHealth()
    assert h.n_docs == api.engine.n_docs and h.segments >= 1
    assert h.uptime_secs >= 0
    v = sv.GetVersion()
    state = json.loads(v.index_state)
    assert state["n_docs"] == h.n_docs


def test_json_codec_roundtrip():
    req = TermFilterRequest(
        term="abc", size=7, from_=1,
        filter=FilterObject(
            doclen=NumberFilter(min=5),
            lang=StringFilter(values=["go"]),
        ),
    )
    wire = json.dumps(to_dict(req))
    back = from_dict(TermFilterRequest, json.loads(wire))
    assert back == req
    with pytest.raises(InvalidArgument):
        from_dict(TermFilterRequest, {"trem": "typo"})
    with pytest.raises(InvalidArgument):
        from_dict(FilterObject, {"doclen": {"minimum": 3}})


def test_serve_grpc_import_gated(servicer):
    sv, api = servicer
    try:
        import grpc  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="grpcio is not installed"):
            serve_grpc(api)
    else:  # pragma: no cover - container has no grpcio
        server = serve_grpc(api, port=0)
        server.stop(0)


def test_every_declared_rpc_exists():
    """The generic-handler registration table and the servicer can't
    drift: every method the table declares must exist with a request
    type."""
    for methods in rpc._SERVICES.values():
        for m in methods:
            assert hasattr(FulltextServicer, m), m
            assert m in rpc._REQUEST_TYPES, m


class _FakeAbort(Exception):
    def __init__(self, status, detail):
        super().__init__(detail)
        self.status = status
        self.detail = detail


class _FakeContext:
    """In-process stand-in for grpc.ServicerContext: abort raises, as the
    real one does."""

    def abort(self, status, detail):
        raise _FakeAbort(status, detail)


def _call(servicer, method, payload: dict | None) -> dict:
    sv, _ = servicer
    handler = rpc.make_wire_handler(sv, method)
    body = b"" if payload is None else json.dumps(payload).encode()
    return json.loads(handler(body, _FakeContext()))


def test_wire_codec_roundtrip_all_methods(servicer):
    """The bytes-level JSON codec (r3 verdict #8): every declared RPC
    round-trips request bytes -> servicer -> response bytes through the
    exact handler serve_grpc would bind, no grpcio needed."""
    h = _call(servicer, "CheckHealth", None)
    assert h["n_docs"] > 0 and h["uptime_secs"] >= 0

    v = _call(servicer, "GetVersion", None)
    assert json.loads(v["index_state"])["n_docs"] == h["n_docs"]

    r = _call(servicer, "GetAddressByTerm",
              {"term": "common_util", "size": 5})
    assert len(r["items"]) == 5
    direct = servicer[1].search_by_term("common_util", size=5).collect()
    assert [d["doc_id"] for d in r["items"]] == [
        x["doc_id"] for x in direct
    ]

    s = _call(servicer, "GetSuggests", {"term": "func", "size": 3})
    assert len(s["items"]) == 3

    key = direct[0]
    g = _call(servicer, "GetByGuid", {"guid": str(key["doc_id"])})
    assert g["repo"] == key["repo"] and g["path"] == key["path"]

    ld = _call(servicer, "ListDocs", {"filter": {
        "lang": {"values": ["py"]}}, "limit": 4})
    assert 0 < len(ld["items"]) <= 4
    assert all(d["lang"] == "py" for d in ld["items"])


def test_wire_codec_error_statuses(servicer):
    """NOT_FOUND / INVALID_ARGUMENT map to status strings the grpc
    binding converts to grpc.StatusCode — and abort RAISES, matching the
    real context contract."""
    with pytest.raises(_FakeAbort) as e:
        _call(servicer, "GetByGuid", {"guid": "999999999999"})
    assert e.value.status == "NOT_FOUND"
    with pytest.raises(_FakeAbort) as e:
        _call(servicer, "ListDocs", {"limit": 5})  # filter required
    assert e.value.status == "INVALID_ARGUMENT"
    with pytest.raises(_FakeAbort) as e:
        _call(servicer, "GetAddressByTerm", {"term": "x", "size": -1})
    assert e.value.status == "INVALID_ARGUMENT"
    # unknown fields and malformed JSON are rejected at the codec layer
    # with the same status (typo'd filters must not match everything)
    with pytest.raises(_FakeAbort) as e:
        _call(servicer, "ListDocs", {"size": 5})
    assert e.value.status == "INVALID_ARGUMENT"
    handler = rpc.make_wire_handler(servicer[0], "ListDocs")
    with pytest.raises(_FakeAbort) as e:
        handler(b"not json", _FakeContext())
    assert e.value.status == "INVALID_ARGUMENT"


def test_wire_codec_server_bug_not_invalid_argument(servicer):
    """A TypeError raised INSIDE the servicer is a server-side bug and
    must propagate (-> INTERNAL at the transport), not be mapped to
    INVALID_ARGUMENT by the decode-step catch (r4 advice)."""
    sv, _ = servicer

    class Buggy:
        def ListDocs(self, req):
            raise TypeError("server bug, not a request error")

    handler = rpc.make_wire_handler(Buggy(), "ListDocs")
    with pytest.raises(TypeError, match="server bug"):
        handler(
            json.dumps({"filter": {"lang": {"values": ["py"]}}}).encode(),
            _FakeContext(),
        )
    # while decode-step WIRE-TYPE errors still map to INVALID_ARGUMENT
    # (from_dict now validates field types, so bad requests never reach
    # the servicer to raise TypeError there)
    handler2 = rpc.make_wire_handler(sv, "ListDocs")
    for payload in (
        {"filter": "not-an-object"},
        {"filter": {"lang": {"values": [1, 2]}}},
        {"filter": {"doclen": {"min": "low"}}},
        {"limit": "ten"},
    ):
        with pytest.raises(_FakeAbort) as e:
            handler2(json.dumps(payload).encode(), _FakeContext())
        assert e.value.status == "INVALID_ARGUMENT", payload
    handler3 = rpc.make_wire_handler(sv, "GetAddressByTerm")
    with pytest.raises(_FakeAbort) as e:
        handler3(json.dumps({"term": 7}).encode(), _FakeContext())
    assert e.value.status == "INVALID_ARGUMENT"


def test_wire_null_means_field_default(servicer):
    """proto3 JSON semantics: an explicit null leaves the field at its
    default instead of constructing the request with None (which would
    push a TypeError past decode into the servicer — post-review fix)."""
    _, api = servicer
    r = _call(servicer, "GetAddressByTerm",
              {"term": "common_util", "size": None, "from_": None,
               "filter": None})
    # size=None fell back to the dataclass default (100), not a crash
    direct = api.search_by_term("common_util", size=100).collect()
    assert [d["doc_id"] for d in r["items"]] == [
        x["doc_id"] for x in direct
    ]
    from gofias_spark.rpc import ListRequest, from_dict
    req = from_dict(ListRequest, {"limit": None, "filter": None})
    assert req.limit == 10000 and req.filter is None
