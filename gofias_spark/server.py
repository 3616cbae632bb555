"""Minimal HTTP JSON gateway — the reference's REST surface (S11).

The reference serves gRPC + a grpc-gateway REST proxy
(/root/reference/app/infrastructure/persistence/grpc/server.go:42-163;
routes app/interfaces/grpc/proto/v1/fias/fias.proto:80-119). Here the same
routes map onto the FulltextAPI facade over a stdlib ThreadingHTTPServer —
no extra dependencies, launched via scripts/serve.py. The Spark driver is
the server process; queries run as Spark jobs (or the warmed driver-side
searcher for small indexes), exactly like the reference's single ES node
behind a thin gateway.

Routes (reference analogues):
    GET /api/v1/address/term?term=..&size=..&from=..[&lang=..]   GetAddressByTerm
    GET /api/v1/search?q=..[&size=..&from=..&default_operator=..] ES URI
                                        search: Lucene-ish query_string
                                        (+must -not "phrase" field:value
                                        field:[a TO b] term^2 wild* fuzz~
                                        (grouped OR clauses)^w — nested)
    GET /api/v1/suggests?term=..&size=..                         GetSuggests
    GET /api/v1/address/guid?repo=..&path=..&commit=..           GetByGuid
    GET /api/v1/count?term=..[&lang=..]                          _count
    GET /api/v1/count_many?query=id:text..[&mode=and|or]         filters agg
                                        (repeatable query=; one postings
                                        pass counts the whole batch)
    GET /api/v1/adjacency_matrix?query=id:text..                 adjacency
                                        matrix agg (singles + pairwise
                                        intersections, one pass)
    GET /api/v1/facets?field=..[&term=..&match=and|or&size=..]   terms agg
    GET /api/v1/histogram?field=..&interval=..[&term=..&match=..] histogram agg
    GET /api/v1/field_stats?field=..[&term=..&match=..]          stats agg
    GET /api/v1/cardinality?field=..[&term=..&exact=false]       cardinality agg
    GET /api/v1/percentiles?field=..[&ps=25,50,99&term=..]       percentiles agg
    GET /api/v1/percentile_ranks?field=..&values=..[&term=..]    inverse CDF
    GET /api/v1/mad?field=..[&term=..]                           median abs dev
    GET /api/v1/rare_terms?field=..[&max_doc_count=1&term=..]    rare_terms agg
    GET /api/v1/multi_terms?fields=a,b[&size=10&term=..]         multi_terms
    GET /api/v1/range?field=..&ranges=*-100;100-500;500-*[&term=..] range agg
    GET /api/v1/top_hits?field=..&term=..[&k=3&groups=10]        top-hits agg
    GET /api/v1/terms_stats?group=..&metric=..[&term=..&size=..] terms+stats
    GET /api/v1/composite?field=..[&size=..&after=..&term=..]    composite agg
    GET /api/v1/suggest_terms?term=..[&size=..]                  term suggester
    POST /api/v1/bulk (NDJSON: {"index":{}} + doc lines with
         repo/path/commit/lang/content, {"delete":{"repo","path"}})
                                        ES _bulk / reference S6 sink:
                                        one MERGE per request, last-wins
                                        within the batch, fail-fast
    GET /api/v1/suggest_phrase?term=..[&size=..&collate=true]    phrase
                                        suggester (did-you-mean, unigram)
    GET /api/v1/complete?prefix=..[&size=..]                     completion
    GET /api/v1/more_like_this?doc_id=..[&size=..]               MLT query
    GET /api/v1/rescore?term=..&rescore=..[&window=50&size=..
        &query_weight=1&rescore_weight=1&slop=0&match=..]        rescore API
    GET /api/v1/function_score?term=..[&field=doclen&modifier=log1p
        &factor=1&boost_mode=multiply&match=..]                  function_score
    GET /api/v1/collapse?field=..&term=..[&size=..&match=..]     field collapse
    GET /api/v1/significant_terms?term=..[&size=..&match=..]     sig-terms agg
    GET /api/v1/explain?term=..&doc_id=..                        _explain
    GET /api/v1/termvectors?doc_id=..                            _termvectors
    GET /api/v1/version                                          GetVersion
    GET /metrics              request/error/cache counters, latency sums
    GET /health                                                  CheckHealth

Response cache: successful /api/v1/* GET bodies sit in a thread-safe LRU
keyed by (full URL, engine query_state_token) — delta imports and
compactions rotate the token, so staleness is structurally impossible and
old-state entries simply age out. X-Cache: HIT|MISS on cacheable routes;
``serve(cache_size=0)`` disables.

Filter params (F7 route compilation — the reference compiles Level.Min/Max
into ES `range` queries per filtered route, addressHandler.go:140-165):
    lang=..&repo=..&path_prefix=..      equality / prefix filters
    highlight=true                      ES-highlight analogue: window-bounded
                                        fragments per item (match=and|phrase)
    <field>.gte= .gt= .lte= .lt= .neq=  range predicates (F4), e.g.
                                        doclen.gte=100&doclen.lt=500
    match=and|or|phrase|phrase_prefix|bool_prefix|fuzzy|wildcard|regexp
                                        match mode on /address/term
                                        (default and; the others are
                                        extensions beyond the reference);
                                        phrase_prefix takes optional
                                        max_expansions= (alphabetical cap);
                                        phrase takes optional span_not=
                                        <query>&span_not_pre/post=N (ES
                                        span_not: per-span exclusion) or
                                        span_first=N
                                        (ES span_first: span must end
                                        within the first N positions —
                                        positional indexes only)
    minimum_should_match=N              bool.should msm (match=or): docs
                                        matching >= N distinct query terms
    negative=<query>&negative_boost=f   ES boosting query (match=and|or):
                                        docs also matching the negative
                                        query score * f in (0,1] —
                                        demoted, not excluded
    boost=term:w (repeatable)           ES term^w clause boost (match=
                                        and|or): w multiplies the term idf
    exclude=..                          bool.must_not analogue (match=and
                                        only): drop docs containing ANY
                                        analyzed term of this string
    search_after=<score>,<doc_id>       cursor paging (match=and only):
                                        the last hit of the previous page,
                                        verbatim; O(size) at any depth —
                                        the export path past the from cap.
                                        Incompatible with from>0 and sort=
    sort=field[:asc|desc],...           attribute-first composite sort (O1);
                                        `_score` names the BM25 score

``size``/``from`` are clamped (size <= 1000, from <= 10000, mirroring ES's
index.max_result_window): beyond them the gateway returns 400 instead of
scheduling an unbounded top-k on a long-lived serving driver (ADVICE r02).
"""

from __future__ import annotations

import json
import threading
import time
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from gofias_spark.api import FulltextAPI

_FILTER_FIELDS = ("lang", "repo", "path_prefix")
_RANGE_OPS = ("gte", "gt", "lte", "lt", "neq")
# fields a range op may target: the filterable attribute columns. NOT
# path_prefix (prefix match has no range semantics — the engine would
# pass the dict to startswith) and nothing outside the sidecar schema
# (an unknown field would surface as a 500 from the engine).
_RANGE_FIELDS = ("lang", "repo", "path", "commit", "sha256", "doclen")
# the sidecar's only numeric attribute; every other range field compares
# as a string. Coercion is TYPE-AWARE: "commit.gte=5" must stay the string
# "5", or the driver-side pandas evaluator TypeErrors on a string column
# (HTTP 500) while the Spark path casts — same request, different result.
_NUMERIC_RANGE_FIELDS = ("doclen",)
_SORT_FIELDS = (
    "_score", "doc_id", "lang", "repo", "path", "commit", "sha256", "doclen",
)
MAX_SIZE = 1000
MAX_FROM = 10000
MAX_TERM_LEN = 1024  # analyzer cost is O(len); clamp like size/from
MAX_SLOP = 50  # ES caps phrase slop via index.query.default_field limits;
               # verification cost grows with the window, clamp like size


class BadRequest(ValueError):
    pass


def _coerce(field: str, v: str):
    """Range operand, typed by the field it targets: numeric fields parse
    int -> float (400 on garbage), string fields pass through verbatim."""
    if field not in _NUMERIC_RANGE_FIELDS:
        return v
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    raise BadRequest(f"field {field!r} is numeric; bad operand {v!r}")


def _filters_from_query(q: dict) -> dict | None:
    f: dict = {k: q[k][0] for k in _FILTER_FIELDS if k in q}
    for key, vals in q.items():
        if "." not in key:
            continue
        field, op = key.rsplit(".", 1)
        if op not in _RANGE_OPS and op != "exists":
            continue
        if field not in _RANGE_FIELDS:
            raise BadRequest(
                f"field {field!r} does not support range operators "
                f"(allowed: {', '.join(_RANGE_FIELDS)})"
            )
        if not isinstance(f.get(field, {}), dict):
            raise BadRequest(f"field {field!r} has both equality and range")
        if op == "exists":
            v = vals[0].lower()
            if v not in ("true", "false", "1", "0"):
                raise BadRequest(f"{field}.exists must be true|false")
            f.setdefault(field, {})[op] = v in ("true", "1")
        else:
            f.setdefault(field, {})[op] = _coerce(field, vals[0])
    return f or None


def _sort_from_query(q: dict) -> list[tuple[str, str]] | None:
    """``sort=ao_level:asc,_score:desc`` -> [(field, dir), ...]."""
    if "sort" not in q:
        return None
    keys = []
    for part in q["sort"][0].split(","):
        part = part.strip()
        if not part:
            continue
        field, _, direction = part.partition(":")
        direction = direction or "asc"
        if direction not in ("asc", "desc"):
            raise BadRequest(f"bad sort direction {direction!r}")
        if field not in _SORT_FIELDS:
            # same 400 contract as an invalid filter field — without this
            # the engine's ValueError surfaces as a 500
            raise BadRequest(
                f"unknown sort field {field!r} "
                f"(allowed: {', '.join(_SORT_FIELDS)})"
            )
        keys.append((field, direction))
    return keys or None


def _after_from_query(q: dict) -> tuple[float, int] | None:
    """``search_after=<score>,<doc_id>`` -> cursor tuple (the last hit of
    the previous page, verbatim — the score must be the exact value the
    engine returned, like ES's sort-values echo)."""
    if "search_after" not in q:
        return None
    raw = q["search_after"][0]
    parts = raw.split(",")
    if len(parts) != 2:
        raise BadRequest("search_after must be <score>,<doc_id>")
    try:
        return float(parts[0]), int(parts[1])
    except ValueError as exc:
        raise BadRequest(f"bad search_after cursor: {exc}") from None


def _msm_from_query(q: dict) -> int | None:
    raw = q.get("minimum_should_match", [None])[0]
    if raw is None:
        return None
    try:
        return int(raw)
    except ValueError:
        raise BadRequest("minimum_should_match must be an integer") from None


def _boosts_from_query(q: dict) -> dict[str, float] | None:
    """Repeated ``boost=term:weight`` params -> {term: weight} (ES term^w
    clause boosts). Weight validation (> 0) happens in the engine."""
    raws = q.get("boost", [])
    if not raws:
        return None
    out: dict[str, float] = {}
    for raw in raws:
        term, sep, w = raw.rpartition(":")
        if not sep or not term:
            raise BadRequest("boost must be term:weight")
        try:
            out[term] = float(w)
        except ValueError:
            raise BadRequest(f"bad boost weight {w!r}") from None
    return out


def _page(q: dict, default_size: int) -> tuple[int, int]:
    try:
        size = int(q.get("size", [str(default_size)])[0])
        from_ = int(q.get("from", ["0"])[0])
    except ValueError as exc:
        raise BadRequest(f"bad paging param: {exc}") from None
    if not 0 <= size <= MAX_SIZE:
        raise BadRequest(f"size must be in [0, {MAX_SIZE}]")
    if not 0 <= from_ <= MAX_FROM:
        raise BadRequest(f"from must be in [0, {MAX_FROM}]")
    return size, from_


def _term(q: dict) -> str:
    term = q.get("term", [""])[0]
    if len(term) > MAX_TERM_LEN:
        raise BadRequest(f"term longer than {MAX_TERM_LEN} chars")
    return term


def _max_expansions(q: dict) -> int | None:
    """Parse the optional ``max_expansions=`` query param; None when the
    param is absent (callers decide whether absent means the engine
    default or the exact escape hatch)."""
    raw = q.get("max_expansions", [None])[0]
    if raw is None:
        return None
    try:
        mx = int(raw)
    except ValueError as e:
        raise BadRequest("max_expansions must be an integer") from e
    if not 1 <= mx <= 10000:
        raise BadRequest("max_expansions must be in [1, 10000]")
    return mx


def _rows(df) -> list[dict]:
    return [r.asDict() for r in df.collect()]


def _items(pdf) -> list[dict]:
    """pandas frame -> JSON-safe records: numpy scalars to Python, NaN to
    null (json.dumps would otherwise emit invalid ``NaN`` literals)."""
    import pandas as pd

    out = []
    for rec in pdf.to_dict("records"):
        out.append(
            {
                k: (None if (isinstance(v, float) and v != v) or v is pd.NaT
                    else v.item() if hasattr(v, "item") else v)
                for k, v in rec.items()
            }
        )
    return out


def _parse_bulk_ndjson(body: str) -> list[tuple[str, dict]]:
    """ES _bulk NDJSON: an action line ``{"index": {...}}`` followed by
    its source line, or a standalone ``{"delete": {"repo","path"}}``.
    Returns the actions IN ORDER as ``[("index", doc) | ("delete", key),
    ...]`` — order matters: ES applies a batch sequentially, so the last
    action on a (repo, path) key wins (api.bulk resolves this).
    Malformed input raises BadRequest."""
    lines = [ln for ln in body.splitlines() if ln.strip()]
    actions: list[tuple[str, dict]] = []
    i = 0
    while i < len(lines):
        try:
            action = json.loads(lines[i])
        except json.JSONDecodeError as e:
            raise BadRequest(f"line {i + 1}: invalid JSON") from e
        if not isinstance(action, dict) or len(action) != 1:
            raise BadRequest(
                f"line {i + 1}: expected one-key action object"
            )
        kind = next(iter(action))
        if kind == "index":
            if i + 1 >= len(lines):
                raise BadRequest(
                    f"line {i + 1}: index action missing source line"
                )
            try:
                doc = json.loads(lines[i + 1])
            except json.JSONDecodeError as e:
                raise BadRequest(f"line {i + 2}: invalid JSON") from e
            if not isinstance(doc, dict):
                raise BadRequest(f"line {i + 2}: source must be an object")
            actions.append(("index", doc))
            i += 2
        elif kind == "delete":
            key = action["delete"]
            if not isinstance(key, dict):
                raise BadRequest(
                    f"line {i + 1}: delete action must carry a key object"
                )
            actions.append(("delete", key))
            i += 1
        else:
            raise BadRequest(
                f"line {i + 1}: unsupported action {kind!r} "
                "(index | delete)"
            )
    return actions


def make_handler(api: FulltextAPI, cache_size: int = 256):
    """Handler factory. ``cache_size`` > 0 enables the response cache: a
    thread-safe LRU of successful /api/v1/* GET bodies keyed by the full
    request URL PLUS the engine's query_state_token — a delta import or
    compaction changes the token, so stale entries can never serve (they
    age out of the LRU). This is the ES request-cache analogue for a
    long-lived serving driver: a repeated dashboard/autocomplete query
    costs a dict lookup, not even the driver-side kernel."""
    cache: OrderedDict = OrderedDict()
    lock = threading.Lock()
    metrics = {
        "requests_total": 0, "errors_4xx": 0, "errors_5xx": 0,
        "cache_hits": 0, "cache_misses": 0,
        "latency_sum_secs": 0.0, "latency_max_secs": 0.0,
        "by_path": {},
    }

    def cache_get(key):
        with lock:
            body = cache.get(key)
            if body is not None:
                cache.move_to_end(key)
            return body

    def cache_put(key, body: bytes) -> None:
        with lock:
            cache[key] = body
            cache.move_to_end(key)
            while len(cache) > cache_size:
                cache.popitem(last=False)

    class Handler(BaseHTTPRequestHandler):
        _cache_key = None

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, obj, code: int = 200) -> None:
            body = json.dumps(obj).encode()
            if code == 200 and self._cache_key is not None:
                # a miss is a cacheable request that filled the cache;
                # 4xx/5xx under /api/v1/ were never cacheable and must
                # not skew the hit ratio
                with lock:
                    metrics["cache_misses"] += 1
                cache_put(self._cache_key, body)
            self._send(body, code,
                       "MISS" if self._cache_key is not None else None)

        def _send(self, body: bytes, code: int, xcache: str | None) -> None:
            with lock:
                metrics["requests_total"] += 1
                if 400 <= code < 500:
                    metrics["errors_4xx"] += 1
                elif code >= 500:
                    metrics["errors_5xx"] += 1
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if xcache is not None:
                self.send_header("X-Cache", xcache)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            t0 = time.perf_counter()
            url = urlparse(self.path)
            q = parse_qs(url.query)
            self._cache_key = None
            try:
                if (
                    cache_size > 0
                    and url.path.startswith("/api/v1/")
                    and url.path not in ("/api/v1/version",)
                ):
                    # token first: a request racing a delta import must
                    # key on the state it will actually be served from
                    self._cache_key = (
                        self.path, api.engine.query_state_token()
                    )
                    hit = cache_get(self._cache_key)
                    if hit is not None:
                        with lock:
                            metrics["cache_hits"] += 1
                        self._send(hit, 200, "HIT")
                        self._finish_metrics(url.path, t0)
                        return
                self._route(url, q)
            except BadRequest as exc:
                self._cache_key = None
                self._json({"error": str(exc)}, code=400)
            except Exception as exc:  # fail-fast surface, like bulk errors
                self._cache_key = None
                self._json({"error": str(exc)}, code=500)
            self._finish_metrics(url.path, t0)

        MAX_BULK_BYTES = 64 * 1024 * 1024  # fail loudly, not OOM

        def do_POST(self) -> None:  # noqa: N802 (stdlib API)
            t0 = time.perf_counter()
            url = urlparse(self.path)
            self._cache_key = None
            try:
                if url.path != "/api/v1/bulk":
                    self._json({"error": "not found"}, code=404)
                    self._finish_metrics(url.path, t0)
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                except ValueError as e:
                    raise BadRequest("bad Content-Length") from e
                if length <= 0:
                    raise BadRequest("empty bulk body")
                if length > self.MAX_BULK_BYTES:
                    raise BadRequest(
                        f"bulk body exceeds {self.MAX_BULK_BYTES} bytes"
                    )
                body = self.rfile.read(length).decode("utf-8")
                actions = _parse_bulk_ndjson(body)
                try:
                    res = api.bulk(actions=actions)
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({**res, "errors": False})
            except BadRequest as exc:
                self._json({"error": str(exc)}, code=400)
            except Exception as exc:  # fail-fast, like bulk errors (S6)
                self._json({"error": str(exc)}, code=500)
            self._finish_metrics(url.path, t0)

        def _finish_metrics(self, path: str, t0: float) -> None:
            dt = time.perf_counter() - t0
            with lock:
                metrics["latency_sum_secs"] += dt
                metrics["latency_max_secs"] = max(
                    metrics["latency_max_secs"], dt
                )
                # bound label cardinality: URL scanners hitting unique
                # 404 paths must not grow the map (and /metrics bodies)
                # without limit for the server's lifetime
                if path not in metrics["by_path"] \
                        and len(metrics["by_path"]) >= 64:
                    path = "_other"
                metrics["by_path"][path] = metrics["by_path"].get(path, 0) + 1

        def _route(self, url, q) -> None:
            if url.path == "/health":
                self._cache_key = None
                self._json({"status": "ok"})
            elif url.path == "/api/v1/version":
                self._json(api.version())
            elif url.path == "/api/v1/address/term":
                size, from_ = _page(q, default_size=100)
                match = q.get("match", ["and"])[0]
                sort_by = _sort_from_query(q)
                exclude = q.get("exclude", [None])[0]
                if exclude is not None:
                    if len(exclude) > MAX_TERM_LEN:
                        raise BadRequest(
                            f"exclude longer than {MAX_TERM_LEN} chars"
                        )
                    if match not in ("and", "or"):
                        raise BadRequest(
                            "exclude= supports match=and|or only"
                        )
                after = _after_from_query(q)
                if after is not None:
                    if match != "and":
                        raise BadRequest(
                            "search_after= supports match=and only"
                        )
                    if from_ > 0:
                        raise BadRequest(
                            "search_after= is incompatible with from="
                        )
                    if sort_by:
                        raise BadRequest(
                            "search_after= is incompatible with sort="
                        )
                # serving fast path: pandas straight to JSON — no
                # Spark materialization round trip per request
                if match == "phrase":
                    if sort_by:
                        raise BadRequest(
                            "match=phrase does not support sort="
                        )
                    try:
                        slop = int(q.get("slop", ["0"])[0])
                    except ValueError as e:
                        raise BadRequest("slop must be an integer") \
                            from e
                    if not 0 <= slop <= MAX_SLOP:
                        raise BadRequest(
                            f"slop must be in [0, {MAX_SLOP}]"
                        )
                    sf_raw = q.get("span_first", [None])[0]
                    span_first = None
                    if sf_raw is not None:
                        try:
                            span_first = int(sf_raw)
                        except ValueError as e:
                            raise BadRequest(
                                "span_first must be an integer"
                            ) from e
                        if not 1 <= span_first <= 1_000_000:
                            raise BadRequest(
                                "span_first must be in [1, 1000000]"
                            )
                    sn = q.get("span_not", [None])[0]
                    sn_pre = sn_post = 0
                    if sn is not None:
                        try:
                            sn_pre = int(q.get("span_not_pre", ["0"])[0])
                            sn_post = int(q.get("span_not_post", ["0"])[0])
                        except ValueError as e:
                            raise BadRequest(
                                "span_not_pre/post must be integers"
                            ) from e
                        if not (0 <= sn_pre <= 1000
                                and 0 <= sn_post <= 1000):
                            raise BadRequest(
                                "span_not_pre/post must be in [0, 1000]"
                            )
                        if slop or span_first is not None:
                            raise BadRequest(
                                "span_not combines with neither slop= "
                                "nor span_first="
                            )
                    in_order_raw = q.get("in_order", ["true"])[0].lower()
                    if in_order_raw not in ("true", "false", "1", "0"):
                        raise BadRequest("in_order must be true|false")
                    in_order = in_order_raw in ("true", "1")
                    if not in_order and sn is not None:
                        raise BadRequest(
                            "in_order=false combines not with span_not="
                        )
                    try:
                        if not in_order:
                            # Lucene span_near(in_order=false): any-order
                            # proximity window
                            pdf = api.search_span_near(
                                _term(q), slop=slop, in_order=False,
                                size=size, from_=from_,
                                filters=_filters_from_query(q),
                                as_pandas=True, span_first=span_first,
                            )
                        elif sn is not None:
                            pdf = api.search_span_not(
                                _term(q), sn, size=size, from_=from_,
                                pre=sn_pre, post=sn_post,
                                filters=_filters_from_query(q),
                                as_pandas=True,
                            )
                        else:
                            pdf = api.search_phrase(
                                _term(q), size=size, from_=from_,
                                filters=_filters_from_query(q),
                                as_pandas=True,
                                slop=slop, span_first=span_first,
                            )
                    except ValueError as e:
                        if "positional index" in str(e):
                            raise BadRequest(str(e)) from e
                        raise
                elif match == "phrase_prefix":
                    if sort_by:
                        raise BadRequest(
                            "match=phrase_prefix does not support sort="
                        )
                    # absent -> None -> the documented exact default of
                    # search_phrase_prefix (expansions feed an adjacency
                    # check, so the match set is position-bounded)
                    mx = _max_expansions(q)
                    pdf = api.search_phrase_prefix(
                        _term(q), size=size, from_=from_,
                        filters=_filters_from_query(q), as_pandas=True,
                        max_expansions=mx,
                    )
                elif match == "bool_prefix":
                    if sort_by or after is not None or exclude is not None:
                        raise BadRequest(
                            "match=bool_prefix combines with neither "
                            "sort= nor search_after= nor exclude="
                        )
                    op = q.get("operator", ["or"])[0]
                    if op not in ("or", "and"):
                        raise BadRequest("operator must be or|and")
                    # absent -> omit the kwarg so the API/engine default
                    # cap (DEFAULT_MAX_EXPANSIONS, df-desc) applies; an
                    # unbounded public route would let `a*` expand the
                    # whole term dictionary
                    mx = _max_expansions(q)
                    mx_kw = {} if mx is None else {"max_expansions": mx}
                    try:
                        pdf = api.search_bool_prefix(
                            _term(q), size=size, from_=from_, mode=op,
                            filters=_filters_from_query(q),
                            as_pandas=True, **mx_kw,
                        )
                    except ValueError as exc:  # conflicting filters
                        raise BadRequest(str(exc)) from exc
                elif match == "fuzzy":
                    if sort_by:
                        raise BadRequest(
                            "match=fuzzy does not support sort="
                        )
                    try:
                        pdf = api.search_fuzzy(
                            _term(q), size=size, from_=from_,
                            filters=_filters_from_query(q),
                            as_pandas=True,
                        )
                    except ValueError as exc:  # multi-token term
                        raise BadRequest(str(exc)) from exc
                elif match == "wildcard":
                    if sort_by:
                        raise BadRequest(
                            "match=wildcard does not support sort="
                        )
                    pdf = api.search_wildcard(
                        _term(q), size=size, from_=from_,
                        filters=_filters_from_query(q), as_pandas=True,
                    )
                elif match == "regexp":
                    if sort_by:
                        raise BadRequest(
                            "match=regexp does not support sort="
                        )
                    try:
                        pdf = api.search_regexp(
                            _term(q), size=size, from_=from_,
                            filters=_filters_from_query(q),
                            as_pandas=True,
                        )
                    except ValueError as exc:  # bad/unportable regex
                        raise BadRequest(str(exc)) from exc
                elif match in ("and", "or") and "synonyms" in q:
                    # query-time synonym expansion: repeated
                    # synonyms=token:alt1|alt2 params widen each token
                    # to an OR-group
                    if sort_by or after is not None or exclude is not None \
                            or "negative" in q or "boost" in q \
                            or "minimum_should_match" in q:
                        raise BadRequest(
                            "synonyms= combines with none of sort=/"
                            "search_after=/exclude=/negative=/boost=/"
                            "minimum_should_match="
                        )
                    syn: dict[str, list[str]] = {}
                    for raw in q["synonyms"]:
                        tok_, sep, alts = raw.partition(":")
                        if not sep or not tok_ or not alts:
                            raise BadRequest(
                                "synonyms must be token:alt1|alt2, got "
                                f"{raw!r}"
                            )
                        if tok_ in syn:
                            raise BadRequest(
                                f"duplicate synonyms entry for {tok_!r}"
                            )
                        syn[tok_] = [a for a in alts.split("|") if a]
                    try:
                        pdf = api.search_synonyms(
                            _term(q), syn, size=size, from_=from_,
                            mode=match,
                            filters=_filters_from_query(q),
                            as_pandas=True,
                        )
                    except ValueError as exc:
                        raise BadRequest(str(exc)) from exc
                elif match in ("and", "or") and "negative" in q:
                    # ES boosting query: negative=<query> demotes (not
                    # excludes) by negative_boost in (0, 1]
                    if sort_by or after is not None or exclude is not None:
                        raise BadRequest(
                            "negative= combines with neither sort= nor "
                            "search_after= nor exclude="
                        )
                    # this branch wins over the msm/boost bool branch
                    # below, so those params would be silently dropped —
                    # reject rather than ignore (same contract as above)
                    if "minimum_should_match" in q or "boost" in q:
                        raise BadRequest(
                            "negative= combines with neither "
                            "minimum_should_match= nor boost="
                        )
                    try:
                        nb = float(q.get("negative_boost", ["0.5"])[0])
                    except ValueError as e:
                        raise BadRequest(
                            "negative_boost must be a float"
                        ) from e
                    try:
                        pdf = api.search_boosting(
                            _term(q), q["negative"][0], negative_boost=nb,
                            size=size, from_=from_, mode=match,
                            filters=_filters_from_query(q), as_pandas=True,
                        )
                    except ValueError as exc:
                        raise BadRequest(str(exc)) from exc
                elif match == "and" and not q.get("boost") and \
                        "minimum_should_match" not in q:
                    pdf = api.search_by_term(
                        _term(q),
                        size=size,
                        from_=from_,
                        filters=_filters_from_query(q),
                        sort_by=sort_by,
                        as_pandas=True,
                        must_not=exclude,
                        after=after,
                    )
                elif match in ("and", "or"):
                    # bool.should surface: minimum_should_match= and
                    # repeated boost=term:weight clause boosts
                    if sort_by or after is not None:
                        raise BadRequest(
                            "match=or supports neither sort= nor "
                            "search_after= yet"
                        )
                    try:
                        pdf = api.search_bool(
                            _term(q),
                            size=size,
                            from_=from_,
                            mode=match,
                            minimum_should_match=_msm_from_query(q),
                            boosts=_boosts_from_query(q),
                            filters=_filters_from_query(q),
                            as_pandas=True,
                            must_not=exclude,
                        )
                    except ValueError as exc:
                        raise BadRequest(str(exc)) from exc
                else:
                    raise BadRequest(
                        "match must be one of and|or|phrase|"
                        "phrase_prefix|bool_prefix|fuzzy|wildcard|regexp"
                    )
                if q.get("highlight", ["false"])[0].lower() in (
                    "1", "true",
                ):
                    # ES-highlight analogue: one doc-store access for
                    # this page's ids (fragments column on each item).
                    # fuzzy/wildcard hits match EXPANDED terms, not the
                    # literal request term — highlighting the raw term
                    # would mark nothing on most hits, so reject rather
                    # than mislead.
                    if match not in ("and", "phrase"):
                        raise BadRequest(
                            "highlight supports match=and|phrase"
                        )
                    frags = api.highlight(
                        _term(q), [int(x) for x in pdf["doc_id"]]
                    )
                    pdf = pdf.merge(frags, on="doc_id", how="left")
                self._json({"items": _items(pdf)})
            elif url.path == "/api/v1/search":
                # ES URI-search analogue (GET /_search?q=...): the
                # query_string syntax over the same clamped paging.
                # Filters live INSIDE q (field:value / field:>=n), not
                # as separate params — one string is the whole query.
                raw = q.get("q", [""])[0]
                if not raw:
                    raise BadRequest("q= is required")
                if len(raw) > MAX_TERM_LEN:
                    raise BadRequest(
                        f"q longer than {MAX_TERM_LEN} chars"
                    )
                size, from_ = _page(q, default_size=10)
                dop = q.get("default_operator", ["or"])[0].lower()
                try:
                    pdf = api.query_string(
                        raw, size=size, from_=from_,
                        default_operator=dop,
                        minimum_should_match=_msm_from_query(q),
                        as_pandas=True,
                    )
                except (ValueError, NotImplementedError) as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"items": _items(pdf)})
            elif url.path == "/api/v1/suggests":
                size, _ = _page(q, default_size=10)
                pdf = api.suggest(
                    _term(q),
                    size=size,
                    filters=_filters_from_query(q),
                    as_pandas=True,
                )
                self._json({"items": _items(pdf)})
            elif url.path == "/api/v1/address/guid":
                key = {
                    k: q[k][0]
                    for k in ("repo", "path", "commit")
                    if k in q
                }
                df = api.get_doc(**key).drop("content")
                self._json({"items": _rows(df)})
            elif url.path == "/api/v1/facets":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                size, _ = _page(q, default_size=10)
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                try:
                    pdf = api.facets(
                        field,
                        _term(q) or None,
                        mode=mode,
                        filters=_filters_from_query(q),
                        size=size,
                    )
                except ValueError as exc:  # unknown field
                    raise BadRequest(str(exc)) from exc
                self._json({"buckets": _items(pdf)})
            elif url.path == "/api/v1/terms_stats":
                group = q.get("group", [""])[0]
                metric = q.get("metric", [""])[0]
                if not group or not metric:
                    raise BadRequest("group= and metric= are required")
                size, _ = _page(q, default_size=10)
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                try:
                    pdf = api.terms_stats(
                        group, metric, _term(q) or None, mode=mode,
                        filters=_filters_from_query(q), size=size,
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"buckets": _items(pdf)})
            elif url.path == "/api/v1/composite":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                size, _ = _page(q, default_size=10)
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                after = q.get("after", [None])[0]
                if after is not None:
                    # numeric group fields page with numeric cursors
                    after = _coerce(field, after)
                try:
                    pdf = api.composite_agg(
                        field, size=size, after=after,
                        term=_term(q) or None, mode=mode,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                after_key = (
                    pdf[field].iloc[-1] if len(pdf) else None
                )
                if hasattr(after_key, "item"):
                    after_key = after_key.item()
                self._json(
                    {"buckets": _items(pdf), "after_key": after_key}
                )
            elif url.path == "/api/v1/suggest_terms":
                size, _ = _page(q, default_size=5)
                try:
                    pdf = api.suggest_terms(_term(q), size=size)
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"suggestions": _items(pdf)})
            elif url.path == "/api/v1/suggest_phrase":
                # ES phrase suggester (did-you-mean), unigram form;
                # collate=true prunes via ONE count_many postings pass
                size, _ = _page(q, default_size=5)
                collate = q.get("collate", ["false"])[0].lower() in (
                    "1", "true",
                )
                try:
                    pdf = api.suggest_phrase(
                        _term(q), size=size, collate=collate
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"suggestions": _items(pdf)})
            elif url.path == "/api/v1/complete":
                prefix = q.get("prefix", [""])[0]
                if len(prefix) > MAX_TERM_LEN:
                    raise BadRequest(
                        f"prefix longer than {MAX_TERM_LEN} chars"
                    )
                size, _ = _page(q, default_size=5)
                try:
                    pdf = api.complete_prefix(prefix, size=size)
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"suggestions": _items(pdf)})
            elif url.path == "/api/v1/histogram":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                try:
                    interval = float(q.get("interval", [""])[0])
                except ValueError:
                    raise BadRequest(
                        "interval= is required and numeric"
                    ) from None
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                try:
                    pdf = api.histogram(
                        field,
                        interval,
                        _term(q) or None,
                        mode=mode,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:  # unknown field / bad interval
                    raise BadRequest(str(exc)) from exc
                self._json({"buckets": _items(pdf)})
            elif url.path == "/api/v1/cardinality":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                exact = q.get("exact", ["true"])[0].lower() not in (
                    "0", "false",
                )
                try:
                    n = api.cardinality(
                        field, _term(q) or None, mode=mode,
                        filters=_filters_from_query(q), exact=exact,
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"cardinality": n})
            elif url.path == "/api/v1/percentiles":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                try:
                    ps = tuple(
                        float(p)
                        for p in q.get("ps", ["25,50,75,95,99"])[0]
                        .split(",")
                    )
                except ValueError:
                    raise BadRequest("ps= must be comma-separated "
                                     "numbers") from None
                try:
                    vals = api.percentiles(
                        field, ps, _term(q) or None, mode=mode,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"values": {str(p): v
                                       for p, v in vals.items()}})
            elif url.path == "/api/v1/sampler":
                # ES sampler/diversified_sampler + terms sub-agg: facet
                # counts over only the top-shard_size scoring matches
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                term = _term(q)
                if not term:
                    raise BadRequest("term= is required")
                try:
                    shard = int(q.get("shard_size", ["100"])[0])
                    size = int(q.get("size", ["10"])[0])
                    mpv = int(q.get("max_docs_per_value", ["1"])[0])
                except ValueError:
                    raise BadRequest(
                        "shard_size/size/max_docs_per_value must be "
                        "integers"
                    ) from None
                if not 1 <= size <= 1000:
                    raise BadRequest("size must be in [1, 1000]")
                div = q.get("diversify", [None])[0]
                try:
                    pdf = api.sampler_facets(
                        field, term, shard_size=shard, k=size,
                        diversify_field=div, max_docs_per_value=mpv,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"buckets": _items(pdf)})
            elif url.path == "/api/v1/rare_terms":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                try:
                    mdc = int(q.get("max_doc_count", ["1"])[0])
                    mb = int(q.get("max_buckets", ["100"])[0])
                except ValueError:
                    raise BadRequest("max_doc_count/max_buckets must be "
                                     "integers") from None
                if not 1 <= mb <= 10_000:
                    raise BadRequest("max_buckets must be in [1, 10000]")
                try:
                    pdf = api.rare_terms(
                        field, _term(q) or None, max_doc_count=mdc,
                        max_buckets=mb, filters=_filters_from_query(q),
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"buckets": _items(pdf)})
            elif url.path == "/api/v1/multi_terms":
                flds = [f for f in q.get("fields", [""])[0].split(",") if f]
                try:
                    k = int(q.get("size", ["10"])[0])
                except ValueError:
                    raise BadRequest("size must be an integer") from None
                if not 1 <= k <= 10_000:
                    raise BadRequest("size must be in [1, 10000]")
                try:
                    pdf = api.multi_terms(
                        flds, _term(q) or None, size=k,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"buckets": _items(pdf)})
            elif url.path == "/api/v1/percentile_ranks":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                try:
                    values = [float(v)
                              for v in q.get("values", [""])[0].split(",")
                              if v]
                except ValueError:
                    raise BadRequest("values= must be comma-separated "
                                     "numbers") from None
                try:
                    d = api.percentile_ranks(
                        field, values, _term(q) or None,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"values": {str(v): r for v, r in d.items()}})
            elif url.path == "/api/v1/mad":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                try:
                    v = api.mad(field, _term(q) or None,
                                filters=_filters_from_query(q))
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"mad": v})
            elif url.path == "/api/v1/range":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                ranges = []
                for raw in q.get("ranges", [""])[0].split(";"):
                    if not raw:
                        continue
                    lo, sep, hi = raw.partition("-")
                    if not sep:
                        raise BadRequest("ranges= must be "
                                         "lo-hi;lo-hi (* = open)")
                    try:
                        ranges.append((
                            None if lo == "*" else float(lo),
                            None if hi == "*" else float(hi),
                        ))
                    except ValueError:
                        raise BadRequest(
                            f"bad range bound in {raw!r}"
                        ) from None
                try:
                    pdf = api.range_agg(
                        field, ranges, _term(q) or None, mode=mode,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"buckets": _items(pdf)})
            elif url.path == "/api/v1/top_hits":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                if not _term(q):
                    raise BadRequest("term= is required")
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                try:
                    kpg = int(q.get("k", ["3"])[0])
                    ngroups = int(q.get("groups", ["10"])[0])
                except ValueError:
                    raise BadRequest(
                        "k= and groups= must be integers"
                    ) from None
                if not (1 <= kpg <= 100 and 1 <= ngroups <= 1000):
                    raise BadRequest(
                        "k must be in [1,100], groups in [1,1000]"
                    )
                try:
                    pdf = api.top_hits(
                        field, _term(q), kpg, groups=ngroups,
                        mode=mode, filters=_filters_from_query(q),
                    )
                except ValueError as exc:
                    raise BadRequest(str(exc)) from exc
                self._json({"hits": _items(pdf)})
            elif url.path in ("/api/v1/explain", "/api/v1/termvectors"):
                try:
                    src = int(q.get("doc_id", [""])[0])
                except ValueError:
                    raise BadRequest(
                        "doc_id= is required and integer"
                    ) from None
                if url.path.endswith("explain"):
                    if not _term(q):
                        raise BadRequest("term= is required")
                    self._json(api.engine.explain_doc(_term(q), src))
                else:
                    tv = api.engine.termvectors(src)
                    self._json({"terms": _items(tv)})
            elif url.path == "/api/v1/significant_terms":
                if not _term(q):
                    raise BadRequest("term= is required")
                size, _ = _page(q, default_size=10)
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                pdf = api.significant_terms(
                    _term(q), size=size, mode=mode,
                    filters=_filters_from_query(q),
                )
                self._json({"buckets": _items(pdf)})
            elif url.path == "/api/v1/more_like_this":
                try:
                    src = int(q.get("doc_id", [""])[0])
                except ValueError:
                    raise BadRequest(
                        "doc_id= is required and integer"
                    ) from None
                size, _ = _page(q, default_size=10)
                pdf = api.more_like_this(
                    src, size=size,
                    filters=_filters_from_query(q), as_pandas=True,
                )
                self._json({"items": _items(pdf)})
            elif url.path == "/api/v1/rescore":
                if not _term(q):
                    raise BadRequest("term= is required")
                rq = q.get("rescore", [""])[0]
                if not rq:
                    raise BadRequest("rescore= is required")
                if len(rq) > MAX_TERM_LEN:
                    raise BadRequest(
                        f"rescore longer than {MAX_TERM_LEN} chars"
                    )
                size, _ = _page(q, default_size=10)
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                try:
                    window = int(q.get("window", ["50"])[0])
                    qw = float(q.get("query_weight", ["1.0"])[0])
                    rw = float(q.get("rescore_weight", ["1.0"])[0])
                    slop = int(q.get("slop", ["0"])[0])
                except ValueError:
                    raise BadRequest(
                        "window/slop must be integers, weights floats"
                    ) from None
                if not 1 <= window <= MAX_SIZE:
                    raise BadRequest(
                        f"window must be in [1, {MAX_SIZE}]"
                    )
                if not 0 <= slop <= MAX_SLOP:
                    raise BadRequest(f"slop must be in [0, {MAX_SLOP}]")
                try:
                    pdf = api.rescore(
                        _term(q), rq, size=size, window_size=window,
                        query_weight=qw, rescore_weight=rw, mode=mode,
                        slop=slop, as_pandas=True,
                    )
                except ValueError as exc:  # window < size etc.
                    raise BadRequest(str(exc)) from exc
                self._json({"items": _items(pdf)})
            elif url.path == "/api/v1/function_score":
                if not _term(q):
                    raise BadRequest("term= is required")
                size, _ = _page(q, default_size=10)
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                field = q.get("field", ["doclen"])[0]
                modifier = q.get("modifier", ["log1p"])[0]
                boost_mode = q.get("boost_mode", ["multiply"])[0]
                try:
                    factor = float(q.get("factor", ["1.0"])[0])
                except ValueError:
                    raise BadRequest("factor must be a float") from None
                decay = None
                if "origin" in q or "scale" in q or "shape" in q:
                    # ES decay-function mode (gauss/exp/linear):
                    # origin= and scale= are required together
                    try:
                        decay = {
                            "shape": q.get("shape", ["gauss"])[0],
                            "origin": float(q["origin"][0]),
                            "scale": float(q["scale"][0]),
                            "offset": float(
                                q.get("decay_offset", ["0"])[0]
                            ),
                            "decay": float(
                                q.get("decay_value", ["0.5"])[0]
                            ),
                        }
                    except KeyError as e:
                        raise BadRequest(
                            "decay mode needs both origin= and scale="
                        ) from e
                    except ValueError:
                        raise BadRequest(
                            "origin/scale/decay_offset/decay_value must "
                            "be floats"
                        ) from None
                try:
                    pdf = api.function_score(
                        _term(q), size=size, field=field,
                        modifier=modifier, factor=factor,
                        boost_mode=boost_mode, mode=mode,
                        filters=_filters_from_query(q), as_pandas=True,
                        decay=decay,
                    )
                except ValueError as exc:  # bad modifier/field/mode
                    raise BadRequest(str(exc)) from exc
                self._json({"items": _items(pdf)})
            elif url.path == "/api/v1/collapse":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                if not _term(q):
                    raise BadRequest("term= is required")
                size, _ = _page(q, default_size=10)
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                try:
                    pdf = api.collapse(
                        field, _term(q), size=size, mode=mode,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:  # unknown field
                    raise BadRequest(str(exc)) from exc
                self._json({"hits": _items(pdf)})
            elif url.path == "/api/v1/field_stats":
                field = q.get("field", [""])[0]
                if not field:
                    raise BadRequest("field= is required")
                mode = q.get("match", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("match must be and|or")
                try:
                    st = api.field_stats(
                        field,
                        _term(q) or None,
                        mode=mode,
                        filters=_filters_from_query(q),
                    )
                except ValueError as exc:  # unknown / non-numeric field
                    raise BadRequest(str(exc)) from exc
                self._json({"stats": st})
            elif url.path == "/api/v1/count":
                exclude = q.get("exclude", [None])[0]
                if exclude is not None and not _term(q):
                    raise BadRequest("exclude= requires term=")
                n = api.count(
                    _term(q) or None,
                    filters=_filters_from_query(q),
                    must_not=exclude,
                )
                self._json({"count": n})
            elif url.path == "/api/v1/count_many":
                # ES filters-agg analogue: repeated query=id:text params,
                # all counted in ONE postings pass (engine.count_many)
                raws = q.get("query", [])
                if not raws:
                    raise BadRequest(
                        "count_many requires at least one query=id:text"
                    )
                if len(raws) > 100:
                    raise BadRequest("at most 100 query= params")
                qmap: dict[str, str] = {}
                for raw in raws:
                    qid, sep, text = raw.partition(":")
                    if not sep or not qid or not text:
                        raise BadRequest(
                            f"query must be id:text, got {raw!r}"
                        )
                    if len(text) > MAX_TERM_LEN:
                        raise BadRequest(
                            f"query text longer than {MAX_TERM_LEN} chars"
                        )
                    if qid in qmap:
                        raise BadRequest(f"duplicate query id {qid!r}")
                    qmap[qid] = text
                mode = q.get("mode", ["and"])[0]
                if mode not in ("and", "or"):
                    raise BadRequest("mode must be and|or")
                pdf = api.count_many(
                    qmap, mode=mode, filters=_filters_from_query(q)
                )
                self._json(
                    {"counts": {
                        r["query"]: int(r["cnt"])
                        for _, r in pdf.iterrows()
                    }}
                )
            elif url.path == "/api/v1/adjacency_matrix":
                # ES adjacency_matrix agg: same repeated query=id:text
                # surface; singles + pairwise intersections, one pass
                raws = q.get("query", [])
                if not 1 <= len(raws) <= 20:  # n(n-1)/2 pairs: cap n
                    raise BadRequest(
                        "adjacency_matrix takes 1..20 query=id:text params"
                    )
                qmap = {}
                for raw in raws:
                    qid, sep, text = raw.partition(":")
                    if not sep or not qid or not text:
                        raise BadRequest(
                            f"query must be id:text, got {raw!r}"
                        )
                    if "&" in qid:
                        raise BadRequest("query id must not contain '&'")
                    if len(text) > MAX_TERM_LEN:
                        raise BadRequest(
                            f"query text longer than {MAX_TERM_LEN} chars"
                        )
                    if qid in qmap:
                        raise BadRequest(f"duplicate query id {qid!r}")
                    qmap[qid] = text
                pdf = api.adjacency_matrix(
                    qmap, filters=_filters_from_query(q)
                )
                self._json(
                    {"buckets": {
                        r["query"]: int(r["cnt"])
                        for _, r in pdf.iterrows()
                    }}
                )
            elif url.path == "/api/v1/analyze":
                # ES _analyze analogue: run a text through the index's
                # analyzer chain (or an explicit mode) and return the
                # token stream with positions — THE debugging surface
                # for "why didn't this match" questions. Driver-only:
                # no engine state is touched, no Spark job.
                text = q.get("text", [""])[0]
                if not text:
                    raise BadRequest("text= is required")
                if len(text) > 8 * MAX_TERM_LEN:
                    raise BadRequest(
                        f"text longer than {8 * MAX_TERM_LEN} chars"
                    )
                mode = q.get("mode", [None])[0]
                cfg = api.engine.analyzer
                if mode is not None:
                    from gofias_spark.config import AnalyzerConfig
                    if mode not in ("standard", "edge_ngram", "ngram"):
                        raise BadRequest(
                            "mode must be standard|edge_ngram|ngram"
                        )
                    cfg = AnalyzerConfig(
                        mode=mode, token_pattern=cfg.token_pattern
                    )
                from gofias_spark.analyzer import tokenize_text
                toks = tokenize_text(text, cfg)
                self._json({
                    "analyzer": cfg.mode,
                    "tokens": [
                        {"token": t, "position": i}
                        for i, t in enumerate(toks)
                    ],
                })
            elif url.path == "/metrics":
                with lock:
                    snap = dict(metrics, by_path=dict(metrics["by_path"]),
                                cache_entries=len(cache))
                n = max(snap["requests_total"], 1)
                snap["latency_avg_secs"] = round(
                    snap["latency_sum_secs"] / n, 6
                )
                self._cache_key = None
                self._json(snap)
            else:
                self._cache_key = None
                self._json({"error": "not found"}, code=404)

    return Handler


def serve(api: FulltextAPI, host: str = "127.0.0.1", port: int = 8080,
          cache_size: int = 256):
    """Start the gateway; returns (server, thread). Call
    ``server.shutdown()`` to stop. ``cache_size`` sizes the response LRU
    (0 disables; entries are keyed by URL + index state token, so delta
    imports invalidate implicitly)."""
    server = ThreadingHTTPServer((host, port), make_handler(api, cache_size))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
