"""gRPC service facade — the proto-shaped half of S11.

The reference exposes its query surface as gRPC services with a REST
gateway generated from the same proto (fias.proto:64-119; handlers
app/infrastructure/persistence/grpc/handler/addressHandler.go). Our REST
gateway (``gofias_spark/server.py``) covers the HTTP bindings; this module
mirrors the *service* surface: proto-shaped request/response messages and
a transport-independent servicer whose RPC methods match the reference's
one-to-one, delegating to the same :class:`~gofias_spark.api.FulltextAPI`
object the REST gateway serves — both transports are thin codecs over one
facade, exactly the reference's generated-gateway arrangement.

Message shapes follow fias.proto with this engine's domain fields in
place of the address fields: the reference filters on
``level`` (NumberFilter) / ``parent_guid`` / ``kladr_id`` (StringFilter);
the analogous filterable attributes here are ``doclen`` (numeric) and
``lang`` / ``repo`` (string). ``FilterObject`` compilation reproduces the
reference handler's ``prepareFilter`` (addressHandler.go:140-165):
Min/Max become a range, Values become a terms filter.

grpcio wiring is import-gated: this container ships no ``grpc`` module,
so :func:`serve_grpc` raises a clear RuntimeError here, and registers the
servicer via ``grpc.method_handlers_generic_handler`` with JSON
(de)serializers when grpcio is available (generic handlers need no
protoc-generated stubs; the wire format is JSON rather than
proto-binary, which only changes the codec, not the service surface).
The servicer itself is fully usable — and tested — without grpcio.
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass, field

from gofias_spark.api import FulltextAPI


class NotFound(KeyError):
    """GetByGuid miss — mapped to gRPC NOT_FOUND / HTTP 404."""


class InvalidArgument(ValueError):
    """Malformed request — mapped to gRPC INVALID_ARGUMENT / HTTP 400."""


# ---------------------------------------------------------------------------
# messages (fias.proto:121-176 shapes over this engine's fields)
# ---------------------------------------------------------------------------


@dataclass
class NumberFilter:
    """fias.proto:158-162 — values = terms filter, min/max = range."""

    values: list[float] = field(default_factory=list)
    min: float | None = None
    max: float | None = None


@dataclass
class StringFilter:
    """fias.proto:154-156."""

    values: list[str] = field(default_factory=list)


@dataclass
class FilterObject:
    """fias.proto:148-152 (level/parent_guid/kladr_id) with this engine's
    filterable attributes: doclen (numeric), lang/repo (string)."""

    doclen: NumberFilter | None = None
    lang: StringFilter | None = None
    repo: StringFilter | None = None


@dataclass
class TermFilterRequest:
    """fias.proto:130-136 (GetAddressByTerm request)."""

    term: str = ""
    size: int = 100
    from_: int = 0
    filter: FilterObject | None = None


@dataclass
class SimpleTermFilterRequest:
    """fias.proto:138-142 (GetSuggests request)."""

    term: str = ""
    size: int = 10
    filter: FilterObject | None = None


@dataclass
class GuidRequest:
    """fias.proto:121-123. The reference's guid is the FIAS UUID; the
    stable per-document id here is ``doc_id``, so guid = str(doc_id)."""

    guid: str = ""


@dataclass
class ListRequest:
    """GetAllCities analogue (fias.proto:99-103): unscored filtered scan,
    stable (repo, path) order, capped."""

    filter: FilterObject | None = None
    limit: int = 10000


@dataclass
class Doc:
    """``Address`` message analogue (fias.proto:165-211): one result row,
    identity + attributes + score."""

    doc_id: int = -1
    repo: str = ""
    path: str = ""
    commit: str = ""
    lang: str | None = None
    sha256: str = ""
    score: float = 0.0


@dataclass
class DocListResponse:
    """AddressListResponse (fias.proto:144-146)."""

    items: list[Doc] = field(default_factory=list)


@dataclass
class Health:
    """fias.proto Health message analogue — process + index vitals."""

    uptime_secs: float = 0.0
    n_docs: int = 0
    next_doc_id: int = 0
    segments: int = 0


@dataclass
class Version:
    version: str = ""
    index_state: str = ""


# ---------------------------------------------------------------------------
# JSON codec for the generic-handler wire format (and a handy test surface)
# ---------------------------------------------------------------------------


def to_dict(msg) -> dict:
    return dataclasses.asdict(msg)


def from_dict(cls, d: dict):
    """Inverse of :func:`to_dict`, recursing into nested message fields.
    Unknown keys are rejected (proto3 would silently drop them, but a
    typo'd filter silently matching everything is the worse failure).
    Field TYPES are validated here too — decode is the only place wrong
    wire types may surface as INVALID_ARGUMENT; past this point a type
    error is a server bug (make_wire_handler lets it propagate)."""
    if not isinstance(d, dict):
        raise InvalidArgument(
            f"{cls.__name__}: expected a JSON object, "
            f"got {type(d).__name__}"
        )
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in d.items():
        if k not in fields:
            raise InvalidArgument(f"{cls.__name__}: unknown field {k!r}")
        sub = _MESSAGE_FIELDS.get((cls, k))
        if sub is not None:
            kwargs[k] = from_dict(sub, v) if v is not None else None
            continue
        f = fields[k]
        if v is None:
            # proto3 JSON: null = the field's default — leave the
            # dataclass default in place (constructing with None would
            # push a type error past decode into the servicer)
            continue
        elem = _LIST_ELEM.get((cls, k))
        opt = _OPTIONAL_SCALARS.get((cls, k))
        if elem is not None:
            if not isinstance(v, list) or not all(
                isinstance(x, elem) and not isinstance(x, bool)
                for x in v
            ):
                raise InvalidArgument(
                    f"{cls.__name__}.{k}: expected a list of "
                    f"{'strings' if elem is str else 'numbers'}"
                )
        elif opt is not None:
            if not isinstance(v, opt) or isinstance(v, bool):
                raise InvalidArgument(
                    f"{cls.__name__}.{k}: expected a number"
                )
        elif f.default_factory is not dataclasses.MISSING:
            raise InvalidArgument(
                f"{cls.__name__}.{k}: unsupported wire field"
            )
        elif isinstance(f.default, bool):
            if not isinstance(v, bool):
                raise InvalidArgument(
                    f"{cls.__name__}.{k}: expected a boolean"
                )
        elif isinstance(f.default, str):
            if not isinstance(v, str):
                raise InvalidArgument(
                    f"{cls.__name__}.{k}: expected a string"
                )
        elif isinstance(f.default, float):
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                raise InvalidArgument(
                    f"{cls.__name__}.{k}: expected a number"
                )
        elif isinstance(f.default, int):
            if not isinstance(v, int) or isinstance(v, bool):
                raise InvalidArgument(
                    f"{cls.__name__}.{k}: expected an integer"
                )
        kwargs[k] = v
    return cls(**kwargs)


_MESSAGE_FIELDS = {
    (TermFilterRequest, "filter"): FilterObject,
    (SimpleTermFilterRequest, "filter"): FilterObject,
    (ListRequest, "filter"): FilterObject,
    (FilterObject, "doclen"): NumberFilter,
    (FilterObject, "lang"): StringFilter,
    (FilterObject, "repo"): StringFilter,
}

# wire types the dataclass defaults can't express (list element types,
# optional scalars whose default is None) — used by from_dict validation
_LIST_ELEM = {
    (StringFilter, "values"): str,
    (NumberFilter, "values"): (int, float),
}
_OPTIONAL_SCALARS = {
    (NumberFilter, "min"): (int, float),
    (NumberFilter, "max"): (int, float),
}


def compile_filter_object(fo: FilterObject | None) -> dict | None:
    """prepareFilter analogue (addressHandler.go:140-165): proto filter
    message -> the engine's filters dict. Values win over Min/Max when both
    are set, matching the reference repository's query builder which emits
    a terms query for Values and a range query otherwise
    (elasticAddressRepository.go:459-487)."""
    if fo is None:
        return None
    f: dict = {}
    if fo.doclen is not None:
        if fo.doclen.values:
            f["doclen"] = [int(v) for v in fo.doclen.values]
        else:
            rng = {}
            if fo.doclen.min is not None:
                rng["gte"] = fo.doclen.min
            if fo.doclen.max is not None:
                rng["lte"] = fo.doclen.max
            if rng:
                f["doclen"] = rng
    for name, sf in (("lang", fo.lang), ("repo", fo.repo)):
        if sf is not None and sf.values:
            f[name] = list(sf.values)
    return f or None


# ---------------------------------------------------------------------------
# servicer
# ---------------------------------------------------------------------------

_DOC_COLS = ("doc_id", "repo", "path", "commit", "lang", "sha256", "score")
MAX_SIZE = 1000
MAX_FROM = 10000


class FulltextServicer:
    """AddressService + HealthService + VersionService analogue
    (fias.proto:64-119) over one FulltextAPI. Transport-independent: both
    :func:`serve_grpc` and tests call these methods directly."""

    def __init__(self, api: FulltextAPI):
        self.api = api
        self._t0 = time.time()

    # -- HealthService ------------------------------------------------------
    def CheckHealth(self, request=None) -> Health:
        s = self.api.version()
        return Health(
            uptime_secs=round(time.time() - self._t0, 3),
            n_docs=int(s.get("n_docs", 0)),
            next_doc_id=int(s.get("next_doc_id", 0)),
            segments=len(s.get("segments", [])),
        )

    # -- VersionService -----------------------------------------------------
    def GetVersion(self, request=None) -> Version:
        """versionHandler.go:30-38 analogue: the index state stands in for
        the reference's FIAS version/update-date pair."""
        s = self.api.version()
        return Version(
            version=str(s.get("next_doc_id", 0)),
            index_state=json.dumps(s, sort_keys=True, default=str),
        )

    # -- AddressService -----------------------------------------------------
    def GetAddressByTerm(self, request: TermFilterRequest) -> DocListResponse:
        size, from_ = self._page(request.size, getattr(request, "from_", 0))
        pdf = self.api.search_by_term(
            request.term,
            size=size,
            from_=from_,
            filters=compile_filter_object(request.filter),
            as_pandas=True,
        )
        return self._doc_list(pdf)

    def GetSuggests(self, request: SimpleTermFilterRequest) -> DocListResponse:
        size, _ = self._page(request.size, 0)
        pdf = self.api.suggest(
            request.term,
            size=size,
            filters=compile_filter_object(request.filter),
            as_pandas=True,
        )
        return self._doc_list(pdf)

    def GetByGuid(self, request: GuidRequest) -> Doc:
        try:
            doc_id = int(request.guid)
        except (TypeError, ValueError):
            raise InvalidArgument(
                f"guid must be a doc_id integer, got {request.guid!r}"
            ) from None
        rows = self.api.get_doc(doc_id=doc_id).collect()
        if not rows:
            raise NotFound(request.guid)
        r = rows[0]
        return Doc(
            doc_id=int(r["doc_id"]),
            repo=r["repo"],
            path=r["path"],
            commit=r["commit"],
            lang=r["lang"],
            sha256=r["sha256"],
            score=0.0,
        )

    def ListDocs(self, request: ListRequest) -> DocListResponse:
        filters = compile_filter_object(request.filter)
        if not filters:
            raise InvalidArgument(
                "ListDocs requires a non-empty filter (an unfiltered list "
                "of the whole index is a scan, not an RPC)"
            )
        limit = max(0, min(int(request.limit), MAX_SIZE * 10))
        rows = self.api.list_by_filters(filters, limit=limit).collect()
        return DocListResponse(
            items=[
                Doc(
                    doc_id=int(r["doc_id"]),
                    repo=r["repo"],
                    path=r["path"],
                    commit=r["commit"],
                    lang=r["lang"],
                    sha256=r["sha256"],
                    score=0.0,
                )
                for r in rows
            ]
        )

    # -- helpers ------------------------------------------------------------
    @staticmethod
    def _page(size, from_) -> tuple[int, int]:
        """Clamp like the REST gateway (server.py MAX_SIZE/MAX_FROM — the
        ES index.max_result_window analogue); negative values are 400s."""
        size, from_ = int(size), int(from_)
        if size < 0 or from_ < 0:
            raise InvalidArgument("size and from must be >= 0")
        return min(size, MAX_SIZE), min(from_, MAX_FROM)

    @staticmethod
    def _doc_list(pdf) -> DocListResponse:
        items = [
            Doc(**{
                c: (row[c] if c != "doc_id" else int(row[c]))
                for c in _DOC_COLS
                if c in pdf.columns
            })
            for row in pdf.to_dict("records")
        ]
        return DocListResponse(items=items)


# ---------------------------------------------------------------------------
# grpcio wiring (generic handlers, JSON codec) — import-gated
# ---------------------------------------------------------------------------

_SERVICES: dict[str, list[str]] = {
    # service name -> unary-unary method names, mirroring fias.proto:64-119
    "fias_v1.HealthService": ["CheckHealth"],
    "fias_v1.VersionService": ["GetVersion"],
    "fias_v1.AddressService": [
        "GetAddressByTerm",
        "GetSuggests",
        "GetByGuid",
        "ListDocs",
    ],
}

_REQUEST_TYPES = {
    "GetAddressByTerm": TermFilterRequest,
    "GetSuggests": SimpleTermFilterRequest,
    "GetByGuid": GuidRequest,
    "ListDocs": ListRequest,
    "CheckHealth": type(None),
    "GetVersion": type(None),
}


def make_wire_handler(servicer: FulltextServicer, method: str):
    """Bytes-level unary handler for ``method`` — the whole JSON wire
    codec (request bytes -> request dataclass -> servicer -> response
    dataclass -> response bytes), TRANSPORT-FREE: ``context`` only needs
    an ``abort(status: str, detail: str)`` that raises, so the codec is
    drivable by an in-process fake channel in tests (grpcio absent in
    this container). :func:`serve_grpc` binds the same handler to
    ``grpc.unary_unary_rpc_method_handler`` with a context adapter that
    maps the status STRING (``"NOT_FOUND"`` / ``"INVALID_ARGUMENT"``) to
    ``grpc.StatusCode``."""
    req_cls = _REQUEST_TYPES[method]

    def handler(request_bytes: bytes, context) -> bytes:
        # Decode errors (bad JSON, wrong field types, unknown fields) are
        # request errors -> INVALID_ARGUMENT. The catch is scoped to the
        # DECODE step only: a TypeError raised inside the servicer or the
        # engine is a server-side bug and must surface as INTERNAL (i.e.
        # propagate), not masquerade as a bad request.
        try:
            d = json.loads(request_bytes or b"{}")
            req = None if req_cls is type(None) else from_dict(req_cls, d)
        except (InvalidArgument, json.JSONDecodeError, TypeError) as exc:
            context.abort("INVALID_ARGUMENT", str(exc))
            raise AssertionError("context.abort must raise")
        try:
            resp = getattr(servicer, method)(req)
        except NotFound as exc:
            context.abort("NOT_FOUND", str(exc))
            raise AssertionError("context.abort must raise")
        except InvalidArgument as exc:
            context.abort("INVALID_ARGUMENT", str(exc))
            raise AssertionError("context.abort must raise")
        return json.dumps(to_dict(resp)).encode()

    return handler


def serve_grpc(api: FulltextAPI, port: int = 50051, max_workers: int = 8):
    """Start a grpcio server for :class:`FulltextServicer`.

    Requires grpcio (NOT shipped in this container — the servicer and
    the :func:`make_wire_handler` codec are the tested surface; this
    function is the thin transport binding, structured exactly like the
    reference's generated registration in
    app/interfaces/grpc/server.go). Returns the started
    ``grpc.Server``."""
    try:
        import grpc
    except ImportError as exc:  # pragma: no cover - exercised by tests
        raise RuntimeError(
            "grpcio is not installed; the gRPC transport is unavailable. "
            "The same service surface is served over REST by "
            "gofias_spark.server.serve, and FulltextServicer is directly "
            "callable in-process."
        ) from exc

    from concurrent import futures  # pragma: no cover - needs grpcio

    servicer = FulltextServicer(api)

    class _Ctx:  # pragma: no cover - needs grpcio
        def __init__(self, grpc_ctx):
            self._ctx = grpc_ctx

        def abort(self, status: str, detail: str):
            self._ctx.abort(getattr(grpc.StatusCode, status), detail)

    def unary(method: str):  # pragma: no cover - needs grpcio
        wire = make_wire_handler(servicer, method)

        def handler(request_bytes, context):
            return wire(request_bytes, _Ctx(context))

        return grpc.unary_unary_rpc_method_handler(
            handler,
            request_deserializer=lambda b: b,
            response_serializer=lambda b: b,
        )

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    for service, methods in _SERVICES.items():
        server.add_generic_rpc_handlers(
            (
                grpc.method_handlers_generic_handler(
                    service, {m: unary(m) for m in methods}
                ),
            )
        )
    server.add_insecure_port(f"[::]:{port}")
    server.start()
    return server
