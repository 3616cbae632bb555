"""``query_string`` — a Lucene-ish query syntax compiled onto the engine.

ES's ``query_string`` / ``simple_query_string`` is the staple user-facing
entry point of every Elasticsearch deployment, including the reference's
(the reference issues structured match queries from Go, but any operator
of its cluster drives ad-hoc queries through this syntax — Kibana bar,
curl, dashboards). This module gives the Spark-first engine the same
front door, as a *compiler*: the string parses into a flat bool query
whose clauses are the engine's existing primitives, so every clause kind
inherits the tiered routing (driver-resident searcher / serve cache /
distributed scan), filter pushdown, and plan shapes that are already
tested and benchmarked.

Supported syntax (the useful union of query_string / simple_query_string):

    spark join                bare terms (default_operator: or|and)
    +required -excluded       occur prefixes (must / must_not)
    a AND b, a OR b, NOT c    uppercase connectors
    (a OR b) AND c            parenthesized groups — a group is ONE nested
                              bool clause (Lucene grouping): its own
                              musts/shoulds resolve inside, its combined
                              score joins the outer bool; groups nest and
                              take +/-/NOT prefixes and ^boosts
    "exact phrase"            match_phrase clause
    "proximity phrase"~N      match_phrase with slop N (in-order)
    lang:en repo:corpus       attribute match = exact filter (the engine's
                              match-on-keyword semantics, reference T7)
    -lang:en                  negated attribute filter ({"neq": v})
    doclen:>=100 doclen:<500  attribute range filter (F4)
    doclen:[100 TO 500]       inclusive range
    path:src*                 path prefix filter (path_prefix)
    term^2.5 "a b"^2          clause boost (multiplies idf / clause score)
    wild* wi?d                wildcard term expansion (term dictionary)
    fuzz~ fuzz~1              fuzzy term expansion (distance <= 1)

Execution semantics are ES bool semantics: a doc must match every *must*
clause and no *must_not* clause; *should* clauses add score (and at least
``minimum_should_match`` of them — default 1 — must match when there are
no must clauses). Score = sum of matched clauses' BM25 contributions,
each multiplied by its clause boost.

Compilation strategy (scale path):

* **Fast path** — every clause is a plain term: the whole query lowers to
  ONE ``engine.search()`` call (mode=and for must-only, mode=or for
  should-only, ``boosts`` carrying the ^weights, ``must_not`` carrying
  single-token negations). No composition overhead; identical plans to
  the structured API.
* **Composition path** — phrases / wildcards / fuzzies / mixed occurs:
  each clause contributes its exact all-matches score frame
  (``score_matches`` / ``phrase_matches`` — a per-clause top-k cut would
  be unsound because a doc's combined rank is not bounded by its
  per-clause ranks). Frames combine on doc_id:
  - all driver-resident (pandas): one concat + groupby — zero Spark jobs,
    serve-tier latency.
  - any distributed frame: union of (doc_id, score, cid, is_must) rows +
    ONE groupBy(doc_id) shuffle + broadcast anti-join for negations +
    TakeOrderedAndProject. The shuffle is (matched docs x clauses)
    two-column rows — never postings, never the doc store.

Reference parity note: gofias itself never exposes this syntax (its Go
handlers build structured queries, addressHandler.go:81-165); this is a
round-3 extension on the ES-replacement surface, like match_phrase and
multi_match before it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofias_spark.analyzer import analyze_query

__all__ = ["parse_query_string", "execute_query_string", "Clause",
           "ParsedQuery"]


@dataclass
class Clause:
    kind: str            # term | phrase | wildcard | fuzzy | group
    text: str            # payload (term(s) / phrase / pattern; "" for group)
    occur: str           # must | should | must_not
    boost: float = 1.0
    slop: int = 0        # phrase clauses only ("..."~N Lucene proximity)
    group: "ParsedQuery | None" = None   # nested bool (kind == "group")


@dataclass
class ParsedQuery:
    clauses: list[Clause] = field(default_factory=list)
    filters: dict | None = None


# one flat token of the query string: a quoted phrase, a field:[a TO b]
# range, or a bare run — optionally prefixed with +/- and suffixed with
# ^boost. Parens are excluded from the bare classes: the scanner handles
# grouping before this regex ever sees the text.
_TOKEN_RX = re.compile(
    r"""
    (?P<prefix>[+-]?)
    (?:
        "(?P<phrase>[^"]*)"(?:~(?P<slop>[0-9]+))?
      | (?P<rfield>[^\s"^:\[()\\]+):\[(?P<range>[^\]]*)\]
      | (?P<bare>(?:[^\s"^()\\]|\\.)+)
    )
    (?:\^(?P<boost>[0-9]*\.?[0-9]+))?
    """,
    re.VERBOSE,
)


def _scan(qs: str) -> list[tuple]:
    """Depth-aware token scan: ``('m', Match)`` for flat tokens,
    ``('g', prefix, inner_text, boost)`` for a balanced parenthesized
    group (quotes shield parens inside phrases). Raises on unbalanced
    parens or unparseable runs."""
    out: list[tuple] = []
    i, n = 0, len(qs)
    while i < n:
        ch = qs[i]
        if ch.isspace():
            i += 1
            continue
        j, prefix = i, ""
        if ch in "+-" and j + 1 < n and qs[j + 1] == "(":
            prefix, j = ch, j + 1
        if qs[j] == "(":
            depth, k, in_quote = 0, j, False
            while k < n:
                c = qs[k]
                if c == '"':
                    in_quote = not in_quote
                elif not in_quote:
                    if c == "(":
                        depth += 1
                    elif c == ")":
                        depth -= 1
                        if depth == 0:
                            break
                k += 1
            if depth != 0:
                raise ValueError("unbalanced parentheses in query_string")
            inner = qs[j + 1 : k]
            k += 1
            boost = None
            bm = re.match(r"\^([0-9]*\.?[0-9]+)", qs[k:])
            if bm:
                boost = bm.group(1)
                k += len(bm.group(0))
            out.append(("g", prefix, inner, boost))
            i = k
            continue
        if ch == ")":
            raise ValueError("unbalanced parentheses in query_string")
        m = _TOKEN_RX.match(qs, i)
        if not m or not (
            m.group("phrase") is not None
            or m.group("range") is not None
            or m.group("bare")
        ):
            raise ValueError(
                f"cannot parse query_string near {qs[i:i + 20]!r}"
            )
        out.append(("m", m))
        i = m.end()
    return out

_RANGE_PREFIX_OPS = (
    (">=", "gte"), ("<=", "lte"), (">", "gt"), ("<", "lt"),
)


def _unescape(s: str) -> str:
    r"""Resolve Lucene-style ``\x`` escapes: the character after a
    backslash is literal text (``main\(\)`` is the term ``main()``,
    ``\*`` a literal asterisk — never a wildcard)."""
    return re.sub(r"\\(.)", r"\1", s)


_MAX_GROUP_DEPTH = 32


def _coerce(v: str):
    """Numeric-looking operands become numbers (range filters on numeric
    attributes need numeric operands — engine._validate_filters); anything
    else stays a string."""
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def _add_filter(filters: dict, fld: str, spec) -> None:
    if isinstance(spec, dict) and isinstance(filters.get(fld), dict):
        filters[fld].update(spec)
    elif fld in filters:
        raise ValueError(f"conflicting filters on field {fld!r}")
    else:
        filters[fld] = spec


def parse_query_string(
    qs: str,
    default_operator: str = "or",
    filter_fields: set[str] | None = None,
    _depth: int = 0,
) -> ParsedQuery:
    """Parse, no engine needed. ``filter_fields`` is the set of attribute
    names that ``field:value`` may filter on (the executor passes the
    engine's doc_meta columns); None accepts any field name (validation
    then happens in the engine)."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    if _depth > _MAX_GROUP_DEPTH:
        # the execution combiner recurses per nesting level: reject
        # adversarial nests as a parse error (HTTP 400), not a
        # RecursionError from inside the engine (HTTP 500)
        raise ValueError(
            f"parenthesized groups nested deeper than {_MAX_GROUP_DEPTH}"
        )
    default_occur = "should" if default_operator == "or" else "must"
    clauses: list[Clause] = []
    filters: dict = {}
    toks = _scan(qs)

    # connector pass (flat at each nesting level; parenthesized groups are
    # single operands): NOT negates the next operand; AND promotes both
    # neighbours to must; OR demotes both neighbours to should — under
    # default_operator=and, 'a OR b' must return docs with EITHER term, so
    # OR cannot be a no-op there. A shared middle operand ('a AND b OR c')
    # keeps its FIRST connector's occur (setdefault), matching the flat
    # parser's left-to-right sweep.
    occur_override: dict[int, str] = {}
    pending_not = False
    prev_clause_i: int | None = None
    items: list[tuple[tuple, str | None]] = []   # (scanned item, forced)
    for el in toks:
        if el[0] == "m":
            m = el[1]
            bare = m.group("bare")
            if bare in ("AND", "OR", "NOT") and not m.group("prefix"):
                if bare == "NOT":
                    pending_not = True
                elif bare == "AND" and prev_clause_i is not None:
                    occur_override.setdefault(prev_clause_i, "must")
                    occur_override[len(items)] = "must"
                elif bare == "OR" and prev_clause_i is not None:
                    occur_override.setdefault(prev_clause_i, "should")
                    occur_override.setdefault(len(items), "should")
                continue
        forced = "must_not" if pending_not else None
        pending_not = False
        prev_clause_i = len(items)
        items.append((el, forced))
    if pending_not:
        raise ValueError("dangling NOT at end of query_string")

    for i, (el, forced) in enumerate(items):
        if el[0] == "g":
            _, gprefix, inner, gboost = el
            occur = forced or (
                "must" if gprefix == "+"
                else "must_not" if gprefix == "-"
                else occur_override.get(i, default_occur)
            )
            sub = parse_query_string(inner, default_operator, filter_fields,
                                     _depth=_depth + 1)
            if sub.filters:
                raise ValueError(
                    "field filters inside a parenthesized group are not "
                    "supported — filters apply query-wide, move "
                    f"{sorted(sub.filters)} to the top level"
                )
            if not sub.clauses:
                raise ValueError("empty parenthesized group")
            clauses.append(
                Clause("group", "", occur,
                       float(gboost) if gboost else 1.0, group=sub)
            )
            continue
        m = el[1]
        prefix, boost = m.group("prefix"), m.group("boost")
        occur = forced or (
            "must" if prefix == "+"
            else "must_not" if prefix == "-"
            else occur_override.get(i, default_occur)
        )
        if m.group("range") is not None:
            fld = m.group("rfield")
            if filter_fields is not None and fld not in filter_fields:
                raise ValueError(
                    f"unknown filter field {fld!r} "
                    f"(have {sorted(filter_fields)})"
                )
            parts = re.split(r"\s+TO\s+", m.group("range").strip())
            if len(parts) != 2:
                raise ValueError(
                    f"malformed range [{m.group('range')}] (want [a TO b])"
                )
            _add_filter(filters, fld,
                        {"gte": _coerce(parts[0]), "lte": _coerce(parts[1])})
            continue
        if m.group("phrase") is not None:
            text = m.group("phrase").strip()
            if text:
                clauses.append(Clause("phrase", text, occur,
                                      float(boost) if boost else 1.0,
                                      slop=int(m.group("slop") or 0)))
            continue
        bare = m.group("bare")
        # escape-aware views: `plain` strips escaped pairs, so a special
        # char present in it is an UNESCAPED operator; escaped chars are
        # literal text and resolve via _unescape at payload time
        plain = re.sub(r"\\.", "", bare)
        colon = re.search(r"(?<!\\):", bare)
        if colon is not None:
            fld = _unescape(bare[: colon.start()])
            val = bare[colon.start() + 1:]
            if filter_fields is not None and fld not in filter_fields \
                    and fld != "path_prefix":
                raise ValueError(
                    f"unknown filter field {fld!r} "
                    f"(have {sorted(filter_fields)})"
                )
            if val == "":
                raise ValueError(f"empty value for filter field {fld!r}")
            for sym, op in _RANGE_PREFIX_OPS:
                if val.startswith(sym):
                    _add_filter(filters, fld,
                                {op: _coerce(_unescape(val[len(sym):]))})
                    break
            else:
                val_plain = re.sub(r"\\.", "", val)
                if occur == "must_not":
                    _add_filter(filters, fld, {"neq": _coerce(_unescape(val))})
                elif fld == "path" and val.endswith("*") \
                        and not val.endswith(r"\*") \
                        and "*" not in val_plain[:-1] \
                        and "?" not in val_plain:
                    _add_filter(filters, "path_prefix", _unescape(val[:-1]))
                else:
                    _add_filter(filters, fld, _coerce(_unescape(val)))
            continue
        b = float(boost) if boost else 1.0
        fz = re.search(r"(?<!\\)~([0-9]*)$", bare)
        if fz is not None:
            dist = fz.group(1)
            if dist not in ("", "1"):
                raise ValueError(
                    f"fuzzy distance {dist} not supported (max 1)"
                )
            clauses.append(Clause("fuzzy", _unescape(bare[: fz.start()]),
                                  occur, b))
        elif "*" in plain or "?" in plain:
            # vocabulary terms are \w+ so an escaped \*/\? could never
            # match a term as a literal either; full unescape is safe
            clauses.append(Clause("wildcard", _unescape(bare), occur, b))
        else:
            clauses.append(Clause("term", _unescape(bare), occur, b))
    return ParsedQuery(clauses=clauses, filters=filters or None)


# ---------------------------------------------------------------------------
# execution


def _clause_frame(engine, c: Clause, filters, max_expansions):
    """All-matches (doc_id, score) for one clause (pandas or Spark DF), or
    None for a provably empty clause. Group clauses recurse through the
    bool combiner: the group's eligible docs with their combined scores
    join the outer bool as ONE clause — exactly a Lucene nested
    BooleanQuery."""
    if c.kind == "group":
        r = _bool_all_matches(engine, c.group, filters, max_expansions,
                              None)
        if r is None:
            return None
    elif c.kind == "term":
        r = engine.score_matches(c.text, mode="and", filters=filters)
    elif c.kind == "phrase":
        r = engine.phrase_matches(c.text, filters=filters, slop=c.slop)
    elif c.kind == "wildcard":
        variants = engine.wildcard_terms(c.text, max_expansions)
        if not variants:
            return None
        r = engine.score_matches(
            " ".join(variants), mode="or", filters=filters
        )
    elif c.kind == "fuzzy":
        toks = analyze_query(c.text, engine.analyzer)
        if len(toks) != 1:
            raise ValueError(
                f"fuzzy clause must be a single token, got {toks!r}"
            )
        variants = engine.fuzzy_terms(toks[0], 1, max_expansions)
        if not variants:
            return None
        r = engine.score_matches(
            " ".join(variants), mode="or", filters=filters
        )
    else:  # pragma: no cover - parser emits only the five kinds
        raise ValueError(f"unknown clause kind {c.kind!r}")
    if isinstance(r, pd.DataFrame):
        if len(r) == 0:
            return None
        if c.boost != 1.0:
            r = r.assign(score=r["score"] * c.boost)
        return r
    if c.boost != 1.0:
        r = r.select("doc_id", (F.col("score") * c.boost).alias("score"))
    return r


def _fast_path(engine, pq: ParsedQuery, analyzed: dict[str, list[str]]):
    """One-search() lowering when every clause is a plain term and the
    occurs don't mix must with should. Returns search() kwargs or None."""
    kinds = {c.kind for c in pq.clauses}
    if kinds - {"term"}:
        return None
    pos = [c for c in pq.clauses if c.occur != "must_not"]
    neg = [c for c in pq.clauses if c.occur == "must_not"]
    occurs = {c.occur for c in pos}
    if len(occurs) > 1:
        return None
    # must_not fast path excludes docs containing ANY negated token; that
    # equals clause semantics (doc matches the whole clause) only for
    # single-token clauses
    if any(len(analyzed[c.text]) != 1 for c in neg):
        return None
    # engine boosts are keyed per analyzed term: duplicate tokens (ES sums
    # each clause separately) or conflicting boosts on one term can't be
    # expressed in a single search() call
    boosts: dict[str, float] = {}
    seen: list[str] = []
    for c in pos:
        for t in analyzed[c.text]:
            if t in boosts and boosts[t] != c.boost:
                return None
            boosts[t] = c.boost
            seen.append(t)
    if len(seen) != len(set(seen)):
        return None
    boosts = {t: w for t, w in boosts.items() if w != 1.0}
    if not pos:
        return None
    mode = "and" if occurs == {"must"} else "or"
    if mode == "or" and any(len(analyzed[c.text]) > 1 for c in pos):
        # a multi-token should clause is a sub-AND; not one flat OR
        return None
    return dict(
        query=" ".join(c.text for c in pos),
        mode=mode,
        boosts=boosts or None,
        must_not=" ".join(c.text for c in neg) or None,
    )


def execute_query_string(
    engine,
    qs: str,
    k: int = 10,
    offset: int = 0,
    default_operator: str = "or",
    minimum_should_match: int | None = None,
    max_expansions: int | None = 50,
    filters: dict | None = None,
    with_meta: bool = True,
    as_pandas: bool = False,
):
    """Parse ``qs`` and run it against ``engine`` (a SearchEngine). Result
    contract identical to ``engine.search`` (top-k by combined score desc,
    doc_id asc tie-break, meta columns unless ``with_meta=False``).

    ``filters`` is an externally-supplied engine filter dict (the gateway's
    ``lang=`` / ``<field>.gte=`` params), merged with any in-query
    ``field:value`` filters — a field constrained both ways with
    conflicting equality raises ValueError (range specs merge)."""
    if minimum_should_match is not None and minimum_should_match < 1:
        raise ValueError("minimum_should_match must be >= 1")
    meta_fields = set(engine.doc_meta.columns)
    pq = parse_query_string(qs, default_operator, filter_fields=meta_fields)
    if filters:
        merged = dict(pq.filters or {})
        for fld, spec in filters.items():
            _add_filter(merged, fld, spec)
        pq.filters = merged
    if not pq.clauses:
        if pq.filters:
            raise ValueError(
                "query_string has only filters; add at least one scoring "
                "clause (term / phrase / wildcard / fuzzy)"
            )
        return engine._empty_result(with_meta, as_pdf=as_pandas)
    n_must = sum(c.occur == "must" for c in pq.clauses)
    n_should = sum(c.occur == "should" for c in pq.clauses)
    if minimum_should_match is not None and minimum_should_match > n_should:
        return engine._empty_result(with_meta, as_pdf=as_pandas)
    analyzed = {c.text: analyze_query(c.text, engine.analyzer)
                for c in pq.clauses}
    if any(c.kind == "term" and not analyzed[c.text] for c in pq.clauses):
        # a clause that analyzes to nothing (punctuation-only): must ->
        # unmatchable, should/must_not -> droppable
        if any(c.kind == "term" and not analyzed[c.text] and
               c.occur == "must" for c in pq.clauses):
            return engine._empty_result(with_meta, as_pdf=as_pandas)
        pq.clauses = [c for c in pq.clauses
                      if not (c.kind == "term" and not analyzed[c.text])]
        if not pq.clauses:
            return engine._empty_result(with_meta, as_pdf=as_pandas)
        n_must = sum(c.occur == "must" for c in pq.clauses)
    if minimum_should_match is None and n_must == 0:
        msm_eff = 1
    else:
        msm_eff = minimum_should_match or 0
    fast = None
    if minimum_should_match is None or n_must == 0:
        fast = _fast_path(engine, pq, analyzed)
    if fast is not None:
        return engine.search(
            fast["query"], k=k, offset=offset, mode=fast["mode"],
            filters=pq.filters, with_meta=with_meta, as_pandas=as_pandas,
            must_not=fast["must_not"], boosts=fast["boosts"],
            minimum_should_match=(
                minimum_should_match if fast["mode"] == "or" else None
            ),
        )
    # ---- composition path -------------------------------------------------
    frame = _bool_all_matches(
        engine, pq, pq.filters, max_expansions, msm_eff
    )
    if frame is None:
        return engine._empty_result(with_meta, as_pdf=as_pandas)
    if isinstance(frame, pd.DataFrame):
        order = np.lexsort(
            (frame["doc_id"].to_numpy(), -frame["score"].to_numpy())
        )
        topk = frame.iloc[order[offset:offset + k]][["doc_id", "score"]]
        return engine._attach_meta(
            topk.reset_index(drop=True), with_meta, as_pandas
        )
    topk_pdf = (
        frame.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(offset + k)
        .toPandas()
        .iloc[offset:offset + k]
    )
    return engine._attach_meta(topk_pdf, with_meta, as_pandas)


def _bool_all_matches(engine, pq: ParsedQuery, filters, max_expansions,
                      msm: int | None):
    """ALL eligible docs of one bool level as a (doc_id, score) frame —
    pandas when every contributing clause resolved driver-side, Spark DF
    otherwise — or None when provably empty. ``msm`` None applies the
    default rule (every must; >= 1 should when there are no musts).
    Groups recurse here, so nesting is arbitrary; each level's shuffle is
    (its matched docs x its clauses) two-column rows."""
    n_must = sum(c.occur == "must" for c in pq.clauses)
    msm_eff = 1 if (msm is None and n_must == 0) else (msm or 0)
    frames: list[tuple[object, bool]] = []   # (frame, is_must)
    neg_frames: list[object] = []
    for c in pq.clauses:
        if c.occur == "must_not":
            # negation needs only the doc_id set; filters are irrelevant
            # (exclusion of a filtered-out doc is a no-op)
            r = _clause_frame(engine, c, None, max_expansions)
            if r is not None:
                neg_frames.append(r)
            continue
        r = _clause_frame(engine, c, filters, max_expansions)
        if r is None:
            if c.occur == "must":
                return None
            continue
        frames.append((r, c.occur == "must"))
    if not frames:
        return None
    all_pandas = all(isinstance(f, pd.DataFrame) for f, _ in frames) and \
        all(isinstance(f, pd.DataFrame) for f in neg_frames)
    if all_pandas:
        tagged = [
            f[["doc_id", "score"]].assign(
                _m=1 if is_must else 0, _s=0 if is_must else 1
            )
            for f, is_must in frames
        ]
        allf = pd.concat(tagged, ignore_index=True)
        g = allf.groupby("doc_id", as_index=False).agg(
            score=("score", "sum"), _m=("_m", "sum"), _s=("_s", "sum")
        )
        elig = g[(g["_m"] == n_must) & (g["_s"] >= msm_eff)]
        if neg_frames:
            neg_ids = pd.concat(
                [f[["doc_id"]] for f in neg_frames], ignore_index=True
            )["doc_id"].unique()
            elig = elig[~elig["doc_id"].isin(neg_ids)]
        return elig[["doc_id", "score"]].reset_index(drop=True)
    # distributed combine: ONE groupBy(doc_id) shuffle over (matched docs
    # x clauses) two-column rows + broadcast anti-join for negations
    spark = engine.spark
    sch = "doc_id long, score double"

    def to_df(f):
        if isinstance(f, pd.DataFrame):
            return spark.createDataFrame(f[["doc_id", "score"]], sch)
        return f.select("doc_id", "score")

    parts = [
        to_df(f).select(
            "doc_id", "score",
            F.lit(1 if is_must else 0).alias("_m"),
            F.lit(0 if is_must else 1).alias("_s"),
        )
        for f, is_must in frames
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    g = (
        u.groupBy("doc_id")
        .agg(F.sum("score").alias("score"), F.sum("_m").alias("_m"),
             F.sum("_s").alias("_s"))
        .filter((F.col("_m") == n_must) & (F.col("_s") >= msm_eff))
        .select("doc_id", "score")
    )
    if neg_frames:
        neg = reduce(
            lambda a, b: a.unionByName(b),
            [to_df(f).select("doc_id") for f in neg_frames],
        ).distinct()
        g = g.join(F.broadcast(neg), "doc_id", "left_anti")
    return g
