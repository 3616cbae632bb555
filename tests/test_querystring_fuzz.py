"""Property-based totality of the query_string parser (gateway surface):
the ONLY exception the parser may raise is ValueError — the HTTP route
maps ValueError to 400, so anything else (IndexError on a truncated
escape, RecursionError on deep nests, re.error from user text leaking
into a regex) would surface as a 500 on a public endpoint.

Also: generatively VALID query strings always parse, and parsing is
deterministic (same input -> same clause list)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gofias_spark.query.querystring import parse_query_string

ASCII = st.characters(min_codepoint=32, max_codepoint=126)
FUZZ_SETTINGS = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(st.text(alphabet=ASCII, max_size=60))
@settings(max_examples=500, **FUZZ_SETTINGS)
def test_parser_raises_only_valueerror(qs):
    try:
        parse_query_string(qs)
    except ValueError:
        pass  # the documented contract (HTTP 400)


@given(st.text(alphabet=st.sampled_from('()"+-^:[]~\\ az0'), max_size=40))
@settings(max_examples=500, **FUZZ_SETTINGS)
def test_parser_total_on_metachar_soup(qs):
    """Concentrated metacharacter inputs (the adversarial subset random
    ASCII rarely hits: unbalanced quotes/parens/brackets, dangling
    escapes and boosts)."""
    try:
        parse_query_string(qs)
    except ValueError:
        pass


_term = st.text(alphabet=st.sampled_from("abcxyz01_"), min_size=1,
                max_size=8)
_occur = st.sampled_from(["", "+", "-"])


@st.composite
def _valid_clause(draw, depth=0):
    # range filters (kind 3) only at top level: the engine documents
    # field filters inside groups as a ValueError (filters apply
    # query-wide) — and the totality tests cover that path anyway
    kinds = [0, 1, 2]
    if depth == 0:
        kinds.append(3)
    if depth < 2:
        kinds.append(4)
    kind = draw(st.sampled_from(kinds))
    occ = draw(_occur)
    if kind == 0:  # bare term (maybe boosted)
        body = draw(_term)
        if draw(st.booleans()):
            body += f"^{draw(st.integers(1, 9))}"
    elif kind == 1:  # phrase, maybe with slop
        words = draw(st.lists(_term, min_size=1, max_size=3))
        body = '"' + " ".join(words) + '"'
        if draw(st.booleans()):
            body += f"~{draw(st.integers(0, 4))}"
    elif kind == 2:  # wildcard / fuzzy suffix
        body = draw(_term) + draw(st.sampled_from(["*", "~", "~1"]))
    elif kind == 3:  # numeric range filter on a known field shape
        lo, hi = sorted([draw(st.integers(0, 99)),
                         draw(st.integers(100, 999))])
        body = f"doclen:[{lo} TO {hi}]"
    else:  # group
        inner = draw(st.lists(_valid_clause(depth + 1), min_size=1,
                              max_size=3))
        body = "(" + " ".join(inner) + ")"
    return occ + body


@given(st.lists(_valid_clause(), min_size=1, max_size=5),
       st.sampled_from(["or", "and"]))
@settings(max_examples=200, **FUZZ_SETTINGS)
def test_valid_queries_always_parse(clauses, op):
    qs = " ".join(clauses)
    p1 = parse_query_string(qs, default_operator=op)
    p2 = parse_query_string(qs, default_operator=op)
    assert repr(p1.clauses) == repr(p2.clauses)  # deterministic
    assert p1.clauses or p1.filters is not None or qs.strip() == ""
