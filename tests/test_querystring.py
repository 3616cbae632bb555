"""query_string: Lucene-ish syntax compiled onto the engine's primitives.

Parser unit tests (no Spark), fast-path equivalence against the structured
API, composition-path correctness (mixed must/should, phrase/wildcard/fuzzy
clauses, negation, filters), and warm-vs-distributed path equivalence (the
same query string must return identical hits whether every clause frame is
driver-resident pandas or a Spark DataFrame).
"""

import pandas as pd
import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine
from gofias_spark.query.querystring import (
    execute_query_string,
    parse_query_string,
)

FIELDS = {"lang", "repo", "path", "commit", "doclen", "sha256"}

DOCS = [
    # path, lang, text
    ("d0", "en", "alpha beta gamma common"),
    ("d1", "en", "alpha beta common common"),
    ("d2", "ru", "alpha gamma common"),
    ("d3", "en", "beta gamma delta common"),
    ("d4", "ru", "alpha beta delta"),
    ("d5", "en", "gamma delta epsilon common"),
    ("d6", "en", "alpha alpha beta noise filler words here common"),
    ("d7", "ru", "delta epsilon common"),
    ("d8", "en", "alphax beta common"),
    ("d9", "en", "zeta common"),
]


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("qsidx"))
    df = spark.createDataFrame(
        [("r", p, "c", lang, t) for p, lang, t in DOCS],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    build_segment(
        spark, df, root,
        IndexConfig(n_buckets=2, block_size=8, positions=True),
    )
    e = SearchEngine(spark, root)
    e.warm()
    return e


@pytest.fixture(scope="module")
def cold(spark, eng):
    """Same index, NO warm: clause frames are Spark DataFrames, so the
    composition path exercises the union + groupBy(doc_id) combine."""
    return SearchEngine(spark, str(eng.store.root))


def qs(e, s, **kw):
    return execute_query_string(e, s, as_pandas=True, **kw)


def paths(pdf):
    return sorted(pdf["path"].tolist())


def ranked(pdf):
    return list(zip(pdf["doc_id"].tolist(),
                    [round(s, 9) for s in pdf["score"].tolist()]))


# -- parser (no Spark) -------------------------------------------------------


def test_parse_occurs_and_filters():
    pq = parse_query_string("+alpha -beta gamma lang:en",
                            filter_fields=FIELDS)
    occ = {(c.text, c.occur) for c in pq.clauses}
    assert occ == {("alpha", "must"), ("beta", "must_not"),
                   ("gamma", "should")}
    assert pq.filters == {"lang": "en"}


def test_parse_default_operator_and():
    pq = parse_query_string("alpha beta", default_operator="and")
    assert all(c.occur == "must" for c in pq.clauses)


def test_parse_connectors():
    pq = parse_query_string("alpha AND beta NOT gamma OR delta")
    occ = {(c.text, c.occur) for c in pq.clauses}
    assert occ == {("alpha", "must"), ("beta", "must"),
                   ("gamma", "must_not"), ("delta", "should")}


def test_parse_kinds_and_boost():
    pq = parse_query_string('"a b"^2 wild* fu?z fuzz~ fuzz~1 term^1.5')
    kinds = [(c.kind, c.text, c.boost) for c in pq.clauses]
    assert kinds == [
        ("phrase", "a b", 2.0),
        ("wildcard", "wild*", 1.0),
        ("wildcard", "fu?z", 1.0),
        ("fuzzy", "fuzz", 1.0),
        ("fuzzy", "fuzz", 1.0),
        ("term", "term", 1.5),
    ]


def test_parse_phrase_slop():
    pq = parse_query_string('"a b"~2 "c d"~1^3 "e f"')
    got = [(c.kind, c.text, c.slop, c.boost) for c in pq.clauses]
    assert got == [
        ("phrase", "a b", 2, 1.0),
        ("phrase", "c d", 1, 3.0),
        ("phrase", "e f", 0, 1.0),
    ]


def test_parse_ranges():
    pq = parse_query_string(
        "doclen:>=3 doclen:<7 x", filter_fields=FIELDS
    )
    assert pq.filters == {"doclen": {"gte": 3, "lt": 7}}
    pq = parse_query_string("doclen:[3 TO 7] x", filter_fields=FIELDS)
    assert pq.filters == {"doclen": {"gte": 3, "lte": 7}}
    # string-typed range bounds survive uncoerced
    pq = parse_query_string("path:[d1 TO d4] x", filter_fields=FIELDS)
    assert pq.filters == {"path": {"gte": "d1", "lte": "d4"}}


def test_parse_negated_filter_and_path_prefix():
    pq = parse_query_string("-lang:ru path:d1* x", filter_fields=FIELDS)
    assert pq.filters == {"lang": {"neq": "ru"}, "path_prefix": "d1"}


def test_parse_errors():
    with pytest.raises(ValueError, match="unknown filter field"):
        parse_query_string("bogus:x", filter_fields=FIELDS)
    with pytest.raises(ValueError, match="dangling NOT"):
        parse_query_string("alpha NOT")
    with pytest.raises(ValueError, match="fuzzy distance"):
        parse_query_string("term~2")
    with pytest.raises(ValueError, match="malformed range"):
        parse_query_string("doclen:[1 2]", filter_fields=FIELDS)
    with pytest.raises(ValueError, match="default_operator"):
        parse_query_string("x", default_operator="xor")
    with pytest.raises(ValueError, match="empty value"):
        parse_query_string("lang:", filter_fields=FIELDS)


# -- fast path == structured API ---------------------------------------------


def test_must_only_equals_and_search(eng):
    direct = eng.search("alpha beta", mode="and", as_pandas=True)
    assert ranked(qs(eng, "+alpha +beta")) == ranked(direct)


def test_should_only_equals_or_search(eng):
    direct = eng.search("alpha beta", mode="or", as_pandas=True)
    assert ranked(qs(eng, "alpha beta")) == ranked(direct)


def test_default_operator_and_lowers_to_and(eng):
    direct = eng.search("alpha beta", mode="and", as_pandas=True)
    assert ranked(qs(eng, "alpha beta", default_operator="and")) \
        == ranked(direct)


def test_boost_fast_path(eng):
    direct = eng.search("alpha beta", mode="and",
                        boosts={"beta": 2.0}, as_pandas=True)
    assert ranked(qs(eng, "+alpha +beta^2")) == ranked(direct)


def test_must_not_fast_path(eng):
    direct = eng.search("alpha", mode="and", must_not="delta",
                        as_pandas=True)
    assert ranked(qs(eng, "+alpha -delta")) == ranked(direct)


def test_filter_fast_path(eng):
    direct = eng.search("alpha", mode="and", filters={"lang": "en"},
                        as_pandas=True)
    assert ranked(qs(eng, "+alpha lang:en")) == ranked(direct)


def test_msm_fast_path(eng):
    direct = eng.search("alpha beta delta", mode="or",
                        minimum_should_match=2, as_pandas=True)
    assert ranked(qs(eng, "alpha beta delta",
                     minimum_should_match=2)) == ranked(direct)


# -- composition path ---------------------------------------------------------


def test_mixed_must_should_scores(eng):
    """+alpha beta: eligibility = alpha docs; score = alpha + beta
    contribution where present."""
    res = qs(eng, "+alpha beta", k=20)
    a = eng.score_matches("alpha").set_index("doc_id")["score"]
    b = eng.score_matches("beta").set_index("doc_id")["score"]
    expect = (a + b.reindex(a.index).fillna(0.0)).sort_values()
    assert set(res["doc_id"]) == set(a.index)
    for did, sc in zip(res["doc_id"], res["score"]):
        assert sc == pytest.approx(expect[did], rel=1e-12)
    # ordering: score desc, doc_id asc
    key = sorted(
        zip(-res["score"], res["doc_id"])
    )
    assert [d for _, d in key] == res["doc_id"].tolist()


def test_phrase_clause_equals_search_phrase(eng):
    direct = eng.search_phrase("alpha beta", as_pandas=True)
    assert ranked(qs(eng, '+"alpha beta"')) == ranked(direct)


def test_sloppy_phrase_clause_equals_search_phrase(eng, cold):
    # 'alpha common' is adjacent nowhere in DOCS; slop=2 admits d0 (gap 2),
    # d1 and d2 (gap 1) — so the clause exercises real proximity semantics
    for e in (eng, cold):
        direct = eng.search_phrase("alpha common", slop=2, as_pandas=True)
        assert ranked(qs(e, '+"alpha common"~2')) == ranked(direct)
        assert len(direct)  # slop actually admits docs here
        exact = eng.search_phrase("alpha common", as_pandas=True)
        assert len(direct) > len(exact)


def test_phrase_with_negation(eng):
    res = qs(eng, '+"alpha beta" -gamma', k=20)
    direct = eng.search_phrase("alpha beta", k=20, as_pandas=True)
    gamma_docs = set(eng.score_matches("gamma")["doc_id"])
    keep = [(d, round(s, 9)) for d, s in ranked(direct)
            if d not in gamma_docs]
    assert ranked(res) == keep


def test_wildcard_clause(eng):
    # alph* expands to {alpha, alphax}; equivalence with search_wildcard
    direct = eng.search_wildcard("alph*", as_pandas=True)
    assert ranked(qs(eng, "alph*")) == ranked(direct)


def test_wildcard_as_must_with_should(eng):
    res = qs(eng, "+alph* zeta", k=20)
    w = eng.score_matches("alpha alphax", mode="or").set_index(
        "doc_id")["score"]
    z = eng.score_matches("zeta").set_index("doc_id")["score"]
    assert set(res["doc_id"]) == set(w.index)
    for did, sc in zip(res["doc_id"], res["score"]):
        assert sc == pytest.approx(
            w[did] + (z[did] if did in z.index else 0.0), rel=1e-12
        )


def test_fuzzy_clause(eng):
    direct = eng.search_fuzzy("alphz", as_pandas=True)
    assert ranked(qs(eng, "alphz~")) == ranked(direct)


def test_composition_with_filters(eng):
    res = qs(eng, '+"alpha beta" gamma lang:en', k=20)
    assert set(res["lang"]) <= {"en"}
    direct = eng.search_phrase(
        "alpha beta", filters={"lang": "en"}, k=20, as_pandas=True
    )
    assert set(res["doc_id"]) == set(direct["doc_id"])


def test_msm_composition(eng):
    """msm over mixed clause kinds (phrase counts as a should clause)."""
    res = qs(eng, 'alpha "beta gamma"', minimum_should_match=2, k=20)
    a = set(eng.score_matches("alpha")["doc_id"])
    p = set(eng.phrase_matches("beta gamma")["doc_id"])
    assert set(res["doc_id"]) == (a & p)


def test_range_filter_end_to_end(eng):
    res = qs(eng, "+common doclen:>=4 doclen:<=4", k=20)
    direct = eng.search(
        "common", filters={"doclen": {"gte": 4, "lte": 4}}, k=20,
        as_pandas=True,
    )
    assert ranked(res) == ranked(direct)


# -- path equivalence ---------------------------------------------------------

EQUIV_QUERIES = [
    "+alpha +beta",
    "alpha beta delta",
    "+alpha beta -delta",
    '+"alpha beta" gamma',
    "alph* -lang:ru",
    "+common doclen:[3 TO 6]",
    "alphz~ beta",
]


@pytest.mark.parametrize("q", EQUIV_QUERIES)
def test_warm_vs_distributed_identical(eng, cold, q):
    """The same query string returns identical (doc_id, score) pages on
    the driver-resident and distributed paths."""
    a = ranked(qs(eng, q, k=20))
    b = ranked(qs(cold, q, k=20))
    assert [(d, round(s, 6)) for d, s in a] == \
        [(d, round(s, 6)) for d, s in b]


# -- edges ---------------------------------------------------------------------


def test_empty_and_degenerate(eng):
    assert len(qs(eng, "")) == 0
    assert len(qs(eng, "nosuchterm")) == 0
    assert len(qs(eng, "+alpha +nosuchterm")) == 0
    # unmatched should clauses don't kill the musts
    assert len(qs(eng, "+alpha nosuchterm")) > 0
    # punctuation-only must clause can never match
    assert len(qs(eng, "+alpha", k=5)) > 0
    with pytest.raises(ValueError, match="only filters"):
        qs(eng, "lang:en")
    with pytest.raises(ValueError, match="minimum_should_match"):
        qs(eng, "alpha", minimum_should_match=0)
    # msm beyond the should-clause count: provably empty
    assert len(qs(eng, "alpha beta", minimum_should_match=3)) == 0


def test_offset_paging(eng):
    full = qs(eng, "+alpha beta", k=10)
    page2 = qs(eng, "+alpha beta", k=3, offset=3)
    assert ranked(page2) == ranked(full.iloc[3:6].reset_index(drop=True))


def test_duplicate_clause_sums_twice(eng):
    """ES sums identical clauses separately; duplicates leave the fast
    path and combine additively."""
    one = qs(eng, "+alpha")
    two = qs(eng, "+alpha +alpha")
    assert two["doc_id"].tolist() == one["doc_id"].tolist()
    for s2, s1 in zip(two["score"], one["score"]):
        assert s2 == pytest.approx(2 * s1, rel=1e-12)


def test_api_and_pandas_contract(eng):
    res = execute_query_string(eng, "+alpha beta", k=5)
    assert not isinstance(res, pd.DataFrame)  # Spark DF by default
    cols = res.columns
    assert cols[:2] == ["doc_id", "score"]


def test_parse_or_under_default_and():
    """'a OR b' with default_operator=and must make BOTH operands should
    (docs with either term match) — OR is only a no-op when the default
    is already should."""
    pq = parse_query_string("alpha OR beta", default_operator="and")
    occ = {(c.text, c.occur) for c in pq.clauses}
    assert occ == {("alpha", "should"), ("beta", "should")}
    # shared middle operand keeps its FIRST connector's occur
    pq = parse_query_string("alpha AND beta OR delta",
                            default_operator="and")
    occ = {(c.text, c.occur) for c in pq.clauses}
    assert occ == {("alpha", "must"), ("beta", "must"),
                   ("delta", "should")}


def test_or_under_default_and_executes_as_or(eng):
    direct = eng.search("alpha delta", mode="or", as_pandas=True)
    assert ranked(qs(eng, "alpha OR delta", default_operator="and")) \
        == ranked(direct)


# -- parenthesized groups ------------------------------------------------------


def test_parse_groups():
    pq = parse_query_string('+(alpha beta) -(gamma) delta^1.5 (x OR y)^2')
    kinds = [(c.kind, c.occur, c.boost) for c in pq.clauses]
    assert kinds == [
        ("group", "must", 1.0),
        ("group", "must_not", 1.0),
        ("term", "should", 1.5),
        ("group", "should", 2.0),
    ]
    inner = pq.clauses[0].group
    assert [(c.text, c.occur) for c in inner.clauses] == [
        ("alpha", "should"), ("beta", "should")
    ]
    # nesting
    pq = parse_query_string("((alpha OR beta) AND gamma)")
    assert len(pq.clauses) == 1 and pq.clauses[0].kind == "group"
    lvl2 = pq.clauses[0].group
    assert {(c.kind, c.occur) for c in lvl2.clauses} == {
        ("group", "must"), ("term", "must")
    }
    # connectors treat a group as one operand
    pq = parse_query_string("alpha AND (beta OR gamma)",
                            default_operator="and")
    assert [(c.kind, c.occur) for c in pq.clauses] == [
        ("term", "must"), ("group", "must")
    ]


def test_parse_group_errors():
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query_string("(alpha")
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query_string("alpha)")
    with pytest.raises(ValueError, match="empty parenthesized"):
        parse_query_string("()")
    with pytest.raises(ValueError, match="filters inside"):
        parse_query_string("(lang:en alpha)", filter_fields=FIELDS)


def _manual_group_and(eng, should_terms, must_term, gboost=1.0):
    """Reference combine: docs matching must_term AND >=1 of should_terms;
    score = must + gboost * sum(matching shoulds)."""
    import pandas as _pd

    shoulds = _pd.concat(
        [eng.score_matches(t) for t in should_terms], ignore_index=True
    ).groupby("doc_id", as_index=False)["score"].sum()
    must = eng.score_matches(must_term)
    m = shoulds.merge(must, on="doc_id", suffixes=("_g", "_m"))
    m["score"] = gboost * m["score_g"] + m["score_m"]
    m = m.sort_values(["score", "doc_id"], ascending=[False, True],
                      kind="mergesort").head(10)
    return list(zip(m["doc_id"].tolist(),
                    [round(s, 9) for s in m["score"].tolist()]))


def test_group_execution_semantics(eng):
    got = ranked(qs(eng, "(alpha OR delta) AND beta"))
    assert got == _manual_group_and(eng, ["alpha", "delta"], "beta")
    assert len(got) > 0
    # default_operator=and: whitespace adjacency ANDs the group with beta
    got2 = ranked(qs(eng, "(alpha OR delta) beta", default_operator="and"))
    assert got2 == got


def test_group_boost(eng):
    got = ranked(qs(eng, "(alpha OR delta)^2 AND beta"))
    assert got == _manual_group_and(eng, ["alpha", "delta"], "beta",
                                    gboost=2.0)


def test_negated_group(eng):
    got = qs(eng, "+beta -(alpha delta)")
    excl = set()
    for t in ("alpha", "delta"):
        excl |= set(eng.score_matches(t)["doc_id"])
    assert len(got) > 0
    assert set(got["doc_id"]).isdisjoint(excl)


def test_escaped_parens_are_literal_text():
    r"""Lucene-style \x escaping: a code-search query for a function call
    must be expressible. main\(\) is the single term main() (analyzed to
    'main'), not an empty group / parse error."""
    pq = parse_query_string(r"main\(\)", filter_fields=FIELDS)
    assert [c.kind for c in pq.clauses] == ["term"]
    assert pq.clauses[0].text == "main()"
    # mixed: foo\(bar\) stays ONE term clause, not term + group
    pq = parse_query_string(r"foo\(bar\)", filter_fields=FIELDS)
    assert len(pq.clauses) == 1 and pq.clauses[0].text == "foo(bar)"
    # unescaped parens still group
    pq = parse_query_string(r"foo (bar baz)", filter_fields=FIELDS)
    assert [c.kind for c in pq.clauses] == ["term", "group"]


def test_escaped_wildcard_and_fuzzy_markers():
    pq = parse_query_string(r"al\*ha", filter_fields=FIELDS)
    assert pq.clauses[0].kind == "term" and pq.clauses[0].text == "al*ha"
    pq = parse_query_string(r"alpha\~", filter_fields=FIELDS)
    assert pq.clauses[0].kind == "term" and pq.clauses[0].text == "alpha~"
    pq = parse_query_string(r"al*ha", filter_fields=FIELDS)
    assert pq.clauses[0].kind == "wildcard"


def test_escaped_colon_is_not_a_filter():
    pq = parse_query_string(r"std\:\:vector", filter_fields=FIELDS)
    assert pq.filters is None
    assert pq.clauses[0].kind == "term"
    assert pq.clauses[0].text == "std::vector"
    # filter values may carry escaped specials
    pq = parse_query_string(r"path:a\*b", filter_fields=FIELDS)
    assert pq.filters == {"path": "a*b"} and not pq.clauses


def test_escaped_paren_executes_like_plain_term(eng):
    """End-to-end: the escaped form scores identically to the analyzed
    bare term (punctuation is analyzer-stripped either way)."""
    a = execute_query_string(eng, r"alpha\(\)", k=10, as_pandas=True)
    b = execute_query_string(eng, "alpha", k=10, as_pandas=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()


def test_group_depth_cap_is_a_parse_error():
    """Adversarial nesting must be a ValueError (gateway 400), not a
    RecursionError from inside the execution combiner (gateway 500)."""
    deep = "(" * 40 + "alpha" + ")" * 40
    with pytest.raises(ValueError, match="nested deeper"):
        parse_query_string(deep, filter_fields=FIELDS)
    # a reasonable nest still parses
    ok = "(" * 8 + "alpha" + ")" * 8
    assert parse_query_string(ok, filter_fields=FIELDS).clauses
