"""Range predicates (F4) + multi-key attribute sort (O1-O3): local and
distributed paths must agree with each other and with a pandas-computed
expectation (reference semantics: elasticAddressRepository.go:521-530 range
compilation; :489-493 ao_level asc -> _score desc -> tie sort)."""

import numpy as np
import pandas as pd
import pytest

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

CFG = IndexConfig(n_buckets=5, block_size=16)
N_DOCS = 300


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sortidx"))
    build_segment(spark, synth_corpus(spark, N_DOCS), root, CFG)
    dist = SearchEngine(spark, root)       # distributed plans
    local = SearchEngine(spark, root)
    local.warm()                           # driver-side searcher
    assert local._local_blocks is not None
    meta = dist.doc_meta.select(
        "doc_id", "lang", "doclen", "path"
    ).toPandas()
    return dist, local, meta


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_range_filter_paths_agree(engines):
    dist, local, meta = engines
    f = {"doclen": {"gte": 100, "lt": 400}}
    a = _ids(dist.search("common_util", k=10, filters=f))
    b = _ids(local.search("common_util", k=10, filters=f))
    assert a == b and len(a) > 0
    ok = set(
        meta[(meta["doclen"] >= 100) & (meta["doclen"] < 400)]["doc_id"]
    )
    assert all(i in ok for i in a)


def test_range_filter_count(engines):
    dist, local, meta = engines
    f = {"doclen": {"gte": 100, "lt": 400}}
    expected = int(
        ((meta["doclen"] >= 100) & (meta["doclen"] < 400)).sum()
    )
    assert dist.count(filters=f) == expected
    assert local.count(filters=f) == expected


def test_neq_and_in_compose(engines):
    dist, _, meta = engines
    f = {"lang": {"neq": "py"}}
    rows = dist.search("common_util", k=10, filters=f).collect()
    assert len(rows) > 0 and all(r["lang"] != "py" for r in rows)


def test_sort_by_attribute_first(engines):
    dist, local, _ = engines
    sort = [("lang", "asc"), ("_score", "desc")]
    a = dist.search("common_util", k=8, sort_by=sort).collect()
    b = local.search("common_util", k=8, sort_by=sort).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    keys = [(r["lang"], -r["score"], r["doc_id"]) for r in a]
    assert keys == sorted(keys), "result not in composite order"


def test_sort_by_is_global_topk_not_page_resort(engines):
    """The composite heap must consider ALL matches, not re-sort the
    score-ranked top page: with lang asc primary, the k results must be the
    globally smallest langs among matching docs."""
    dist, _, meta = engines
    sort = [("lang", "asc"), ("_score", "desc")]
    rows = dist.search("common_util", k=5, sort_by=sort).collect()
    n_match = dist.count("common_util")
    assert n_match > 5
    match_ids = {
        r["doc_id"] for r in dist.search("common_util", k=n_match).collect()
    }
    langs = meta[meta["doc_id"].isin(match_ids)]["lang"]
    smallest = sorted(langs)[:5]
    assert sorted(r["lang"] for r in rows) == smallest


def test_sort_by_with_filter_and_offset(engines):
    dist, local, _ = engines
    sort = [("lang", "desc"), ("_score", "desc")]
    f = {"lang": ["py", "go", "md"]}
    full = dist.search("common_util", k=6, sort_by=sort, filters=f).collect()
    page = dist.search(
        "common_util", k=3, offset=3, sort_by=sort, filters=f
    ).collect()
    assert [r["doc_id"] for r in page] == [r["doc_id"] for r in full[3:]]
    lb = local.search(
        "common_util", k=3, offset=3, sort_by=sort, filters=f
    ).collect()
    assert [r["doc_id"] for r in lb] == [r["doc_id"] for r in page]


def test_impossible_filter_short_circuits(engines):
    """F7 short-circuit analogue: an empty IN-list can never match — the
    engine returns empty/0 without running a Spark job (the reference's
    house repo returns early for disqualifying filters,
    elasticHouseRepository.go:371-402)."""
    dist, local, _ = engines
    f = {"lang": []}
    assert dist.search("common_util", k=5, filters=f).count() == 0
    assert local.search("common_util", k=5, filters=f).count() == 0
    assert dist.count("common_util", filters=f) == 0
    assert dist.count(filters=f) == 0


def test_unknown_sort_field_raises(engines):
    dist, _, _ = engines
    with pytest.raises(ValueError, match="unknown sort field"):
        dist.search("common_util", k=3, sort_by=[("nope", "asc")])


def test_sort_null_attrs_consistent_across_paths(spark, tmp_path):
    """Nullable sort attributes: page membership AND presentation order must
    agree between the distributed composite-top-k path and the driver-side
    searcher, with nulls LAST in all stages (ADVICE r02 medium: F.asc put
    nulls first in the global merge while the kernels used na_position=last,
    so the two paths returned different pages)."""
    from pyspark.sql import functions as F

    docs = synth_corpus(spark, 120).withColumn(
        "lang",
        F.when(F.crc32(F.col("path")) % 3 == 0, F.col("lang")),
    )
    n_null = docs.filter(F.col("lang").isNull()).count()
    assert 0 < n_null < 120, "fixture must mix null and non-null langs"
    root = str(tmp_path / "nullidx")
    build_segment(spark, docs, root, CFG)
    dist = SearchEngine(spark, root)
    assert dist._local_blocks is None
    local = SearchEngine(spark, root)
    local.warm()
    assert local._local_blocks is not None
    for sort in (
        [("lang", "asc"), ("_score", "desc")],
        [("lang", "desc"), ("_score", "desc")],
    ):
        # k spans past the non-null langs so nulls are in-page
        a = dist.search("common_util", k=50, sort_by=sort).collect()
        b = local.search("common_util", k=50, sort_by=sort).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b], sort
        langs = [r["lang"] for r in a]
        assert len(a) > 0 and None in langs
        seen_null = False
        for lang in langs:
            if lang is None:
                seen_null = True
            else:
                assert not seen_null, f"null sorted before non-null ({sort})"


def test_mistyped_range_operand_raises_on_every_route(engines):
    """A range operand whose Python type does not match the column fails
    LOUDLY and identically everywhere: the Spark path would silently cast
    (string col vs int literal -> null -> all rows dropped) while the
    pandas evaluator either TypeErrors (gte) or keeps every row (neq) —
    divergent results for the same request (ADVICE-class, r3 review)."""
    dist, local, _ = engines
    for eng in (dist, local):
        with pytest.raises(ValueError, match="does not match column type"):
            eng.search("common_util", k=5, filters={"commit": {"gte": 5}})
        with pytest.raises(ValueError, match="does not match column type"):
            eng.search("common_util", k=5, filters={"doclen": {"lt": "x"}})
        with pytest.raises(ValueError, match="does not match column type"):
            eng.count("common_util", filters={"lang": {"neq": 123}})
        with pytest.raises(ValueError, match="unknown filter field"):
            eng.search("common_util", k=5, filters={"nofield": {"gte": 1}})
    # bool is not an acceptable stand-in for a numeric operand
    with pytest.raises(ValueError, match="does not match column type"):
        dist.search_many(["common_util"], filters={"doclen": {"gte": True}})
    # correctly-typed operands still flow
    assert dist.count("common_util", filters={"doclen": {"gte": 0}}) > 0
