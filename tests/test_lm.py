"""Bigram-LM perplexity (operators/lm.py): hand-computable smoothing
math, scale-correct plan shape (broadcast model, no corpus shuffle
before the per-doc agg), and the CCNet-style filter gate."""

import math

import pytest
from pyspark.sql import functions as F

from gofias_spark.operators.lm import (
    perplexity_filter,
    perplexity_score,
    train_bigram_lm,
)
from gofias_spark.plans import checks as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_perplexity_hand_computed(spark):
    """One training doc 'a b a b', scored doc 'a b': p(b|a) =
    (2 + 0.1) / (2 + 0.1 * V) with V = 2 -> ppl = 1/p."""
    train = _docs(spark, [(0, "a b a b")])
    bg, ctx, v = train_bigram_lm(train)
    assert v == 2
    got = {
        r["doc_id"]: r
        for r in perplexity_score(
            _docs(spark, [(1, "a b"), (2, "b a"), (3, "z z")]),
            bg, ctx, v, alpha=0.1,
        ).collect()
    }
    # train bigrams: (a,b) x2, (b,a) x1; contexts: a->2, b->1
    p_ab = (2 + 0.1) / (2 + 0.1 * 2)
    p_ba = (1 + 0.1) / (1 + 0.1 * 2)
    p_zz = 0.1 / (0 + 0.1 * 2)  # fully unseen
    assert got[1]["ppl"] == pytest.approx(1 / p_ab, rel=1e-12)
    assert got[2]["ppl"] == pytest.approx(1 / p_ba, rel=1e-12)
    assert got[3]["ppl"] == pytest.approx(1 / p_zz, rel=1e-12)
    assert got[1]["n_bigrams"] == 1


def test_perplexity_mean_over_bigrams(spark):
    train = _docs(spark, [(0, "a b c")])
    bg, ctx, v = train_bigram_lm(train)  # (a,b), (b,c); V=3
    got = perplexity_score(
        _docs(spark, [(1, "a b c")]), bg, ctx, v, alpha=0.5
    ).collect()[0]
    p1 = (1 + 0.5) / (1 + 0.5 * 3)
    p2 = (1 + 0.5) / (1 + 0.5 * 3)
    want = math.exp(-(math.log(p1) + math.log(p2)) / 2)
    assert got["ppl"] == pytest.approx(want, rel=1e-12)
    assert got["n_bigrams"] == 2


def test_single_token_docs_carry_no_signal(spark):
    train = _docs(spark, [(0, "a b")])
    bg, ctx, v = train_bigram_lm(train)
    out = perplexity_score(
        _docs(spark, [(1, "a"), (2, "")]), bg, ctx, v
    ).collect()
    assert out == []  # no bigrams -> no row
    kept = perplexity_filter(
        _docs(spark, [(1, "a"), (2, "a b")]),
        train, max_ppl=1e9,
    )
    assert kept.count() == 2  # signal-less docs pass the gate


def test_reference_docs_score_lower_than_garbage(spark):
    ref = _docs(spark, [
        (i, "def load_config path return parse file " * 3)
        for i in range(5)
    ])
    bg, ctx, v = train_bigram_lm(ref)
    scored = {
        r["doc_id"]: r["ppl"]
        for r in perplexity_score(
            _docs(spark, [
                (100, "def load_config path return parse file"),
                (101, "zq xv qqj wmf kpl zzt"),
            ]),
            bg, ctx, v,
        ).collect()
    }
    assert scored[100] < scored[101]


def test_score_plan_broadcasts_model_and_keeps_agg_partial(spark):
    """Scale shape: the model sides broadcast (vocabulary-sized), the
    per-doc average is map-side combinable, and the only Exchange after
    the corpus scan is the groupBy(id) partials."""
    train = _docs(spark, [(i, "a b c d e a b") for i in range(20)])
    bg, ctx, v = train_bigram_lm(train)
    out = perplexity_score(train, bg, ctx, v)
    plan = C.physical_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_avg" in plan.lower() or "partial avg" in plan.lower() \
        or "partial" in plan.lower()


def test_filter_gate(spark):
    train = _docs(spark, [(0, "a b a b a b")])
    docs = _docs(spark, [(1, "a b a b"), (2, "q r s t")])
    # V=2 puts the unseen-bigram floor at p=1/V=0.5 -> garbage ppl 2.0;
    # the in-domain doc sits near 1.04
    kept = perplexity_filter(docs, train, max_ppl=1.5)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    bg, ctx, v = train_bigram_lm(train)
    with pytest.raises(ValueError):
        perplexity_score(docs, bg, ctx, v, alpha=0.0)


def test_min_count_pruning_floors_pruned_pairs(spark):
    """Pruned bigrams score at the smoothing floor; contexts stay
    unpruned so surviving pairs keep their true denominators."""
    # bigrams: (a,b),(b,a),(a,b),(b,a),(a,c) -> (a,b)x2 (b,a)x2 (a,c)x1
    train = _docs(spark, [(0, "a b a b a c")])
    bg, ctx, v = train_bigram_lm(train, min_count=2)
    assert {(r["w1"], r["w2"]) for r in bg.collect()} == {
        ("a", "b"), ("b", "a")
    }
    ctx_map = {r["w1"]: r["c1"] for r in ctx.collect()}
    assert ctx_map == {"a": 3.0, "b": 2.0}  # unpruned denominators
    got = {r["doc_id"]: r["ppl"] for r in perplexity_score(
        _docs(spark, [(1, "a c")]), bg, ctx, v).collect()}
    # (a,c) pruned -> floor: (0+0.1)/(3+0.1*3)
    assert got[1] == pytest.approx((3 + 0.3) / 0.1, rel=1e-12)


def test_large_model_skips_broadcast_hint(spark):
    train = _docs(spark, [(0, "a b c d")])
    bg, ctx, v = train_bigram_lm(train)
    out = perplexity_score(train, bg, ctx, v, broadcast_model=False)
    plan = C.physical_plan(out)
    assert "BroadcastHashJoin" not in plan or "SortMergeJoin" in plan
    # results identical either way
    a = {r["doc_id"]: round(r["ppl"], 9) for r in out.collect()}
    b = {r["doc_id"]: round(r["ppl"], 9) for r in perplexity_score(
        train, bg, ctx, v, broadcast_model=True).collect()}
    assert a == b
