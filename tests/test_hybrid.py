"""Hybrid retrieval (RRF fusion): hand-computed fusion arithmetic, rank
tie-breaks, missing-branch convention, and plan shape of the branches."""

import pytest
from pyspark.sql import functions as F

from gofias_spark.operators.hybrid import hybrid_topk, rrf_fuse, top_ranked
from gofias_spark.operators.similarity import cosine_topk
from gofias_spark.plans import checks as C


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_hand_computed(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(2, 1), (1, 2), (4, 3)])
    out = {r["doc_id"]: r["rrf"]
           for r in rrf_fuse([a, b], k=10, rrf_k=60).collect()}
    assert out[1] == pytest.approx(round(1 / 61 + 1 / 62, 6))
    assert out[2] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert out[3] == pytest.approx(round(1 / 63, 6))  # missing from b -> 0
    assert out[4] == pytest.approx(round(1 / 63, 6))


def test_rrf_order_and_tiebreak(spark):
    a = _ranked(spark, [(5, 1), (9, 2)])
    b = _ranked(spark, [(9, 1), (5, 2)])
    rows = rrf_fuse([a, b], k=10).collect()
    # identical fused scores -> doc_id asc
    assert [r["doc_id"] for r in rows] == [5, 9]
    assert rows[0]["rrf"] == rows[1]["rrf"]


def test_top_ranked_rounding_and_ties(spark):
    df = spark.createDataFrame(
        [(1, 0.5000004), (2, 0.5), (3, 0.9), (4, 0.1)],
        "vec_id long, cosine double",
    )
    got = {r["vec_id"]: r["rank"]
           for r in top_ranked(df, "cosine", "vec_id", 3,
                               round_to=6).collect()}
    # 0.5000004 rounds to 0.5 -> ties with doc 2, broken by id asc
    assert got == {3: 1, 1: 2, 2: 3}


def test_hybrid_topk_end_to_end(spark):
    lex = spark.createDataFrame(
        [(0, 2.0), (1, 1.5), (2, 1.0)], "doc_id long, score double"
    )
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
         (3, [1.0, 0.01])],
        "vec_id long, embedding array<double>",
    )
    rows = hybrid_topk(lex, vecs, [1.0, 0.0], k=4, k_each=3).collect()
    got = {r["doc_id"]: r["rrf"] for r in rows}
    # vector ranks: 0 (cos 1.0), 3, 1; lexical ranks: 0, 1, 2
    assert got[0] == pytest.approx(round(1 / 61 + 1 / 61, 6))
    assert got[1] == pytest.approx(round(1 / 62 + 1 / 63, 6))
    assert got[2] == pytest.approx(round(1 / 63, 6))
    assert got[3] == pytest.approx(round(1 / 62, 6))
    assert [r["doc_id"] for r in rows] == [0, 1, 3, 2]


def test_vector_branch_plan_is_takeordered(spark):
    """The cosine cut must plan as TakeOrderedAndProject (no global sort
    exchange over the vector table) — the property that keeps the
    brute-force branch a single scan at scale."""
    vecs = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(7), F.rand(8)).alias("embedding"),
    )
    plan = C.physical_plan(cosine_topk(vecs, [1.0, 0.0], k=5))
    assert "TakeOrderedAndProject" in plan, plan[:1500]
