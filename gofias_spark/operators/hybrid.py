"""Hybrid lexical + vector retrieval with reciprocal-rank fusion (RRF).

The training-data / RAG-pipeline retrieval shape the reference delegates to
Elasticsearch's ``rrf`` rank feature (ES 8.x ``retriever.rrf``): run a BM25
branch and an embedding-cosine branch, convert each to ranks, and fuse with

    rrf(d) = sum_branches 1 / (rrf_k + rank_branch(d))

(Cormack, Clarke & Buettcher, SIGIR 2009; rrf_k=60 is the conventional
constant). Fusion needs only the two top-``k_each`` lists — never the
corpora — so at 100 TB the cost profile is exactly the branches': the BM25
branch is the engine's term-pruned top-k, the vector branch is a pluggable
(id, score) frame — brute-force cosine (one scan + TakeOrderedAndProject),
or the LSH/IVF ANN operators in :mod:`gofias_spark.operators.similarity`
for the scale path. Both branches end as <= k_each rows, the union +
groupBy is driver-trivial, and nothing here shuffles anything bigger.

Determinism contract (oracle-checked in ``hybrid_rrf_top10``): each branch
ranks by (score desc, id asc) with scores pre-rounded via ``round_to``, so
rank assignment — and therefore the fused output — is reproducible across
engines (the DuckDB oracle re-derives both branches in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_ranked", "rrf_fuse", "hybrid_topk"]


def top_ranked(
    df: DataFrame,
    score_col: str,
    id_col: str,
    k: int,
    round_to: int | None = None,
) -> DataFrame:
    """(id, rank) of the top-``k`` rows by (score desc, id asc), rank
    1-based. The top-k cut is ``orderBy().limit()`` (plans as
    TakeOrderedAndProject — no global sort exchange); row_number then runs
    on the k-row survivor frame, where a single-partition window is free."""
    s = F.col(score_col)
    if round_to is not None:
        s = F.round(s, round_to)
    cut = (
        df.select(F.col(id_col), s.alias("_s"))
        .orderBy(F.desc("_s"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("_s"), F.asc(id_col))
    return cut.select(
        F.col(id_col), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    branches: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Fuse (id, rank) branch frames into ``(id_col, rrf)`` top-``k``.
    Missing-from-a-branch contributes 0 (the standard RRF convention).
    Input frames are top-k lists (tiny); union + groupBy + top-k is
    cheap at any corpus scale."""
    if not branches:
        raise ValueError("need at least one ranked branch")
    parts = [
        b.select(
            F.col(b.columns[0]).alias(id_col),
            (1.0 / (F.lit(float(rrf_k)) + F.col("rank"))).alias("_c"),
        )
        for b in branches
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    rrf = F.sum("_c")
    if round_to is not None:
        rrf = F.round(rrf, round_to)
    return (
        u.groupBy(id_col)
        .agg(rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def hybrid_topk(
    lexical: DataFrame,
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cos_round: int = 6,
) -> DataFrame:
    """BM25 + brute-force-cosine hybrid top-``k``. ``lexical`` is any
    ``(doc_id, score)`` frame in the SAME id space as ``vectors[id_col]``
    (callers own the mapping from engine-internal doc ids to corpus ids —
    the driver fixture casts the engine's ``path`` back to the corpus
    doc_id). For the web-scale vector branch swap cosine for
    ``similarity.ann_lsh_topk`` / ``ivf_topk`` and fuse with
    :func:`rrf_fuse` directly."""
    from gofias_spark.operators.similarity import cosine_topk

    lex_ranked = top_ranked(lexical, "score", "doc_id", k_each)
    cos = cosine_topk(
        vectors, query_vec, k=k_each, id_col=id_col, vec_col=vec_col
    )
    cos_ranked = top_ranked(cos, "cosine", id_col, k_each,
                            round_to=cos_round)
    return rrf_fuse([lex_ranked, cos_ranked], k=k, rrf_k=rrf_k)
