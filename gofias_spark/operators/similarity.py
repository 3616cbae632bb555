"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH-bucketed variant as the scale path (candidates drop from N to bucket
size; recall tunable via number of bits/tables).

All arithmetic is float64 JVM expressions (zip_with + aggregate) — no Python
in the scoring path. The LSH signature is computed from deterministic
pseudo-random hyperplanes derived via xxhash64(dim, bit), so results are
reproducible without shipping a planes matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.
    One scan + TakeOrderedAndProject; embarrassingly parallel."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    sim = _dot(v, q) / (_norm(v) * _norm(q))
    out = (
        vectors.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
    if round_to is not None:
        out = out.select(id_col, F.round("cosine", round_to).alias("cosine"))
    return out


def _rhp_signature(vec_col, dims: int, bits: int):
    """Random-hyperplane signature: bit j = sign(sum_i plane[j][i]*v[i]),
    plane[j][i] = a deterministic pseudo-gaussian from xxhash64(i, j)."""
    v = _as_double(vec_col)

    def plane_component(i, j):
        h = F.xxhash64(F.lit(i), F.lit(j))
        # map int64 hash to (-0.5, 0.5): enough for a sign test
        return (h.cast("double") / F.lit(float(2**64))).cast("double")

    sig = F.lit(0).cast("long")
    for j in range(bits):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.array(*[plane_component(i, j) for i in range(dims)]),
                lambda x, p: x * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def ann_lsh_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: restrict the exact cosine scan to the query's LSH
    bucket (equal signature). At scale the signature is a partition/bucket
    key, making the probe a partition-pruned scan instead of a full pass."""
    dims = len(query_vec)
    with_sig = vectors.withColumn(
        "_sig", _rhp_signature(F.col(vec_col), dims, bits)
    )
    qdf = vectors.sparkSession.createDataFrame(
        [(query_vec,)], schema=f"{vec_col} array<double>"
    )
    qsig = qdf.select(
        _rhp_signature(F.col(vec_col), dims, bits).alias("s")
    ).collect()[0]["s"]
    bucket = with_sig.filter(F.col("_sig") == qsig).drop("_sig")
    return cosine_topk(bucket, query_vec, k, id_col, vec_col)


def embedding_neardup_pairs(
    vectors: DataFrame,
    top_pairs: int = 20,
    threshold: float | None = None,
    bits: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b), most-similar first.

    ``bits=None`` — exact all-pairs baseline (oracle-checkable): self-join on
    a < b, cosine via JVM zip_with/aggregate, top ``top_pairs`` by
    (cosine desc, a, b).
    ``bits=k`` — the scale path: candidates restricted to equal random-
    hyperplane LSH signatures (bucket equi-join instead of a cross join; at
    web scale the bucket is a shuffle key, cost linear in bucket sizes).
    ``threshold`` additionally filters pairs to cosine >= threshold.
    """
    left = vectors.select(
        F.col(id_col).alias("a"), _as_double(F.col(vec_col)).alias("_va")
    )
    right = vectors.select(
        F.col(id_col).alias("b"), _as_double(F.col(vec_col)).alias("_vb")
    )
    if bits:
        dims = len(vectors.select(vec_col).first()[0])
        sig_l = vectors.select(
            F.col(id_col).alias("a"),
            _rhp_signature(F.col(vec_col), dims, bits).alias("_sig"),
        )
        sig_r = sig_l.select(
            F.col("a").alias("b"), F.col("_sig")
        )
        pairs = (
            left.join(sig_l, "a")
            .join(sig_r.join(right, "b"), "_sig")
            .filter(F.col("a") < F.col("b"))
            .drop("_sig")
        )
    else:
        pairs = left.crossJoin(right).filter(F.col("a") < F.col("b"))
    cos = (
        _dot(F.col("_va"), F.col("_vb"))
        / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    ).alias("cosine")
    out = pairs.select("a", "b", cos)
    if threshold is not None:
        out = out.filter(F.col("cosine") >= threshold)
    out = out.orderBy(F.desc("cosine"), F.asc("a"), F.asc("b")).limit(top_pairs)
    if round_to is not None:
        out = out.select(
            "a", "b", F.round("cosine", round_to).alias("cosine")
        )
    return out


def ivf_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate NN: coarse-quantize every vector to its nearest
    centroid (centroids = the first ``n_centroids`` vectors by id —
    deterministic, no training loop), then scan only the ``n_probe``
    centroid cells nearest to the query.

    Scale shape: the assignment is a broadcast join + max_by (one pass);
    cells are a partition/bucket key, so a query probes n_probe partitions
    instead of the full table. Approximate — verified rows-only.
    """
    spark = vectors.sparkSession
    cents = (
        vectors.orderBy(F.asc(id_col)).limit(n_centroids)
        .select(
            F.col(id_col).alias("_cid"), _as_double(F.col(vec_col)).alias("_cv")
        )
    )
    v = vectors.select(
        F.col(id_col), F.col(vec_col), _as_double(F.col(vec_col)).alias("_v")
    )
    sim = _dot(F.col("_v"), F.col("_cv")) / (
        _norm(F.col("_v")) * _norm(F.col("_cv"))
    )
    assigned = (
        v.crossJoin(F.broadcast(cents))
        .withColumn("_sim", sim)
        .groupBy(id_col, vec_col)
        .agg(F.max_by("_cid", "_sim").alias("_cell"))
    )
    # driver-side: rank centroids for the query (n_centroids rows)
    import math

    crows = cents.collect()
    def cosine_local(u, w):
        d = sum(x * y for x, y in zip(u, w))
        nu = math.sqrt(sum(x * x for x in u)) or 1.0
        nw = math.sqrt(sum(x * x for x in w)) or 1.0
        return d / (nu * nw)
    ranked = sorted(
        crows, key=lambda r: -cosine_local(query_vec, list(r["_cv"]))
    )
    probe = [r["_cid"] for r in ranked[:n_probe]]
    cand = assigned.filter(F.col("_cell").isin(probe)).select(id_col, vec_col)
    return cosine_topk(cand, query_vec, k, id_col, vec_col, round_to=4)
