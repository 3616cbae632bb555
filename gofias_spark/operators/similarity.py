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
