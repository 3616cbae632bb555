"""Naive DataFrame-only BM25 — SURVEY.md §7 M2, the semantics-proving slice.

No custom kernels, no Python at all: tokenization via JVM ``split``/``filter``
(whole-stage codegen), tf/df/avgdl via groupBy aggregations, scoring via
column arithmetic, top-k via orderBy+limit (TakeOrderedAndProject). Exact
same BM25 spec as the block-max kernel — used as a differential check against
it and as the JVM-expressible form for SQL-oracle parity.

Scale note: this plan shuffles token-level rows (groupBy doc/term) — fine for
ad-hoc scoring of a corpus, but the indexed engine (index/build.py +
query/engine.py) is the scale path: it pays that cost once at build time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofias_spark.config import BM25Params

# JVM-side equivalent of the standard analyzer (Python re ``\w`` matches
# unicode alphanumerics per str.isalnum — categories L*, Nd, Nl, No — plus
# underscore): split on runs of everything else after lowercasing.
SPLIT_PATTERN = r"[^\p{L}\p{Nd}\p{Nl}\p{No}_]+"


def tokens_col(text_col, pattern: str = SPLIT_PATTERN):
    return F.filter(
        F.split(F.lower(text_col), pattern), lambda t: t != F.lit("")
    )


def naive_bm25(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "content",
    mode: str = "and",
    params: BM25Params | None = None,
    offset: int = 0,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k BM25 over any (id, text) DataFrame. Returns (id, score)."""
    p = params or BM25Params()
    if not query_terms:
        return docs.sparkSession.createDataFrame(
            [], schema=f"{id_col} long, score double"
        ).limit(0)
    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    )
    dl = toks.select(id_col, F.size("_toks").alias("dl"))
    long = toks.select(id_col, F.explode("_toks").alias("term"))
    tf = long.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qtf = (
        tf.filter(F.col("term").isin(query_terms))
        .join(F.broadcast(df), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (
        F.col("tf")
        * (p.k1 + 1.0)
        / (
            F.col("tf")
            + p.k1 * (1.0 - p.b + p.b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = qtf.withColumn("contrib", idf * tfn).groupBy(id_col).agg(
        F.sum("contrib").alias("score"),
        F.count("*").alias("_matched"),
    )
    if mode == "and":
        scored = scored.filter(F.col("_matched") == len(set(query_terms)))
    out = scored.select(id_col, "score").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    if offset:
        out = out.offset(offset)
    out = out.limit(k)
    if round_to is not None:
        out = out.select(
            id_col, F.round("score", round_to).alias("score")
        )
    return out
