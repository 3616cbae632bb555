"""Data selection for language-model training: DSIR importance
resampling (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") over hashed n-gram features.

Given a RAW corpus (big, e.g. CommonCrawl-scale) and a TARGET corpus
(small, the distribution you want more of), DSIR:

1. featurizes every doc as hashed word uni+bigram counts over ``dim``
   buckets,
2. fits two bag-of-buckets categorical models (Laplace-smoothed) — one
   per corpus,
3. scores each raw doc with the log importance weight
   ``sum_b c_b * (log p_target[b] - log p_raw[b])``,
4. resamples without replacement via the Gumbel top-k trick.

Scale shape (the whole point at 100 TB):

* Featurization is a per-row JVM expression (tokenize -> n-grams ->
  md5-bucket). No Python, no UDF.
* Model fitting is TWO bucket-count aggregations whose output is bounded
  by ``dim`` (thousands), not corpus size — map-side combinable
  explode->groupBy, collected to the driver as a dim-sized array.
* Scoring rides back as ONE array literal (dim float64s, ~64 KiB at
  dim=8192) folded over each doc's own gram array — zero joins, zero
  shuffles, column-pruned scan.
* Selection is deterministic: the Gumbel noise is seeded from the row id
  (same md5-unit convention as ``sampling.stratified_sample``), and the
  top-k threshold comes from one ``approxQuantile`` pass — identical
  output at any partitioning or cluster size.

No counterpart in the reference (gofias has no corpus-curation layer);
this extends the SURVEY §8 training-pipeline family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofias_spark.query.naive import tokens_col


def hashed_gram_buckets(text_col, dim: int = 8192):
    """Array of hashed-feature bucket ids (one per word unigram AND
    bigram, duplicates kept — they are the counts): ``bucket(g) =
    md5-uint32(g) % dim``. md5 (not xxhash64) so the identical bucket
    function is expressible in any SQL engine for oracles."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
            F.lit(dim),
        ).cast("int"),
    )


def _bucket_log_probs(
    docs: DataFrame, text_col: str, dim: int
) -> list[float]:
    """Laplace-smoothed log bucket probabilities of a corpus: ONE
    explode->groupBy whose output is <= dim rows, collected driver-side."""
    counts = (
        docs.select(
            F.explode(hashed_gram_buckets(F.col(text_col), dim)).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_bucket = {int(r["b"]): int(r["c"]) for r in counts}
    total = sum(by_bucket.values()) + dim  # +1 smoothing mass
    return [
        math.log((by_bucket.get(b, 0) + 1) / total) for b in range(dim)
    ]


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    dim: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Per-raw-doc DSIR log importance weight
    ``sum over the doc's grams of (log p_target[bucket] - log
    p_raw[bucket])`` (repeated grams count repeatedly — that IS the
    bag-of-buckets count vector). Returns ``(id_col, log_weight)`` with
    the weight rounded to 6 decimals; docs with zero grams weigh 0.0.

    Both bucket models are fitted here (two dim-bounded aggregations);
    the log-ratio vector rides the plan as ONE array literal, so scoring
    is a shuffle-free fold over each row's own gram array.
    """
    if dim < 2:
        raise ValueError("dim must be >= 2")
    lp_t = _bucket_log_probs(target, text_col, dim)
    lp_r = _bucket_log_probs(raw, text_col, dim)
    ratio = [round(t - r, 12) for t, r in zip(lp_t, lp_r)]
    ratio_lit = F.lit(ratio)  # single ArrayType literal, no codegen blowup
    buckets = hashed_gram_buckets(F.col(text_col), dim)
    lw = F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(ratio_lit, b + 1),
    )
    # null content -> null token array -> null fold; weigh it 0.0 like an
    # empty doc rather than dropping it to null
    return raw.select(
        F.col(id_col),
        F.round(F.coalesce(lw, F.lit(0.0)), 6).alias("log_weight"),
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    frac: float,
    dim: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Select ~``frac`` of the raw corpus by DSIR importance resampling
    without replacement (Gumbel top-k: keep the rows with the largest
    ``log_weight + Gumbel(id)``). The Gumbel noise is deterministic —
    ``-log(-log(u))`` with ``u = md5-unit(id)`` — so the same inputs
    select the same rows at any parallelism; the cut threshold is the
    (1-frac) quantile of the key from one ``approxQuantile`` pass
    (relative error 0.001), so selection is a filter, not a global sort.

    Returns the selected raw rows with ``log_weight`` and the selection
    key ``gumbel_key`` attached.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    weighted = dsir_log_weights(raw, target, dim, id_col, text_col)
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    # clamp away u=0 (gumbel -> inf); 1/2^32 floor keeps it finite
    u = F.greatest(u, F.lit(1.0 / (1 << 32)))
    keyed = weighted.withColumn(
        "gumbel_key", F.col("log_weight") - F.log(-F.log(u))
    )
    if frac >= 1.0:
        return raw.join(keyed, id_col)
    cut = keyed.approxQuantile("gumbel_key", [1.0 - frac], 0.001)[0]
    return raw.join(
        keyed.filter(F.col("gumbel_key") >= cut), id_col
    )
