"""N-gram language-model perplexity scoring — the CCNet/Gopher-style
quality signal the curation layer lacked (classifier_quality_score covers
the fastText shape; this covers the KenLM shape: docs whose token stream
is improbable under a reference-corpus LM are boilerplate/garbled/
off-domain and get filtered or importance-weighted).

Re-expressed Spark-first, no Python in the hot path:

* TRAIN: bigram + context counts are two map-side-combinable groupBys
  over the exploded token stream of the reference docs — the model is
  vocabulary²-bounded in theory but Zipf-sparse in practice (observed
  bigrams only).
* SCORE: each doc's bigrams stream through ONE join stage against the
  (broadcast) model and a map-side-combinable groupBy(doc) average —
  no shuffle of the corpus text, no UDF; p(w2|w1) uses add-alpha
  smoothing, so OOV bigrams cost -ln(alpha / (c1 + alpha*V)) instead of
  breaking the product.

Perplexity = exp(mean over bigrams of -ln p(w2|w1)) — lower is more
reference-like. Deterministic: counts and averages only.

No counterpart in the reference (gofias delegates relevance to ES); this
is from the LLM-pipeline brief, next to operators/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofias_spark.query.naive import tokens_col


def _bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair, one JVM expression
    tree (tokenize -> two aligned slices -> zip -> explode)."""
    toks = tokens_col(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("_t"))
    n = F.size("_t")
    pairs = F.arrays_zip(
        F.slice("_t", 1, n - 1), F.slice("_t", 2, n - 1)
    )
    return (
        base.filter(n >= 2)
        .select("id", F.explode(pairs).alias("p"))
        .select(
            "id",
            F.col("p").getField("0").alias("w1"),
            F.col("p").getField("1").alias("w2"),
        )
    )


def train_bigram_lm(
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the reference LM: returns ``(bigrams, contexts, vocab_size)``
    where ``bigrams`` is (w1, w2, c12), ``contexts`` is (w1, c1) with
    c1 = Σ_w2 c12 (bigram-context counts, so the conditional
    distribution sums to 1 under add-alpha smoothing), and
    ``vocab_size`` = distinct tokens in the reference stream.

    ``min_count`` prunes bigrams observed fewer times (KenLM-style
    singleton pruning): on a web-scale reference corpus the bigram table
    is dominated by hapax pairs that add memory, not signal — pruned
    pairs simply fall back to the smoothing floor at score time.
    Context counts stay UNPRUNED (they are the denominators; pruning
    them would inflate probabilities of surviving pairs)."""
    bg = _bigrams(ref_docs, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c12")
    )
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c12") >= float(min_count))
    contexts = bg.groupBy("w1").agg(
        F.count(F.lit(1)).cast("double").alias("c1")
    )
    vocab_size = (
        ref_docs.select(
            F.explode(tokens_col(F.col(text_col))).alias("t")
        )
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    return bigrams, contexts, int(vocab_size)


def perplexity_score(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "content",
    broadcast_model: bool | None = None,
) -> DataFrame:
    """Per-doc bigram perplexity under the trained LM:
    ``(id_col, ppl, n_bigrams)``, one row per doc with >= 2 tokens.

    p(w2|w1) = (c12 + alpha) / (c1 + alpha * V); unseen contexts and
    pairs coalesce to 0, so the formula degrades to the uniform-ish
    alpha/(alpha*V) floor instead of -inf.

    ``broadcast_model`` None (default) auto-sizes: the model sides get
    an explicit broadcast hint when the bigram table counts <= 5M rows
    (one cheap count on the already-aggregated model; the normal case —
    a curated reference corpus, optionally min_count-pruned). A larger
    model drops the hint so Catalyst plans a shuffle join instead of
    OOMing the driver — the corpus side then shuffles by (w1, w2),
    which is the correct plan at that scale. True/False force it."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    if broadcast_model is None:
        broadcast_model = bigrams.count() <= 5_000_000
    bg = _bigrams(docs, id_col, text_col)
    b_side = F.broadcast(bigrams) if broadcast_model else bigrams
    c_side = F.broadcast(contexts) if broadcast_model else contexts
    p = (
        F.coalesce(F.col("c12"), F.lit(0.0)) + F.lit(float(alpha))
    ) / (
        F.coalesce(F.col("c1"), F.lit(0.0))
        + F.lit(float(alpha) * vocab_size)
    )
    return (
        bg.join(b_side, ["w1", "w2"], "left")
        .join(c_side, ["w1"], "left")
        .withColumn("_nll", -F.log(p))
        .groupBy("id")
        .agg(
            F.exp(F.avg("_nll")).alias("ppl"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .select(F.col("id").alias(id_col), "ppl", "n_bigrams")
    )


def perplexity_filter(
    docs: DataFrame,
    ref_docs: DataFrame,
    max_ppl: float,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """One-call CCNet-style gate: train on ``ref_docs``, score ``docs``,
    keep rows whose perplexity is <= ``max_ppl`` (docs with < 2 tokens
    carry no signal and are kept, like ES's missing-field semantics)."""
    bigrams, contexts, v = train_bigram_lm(ref_docs, id_col, text_col)
    ppl = perplexity_score(
        docs, bigrams, contexts, v, alpha, id_col, text_col
    )
    return (
        docs.join(
            ppl.select(id_col, "ppl"), [id_col], "left"
        )
        .filter((F.col("ppl") <= max_ppl) | F.col("ppl").isNull())
        .drop("ppl")
    )
