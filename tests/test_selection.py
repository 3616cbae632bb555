"""DSIR importance resampling — brute-force oracle + determinism and
selection-quality invariants."""

import hashlib
import math
import random
import re

import pytest

from gofias_spark.operators.selection import (
    dsir_log_weights,
    dsir_sample,
    hashed_gram_buckets,
)

DIM = 512


def _tokens(text):
    return [t for t in re.split(r"[^\w]+", (text or "").lower()) if t]


def _grams(text):
    tk = _tokens(text)
    return tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]


def _bucket(g, dim=DIM):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dim


def brute_log_probs(rows, dim=DIM):
    counts = {}
    for _, t in rows:
        for g in _grams(t):
            b = _bucket(g, dim)
            counts[b] = counts.get(b, 0) + 1
    total = sum(counts.values()) + dim
    return [math.log((counts.get(b, 0) + 1) / total) for b in range(dim)]


def brute_weights(raw_rows, tgt_rows, dim=DIM):
    lp_t = brute_log_probs(tgt_rows, dim)
    lp_r = brute_log_probs(raw_rows, dim)
    ratio = [round(t - r, 12) for t, r in zip(lp_t, lp_r)]
    out = {}
    for i, t in raw_rows:
        acc = 0.0
        for g in _grams(t):
            acc += ratio[_bucket(g, dim)]
        out[i] = round(acc, 6)
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(11)
    common = [f"c{j}" for j in range(30)]
    targety = [f"t{j}" for j in range(10)]
    # DSIR log weights are length-additive (sum over grams), so the
    # fixture holds doc length FIXED at 25 tokens to isolate the content
    # signal: targety docs swap their last 10 common tokens for target
    # vocabulary, everything else identical in shape.
    raw_rows = []
    for i in range(80):
        words = [rng.choice(common) for _ in range(25)]
        if i % 4 == 0:  # a quarter of raw docs lean toward the target
            words[15:] = [rng.choice(targety) for _ in range(10)]
        raw_rows.append((i, " ".join(words)))
    tgt_rows = [
        (1000 + i, " ".join(rng.choice(targety) for _ in range(15)))
        for i in range(20)
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, content string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, content string")
    return raw.repartition(5), tgt, raw_rows, tgt_rows


def test_weights_match_bruteforce(spark, corpora):
    raw, tgt, raw_rows, tgt_rows = corpora
    got = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(raw, tgt, dim=DIM).collect()
    }
    want = brute_weights(raw_rows, tgt_rows)
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-6), i


def test_targety_docs_outweigh_plain_docs(spark, corpora):
    raw, tgt, raw_rows, _ = corpora
    got = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(raw, tgt, dim=DIM).collect()
    }
    targety = [w for i, w in got.items() if i % 4 == 0 and _tokens(
        dict(raw_rows)[i])]
    plain = [w for i, w in got.items() if i % 4 != 0 and _tokens(
        dict(raw_rows)[i])]
    assert min(targety) > max(plain)


def test_empty_doc_weighs_zero(spark, corpora):
    _, tgt, _, _ = corpora
    df = tgt.sparkSession.createDataFrame(
        [(0, ""), (1, None)], "doc_id long, content string"
    )
    got = {r.doc_id: r.log_weight
           for r in dsir_log_weights(df, tgt, dim=DIM).collect()}
    assert got == {0: 0.0, 1: 0.0}


def test_sample_deterministic_across_partitioning(spark, corpora):
    raw, tgt, _, _ = corpora
    a = sorted(
        r.doc_id
        for r in dsir_sample(raw.coalesce(1), tgt, frac=0.3, dim=DIM)
        .collect()
    )
    b = sorted(
        r.doc_id
        for r in dsir_sample(raw.repartition(13), tgt, frac=0.3, dim=DIM)
        .collect()
    )
    assert a == b
    assert 0 < len(a) < 80


def test_sample_prefers_high_weight_docs(spark, corpora):
    raw, tgt, raw_rows, _ = corpora
    picked = {
        r.doc_id
        for r in dsir_sample(raw, tgt, frac=0.25, dim=DIM).collect()
    }
    targety = {i for i, t in raw_rows if i % 4 == 0 and _tokens(t)}
    # Gumbel noise is O(1); the planted weight gap is >> 1, so the
    # selected quarter should be dominated by the target-leaning quarter
    assert len(picked & targety) >= 0.8 * len(picked)


def test_sample_frac_one_keeps_everything(spark, corpora):
    raw, tgt, raw_rows, _ = corpora
    out = dsir_sample(raw, tgt, frac=1.0, dim=DIM)
    assert out.count() == len(raw_rows)
    assert {"doc_id", "content", "log_weight", "gumbel_key"} <= set(
        out.columns
    )


def test_bad_params(spark, corpora):
    raw, tgt, _, _ = corpora
    with pytest.raises(ValueError):
        dsir_sample(raw, tgt, frac=0.0)
    with pytest.raises(ValueError):
        dsir_log_weights(raw, tgt, dim=1)


def test_bucket_function_matches_python(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma")], "doc_id long, content string"
    )
    from pyspark.sql import functions as F

    got = df.select(
        hashed_gram_buckets(F.col("content"), 64).alias("b")
    ).collect()[0].b
    want = [_bucket(g, 64) for g in _grams("alpha beta gamma")]
    assert got == want
