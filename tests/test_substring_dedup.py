"""Span-level exact-substring dedup (duplicate_spans / strip) and the
linear quality classifier — brute-force pandas oracles + invariants.

The reference has no counterpart (gofias delegates nothing like this);
these are the training-data curation extensions (Lee et al. 2022 style
substring dedup; fastText/CCNet-style classifier filtering).
"""

import math
import random
import re

import pytest

from gofias_spark.operators.dedup import (
    duplicate_spans,
    strip_duplicate_spans,
)
from gofias_spark.operators.textstats import classifier_quality_score

WORD = re.compile(r"[^\W]+", re.UNICODE)


def _toks(text):
    return re.split(r"[^\w]+", text.lower())


def _tokens(text):
    return [t for t in re.split(r"[^\w]+", text.lower()) if t]


def brute_spans(rows, n):
    """Pure-Python oracle: gram -> sorted sites; every non-canonical site
    of a multi-site gram marks [pos, pos+n-1]; merge overlapping marks."""
    sites = {}
    toks = {i: _tokens(t) for i, t in rows}
    for i, _ in rows:
        tk = toks[i]
        for p in range(len(tk) - n + 1):
            sites.setdefault(" ".join(tk[p : p + n]), []).append((i, p))
    marks = {}
    for g, ss in sites.items():
        if len(ss) > 1:
            ss = sorted(ss)
            for (i, p) in ss[1:]:
                marks.setdefault(i, []).append(p)
    out = []
    for i, ps in marks.items():
        ps = sorted(ps)
        s, e = ps[0], ps[0] + n - 1
        for p in ps[1:]:
            if p <= e:
                e = max(e, p + n - 1)
            else:
                out.append((i, s, e))
                s, e = p, p + n - 1
        out.append((i, s, e))
    return sorted(out)


@pytest.fixture(scope="module")
def corpus_rows():
    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(60):
        n_tok = rng.randint(0, 30)
        words = [rng.choice(vocab) for _ in range(n_tok)]
        rows.append((i, " ".join(words)))
    # plant an exact 12-token span shared by three docs
    span = " ".join(f"planted{j}" for j in range(12))
    rows[5] = (5, rows[5][1] + " " + span)
    rows[17] = (17, span + " " + rows[17][1])
    rows[33] = (33, rows[33][1][: len(rows[33][1]) // 2] + " " + span)
    return rows


@pytest.fixture(scope="module")
def corpus(spark, corpus_rows):
    df = spark.createDataFrame(corpus_rows, "doc_id long, content string")
    df = df.repartition(7).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("n", [3, 5, 12])
def test_spans_match_bruteforce(spark, corpus, corpus_rows, n):
    got = [
        (r.doc_id, r.start_tok, r.end_tok)
        for r in duplicate_spans(corpus, n=n).collect()
    ]
    assert sorted(got) == brute_spans(corpus_rows, n)


def test_planted_span_kept_exactly_once(spark, corpus, corpus_rows):
    """The canonical (smallest doc_id) copy of the planted span survives a
    strip; the other two copies vanish."""
    stripped = {
        r.doc_id: r.content_stripped
        for r in strip_duplicate_spans(corpus, n=12).collect()
    }
    gram = " ".join(f"planted{j}" for j in range(12))
    holders = [i for i, txt in stripped.items() if gram in txt]
    assert holders == [5]
    # every doc comes back, clean docs untouched
    assert set(stripped) == {i for i, _ in corpus_rows}
    clean = {i for i, _ in corpus_rows} - {
        i for i, _, _ in brute_spans(corpus_rows, 12)
    }
    for i in clean:
        assert stripped[i] == " ".join(_tokens(dict(corpus_rows)[i]))


def test_strip_token_accounting(spark, corpus, corpus_rows):
    spans = brute_spans(corpus_rows, 5)
    removed = {}
    for i, s, e in spans:
        removed[i] = removed.get(i, 0) + (e - s + 1)
    got = {
        r.doc_id: r.n_tokens_removed
        for r in strip_duplicate_spans(corpus, n=5).collect()
    }
    for i, _ in corpus_rows:
        assert got[i] == removed.get(i, 0), i


def test_spans_parallelism_invariance(spark, corpus_rows):
    a = spark.createDataFrame(corpus_rows, "doc_id long, content string")
    one = [
        tuple(r)
        for r in duplicate_spans(a.coalesce(1), n=4).collect()
    ]
    many = [
        tuple(r)
        for r in duplicate_spans(a.repartition(13), n=4).collect()
    ]
    assert sorted(one) == sorted(many)


def test_short_docs_and_bad_n(spark):
    df = spark.createDataFrame(
        [(0, "one two"), (1, ""), (2, None)], "doc_id long, content string"
    )
    assert duplicate_spans(df, n=3).count() == 0
    out = {r.doc_id: r for r in strip_duplicate_spans(df, n=3).collect()}
    assert out[0].content_stripped == "one two"
    assert out[1].n_tokens_removed == 0
    with pytest.raises(ValueError):
        duplicate_spans(df, n=1)


# --- classifier ---------------------------------------------------------


def _unit(tok):
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) / 2**32


def brute_score(text, weights=None, bias=0.0):
    tk = _tokens(text or "")
    if not tk:
        return round(1.0 / (1.0 + math.exp(-bias)), 6)
    if weights is None:
        ws = [_unit(t) - 0.5 for t in tk]
    else:
        ws = [weights.get(t, 0.0) for t in tk]
    x = bias + sum(ws) / len(tk)
    return round(1.0 / (1.0 + math.exp(-x)), 6)


def test_classifier_hash_mode_matches_bruteforce(spark, corpus, corpus_rows):
    got = {
        r.doc_id: r.quality_score
        for r in classifier_quality_score(corpus).collect()
    }
    for i, text in corpus_rows:
        assert got[i] == pytest.approx(brute_score(text), abs=1e-6), i


def test_classifier_dict_and_df_weights_agree(spark, corpus, corpus_rows):
    w = {"w1": 0.8, "w7": -1.2, "planted3": 2.0}
    via_dict = {
        r.doc_id: r.quality_score
        for r in classifier_quality_score(corpus, weights=w, bias=0.25)
        .collect()
    }
    wdf = spark.createDataFrame(
        sorted(w.items()), "term string, weight double"
    )
    via_df = {
        r.doc_id: r.quality_score
        for r in classifier_quality_score(corpus, weights=wdf, bias=0.25)
        .collect()
    }
    assert via_dict == via_df
    for i, text in corpus_rows:
        assert via_dict[i] == pytest.approx(
            brute_score(text, weights=w, bias=0.25), abs=1e-6
        ), i


def test_classifier_empty_doc_scores_prior(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "....")], "doc_id long, content string"
    )
    got = {
        r.doc_id: r.quality_score
        for r in classifier_quality_score(df, bias=1.5).collect()
    }
    prior = round(1.0 / (1.0 + math.exp(-1.5)), 6)
    assert got == {0: prior, 1: prior, 2: prior}
    # DataFrame-weights path must also emit the empties
    wdf = df.sparkSession.createDataFrame(
        [("x", 1.0)], "term string, weight double"
    )
    got2 = {
        r.doc_id: r.quality_score
        for r in classifier_quality_score(df, weights=wdf, bias=1.5)
        .collect()
    }
    assert got2 == got


def test_classifier_rejects_huge_dict(spark, corpus):
    with pytest.raises(ValueError, match="DataFrame"):
        classifier_quality_score(
            corpus, weights={f"t{i}": 0.1 for i in range(10001)}
        )
