"""Block-max WAND stress: pruning must actually fire and stay EXACT.

Builds synthetic posting lists directly (no Spark) with many small blocks and
skewed term frequencies, then checks score_or / score_and / count_and against
a brute-force scorer over every (doc, term) pair — including tombstone
masks, filters, and tie-heavy score distributions.
"""

import numpy as np
import pandas as pd
import pytest

from gofias_spark.index.codec import encode_blocks
from gofias_spark.query import kernel as K

K1, B = 1.2, 0.75


def _mk_corpus(rng, n_docs, vocab, max_tf=5, hot_frac=0.5):
    """Random (doc -> {term: tf}) with one hot term in hot_frac of docs."""
    docs = {}
    for d in range(n_docs):
        terms = {}
        for t in vocab[1:]:
            if rng.random() < 0.15:
                terms[t] = int(rng.integers(1, max_tf + 1))
        if rng.random() < hot_frac:
            terms[vocab[0]] = int(rng.integers(1, max_tf + 1))
        docs[d] = terms
    return docs


def _blocks_df(docs, block_size):
    dls = {d: max(sum(tfs.values()), 0) for d, tfs in docs.items()}
    by_term: dict[str, list] = {}
    for d in sorted(docs):
        for t, tf in docs[d].items():
            by_term.setdefault(t, []).append((d, tf))
    rows = []
    for t, postings in by_term.items():
        ids = np.array([d for d, _ in postings], dtype=np.int64)
        tfs = np.array([tf for _, tf in postings], dtype=np.uint64)
        dl = np.array([max(dls[d], 1) for d, _ in postings], dtype=np.uint64)
        for blk in encode_blocks(ids, tfs, dl, block_size):
            blk["term"] = t
            rows.append(blk)
    return pd.DataFrame(rows), dls


def _brute(docs, dls, qterms, idf, avgdl, mode, allowed=None, excluded=None):
    out = []
    for d, tfs in docs.items():
        if allowed is not None and d not in allowed:
            continue
        if excluded is not None and d in excluded:
            continue
        matched = [t for t in qterms if tfs.get(t, 0) > 0]
        if not matched or (mode == "and" and len(matched) != len(qterms)):
            continue
        dl = max(dls[d], 1)
        s = 0.0
        for t in qterms:
            tf = tfs.get(t, 0)
            if tf:
                s += idf[t] * tf * (K1 + 1) / (
                    tf + K1 * (1 - B + B * dl / avgdl)
                )
        out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("block_size", [4, 16])
def test_or_kernel_exact_under_pruning(seed, block_size):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(12)]
    docs = _mk_corpus(rng, 600, vocab)
    blocks, dls = _blocks_df(docs, block_size)
    n = len(docs)
    avgdl = sum(max(v, 1) for v in dls.values()) / n
    dfs = {
        t: sum(1 for d in docs.values() if t in d) for t in vocab
    }
    for qterms in [
        [vocab[0]],                       # hot single
        [vocab[0], vocab[3], vocab[7]],   # hot + mids
        [vocab[1], vocab[2]],
        vocab[:5],
    ]:
        qterms = [t for t in qterms if dfs[t] > 0]
        idf = {
            t: float(np.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)))
            for t in qterms
        }
        for topn in (3, 10, 50):
            got = K.score_or(
                blocks[blocks["term"].isin(qterms)],
                qterms, idf, avgdl, K1, B, topn, seed_blocks=4,
            )
            exp = _brute(docs, dls, qterms, idf, avgdl, "or")[:topn]
            assert list(got["doc_id"]) == [d for d, _ in exp], (
                f"seed={seed} q={qterms} topn={topn}"
            )
            assert np.allclose(
                got["score"], [s for _, s in exp], rtol=1e-9
            )


@pytest.mark.parametrize("seed", range(4))
def test_and_kernel_with_masks(seed):
    rng = np.random.default_rng(100 + seed)
    vocab = [f"t{i}" for i in range(8)]
    docs = _mk_corpus(rng, 400, vocab)
    blocks, dls = _blocks_df(docs, 8)
    n = len(docs)
    avgdl = sum(max(v, 1) for v in dls.values()) / n
    dfs = {t: sum(1 for d in docs.values() if t in d) for t in vocab}
    qterms = [vocab[0], vocab[2]]
    idf = {
        t: float(np.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)))
        for t in qterms
    }
    allowed = np.array(sorted(rng.choice(n, size=150, replace=False)))
    excluded = np.array(sorted(rng.choice(n, size=60, replace=False)))

    got = K.score_and(
        blocks[blocks["term"].isin(qterms)],
        qterms, idf, avgdl, K1, B, 20, allowed=allowed,
    )
    exp = _brute(docs, dls, qterms, idf, avgdl, "and", allowed=set(allowed))[:20]
    assert list(got["doc_id"]) == [d for d, _ in exp]
    assert np.allclose(got["score"], [s for _, s in exp], rtol=1e-9)

    got = K.score_or(
        blocks[blocks["term"].isin(qterms)],
        qterms, idf, avgdl, K1, B, 20, excluded=excluded, seed_blocks=2,
    )
    exp = _brute(docs, dls, qterms, idf, avgdl, "or", excluded=set(excluded))[:20]
    assert list(got["doc_id"]) == [d for d, _ in exp]

    cnt = K.count_and(
        blocks[blocks["term"].isin(qterms)], qterms, allowed=allowed
    )
    assert cnt == len(
        _brute(docs, dls, qterms, idf, avgdl, "and", allowed=set(allowed))
    )
