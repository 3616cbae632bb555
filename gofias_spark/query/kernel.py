"""Per-partition BM25 scoring kernels (numpy, runs inside Arrow UDFs).

The reference delegates scoring to Lucene, which since 8.0 runs Block-Max
WAND for top-k `size` queries (SURVEY.md §4.2). This module is the native
replacement, operating on the codec.py compressed block format:

  * ``score_and``  — conjunctive (match operator=and, the reference's query
    semantics, elasticAddressRepository.go:483): rarest-term-first block-range
    pruning + sorted-array intersection, then exact BM25.
  * ``score_or``   — disjunctive block-max WAND: blocks processed in
    descending score-bound order; once the running top-k threshold θ exceeds
    a block's bound the block is skipped; survivors get an exact rescore
    (candidate-rescue), so the result is EXACTLY the true top-k.

Both kernels apply doc-level masks (tombstones / attribute filters) before
candidate selection, mirroring the reference's unscored bool-filter context
(elasticAddressRepository.go:449-452).

Float determinism: per-doc scores accumulate term contributions in query-term
order — the same order the pure-Python oracle uses — so scores are
bit-comparable (tests use rtol 1e-9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from gofias_spark.index.codec import decode_block, decode_blocks_concat


def _bm25_contrib(
    tf: np.ndarray, dl: np.ndarray, idf: float, k1: float, b: float, avgdl: float
) -> np.ndarray:
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _block_ub(
    tf_max: np.ndarray, dl_min: np.ndarray, idf: float, k1: float, b: float,
    avgdl: float,
) -> np.ndarray:
    """Upper bound of any posting's contribution in a block: tf_norm is
    increasing in tf and decreasing in dl, so (tf_max, dl_min) bounds it."""
    t = tf_max.astype(np.float64)
    d = dl_min.astype(np.float64)
    return idf * t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * d / avgdl))


def _decode_term(tdf: pd.DataFrame):
    """All blocks of one term (any doc_parts) -> sorted (ids, tf, dl).
    Vectorized: three stream decodes total, not three per block."""
    ids, tf, dl = decode_blocks_concat(
        list(tdf["docs"]),
        list(tdf["tfs"]),
        list(tdf["dls"]),
        tdf["n"].to_numpy(),
        tdf["base"].to_numpy(),
    )
    if ids.size > 1 and (np.diff(ids) < 0).any():
        order = np.argsort(ids, kind="mergesort")
        ids, tf, dl = ids[order], tf[order], dl[order]
    return ids, tf, dl


def _apply_mask(
    ids: np.ndarray, allowed: np.ndarray | None, excluded: np.ndarray | None
) -> np.ndarray:
    """Boolean keep-mask for sorted-membership filters."""
    keep = np.ones(ids.size, dtype=bool)
    if allowed is not None:
        if allowed.size == 0:
            return np.zeros(ids.size, dtype=bool)
        pos = np.searchsorted(allowed, ids)
        pos = np.minimum(pos, allowed.size - 1)
        keep &= allowed[pos] == ids
    if excluded is not None and excluded.size:
        pos = np.searchsorted(excluded, ids)
        pos = np.minimum(pos, excluded.size - 1)
        keep &= excluded[pos] != ids
    return keep


def score_and(
    blocks: pd.DataFrame,
    qterms: list[str],
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    topn: int,
    allowed: np.ndarray | None = None,
    excluded: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact conjunctive BM25 top-n within one doc_part."""
    per_term = {t: g for t, g in blocks.groupby("term", sort=False)}
    if any(t not in per_term for t in qterms):
        return _empty()
    # rarest term first: fewest postings in this partition
    order = sorted(qterms, key=lambda t: int(per_term[t]["n"].sum()))
    first = order[0]
    first_ids, first_tf, first_dl = _decode_term(per_term[first])
    keep = _apply_mask(first_ids, allowed, excluded)
    cand = first_ids[keep]
    # keep the rarest term's full decode for the scoring pass (otherwise a
    # single-term query — the common hot case — decodes its postings twice)
    decoded: dict[str, tuple] = {first: (first_ids, first_tf, first_dl)}
    for t in order[1:]:
        if cand.size == 0:
            return _empty()
        lo, hi = int(cand[0]), int(cand[-1])
        # block-range pruning: only decode blocks overlapping the candidate range
        tdf = per_term[t]
        tdf = tdf[(tdf["last"] >= lo) & (tdf["base"] < hi + 1)]
        if len(tdf) == 0:
            return _empty()
        ids, tf, dl = _decode_term(tdf)
        decoded[t] = (ids, tf, dl)
        pos = np.searchsorted(ids, cand)
        pos_c = np.minimum(pos, ids.size - 1)
        cand = cand[ids[pos_c] == cand]
    if cand.size == 0:
        return _empty()
    scores = np.zeros(cand.size, dtype=np.float64)
    for t in qterms:  # oracle summation order
        if t in decoded:
            ids, tf, dl = decoded[t]
        else:
            ids, tf, dl = _decode_term(per_term[t])
        pos = np.searchsorted(ids, cand)
        scores += _bm25_contrib(tf[pos], dl[pos], idf[t], k1, b, avgdl)
    return _topn(cand, scores, topn)


def score_or(
    blocks: pd.DataFrame,
    qterms: list[str],
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    topn: int,
    allowed: np.ndarray | None = None,
    excluded: np.ndarray | None = None,
    seed_blocks: int = 16,
) -> pd.DataFrame:
    """Exact disjunctive BM25 top-n via block-max pruning + rescue rescore."""
    present = [t for t in qterms if (blocks["term"] == t).any()]
    if not present:
        return _empty()
    per_term = {
        t: blocks[blocks["term"] == t].reset_index(drop=True) for t in present
    }
    ub: dict[str, np.ndarray] = {}
    gmax: dict[str, float] = {}
    for t in present:
        g = per_term[t]
        ub[t] = _block_ub(
            g["tf_max"].to_numpy(), g["dl_min"].to_numpy(), idf[t], k1, b, avgdl
        )
        gmax[t] = float(ub[t].max())
    total_gmax = sum(gmax.values())
    # flat block table with per-block bound = own ub + others' global max
    flat = []
    for t in present:
        bounds = ub[t] + (total_gmax - gmax[t])
        for j in range(len(per_term[t])):
            flat.append((float(bounds[j]), t, j))
    flat.sort(key=lambda x: -x[0])

    # θ seeding: decode the best `seed_blocks` blocks, then prune the rest
    n_seed = min(len(flat), max(seed_blocks, 1))
    processed = flat[:n_seed]
    theta = -np.inf
    contrib_docs, contrib_vals, contrib_terms = [], [], []

    def _process(entries):
        # batch per term: one vectorized multi-block decode per term instead
        # of a ~35us numpy roundtrip per block
        by_term: dict[str, list[int]] = {}
        for _, t, j in entries:
            by_term.setdefault(t, []).append(j)
        for t, js in by_term.items():
            g = per_term[t].iloc[js]
            ids, tf, dl = decode_blocks_concat(
                list(g["docs"]), list(g["tfs"]), list(g["dls"]),
                g["n"].to_numpy(), g["base"].to_numpy(),
            )
            keep = _apply_mask(ids, allowed, excluded)
            if not keep.all():
                ids, tf, dl = ids[keep], tf[keep], dl[keep]
            if ids.size == 0:
                continue
            contrib_docs.append(ids)
            contrib_vals.append(_bm25_contrib(tf, dl, idf[t], k1, b, avgdl))
            contrib_terms.append(np.full(ids.size, qterms.index(t), dtype=np.int32))

    _process(processed)
    if contrib_docs and topn is not None:
        theta = _kth_score(contrib_docs, contrib_vals, contrib_terms, topn)
    pruned, survivors = [], []
    for entry in flat[n_seed:]:
        (pruned if entry[0] < theta else survivors).append(entry)
    _process(survivors)
    if not contrib_docs:
        return _empty()
    doc, score = _sum_contribs(contrib_docs, contrib_vals, contrib_terms)

    if pruned:
        # candidate rescue: docs whose partial score + possible missing
        # contributions from pruned blocks could reach the current kth score
        kth = _kth_of(score, topn)
        missing = np.zeros(doc.size, dtype=np.float64)
        for bound_val, t, j in pruned:
            row = per_term[t].iloc[j]
            lo_id, hi_id = int(row["base"]) + 1, int(row["last"])
            i0 = np.searchsorted(doc, lo_id)
            i1 = np.searchsorted(doc, hi_id, side="right")
            missing[i0:i1] += ub[t][j]
        rescue = np.flatnonzero((score + missing >= kth) & (missing > 0))
        if rescue.size:
            rescue_ids = doc[rescue]
            for bound_val, t, j in pruned:
                row = per_term[t].iloc[j]
                lo_id, hi_id = int(row["base"]) + 1, int(row["last"])
                i0 = np.searchsorted(rescue_ids, lo_id)
                i1 = np.searchsorted(rescue_ids, hi_id, side="right")
                if i0 == i1:
                    continue
                ids, tf, dl = decode_block(row)
                keep = _apply_mask(ids, allowed, excluded)
                ids, tf, dl = ids[keep], tf[keep], dl[keep]
                pos = np.searchsorted(ids, rescue_ids[i0:i1])
                pos_c = np.minimum(pos, max(ids.size - 1, 0))
                hit = ids.size > 0
                if not hit:
                    continue
                m = ids[pos_c] == rescue_ids[i0:i1]
                score[rescue[i0:i1][m]] += _bm25_contrib(
                    tf[pos_c[m]], dl[pos_c[m]], idf[t], k1, b, avgdl
                )
    return _topn(doc, score, topn)


def score_msm(
    blocks: pd.DataFrame,
    qterms: list[str],
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    topn: int | None,
    msm: int = 2,
    allowed: np.ndarray | None = None,
    excluded: np.ndarray | None = None,
) -> pd.DataFrame:
    """Disjunctive BM25 with ES ``minimum_should_match``: only docs matching
    at least ``msm`` distinct query terms qualify; score = sum of the
    matched terms' contributions (exactly ES's bool.should semantics,
    Lucene ``MinShouldMatchSumScorer``).

    Exact, and deliberately UNPRUNED: θ-skipping a block (score_or's
    block-max WAND) would undercount a doc's matched-clause tally, and a
    count-aware rescue must decode every pruned block's id range anyway —
    so msm pays the full decode of the query terms' postings (the naive-OR
    bound). The engine routes the degenerate forms away from this kernel:
    msm<=1 → score_or (pruned), msm==len(qterms) → score_and
    (intersection-pruned), msm>len(present terms) → empty.

    Correctness under partitioning: a doc's postings for every term share
    its doc_part (and hence its cache partition), so per-partition tallies
    are complete — the same invariant score_and's intersection relies on.
    """
    present = [t for t in qterms if (blocks["term"] == t).any()]
    if len(present) < msm or not present:
        return _empty()
    docs_l, vals_l, terms_l = [], [], []
    for t in present:
        g = blocks[blocks["term"] == t]
        ids, tf, dl = _decode_term(g)
        keep = _apply_mask(ids, allowed, excluded)
        if not keep.all():
            ids, tf, dl = ids[keep], tf[keep], dl[keep]
        if ids.size == 0:
            continue
        docs_l.append(ids)
        vals_l.append(_bm25_contrib(tf, dl, idf[t], k1, b, avgdl))
        terms_l.append(np.full(ids.size, qterms.index(t), dtype=np.int32))
    if not docs_l:
        return _empty()
    doc, score, nmatch = _sum_contribs_counts(docs_l, vals_l, terms_l)
    ok = nmatch >= msm
    return _topn(doc[ok], score[ok], topn)


def msm(m: int):
    """Kernel factory: a ``score_msm`` bound to ``m`` with the standard
    kernel signature, so every tier substitutes it for score_and/score_or
    unchanged (same pattern as ``paged``)."""

    def wrapped(blocks, qterms, idf, avgdl, k1, b, topn,
                allowed=None, excluded=None):
        return score_msm(blocks, qterms, idf, avgdl, k1, b, topn, msm=m,
                         allowed=allowed, excluded=excluded)

    return wrapped


def select_kernel(mode: str, msm_n: int | None, n_terms: int):
    """Scoring-kernel dispatch shared by every tier. Degenerate
    minimum_should_match values route to the cheaper pruned kernels:
    msm<=1 is plain OR (block-max WAND), msm==n_terms is AND
    (rarest-first intersection); only 1 < msm < n_terms needs the
    unpruned counting kernel."""
    if mode == "and":
        return score_and
    if msm_n is None or msm_n <= 1:
        return score_or
    if msm_n >= n_terms:
        return score_and
    return msm(msm_n)


def match_ids(
    blocks: pd.DataFrame,
    qterms: list[str],
    mode: str = "and",
    allowed: np.ndarray | None = None,
    excluded: np.ndarray | None = None,
) -> np.ndarray:
    """Sorted doc_ids matching the query (+ masks) in one doc_part — the
    unscored candidate set shared by count and facet aggregation."""
    per_term = {t: g for t, g in blocks.groupby("term", sort=False)}
    if mode == "or":
        present = [t for t in qterms if t in per_term]
        if not present:
            return np.empty(0, dtype=np.int64)
        ids = np.unique(
            np.concatenate([_decode_term(per_term[t])[0] for t in present])
        )
        return ids[_apply_mask(ids, allowed, excluded)]
    if any(t not in per_term for t in qterms):
        return np.empty(0, dtype=np.int64)
    order = sorted(qterms, key=lambda t: int(per_term[t]["n"].sum()))
    cand, _, _ = _decode_term(per_term[order[0]])
    cand = cand[_apply_mask(cand, allowed, excluded)]
    for t in order[1:]:
        if cand.size == 0:
            return cand
        ids, _, _ = _decode_term(per_term[t])
        pos = np.searchsorted(ids, cand)
        pos_c = np.minimum(pos, ids.size - 1)
        cand = cand[ids[pos_c] == cand]
    return cand


def apply_neg(
    blocks: pd.DataFrame,
    neg_terms: list[str],
    excluded: np.ndarray | None = None,
):
    """Split bool-must_not terms out of a blocks frame: returns the
    positive-term blocks plus the excluded doc_id set grown by every doc
    containing a negated term (ES bool.must_not semantics — pure
    exclusion, no score contribution). Works per-partition: postings for
    the negated terms ride the SAME scan/fetch as the positive terms, so
    exclusion costs no extra job on any tier."""
    if not neg_terms:
        return blocks, excluded
    isneg = blocks["term"].isin(neg_terms)
    if not isneg.any():
        return blocks, excluded
    neg = blocks[isneg]
    ids = np.unique(
        np.concatenate(
            [_decode_term(g)[0] for _, g in neg.groupby("term", sort=False)]
        )
    )
    if excluded is not None:
        ids = np.union1d(excluded, ids)
    return blocks[~isneg], ids


def subset_term_counts(
    blocks: pd.DataFrame,
    qterms: list[str],
    mode: str = "and",
    allowed: np.ndarray | None = None,
    excluded: np.ndarray | None = None,
) -> pd.DataFrame:
    """Foreground document frequencies for significant-terms aggregation:
    for EVERY term present in ``blocks``, the count of its postings among
    the docs matching the query (``match_ids`` over the same blocks —
    the doc-partitioned index means one partition's blocks contain both
    the query terms' postings AND every other term's postings for the
    same docs, so this is one self-contained pass). Zero-hit terms are
    omitted; returns (term, hits)."""
    cand = match_ids(blocks, qterms, mode, allowed, excluded)
    if cand.size == 0:
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "hits": pd.Series(dtype="int64")})
    terms, hits = [], []
    lo, hi = int(cand[0]), int(cand[-1])
    for t, g in blocks.groupby("term", sort=False):
        # block-range pruning: only decode blocks overlapping the matched
        # id range (cheap and effective — cand is one doc_part's ids)
        g = g[(g["last"] >= lo) & (g["base"] < hi + 1)]
        if len(g) == 0:
            continue
        ids = _decode_term(g)[0]
        if ids.size == 0:
            continue
        pos = np.minimum(np.searchsorted(ids, cand), ids.size - 1)
        h = int((ids[pos] == cand).sum())
        if h:
            terms.append(t)
            hits.append(h)
    return pd.DataFrame(
        {"term": terms, "hits": pd.Series(hits, dtype="int64")}
    )


def after_filter(
    pdf: pd.DataFrame, after: tuple[float, int], topn: int | None
) -> pd.DataFrame:
    """Cursor page: the rows strictly AFTER ``after=(score, doc_id)`` in
    the result order (score desc, doc_id asc), re-sorted, head(topn).
    ES search_after analogue — the cursor must be a pair previously
    returned by the engine (the same float64s), so the equality
    comparison on score is exact, not approximate."""
    s, d = float(after[0]), int(after[1])
    sc = pdf["score"].to_numpy(dtype=np.float64)
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    m = (sc < s) | ((sc == s) & (ids > d))
    sc, ids = sc[m], ids[m]
    order = np.lexsort((ids, -sc))
    if topn is not None:
        order = order[:topn]
    return pd.DataFrame({"doc_id": ids[order], "score": sc[order]})


def paged(base, after: tuple[float, int]):
    """Wrap a score kernel for cursor pagination: exact scoring first
    (topn=None — block-max pruning keeps only the global top-n, but a
    post-cursor page may live arbitrarily deep below that theta), then
    the after-filter + head(topn). Signature-compatible with
    score_and/score_or so every tier can substitute it unchanged."""

    def wrapped(blocks, qterms, idf, avgdl, k1, b, topn,
                allowed=None, excluded=None):
        r = base(blocks, qterms, idf, avgdl, k1, b, None,
                 allowed=allowed, excluded=excluded)
        return after_filter(r, after, topn)

    return wrapped


def count_and(
    blocks: pd.DataFrame,
    qterms: list[str],
    allowed: np.ndarray | None = None,
    excluded: np.ndarray | None = None,
) -> int:
    """Count of docs matching all query terms (+ filters) in one doc_part."""
    return int(match_ids(blocks, qterms, "and", allowed, excluded).size)


# -- helpers ----------------------------------------------------------------


def _empty() -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
    )


def _sum_contribs(docs_l, vals_l, terms_l):
    """Group-sum contributions per doc, adding terms in query order per doc
    (stable sort by (doc, term_pos) then reduceat)."""
    docs = np.concatenate(docs_l)
    vals = np.concatenate(vals_l)
    tpos = np.concatenate(terms_l)
    order = np.lexsort((tpos, docs))
    docs, vals = docs[order], vals[order]
    uniq, starts = np.unique(docs, return_index=True)
    sums = np.add.reduceat(vals, starts)
    return uniq, sums


def _sum_contribs_counts(docs_l, vals_l, terms_l):
    """_sum_contribs plus the distinct-term match count per doc: each term
    contributes a given doc at most once (a term's blocks cover disjoint
    id ranges), so rows-per-doc IS the matched-clause tally."""
    docs = np.concatenate(docs_l)
    vals = np.concatenate(vals_l)
    tpos = np.concatenate(terms_l)
    order = np.lexsort((tpos, docs))
    docs, vals = docs[order], vals[order]
    uniq, starts = np.unique(docs, return_index=True)
    sums = np.add.reduceat(vals, starts)
    counts = np.diff(np.append(starts, docs.size))
    return uniq, sums, counts


def _kth_score(docs_l, vals_l, terms_l, k) -> float:
    _, sums = _sum_contribs(docs_l, vals_l, terms_l)
    return _kth_of(sums, k)


def _kth_of(scores: np.ndarray, k: int) -> float:
    if scores.size == 0:
        return -np.inf
    if scores.size <= k:
        return float(scores.min())
    return float(np.partition(scores, -k)[-k])


def _topn(doc: np.ndarray, score: np.ndarray, topn: int | None) -> pd.DataFrame:
    if topn is None:
        # all-matches mode (attribute-first composite sorts, O1-O3: score
        # cannot prune when it is not the primary sort key)
        return pd.DataFrame({"doc_id": doc, "score": score})
    if topn <= 0 or doc.size == 0:
        return _empty()
    if doc.size > topn:
        # select everything >= the topn-th largest score (keeps all ties for
        # exact doc_id-asc tie-break), then sort only that slice
        kth = np.partition(score, doc.size - topn)[doc.size - topn]
        mask = score >= kth
        d, s = doc[mask], score[mask]
    else:
        d, s = doc, score
    order = np.lexsort((d, -s))[:topn]
    return pd.DataFrame({"doc_id": d[order], "score": s[order]})
