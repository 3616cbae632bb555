"""Vectorized analyzers (tokenize / edge-ngram / ngram) — SURVEY.md §2.3 T1-T3.

The reference declares these as Elasticsearch analyzer JSON and lets Lucene
execute them (standard+lowercase "keyword_analyzer"
elasticAddressRepository.go:56-59; edge_ngram 1..40 :45-54; ngram 1..15
elasticHouseRepository.go:43-47). Here they are implemented as pandas-level
vectorized functions, used inside Arrow-batched ``mapInPandas`` — never
per-row Python UDFs (BASELINE.json input_hint).

Two consumers:
  * index build: ``term_frequencies`` — (doc_id, term, tf) + doclen per doc,
    i.e. map-side pre-aggregation before any shuffle.
  * query side: ``analyze_query`` — driver-side tokenization of the query
    string with the *search-time* analyzer (always ``standard``; prefix
    queries look tokens up in an edge_ngram-built index, mirroring how the
    reference pairs index analyzer edge_ngram with search analyzer keyword,
    elasticAddressRepository.go:67-71).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from gofias_spark.config import AnalyzerConfig


def tokenize_text(text: str, cfg: AnalyzerConfig) -> list[str]:
    """Analyze a single string (driver-side / oracle-side use)."""
    cfg.validate()
    tokens = re.findall(cfg.token_pattern, text.lower())
    if cfg.mode == "standard":
        return tokens
    return _expand_tokens(tokens, cfg)


def _expand_tokens(tokens: list[str], cfg: AnalyzerConfig) -> list[str]:
    out: list[str] = []
    lo, hi = cfg.min_gram, cfg.max_gram
    if cfg.mode == "edge_ngram":
        for t in tokens:
            n = min(len(t), hi)
            out.extend(t[:i] for i in range(lo, n + 1))
    else:  # ngram
        for t in tokens:
            ln = len(t)
            for size in range(lo, min(ln, hi) + 1):
                out.extend(t[j : j + size] for j in range(ln - size + 1))
    return out


def tokenize_series(texts: pd.Series, cfg: AnalyzerConfig) -> pd.Series:
    """Vectorized: Series[str] -> Series[list[str]] under the analyzer."""
    cfg.validate()
    toks = texts.fillna("").str.lower().str.findall(cfg.token_pattern)
    if cfg.mode == "standard":
        return toks
    return toks.map(lambda ts: _expand_tokens(ts, cfg))


def term_frequencies(
    doc_ids: pd.Series, texts: pd.Series, cfg: AnalyzerConfig
) -> pd.DataFrame:
    """Vectorized (doc_id, term, tf, dl) extraction for a batch of docs.

    dl (document length) = number of analyzed tokens, i.e. under edge_ngram /
    ngram modes the expanded-gram count — matching how index-time token
    filters inflate the Lucene field norm in the reference's ES indices.
    """
    token_lists = tokenize_series(texts, cfg)
    dl = token_lists.map(len).astype(np.int64)
    long = pd.DataFrame(
        {
            "doc_id": doc_ids.repeat(dl.to_numpy()).to_numpy(),
            "term": np.concatenate(
                [np.asarray(ts, dtype=object) for ts in token_lists]
            )
            if len(token_lists)
            else np.array([], dtype=object),
        }
    )
    tf = (
        long.groupby(["doc_id", "term"], sort=False)
        .size()
        .rename("tf")
        .reset_index()
    )
    dl_map = pd.DataFrame({"doc_id": doc_ids.to_numpy(), "dl": dl.to_numpy()})
    return tf.merge(dl_map, on="doc_id", how="left")


# Python ``\w`` for RE2: letters, decimal/letter/other numerics, underscore —
# the same class the JVM doclen expression uses (corpus.py with_doc_meta).
_RE2_NONWORD = r"[^\p{L}\p{Nd}\p{Nl}\p{No}_]+"


def term_frequencies_coded(
    doc_ids: np.ndarray, texts, cfg: AnalyzerConfig,
    with_positions: bool = False,
) -> dict:
    """Arrow-native (term, doc_id, tf, dl) extraction for one partition.

    Returns postings sorted by (term, doc_id) in factorized form:
      {"term_codes": int64[N] (run-contiguous, ascending with term),
       "uniq_terms": pa.Array[str] (sorted unique terms; term_codes index it),
       "doc_id": int64[N], "tf": uint64[N], "dl": uint64[N],
       "doc_dl": int64[n_docs] (per-input-doc analyzed length)}

    ``with_positions=True`` (standard mode only) adds "positions": the flat
    int64 token-index stream, concatenated per (term, doc) posting in the
    returned posting order, ascending within each posting — the input of
    the positional sidecar (codec.encode_positions_stream).

    Why this exists: the pandas path (``term_frequencies``) materializes every
    token as a Python str — ~2M objects / >1 GB fresh allocations per 15k-doc
    partition. Under 32 concurrent workers the resulting first-touch
    page-fault storm serializes the whole build in kernel time (measured
    85-90%% sys, 15-25x kernel slowdown on this VM). This path keeps all data
    in Arrow/numpy contiguous buffers: C++ lower+RE2 split+hash group-by,
    ~10x less transient memory, no per-token objects. Standard mode only —
    ngram modes take the pandas path.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    cfg.validate()
    if cfg.token_pattern != r"\w+":
        raise ValueError("coded path supports the \\w+ token pattern only")
    if with_positions and cfg.mode != "standard":
        raise ValueError(
            "positions require mode='standard' (gram expansion re-points "
            "the token stream, so gram positions would be meaningless)"
        )
    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, type=pa.large_string(), from_pandas=True
    )
    arr = pc.fill_null(arr, "")
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    # Unsorted doc_ids are handled with integer permutations only — the
    # content strings are NEVER physically reordered (a pc.take on the
    # content column would copy the whole string buffer: a large transient
    # allocation per group, and concurrent large allocations are the #1
    # scaling killer on shared-memory hosts — see session._ALLOC_ENV).
    perm = None
    if ids.size > 1 and (np.diff(ids) < 0).any():
        perm = np.argsort(ids, kind="stable")
        pos_rank = np.empty(ids.size, dtype=np.int64)
        pos_rank[perm] = np.arange(ids.size, dtype=np.int64)
        ids_sorted = ids[perm]
    else:
        ids_sorted = ids
    toks = pc.split_pattern_regex(pc.utf8_lower(arr), _RE2_NONWORD)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = pc.filter(flat, keep)
    parent = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
    n_docs = max(len(arr), 1)
    doc_dl = np.bincount(parent, minlength=n_docs).astype(np.int64)

    # factorize tokens once (C++ hash), then count (doc, term) pairs with a
    # single int64 sort: key = sorted_term_code * n_docs + doc_position.
    # np.unique(key) yields (term asc, doc asc) groups directly — no string
    # group-by, no string sort (both measured 3-5x slower than this).
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = enc.dictionary

    if cfg.mode != "standard":
        # gram expansion (edge_ngram T2 / ngram T3) stays vectorized by
        # expanding only the UNIQUE tokens in Python (vocab-sized loop, not
        # token-stream-sized), then scattering gram ids back over the token
        # stream with numpy gathers. This is what keeps prefix/infix index
        # builds off the per-row pandas path (round-1 weak #4).
        uniq_tokens = dictionary.to_pylist()
        gram_vocab: dict[str, int] = {}
        per_code_gids: list[np.ndarray] = []
        for tok in uniq_tokens:
            gs = _expand_tokens([tok], cfg)
            gids = np.empty(len(gs), dtype=np.int64)
            for i, g in enumerate(gs):
                gid = gram_vocab.setdefault(g, len(gram_vocab))
                gids[i] = gid
            per_code_gids.append(gids)
        counts_per_code = np.array(
            [g.size for g in per_code_gids], dtype=np.int64
        )
        flat_gids = (
            np.concatenate(per_code_gids)
            if per_code_gids
            else np.empty(0, dtype=np.int64)
        )
        code_start = np.zeros(counts_per_code.size + 1, dtype=np.int64)
        np.cumsum(counts_per_code, out=code_start[1:])
        reps = counts_per_code[codes]
        total = int(reps.sum())
        ends = np.cumsum(reps)
        within = np.arange(total, dtype=np.int64) - np.repeat(ends - reps, reps)
        gram_stream = flat_gids[np.repeat(code_start[codes], reps) + within]
        gram_parent = np.repeat(parent, reps)
        # dl = expanded gram count per doc (matches Lucene's field-norm
        # inflation under index-time token filters)
        doc_dl = np.bincount(parent, weights=reps, minlength=n_docs).astype(
            np.int64
        )
        # re-point the counting machinery at the gram stream
        dictionary = pa.array(list(gram_vocab), type=pa.string())
        codes = gram_stream
        parent = gram_parent
    sort_idx = pc.array_sort_indices(dictionary)
    uniq_terms = pc.take(dictionary, sort_idx)
    rank = np.empty(len(dictionary), dtype=np.int64)
    rank[sort_idx.to_numpy(zero_copy_only=False).astype(np.int64)] = np.arange(
        len(dictionary), dtype=np.int64
    )
    # position -> doc-id-rank space, so np.unique yields (term asc, doc_id
    # asc) even when the input rows arrive in arbitrary order
    rank_parent = pos_rank[parent] if perm is not None else parent
    key = rank[codes] * np.int64(n_docs) + rank_parent.astype(np.int64)
    ukey, counts = np.unique(key, return_counts=True)
    term_codes = ukey // n_docs
    d = ukey % n_docs
    dl_by_rank = doc_dl[perm] if perm is not None else doc_dl
    out = {
        "term_codes": term_codes,
        "uniq_terms": uniq_terms,
        "doc_id": ids_sorted[d],
        "tf": counts.astype(np.uint64),
        "dl": dl_by_rank[d].astype(np.uint64),
        "doc_dl": doc_dl,  # aligned with the INPUT row order (positions)
    }
    if with_positions:
        # token index within each doc's token stream (standard mode: the
        # gram branch above re-points `parent`, so positions are gated to
        # mode == "standard" at entry). `parent` is non-decreasing (tokens
        # flatten in row order), so within-(term,doc) original order is
        # ascending position — a STABLE argsort of the group key therefore
        # yields the flat positions stream in exactly the (term asc,
        # doc_id-rank asc) group order of np.unique(key).
        tok_per_doc = np.bincount(parent, minlength=n_docs)
        grp_start = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(tok_per_doc[:-1], out=grp_start[1:])
        pos_in_doc = (
            np.arange(parent.size, dtype=np.int64) - grp_start[parent]
        )
        out["positions"] = pos_in_doc[np.argsort(key, kind="stable")]
    return out


def analyze_query(query: str, cfg: AnalyzerConfig | None = None) -> list[str]:
    """Search-time analysis: standard tokenizer + lowercase, distinct terms
    in first-occurrence order (AND semantics dedupe; reference match queries
    use operator=and, elasticAddressRepository.go:483)."""
    cfg = cfg or AnalyzerConfig()
    search_cfg = AnalyzerConfig(
        mode="standard", token_pattern=cfg.token_pattern
    )
    seen: dict[str, None] = {}
    for t in tokenize_text(query, search_cfg):
        seen.setdefault(t, None)
    return list(seen)


def iter_term_frequency_batches(
    batches: Iterator[pd.DataFrame], cfg: AnalyzerConfig
) -> Iterator[pd.DataFrame]:
    """mapInPandas-shaped adapter: (doc_id, content) batches ->
    (doc_id, term, tf, dl) batches."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        yield term_frequencies(pdf["doc_id"], pdf["content"], cfg)
