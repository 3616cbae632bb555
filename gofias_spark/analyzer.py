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
