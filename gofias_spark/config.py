"""Engine configuration objects.

Mirrors the reference's analyzer/index settings, which are JSON-in-Go-string
Elasticsearch configs (see /root/reference/app/infrastructure/persistence/
address/elastic/repository/elasticAddressRepository.go:24-62 for the address
index and elasticHouseRepository.go:22-69 for the houses index), re-expressed
as plain dataclasses consumed by the Spark-side analyzer and index builder.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    """Okapi BM25 parameters.

    The reference never overrides Elasticsearch's default similarity, so the
    effective scorer is ES 7's BM25 with k1=1.2, b=0.75 (mapping settings,
    elasticAddressRepository.go:64-234 contain no "similarity" key). We define
    exact float64 arithmetic (no Lucene norm quantization) as the spec:
        idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
        tf_norm   = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        score(d)  = sum over query terms of idf(t) * tf_norm(t, d)
    """

    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class AnalyzerConfig:
    """Tokenization / term expansion config.

    ``mode``:
      * ``standard``   — Unicode word tokenizer + lowercase. Spark analogue of
        the reference's search-time "keyword_analyzer" (standard tokenizer +
        lowercase filter, elasticAddressRepository.go:56-59).
      * ``edge_ngram`` — every token expanded to prefixes of length
        [min_gram, max_gram]; index-time prefix search becomes exact lookup
        (reference "edge_ngram_analyzer" min 1 max 40,
        elasticAddressRepository.go:45-54; houses variant max 50,
        elasticHouseRepository.go:48-52).
      * ``ngram``      — sliding-window substrings [min_gram, max_gram]
        (reference "ngram_analyzer" min 1 max 15 for infix house-number
        matching, elasticHouseRepository.go:43-47).

    ``token_pattern`` is a Python ``re`` pattern applied to the lowercased
    text; the default ``\\w+`` (unicode) matches letters/digits/underscore,
    which on ASCII corpora coincides with ``[a-z0-9_]+`` (the pattern the
    DuckDB SQL oracles use).
    """

    mode: str = "standard"
    token_pattern: str = r"\w+"
    min_gram: int = 1
    max_gram: int = 40

    def validate(self) -> None:
        if self.mode not in ("standard", "edge_ngram", "ngram"):
            raise ValueError(f"unknown analyzer mode: {self.mode}")
        if self.min_gram < 1 or self.max_gram < self.min_gram:
            raise ValueError("require 1 <= min_gram <= max_gram")


# doc_id bit layout: [ seg_id : 16 | bucket : 20 | rank : 28 ] — doc_ids are
# deterministic (bucket = key hash, rank = key sort order within bucket),
# unique across segments without an offset protocol, and doc-partition
# extraction is a shift: doc_part = doc_id >> RANK_BITS = (seg << 20) | bucket.
RANK_BITS = 28
BUCKET_BITS = 20


@dataclass(frozen=True)
class IndexConfig:
    """Physical layout of the index.

    ``n_buckets`` controls the document partitioning: each doc hashes to
    bucket = pmod(xxhash64(repo, path, commit), n_buckets), and a doc
    partition is one (segment, bucket). The index is *document-partitioned*
    (like an ES shard, elasticAddressRepository.go:28-29 uses 1 shard; we are
    explicitly multi-partition): postings for every term are split across doc
    partitions, so hot terms ("the", "import") never concentrate in one task
    — the skew answer demanded by the north rule, without salting machinery.
    Crucially the bucket hash is computable row-wise, so the index build
    moves document content through exactly ONE shuffle (the bucket
    repartition) — doc_id assignment, doc_meta write and posting encode all
    reuse that partitioning.

    ``block_size`` is the number of postings per compressed block (doc-id
    delta + varbyte), each carrying block-max metadata (tf_max, dl_min) for
    WAND pruning. 128 matches Lucene's skip/block granularity.
    """

    n_buckets: int = 64
    block_size: int = 128
    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)
    bm25: BM25Params = field(default_factory=BM25Params)
    # opt-in positional sidecar (fast phrase verification without touching
    # the doc store): a positions table block-aligned with the postings.
    # Standard analyzer only; costs ~1-2 bytes/token of extra index.
    positions: bool = False
