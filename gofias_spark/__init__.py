"""gofias_spark — a PySpark-native inverted-index + BM25 full-text engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference GarinAG/gofias (an ETL + search service that delegates all indexing
and scoring to Elasticsearch/Lucene; see SURVEY.md). Here the delegated layer
— tokenization, posting-list construction/compression, BM25 (k1=1.2, b=0.75)
top-k with block-max pruning — is implemented natively on Spark DataFrames
with vectorized Arrow/pandas UDFs (no per-row Python).

Design highlights (see SURVEY.md §4.3, §7):
  * document-partitioned index (``doc_part = seg<<20 | keyhash-bucket``):
    index build is shuffle-free per partition, hot terms spread across all
    partitions (no term-partition skew), queries merge per-partition top-k.
  * postings compressed as docID delta + varbyte blocks with block-max
    metadata (tf_max, dl_min) enabling exact block-max WAND pruning.
  * segments + tombstones for incremental MERGE (insert/update/delete,
    mirrors reference delta-import semantics, elasticAddressRepository.go:662-716).
  * checkpoint manifest with per-partition lineage; builds resume without
    recomputing committed partitions.
"""

from gofias_spark.config import AnalyzerConfig, BM25Params, IndexConfig
from gofias_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "AnalyzerConfig",
    "BM25Params",
    "IndexConfig",
    "get_spark",
    "__version__",
]
