"""Corpus ingest: the ``docs`` source table and ``doc_meta`` derivation.

Input table shape is mandated by BASELINE.json input_hint:
    docs(repo STRING, path STRING, commit STRING, lang STRING, content STRING)
Doc identity = (repo, path, commit). Derived per row:
    doc_id  — deterministic dense int64, global rank by (repo, path, commit)
    sha256  — sha2(content, 256), the per-row invariant vs the source
    doclen  — analyzed token count (standard analyzer)

The reference ingests XML row-by-row into ES bulk requests
(/root/reference/app/util/xml.go:15-43 → elasticAddressRepository.go:648-732);
here ingest is a declarative DataFrame lineage, and doc_id assignment is the
scale-safe replacement for Lucene's internal docIDs: range-repartition by key,
sort within partitions, then per-partition offsets + row_number — no global
single-partition window, deterministic across reruns and parallelism levels
(SURVEY.md §4.3 "deterministic docID assignment").
"""

from __future__ import annotations

import hashlib
import numpy as np
import random
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

KEY = ["repo", "path", "commit"]

_EXT_LANG = {
    "go": "go", "md": "md", "py": "py", "js": "js", "java": "java",
    "yml": "yaml", "yaml": "yaml", "json": "json", "proto": "proto",
    "mod": "gomod", "sum": "gosum", "txt": "txt",
}


def with_doc_part(
    docs: DataFrame, n_buckets: int = 64, seg_id: int = 0
) -> DataFrame:
    """Tag rows with their deterministic ``doc_part`` (hash bucket) WITHOUT
    assigning doc_ids — the build's fused kernel ranks rows in-kernel, so no
    JVM window/sort pass over the content is needed. doc_part here matches
    assign_doc_ids exactly (same hash, same layout)."""
    from gofias_spark.config import BUCKET_BITS

    if n_buckets > (1 << BUCKET_BITS):
        raise ValueError(f"n_buckets > {1 << BUCKET_BITS}")
    bucket = F.pmod(F.xxhash64(*KEY), F.lit(n_buckets)).cast("long")
    return docs.withColumn(
        "doc_part", F.lit(seg_id << BUCKET_BITS).cast("long") + bucket
    )


def assign_doc_ids(
    docs: DataFrame, n_buckets: int = 64, seg_id: int = 0
) -> DataFrame:
    """Add deterministic ``doc_id`` / ``doc_part`` via key-hash bucketing.

    doc_id = (seg_id << 48) | (bucket << RANK_BITS) | rank, where
    bucket = pmod(xxhash64(repo, path, commit), n_buckets) and rank is the
    row's (repo, path, commit) sort position within its bucket.

    Properties the engine depends on:
      * deterministic and parallelism-invariant (hash + in-bucket key sort —
        no sampling, no partition-boundary dependence);
      * computable with a SINGLE shuffle of the content (the bucket
        repartition), which the downstream doc_meta write and posting-encode
        groupBy reuse (HashPartitioning(bucket) already satisfies their
        clustering) — at 100 TB this one shuffle IS the index build's data
        movement;
      * doc_ids are dense within a bucket (delta+varbyte locality) and
        globally unique across segments without an offset protocol.
    """
    from gofias_spark.config import BUCKET_BITS, RANK_BITS

    if n_buckets > (1 << BUCKET_BITS):
        raise ValueError(f"n_buckets > {1 << BUCKET_BITS}")
    bucket = F.pmod(F.xxhash64(*KEY), F.lit(n_buckets)).cast("long")
    doc_part = F.lit(seg_id << BUCKET_BITS).cast("long") + bucket
    # partition ON doc_part so the persisted frame's HashPartitioning
    # satisfies every downstream clustering (doc_meta write, encode groupBy)
    parted = (
        docs.withColumn("doc_part", doc_part)
        .repartition(n_buckets, "doc_part")
        .sortWithinPartitions("doc_part", *KEY)
    )
    w = Window.partitionBy("doc_part").orderBy(*KEY)
    doc_id = F.col("doc_part") * F.lit(1 << RANK_BITS) + (
        F.row_number().over(w) - 1
    )
    return parted.withColumn("doc_id", doc_id.cast("long"))


def _tokens_col():
    # same word class as Python re \w (see query/naive.py SPLIT_PATTERN)
    return F.filter(
        F.split(F.lower(F.col("content")), r"[^\p{L}\p{Nd}\p{Nl}\p{No}_]+"),
        lambda t: t != F.lit(""),
    )


def analyzed_doclen_col(analyzer=None):
    """JVM expression for the EXACT analyzed document length under the
    given analyzer config — the dl BM25 uses:

      standard    — token count
      edge_ngram  — sum over tokens of (min(L, hi) - lo + 1 when L >= lo)
      ngram       — sum over tokens of G*(L - lo + 2) - ... the closed form
                    sum_{s=lo..G}(L - s + 1) with G = min(L, hi)

    Whole-stage-codegen arithmetic, no Python. Lets the two-pass
    (non-shared-FS) build persist a doclen identical to the Arrow kernel's
    analyzed dl for every analyzer mode."""
    toks = _tokens_col()
    if analyzer is None or analyzer.mode == "standard":
        return F.size(toks)
    lo, hi = analyzer.min_gram, analyzer.max_gram
    length = F.length
    if analyzer.mode == "edge_ngram":
        per_tok = lambda t: F.when(  # noqa: E731
            length(t) >= lo, F.least(length(t), F.lit(hi)) - F.lit(lo) + 1
        ).otherwise(F.lit(0))
    else:  # ngram: sum_{s=lo..G}(L-s+1) = G*(L+1) - G(G+1)/2 - [(lo-1)(L+1) - (lo-1)lo/2]
        def per_tok(t):
            big_g = F.least(length(t), F.lit(hi))
            full = big_g * (length(t) + 1) - (big_g * (big_g + 1)) / 2
            skip = F.lit(lo - 1) * (length(t) + 1) - F.lit((lo - 1) * lo / 2)
            return F.when(length(t) >= lo, (full - skip).cast("int")).otherwise(
                F.lit(0)
            )

    return F.aggregate(
        F.transform(toks, per_tok), F.lit(0), lambda acc, x: acc + x
    )


def with_doc_meta(docs_with_ids: DataFrame, analyzer=None) -> DataFrame:
    """Append sha256 / doclen columns (doclen via built-in exprs — the
    analyzed token/gram count, JVM-side, no Python)."""
    return docs_with_ids.withColumn(
        "sha256", F.sha2(F.col("content"), 256)
    ).withColumn("doclen", analyzed_doclen_col(analyzer))


def load_refcorpus(spark: SparkSession, root: str = "/root/reference") -> DataFrame:
    """FIXTURES.md §2: the reference repo's own files as rows (one per file),
    repo='GarinAG/gofias', commit='v1', content = exact bytes (utf-8,
    errors=replace). sha256(content) is the per-row invariant."""
    rootp = Path(root)
    rows = []
    for p in sorted(rootp.rglob("*")):
        if not p.is_file():
            continue
        rel = str(p.relative_to(rootp))
        content = p.read_bytes().decode("utf-8", errors="replace")
        ext = p.suffix.lstrip(".").lower()
        rows.append(
            ("GarinAG/gofias", rel, "v1", _EXT_LANG.get(ext, ext or "txt"), content)
        )
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic synthetic corpus (FIXTURES.md §1) — seeded pseudo-source.
_KEYWORDS = [
    "func", "def", "class", "return", "import", "package", "for", "while",
    "if", "else", "switch", "case", "var", "const", "type", "struct",
]
_WORDS = [
    "index", "search", "query", "batch", "bulk", "shard", "merge", "token",
    "score", "rank", "filter", "parse", "stream", "channel", "worker",
    "client", "server", "handler", "repo", "service", "config", "logger",
    "buffer", "cache", "elastic", "address", "house", "region", "city",
    "street", "level", "parent", "suggest", "version", "update", "delete",
]


def synth_rows(
    n_docs: int, seed: int = 42, rev: int = 0
) -> list[tuple[str, str, str, str, str]]:
    """Seed-fixed synthetic (repo, path, commit, lang, content) rows.

    Zipf-ish vocabulary of ~5000 identifiers; one designated hot term
    ``common_util`` in ~50% of docs (skew exercise, FIXTURES.md §1)."""
    rng = random.Random(seed)
    vocab = [f"{rng.choice(_WORDS)}_{i}" for i in range(5000)]
    exts = ["py", "go", "js", "java", "md", "txt"]
    rows = []
    for i in range(n_docs):
        repo = f"org{i % 7}/project{i % 23}"
        ext = exts[i % len(exts)]
        path = f"src/{_WORDS[i % len(_WORDS)]}/{_WORDS[(i * 7) % len(_WORDS)]}_{i}.{ext}"
        commit = hashlib.sha1(f"{repo}/{path}@{rev}".encode()).hexdigest()
        n_lines = rng.randint(5, 80)
        lines = []
        for _ in range(n_lines):
            kw = rng.choice(_KEYWORDS)
            # Zipf-ish: rank ~ floor(5000 * u^3) favors low ranks
            ident = vocab[min(4999, int(5000 * rng.random() ** 3))]
            arg = vocab[min(4999, int(5000 * rng.random() ** 3))]
            lit = rng.randint(0, 999)
            lines.append(f"{kw} {ident}({arg}, {lit})")
        if i % 2 == 0:
            lines.append("common_util helper(common_util, 1)")
        rows.append((repo, path, commit, ext, "\n".join(lines)))
    return rows


def synth_corpus(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synth_rows(n_docs, seed), schema=DOCS_SCHEMA)


def synth_corpus_distributed(
    spark: SparkSession, n_docs: int, seed: int = 42, num_parts: int = 128
) -> DataFrame:
    """Executor-side deterministic corpus generation for large scales.

    Content is a pure function of (seed, doc index) — independent of
    partitioning/parallelism — generated vectorized with numpy inside
    mapInPandas. Used for throughput/scaling benches where driver-side
    ``synth_rows`` would bottleneck."""
    import pandas as pd
    from pyspark.sql import functions as F

    kw = np.array(_KEYWORDS)
    words = np.array(_WORDS)
    exts = np.array(["py", "go", "js", "java", "md", "txt"])

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            out_rows = []
            for i in idx:
                rng = np.random.default_rng(seed * 10_000_003 + int(i))
                n_lines = int(rng.integers(5, 81))
                kws = kw[rng.integers(0, kw.size, n_lines)]
                a = rng.random(n_lines) ** 3
                b = rng.random(n_lines) ** 3
                idents = [
                    f"{words[int(x * words.size)]}_{int(x * 5000)}" for x in a
                ]
                args = [
                    f"{words[int(x * words.size)]}_{int(x * 5000)}" for x in b
                ]
                lits = rng.integers(0, 1000, n_lines)
                lines = [
                    f"{k} {ident}({arg}, {lit})"
                    for k, ident, arg, lit in zip(kws, idents, args, lits)
                ]
                if i % 2 == 0:
                    lines.append("common_util helper(common_util, 1)")
                ext = exts[int(i) % exts.size]
                repo = f"org{int(i) % 7}/project{int(i) % 23}"
                path = (
                    f"src/{words[int(i) % words.size]}/"
                    f"{words[(int(i) * 7) % words.size]}_{int(i)}.{ext}"
                )
                commit = hashlib.sha1(f"{repo}/{path}@0".encode()).hexdigest()
                out_rows.append(
                    (repo, path, commit, str(ext), "\n".join(lines))
                )
            yield pd.DataFrame(
                out_rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    return (
        spark.range(0, n_docs, numPartitions=num_parts)
        .mapInPandas(gen, schema=DOCS_SCHEMA)
    )
