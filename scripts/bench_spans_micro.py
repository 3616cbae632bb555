"""Microbench: per-window gram hashing cost in duplicate_spans.

Compares the shipped two-stage hash (token-hash array + long-slice
xxhash64) against the previous string path (concat_ws of the token slice
per window) on the same synthetic corpus, same session, back-to-back —
relative numbers only, so host regime cancels out.

Usage: python scripts/bench_spans_micro.py [--docs 20000] [--n 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gofias_spark.corpus import synth_corpus_distributed  # noqa: E402
from gofias_spark.operators.dedup import (  # noqa: E402
    _positioned_gram_hashes,
)
from gofias_spark.query.naive import tokens_col  # noqa: E402
from gofias_spark.session import get_spark  # noqa: E402


def _old_gram_hashes(docs, n, id_col, text_col):
    """The pre-optimization formulation: per-window string rebuild."""
    toks = tokens_col(F.col(text_col))
    windows = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.xxhash64(
                    F.concat_ws(" ", F.slice(toks, i + 1, n))
                ).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram:long>>"))
    return docs.select(
        F.col(id_col).alias("id"), F.explode(windows).alias("w")
    ).select("id", F.col("w.pos").alias("pos"), F.col("w.gram").alias("gram"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="spans_micro", master="local[8]",
                      shuffle_partitions=8)
    docs = synth_corpus_distributed(spark, args.docs).select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"), "content"
    ).persist()
    docs.count()

    def wall(fn):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    new_w = wall(lambda: _positioned_gram_hashes(
        docs, args.n, "doc_id", "content").count())
    old_w = wall(lambda: _old_gram_hashes(
        docs, args.n, "doc_id", "content").count())
    n_windows = _positioned_gram_hashes(
        docs, args.n, "doc_id", "content").count()
    print(f"docs={args.docs} n={args.n} windows={n_windows}")
    print(f"old (string concat per window): {old_w:.2f}s")
    print(f"new (token-hash long slices):   {new_w:.2f}s")
    print(f"speedup: {old_w / new_w:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
