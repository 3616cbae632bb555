"""Regenerate PLANS.md — formatted physical plans of the flagship paths,
committed so plan quality (pushdown, pruning, broadcast, TakeOrdered,
single-shuffle aggs) is auditable without running Spark.

    python scripts/dump_plans.py        # writes PLANS.md at the repo root
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gofias_spark.config import IndexConfig  # noqa: E402
from gofias_spark.corpus import synth_corpus  # noqa: E402
from gofias_spark.index.build import build_segment  # noqa: E402
from gofias_spark.query.engine import SearchEngine  # noqa: E402
from gofias_spark.session import get_spark  # noqa: E402


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().rstrip()


def main() -> None:
    import tempfile

    spark = get_spark("dumpplans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="plansidx_")
    docs = synth_corpus(spark, 300)
    build_segment(spark, docs, root,
                  IndexConfig(n_buckets=4, block_size=32))
    eng = SearchEngine(spark, root, cache=False)
    ident = docs.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))

    sections: list[tuple[str, str, str]] = []

    sections.append((
        "Postings scan for a 2-term query",
        "`term IN (...)` reaches the parquet scan as PushedFilters; only "
        "the postings columns the kernel needs are in ReadSchema "
        "(column pruning).",
        formatted(
            eng.postings.filter(
                F.col("term").isin(["common_util", "func"])
            ).select("term", "docs", "tfs", "dls", "base", "n")
        ),
    ))

    sections.append((
        "Wildcard/regexp cold-path expansion (capped)",
        "The 512-term rewrite bound is INSIDE the plan: orderBy(df desc)"
        ".limit(512) compiles to TakeOrderedAndProject, so at most 512 "
        "rows reach the driver from a 10^8-term dictionary.",
        formatted(eng._expansion_scan("^quer.*$", 512)),
    ))

    sections.append((
        "Fuzzy cold-path neighborhood (capped)",
        "Deletion-key equi-join against the stats table behind a length-"
        "window pushdown; the query side is a broadcast of <= len+1 "
        "keys; cap pushed into the plan like the wildcard rewrite.",
        formatted(eng._fuzzy_candidate_scan(
            "commom", {"commom"} | {
                "commom"[:i] + "commom"[i + 1:] for i in range(6)
            }, 1, 64)),
    ))

    from gofias_spark.operators.textstats import repo_rollup
    sections.append((
        "repo_rollup (per-repo curation report)",
        "code_pass is fused into the ONE corpus scan (shared expression "
        "tree, r5 fix — no corpus self-join); the rollup shuffles only "
        "a partial row per (repo, partition).",
        formatted(repo_rollup(ident)),
    ))

    from gofias_spark.operators.dedup import minhash_lsh_candidates
    sections.append((
        "MinHash-LSH near-dup candidate pairs",
        "Banded bucket equi-join — candidates meet in hash buckets, "
        "never an all-pairs product.",
        formatted(minhash_lsh_candidates(ident)),
    ))

    from gofias_spark.operators.lm import (
        perplexity_score,
        train_bigram_lm,
    )
    bigrams, contexts, vocab = train_bigram_lm(ident.limit(100))
    sections.append((
        "Bigram-LM perplexity scoring",
        "Corpus text never shuffles: scoring joins each doc's bigrams "
        "against the BROADCAST model and reduces with a combinable avg.",
        formatted(perplexity_score(ident, bigrams, contexts, vocab)),
    ))

    out = ["# PLANS — flagship physical plans (auto-generated)",
           "",
           "Regenerate with `python scripts/dump_plans.py`. Asserted "
           "continuously by `tests/test_plans.py`; this file exists so "
           "the shapes are reviewable without running Spark.",
           ""]
    for title, why, plan in sections:
        out += [f"## {title}", "", why, "", "```", plan, "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(sections)} sections)")
    eng.close()
    spark.stop()


if __name__ == "__main__":
    main()
