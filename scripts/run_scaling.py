"""Scaling-efficiency evidence (north_rule: >= 0.8 from N to 4N executors).

The sandbox has no multi-node cluster, so per driver instruction the
criterion is evidenced by running the IDENTICAL build+query job at two
parallelism levels — local[8] and local[32] — on the same input, reporting
throughput at both plus eff = (thr_32 / thr_8) / (32 / 8).

The build job here uses the FIXTURES.md sf-bench synthetic corpus
(default 200k docs) rather than the tiny sf0.1 documents table, so the
measured section is dominated by real work, not job-setup overhead.

Usage: python scripts/run_scaling.py [--docs 200000] [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gofias_spark.config import IndexConfig
from gofias_spark.corpus import DOCS_SCHEMA
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine
from gofias_spark.session import get_spark

cpus = {cpus}
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
docs = spark.read.parquet({corpus!r})
n = docs.count()
root = tempfile.mkdtemp(prefix="gofias_scaling_idx_")
shutil.rmtree(root, ignore_errors=True)
t0 = time.perf_counter()
build_segment(spark, docs, root,
              IndexConfig(n_buckets={n_buckets}, block_size=128))
build_s = time.perf_counter() - t0
eng = SearchEngine(spark, root)
eng.warm()
eng.search("warmup", k=1).collect()
qs = ["index_1 search_2", "common_util", "elastic batch", "func worker"]
t0 = time.perf_counter()
for _ in range(3):
    for q in qs:
        eng.search(q, k=10).collect()
q_s = (time.perf_counter() - t0) / (3 * len(qs))
shutil.rmtree(root, ignore_errors=True)
print("RESULT " + json.dumps({{
    "cpus": cpus, "n_docs": n, "build_secs": round(build_s, 2),
    "files_per_sec": round(n / build_s, 1),
    "query_p_avg_secs": round(q_s, 4)}}))
spark.stop()
"""


def gen_corpus(n_docs: int) -> str:
    """Materialize the deterministic synthetic corpus once (shared input)."""
    path = os.path.join(
        tempfile.gettempdir(), f"gofias_scaling_corpus_{n_docs}"
    )
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    shutil.rmtree(path, ignore_errors=True)
    sys.path.insert(0, REPO)
    from gofias_spark.corpus import synth_corpus_distributed
    from gofias_spark.session import get_spark

    spark = get_spark("corpusgen", master="local[32]")
    synth_corpus_distributed(spark, n_docs, num_parts=256).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()
    return path


def run_level(cpus: int, corpus: str, n_buckets: int) -> dict:
    code = WORKER.format(
        repo=REPO, cpus=cpus, corpus=corpus, n_buckets=n_buckets
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING.json"))
    args = ap.parse_args()

    corpus = gen_corpus(args.docs)
    n_buckets = 128  # ~4 task waves at local[32]
    r8 = run_level(8, corpus, n_buckets)
    r32 = run_level(32, corpus, n_buckets)
    eff = (r32["files_per_sec"] / r8["files_per_sec"]) / (32 / 8)
    result = {
        "input": {"n_docs": args.docs, "corpus": corpus,
                  "n_buckets": n_buckets},
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
