"""Measure phrase / fuzzy / wildcard p50 at scale, at two core counts.

The round-3 claim under test: these query shapes serve DRIVER-SIDE (the
term-bucketed serve cache + the positional sidecar), so their latency is
independent of core count — the same serving-tier property §3b documents
for term queries, extended to the query extensions. Build one positional
index per level (build time incidental here; run_scaling.py owns the
build-scaling evidence), measure p50 over repeated queries, and record
how many Spark jobs the measured loop scheduled (the zero-job check).

Usage: python scripts/measure_extensions_scale.py [--docs 500000]
       [--levels 8,32] [--out BENCH_EXTENSIONS_SCALE.json]

Holds the shared measurement marker (see run_scaling.measurement_lock) so
the scaling hunter never launches load over this run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_scaling import gen_corpus, measurement_lock  # noqa: E402

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine
from gofias_spark.session import get_spark

cpus = {cpus}
spark = get_spark("extscale", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
docs = spark.read.parquet({corpus!r})
n = docs.count()
root = tempfile.mkdtemp(dir={workdir!r}, prefix=f"extidx{{cpus}}_")
t0 = time.perf_counter()
build_segment(spark, docs, root,
              IndexConfig(n_buckets={n_buckets}, block_size=128,
                          positions=True))
build_secs = time.perf_counter() - t0
eng = SearchEngine(spark, root)
eng.warm(local_max_blocks=0)   # force the serve tier, not the tiny-index path
assert eng._serve is not None and eng._serve.has_positions

# "common_util helper(common_util, 1)" rides every even doc, so the first
# two phrases hit at scale ("common_util helper" adjacency at positions
# 0-1, "helper common_util" at 1-2); the third is a guaranteed miss (0 and
# 2 are not adjacent) measuring the verify-reject path
PHRASES = ["common_util helper", "helper common_util",
           "common_util common_util"]
FUZZY = ["common_utik", "helpr", "fnc"]
WILD = ["common_*", "help?r", "*lper"]

def lats(fn, args, reps=8):
    lat = []
    for _ in range(reps):
        for a in args:
            t0 = time.perf_counter()
            fn(a, k=10, as_pandas=True)
            lat.append(time.perf_counter() - t0)
    return [round(x, 4) for x in lat]

# warmups commission arrow datasets / python imports outside the timing
eng.search_phrase("func index_1", k=5, as_pandas=True)
eng.search_fuzzy("fnuc", k=5, as_pandas=True)
eng.search_wildcard("inde*", k=5, as_pandas=True)

tracker = spark.sparkContext.statusTracker()
jobs_before = len(tracker.getJobIdsForGroup(None))
res = {{
    "cpus": cpus,
    "n_docs": n,
    "build_positions_secs": round(build_secs, 2),
    "phrase_lats": lats(eng.search_phrase, PHRASES),
    "fuzzy_lats": lats(eng.search_fuzzy, FUZZY),
    "wildcard_lats": lats(eng.search_wildcard, WILD),
}}
res["spark_jobs_during_measurement"] = (
    len(tracker.getJobIdsForGroup(None)) - jobs_before
)
shutil.rmtree(root, ignore_errors=True)
print("RESULT " + json.dumps(res))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_EXTENSIONS_SCALE.json")
    )
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    workdir = os.path.join(base, "gofias_extscale")
    os.makedirs(workdir, exist_ok=True)

    # ABBA order: measure lo,hi,hi,lo and merge each level's two windows —
    # monotone host drift then hits both levels symmetrically instead of
    # masquerading as a core-count effect (the first run of this script
    # measured wildcard 94 ms at local[8] vs 135 ms at local[32] with ZERO
    # Spark jobs in both — identical single-threaded work, pure window
    # noise)
    lo, hi = min(levels), max(levels)
    order = [lo, hi, hi, lo]
    with measurement_lock():
        corpus = gen_corpus(args.docs, base)
        results: dict = {}
        for cpus in order:
            code = WORKER.format(
                repo=REPO, cpus=cpus, corpus=corpus,
                n_buckets=max(8, min(512, args.docs // 4000)),
                workdir=workdir,
            )
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, check=True, cwd=REPO,
            )
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[7:])
                    key = f"local{cpus}"
                    if key not in results:
                        results[key] = r
                    else:
                        for q in ("phrase", "fuzzy", "wildcard"):
                            results[key][f"{q}_lats"].extend(r[f"{q}_lats"])
                        results[key]["spark_jobs_during_measurement"] += r[
                            "spark_jobs_during_measurement"
                        ]

    def p50(key: str, q: str) -> float:
        xs = sorted(results[key][f"{q}_lats"])
        return xs[len(xs) // 2]

    for key in results:
        for q in ("phrase", "fuzzy", "wildcard"):
            results[key][f"{q}_p50_secs"] = p50(key, q)

    doc = {
        "input": {"n_docs": args.docs, "corpus": corpus,
                  "run_order": [f"local{c}" for c in order]},
        **results,
        # core-count independence, same 5% noise band as run_scaling's
        # query criterion; zero Spark jobs is the architectural reason
        "query_scaling": {
            q: {
                "p50_from": p50(f"local{lo}", q),
                "p50_to": p50(f"local{hi}", q),
                "pass": p50(f"local{hi}", q) <= 1.05 * p50(f"local{lo}", q),
            }
            for q in ("phrase", "fuzzy", "wildcard")
        },
        "zero_jobs": {
            f"local{c}": results[f"local{c}"]["spark_jobs_during_measurement"]
            for c in (lo, hi)
        },
    }
    json.dump(doc, open(args.out, "w"), indent=2)
    print(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
