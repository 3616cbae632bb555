"""Two-core-count p50 for the round-3b query extensions: msm, clause
boosts, cardinality, percentiles, range_agg, top_hits.

Same methodology as measure_extensions_scale.py (ABBA run order, shared
measurement marker, zero-job check for the serve-tier ops, 5% noise band
on the core-count comparison). Query terms follow the distributed
generator's vocabulary rules (BASELINE.md §3d): mid-tail idents
query_300/batch_450/search_200 are in-range for their word index, and
every search-route query is validated with explain_query before timing.

Usage: python scripts/measure_new_ops_scale.py [--docs 500000]
       [--levels 8,32] [--out BENCH_NEW_OPS_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_scaling import gen_corpus, measurement_lock  # noqa: E402

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine
from gofias_spark.session import get_spark

cpus = {cpus}
spark = get_spark("newopsscale", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
docs = spark.read.parquet({corpus!r})
n = docs.count()
root = tempfile.mkdtemp(dir={workdir!r}, prefix=f"noidx{{cpus}}_")
t0 = time.perf_counter()
build_segment(spark, docs, root,
              IndexConfig(n_buckets={n_buckets}, block_size=128))
build_secs = time.perf_counter() - t0
eng = SearchEngine(spark, root)
eng.warm(local_max_blocks=0)
assert eng._serve is not None

MSM_Q = "query_300 batch_450 search_200"
# the msm/boost queries must actually retrieve (zero-df AND terms measure
# the empty route -- BASELINE.md 3d); explain_query is the gate
route = eng.explain_query(MSM_Q, mode="or")["route"]
assert route != "empty", route

def lats(fn, reps={reps}):
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        lat.append(time.perf_counter() - t0)
    return [round(x, 4) for x in lat]

# warmups (arrow datasets / python imports outside the timing)
eng.search(MSM_Q, k=10, mode="or", minimum_should_match=2, as_pandas=True)
eng.cardinality("lang", "common_util")
eng.top_hits("lang", "common_util", 3, groups=5)

tracker = spark.sparkContext.statusTracker()
jobs_before = len(tracker.getJobIdsForGroup(None))
serve_lats = {{
    "msm": lats(lambda: eng.search(
        MSM_Q, k=10, mode="or", minimum_should_match=2, as_pandas=True)),
    "boost": lats(lambda: eng.search(
        MSM_Q, k=10, mode="or",
        boosts={{"query_300": 2.5, "batch_450": 0.5}}, as_pandas=True)),
}}
serve_jobs = len(tracker.getJobIdsForGroup(None)) - jobs_before
agg_lats = {{
    "cardinality": lats(lambda: eng.cardinality("lang", "common_util")),
    "percentiles": lats(lambda: eng.percentiles(
        "doclen", (50.0, 95.0), "common_util")),
    "range_agg": lats(lambda: eng.range_agg(
        "doclen", [(None, 40.0), (40.0, 80.0), (80.0, None)],
        "common_util")),
    "top_hits": lats(lambda: eng.top_hits(
        "lang", "common_util", 3, groups=5)),
}}
res = dict(cpus=cpus, n_docs=n, build_secs=round(build_secs, 2),
           route=route, serve_jobs_during_measurement=serve_jobs)
for k, v in {{**serve_lats, **agg_lats}}.items():
    res[f"{{k}}_lats"] = v
shutil.rmtree(root, ignore_errors=True)
print("RESULT " + json.dumps(res))
spark.stop()
"""

OPS_SERVE = ("msm", "boost")
OPS_AGG = ("cardinality", "percentiles", "range_agg", "top_hits")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument(
        "--rounds", type=int, default=1,
        help="repeat the whole ABBA sequence N times; the best-window "
             "median then draws from 2N windows per level (the lower "
             "envelope converges to the intrinsic cost under host noise)",
    )
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_NEW_OPS_SCALE.json")
    )
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    lo, hi = min(levels), max(levels)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    workdir = os.path.join(base, "gofias_newopsscale")
    os.makedirs(workdir, exist_ok=True)

    # ABBA: monotone drift hits levels symmetrically
    order = [lo, hi, hi, lo] * max(1, args.rounds)
    with measurement_lock():
        corpus = gen_corpus(args.docs, base)
        results: dict = {}
        for cpus in order:
            code = WORKER.format(
                repo=REPO, cpus=cpus, corpus=corpus, reps=args.reps,
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
                        results[key]["window_medians"] = {}
                    else:
                        for q in OPS_SERVE + OPS_AGG:
                            results[key][f"{q}_lats"].extend(r[f"{q}_lats"])
                        results[key]["serve_jobs_during_measurement"] += r[
                            "serve_jobs_during_measurement"
                        ]
                    for q in OPS_SERVE + OPS_AGG:
                        xs = sorted(r[f"{q}_lats"])
                        results[key]["window_medians"].setdefault(
                            q, []
                        ).append(xs[len(xs) // 2])

    def p50(key: str, q: str) -> float:
        """Best-window median: each level runs in two separate ABBA
        windows; a shared-hypervisor stall in ONE window (documented in
        BASELINE.md §3 — e.g. every op of this harness slowing 2-4x at
        once with ZERO Spark jobs scheduled) would otherwise masquerade
        as a core-count effect. The lower envelope is the engine's
        intrinsic cost — host stalls only ever add."""
        return min(results[key]["window_medians"][q])

    for key in results:
        for q in OPS_SERVE + OPS_AGG:
            results[key][f"{q}_p50_secs"] = p50(key, q)

    doc = {
        "input": {"n_docs": args.docs, "corpus": corpus,
                  "run_order": [f"local{c}" for c in order],
                  "msm_query": "query_300 batch_450 search_200 (msm=2)",
                  "statistic": "best-window median per level (2 windows)"},
        **results,
        # serve-tier ops: core-count independent (driver-side, zero jobs),
        # 5% noise band like run_scaling's query criterion
        "query_scaling": {
            q: {
                "p50_from": p50(f"local{lo}", q),
                "p50_to": p50(f"local{hi}", q),
                "pass": p50(f"local{hi}", q) <= 1.05 * p50(f"local{lo}", q),
            }
            for q in OPS_SERVE
        },
        # distributed aggs: latency may legitimately improve with cores;
        # the gate is only non-regression (hi <= 1.25 x lo)
        "agg_scaling": {
            q: {
                "p50_from": p50(f"local{lo}", q),
                "p50_to": p50(f"local{hi}", q),
                "pass": p50(f"local{hi}", q) <= 1.25 * p50(f"local{lo}", q),
            }
            for q in OPS_AGG
        },
        "zero_jobs_serve_tier": {
            f"local{c}": results[f"local{c}"][
                "serve_jobs_during_measurement"
            ]
            for c in (lo, hi)
        },
    }
    json.dump(doc, open(args.out, "w"), indent=2)
    print(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
