"""Query-latency-vs-core-count evidence (VERDICT r02 #1 done-criterion),
measured standalone so it does not need the (host-gated) full build-scaling
window: ONE shared prebuilt 2M-doc index, then the corrected query mix
(run_scaling.py WORKER / BASELINE.md §3d) timed at local[8] and local[32]
in ABBA order (lo,hi,hi,lo — monotone host drift hits both levels
symmetrically), host-control bracketed.

Two claims, each with its own evidence kind:
  * serve-tier queries run ZERO Spark jobs (asserted via statusTracker per
    level) — the executed instruction stream is literally identical at 8
    and 32 cores, so core-count independence is architectural, not a
    wall-clock coincidence;
  * the distributed-route query (Σ df over the serve budget) must not get
    SLOWER with more cores: pass when median(32) <= 1.05 x median(8)
    (the r1/r2 anti-scaling lived exactly here).

Writes BENCH_QUERY_SCALING.json. Holds the shared measurement marker so
the window hunter never launches a build over the run.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_scaling import gen_corpus, measurement_lock, run_control  # noqa: E402

QS = ["query_300 batch_450", "common_util", "search_200", "func index_0",
      "func index_0 common_util"]

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gofias_spark.query.engine import SearchEngine
from gofias_spark.session import get_spark

cpus = {cpus}
spark = get_spark("qscale", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
eng = SearchEngine(spark, {idx!r})
eng.warm()
eng.search("warmup", k=1).collect()
qs = {qs!r}
routes = {{q: eng.explain_query(q)["route"] for q in qs}}
tracker = spark.sparkContext.statusTracker()
per_q = {{q: [] for q in qs}}
jobs = {{q: 0 for q in qs}}
for _ in range({reps}):
    for q in qs:
        before = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        eng.search(q, k=10, as_pandas=True)
        per_q[q].append(time.perf_counter() - t0)
        jobs[q] += len(tracker.getJobIdsForGroup(None)) - before
print("RESULT " + json.dumps({{
    "cpus": cpus,
    "routes": routes,
    "median": {{q: round(sorted(v)[len(v) // 2], 4) for q, v in per_q.items()}},
    "all": {{q: [round(x, 4) for x in v] for q, v in per_q.items()}},
    "spark_jobs": jobs,
}}))
spark.stop()
"""


def build_index(corpus: str, idx: str) -> None:
    if os.path.exists(os.path.join(idx, "manifest.json")):
        return
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from gofias_spark.session import get_spark
from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
spark = get_spark("qscalebuild", master="local[32]", shuffle_partitions=32)
build_segment(spark, spark.read.parquet({corpus!r}), {idx!r},
              IndexConfig(n_buckets=512, block_size=128))
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True, text=True)


def run_level(cpus: int, idx: str, reps: int) -> dict:
    code = WORKER.format(repo=REPO, cpus=cpus, idx=idx, qs=QS, reps=reps)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed rc={r.returncode}: {r.stderr[-800:]}")


def merge_passes(a: dict, b: dict) -> dict:
    out = dict(a)
    out["all"] = {q: a["all"][q] + b["all"][q] for q in a["all"]}
    out["median"] = {
        q: round(statistics.median(v), 4) for q, v in out["all"].items()
    }
    out["spark_jobs"] = {
        q: a["spark_jobs"][q] + b["spark_jobs"][q] for q in a["spark_jobs"]
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_QUERY_SCALING.json")
    )
    args = ap.parse_args()

    base = "/dev/shm" if os.path.exists("/dev/shm") else "/tmp"
    with measurement_lock():
        corpus = gen_corpus(args.docs, base)
        idx = os.path.join(base, f"gofias_qscale_idx_{args.docs}")
        build_index(corpus, idx)
        ctl_before = run_control()
        # ABBA: lo, hi, hi, lo
        lo1 = run_level(8, idx, args.reps)
        hi1 = run_level(32, idx, args.reps)
        hi2 = run_level(32, idx, args.reps)
        lo2 = run_level(8, idx, args.reps)
        ctl_after = run_control()

    lo, hi = merge_passes(lo1, lo2), merge_passes(hi1, hi2)
    serve_qs = [q for q, r in lo["routes"].items() if r == "serve"]
    dist_qs = [q for q, r in lo["routes"].items() if r == "distributed"]
    serve_p50 = {
        "from": round(statistics.median(
            [x for q in serve_qs for x in lo["all"][q]]), 4),
        "to": round(statistics.median(
            [x for q in serve_qs for x in hi["all"][q]]), 4),
    }
    result = {
        "input": {"n_docs": args.docs, "index": idx, "reps_per_pass": args.reps,
                  "order": "ABBA (8,32,32,8)", "queries": QS},
        "host_control": {"before": ctl_before, "after": ctl_after},
        "local8": lo,
        "local32": hi,
        "serve_tier": {
            "queries": serve_qs,
            "p50_from": serve_p50["from"],
            "p50_to": serve_p50["to"],
            # architectural claim: zero jobs at BOTH levels -> the executed
            # instruction stream is identical; wall-clock deltas are host
            "spark_jobs_from": sum(lo["spark_jobs"][q] for q in serve_qs),
            "spark_jobs_to": sum(hi["spark_jobs"][q] for q in serve_qs),
            "pass": (
                sum(lo["spark_jobs"][q] for q in serve_qs) == 0
                and sum(hi["spark_jobs"][q] for q in serve_qs) == 0
            ),
        },
        "distributed": {
            "queries": dist_qs,
            "median_from": {q: lo["median"][q] for q in dist_qs},
            "median_to": {q: hi["median"][q] for q in dist_qs},
            "noise_tolerance": 1.05,
            "pass": all(
                hi["median"][q] <= 1.05 * lo["median"][q] for q in dist_qs
            ),
        },
    }
    result["pass"] = (
        result["serve_tier"]["pass"] and result["distributed"]["pass"]
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("serve_tier", "distributed", "pass")}, indent=2))


if __name__ == "__main__":
    main()
