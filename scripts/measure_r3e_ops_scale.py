"""Two-core-count measurement for the round-3e operators (this session's
additions: span_first, match_bool_prefix, boosting, rare_terms,
multi_terms, code_quality_flags, repo_rollup, temperature_sample,
date_range_agg).

Query-surface ops answered driver-side on the warm serve/local tiers
(span_first, bool_prefix, rare_terms) are measured as warm p50 with the
core-count INDEPENDENCE criterion (5% noise band, matching run_scaling's
query criterion). Distributed corpus ops (boosting's full-match scoring,
multi_terms' matched-id join, the map-stage curation ops, date_range's
conditional-sum pass) are measured as cold wall with the NON-REGRESSION
criterion (wall32 <= 1.05 x wall8); the 8->32 speedup is reported
informatively and a host_control bracket is recorded (BASELINE.md §3).

Usage: python scripts/measure_r3e_ops_scale.py [--docs 500000]
       [--levels 8,32] [--out BENCH_R3E_OPS_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_scaling import gen_corpus, measurement_lock, run_control  # noqa: E402

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.operators.events import date_range_agg
from gofias_spark.operators.sampling import temperature_sample
from gofias_spark.operators.textstats import code_quality_flags, repo_rollup
from gofias_spark.query.engine import SearchEngine
from gofias_spark.session import get_spark

cpus = {cpus}
spark = get_spark("r3eopsscale", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
docs = spark.read.parquet({corpus!r})
n = docs.count()

def wall(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)

ident = docs.withColumn("doc_id",
                        F.xxhash64("repo", "path", "commit"))
corpus_walls = {{}}
corpus_walls["code_flags"] = wall(
    lambda: code_quality_flags(ident).filter("code_pass").count())
corpus_walls["repo_rollup"] = wall(
    lambda: repo_rollup(ident).count())
corpus_walls["temperature_sample"] = wall(
    lambda: temperature_sample(ident, alpha=0.5, group_col="lang").count())
ev = ident.select(
    F.col("doc_id").alias("event_id"),
    F.timestamp_seconds(F.lit(1700000000)
                        + F.pmod(F.col("doc_id"), F.lit(n))).alias("ts"),
)
corpus_walls["date_range"] = wall(
    lambda: date_range_agg(ev, [
        (None, "2023-11-20"), ("2023-11-20", "2023-11-25"),
        ("2023-11-22", None)
    ]).count())

# ---- index-backed ops
root = tempfile.mkdtemp(dir={workdir!r}, prefix=f"r3eidx{{cpus}}_")
t0 = time.perf_counter()
build_segment(spark, docs, root,
              IndexConfig(n_buckets={n_buckets}, block_size=128,
                          positions=True))
build_secs = time.perf_counter() - t0
eng = SearchEngine(spark, root)
eng.warm(local_max_blocks=0)
assert eng._serve is not None

# distributed ops measured as cold wall (they score full match sets /
# join doc_meta — corpus-shaped work)
corpus_walls["boosting"] = wall(
    lambda: eng.search_boosting("query_300 batch_450", "common_util",
                                0.5, k=10))
corpus_walls["multi_terms"] = wall(
    lambda: eng.multi_terms(["lang", "repo"], "common_util", k=10))

def lats(fn, reps={reps}):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 4))
    return out

# warmups
eng.search_span_first("query_300 batch_450", 64, k=10)
eng.search_bool_prefix("query_300 batch_45", k=10, mode="and")
eng.rare_terms("doclen", "common_util", max_doc_count=2)

tracker = spark.sparkContext.statusTracker()
jobs_before = len(tracker.getJobIdsForGroup(None))
qlats = {{
    "span_first": lats(lambda: eng.search_span_first(
        "query_300 batch_450", 64, k=10, as_pandas=True)),
    "bool_prefix": lats(lambda: eng.search_bool_prefix(
        "query_300 batch_45", k=10, mode="and", as_pandas=True)),
    "rare_terms": lats(lambda: eng.rare_terms(
        "doclen", "common_util", max_doc_count=2)),
}}
serve_jobs = len(tracker.getJobIdsForGroup(None)) - jobs_before

res = dict(cpus=cpus, n_docs=n, build_secs=round(build_secs, 2),
           serve_jobs_during_measurement=serve_jobs,
           corpus_walls=corpus_walls)
for k, v in qlats.items():
    res[f"{{k}}_lats"] = v
shutil.rmtree(root, ignore_errors=True)
print("RESULT " + json.dumps(res))
spark.stop()
"""

QUERY_OPS = ("span_first", "bool_prefix", "rare_terms")
CORPUS_OPS = ("code_flags", "repo_rollup", "temperature_sample",
              "date_range", "boosting", "multi_terms")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_R3E_OPS_SCALE.json")
    )
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    lo, hi = min(levels), max(levels)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    workdir = os.path.join(base, "gofias_r3eopsscale")
    os.makedirs(workdir, exist_ok=True)

    order = [lo, hi, hi, lo] * max(1, args.rounds)
    with measurement_lock():
        control_before = run_control((lo, hi))
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
                if not line.startswith("RESULT "):
                    continue
                r = json.loads(line[7:])
                key = f"local{cpus}"
                if key not in results:
                    results[key] = r
                    results[key]["window_medians"] = {}
                    results[key]["corpus_wall_windows"] = {
                        q: [r["corpus_walls"][q]] for q in CORPUS_OPS
                    }
                else:
                    for q in QUERY_OPS:
                        results[key][f"{q}_lats"].extend(r[f"{q}_lats"])
                    for q in CORPUS_OPS:
                        results[key]["corpus_wall_windows"][q].append(
                            r["corpus_walls"][q]
                        )
                    results[key]["serve_jobs_during_measurement"] += r[
                        "serve_jobs_during_measurement"
                    ]
                for q in QUERY_OPS:
                    xs = sorted(r[f"{q}_lats"])
                    results[key]["window_medians"].setdefault(q, []).append(
                        xs[len(xs) // 2]
                    )
        control_after = run_control((lo, hi))

    def p50(key: str, q: str) -> float:
        # best-window value per level: host stalls only ever add
        return min(results[key]["window_medians"][q])

    def cwall(key: str, q: str) -> float:
        return min(results[key]["corpus_wall_windows"][q])

    for key in results:
        for q in QUERY_OPS:
            results[key][f"{q}_p50_secs"] = p50(key, q)
        for q in CORPUS_OPS:
            results[key][f"{q}_wall_secs"] = cwall(key, q)

    doc = {
        "input": {"n_docs": args.docs, "corpus": corpus,
                  "run_order": [f"local{c}" for c in order],
                  "statistic": "best-window value per level "
                               f"({2 * max(1, args.rounds)} windows)"},
        "host_control": {"before": control_before, "after": control_after},
        **results,
        "query_scaling": {
            q: {
                "p50_from": p50(f"local{lo}", q),
                "p50_to": p50(f"local{hi}", q),
                "pass": p50(f"local{hi}", q) <= 1.05 * p50(f"local{lo}", q),
            }
            for q in QUERY_OPS
        },
        "corpus_scaling": {
            q: {
                "wall_from": cwall(f"local{lo}", q),
                "wall_to": cwall(f"local{hi}", q),
                "speedup": round(
                    cwall(f"local{lo}", q) / max(cwall(f"local{hi}", q),
                                                 1e-9), 2
                ),
                "pass": cwall(f"local{hi}", q)
                <= 1.05 * cwall(f"local{lo}", q),
            }
            for q in CORPUS_OPS
        },
        "zero_jobs_serve_tier": {
            f"local{c}": results[f"local{c}"][
                "serve_jobs_during_measurement"
            ]
            for c in (lo, hi)
        },
    }
    doc["pass"] = all(
        v["pass"] for v in doc["query_scaling"].values()
    ) and all(v["pass"] for v in doc["corpus_scaling"].values())
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({k: doc[k] for k in
                      ("query_scaling", "corpus_scaling", "pass")}))


if __name__ == "__main__":
    main()
