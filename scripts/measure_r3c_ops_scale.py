"""Two-core-count measurement for the round-3c operators.

Query-surface ops (rescore / function_score / collapse) are measured as
warm p50 on a positional 500k-doc index: on the serve tier they are
driver-side, so the criterion is core-count INDEPENDENCE (5% noise band,
same as run_scaling's query criterion). Corpus ops (repetition features,
stratified sample, sequence packing, percolate, date_histogram,
sessionize) are measured as cold wall time over the full corpus: they are
map/shuffle-light distributed jobs, so the criterion is NON-REGRESSION
with cores (wall32 <= 1.05 x wall8) and the 8->32 speedup is reported
informatively (under host contention no wide workload speeds up — see
BASELINE.md §3's control methodology; a host_control bracket is recorded
with the run).

Usage: python scripts/measure_r3c_ops_scale.py [--docs 500000]
       [--levels 8,32] [--out BENCH_R3C_OPS_SCALE.json]
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
from gofias_spark.operators.events import date_histogram, sessionize
from gofias_spark.operators.percolate import percolate
from gofias_spark.operators.dedup import duplicate_spans
from gofias_spark.operators.sampling import pack_sequences, stratified_sample
from gofias_spark.operators.textstats import (classifier_quality_score,
                                              repetition_features)
from gofias_spark.query.engine import SearchEngine
from gofias_spark.session import get_spark

cpus = {cpus}
spark = get_spark("r3copsscale", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
docs = spark.read.parquet({corpus!r})
n = docs.count()

# ---- corpus ops: cold wall over the full corpus (count() materializes)
def wall(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)

ident = docs.withColumn("doc_id",
                        F.xxhash64("repo", "path", "commit"))
corpus_walls = {{}}
corpus_walls["repetition"] = wall(
    lambda: repetition_features(ident).count())
corpus_walls["stratified_sample"] = wall(
    lambda: stratified_sample(ident, {{"en": 0.3, "de": 0.1}},
                              stratum_col="lang").count())
corpus_walls["pack_sequences"] = wall(
    lambda: pack_sequences(ident, budget=4096,
                           num_parts=max(8, cpus)).count())
corpus_walls["percolate"] = wall(
    lambda: percolate(ident, {{"q1": "query_300 batch_450",
                               "q2": "common_util",
                               "q3": "search_200"}}).count())
corpus_walls["substring_spans"] = wall(
    lambda: duplicate_spans(ident, n=20).count())
corpus_walls["classifier_score"] = wall(
    lambda: classifier_quality_score(ident).count())
# synthetic events derived from the corpus ids: deterministic, no extra
# input; ~n events across 10k users over ~n seconds
ev = ident.select(
    F.col("doc_id").alias("event_id"),
    F.timestamp_seconds(F.lit(1700000000)
                        + F.pmod(F.col("doc_id"), F.lit(n))).alias("ts"),
    F.pmod(F.col("doc_id"), F.lit(10_000)).alias("user_id"),
    F.when(F.pmod(F.col("doc_id"), 2) == 0, "click").otherwise("view")
     .alias("event_type"),
    (F.pmod(F.col("doc_id"), 100) / 10.0).alias("value"),
)
corpus_walls["date_histogram"] = wall(
    lambda: date_histogram(ev, "hour").count())
corpus_walls["sessionize"] = wall(
    lambda: sessionize(ev, gap_minutes=30).count())

# ---- query ops: warm p50 on a positional index (serve tier)
root = tempfile.mkdtemp(dir={workdir!r}, prefix=f"r3cidx{{cpus}}_")
t0 = time.perf_counter()
build_segment(spark, docs, root,
              IndexConfig(n_buckets={n_buckets}, block_size=128,
                          positions=True))
build_secs = time.perf_counter() - t0
eng = SearchEngine(spark, root)
eng.warm(local_max_blocks=0)
assert eng._serve is not None
route = eng.explain_query("query_300 batch_450")["route"]
assert route != "empty", route

def lats(fn, reps={reps}):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 4))
    return out

# warmups
eng.rescore("query_300 batch_450", "query_300 batch_450", k=10,
            window_size=30, as_pandas=True)
eng.function_score("common_util", k=10, as_pandas=True)
eng.collapse("lang", "common_util", k=5)

tracker = spark.sparkContext.statusTracker()
jobs_before = len(tracker.getJobIdsForGroup(None))
qlats = {{
    "rescore": lats(lambda: eng.rescore(
        "query_300 batch_450", "query_300 batch_450", k=10,
        window_size=30, rescore_weight=2.0, as_pandas=True)),
    "function_score": lats(lambda: eng.function_score(
        "common_util", k=10, field="doclen", modifier="log1p",
        factor=0.1, as_pandas=True)),
    "collapse": lats(lambda: eng.collapse("lang", "common_util", k=5)),
}}
serve_jobs = len(tracker.getJobIdsForGroup(None)) - jobs_before

res = dict(cpus=cpus, n_docs=n, build_secs=round(build_secs, 2),
           route=route, serve_jobs_during_measurement=serve_jobs,
           corpus_walls=corpus_walls)
for k, v in qlats.items():
    res[f"{{k}}_lats"] = v
shutil.rmtree(root, ignore_errors=True)
print("RESULT " + json.dumps(res))
spark.stop()
"""

QUERY_OPS = ("rescore", "function_score", "collapse")
CORPUS_OPS = ("repetition", "stratified_sample", "pack_sequences",
              "percolate", "substring_spans", "classifier_score",
              "date_histogram", "sessionize")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_R3C_OPS_SCALE.json")
    )
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    lo, hi = min(levels), max(levels)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    workdir = os.path.join(base, "gofias_r3copsscale")
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
        # best-window median: host stalls only ever add (BASELINE.md §3)
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
