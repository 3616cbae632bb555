"""Distributed positional plan at scale (r3 verdict #5): phrase + span
p50 on a 2M-doc POSITIONAL index with the distributed route FORCED
(``serve=False``, ``warm(local_max_blocks=0)``), at local[8] and
local[32] in ABBA order, host-control bracketed.

Two claims:
  * the distributed positional path must not get SLOWER with cores:
    pass when p50(32) <= 1.05 x p50(8) per op;
  * positions must beat the positionless content-verify fallback at the
    same scale/cores: pass when positional p50 <= fallback p50 at
    local[32] (the fallback re-reads doc content through a JVM regex;
    the positional plan reads MBs of position blocks instead — BASELINE
    §3's scale claim, measured rather than argued).

Writes BENCH_PHRASE_SCALE.json. Holds the measurement marker.
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

PHRASE = "query_300 batch_450"
SPAN_END = 64

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from gofias_spark.query.engine import SearchEngine
from gofias_spark.session import get_spark

cpus = {cpus}
spark = get_spark("phrasescale", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
eng = SearchEngine(spark, {idx!r}, serve=False)
eng.warm(local_max_blocks=0)
assert eng._local_blocks is None and eng._serve is None

def lats(fn, reps={reps}):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 4))
    return out

eng.search_phrase({phrase!r}, k=10, as_pandas=True)  # warmup
res = {{"cpus": cpus,
        "phrase_lats": lats(lambda: eng.search_phrase(
            {phrase!r}, k=10, as_pandas=True))}}
if {with_span}:
    eng.search_span_first({phrase!r}, {span_end}, k=10, as_pandas=True)
    res["span_first_lats"] = lats(lambda: eng.search_span_first(
        {phrase!r}, {span_end}, k=10, as_pandas=True))
print("RESULT " + json.dumps(res))
spark.stop()
"""


def build_index(corpus: str, idx: str, positions: bool) -> None:
    if os.path.exists(os.path.join(idx, "manifest.json")):
        return
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from gofias_spark.session import get_spark
from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
spark = get_spark("phrasebuild", master="local[32]", shuffle_partitions=32)
build_segment(spark, spark.read.parquet({corpus!r}), {idx!r},
              IndexConfig(n_buckets=512, block_size=128,
                          positions={positions!r}))
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True, text=True)


def run_level(cpus: int, idx: str, reps: int, with_span: bool) -> dict:
    code = WORKER.format(repo=REPO, cpus=cpus, idx=idx, reps=reps,
                         phrase=PHRASE, span_end=SPAN_END,
                         with_span=with_span)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed rc={r.returncode}: {r.stderr[-800:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--attempts", type=int, default=1,
                    help="accepted for hunter compatibility; one ABBA "
                         "pass per invocation")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_PHRASE_SCALE.json")
    )
    args = ap.parse_args()

    base = "/dev/shm" if os.path.exists("/dev/shm") else "/tmp"
    with measurement_lock():
        corpus = gen_corpus(args.docs, base)
        idx_pos = os.path.join(base, f"gofias_phrase_pos_{args.docs}")
        idx_nopos = os.path.join(base, f"gofias_phrase_nopos_{args.docs}")
        build_index(corpus, idx_pos, positions=True)
        build_index(corpus, idx_nopos, positions=False)
        ctl_before = run_control()
        # ABBA on the positional index
        lo1 = run_level(8, idx_pos, args.reps, with_span=True)
        hi1 = run_level(32, idx_pos, args.reps, with_span=True)
        hi2 = run_level(32, idx_pos, args.reps, with_span=True)
        lo2 = run_level(8, idx_pos, args.reps, with_span=True)
        # content-verify fallback comparison at local[32]
        fb = run_level(32, idx_nopos, args.reps, with_span=False)
        ctl_after = run_control()

    def p50(*passes, key):
        return round(statistics.median(
            [x for p in passes for x in p[key]]), 4)

    ops = {}
    for op, key in (("phrase", "phrase_lats"),
                    ("span_first", "span_first_lats")):
        frm = p50(lo1, lo2, key=key)
        to = p50(hi1, hi2, key=key)
        ops[op] = {
            "p50_from": frm, "p50_to": to,
            "noise_tolerance": 1.05,
            "pass": to <= 1.05 * frm,
        }
    fb_p50 = p50(fb, key="phrase_lats")
    result = {
        "input": {"n_docs": args.docs, "index": idx_pos,
                  "reps_per_pass": args.reps, "order": "ABBA (8,32,32,8)",
                  "phrase": PHRASE, "span_end": SPAN_END,
                  "route": "distributed forced (serve=False, "
                           "local_max_blocks=0)"},
        "host_control": {"before": ctl_before, "after": ctl_after},
        "local8": {"phrase_lats": lo1["phrase_lats"] + lo2["phrase_lats"],
                   "span_first_lats": lo1["span_first_lats"]
                   + lo2["span_first_lats"]},
        "local32": {"phrase_lats": hi1["phrase_lats"] + hi2["phrase_lats"],
                    "span_first_lats": hi1["span_first_lats"]
                    + hi2["span_first_lats"]},
        "query_scaling": ops,
        "vs_content_verify_fallback": {
            "fallback_phrase_p50_local32": fb_p50,
            "positional_phrase_p50_local32": ops["phrase"]["p50_to"],
            "pass": ops["phrase"]["p50_to"] <= fb_p50,
        },
    }
    ceil = min(ctl_before["mem"]["eff"], ctl_after["mem"]["eff"])
    result["bracket_ceiling"] = round(ceil, 3)
    result["bracket_valid"] = ceil >= 0.5
    result["pass"] = (
        result["bracket_valid"]
        and all(o["pass"] for o in ops.values())
        and result["vs_content_verify_fallback"]["pass"]
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("query_scaling", "vs_content_verify_fallback",
                       "pass")}, indent=2))


if __name__ == "__main__":
    main()
