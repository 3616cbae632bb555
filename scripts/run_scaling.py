"""Scaling-efficiency evidence (north_rule: >= 0.8 from N to 4N executors).

The sandbox has no multi-node cluster, so per driver instruction the
criterion is evidenced by running the IDENTICAL build+query job at two
parallelism levels — local[8] and local[32] (and optionally local[2]) — on
the same input, reporting throughput at both plus
eff = (thr_4N / thr_N) / 4.

Methodology notes (documented in BASELINE.md):
  * The host VM shows heavy run-to-run noise (identical jobs vary ~2x) and
    a large first-touch page-fault cost (85-90% kernel time while the JVM +
    32 python workers commission memory through the hypervisor). Each level
    therefore runs one un-timed warmup build, then `--reps` timed builds,
    and reports the MEDIAN.
  * Input corpus + index roots live on tmpfs (/dev/shm) when available: in
    local mode every "executor" shares one disk, an artifact a real N-node
    cluster does not have (disks scale with executors). Absolute-throughput
    numbers on the real disk come from bench.py.

Usage: python scripts/run_scaling.py [--docs 2000000] [--reps 3]
       [--levels 8,32] [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine
from gofias_spark.session import get_spark

cpus = {cpus}
reps = {reps}
workdir = {workdir!r}
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(8, cpus))
docs = spark.read.parquet({corpus!r})
n = docs.count()
cfg = IndexConfig(n_buckets={n_buckets}, block_size=128)

# un-timed warmup: commissions JVM heap / python workers / JIT through the
# hypervisor's first-touch page faults, which otherwise dominate run 1
wroot = tempfile.mkdtemp(dir=workdir, prefix="warm_")
build_segment(spark, docs, wroot, cfg)
shutil.rmtree(wroot, ignore_errors=True)

builds = []
last_root = None
for rep in range(reps):
    root = tempfile.mkdtemp(dir=workdir, prefix=f"idx{{rep}}_")
    t0 = time.perf_counter()
    build_segment(spark, docs, root, cfg)
    builds.append(time.perf_counter() - t0)
    if last_root:
        shutil.rmtree(last_root, ignore_errors=True)
    last_root = root

eng = SearchEngine(spark, last_root)
eng.warm()
eng.search("warmup", k=1).collect()
# Corpus-correct query mix (the pre-r3 set hit zero-df terms: the
# distributed generator ties each ident's number range to its word —
# "search_2" cannot occur — so 3 of 4 old queries measured the EMPTY
# route's dispatch, not retrieval; BASELINE.md §3d). df mix at 2M docs:
#   query_300+batch_450  ~127k  serve (AND, two mid terms)
#   search_200           ~93k   serve (single mid term)
#   common_util          1.0M   serve (planted hot term, at the budget)
#   func+index_0         ~3.6M  distributed (two Zipf-head keywords,
#                               excluded from the serve cache)
qs = ["query_300 batch_450", "common_util", "search_200", "func index_0"]
routes = {{q: eng.explain_query(q)["route"] for q in qs}}
per_q = {{q: [] for q in qs}}
lat = []
for _ in range(6):
    for q in qs:
        t0 = time.perf_counter()
        eng.search(q, k=10, as_pandas=True)
        dt = time.perf_counter() - t0
        lat.append(dt)
        per_q[q].append(dt)
lat.sort()
# filtered + composite-sorted latencies (serve tier's filtered budget or
# distributed fallback, whichever the router picks at this scale)
lat_f = []
for _ in range(6):
    for q in qs:
        t0 = time.perf_counter()
        eng.search(q, k=10, filters={{"doclen": {{"gte": 40}}}}).collect()
        lat_f.append(time.perf_counter() - t0)
lat_f.sort()
t0 = time.perf_counter()
eng.search("query_300 batch_450", k=10,
           sort_by=[("lang", "asc"), ("_score", "desc")]).collect()
sorted_secs = time.perf_counter() - t0
shutil.rmtree(last_root, ignore_errors=True)
builds_sorted = sorted(builds)
med = builds_sorted[len(builds_sorted) // 2]
print("RESULT " + json.dumps({{
    "cpus": cpus, "n_docs": n,
    "build_secs_all": [round(b, 1) for b in builds],
    "build_secs_median": round(med, 2),
    "files_per_sec": round(n / med, 1),
    "query_p50_secs": round(lat[len(lat) // 2], 4),
    "query_p50_filtered_secs": round(lat_f[len(lat_f) // 2], 4),
    "query_routes": routes,
    "query_median_by_query": {{
        q: round(sorted(v)[len(v) // 2], 4) for q, v in per_q.items()
    }},
    "query_sorted_secs": round(sorted_secs, 4)}}))
spark.stop()
"""


def gen_corpus(n_docs: int, base: str) -> str:
    """Materialize the deterministic synthetic corpus once (shared input)."""
    path = os.path.join(base, f"gofias_scaling_corpus_{n_docs}")
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


def run_level(cpus: int, corpus: str, n_buckets: int, reps: int, workdir: str) -> dict:
    code = WORKER.format(
        repo=REPO, cpus=cpus, corpus=corpus, n_buckets=n_buckets, reps=reps,
        workdir=workdir,
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


CONTROL = r"""
import json, sys, time
import multiprocessing as mp

def mem_work(_):
    # memory-heavy: large sort/copy churn — the regime index builds live in
    import numpy as np
    t0 = time.perf_counter()
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 40, 6_000_000)
    for _ in range(3):
        b = a.copy(); b.sort(); d = np.diff(b); s = d.cumsum()
    return time.perf_counter() - t0

def cpu_work(_):
    # cache-resident ALU: measures raw vCPU scaling with no memory churn
    import numpy as np
    t0 = time.perf_counter()
    a = np.arange(200_000, dtype=np.uint64)
    mul = np.uint64(0x9E3779B97F4A7C15)
    inc = np.uint64(1)
    sh = np.uint64(33)
    for _ in range(1500):
        a = a * mul + inc
        a ^= a >> sh
    float(a.sum())
    return time.perf_counter() - t0

if __name__ == "__main__":
    lo, hi = {lo}, {hi}
    res = {{}}
    for name, fn in (("mem", mem_work), ("cpu", cpu_work)):
        out = {{}}
        for n in (lo, hi):
            with mp.Pool(n) as p:
                t0 = time.perf_counter()
                p.map(fn, range(n))
                out[n] = time.perf_counter() - t0
        res[name] = {{
            f"wall{{lo}}": round(out[lo], 2), f"wall{{hi}}": round(out[hi], 2),
            "eff": round((hi / out[hi]) / (lo / out[lo]) / (hi / lo), 3)}}
    # legacy top-level fields mirror the memory control
    print("CONTROL " + json.dumps(
        {{**res["mem"], "levels": [lo, hi], "cpu": res["cpu"],
          "mem": res["mem"]}}))
"""


MEASUREMENT_MARKER = "/tmp/gofias_scaling_running"


def wait_for_quiet(max_wait_secs: float = 1200.0,
                   stale_after_secs: float = 2400.0) -> None:
    """Block while another measurement holds the marker file.

    bench.py and the scaling hunter both produce host-sensitive numbers on
    a shared 32-vCPU guest; running one over the other poisons BOTH runs
    and their control brackets. Each waits for the other (bounded), and a
    marker older than ``stale_after_secs`` is treated as a crash leftover
    and ignored."""
    import time as _time
    deadline = _time.time() + max_wait_secs
    while _time.time() < deadline:
        try:
            age = _time.time() - os.path.getmtime(MEASUREMENT_MARKER)
        except OSError:
            return
        if age > stale_after_secs:
            return
        print(f"waiting for concurrent measurement ({MEASUREMENT_MARKER}, "
              f"age {age:.0f}s)", file=sys.stderr, flush=True)
        _time.sleep(max(0.1, min(15.0, deadline - _time.time())))


class measurement_lock:
    """Context manager: wait for quiet, then hold the marker while
    measuring. Best-effort (no atomicity needed — the marker is advisory
    coordination between this repo's own tools, not a mutex)."""

    def __enter__(self):
        wait_for_quiet()
        with open(MEASUREMENT_MARKER, "w") as f:
            f.write(f"{os.getpid()}\n")
        # heartbeat: a full 2M-doc x 2-level x 5-rep run easily exceeds
        # the 2400s staleness cutoff; without refreshing the mtime the
        # other tools would treat the marker as a crash leftover and
        # launch 32-way load over the in-flight measurement
        import threading

        self._stop = threading.Event()

        def beat():
            while not self._stop.wait(300):
                try:
                    os.utime(MEASUREMENT_MARKER)
                except OSError:
                    return

        self._beat = threading.Thread(target=beat, daemon=True)
        self._beat.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        try:
            os.remove(MEASUREMENT_MARKER)
        except OSError:
            pass
        return False


def run_control(levels: tuple[int, int] = (8, 32)) -> dict:
    """Host-ceiling control: an identical fixed numpy workload (no Spark,
    no I/O) run at ``levels[0]``-way and ``levels[1]``-way process
    parallelism (default 8/32, matching the default engine levels). On an
    idle host it scales near-perfectly; under hypervisor contention
    (lock-holder preemption amplifies with vCPU count) NO wide workload
    scales — the control documents which regime the measurement ran in, so
    a low engine efficiency can be attributed to the host when the control
    is also low."""
    out = subprocess.run(
        [sys.executable, "-c", CONTROL.format(lo=levels[0], hi=levels[1])],
        capture_output=True, text=True,
        check=True, env={**os.environ,
                         "MALLOC_MMAP_THRESHOLD_": "1073741824",
                         "MALLOC_TRIM_THRESHOLD_": "1073741824",
                         "MALLOC_MMAP_MAX_": "0"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("CONTROL "):
            return json.loads(line[len("CONTROL "):])
    raise RuntimeError("no CONTROL line")


def bracket_ceiling(cand: dict) -> float:
    """min(before, after) mem-control efficiency of the artifact's host
    bracket — the ceiling any engine number in that window must be read
    against (inf when the artifact carries no controls)."""
    hc = cand.get("host_control")
    if not hc:
        return float("inf")

    def mem_eff(side: dict) -> float:
        # legacy bracket shape (round-2 artifacts, pre cpu/mem split):
        # the control WAS the mem-regime sort/copy control, recorded as a
        # top-level eff — read it as the mem ceiling so --promote works
        # on archived candidates too
        return side["mem"]["eff"] if "mem" in side else side["eff"]

    return min(mem_eff(hc["before"]), mem_eff(hc["after"]))


def normalized(cand: dict) -> tuple[float, float]:
    """(raw efficiency, efficiency / bracketing mem-control ceiling)."""
    eff = cand["scaling_efficiency"]
    ceil = bracket_ceiling(cand)
    if ceil == float("inf"):
        return eff, eff
    return eff, (eff / ceil if ceil > 0 else 0.0)


def gate(cand: dict, min_ceiling: float = 0.5) -> dict:
    """The promotion gate (BASELINE.md §3b), applied where the artifact is
    PRODUCED so a pass:true JSON never carries an uncertifiable bracket:
    pass = (raw eff >= 0.8 OR eff >= 0.8 x mem-control ceiling) AND the
    bracket is valid (ceiling >= min_ceiling — a collapsed control can
    neither normalize a low raw number nor certify a high one — and
    eff <= 1.3, since super-linear ratios mean a poisoned slow leg)."""
    eff, norm = normalized(cand)
    ceil = bracket_ceiling(cand)
    reasons = []
    if ceil == float("inf"):
        reasons.append("no control bracket: artifact predates the "
                       "host-control methodology")
        ceil = None
    elif ceil < min_ceiling:
        reasons.append(f"bracket invalid: ceiling {ceil} < {min_ceiling}")
    if eff > 1.3:
        reasons.append(f"eff {eff} super-linear beyond plausibility")
    valid = not reasons
    ok = valid and (eff >= 0.8 or norm >= 0.8)
    if valid and not ok:
        reasons.append(f"eff {eff} and normalized {norm:.3f} both < 0.8")
    return {
        "criterion": ("(eff >= 0.8 OR eff >= 0.8 x mem-control ceiling) "
                      "AND ceiling >= min_ceiling AND eff <= 1.3"),
        "raw_eff": eff,
        "control_normalized_eff": round(norm, 3),
        "ceiling": ceil,
        "min_ceiling": min_ceiling,
        "bracket_valid": valid,
        "pass": ok,
        **({"fail_reasons": reasons} if reasons else {}),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING.json"))
    args = ap.parse_args()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    workdir = os.path.join(base, "gofias_scaling_work")
    os.makedirs(workdir, exist_ok=True)
    with measurement_lock():
        _run_measurement(args, base, workdir)


def _run_measurement(args, base: str, workdir: str) -> None:
    corpus = gen_corpus(args.docs, base)
    levels = [int(x) for x in args.levels.split(",")]
    # bucket count sets the per-task Arrow working set (docs/bucket): ~4k
    # docs/bucket keeps each encode task's transient buffers near
    # cache-resident, which is what lets 32 concurrent workers coexist
    # (measured: 128 buckets -> 15.6k docs/task -> DRAM-bound, eff 0.48;
    # 512 buckets -> 3.9k docs/task -> eff ~0.7+ on the same input)
    n_buckets = 512
    lohi = (min(levels), max(levels))
    control_before = run_control(lohi)
    results = {}
    for cpus in levels:
        results[f"local{cpus}"] = run_level(
            cpus, corpus, n_buckets, args.reps, workdir
        )
    control_after = run_control(lohi)
    lo, hi = lohi
    thr_lo = results[f"local{lo}"]["files_per_sec"]
    thr_hi = results[f"local{hi}"]["files_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    result = {
        "input": {"n_docs": args.docs, "corpus": corpus,
                  "n_buckets": n_buckets, "reps": args.reps,
                  "storage": "tmpfs" if base == "/dev/shm" else "disk"},
        # host-ceiling controls bracketing the measurement: pure-numpy 8-way
        # vs 32-way scaling with NO Spark involved. When these are low, the
        # shared hypervisor cannot scale ANY 32-way workload in this window
        # (lock-holder preemption), and the engine number below is
        # host-bound, not engine-bound.
        "host_control": {"before": control_before, "after": control_after},
        **results,
        "scaling": {"from": lo, "to": hi,
                    "thr_from": thr_lo, "thr_to": thr_hi,
                    "efficiency": round(eff, 3), "pass": eff >= 0.8},
        # round-1 done-criterion: query latency must NOT rise with core
        # count. The serve tier answers driver-side (no Spark job), so the
        # work per query is IDENTICAL at every core count; the two p50s are
        # the same measurement twice and differ only by host noise — pass
        # within a 5% band (r1 measured 0.20s->0.72s, a 3.6x architectural
        # regression; 0.0550s vs 0.0562s is not that). The per-query
        # medians + routes in each level's block break the mix down; the
        # distributed-route query ("func index_0", Σ df over the serve
        # budget) is additionally compared on its own below — the residual
        # r1/r2 anti-scaling lived exactly there.
        "query_scaling": {
            "p50_from": results[f"local{lo}"]["query_p50_secs"],
            "p50_to": results[f"local{hi}"]["query_p50_secs"],
            "noise_tolerance": 1.05,
            "pass": (results[f"local{hi}"]["query_p50_secs"]
                     <= 1.05 * results[f"local{lo}"]["query_p50_secs"]),
            "distributed_query": {
                "query": "func index_0",
                "median_from": results[f"local{lo}"]
                .get("query_median_by_query", {}).get("func index_0"),
                "median_to": results[f"local{hi}"]
                .get("query_median_by_query", {}).get("func index_0"),
            },
        },
        "scaling_efficiency": round(eff, 3),
    }
    # top-level pass is the FULL gate (raw-or-normalized AND valid
    # bracket), not the raw threshold alone: an artifact must never
    # self-report pass over a collapsed control bracket
    result["gate"] = gate(result)
    result["pass"] = result["gate"]["pass"]
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
