"""Benchmark entry point (driver contract).

Runs the headline pipeline at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-step sec),
"sf"} plus informative extras (files_per_sec at build, cpus).

Steps timed:
  * index_build      — documents -> postings+doc_meta+stats+manifest (cold)
  * ft_* queries     — warm BM25 top-k / filter / count via the engine
  * naive_bm25       — DataFrame-only scorer (no index) for comparison
  * dedup_exact, sim_cosine_top10, text_quality — curation operators

Scaling evidence (local[8] vs local[32]) is produced by scripts/run_scaling.py
which invokes this file at two parallelism levels on identical input.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "scripts"))
    # host-ceiling control bracketing the run (BASELINE.md §3): identical
    # fixed numpy workloads at 8/32-way process parallelism, no Spark. When
    # the control efficiencies are low, the hypervisor regime — not the
    # engine — bounds every number below (round-over-round comparisons must
    # compare like-regime runs).
    from run_scaling import measurement_lock, run_control

    with measurement_lock():
        _run_bench(sf_dir, cpus, sf, run_control)


def _run_bench(sf_dir: str, cpus: int, sf: float, run_control) -> None:
    control_before = run_control()
    from pyspark.sql import functions as F

    from gofias_spark.config import IndexConfig
    from gofias_spark.index.build import build_segment
    from gofias_spark.query.engine import SearchEngine
    from gofias_spark.query.naive import naive_bm25
    from gofias_spark.operators.dedup import exact_duplicates
    from gofias_spark.operators.similarity import cosine_topk
    from gofias_spark.operators.textstats import quality_features
    from gofias_spark.session import get_spark

    spark = get_spark(
        "gofias_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.lit("corpus").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("path"),
        F.lit("v0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    n_docs = docs.count()

    timings: dict[str, float] = {}
    root = tempfile.mkdtemp(prefix="gofias_bench_idx_")
    shutil.rmtree(root, ignore_errors=True)

    # bucket count scales with corpus size: ~2k docs per bucket, capped at
    # 4 waves of the core count (tiny corpora shouldn't pay 128 near-empty
    # python worker spin-ups; big ones want full-width fan-out)
    n_buckets = max(8, min(4 * cpus, n_docs // 2000 or 8))
    # un-timed warmup build: commissions python workers / JVM heap / JIT
    # (first-touch page faults through the hypervisor dominate a cold
    # session's first job — see BASELINE.md methodology)
    wroot = tempfile.mkdtemp(prefix="gofias_bench_warm_")
    build_segment(
        spark, docs.limit(500), wroot,
        IndexConfig(n_buckets=8, block_size=128),
    )
    shutil.rmtree(wroot, ignore_errors=True)
    t0 = time.perf_counter()
    build_segment(
        spark, docs, root,
        IndexConfig(n_buckets=n_buckets, block_size=128),
    )
    timings["index_build"] = time.perf_counter() - t0

    engine = SearchEngine(spark, root)
    engine.warm()
    engine.search("warmup", k=1).collect()  # JIT/first-job warmup

    def bench(name, fn, repeat=3):
        best = min(
            _timed(fn) for _ in range(repeat)
        )
        timings[name] = best

    bench("ft_and_top10", lambda: engine.search("spark join", k=10).collect())
    bench(
        "ft_or_top10",
        lambda: engine.search("vector stream customer", k=10, mode="or").collect(),
    )
    bench(
        "ft_filter_top10",
        lambda: engine.search("table scan", k=10, filters={"lang": "en"}).collect(),
    )
    bench("ft_count", lambda: engine.count("window group"))
    bench(
        "ft_sort_top10",
        lambda: engine.search(
            "table scan",
            k=10,
            filters={"doclen": {"gte": 50}},
            sort_by=[("lang", "asc"), ("_score", "desc")],
        ).collect(),
    )
    docs_raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench(
        "naive_bm25",
        lambda: naive_bm25(docs_raw, ["spark", "join"], k=10, text_col="text").collect(),
        repeat=1,
    )
    bench(
        "dedup_exact",
        lambda: exact_duplicates(docs_raw, text_col="text").count(),
        repeat=1,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    bench("sim_cosine_top10", lambda: cosine_topk(emb, qv, k=10).collect())
    bench(
        "text_quality",
        lambda: quality_features(docs_raw, text_col="text").count(),
        repeat=1,
    )

    # r3 query extensions: slow-phrase (content verify) on the main index,
    # fuzzy + wildcard expansion, and FAST phrase on a positional index
    # (built un-timed so the headline index_build stays comparable across
    # rounds; its build time is reported separately)
    bench(
        "ft_phrase_slow_top10",
        lambda: engine.search_phrase("table scan", k=10).collect(),
    )
    bench(
        "ft_fuzzy_top10",
        lambda: engine.search_fuzzy("fash", k=10).collect(),
    )
    bench(
        "ft_wildcard_top10",
        lambda: engine.search_wildcard("s?a*", k=10).collect(),
    )
    # r3c extension timings (ride along in `queries`; the headline core
    # set is fixed, see below)
    bench(
        "ft_rescore_top10",
        lambda: engine.rescore(
            "table scan", "table scan", k=10, window_size=30,
            rescore_weight=2.0,
        ).collect(),
    )
    bench(
        "ft_function_score_top10",
        lambda: engine.function_score(
            "table scan", k=10, field="doclen", modifier="log1p",
            factor=0.1,
        ).collect(),
    )
    bench(
        "ft_collapse_top5",
        lambda: engine.collapse("lang", "table scan", k=5),
    )
    from gofias_spark.operators.textstats import repetition_features

    bench(
        "text_repetition",
        lambda: repetition_features(docs_raw, text_col="text").count(),
        repeat=1,
    )

    proot = tempfile.mkdtemp(prefix="gofias_bench_pos_")
    t0 = time.perf_counter()
    build_segment(
        spark, docs, proot,
        IndexConfig(n_buckets=n_buckets, block_size=128, positions=True),
    )
    timings["index_build_positions"] = time.perf_counter() - t0
    pengine = SearchEngine(spark, proot)
    pengine.warm()
    bench(
        "ft_phrase_pos_top10",
        lambda: pengine.search_phrase("table scan", k=10).collect(),
    )
    pengine.close()
    shutil.rmtree(proot, ignore_errors=True)

    # sf1-equivalent row (round-1 item #10): the parquet testdata tops out
    # at sf0.1 (5k docs), where second-scale noise dominates round-to-round
    # comparisons. Synthesize the deterministic 10x corpus (50k docs — same
    # generator as the 2M-doc scaling runs, no external data) and time the
    # same build + warm query set at a scale where the engine, not fixed
    # overhead, is the signal.
    sf1 = {}
    if os.environ.get("SPARK_GRAFT_SKIP_SF1", "") != "1":
        from gofias_spark.corpus import synth_corpus_distributed

        sdocs = synth_corpus_distributed(spark, 50_000, num_parts=64)
        sroot = tempfile.mkdtemp(prefix="gofias_bench_sf1_")
        t0 = time.perf_counter()
        build_segment(
            spark, sdocs, sroot,
            IndexConfig(n_buckets=max(8, min(128, 50_000 // 2000)),
                        block_size=128),
        )
        sf1["build_secs"] = round(time.perf_counter() - t0, 3)
        sf1["files_per_sec"] = round(50_000 / sf1["build_secs"], 1)
        seng = SearchEngine(spark, sroot)
        seng.warm()
        seng.search("warmup", k=1).collect()
        # corpus-correct mix (the distributed generator ties ident numbers
        # to their word — see run_scaling.py WORKER / BASELINE.md §3d)
        lat = []
        for _ in range(3):
            for q in ["query_300 batch_450", "common_util", "search_200",
                      "func index_0"]:
                lat.append(_timed(lambda: seng.search(q, k=10).collect()))
        lat.sort()
        sf1["query_p50_secs"] = round(lat[len(lat) // 2], 4)
        sf1["n_docs"] = 50_000
        # unpersist the sf1 caches before the after-control: a leaked
        # postings cache would skew the very bracket validating the run
        seng.close()
        shutil.rmtree(sroot, ignore_errors=True)

    control_after = run_control()

    # naive_bm25 is the DIFFERENTIAL CHECK (index-free DataFrame scorer, by
    # design ~10-100x slower than the indexed engine): report it separately
    # so the headline value reflects the engine, not the semantics oracle.
    # The headline `value` sums a FIXED core set (the r2 suite) so adding
    # new timings in later rounds never shifts round-over-round comparisons;
    # extension timings ride along in `queries`.
    core = (
        "index_build", "ft_and_top10", "ft_or_top10", "ft_filter_top10",
        "ft_count", "ft_sort_top10", "dedup_exact", "sim_cosine_top10",
        "text_quality",
    )
    total = sum(timings[k] for k in core if k in timings)
    out = {
        "metric": "index_build_plus_query_suite",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": sf,
        "n_docs": n_docs,
        "build_files_per_sec": round(n_docs / timings["index_build"], 1),
        "naive_bm25_differential_sec": round(timings["naive_bm25"], 3),
        "cpus": cpus,
        "host_control": {"before": control_before, "after": control_after},
        "sf1_synth": sf1,
    }
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
