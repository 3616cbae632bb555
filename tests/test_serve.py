"""Term-bucketed serve cache (query/serve.py): the low-latency path must be
result-identical to the distributed cogroup path and the driver-side
searcher, its scan must be PARTITION-pruned (tasks ∝ query terms, not index
size — VERDICT r02 #1), and its pid hash must match Spark's crc32."""

import zlib

import pytest
from pyspark.sql import functions as F

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import load_refcorpus, synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.index.merge import apply_delta
from gofias_spark.plans.checks import physical_plan
from gofias_spark.query.engine import SearchEngine
from gofias_spark.query.serve import pid_of

CFG = IndexConfig(n_buckets=5, block_size=16)


@pytest.fixture(scope="module")
def roots(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serveidx"))
    build_segment(spark, synth_corpus(spark, 400), root, CFG)
    # a delta so tombstones exercise the serve path's excluded mask
    dels = spark.createDataFrame(
        [(r["path"], r["commit"])
         for r in SearchEngine(spark, root)
         .doc_meta.filter(F.col("repo") == "org1/project1")
         .select("path", "commit").limit(3).collect()],
        "path string, commit string",
    ).selectExpr("'org1/project1' as repo", "path", "commit")
    apply_delta(spark, root, deletes=dels)
    return root


@pytest.fixture(scope="module")
def engines(spark, roots):
    served = SearchEngine(spark, roots)
    served.warm(local_max_blocks=0)  # skip local searcher -> serve engages
    assert served._serve is not None and served._local_blocks is None
    dist = SearchEngine(spark, roots, serve=False)
    dist.warm(local_max_blocks=0)
    assert dist._serve is None
    local = SearchEngine(spark, roots, cache=False)
    local.warm()
    assert local._local_blocks is not None
    return served, dist, local


def test_pid_parity_with_spark_crc32(spark):
    """Driver-side zlib.crc32 bucket == the Spark expression used at cache
    build time, for ascii and non-ascii terms."""
    terms = ["func", "main", "common_util", "x", "переулок", "東京", "a_b9"]
    n = 13
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select(
            "term",
            F.pmod(F.crc32(F.encode(F.col("term"), "utf-8")), F.lit(n))
            .cast("int")
            .alias("pid"),
        )
        .collect()
    )
    for r in rows:
        assert pid_of(r["term"], n) == r["pid"], r["term"]


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_serve_equals_distributed_and_local(engines):
    served, dist, local = engines
    cases = [
        dict(query="common_util", k=10),
        dict(query="common_util helper", k=5),
        dict(query="def return", k=8, mode="or"),
        dict(query="common_util", k=7, offset=4),
        dict(query="zzz_missing", k=5),
    ]
    for case in cases:
        a, b, c = (
            _rows(e.search(**case)) for e in (served, dist, local)
        )
        assert a == b == c, case
    for q in ["common_util", "def", "zzz_missing"]:
        assert served.count(q) == dist.count(q) == local.count(q)


def test_serve_applies_tombstones(spark, engines, roots):
    """Deleted docs must not surface on the serve path (query-time excluded
    mask, same as distributed)."""
    served, dist, _ = engines
    no_tombs = SearchEngine(spark, roots)
    dead = set(
        no_tombs._tombstones.select("doc_id").toPandas()["doc_id"]
    )
    assert dead, "fixture must have tombstones"
    ids = {r["doc_id"] for r in served.search("common_util", k=100).collect()}
    assert not (ids & dead)


def test_filtered_queries_serve_driver_side(engines):
    """Attribute filters whose fields live in the meta sidecar ride the
    serve tier (score all candidates, evaluate the filter against the
    sidecar in score order, probe-then-full backfill) — result-identical
    to the distributed cogroup path for every filter shape."""
    served, dist, _ = engines
    cases = [
        {"lang": "py"},
        {"lang": ["py", "go"]},
        {"doclen": {"gte": 10, "lt": 400}},
        {"path_prefix": "src/"},
        {"lang": {"neq": "py"}},
        {"lang": "py", "doclen": {"gt": 3}, "path_prefix": "src/"},
    ]
    for f in cases:
        assert served._serve_route({"common_util": 10}, f), f
        a = _rows(served.search("common_util", k=8, filters=f))
        b = _rows(dist.search("common_util", k=8, filters=f))
        assert a == b, f
        assert len(a) > 0, f


def test_filtered_route_declines_over_budget_or_unknown_field(engines):
    """Sidecar-absent fields and over-budget queries stay distributed."""
    served, _, _ = engines
    assert not served._serve_route({"t": 10}, {"no_such_column": 1})
    big = {"t": served._serve_filtered_max + 1}
    assert not served._serve_route(big, {"lang": "py"})
    assert served._serve_route(big, None)  # unfiltered budget is larger


def test_filtered_count_and_sorted_on_serve(engines):
    """Filtered counts and composite attribute sorts also serve
    driver-side under the filtered budget, matching the distributed path
    value-for-value (incl. attribute columns and null-last ordering)."""
    served, dist, _ = engines
    f = {"doclen": {"gte": 5}}
    assert served.count("common_util", filters=f) == dist.count(
        "common_util", filters=f
    )
    sb = [("lang", "asc"), ("_score", "desc")]
    dfs = served._term_dfs(["common_util"])
    assert served._serve_sorted_route(dfs, f, ["lang"])
    key = lambda rows: [
        (r["doc_id"], r["lang"], round(r["score"], 9)) for r in rows
    ]
    a = key(served.search("common_util", k=6, filters=f, sort_by=sb).collect())
    b = key(dist.search("common_util", k=6, filters=f, sort_by=sb).collect())
    assert a == b and len(a) > 0


def test_filtered_serve_null_semantics(spark, tmp_path):
    """A null attribute fails every predicate on the serve path exactly as
    in Spark SQL — including ``neq``, where pandas' native ``!=`` would
    wrongly keep the null row (ADVICE r02 family)."""
    rows = [
        ("o/r", "a.py", "c1", "py", "common_util alpha"),
        ("o/r", "b.go", "c2", "go", "common_util beta"),
        ("o/r", "c.txt", "c3", None, "common_util gamma"),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    root = str(tmp_path / "nullidx")
    build_segment(spark, docs, root, IndexConfig(n_buckets=2, block_size=8))
    served = SearchEngine(spark, root)
    served.warm(local_max_blocks=0)
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    for f in ({"lang": {"neq": "py"}}, {"lang": "go"}, {"doclen": {"gte": 1}}):
        assert served._serve_route({"common_util": 3}, f)
        a = _rows(served.search("common_util", k=10, filters=f))
        b = _rows(dist.search("common_util", k=10, filters=f))
        assert a == b, f
    # neq must exclude the null-lang doc (Spark: null != 'py' -> null -> drop)
    langs = [
        r["lang"]
        for r in served.search(
            "common_util", k=10, filters={"lang": {"neq": "py"}}
        ).collect()
    ]
    assert langs == ["go"]


def test_serve_scan_is_partition_pruned(engines):
    """The per-query scan must read only the hive partitions of the query's
    term buckets: planning-time partition pruning shows in the scan node,
    and the scheduled task count is bounded by the term count, not the
    bucket count."""
    served, _, _ = engines
    scan = served._serve.scan(["common_util"])
    plan = physical_plan(scan)
    assert "PartitionFilters" in plan
    # the pruned scan schedules at most one split per matching bucket
    n_parts = scan.rdd.getNumPartitions()
    assert n_parts <= 2, f"expected <=2 tasks for 1 term, got {n_parts}"
    full = served._serve._df
    assert full.rdd.getNumPartitions() >= served._serve.n_buckets


def test_threshold_falls_back_to_distributed(spark, roots):
    """serve_max_postings=0 -> every query exceeds the driver budget and
    routes distributed; results unchanged."""
    eng = SearchEngine(spark, roots, serve_max_postings=0)
    eng.warm(local_max_blocks=0)
    assert eng._serve is not None
    assert not eng._serve_route({"common_util": 10}, None)
    assert len(_rows(eng.search("common_util", k=5))) == 5


def test_serve_cache_reused_across_engines(spark, roots):
    """Same index state -> same token -> the second engine opens the
    existing parquet instead of rewriting it."""
    e1 = SearchEngine(spark, roots)
    e1.warm(local_max_blocks=0)
    path1 = e1._serve.path
    e2 = SearchEngine(spark, roots)
    e2.warm(local_max_blocks=0)
    assert e2._serve.path == path1


def test_stats_sidecar_when_vocab_exceeds_driver_dict(spark, roots):
    """warm(max_terms=0) models a vocabulary too large for the driver
    dict: df lookups must come from the term-sorted stats sidecar (pruned
    pyarrow read, no Spark job) and produce identical scores; after a
    delete-only delta the sidecar must refresh (df changes while the
    postings token does not)."""
    eng = SearchEngine(spark, roots)
    eng.warm(max_terms=0, local_max_blocks=0)
    assert eng._stats_cache is None
    assert eng._serve.fetch_stats(["common_util"]) is not None
    ref = SearchEngine(spark, roots, serve=False)
    ref.warm(local_max_blocks=0)
    a = _rows(eng.search("common_util helper", k=5))
    b = _rows(ref.search("common_util helper", k=5))
    assert a == b and len(a) > 0
    # sidecar dfs must equal the delta-corrected stats frame, which the
    # fixture's delete delta has already perturbed
    true_dfs = {
        r["term"]: int(r["df"])
        for r in eng._stats.filter(
            F.col("term").isin(["common_util", "func"])
        ).collect()
    }
    assert eng._term_dfs(["common_util", "func"]) == {
        t: true_dfs.get(t, 0) for t in ["common_util", "func"]
    }


def test_serve_search_many_matches_distributed(spark, roots):
    served = SearchEngine(spark, roots)
    served.warm(local_max_blocks=0)
    dist = SearchEngine(spark, roots, serve=False)
    dist.warm(local_max_blocks=0)
    queries = {"q1": "common_util", "q2": "def return", "q3": "zzz_missing"}
    a = served.search_many(queries, k=5).toPandas()
    b = dist.search_many(queries, k=5).toPandas()
    key = ["query", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == pytest.approx(b["score"].tolist(), rel=1e-12)


def test_serve_search_many_filtered_matches_distributed(spark, roots):
    """Filtered batches serve driver-side too (one union sidecar read,
    per-query mask) — value-identical to the distributed cogroup path."""
    served = SearchEngine(spark, roots)
    served.warm(local_max_blocks=0)
    dist = SearchEngine(spark, roots, serve=False)
    dist.warm(local_max_blocks=0)
    queries = {"q1": "common_util", "q2": "def return", "q3": "zzz_missing"}
    for f in ({"lang": ["py", "go"]}, {"doclen": {"gte": 10}}):
        a = served.search_many(queries, k=5, filters=f).toPandas()
        b = dist.search_many(queries, k=5, filters=f).toPandas()
        key = ["query", "rank"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert len(a) > 0, f
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), f
        assert a["score"].tolist() == pytest.approx(
            b["score"].tolist(), rel=1e-12
        ), f


def test_engine_close_releases_caches(spark, roots):
    """close() must unpersist the postings/stats/meta caches (a serving
    process reopening engines across deltas must not leak executor
    storage) while leaving the on-disk serve cache reusable."""
    eng = SearchEngine(spark, roots)
    eng.warm(local_max_blocks=0)
    assert eng.search("common_util", k=3).count() > 0
    eng.close()
    assert eng._tomb_bc is None
    assert eng._local_blocks is None and eng._stats_cache is None
    # a fresh engine over the same root still works (serve cache reused)
    eng2 = SearchEngine(spark, roots)
    eng2.warm(local_max_blocks=0)
    assert eng2.search("common_util", k=3).count() > 0
    eng2.close()


def test_cache_excludes_unservable_hot_terms(spark, tmp_path):
    """Terms with df above the serve budget are excluded from the cache
    (they can never be served; at scale they are the skew makers), the
    build threshold is persisted, and an engine opened with a LARGER
    budget over the same cache caps its routing to the cache's threshold
    — falling back to the distributed path with identical results."""
    root = str(tmp_path / "hotidx")
    build_segment(spark, synth_corpus(spark, 100), root, CFG)
    small = SearchEngine(spark, root, serve_max_postings=30)
    small.warm(local_max_blocks=0)
    df_hot = small._term_dfs(["common_util"])["common_util"]
    assert df_hot > 30  # hot term genuinely over the small budget
    assert len(small._serve.fetch(["common_util"])) == 0  # excluded
    assert small._serve.df_threshold == 30
    rare = small._stats.filter(
        F.col("df").between(1, 20)
    ).limit(1).collect()[0]["term"]
    assert len(small._serve.fetch([rare])) > 0  # servable terms kept
    # a bigger-budget engine reuses the same cache but must not serve the
    # excluded term
    big = SearchEngine(spark, root, serve_max_postings=4_000_000)
    big.warm(local_max_blocks=0)
    assert big._serve.path == small._serve.path
    assert not big._serve_route({"common_util": df_hot}, None)
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    a = _rows(big.search("common_util helper", k=5))
    b = _rows(dist.search("common_util helper", k=5))
    assert a == b and len(a) > 0
    # rare terms still serve under the capped budget
    assert big._serve_route(big._term_dfs([rare]), None)
    a = _rows(big.search(rare, k=5))
    b = _rows(dist.search(rare, k=5))
    assert a == b


def test_as_pandas_matches_dataframe_results(engines):
    """search(as_pandas=True) — the serving fast path — must return the
    same rows/columns as the DataFrame result across plain, filtered,
    sorted, and empty queries."""
    served, dist, local = engines
    cases = [
        dict(query="common_util", k=5),
        dict(query="common_util", k=5, with_meta=False),
        dict(query="common_util", k=5, filters={"lang": ["py", "go"]}),
        dict(
            query="common_util", k=5,
            filters={"doclen": {"gte": 5}},
            sort_by=[("lang", "asc"), ("_score", "desc")],
        ),
        dict(query="zzz_missing", k=5),
    ]
    for eng in (served, local):
        for case in cases:
            pdf = eng.search(as_pandas=True, **case)
            df = eng.search(**case).toPandas()
            assert list(pdf.columns) == list(df.columns), case
            a = pdf.reset_index(drop=True).fillna("∅")
            b = df.reset_index(drop=True).fillna("∅")
            assert a.to_dict("records") == b.to_dict("records"), case


def test_excluded_terms_persisted_and_authoritative(spark, tmp_path):
    """Routing consults the PERSISTED build-time exclusion set, not live
    dfs: after a delete-only delta a hot term's df can drop under the
    threshold while the postings token (and thus the cache) is unchanged
    — threshold-vs-live-df routing would then serve silently-empty
    results for it (r3 review, top finding)."""
    root = str(tmp_path / "exclidx")
    build_segment(spark, synth_corpus(spark, 100), root, CFG)
    eng = SearchEngine(spark, root, serve_max_postings=30)
    eng.warm(local_max_blocks=0)
    assert eng._serve.excluded_terms is not None
    assert "common_util" in eng._serve.excluded_terms
    # live df under the cap (models post-delta drift): still must NOT
    # route to a cache that lacks the term's postings
    assert not eng._serve_route({"common_util": 5}, None)
    assert not eng._serve_sorted_route({"common_util": 5}, None, [])
    # ... and a larger-budget engine over the same cache agrees
    big = SearchEngine(spark, root, serve_max_postings=4_000_000)
    big.warm(local_max_blocks=0)
    assert big._serve.path == eng._serve.path
    assert not big._serve_route({"common_util": 5}, None)
    # non-excluded terms route normally
    rare = eng._stats.filter(F.col("df").between(1, 20)).limit(1).collect()[0]["term"]
    assert eng._serve_route({rare: 5}, None)
    eng.close()
    big.close()


def test_token_rotation_retains_one_predecessor(spark, roots, tmp_path):
    """Cache rotation keeps the newest other token on disk: a rolling
    reopen may still be serving from it; only older generations are
    dropped."""
    from gofias_spark.query.serve import ServeCache

    eng = SearchEngine(spark, roots)
    eng.warm(local_max_blocks=0)
    postings = eng._union("postings")
    dest = tmp_path / "rotcache"
    c1 = ServeCache.build(spark, postings, dest, 4, "tok1")
    c2 = ServeCache.build(spark, postings, dest, 4, "tok2")
    assert (dest / "tok1").exists() and (dest / "tok2").exists()
    c3 = ServeCache.build(spark, postings, dest, 4, "tok3")
    assert not (dest / "tok1").exists()  # two generations back: dropped
    assert (dest / "tok2").exists() and (dest / "tok3").exists()
    # the retained predecessor is still readable end-to-end
    assert len(c2.fetch(["common_util"])) > 0
    del c1, c3
    eng.close()


def test_prune_stale_completeness_and_marker_order(tmp_path):
    """Retention keeps the newest COMPLETE predecessor: partial dirs never
    shield a good one, generation order comes from the done-marker's
    mtime (dir mtimes lie — writing a sidecar into an old token bumps
    them), and fresh partials (possible in-flight builds) are left."""
    import os
    import time

    from gofias_spark.query.serve import _prune_stale

    d = tmp_path
    for name in ("t1", "t2"):
        (d / name).mkdir()
        (d / name / "_DONE").write_text("")
    partial = d / "t_partial"
    partial.mkdir()
    old = time.time() - 7200
    os.utime(partial, (old, old))
    os.utime(d / "t1" / "_DONE", (old, old))
    # bump t1's DIR mtime above t2's (attach_stats-style subdir write)
    (d / "t1" / "stats_x").mkdir()
    cur = d / "t3"
    cur.mkdir()
    _prune_stale(d.iterdir(), cur, "_DONE")
    assert not partial.exists()  # stale partial dropped outright
    assert not (d / "t1").exists()  # older complete dropped (marker order)
    assert (d / "t2").exists()  # newest complete retained
    fresh = d / "t_fresh"
    fresh.mkdir()
    _prune_stale(d.iterdir(), cur, "_DONE")
    assert fresh.exists()  # possible in-flight build: left alone


def test_route_volume_uses_build_dfs_in_delta_state(spark, tmp_path):
    """Cached postings retain tombstoned docs, so in delta state the
    router budgets by the persisted build-time dfs, not the (smaller)
    live dfs — heavy deletes must not overshoot the driver fetch."""
    root = str(tmp_path / "volidx")
    build_segment(spark, synth_corpus(spark, 100), root, CFG)
    e1 = SearchEngine(spark, root)
    e1.warm(local_max_blocks=0)  # builds the cache pre-delta
    raw = e1._serve.fetch_build_dfs(["common_util"])["common_util"]
    live0 = e1._term_dfs(["common_util"])["common_util"]
    assert raw == live0  # no delta yet: sidecar mirrors live
    assert e1._route_vol({"common_util": live0}) == live0
    victims = [
        (r["repo"], r["path"], r["commit"])
        for r in e1.search("common_util", k=40, mode="or").collect()[:40]
    ]
    e1.close()
    dels = spark.createDataFrame(
        victims, "repo string, path string, commit string"
    )
    apply_delta(spark, root, deletes=dels)
    e2 = SearchEngine(spark, root)
    e2.warm(local_max_blocks=0)
    live = e2._term_dfs(["common_util"])["common_util"]
    assert live < raw  # deletes lowered the live df
    # the router sees the cache's true per-term volume, not the live df
    assert e2._route_vol({"common_util": live}) == raw
    e2.close()


def test_staged_publish_no_tmp_residue_and_idempotent(spark, engines, roots):
    """Builds stage into a private tmp dir and publish by atomic rename:
    after a successful warm the cache dir holds only complete token dirs
    (every published dir has _DONE; no .tmp- staging dirs linger), and a
    re-warm over the same token early-returns instead of rewriting."""
    from pathlib import Path

    from gofias_spark.query.serve import ServeCache

    dest = Path(ServeCache.resolve_dir(roots))
    names = [p.name for p in dest.iterdir()]
    assert names and not any(".tmp-" in n for n in names)
    toks = [p for p in dest.iterdir() if p.is_dir()]
    assert all((p / "_DONE").exists() for p in toks)
    done_mtime = {p: (p / "_DONE").stat().st_mtime for p in toks}
    again = SearchEngine(spark, roots)
    again.warm(local_max_blocks=0)
    assert {
        p: (p / "_DONE").stat().st_mtime for p in toks
    } == done_mtime  # reused, not rebuilt
    again.close()


def test_n_buckets_persisted_and_authoritative(spark, engines):
    """pid routing is a pure function of (term, n_buckets): the build-time
    bucket count is persisted with the cache, and a reader constructed
    with a DIFFERENT (e.g. formula-drifted) count must use the persisted
    one — otherwise partition pruning reads the wrong pids and valid
    queries serve silently-empty results."""
    import json as _json
    from pathlib import Path

    from gofias_spark.query.serve import ServeCache

    served = engines[0]
    sc = served._serve
    persisted = _json.loads(
        (Path(sc.path) / "n_buckets.json").read_text()
    )["n_buckets"]
    assert persisted == sc.n_buckets
    drifted = ServeCache(served.spark, sc.path, persisted * 2 + 7)
    assert drifted.n_buckets == persisted
    blocks_ok = sc.fetch(["common_util"])
    blocks_drift = drifted.fetch(["common_util"])
    assert len(blocks_ok) > 0
    assert len(blocks_drift) == len(blocks_ok)


def test_fetch_meta_chunks_large_id_sets(engines):
    """fetch_meta evaluates huge id sets in bounded sorted slices; the
    chunked read returns exactly the rows the single-slice read does."""
    served = engines[0]
    sc = served._serve
    real = sc.fetch_meta(list(range(0, 500)))
    assert real is not None and len(real) > 0
    # pad with misses past the chunk step so the call takes >1 slice
    padded = list(range(0, 500)) + list(range(10**9, 10**9 + 300_000))
    big = sc.fetch_meta(padded)
    assert sorted(big["doc_id"]) == sorted(real["doc_id"])
    assert sc.fetch_meta([]) is not None and len(sc.fetch_meta([])) == 0
