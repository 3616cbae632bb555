"""Round-3b extensions: rescore / function_score / collapse (three-tier
equivalence + semantics), event-stream ops (date_histogram, sessionize),
sampling ops (stratified_sample determinism, pack_sequences prefix-sum
correctness and partition invariance), percolate, and Gopher repetition
features vs a pure-Python reference."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gofias_spark.config import IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.operators.events import date_histogram, sessionize
from gofias_spark.operators.percolate import percolate
from gofias_spark.operators.sampling import pack_sequences, stratified_sample
from gofias_spark.operators.textstats import repetition_features
from gofias_spark.query.engine import SearchEngine

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "common_util", "x",
]


def _random_docs(rng, n):
    rows = []
    for i in range(n):
        n_tok = rng.randint(2, 30)
        content = " ".join(rng.choice(WORDS) for _ in range(n_tok))
        lang = rng.choice(["py", "go", None])
        rows.append((f"org/r{i % 4}", f"src/f{i}.py", f"c{i}", lang, content))
    return rows


@pytest.fixture(scope="module")
def trio(spark, tmp_path_factory):
    rng = random.Random(424242)
    docs = spark.createDataFrame(
        _random_docs(rng, 250),
        "repo string, path string, commit string, lang string, content string",
    )
    root = str(tmp_path_factory.mktemp("r3bidx"))
    build_segment(spark, docs, root, IndexConfig(n_buckets=3, block_size=8))
    local = SearchEngine(spark, root, cache=False)
    local.warm()
    assert local._local_blocks is not None
    served = SearchEngine(spark, root)
    served.warm(local_max_blocks=0)
    assert served._serve is not None
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    return local, served, dist


def _key(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


# -- rescore / function_score / collapse -----------------------------------


def test_rescore_three_tiers_agree(trio):
    local, served, dist = trio
    for q, rq in [("alpha beta", "alpha beta"), ("gamma", "gamma delta")]:
        a = _key(local.rescore(q, rq, k=5, window_size=20, rescore_weight=2.0))
        b = _key(served.rescore(q, rq, k=5, window_size=20, rescore_weight=2.0))
        c = _key(dist.rescore(q, rq, k=5, window_size=20, rescore_weight=2.0))
        assert a == b == c and len(a) > 0


def test_rescore_boosts_adjacent_docs(trio):
    local, _, _ = trio
    base = local.search("alpha beta", k=20, as_pandas=True)
    resc = local.rescore("alpha beta", "alpha beta", k=20, window_size=20,
                         rescore_weight=5.0, as_pandas=True)
    pm = local.phrase_matches("alpha beta")
    if not isinstance(pm, pd.DataFrame):  # no positional sidecar: Spark DF
        pm = pm.toPandas()
    adjacent = set(pm["doc_id"])
    assert adjacent  # fixture has adjacent pairs
    merged = base.merge(
        resc, on="doc_id", suffixes=("_base", "_resc"), how="inner"
    )
    for _, r in merged.iterrows():
        if r["doc_id"] in adjacent:
            assert r["score_resc"] > r["score_base"]
        else:
            assert r["score_resc"] == pytest.approx(r["score_base"])


def test_rescore_window_must_cover_page(trio):
    local, _, _ = trio
    with pytest.raises(ValueError, match="window_size"):
        local.rescore("alpha", "alpha beta", k=10, window_size=5)


def test_function_score_three_tiers_agree(trio):
    local, served, dist = trio
    for kw in (
        dict(modifier="log1p", factor=0.5, boost_mode="multiply"),
        dict(modifier="sqrt", factor=1.0, boost_mode="sum"),
        dict(modifier="none", factor=2.0, boost_mode="multiply"),
    ):
        a = _key(local.function_score("alpha", k=8, field="doclen", **kw))
        b = _key(served.function_score("alpha", k=8, field="doclen", **kw))
        c = _key(dist.function_score("alpha", k=8, field="doclen", **kw))
        assert a == b == c and len(a) > 0


def test_function_score_matches_manual(trio):
    import numpy as np

    local, _, _ = trio
    sm = local.score_matches("alpha")
    meta = local._local_meta.reset_index(drop=True)[["doc_id", "doclen"]]
    exp = sm.merge(meta, on="doc_id")
    exp["score"] = exp["score"] * np.log1p(0.5 * exp["doclen"].astype(float))
    exp = exp.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(8)
    got = local.function_score(
        "alpha", k=8, field="doclen", modifier="log1p", factor=0.5,
        as_pandas=True,
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(exp["score"].to_numpy())


def test_function_score_validation(trio):
    local, _, _ = trio
    with pytest.raises(ValueError, match="modifier"):
        local.function_score("alpha", modifier="log2p")
    with pytest.raises(ValueError, match="boost_mode"):
        local.function_score("alpha", boost_mode="max")
    with pytest.raises(ValueError, match="not numeric"):
        local.function_score("alpha", field="lang")


def test_collapse_three_tiers_agree(trio):
    local, served, dist = trio
    for gf in ("repo", "lang"):
        a = local.collapse(gf, "alpha", k=5)
        b = served.collapse(gf, "alpha", k=5)
        c = dist.collapse(gf, "alpha", k=5)
        for other in (b, c):
            pd.testing.assert_frame_equal(
                a.reset_index(drop=True), other.reset_index(drop=True)
            )
        assert len(a) > 0


def test_collapse_semantics(trio):
    local, _, _ = trio
    out = local.collapse("repo", "alpha", k=10)
    # at most one hit per group; rows ordered (score desc, doc_id asc)
    assert out["repo"].is_unique
    key = list(zip(-out["score"], out["doc_id"]))
    assert key == sorted(key)
    # each group's hit is that group's best match
    sm = local.score_matches("alpha")
    meta = local._local_meta.reset_index(drop=True)[["doc_id", "repo"]]
    full = sm.merge(meta, on="doc_id")
    for _, r in out.iterrows():
        grp = full[full["repo"] == r["repo"]].sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        assert int(grp.iloc[0]["doc_id"]) == int(r["doc_id"])
    # null groups omitted
    lang_out = local.collapse("lang", "alpha", k=10)
    assert lang_out["lang"].notna().all()


# -- events ------------------------------------------------------------------


@pytest.fixture(scope="module")
def events_df(spark):
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions (31-min gap), mixed types
        (1, t0, 1, "click", 1.0),
        (2, t0 + dt.timedelta(minutes=10), 1, "view", 2.0),
        (3, t0 + dt.timedelta(minutes=41), 1, "click", 3.0),
        # user 2: one session, gap exactly at the 30-min boundary stays
        (4, t0, 2, "click", 4.0),
        (5, t0 + dt.timedelta(minutes=30), 2, "click", 5.0),
        # user 3: next-day single event
        (6, t0 + dt.timedelta(days=1), 3, "view", 6.0),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def test_date_histogram_buckets(events_df):
    pdf = date_histogram(events_df, "day").toPandas()
    assert list(pdf.columns) == [
        "bucket", "event_type", "cnt", "sum_value", "avg_value"
    ]
    d1 = pdf[pdf["bucket"] == dt.datetime(2024, 3, 1)]
    assert {
        (r["event_type"], r["cnt"], r["sum_value"])
        for _, r in d1.iterrows()
    } == {("click", 4, 13.0), ("view", 1, 2.0)}
    d2 = pdf[pdf["bucket"] == dt.datetime(2024, 3, 2)]
    assert len(d2) == 1 and d2.iloc[0]["avg_value"] == 6.0


def test_date_histogram_validates_interval(events_df):
    with pytest.raises(ValueError, match="interval"):
        date_histogram(events_df, "fortnight")


def test_sessionize_gaps(events_df):
    pdf = sessionize(events_df, gap_minutes=30).toPandas()
    seq = {
        int(r["event_id"]): int(r["session_seq"]) for _, r in pdf.iterrows()
    }
    # user 1: 41-min gap from event 2 to 3 -> new session
    assert (seq[1], seq[2], seq[3]) == (1, 1, 2)
    # user 2: exactly 30 min == NOT greater than the gap -> same session
    assert (seq[4], seq[5]) == (1, 1)
    assert seq[6] == 1


# -- sampling ----------------------------------------------------------------


def test_stratified_sample_deterministic(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.5, "de": 0.2}
    a = {
        r["doc_id"]
        for r in stratified_sample(docs, rates).select("doc_id").collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), rates)
        .select("doc_id").collect()
    }
    assert a == b  # partitioning-independent selection
    picked = docs.filter(F.col("doc_id").isin(list(a))).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in picked.collect()}
    assert 0.4 <= got["en"] / 1000 <= 0.6
    assert 0.1 <= got["de"] / 1000 <= 0.3
    assert "fr" not in got  # default_rate=0 drops unlisted strata


def test_stratified_sample_validation(spark):
    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(docs, {"en": 1.5})


def test_pack_sequences_matches_reference(spark):
    rng = random.Random(7)
    rows = [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 40))))
        for i in range(500)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    for parts in (1, 4, 32):
        pdf = (
            pack_sequences(docs, budget=100, num_parts=parts)
            .orderBy("doc_id").toPandas()
        )
        # pure-pandas reference: global cumsum in doc_id order
        ref = pdf.sort_values("doc_id").reset_index(drop=True)
        before = ref["n_tokens"].cumsum() - ref["n_tokens"]
        assert list(pdf["bin_id"]) == list(before // 100)
    # token counts agree with the whitespace corpus construction
    n_tok = {r[0]: len(r[1].split()) for r in rows}
    assert all(n_tok[r.doc_id] == r.n_tokens for r in pdf.itertuples())


def test_pack_sequences_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, content string")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, budget=0)


# -- percolate ---------------------------------------------------------------


def test_percolate_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 12))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    queries = {
        "q1": "alpha beta",
        "q2": "common_util",
        "q3": "alpha alpha",   # duplicate terms collapse to one
        "q4": "missing_term_zz",
        "q5": "",              # analyzes to nothing -> matches nothing
    }
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, queries).collect()
    }
    exp = set()
    for i, text in rows:
        toks = set(text.split())
        for qid, q in queries.items():
            terms = set(q.split())
            if terms and terms <= toks:
                exp.add((i, qid))
    assert got == exp
    assert not any(q == "q4" or q == "q5" for _, q in got)


def test_percolate_empty_queryset(spark):
    docs = spark.createDataFrame([(1, "alpha")], "doc_id long, content string")
    assert percolate(docs, {}).count() == 0


def test_percolate_plan_broadcasts_queries(spark):
    docs = spark.createDataFrame([(1, "alpha")], "doc_id long, content string")
    plan = percolate(docs, {"q": "alpha beta"})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- repetition features -----------------------------------------------------


def test_repetition_features_reference(spark):
    docs = spark.createDataFrame(
        [
            # 4 lines, 'dup' twice: dlf = 1 - 3/4; chars: dup=3 chars x2
            (1, "dup\nunique one\ndup\nother"),
            (2, "all distinct\nlines here"),
            (3, "go go go go stop"),   # top bigram (go,go) x3, chars 4/18*3
            (4, ""),                   # degenerate: all zeros
            (5, "single"),             # one token -> no bigram
        ],
        "doc_id long, content string",
    )
    pdf = repetition_features(docs).orderBy("doc_id").toPandas()
    r1 = pdf.iloc[0]
    assert r1["dup_line_frac"] == pytest.approx(1 - 3 / 4)
    total = len("dup") * 2 + len("unique one") + len("other")
    assert r1["dup_line_char_frac"] == pytest.approx(
        round(6 / total, 4)
    )
    r3 = pdf.iloc[2]
    assert r3["dup_line_frac"] == 0.0
    # tokens: go x4, stop -> 4*2+4=12 token chars; (go,go) count 3, len 4
    assert r3["top_bigram_char_frac"] == pytest.approx(round(12 / 12, 4))
    r4 = pdf.iloc[3]
    assert (
        r4["dup_line_frac"], r4["dup_line_char_frac"],
        r4["top_bigram_char_frac"],
    ) == (0.0, 0.0, 0.0)
    assert pdf.iloc[4]["top_bigram_char_frac"] == 0.0


# -- regexp term query / exists filter ----------------------------------------


def test_search_regexp_three_tiers_agree(trio):
    local, served, dist = trio
    for pat in ("alpha|beta", "[gd]..ma|delta", "kap.*"):
        a = _key(local.search_regexp(pat, k=10))
        b = _key(served.search_regexp(pat, k=10))
        c = _key(dist.search_regexp(pat, k=10))
        assert a == b == c and len(a) > 0, pat


def test_search_regexp_equals_or_of_matched_terms(trio):
    local, _, _ = trio
    terms = local.regexp_terms("alpha|gamma")
    assert set(terms) == {"alpha", "gamma"}
    a = _key(local.search_regexp("alpha|gamma", k=10))
    b = _key(local.search("alpha gamma", k=10, mode="or"))
    assert a == b


def test_search_regexp_rejects_unportable(trio):
    local, _, _ = trio
    with pytest.raises(ValueError, match="portable"):
        local.search_regexp("(?=alpha).*")
    with pytest.raises(ValueError, match="invalid regexp"):
        local.search_regexp("al(pha")


def test_exists_filter_three_tiers(trio):
    local, served, dist = trio
    for val in (True, False):
        f = {"lang": {"exists": val}}
        a = _key(local.search("alpha", k=20, filters=f))
        b = _key(served.search("alpha", k=20, filters=f))
        c = _key(dist.search("alpha", k=20, filters=f))
        assert a == b == c
    # exists=True and exists=False partition the unfiltered matches
    base = {r[0] for r in _key(local.search("alpha", k=1000))}
    has = {r[0] for r in _key(local.search(
        "alpha", k=1000, filters={"lang": {"exists": True}}))}
    hasnt = {r[0] for r in _key(local.search(
        "alpha", k=1000, filters={"lang": {"exists": False}}))}
    assert has | hasnt == base and not (has & hasnt)
    assert hasnt  # the fixture plants null langs


def test_exists_filter_validation(trio):
    local, _, _ = trio
    with pytest.raises(ValueError, match="bool"):
        local.search("alpha", filters={"lang": {"exists": "yes"}})


# -- round-3 review regressions ------------------------------------------------


def test_significant_terms_or_mode(trio):
    local, served, dist = trio
    # an OR query with one unindexed term must not come back empty...
    for eng in (local, served, dist):
        out = eng.significant_terms("alpha zzqq_missing", mode="or", k=5)
        assert len(out) > 0
        # ...and foreground rates are computed over the OR-matched set,
        # so hits can never exceed the denominator (fg_rate <= 1)
        sm = eng.score_matches("alpha", mode="or")
        n_or = len(sm) if isinstance(sm, pd.DataFrame) else sm.count()
        assert (out["hits"] <= n_or).all()


def test_reindex_preserves_analyzer_and_positions(spark, tmp_path):
    from gofias_spark.api import FulltextAPI
    from gofias_spark.config import AnalyzerConfig
    from gofias_spark.index.store import IndexStore

    root, dest = str(tmp_path / "src"), str(tmp_path / "dst")
    docs = spark.createDataFrame(
        [("r", f"p{i}", "c", "py", f"alpha beta doc{i}") for i in range(20)],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    build_segment(
        spark, docs, root,
        IndexConfig(
            n_buckets=2, block_size=8,
            analyzer=AnalyzerConfig(mode="edge_ngram", min_gram=1,
                                    max_gram=10),
        ),
    )
    FulltextAPI(spark, root).reindex(dest)
    cfg = IndexStore(dest).read_manifest()["config"]
    assert cfg["analyzer"]["mode"] == "edge_ngram"
    assert cfg["analyzer"]["max_gram"] == 10


# ---- temperature mixture sampling + auto_date_histogram ------------------

from gofias_spark.operators.sampling import (  # noqa: E402
    temperature_rates,
    temperature_sample,
)


def test_temperature_rates_flatten_mixture():
    counts = {"en": 800, "fr": 100, "de": 100}
    r = temperature_rates(counts, alpha=0.5)
    # smallest groups keep everything, the giant is down-sampled
    assert r["fr"] == 1.0 and r["de"] == 1.0
    assert 0.0 < r["en"] < 1.0
    # realized shares follow p**alpha renormalized
    kept = {g: counts[g] * r[g] for g in counts}
    tot = sum(kept.values())
    import math
    w = {g: (c / 1000) ** 0.5 for g, c in counts.items()}
    ws = sum(w.values())
    for g in counts:
        assert math.isclose(kept[g] / tot, w[g] / ws, rel_tol=1e-12), g


def test_temperature_rates_edges():
    assert temperature_rates({}) == {}
    assert temperature_rates({"a": 0, "b": 10}) == {"a": 0.0, "b": 1.0}
    # alpha=1 is the natural mixture: every rate 1.0 (no reshaping)
    r = temperature_rates({"a": 700, "b": 300}, alpha=1.0)
    assert r == {"a": 1.0, "b": 1.0}
    with pytest.raises(ValueError, match="alpha"):
        temperature_rates({"a": 1}, alpha=0)


def test_temperature_sample_deterministic_and_flattening(spark):
    rows = [(i, "en" if i % 10 < 8 else ("fr" if i % 2 else "de"))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out1 = temperature_sample(df, alpha=0.5).toPandas()
    out2 = temperature_sample(df, alpha=0.5).toPandas()
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])  # reproducible
    mix = out1["lang"].value_counts(normalize=True)
    base = df.toPandas()["lang"].value_counts(normalize=True)
    # the dominant group's share shrinks toward the tempered mixture
    assert mix["en"] < base["en"]


from gofias_spark.operators.events import auto_date_histogram  # noqa: E402


def test_auto_date_histogram_picks_interval(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    # 40 days of daily events, target 10 -> week (<=10 buckets)
    days = mk([(i, base + dt.timedelta(days=i), "c", 1.0)
               for i in range(40)])
    iv, buckets = auto_date_histogram(days, 10, group_col=None,
                                      value_col=None)
    assert iv == "week"
    assert buckets.count() <= 10
    # 3 hours of minutely events, target 10 -> hour
    mins = mk([(i, base + dt.timedelta(minutes=i * 10), "c", 1.0)
               for i in range(18)])
    iv2, b2 = auto_date_histogram(mins, 10, group_col=None, value_col=None)
    assert iv2 == "hour" and b2.count() <= 10
    with pytest.raises(ValueError, match="target_buckets"):
        auto_date_histogram(days, 0)


def test_auto_date_histogram_empty_input(spark):
    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, event_type string, value double"
    )
    iv, buckets = auto_date_histogram(df, 10, group_col=None,
                                      value_col=None)
    assert iv == "day" and buckets.count() == 0
