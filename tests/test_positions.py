"""Positional sidecar (IndexConfig.positions=True): block-aligned positions
table, fast phrase verification without touching the doc store, and full
equivalence with the content-verify slow path."""

import numpy as np
import pytest

from gofias_spark.config import AnalyzerConfig, IndexConfig
from gofias_spark.index.build import build_segment
from gofias_spark.index.codec import (
    decode_block_positions,
    encode_blocks_batch,
    encode_positions_stream,
)
from gofias_spark.index.merge import apply_delta
from gofias_spark.plans import checks as C
from gofias_spark.query.engine import SearchEngine

DOCS = [
    ("d0", "alpha beta gamma"),
    ("d1", "x alpha beta"),
    ("d2", "alpha, beta!"),
    ("d3", "alpha x beta"),
    ("d4", "beta alpha"),
    ("d5", "ALPHA Beta"),
    ("d6", "alphax beta"),
    ("d7", "alpha\nbeta"),
    ("d8", "alpha alpha beta"),
    ("d9", "gamma delta"),
    ("d10", "beta beta beta"),
    ("d11", "alpha one two beta"),
    ("d12", "alpha one two three beta"),
    ("d13", "beta one alpha two beta"),
    ("d14", "alpha gamma beta gamma x gamma"),
]
SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [("r", p, "c", "en", t) for p, t in rows], SCHEMA
    )


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    """(positional engine, content-verify engine) over identical docs."""
    root_pos = str(tmp_path_factory.mktemp("posidx"))
    root_slow = str(tmp_path_factory.mktemp("slowidx"))
    build_segment(
        spark, _docs_df(spark, DOCS), root_pos,
        IndexConfig(n_buckets=2, block_size=4, positions=True),
    )
    build_segment(
        spark, _docs_df(spark, DOCS), root_slow,
        IndexConfig(n_buckets=2, block_size=4),
    )
    ep = SearchEngine(spark, root_pos)
    ep.warm()  # small index -> driver-side sidecar (local one-pass)
    epd = SearchEngine(spark, root_pos, serve=False)
    epd.warm(local_max_blocks=0)  # force the distributed one-pass plan
    eps = SearchEngine(spark, root_pos)
    eps.warm(local_max_blocks=0)  # serve tier: term-bucketed sidecar
    es = SearchEngine(spark, root_slow, serve=False)
    es.warm(local_max_blocks=0)  # content-verify, distributed
    assert ep._positions is not None and ep._local_positions is not None
    assert epd._positions is not None and epd._local_positions is None
    assert eps._serve is not None and eps._serve.has_positions
    assert es._positions is None
    return ep, epd, eps, es


def _rows(df):
    return sorted(
        (r["path"], round(r["score"], 9)) for r in df.collect()
    )


PHRASES = [
    "alpha beta",
    "alpha beta gamma",
    "beta",
    "beta beta",
    "beta beta beta",
    "gamma alpha",        # wrong order anywhere -> empty
    "alpha zzzz",         # missing term
    "x alpha",
    "gamma delta",
]


@pytest.mark.parametrize("q", PHRASES, ids=str)
def test_all_four_phrase_paths_agree(engines, q):
    ep, epd, eps, es = engines
    want = _rows(es.search_phrase(q, k=20))
    assert _rows(ep.search_phrase(q, k=20)) == want    # local one-pass
    assert _rows(epd.search_phrase(q, k=20)) == want   # distributed one-pass
    assert _rows(eps.search_phrase(q, k=20)) == want   # serve-tier one-pass


def _sloppy_oracle(rows, phrase, slop):
    """Brute force over every in-order position combination (independent of
    the engine's greedy chain): doc matches iff some strictly-increasing
    assignment of positions to the phrase terms spans <= n-1+slop."""
    import itertools
    import re

    out = set()
    seq = phrase.split()
    for path, text in rows:
        toks = re.findall(r"\w+", text.lower())
        occ = [[i for i, t in enumerate(toks) if t == w] for w in seq]
        for combo in itertools.product(*occ):
            if all(b > a for a, b in zip(combo, combo[1:])) and \
                    combo[-1] - combo[0] <= len(seq) - 1 + slop:
                out.add(path)
                break
    return out


SLOPPY = [
    ("alpha beta", 1),     # d3/d7-style one-gap docs now match
    ("alpha beta", 2),     # d11 (two intervening tokens) joins
    ("alpha beta", 3),     # d12 joins
    ("beta beta", 2),      # duplicate terms: strictly increasing positions
    ("alpha gamma gamma", 3),  # 3 terms, shared window budget (d14)
    ("alpha two beta", 1),     # 3 terms in order with one gap (d13)
    ("gamma alpha", 5),    # wrong order stays empty (in_order semantics)
]


@pytest.mark.parametrize("q,slop", SLOPPY, ids=str)
def test_sloppy_phrase_all_paths_match_bruteforce(engines, q, slop):
    """Every execution tier (local sidecar, distributed one-pass, serve
    tier, positionless content-verify fallback) agrees with a brute-force
    position-combination oracle on proximity semantics."""
    ep, epd, eps, es = engines
    want = _sloppy_oracle(DOCS, q, slop)
    for eng in (ep, epd, eps, es):
        got = {r["path"] for r in eng.search_phrase(q, k=50, slop=slop)
               .collect()}
        assert got == want, (eng, q, slop)


def test_slop_zero_is_exact_phrase(engines):
    ep, *_ = engines
    for q in ("alpha beta", "beta beta", "alpha beta gamma"):
        assert _rows(ep.search_phrase(q, k=50, slop=0)) == \
            _rows(ep.search_phrase(q, k=50))


def test_sloppy_scores_are_conjunctive_bm25(engines):
    """Proximity only filters; survivors keep the exact conjunctive BM25
    score (same contract as exact phrase vs mode=and search)."""
    ep, *_ = engines
    hits = ep.search_phrase("alpha beta", k=50, slop=2).collect()
    scored = {r["path"]: r["score"]
              for r in ep.search("alpha beta", k=50, mode="and").collect()}
    assert hits
    for r in hits:
        assert r["score"] == pytest.approx(scored[r["path"]], rel=1e-12)


def test_sloppy_phrase_with_filters(engines):
    ep, epd, eps, es = engines
    f = {"doclen": {"lte": 4}}
    want = _rows(es.search_phrase("alpha beta", filters=f, slop=2))
    for eng in (ep, epd, eps):
        assert _rows(
            eng.search_phrase("alpha beta", filters=f, slop=2)
        ) == want


def test_positional_with_filters_and_paging(engines):
    ep, epd, eps, es = engines
    f = {"doclen": {"lte": 2}}
    want = _rows(es.search_phrase("alpha beta", filters=f))
    assert _rows(ep.search_phrase("alpha beta", filters=f)) == want
    assert _rows(epd.search_phrase("alpha beta", filters=f)) == want
    assert _rows(eps.search_phrase("alpha beta", filters=f)) == want
    b = es.search_phrase("alpha beta", k=2, offset=2).collect()
    for eng in (ep, epd, eps):
        a = eng.search_phrase("alpha beta", k=2, offset=2).collect()
        assert [r["path"] for r in a] == [r["path"] for r in b]


def test_driver_side_phrase_runs_no_spark_job(engines, spark):
    """Both driver-side phrase paths — the resident local sidecar AND the
    serve tier's pruned pyarrow read — must schedule zero Spark jobs (the
    serve-tier property: latency independent of cluster/core count)."""
    ep, _, eps, _ = engines
    tracker = spark.sparkContext.statusTracker()
    for eng in (ep, eps):
        before = tracker.getJobIdsForGroup(None)
        eng.search_phrase("alpha beta", k=5, as_pandas=True)
        after = tracker.getJobIdsForGroup(None)
        assert before == after, eng


def test_positional_plan_never_reads_content(engines):
    """The fast-phrase plan must contain the positional kernel and NO
    content regex / doc_meta content column — that's the whole point: a
    phrase query reads position blocks (MBs), not the doc store (the
    corpus)."""
    _, ep, _, _ = engines
    df = ep._phrase_frame(["alpha", "beta"], None)
    plan = C.physical_plan(df)
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert "RLIKE" not in plan and "rlike" not in plan, plan[:2000]
    assert "content" not in C.scan_read_schema(df), C.scan_read_schema(df)


def test_positions_block_alignment():
    """The positions stream's block boundaries must match
    encode_blocks_batch exactly for shared (terms, tfs) input."""
    rng = np.random.default_rng(3)
    terms, docs, tfs, pos = [], [], [], []
    for t in ("a", "b", "c", "dd"):
        ds = np.sort(rng.choice(np.arange(1, 200), 37, replace=False))
        for d in ds:
            k = int(rng.integers(1, 6))
            terms.append(t)
            docs.append(int(d))
            tfs.append(k)
            pos.append(np.sort(rng.choice(np.arange(50), k, replace=False)))
    terms = np.array(terms)
    tfs_a = np.array(tfs)
    flat = np.concatenate(pos)
    for bs in (1, 3, 16, 128):
        blocks = encode_blocks_batch(
            terms, np.array(docs), tfs_a.astype(np.uint64),
            np.ones_like(tfs_a, dtype=np.uint64), bs,
        )
        stream, bounds = encode_positions_stream(terms, tfs_a, flat, bs)
        assert len(bounds) - 1 == len(blocks["n"])
        # decode every block and compare to the source positions
        pi = 0
        for j in range(len(blocks["n"])):
            nblk = int(blocks["n"][j])
            fl, st = decode_block_positions(
                stream[bounds[j] : bounds[j + 1]], tfs_a[pi : pi + nblk]
            )
            for i in range(nblk):
                got = fl[st[i] : st[i] + tfs_a[pi + i]]
                assert np.array_equal(got, pos[pi + i])
            pi += nblk
        assert pi == len(tfs)


def test_positions_survive_delta(spark, tmp_path_factory):
    """apply_delta on a positional index keeps the new segment positional
    (cfg reconstructed from the manifest) — phrase results reflect the
    delta and still verify via positions."""
    root = str(tmp_path_factory.mktemp("posdelta"))
    build_segment(
        spark, _docs_df(spark, DOCS), root,
        IndexConfig(n_buckets=2, block_size=4, positions=True),
    )
    ups = _docs_df(spark, [("dnew", "zeta alpha beta zeta")])
    dels = spark.createDataFrame([("r", "d0")], "repo string, path string")
    apply_delta(spark, root, upserts=ups, deletes=dels)
    eng = SearchEngine(spark, root)
    eng.warm()
    assert eng._positions is not None  # delta segment carries positions too
    got = {r["path"] for r in eng.search_phrase("alpha beta", k=20).collect()}
    assert "dnew" in got and "d0" not in got
    assert got == {"d1", "d2", "d5", "d7", "d8", "dnew"}


def test_mixed_lineage_falls_back_to_content_verify(
    spark, tmp_path_factory
):
    """A segment built WITHOUT positions into a positional index (e.g. a
    pre-positions writer) must force the content-verify fallback — never a
    silently-partial positional answer."""
    root = str(tmp_path_factory.mktemp("posmixed"))
    build_segment(
        spark, _docs_df(spark, DOCS[:5]), root,
        IndexConfig(n_buckets=2, block_size=4, positions=True),
    )
    build_segment(
        spark, _docs_df(spark, DOCS[5:]), root,
        IndexConfig(n_buckets=2, block_size=4, positions=False),
    )
    eng = SearchEngine(spark, root)
    eng.warm()
    assert eng._positions is None
    got = {r["path"] for r in eng.search_phrase("alpha beta", k=20).collect()}
    assert got == {"d0", "d1", "d2", "d5", "d7", "d8"}


def test_positions_config_validation(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("posbad"))
    with pytest.raises(ValueError, match="standard"):
        build_segment(
            spark, _docs_df(spark, DOCS[:2]), root,
            IndexConfig(
                positions=True,
                analyzer=AnalyzerConfig(
                    mode="edge_ngram", min_gram=1, max_gram=5
                ),
            ),
        )
    with pytest.raises(ValueError, match="two-pass"):
        build_segment(
            spark, _docs_df(spark, DOCS[:2]), root,
            IndexConfig(positions=True),
            shared_staging_fs=False,
        )


# ---- span_first (ES/Lucene span_first query) ----------------------------

import re as _re


def _span_first_oracle(phrase, end, slop=0):
    """Brute force over DOCS: some in-order match of ``phrase`` (within a
    len-1+slop window when slop>0, exact adjacency otherwise) whose span
    END position is <= end."""
    seq = phrase.split()
    out = []
    for path, text in DOCS:
        toks = _re.findall(r"[a-z0-9_]+", text.lower())
        n = len(seq)
        hit = False
        # enumerate every strictly-increasing position combination
        def combos(i, prev, first):
            nonlocal hit
            if hit:
                return
            if i == n:
                if prev + 1 <= end and (prev - first) <= (n - 1 + slop):
                    hit = True
                return
            for p, t in enumerate(toks):
                if t == seq[i] and p > prev:
                    if slop == 0 and i > 0 and p != prev + 1:
                        continue
                    combos(i + 1, p, first if i else p)
        combos(0, -1, -1)
        if hit:
            out.append(path)
    return sorted(out)


@pytest.mark.parametrize(
    "q,end",
    [
        ("alpha beta", 2),   # only docs starting with the phrase
        ("alpha beta", 3),   # + one-token prefix
        ("alpha beta", 100),  # no constraint in practice == phrase
        ("beta", 1),          # first token only
        ("gamma", 3),
        ("beta beta", 2),
    ],
    ids=str,
)
def test_span_first_matches_bruteforce(engines, q, end):
    ep, epd, eps, _ = engines
    want = _span_first_oracle(q, end)
    for eng, tier in ((ep, "local"), (epd, "dist"), (eps, "serve")):
        got = sorted(
            r["path"] for r in eng.search_span_first(q, end, k=20).collect()
        )
        assert got == want, (tier, q, end, got, want)


def test_span_first_with_slop(engines):
    ep, epd, eps, _ = engines
    # "alpha one two beta": span ends at position 4, needs slop>=2
    want = _span_first_oracle("alpha beta", 4, slop=2)
    assert "d11" in want  # the case adjacency alone would miss
    for eng in (ep, epd, eps):
        got = sorted(
            r["path"]
            for r in eng.search_span_first("alpha beta", 4, k=20,
                                           slop=2).collect()
        )
        assert got == want, got


def test_span_first_scores_match_phrase(engines):
    ep, _, _, _ = engines
    # the gate only filters: surviving docs keep their phrase scores
    ph = {r["path"]: round(r["score"], 9)
          for r in ep.search_phrase("alpha beta", k=20).collect()}
    sf = {r["path"]: round(r["score"], 9)
          for r in ep.search_span_first("alpha beta", 2, k=20).collect()}
    assert set(sf) <= set(ph)
    for p, s in sf.items():
        assert s == ph[p]


def test_span_first_requires_positions(engines):
    _, _, _, es = engines
    with pytest.raises(ValueError, match="positional index"):
        es.search_span_first("alpha beta", 3, k=5).collect()


def test_span_first_validates_end(engines):
    ep = engines[0]
    with pytest.raises(ValueError, match="end must be"):
        ep.search_span_first("alpha beta", 0)


# ---- span_not (include spans not overlapping exclude spans) --------------

SPAN_NOT_DOCS = [
    ("s0", "alpha beta clean tail"),             # no exclude anywhere
    ("s1", "bad alpha beta x"),                  # 'bad' 1 before span
    ("s2", "x x bad x alpha beta"),              # 'bad' 3 before: escapes pre=2
    ("s3", "alpha beta bad"),                    # 'bad' right after
    ("s4", "bad alpha beta x alpha beta"),       # second occurrence escapes
    ("s5", "alpha bad beta"),                    # no include span at all
    ("s6", "worse alpha beta"),                  # multi-tok exclude tail part
    ("s7", "much worse alpha beta"),             # full exclude phrase before
]


def _span_not_oracle(include, exclude, pre, post):
    inc = include.split()
    exc = exclude.split()
    la, lb = len(inc), len(exc)
    out = []
    for path, text in SPAN_NOT_DOCS:
        toks = _re.findall(r"[a-z0-9_]+", text.lower())
        inc_starts = [
            s for s in range(len(toks) - la + 1)
            if toks[s:s + la] == inc
        ]
        exc_starts = [
            e for e in range(len(toks) - lb + 1)
            if toks[e:e + lb] == exc
        ]
        ok = any(
            not any(
                e > s - pre - lb and e < s + la + post
                for e in exc_starts
            )
            for s in inc_starts
        )
        if ok:
            out.append(path)
    return sorted(out)


@pytest.fixture(scope="module")
def sn_engines(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snidx"))
    build_segment(
        spark, _docs_df(spark, SPAN_NOT_DOCS), root,
        IndexConfig(n_buckets=2, block_size=4, positions=True),
    )
    local = SearchEngine(spark, root)
    local.warm()
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    srv = SearchEngine(spark, root)
    srv.warm(local_max_blocks=0)
    return local, dist, srv


@pytest.mark.parametrize(
    "exclude,pre,post",
    [
        ("bad", 0, 0),
        ("bad", 2, 0),
        ("bad", 0, 1),
        ("bad", 2, 2),
        ("much worse", 1, 0),
        ("zzz_absent", 3, 3),   # vocab-absent exclude -> plain phrase
    ],
    ids=str,
)
def test_span_not_matches_bruteforce(sn_engines, exclude, pre, post):
    want = _span_not_oracle("alpha beta", exclude, pre, post)
    for eng, tier in zip(sn_engines, ("local", "dist", "serve")):
        got = sorted(
            r["path"]
            for r in eng.search_span_not("alpha beta", exclude, k=20,
                                         pre=pre, post=post).collect()
        )
        assert got == want, (tier, exclude, pre, post, got, want)


def test_span_not_is_per_span_not_per_doc(sn_engines):
    local = sn_engines[0]
    # s4: first occurrence overlaps 'bad', the second escapes -> matches;
    # bool must_not would drop the whole doc
    got = {r["path"] for r in
           local.search_span_not("alpha beta", "bad", k=20, pre=1).collect()}
    assert "s4" in got
    mn = {r["path"] for r in local.search("alpha beta", k=20,
                                          must_not="bad").collect()}
    assert "s4" not in mn


def test_span_not_scores_match_phrase(sn_engines):
    local = sn_engines[0]
    ph = {r["path"]: round(r["score"], 9)
          for r in local.search_phrase("alpha beta", k=20).collect()}
    sn = {r["path"]: round(r["score"], 9)
          for r in local.search_span_not("alpha beta", "bad", k=20,
                                         pre=2).collect()}
    assert set(sn) <= set(ph)
    for p, sc in sn.items():
        assert sc == ph[p]


def test_span_not_validation(sn_engines):
    local = sn_engines[0]
    with pytest.raises(ValueError, match="pre and post"):
        local.search_span_not("a b", "c", pre=-1)


def test_span_not_with_filters_and_paging(sn_engines):
    want_all = _span_not_oracle("alpha beta", "bad", 2, 0)
    for eng, tier in zip(sn_engines, ("local", "dist", "serve")):
        # doclen filter engages the filter-aware (two-stage) plan
        got = sorted(
            r["path"]
            for r in eng.search_span_not(
                "alpha beta", "bad", k=20, pre=2,
                filters={"doclen": {"lte": 4}},
            ).collect()
        )
        lens = {p: len(t.split()) for p, t in SPAN_NOT_DOCS}
        want = sorted(p for p in want_all if lens[p] <= 4)
        assert got == want, (tier, got, want)
    # paging is stable
    local = sn_engines[0]
    p1 = [r["path"] for r in
          local.search_span_not("alpha beta", "bad", k=2, pre=2).collect()]
    p2 = [r["path"] for r in
          local.search_span_not("alpha beta", "bad", k=2, offset=2,
                                pre=2).collect()]
    assert len(set(p1) & set(p2)) == 0


# ---- span_containing / span_within ---------------------------------------

SPAN_REL_DOCS = [
    ("c0", "alpha beta gamma tail"),        # big=alpha beta gamma ⊇ beta
    ("c1", "alpha beta delta"),             # big occurs, no little inside
    ("c2", "beta alpha gamma"),             # big phrase absent
    ("c3", "x alpha beta gamma x beta"),    # big contains little; extra beta
    ("c4", "beta x alpha other gamma"),     # little present, big absent
]


def _span_rel_oracle(big, little, relation):
    bi, li = big.split(), little.split()
    la, lb = len(bi), len(li)
    out = []
    for path, text in SPAN_REL_DOCS:
        toks = _re.findall(r"[a-z0-9_]+", text.lower())
        bigs = [s for s in range(len(toks) - la + 1)
                if toks[s:s + la] == bi]
        littles = [e for e in range(len(toks) - lb + 1)
                   if toks[e:e + lb] == li]
        if relation == "containing":
            ok = any(any(s <= e and e + lb <= s + la for e in littles)
                     for s in bigs)
        else:  # within: little spans inside some big span
            ok = any(any(e <= s and s + lb <= e + la for e in bigs)
                     for s in littles)
        if ok:
            out.append(path)
    return sorted(out)


@pytest.fixture(scope="module")
def sr_engines(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sridx"))
    build_segment(
        spark, _docs_df(spark, SPAN_REL_DOCS), root,
        IndexConfig(n_buckets=2, block_size=4, positions=True),
    )
    local = SearchEngine(spark, root)
    local.warm()
    dist = SearchEngine(spark, root, serve=False)
    dist.warm(local_max_blocks=0)
    srv = SearchEngine(spark, root)
    srv.warm(local_max_blocks=0)
    return local, dist, srv


@pytest.mark.parametrize(
    "little", ["beta", "beta gamma", "alpha beta gamma", "zz_absent"],
    ids=str,
)
def test_span_containing_bruteforce(sr_engines, little):
    want = _span_rel_oracle("alpha beta gamma", little, "containing")
    for eng, tier in zip(sr_engines, ("local", "dist", "serve")):
        got = sorted(
            r["path"] for r in eng.search_span_containing(
                "alpha beta gamma", little, k=20
            ).collect()
        )
        assert got == want, (tier, little, got, want)


@pytest.mark.parametrize("little", ["beta", "beta gamma"], ids=str)
def test_span_within_bruteforce(sr_engines, little):
    want = _span_rel_oracle("alpha beta gamma", little, "within")
    for eng, tier in zip(sr_engines, ("local", "dist", "serve")):
        got = sorted(
            r["path"] for r in eng.search_span_within(
                little, "alpha beta gamma", k=20
            ).collect()
        )
        assert got == want, (tier, little, got, want)


def test_span_relation_scoring_sides(sr_engines):
    local = sr_engines[0]
    # containing scores the BIG phrase's terms...
    ph_big = {r["path"]: round(r["score"], 9) for r in
              local.search_phrase("alpha beta gamma", k=20).collect()}
    cont = {r["path"]: round(r["score"], 9) for r in
            local.search_span_containing("alpha beta gamma", "beta",
                                         k=20).collect()}
    assert cont and all(cont[p] == ph_big[p] for p in cont)
    # ...within scores the LITTLE phrase's terms
    ph_lit = {r["path"]: round(r["score"], 9) for r in
              local.search_phrase("beta", k=20).collect()}
    within = {r["path"]: round(r["score"], 9) for r in
              local.search_span_within("beta", "alpha beta gamma",
                                       k=20).collect()}
    assert within and all(within[p] == ph_lit[p] for p in within)


def test_span_containing_little_longer_than_big(sr_engines):
    local = sr_engines[0]
    got = local.search_span_containing("beta gamma",
                                       "alpha beta gamma", k=20).collect()
    assert got == []  # a longer little can never be contained


def _unordered_oracle(rows, phrase, slop):
    """Brute force for span_near(in_order=false): doc matches iff some
    assignment of positions to the UNIQUE terms (any order) spans
    <= len(unique)-1+slop."""
    import itertools
    import re

    out = set()
    uniq = list(dict.fromkeys(phrase.split()))
    for path, text in rows:
        toks = re.findall(r"\w+", text.lower())
        occ = [[i for i, t in enumerate(toks) if t == w] for w in uniq]
        for combo in itertools.product(*occ):
            if max(combo) - min(combo) <= len(uniq) - 1 + slop:
                out.add(path)
                break
    return out


UNORDERED = [
    ("beta alpha", 0),     # adjacent, either order: d4 AND d0/d1-style
    ("beta alpha", 1),
    ("beta alpha", 2),
    ("gamma alpha", 1),    # reversed corpus order only matches unordered
    ("gamma alpha", 5),
    ("alpha gamma beta", 2),   # 3 terms, any order (d14/d0)
]


@pytest.mark.parametrize("q,slop", UNORDERED, ids=str)
def test_span_near_unordered_matches_bruteforce(engines, q, slop):
    """search_span_near(in_order=False) agrees with the brute-force
    any-order window oracle on every positional tier (local sidecar,
    distributed one-pass, serve tier)."""
    ep, epd, eps, es = engines
    want = _unordered_oracle(DOCS, q, slop)
    for eng in (ep, epd, eps):
        got = {
            r["path"]
            for r in eng.search_span_near(q, slop=slop, k=50).collect()
        }
        assert got == want, (eng, q, slop)
    # positionless index: explicit, actionable refusal (Lucene parity)
    with pytest.raises(ValueError, match="positional"):
        es.search_span_near(q, slop=slop, k=5).collect()


def test_span_near_in_order_equals_sloppy_phrase(engines):
    ep, *_ = engines
    for q, slop in (("alpha beta", 2), ("alpha two beta", 1)):
        assert _rows(ep.search_span_near(q, slop=slop, in_order=True,
                                         k=50)) == \
            _rows(ep.search_phrase(q, k=50, slop=slop))


def test_span_near_scores_are_conjunctive_bm25(engines):
    """Proximity filters, never scores: an unordered survivor scores
    exactly as the plain AND match of the same terms."""
    ep, *_ = engines
    near = {r["path"]: round(r["score"], 9)
            for r in ep.search_span_near("gamma alpha", slop=5, k=50)
            .collect()}
    assert near  # sanity: reversed order matches only via unordered
    plain = {r["path"]: round(r["score"], 9)
             for r in ep.search("gamma alpha", k=50, mode="and").collect()}
    for path, score in near.items():
        assert plain[path] == score


def test_span_near_first_end_composes(engines):
    """span_first over an unordered near span: the matching window must
    END within the first N positions."""
    ep, *_ = engines
    # d4 "beta alpha": window [0,1], end 2 -> passes first_end=2
    # d0 "alpha beta gamma": window [0,1] passes too
    got = {r["path"] for r in ep.search_span_near(
        "beta alpha", slop=0, k=50, first_end=2).collect()}
    want = set()
    import re
    for path, text in DOCS:
        toks = re.findall(r"\w+", text.lower())
        pa = [i for i, t in enumerate(toks) if t == "beta"]
        pb = [i for i, t in enumerate(toks) if t == "alpha"]
        if any(abs(i - j) <= 1 and max(i, j) + 1 <= 2
               for i in pa for j in pb):
            want.add(path)
    assert got == want


def test_graph_synonyms_expand_as_phrases(engines):
    """Multi-token synonyms expand as PHRASE alternatives (ES
    synonym_graph): gamma => "alpha beta" matches gamma docs plus docs
    with alpha ADJACENT beta — never the scattered 'alpha x beta' — and
    the positional and content-verify tiers agree exactly."""
    import re

    ep, es = engines[0], engines[1]
    syn = {"gamma": ["alpha beta"]}
    want = set()
    for path, text in DOCS:
        toks = re.findall(r"\w+", text.lower())
        adjacent = any(
            a == "alpha" and b == "beta"
            for a, b in zip(toks, toks[1:])
        )
        if "gamma" in toks or adjacent:
            want.add(path)
    got_p = {(r["path"], round(r["score"], 9))
             for r in ep.search_synonyms("gamma", syn, k=50).collect()}
    assert {p for p, _ in got_p} == want
    got_s = {(r["path"], round(r["score"], 9))
             for r in es.search_synonyms("gamma", syn, k=50).collect()}
    assert got_p == got_s  # tier equivalence, scores included
    # mixed single+multi alternatives in one group, AND mode with a
    # second required term
    mixed = ep.search_synonyms(
        "gamma delta", {"gamma": ["x", "alpha beta"]}, k=50, mode="and"
    ).collect()
    got_paths = {r["path"] for r in mixed}
    want_paths = set()
    for path, text in DOCS:
        toks = re.findall(r"\w+", text.lower())
        adjacent = any(a == "alpha" and b == "beta"
                       for a, b in zip(toks, toks[1:]))
        g_ok = "gamma" in toks or "x" in toks or adjacent
        if g_ok and "delta" in toks:
            want_paths.add(path)
    assert got_paths == want_paths
    # a synonym that analyzes to nothing still raises
    with pytest.raises(ValueError, match="no tokens"):
        ep.search_synonyms("gamma", {"gamma": ["..."]}, k=5)
