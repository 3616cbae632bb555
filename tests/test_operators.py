"""Operator unit tests: dedup family, similarity search, multimodal plumbing,
scalar text/geo functions — semantics beyond what the DuckDB contract checks
(recall behavior of approximate ops, constructed near-dup cases)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofias_spark.functions.geo import haversine_km, nearest, parse_geo_point
from gofias_spark.functions.text import (
    prepare_full_name,
    replace_synonyms,
    trim_name,
)
from gofias_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from gofias_spark.operators.multimodal import (
    decode_features,
    with_binary_payload,
)
from gofias_spark.operators.similarity import ann_lsh_topk, cosine_topk


@pytest.fixture(scope="module")
def near_dupes(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    mutated = base.replace("lazy", "sleepy", 1)
    rows = [
        (0, base),
        (1, base),              # exact dup of 0
        (2, mutated),           # near dup of 0
        (3, "completely different words about spark and indexes " * 6),
        (4, "another unrelated document mentioning nothing shared xyz " * 6),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_exact_duplicates(near_dupes):
    groups = {
        r["keep_id"]: r["n_dupes"]
        for r in exact_duplicates(near_dupes).collect()
    }
    assert groups[0] == 2  # docs 0 and 1 identical
    assert groups[2] == 1 and groups[3] == 1


def test_ngram_jaccard_finds_near_dup(near_dupes):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(near_dupes, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_minhash_lsh_recalls_near_dup(near_dupes):
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            near_dupes, num_hashes=64, bands=16
        ).collect()
    }
    assert (0, 1) in cands  # identical: all bands match
    assert (0, 2) in cands  # high-jaccard near dup: some band matches
    assert (3, 4) not in cands


def test_simhash_identical_and_near(near_dupes):
    h = {r["id"]: r["simhash"] for r in simhash64(near_dupes).collect()}
    assert h[0] == h[1]
    hamming = bin((h[0] ^ h[2]) & (2**64 - 1)).count("1")
    assert hamming <= 12  # near dup: few bits differ
    hamming_far = bin((h[0] ^ h[3]) & (2**64 - 1)).count("1")
    assert hamming_far > hamming


def test_cosine_topk_and_ann(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [float(x) for x in vecs[13]]
    exact = cosine_topk(df, q, k=5).collect()
    assert exact[0]["vec_id"] == 13  # self is nearest
    assert abs(exact[0]["cosine"] - 1.0) < 1e-9
    # brute-force numpy cross-check of the full ranking
    sims = vecs @ vecs[13] / (
        np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[13])
    )
    order = np.lexsort((np.arange(50), -sims))[:5]
    assert [r["vec_id"] for r in exact] == list(order)
    # ANN: query's own bucket always contains the query vector itself
    ann = ann_lsh_topk(df, q, k=5, bits=4).collect()
    assert ann[0]["vec_id"] == 13


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, content string"
    )
    media = with_binary_payload(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    out = {r["doc_id"]: r for r in decode_features(media, dim=4).collect()}
    assert out[1]["n_bytes"] == 11
    assert out[1]["first_byte"] == ord("h")
    assert len(out[1]["feature"]) == 4
    assert abs(
        out[1]["byte_mean"]
        - np.frombuffer(b"hello world", dtype=np.uint8).mean()
    ) < 1e-9
    assert out[2]["n_bytes"] == 0 and out[2]["byte_mean"] is None


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(" -.,Ленина,. ", "ул", "Ленина", "городское поселение Мирный ёлка")],
        "raw string, short string, name string, addr string",
    )
    row = df.select(
        trim_name(F.col("raw")).alias("trimmed"),
        prepare_full_name(F.col("short"), F.col("name")).alias("full"),
        replace_synonyms(F.col("addr")).alias("repl"),
    ).collect()[0]
    assert row["trimmed"] == "Ленина"
    assert row["full"] == "ул. Ленина"
    assert row["repl"] == "город Мирный елка"


def test_geo_functions(spark):
    df = spark.createDataFrame(
        [("a", 55.75, 37.62), ("b", 59.94, 30.31), ("c", 0.0, 0.0)],
        "name string, lat double, lon double",
    )
    # Moscow<->SPb ~ 635 km
    got = nearest(df, 55.75, 37.62, k=2).collect()
    assert [r["name"] for r in got] == ["a", "b"]
    assert abs(got[1]["dist_km"] - 635) < 10
    parsed = spark.createDataFrame([("55.75, 37.62",), ("bogus",)], "p string")
    lat, lon = parse_geo_point(F.col("p"))
    rows = parsed.select(lat.alias("lat"), lon.alias("lon")).collect()
    assert abs(rows[0]["lat"] - 55.75) < 1e-9
    assert rows[1]["lat"] is None


def test_multimodal_resize_and_frames(spark):
    from gofias_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(1, "a" * 200), (2, "xyz"), (3, "")],
        "doc_id long, content string",
    )
    media = MM.with_binary_payload(docs)
    resized = MM.resize_media(media, width=4, height=4).collect()
    assert {r["doc_id"] for r in resized} == {1, 2, 3}
    for r in resized:
        assert len(bytes(r["payload"])) == 16
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
    # doc 1: all 'a' bytes -> resized grid stays all ord('a')
    r1 = next(r for r in resized if r["doc_id"] == 1)
    assert set(bytes(r1["payload"])) == {ord("a")}

    frames = MM.sample_frames(media, frame_bytes=64, stride=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 200 bytes -> 4 frames (64,64,64,8), stride 2 -> idx 0 and 2
    f1 = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f1] == [0, 2]
    assert [r["n_bytes"] for r in f1] == [64, 64]
    assert f1[0]["first_byte"] == ord("a")
    # doc 2: 3 bytes -> 1 frame
    assert [r["n_bytes"] for r in by_doc[2]] == [3]
    # doc 3: empty payload -> no frames
    assert 3 not in by_doc


def test_boilerplate_detect_and_strip(spark):
    from gofias_spark.operators.textstats import (
        frequent_lines,
        strip_frequent_lines,
    )

    banner = "Licensed under the Apache License 2.0"
    rare = "This rare footer appears once or twice"
    rows = []
    for i in range(40):
        body = f"unique line {i} alpha\nanother unique {i} beta"
        if i % 2 == 0:
            body += "\n  licensed   UNDER the apache license 2.0  "
        if i in (0, 1):
            body += f"\n{rare}"
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id long, content string")

    freq = frequent_lines(docs, min_doc_frac=0.1).toPandas()
    assert list(freq["line"]) == [banner.lower()]
    assert int(freq["n_docs"].iloc[0]) == 20

    # threshold math: 2 docs < ceil(0.1*40)=4 -> rare line excluded;
    # lowering the fraction pulls it in
    freq_lo = frequent_lines(docs, min_doc_frac=0.01, min_docs=2).toPandas()
    assert rare.lower() in set(freq_lo["line"])

    cleaned = strip_frequent_lines(docs, min_doc_frac=0.1).toPandas()
    assert int(cleaned["n_lines_removed"].sum()) == 20
    assert not any(
        "apache license" in t.lower() for t in cleaned["content"]
    )
    # non-banner docs byte-identical; banner docs lose ONLY the banner line
    orig = {i: b for i, b in rows}
    for _, r in cleaned.iterrows():
        expect = "\n".join(
            l for l in orig[r["doc_id"]].split("\n")
            if "apache" not in l.lower()
        )
        assert r["content"] == expect
    # idempotent: a second pass removes nothing
    again = strip_frequent_lines(
        spark.createDataFrame(
            cleaned[["doc_id", "content"]]), min_doc_frac=0.1
    ).toPandas()
    assert int(again["n_lines_removed"].sum()) == 0


def test_shingles_short_docs_do_not_crash(spark):
    """Regression: docs with < n tokens used to make sequence(0, -1)
    DESCEND ([0, -1]) and slice(toks, 0, n) abort the whole job."""
    from pyspark.sql import functions as F

    from gofias_spark.operators.dedup import _shingles, ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "only two"), (2, "a b c d e"), (3, ""), (4, "a b c d e"),
         (5, None)],
        "doc_id long, content string",
    )
    sh = df.select(_shingles(F.col("content"), 3).alias("sh")).collect()
    assert [len(r["sh"]) for r in sh] == [0, 3, 0, 3, 0]
    pairs = ngram_jaccard_pairs(df, threshold=0.5, n=3).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(2, 4)]


def test_decontaminate(spark):
    from gofias_spark.operators.dedup import decontaminate

    bench_tokens = ("alpha beta gamma delta epsilon zeta eta theta iota "
                    "kappa lambda mu nu xi omicron")  # 15 tokens
    bench = spark.createDataFrame(
        [(100, bench_tokens)], "doc_id long, content string"
    )
    window13 = " ".join(bench_tokens.split()[:13])
    # doc 1: verbatim 13-token window from the benchmark -> contaminated
    # doc 2: only a 12-token overlap -> clean at n=13
    # doc 3: unrelated -> clean; doc 4: too short -> clean
    rows = [
        (1, f"intro words then {window13} plus trailing"),
        (2, " ".join(bench_tokens.split()[:12]) + " unrelated_tail"),
        (3, "completely unrelated content about spark partitions and joins "
            "with plenty of tokens to form many thirteen gram windows here"),
        (4, "short doc"),
    ]
    train = spark.createDataFrame(rows, "doc_id long, content string")
    got = decontaminate(train, bench, n=13).collect()
    assert [(r["id"], r["n_hit_grams"]) for r in got] == [(1, 1)]
    # at n=11 the 12-token run contains matching windows -> doc 2 flags too
    got11 = {r["id"] for r in decontaminate(train, bench, n=11).collect()}
    assert got11 == {1, 2}


def test_redact_pii(spark):
    from gofias_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame(
        [
            (0, "mail me at bob@corp.io or +1-555-123-4567 now"),
            (1, "see https://ex.io/a?u=eve@ex.io and 10.0.0.1"),
            (2, "no pii here at all"),
            (3, "two urls http://a.io http://b.io/x"),
        ],
        "doc_id long, content string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert rows[0]["redacted"] == "mail me at <EMAIL> or <PHONE> now"
    assert (rows[0]["n_email"], rows[0]["n_phone"]) == (1, 1)
    # email inside a URL: redacts once as the URL (order contract) but
    # counts for BOTH kinds (raw-text counts)
    assert rows[1]["redacted"] == "see <URL> and <IP>"
    assert (rows[1]["n_url"], rows[1]["n_email"], rows[1]["n_ip"]) == \
        (1, 1, 1)
    assert rows[2]["redacted"] == "no pii here at all"
    assert sum(rows[2][c] for c in
               ("n_url", "n_email", "n_ip", "n_phone")) == 0
    assert rows[3]["redacted"] == "two urls <URL> <URL>"
    assert rows[3]["n_url"] == 2


def test_redact_pii_kinds_subset_and_validation(spark):
    from gofias_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame(
        [(0, "bob@corp.io on 10.0.0.1")], "doc_id long, content string"
    )
    r = redact_pii(docs, kinds=["email"]).collect()[0]
    assert r["redacted"] == "<EMAIL> on 10.0.0.1"
    assert r["n_email"] == 1 and "n_ip" not in r.asDict()
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(docs, kinds=["email", "ssn"])


# ---- geo: bounding box + distance rings ----------------------------------

from gofias_spark.functions.geo import (  # noqa: E402
    distance_rings,
    haversine_km,
    in_bounding_box,
)


def test_bounding_box_plain_and_dateline(spark):
    pts = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 50.0, -100.0), (3, -20.0, 20.0),
         (4, 10.0, 175.0), (5, 10.0, -175.0)],
        "id long, lat double, lon double",
    )
    from pyspark.sql import functions as F
    plain = pts.filter(
        in_bounding_box(F.col("lat"), F.col("lon"), 60, 0, 0, 90)
    )
    assert sorted(r["id"] for r in plain.collect()) == [1]
    # box crossing the anti-meridian: lon >= 170 OR lon <= -170
    wrap = pts.filter(
        in_bounding_box(F.col("lat"), F.col("lon"), 60, 170, 0, -170)
    )
    assert sorted(r["id"] for r in wrap.collect()) == [4, 5]
    with pytest.raises(ValueError, match="bottom"):
        in_bounding_box(F.col("lat"), F.col("lon"), -10, 0, 10, 0)


def test_distance_rings_bruteforce(spark):
    import math

    rows = [(i, float(i), float(2 * i)) for i in range(-10, 11)]
    pts = spark.createDataFrame(rows, "id long, lat double, lon double")

    def hv(lat, lon):
        dlat = math.radians(lat) / 2
        dlon = math.radians(lon) / 2
        a = (math.sin(dlat) ** 2
             + math.cos(0.0) * math.cos(math.radians(lat))
             * math.sin(dlon) ** 2)
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    d = [hv(lat, lon) for _, lat, lon in rows]
    out = distance_rings(
        pts, 0.0, 0.0, [(None, 1000.0), (1000.0, 2000.0), (1500.0, None)]
    ).toPandas().set_index("ring")
    assert out.loc["*-1000.0", "cnt"] == sum(x < 1000 for x in d)
    assert out.loc["1000.0-2000.0", "cnt"] == sum(
        1000 <= x < 2000 for x in d
    )
    assert out.loc["1500.0-*", "cnt"] == sum(x >= 1500 for x in d)
    with pytest.raises(ValueError, match="non-empty"):
        distance_rings(pts, 0, 0, [])
