"""Connected-components cluster resolution (operators/dedup.py).

Reference implementation: driver-side union-find. The Spark operator
(alternating large-star/small-star) must produce identical
(id -> min-id-of-component) labelings on chains, stars, cliques, forests,
and seeded random graphs.
"""

import random

import pytest
from pyspark.sql import functions as F

from gofias_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    ngram_jaccard_pairs,
)


def _union_find_labels(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    every = set(parent) | set(nodes or [])
    # min id per component
    comp = {}
    for n in every:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _spark_labels(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    # local_max_edges=0 forces the distributed star rounds — these tests
    # exist to check THAT path against the union-find reference
    return {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, local_max_edges=0).collect()
    }


@pytest.mark.parametrize(
    "edges",
    [
        # chain: worst case for naive propagation, exercises multiple rounds
        [(i, i + 1) for i in range(1, 40)],
        # star with a non-min hub
        [(100, v) for v in [3, 7, 50, 200, 201]],
        # two cliques + an isolated pair
        [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
        + [(a, b) for a in range(30, 34) for b in range(30, 34) if a < b]
        + [(500, 501)],
        # duplicate + reversed edges must not matter
        [(2, 1), (1, 2), (2, 3), (3, 2), (9, 9)],
    ],
)
def test_cc_matches_union_find(spark, edges):
    edges = [e for e in edges if e[0] != e[1]]
    assert _spark_labels(spark, edges) == _union_find_labels(edges)


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(150)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_labels(spark, edges) == _union_find_labels(edges)


def test_dedup_clusters_singletons_and_canonicals(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], "id_a long, id_b long"
    )
    rows = {r["id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    assert rows[1]["cluster_id"] == 1 and rows[1]["is_canonical"]
    assert rows[3]["cluster_id"] == 1 and not rows[3]["is_canonical"]
    assert rows[5]["cluster_id"] == 1 and not rows[5]["is_canonical"]
    assert rows[6]["cluster_id"] == 6 and rows[6]["is_canonical"]
    assert rows[7]["cluster_id"] == 6 and not rows[7]["is_canonical"]
    # singletons are their own canonical cluster
    for i in (0, 2, 4):
        assert rows[i]["cluster_id"] == i and rows[i]["is_canonical"]
    # filter(is_canonical) is the deduplicated corpus: one survivor/cluster
    kept = [i for i, r in rows.items() if r["is_canonical"]]
    assert sorted(kept) == [0, 1, 2, 4, 6]


def test_cc_end_to_end_with_jaccard_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    alt = base + " tail"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),   # near-dup of 1
            (3, alt + " extra"),    # near-dup of 2 (transitively of 1)
            (4, "completely different content about spark partitions"),
        ],
        "doc_id long, content string",
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    labels = {
        r["id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[4] == 4


def test_local_path_matches_distributed(spark):
    """The driver union-find fast path (edge sets <= local_max_edges)
    must label identically to the distributed star rounds."""
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    local = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df).collect()  # takes the fast path
    }
    dist = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, local_max_edges=0).collect()
    }
    assert local == dist and local == _union_find_labels(edges)
