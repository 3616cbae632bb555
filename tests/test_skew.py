"""Skew + determinism (SURVEY.md §5.3, §5.6):
  * hot term in 50% of docs (q10) builds fine and stays rank-identical —
    the document-partitioned layout spreads hot postings across every
    doc_part, so no single task ever owns a whole hot posting list;
  * doc_id assignment and the full postings table are invariant to input
    partitioning / parallelism (north_rule: same results at N and 4N).
"""

import numpy as np

from gofias_spark.config import IndexConfig
from gofias_spark.corpus import assign_doc_ids, synth_corpus
from gofias_spark.index.build import build_segment
from gofias_spark.query.engine import SearchEngine

from .oracle import OracleIndex

CFG = IndexConfig(n_buckets=4, block_size=32)


def test_hot_term_rank_identity(spark, tmp_path):
    """FIXTURES q10: 'common_util' appears in 50% of docs."""
    root = str(tmp_path / "skewidx")
    docs = synth_corpus(spark, 500)
    build_segment(spark, docs, root, CFG)
    engine = SearchEngine(spark, root)

    # hot-term df really is 50%
    assert engine.count("common_util") == 250

    rows = engine.doc_meta.select("doc_id", "content").collect()
    oracle = OracleIndex({r["doc_id"]: r["content"] for r in rows})
    for query, k in [("common_util", 10), ("common_util helper", 10)]:
        got = engine.search(query, k=k).collect()
        exp = oracle.search(query, k=k)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp]
        assert np.allclose(
            [r["score"] for r in got], [s for _, s in exp], rtol=1e-9
        )
    # hot term's postings are spread over every doc_part (no skew pocket)
    parts = (
        engine.postings.filter("term = 'common_util'")
        .select("doc_part")
        .distinct()
        .count()
    )
    assert parts == 4  # 500 docs / 128 per part


def test_doc_id_parallelism_invariance(spark):
    """doc_ids are a pure function of (seg, key-hash bucket, in-bucket key
    rank) — identical regardless of input partitioning/parallelism."""
    docs = synth_corpus(spark, 300)
    a = {
        (r["repo"], r["path"], r["commit"]): (r["doc_id"], r["doc_part"])
        for r in assign_doc_ids(docs.repartition(2), n_buckets=7).collect()
    }
    b = {
        (r["repo"], r["path"], r["commit"]): (r["doc_id"], r["doc_part"])
        for r in assign_doc_ids(docs.repartition(13), n_buckets=7).collect()
    }
    assert a == b
    assert len({v[0] for v in a.values()}) == 300  # unique
    # dense rank within each bucket
    from collections import defaultdict

    by_part = defaultdict(list)
    for doc_id, part in a.values():
        by_part[part].append(doc_id & ((1 << 28) - 1))
    for part, ranks in by_part.items():
        assert sorted(ranks) == list(range(len(ranks)))


def test_postings_invariant_to_input_partitioning(spark, tmp_path):
    docs = synth_corpus(spark, 200)

    def build(root, nparts):
        build_segment(spark, docs.repartition(nparts), str(root), CFG)
        eng = SearchEngine(spark, str(root), cache=False)
        return sorted(
            (r["term"], r["doc_part"], r["block_id"], bytes(r["docs"]),
             bytes(r["tfs"]), bytes(r["dls"]))
            for r in eng.postings.collect()
        )

    assert build(tmp_path / "p3", 3) == build(tmp_path / "p16", 16)
