"""Model-based randomized check of the mutation path: sequential random
`_bulk` batches (mixed ordered index/delete actions over a small key
space, heavy same-key collisions) replayed against a plain-dict
reference model. After every batch the live doc set, per-doc content,
n_docs, and search visibility must match the model exactly — this
attacks ES-sequential last-wins resolution, tombstone/copy-forward
interaction across merges, and reopen consistency in ways the
hand-written cases can't."""

import numpy as np
import pytest

from gofias_spark.api import FulltextAPI
from gofias_spark.config import IndexConfig
from gofias_spark.corpus import synth_corpus
from gofias_spark.index.build import build_segment

KEYS = [("r0", f"k{i}.py") for i in range(8)]


def _doc(key, ver):
    return {
        "repo": key[0], "path": key[1], "commit": f"c{ver}",
        "lang": "py",
        "content": f"def gen_{key[1][:-3]}_v{ver}(): return {ver}",
    }


@pytest.mark.parametrize("seed", [11, 23])
def test_random_bulk_batches_match_model(spark, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    root = str(tmp_path_factory.mktemp(f"bulkmodel{seed}"))
    build_segment(spark, synth_corpus(spark, 20), root,
                  IndexConfig(n_buckets=2, block_size=16))
    api = FulltextAPI(spark, root)
    base_docs = {
        (r["repo"], r["path"]): r["content"]
        for r in api.engine.get_doc().select(
            "repo", "path", "content").collect()
    }
    model = dict(base_docs)  # (repo, path) -> content
    ver = 0
    try:
        for _ in range(4):
            actions = []
            for _ in range(int(rng.integers(3, 12))):
                key = KEYS[int(rng.integers(0, len(KEYS)))]
                if rng.random() < 0.35:
                    actions.append(("delete",
                                    {"repo": key[0], "path": key[1]}))
                else:
                    ver += 1
                    actions.append(("index", _doc(key, ver)))
            res = api.bulk(actions=actions)
            # replay the model: ES-sequential, last action per key wins
            for kind, obj in actions:
                k = (obj["repo"], obj["path"])
                if kind == "index":
                    model[k] = obj["content"]
                else:
                    model.pop(k, None)
            live = {
                (r["repo"], r["path"]): r["content"]
                for r in api.engine.get_doc().select(
                    "repo", "path", "content").collect()
            }
            assert live == model
            assert res["n_docs"] == len(model)
            # search visibility: the latest generated token of a LIVE
            # key matches; a deleted key's tokens are gone
            for k, content in model.items():
                if k in base_docs:
                    continue
                token = content.split("def ")[1].split("(")[0]
                hits = api.engine.search(token, k=5).collect()
                assert len(hits) == 1 and hits[0]["path"] == k[1], token
    finally:
        api.close()
