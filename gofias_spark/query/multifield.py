"""Multi-field search — ES ``multi_match`` (best_fields / most_fields).

The reference's ES mappings index several analyzed fields per document and
query them with multi_match (street/settlement suggest fields,
/root/reference/app/infrastructure/persistence/address/elastic/repository/
elasticAddressRepository.go:300-321). Lucene under ES keeps ONE index whose
term dictionary is field-scoped (``field:term``); the Spark-first analogue
keeps one sub-index per field under a shared root:

    root/field_content/   — normal index over the content column
    root/field_path/      — index over the path string (etc.)

Because doc_id assignment is a pure function of (repo, path, commit) and
the bucketing config — deterministic, data-independent of the indexed text
(corpus.assign_doc_ids) — every sub-index assigns the SAME doc_id to the
same document, so per-field scores combine on doc_id with no key join.
Each field has its own postings, df, avgdl, dl: per-field BM25 statistics
exactly as Lucene computes them per field.

Scoring (ES semantics):
  * best_fields — dis_max: score = max over fields of the field score
    (+ ``tie_breaker`` x the other fields' scores)
  * most_fields — sum over fields of the field score
Per-field boosts multiply the field's score (``fields={"path": 2.0}``).

Combination needs ALL matching docs' per-field scores (a doc's combined
rank is not bounded by its per-field ranks), so each field engine
contributes its exact full score set (engine.score_matches): driver-side
pandas when every field is on a driver tier, otherwise a Spark
union + groupBy(doc_id) agg + TakeOrderedAndProject — the shuffle is
(matched docs x fields) two-column rows, never postings.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofias_spark.config import IndexConfig
from gofias_spark.query.engine import SearchEngine

# field name -> docs-table column holding the field's source text (lazy:
# building F.col() at import time needs an active SparkContext)
FIELD_SOURCES = {"content": "content", "path": "path", "repo": "repo",
                 "lang": "lang"}


def build_fielded(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    cfg: IndexConfig | None = None,
    fields: tuple[str, ...] = ("content", "path"),
) -> None:
    """Build one sub-index per field under ``root/field_<name>/``. The
    non-content fields re-point the ``content`` column at the field's
    source text; identity keys (repo, path, commit) are untouched, so
    doc_ids match across sub-indexes by construction."""
    from gofias_spark.index.build import build_segment

    cfg = cfg or IndexConfig()
    for f in fields:
        if f not in FIELD_SOURCES:
            raise ValueError(f"unknown field {f!r} "
                             f"(have {sorted(FIELD_SOURCES)})")
        src = docs.withColumn(
            "content", F.col(FIELD_SOURCES[f]).cast("string")
        )
        build_segment(spark, src, f"{root}/field_{f}", cfg)


class MultiFieldEngine:
    def __init__(self, spark: SparkSession, root: str,
                 fields: tuple[str, ...] = ("content", "path"), **engine_kw):
        self.spark = spark
        self.engines = {
            f: SearchEngine(spark, f"{root}/field_{f}", **engine_kw)
            for f in fields
        }
        # any sub-index serves doc meta: identical identity/meta rows
        self.meta_engine = self.engines[fields[0]]

    def warm(self, **kw) -> None:
        for e in self.engines.values():
            e.warm(**kw)

    def multi_match(
        self,
        query: str,
        fields: dict[str, float] | None = None,
        k: int = 10,
        *,
        type: str = "best_fields",
        mode: str = "or",
        tie_breaker: float = 0.0,
        with_meta: bool = True,
        as_pandas: bool = False,
    ):
        """ES multi_match. ``fields`` = {field: boost} (default all fields,
        boost 1.0). ``mode`` is the per-field operator (ES operator=and
        requires all terms IN THE SAME field; a doc matches the multi_match
        when any field matches). Returns top-k by the combined score,
        doc_id asc tie-break — the same result contract as search()."""
        if type not in ("best_fields", "most_fields"):
            raise ValueError("type must be best_fields|most_fields")
        if not 0.0 <= tie_breaker <= 1.0:
            raise ValueError("tie_breaker must be in [0, 1]")
        fields = fields or {f: 1.0 for f in self.engines}
        unknown = set(fields) - set(self.engines)
        if unknown:
            raise ValueError(f"unknown fields {sorted(unknown)}")
        parts = []
        for f, w in fields.items():
            if not w > 0:
                raise ValueError(f"boost for field {f!r} must be > 0")
            r = self.engines[f].score_matches(query, mode=mode)
            parts.append((f, float(w), r))
        all_pandas = all(isinstance(r, pd.DataFrame) for _, _, r in parts)
        if all_pandas:
            frames = [
                r.assign(score=r["score"] * w)
                for _, w, r in parts if len(r)
            ]
            if not frames:
                pdf = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                    "score": pd.Series(dtype="float64")})
            else:
                cat = pd.concat(frames, ignore_index=True)
                g = cat.groupby("doc_id")["score"]
                if type == "most_fields":
                    s = g.sum()
                else:
                    mx, sm = g.max(), g.sum()
                    s = mx + tie_breaker * (sm - mx)
                pdf = (
                    s.reset_index()
                    .sort_values(["score", "doc_id"],
                                 ascending=[False, True],
                                 kind="mergesort")
                    .head(k)
                    .reset_index(drop=True)
                )
            return self.meta_engine._attach_meta(pdf, with_meta, as_pandas)
        # at least one field is distributed: combine in Spark. Pandas
        # contributions become small local relations; the agg is map-side
        # combinable and the final order is TakeOrderedAndProject.
        sdfs = []
        for f, w, r in parts:
            if isinstance(r, pd.DataFrame):
                if not len(r):
                    continue
                sdf = self.spark.createDataFrame(
                    r, schema="doc_id long, score double"
                )
            else:
                sdf = r
            sdfs.append(sdf.select(
                "doc_id", (F.col("score") * F.lit(w)).alias("score")
            ))
        if not sdfs:
            pdf = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                "score": pd.Series(dtype="float64")})
            return self.meta_engine._attach_meta(pdf, with_meta, as_pandas)
        u = sdfs[0]
        for s in sdfs[1:]:
            u = u.unionByName(s)
        if type == "most_fields":
            comb = u.groupBy("doc_id").agg(F.sum("score").alias("score"))
        else:
            comb = u.groupBy("doc_id").agg(
                (F.max("score")
                 + F.lit(tie_breaker)
                 * (F.sum("score") - F.max("score"))).alias("score")
            )
        pdf = (
            comb.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .toPandas()
        )
        return self.meta_engine._attach_meta(pdf, with_meta, as_pandas)
