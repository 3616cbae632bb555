"""Index integrity checker (fsck) — the ops tool a 100 TB index needs
before you trust it: structural checks are metadata-only (cheap at any
scale); data checks are SAMPLED so the cost is O(sample), never O(index).

Checks:
  * manifest <-> segment meta consistency (segment dirs exist, meta.json
    parses, doc_id bounds nested inside the manifest watermark);
  * per-partition lineage vs files on disk (every committed partition has
    its postings + doc_meta partition dirs; n_docs equals the lineage sum);
  * tombstone accounting (manifest counts match the tombstone parquet);
  * SAMPLED content invariant: sha256(content) recomputed for ``sample_docs``
    doc-store rows must equal the stored digest (the corpus round-trip
    invariant, corpus.py);
  * SAMPLED postings <-> stats: for ``sample_terms`` terms, the RAW df from
    term_stats must equal the posting count physically present in the
    postings table (both include tombstoned docs — tombstones are logical,
    applied at query time).

Returns a dict with ``ok`` plus per-check details; every failure lists the
offending object. Exposed as ``scripts/fsck.py``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gofias_spark.index.store import IndexStore


def check_index(
    spark: SparkSession,
    index_root: str,
    sample_docs: int = 64,
    sample_terms: int = 8,
) -> dict:
    store = IndexStore(index_root)
    report: dict = {"root": str(index_root), "errors": [], "checks": {}}
    err = report["errors"].append

    manifest = store.read_manifest()
    seg_ids = manifest.get("segments", [])
    report["checks"]["segments"] = len(seg_ids)

    # -- structural: segments, lineage, partition dirs ---------------------
    n_docs_total = 0
    for s in seg_ids:
        sdir = store.seg_dir(s)
        if not (sdir / "meta.json").exists():
            err(f"segment {s}: meta.json missing")
            continue
        meta = store.read_seg_meta(s)
        n_docs_total += meta.n_docs
        live = [p for p in meta.partitions if p.get("status") == "committed"]
        ndocs = sum(int(p.get("n_docs", 0)) for p in live)
        if ndocs != meta.n_docs:
            err(
                f"segment {s}: lineage n_docs {ndocs} != meta n_docs "
                f"{meta.n_docs}"
            )
        if meta.n_docs and meta.min_doc_id > meta.max_doc_id:
            err(f"segment {s}: doc_id bounds inverted "
                f"({meta.min_doc_id} > {meta.max_doc_id})")
        if meta.max_doc_id >= manifest.get("next_doc_id", 2**63 - 1):
            err(f"segment {s}: max_doc_id {meta.max_doc_id} >= manifest "
                f"next_doc_id {manifest['next_doc_id']}")
        for p in live:
            pid = p["part"]
            for table, nfield in (("postings", "rows"), ("doc_meta", "n_docs")):
                pdir = sdir / table / f"doc_part={pid}"
                if int(p.get(nfield, 0)) > 0 and not (
                    pdir.exists() and any(pdir.glob("*.parquet"))
                ):
                    err(f"segment {s}: {table} partition dir missing for "
                        f"committed doc_part={pid}")

    # -- tombstone accounting ----------------------------------------------
    tomb = manifest.get("tombstones", {"n_docs": 0, "files": []})
    if tomb.get("files"):
        tdf = spark.read.parquet(
            *[str(store.root / f) for f in tomb["files"]]
        )
        n_tomb = tdf.count()
        if n_tomb != tomb["n_docs"]:
            err(f"tombstones: manifest n_docs {tomb['n_docs']} != parquet "
                f"rows {n_tomb}")
        report["checks"]["tombstones"] = tomb["n_docs"]
    live_docs = n_docs_total - tomb.get("n_docs", 0)
    report["checks"]["live_docs"] = live_docs

    metas = [
        spark.read.parquet(str(store.seg_dir(s) / "doc_meta"))
        for s in seg_ids
        if (store.seg_dir(s) / "doc_meta").exists()
    ]
    if not metas:
        report["ok"] = not report["errors"]
        return report
    doc_meta = metas[0]
    for m in metas[1:]:
        doc_meta = doc_meta.unionByName(m, allowMissingColumns=True)

    # -- sampled sha256 invariant -------------------------------------------
    sample = doc_meta.select("doc_id", "sha256", "content").limit(
        sample_docs
    ).collect()
    bad = [
        int(r["doc_id"])
        for r in sample
        if hashlib.sha256((r["content"] or "").encode()).hexdigest()
        != r["sha256"]
    ]
    if bad:
        err(f"sha256 mismatch on doc_ids {bad[:5]}"
            + ("..." if len(bad) > 5 else ""))
    report["checks"]["sha256_sampled"] = len(sample)

    # -- sampled postings <-> stats agreement -------------------------------
    stats = None
    for s in seg_ids:
        sdir = store.seg_dir(s) / "term_stats"
        if sdir.exists():
            df = spark.read.parquet(str(sdir))
            stats = df if stats is None else stats.unionByName(
                df, allowMissingColumns=True
            )
    if stats is not None:
        terms = [
            r["term"]
            for r in stats.select("term").distinct().limit(sample_terms)
            .collect()
        ]
        if terms:
            raw = {
                r["term"]: int(r["df"])
                for r in stats.filter(F.col("term").isin(terms))
                .groupBy("term").agg(F.sum("df").alias("df")).collect()
            }
            postings = None
            for s in seg_ids:
                pdir = store.seg_dir(s) / "postings"
                if pdir.exists():
                    df = spark.read.parquet(str(pdir))
                    postings = df if postings is None else (
                        postings.unionByName(df, allowMissingColumns=True)
                    )
            # all postings dirs gone but term_stats survive: report the
            # corruption rather than AttributeError on the None union
            got = {} if postings is None else {
                r["term"]: int(r["n"])
                for r in postings.filter(F.col("term").isin(terms))
                .groupBy("term").agg(F.sum("n").alias("n")).collect()
            }
            for t in terms:
                if raw.get(t, 0) != got.get(t, 0):
                    err(f"term {t!r}: term_stats raw df {raw.get(t, 0)} != "
                        f"postings doc count {got.get(t, 0)}")
            report["checks"]["terms_sampled"] = len(terms)

    report["ok"] = not report["errors"]
    return report
