"""spark-submit entry point: build (or resume) an index from a docs table.

    spark-submit --py-files gofias_spark.zip scripts/build_index.py \
        --input /path/docs_parquet_or_catalog.db.table --index /path/index \
        [--snapshot-id N | --as-of-timestamp TS]  (Iceberg time travel) \
        [--analyzer standard|edge_ngram|ngram] [--docs-per-part 65536] \
        [--block-size 128] [--refcorpus]

Resumable: re-running after a failure skips committed partitions
(manifest lineage, north_rule requirement).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gofias_spark.config import AnalyzerConfig, IndexConfig  # noqa: E402
from gofias_spark.corpus import load_refcorpus  # noqa: E402
from gofias_spark.sources.iceberg import read_docs_table  # noqa: E402
from gofias_spark.index.build import build_segment  # noqa: E402
from gofias_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input",
        help="docs source: a parquet path OR a catalog (Iceberg) table "
        "name, columns (repo,path,commit,lang,content)",
    )
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="pin an Iceberg snapshot (build reproducibility)")
    ap.add_argument("--as-of-timestamp", default=None,
                    help="Iceberg as-of-timestamp time travel")
    ap.add_argument("--refcorpus", action="store_true",
                    help="ingest /root/reference files instead of --input")
    ap.add_argument("--index", required=True)
    ap.add_argument("--analyzer", default="standard",
                    choices=["standard", "edge_ngram", "ngram"])
    ap.add_argument("--min-gram", type=int, default=1)
    ap.add_argument("--max-gram", type=int, default=40)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--positions", action="store_true",
                    help="build the positional sidecar (fast phrase "
                         "queries; standard analyzer only)")
    args = ap.parse_args()

    spark = get_spark("gofias_build")
    if args.refcorpus:
        docs = load_refcorpus(spark)
    elif args.input:
        docs = read_docs_table(
            spark, args.input,
            snapshot_id=args.snapshot_id,
            as_of_timestamp=args.as_of_timestamp,
        )
    else:
        ap.error("need --input or --refcorpus")
    cfg = IndexConfig(
        n_buckets=args.n_buckets,
        block_size=args.block_size,
        analyzer=AnalyzerConfig(
            mode=args.analyzer, min_gram=args.min_gram, max_gram=args.max_gram
        ),
        positions=args.positions,
    )
    manifest = build_segment(spark, docs, args.index, cfg)
    print(
        f"built index at {args.index}: segments={manifest['segments']} "
        f"config={manifest['config']['n_buckets']} buckets"
    )
    spark.stop()


if __name__ == "__main__":
    main()
