"""Index integrity check CLI.

    spark-submit --py-files gofias_spark.zip scripts/fsck.py \
        --index /path/index [--sample-docs 64] [--sample-terms 8]

Prints the JSON report; exit code 1 when any check fails.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gofias_spark.index.fsck import check_index  # noqa: E402
from gofias_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--sample-docs", type=int, default=64)
    ap.add_argument("--sample-terms", type=int, default=8)
    args = ap.parse_args()
    spark = get_spark("gofias_fsck")
    report = check_index(
        spark, args.index,
        sample_docs=args.sample_docs, sample_terms=args.sample_terms,
    )
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
