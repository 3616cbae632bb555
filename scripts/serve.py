"""Launch the HTTP JSON gateway over a built index (S11 analogue).

    spark-submit --py-files gofias_spark.zip scripts/serve.py \
        --index /data/index [--prefix-index /data/pfx] [--port 8080]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gofias_spark.api import FulltextAPI  # noqa: E402
from gofias_spark.server import serve  # noqa: E402
from gofias_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--prefix-index", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()

    spark = get_spark("gofias_serve")
    api = FulltextAPI(spark, args.index, prefix_index_root=args.prefix_index)
    api.engine.warm()
    if api.prefix_engine is not None:
        api.prefix_engine.warm()
    server, thread = serve(api, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} (Ctrl-C to stop)")
    try:
        thread.join()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
