"""spark-submit entrypoint: query a built index.

Usage:
  spark-submit --py-files watertower_spark.zip query.py \
      --index /path/to/index --query "post request" \
      [--tags a,b] [--lang en] [--mode bm25] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--index", help="index directory")
    src.add_argument("--bundle", help="single-file index bundle "
                     "(export_index output; the reference CLI's "
                     "`--input watertower.idx` mode)")
    p.add_argument("--query", default="")
    p.add_argument("--tags", default="")
    p.add_argument("--lang", default="")
    p.add_argument("--mode", choices=["parity", "bm25"], default="bm25")
    p.add_argument("--operator", choices=["and", "or"], default="and")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = p.parse_args()

    from watertower_spark.session import get_spark
    from watertower_spark.operators.search import SearchEngine

    spark = get_spark(cpus=args.cpus, app_name="watertower-query")
    index_dir = args.index
    if args.bundle:
        import tempfile

        from watertower_spark.operators.bundle import import_index

        index_dir = import_index(args.bundle, tempfile.mkdtemp(prefix="wt_bundle_"))
    eng = SearchEngine(spark, index_dir)
    tags = [t for t in args.tags.split(",") if t] or None
    k = args.k if args.mode == "bm25" else None
    eng.search(args.query, tags, lang=args.lang, mode=args.mode, k=k,
               operator=args.operator).show(args.k, truncate=80)


if __name__ == "__main__":
    main()
