"""spark-submit entrypoint: build the inverted index.

Usage:
  spark-submit --py-files watertower_spark.zip build_index.py \
      --input /path/to/documents_table --output /path/to/index \
      [--docs-per-shard 8192] [--analyzer-lang en] [--resume]

``--input`` accepts either a parquet directory already in the engine
shape (url, warc_ts, html, text, lang) or a driver-style
documents.parquet directory (auto-detected and adapted).
``--input-json-dir`` instead ingests a folder of watertower Document
JSON files (the reference CLI's create-index mode, main.go:53-81);
``--force-language`` mirrors its flag.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input")
    src.add_argument("--input-json-dir")
    p.add_argument("--output", required=True)
    p.add_argument("--docs-per-shard", type=int, default=8192)
    p.add_argument("--analyzer-lang", default=None)
    p.add_argument("--default-lang", default="")
    p.add_argument("--force-language", default=None)
    p.add_argument("--build-id", default="b0")
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = p.parse_args()

    from watertower_spark.session import get_spark
    from watertower_spark.operators.index_build import build_index

    spark = get_spark(cpus=args.cpus, app_name="watertower-build")
    if args.input_json_dir:
        from watertower_spark.sources.corpus import read_json_doc_dir

        docs, tags = read_json_doc_dir(spark, args.input_json_dir,
                                       force_language=args.force_language)
    else:
        cols = set(spark.read.parquet(args.input).columns)
        if {"url", "warc_ts", "html", "text", "lang"} <= cols:
            docs = spark.read.parquet(args.input)
            tags = None
        else:
            from watertower_spark.sources.corpus import adapt_driver_documents

            docs, tags = adapt_driver_documents(spark, os.path.dirname(args.input.rstrip("/")))

    manifest = build_index(
        docs, tags, args.output,
        default_lang=args.default_lang,
        analyzer_lang=args.analyzer_lang,
        docs_per_shard=args.docs_per_shard,
        build_id=args.build_id,
    )
    print(json.dumps({k: manifest[k] for k in
                      ("doc_count", "n_shards", "avgdl", "build_seconds")}))


if __name__ == "__main__":
    main()
