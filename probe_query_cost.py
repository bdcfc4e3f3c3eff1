"""Per-query cost breakdown (r06): fresh-DataFrame construction vs
execution vs re-execution, plus Catalyst phase timings from the
QueryExecution tracker.  Builds (or reuses) an index at --idx."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    idx = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wt_r06_idx10"

    from watertower_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=cpus, app_name="wt-qcost")
    spark.sparkContext.setLogLevel("ERROR")

    from watertower_spark.operators.index_build import build_index
    from watertower_spark.operators.search import SearchEngine
    from watertower_spark.sources.corpus import adapt_driver_documents

    if not os.path.exists(f"{idx}/_meta/manifest.json"):
        docs, tags = adapt_driver_documents(spark, sf_dir)
        n_docs = docs.count()
        t0 = time.time()
        build_index(docs, tags, idx, default_lang="en",
                    docs_per_shard=max(256, n_docs // (2 * cpus) or 256))
        print(f"build: {time.time()-t0:.1f}s", file=sys.stderr)

    eng = SearchEngine(spark, idx)
    out = {}

    def probe(name, make, runs=3):
        rows = []
        for i in range(runs):
            t0 = time.time()
            df = make()
            t1 = time.time()
            df.collect()
            t2 = time.time()
            ph = {k: round(v / 1000.0, 3) for k, v in
                  dict(spark._jvm.scala.collection.JavaConverters
                       .mapAsJavaMap(df._jdf.queryExecution().tracker()
                                     .phases())).items()} if i == 0 else None
            rows.append({"construct": round(t1 - t0, 3),
                         "exec": round(t2 - t1, 3),
                         **({"phases": {k: str(v) for k, v in ph.items()}}
                            if ph else {})})
        out[name] = rows
        print(f"  {name}: {rows}", file=sys.stderr)

    probe("q_parity_word", lambda: eng.search("data", None))
    probe("q_parity_phrase", lambda: eng.search("hash join", None))
    probe("q_bm25_top10", lambda: eng.search("data", None, mode="bm25", k=10))
    probe("q_bm25_phrase_top10",
          lambda: eng.search("merge sort", None, mode="bm25", k=10))
    probe("q_tag_filter",
          lambda: eng.search("scan", ["src3"], mode="bm25", k=10))
    probe("q_bm25_or_top10",
          lambda: eng.search("data scan", None, mode="bm25", operator="or",
                             k=10))
    probe("q_find_by_key", lambda: eng.search("unique_key:doc://000000000042"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
