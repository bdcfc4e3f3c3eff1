"""Extra benchmarks for optimization round 6 (guide §1: measure first).

NOT part of the driver contract — bench.py is frozen.  This harness
isolates each bench query with the noop sink, labels jobs, optionally
dumps .explain("formatted") plans to plans/r06/, and times the minhash
pipeline stage by stage so the optimization target is evidence, not
guesswork.

Usage:
    python bench_extra.py [--plans SUFFIX] [--runs N] [--only name,...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None,
                    help="dump plans to plans/r06/<name>_<SUFFIX>.txt")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse a pre-built index dir from --idx")
    ap.add_argument("--idx", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from watertower_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=cpus,
                      app_name="watertower-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from watertower_spark.gate import tokens
    from watertower_spark.operators.dedup import (
        _shingle_sets, minhash_lsh_pairs, minhash_signatures,
    )
    from watertower_spark.operators.index_build import build_index
    from watertower_spark.operators.search import SearchEngine
    from watertower_spark.operators.similarity import cosine_topk_arrow
    from watertower_spark.sources.corpus import adapt_driver_documents

    timings: dict = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    def dump_plan(name, df):
        if not args.plans:
            return
        with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))

    def timed(name, make_df, action="noop", runs=None):
        if only and name not in only:
            return
        df = make_df()
        dump_plan(name, df)
        vals = []
        for _ in range(runs or args.runs):
            sc.setJobDescription(f"r06:{name}")
            t0 = time.time()
            if action == "noop":
                noop(df)
            elif action == "count":
                df.count()
            else:
                df.collect()
            vals.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        timings[name] = {"median": round(statistics.median(vals), 3),
                         "min": min(vals), "all": vals}
        print(f"  {name}: {timings[name]}", file=sys.stderr)

    # ---- build (same protocol as bench.py) ----
    idx = args.idx or tempfile.mkdtemp(prefix="wt_bex_idx_")
    docs, tags = adapt_driver_documents(spark, sf_dir)
    n_docs = docs.count()
    if not args.skip_build:
        build_runs = []
        for _ in range(2):
            sc.setJobDescription("r06:build_index")
            t0 = time.time()
            manifest = build_index(
                docs, tags, idx, default_lang="en",
                docs_per_shard=max(256, n_docs // (2 * cpus) or 256),
            )
            build_runs.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        timings["build_index"] = {"min": min(build_runs), "all": build_runs,
                                  "phases": manifest.get("phase_seconds")}
        print(f"  build_index: {timings['build_index']}", file=sys.stderr)

    eng = SearchEngine(spark, idx)

    # collect-based, same calls as bench.py (materialized results are
    # small, so collect ≈ noop here; keep the bench's action for
    # comparability)
    timed("q_parity_word", lambda: eng.search("data", None), "collect")
    timed("q_parity_phrase", lambda: eng.search("hash join", None), "collect")
    timed("q_bm25_top10",
          lambda: eng.search("data", None, mode="bm25", k=10), "collect")
    timed("q_bm25_phrase_top10",
          lambda: eng.search("merge sort", None, mode="bm25", k=10), "collect")
    timed("q_tag_filter",
          lambda: eng.search("scan", ["src3"], mode="bm25", k=10), "collect")
    timed("q_bm25_or_top10",
          lambda: eng.search("data scan", None, mode="bm25", operator="or",
                             k=10), "collect")
    timed("q_bm25_or_tag",
          lambda: eng.search("data scan", ["src3"], mode="bm25",
                             operator="or", k=10), "collect")
    timed("q_find_by_key",
          lambda: eng.search("unique_key:doc://000000000042"), "collect")

    # ---- minhash, end to end and stage by stage ----
    tok = tokens(spark, sf_dir)
    timed("mh_tokens", lambda: tok, "noop", runs=2)
    timed("mh_shingle_sets", lambda: _shingle_sets(tok, 3), "noop", runs=2)
    timed("mh_signatures", lambda: minhash_signatures(tok), "noop", runs=2)
    timed("q_minhash_dedup",
          lambda: minhash_lsh_pairs(tok, threshold=0.2), "count", runs=2)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.where("vec_id = 0").collect()[0]["embedding"]
    timed("q_embedding_top10",
          lambda: cosine_topk_arrow(emb, list(qvec), 10), "collect")

    out = {"sf_dir": sf_dir, "cpus": cpus, "docs": n_docs,
           "timings": timings}
    if not args.idx:
        shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
