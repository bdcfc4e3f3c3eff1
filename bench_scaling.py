"""Two-cluster-size scaling evidence (north_rule).

No real cluster exists in this sandbox, so the N-vs-4N-executor
criterion is evidenced by running the IDENTICAL job at two local
parallelism levels on the SAME input:

    local[8]  (N)   vs   local[32]  (4N)

Usage:
    python bench_scaling.py              # orchestrates both runs
    python bench_scaling.py --child 8    # one measured run (subprocess)

The corpus is generated once (deterministic, distributed generator) and
shared by both runs.  Efficiency = (throughput_4N / throughput_N) / 4.
Results are printed and appended to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = os.environ.get("WT_SCALE_CORPUS", "/tmp/wt_scale_corpus")
N_DOCS = int(os.environ.get("WT_SCALE_DOCS", "100000"))
LEVELS = (8, 32)


def ensure_corpus() -> None:
    if os.path.exists(f"{CORPUS}/docs/_SUCCESS"):
        return
    from watertower_spark.session import get_spark
    from watertower_spark.sources.corpus import synthetic_corpus_df

    spark = get_spark(cpus=32, shuffle_partitions=64, app_name="wt-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")
    docs, tags = synthetic_corpus_df(spark, N_DOCS, partitions=128)
    docs.write.mode("overwrite").parquet(f"{CORPUS}/docs")
    tags.write.mode("overwrite").parquet(f"{CORPUS}/tags")
    spark.stop()


def child(cpus: int) -> None:
    """One measured run: build the full index + run the query set."""
    from watertower_spark.session import get_spark
    from watertower_spark.operators.index_build import build_index
    from watertower_spark.operators.search import SearchEngine

    spark = get_spark(cpus=cpus, shuffle_partitions=2 * cpus, app_name=f"wt-scale-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{CORPUS}/docs")
    tags = spark.read.parquet(f"{CORPUS}/tags")
    n = docs.count()
    idx = f"/tmp/wt_scale_idx_{cpus}"

    t0 = time.time()
    # shard layout must be identical at both levels (same input, same
    # job): target 64 shards — 2× the larger level's cores.
    manifest = build_index(docs, tags, idx, default_lang="en",
                           docs_per_shard=max(256, -(-N_DOCS // 64)))
    build_sec = time.time() - t0
    print(json.dumps({"phases": manifest.get("phase_seconds", {})}), file=sys.stderr)

    eng = SearchEngine(spark, idx)
    queries = [
        ("data", None, "bm25"), ("merge sort", None, "bm25"),
        ("the", None, "bm25"), ("scan filter", None, "parity"),
        ("query", ["t3"], "bm25"),
    ]
    t0 = time.time()
    for q, tg, mode in queries:
        eng.search(q, tg, mode=mode, k=10).collect()
    query_sec = time.time() - t0

    print(json.dumps({
        "cpus": cpus, "docs": n, "build_sec": round(build_sec, 2),
        "build_docs_per_sec": round(n / build_sec, 1),
        "query_set_sec": round(query_sec, 2),
    }))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return
    ensure_corpus()
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(cpus)],
            capture_output=True, text=True, check=True,
            env={**os.environ, "WT_SCALE_CORPUS": CORPUS},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)
    lo, hi = LEVELS
    tput = {c: results[c]["build_docs_per_sec"] for c in LEVELS}
    eff = (tput[hi] / tput[lo]) / (hi / lo)
    q_eff = (results[lo]["query_set_sec"] / results[hi]["query_set_sec"]) / (hi / lo)
    summary = {
        "docs": results[lo]["docs"],
        "build_docs_per_sec": tput,
        "build_scaling_efficiency": round(eff, 3),
        "query_set_sec": {c: results[c]["query_set_sec"] for c in LEVELS},
        "query_scaling_efficiency": round(q_eff, 3),
    }
    print(json.dumps(summary))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.md"), "a") as f:
        f.write(
            f"\n## Run ({results[lo]['docs']} docs, local[{lo}] vs local[{hi}])\n\n"
            f"| level | build docs/sec | query-set sec |\n|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {results[c]['build_docs_per_sec']} | {results[c]['query_set_sec']} |\n"
                for c in LEVELS
            )
            + f"\nbuild scaling efficiency (throughput ratio / {hi // lo}): **{eff:.3f}**\n"
        )


if __name__ == "__main__":
    main()
