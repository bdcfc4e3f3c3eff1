"""Parquet-codec A/B for the index build: snappy (Spark default) vs zstd.

Motivation (round-5 scaling tally): the disk-bound doc_tables phase
absorbs every degraded-window loss — doc_store + postings are the two
multi-GB outputs (2.1 GB + 1.8 GB at 8M docs under snappy).  Bytes
written is the one lever that helps BOTH this single-disk sandbox and a
real cluster (less disk + network at every scale).  zstd trades CPU —
which the build has in surplus (the write overlaps the analysis on
driver threads) — for bytes.

Interleaved pinned protocol (the repo's standard): alternate codecs
within one window, best-of per codec, 16 pinned cores, 1M-doc corpus,
build + a warmed 5-query BM25 read-back so the decode side is measured
too.  One JSON line per child; summary JSON at the end.

Usage: python bench_codec_ab.py            # orchestrates N rounds
       WT_CODEC_ROUNDS=3 python bench_codec_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = os.environ.get("WT_CODEC_CORPUS", "/tmp/wt_sentinel_corpus")
N_DOCS = int(os.environ.get("WT_CODEC_DOCS", "1000000"))
ROUNDS = int(os.environ.get("WT_CODEC_ROUNDS", "3"))
CPUS = 16
CODECS = ("snappy", "zstd")


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def child(codec: str) -> None:
    from watertower_spark.session import get_spark
    from watertower_spark.operators import index_build as ib
    from watertower_spark.operators.index_build import build_index
    from watertower_spark.operators.search import SearchEngine

    # build_index pins its own PARQUET_CODEC over the session conf (the
    # winning default, decided by THIS harness) — override the module
    # constant so the A/B arms stay distinguishable.
    ib.PARQUET_CODEC = codec
    spark = get_spark(
        cpus=CPUS, shuffle_partitions=2 * CPUS, app_name=f"wt-codec-{codec}",
        extra_conf={"spark.sql.parquet.compression.codec": codec},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{CORPUS}/docs")
    tags = spark.read.parquet(f"{CORPUS}/tags")
    idx = f"/tmp/wt_codec_idx_{codec}"
    shutil.rmtree(idx, ignore_errors=True)

    t0 = time.time()
    manifest = build_index(
        docs, tags, idx, default_lang="en",
        docs_per_shard=max(256, -(-N_DOCS // 64)),
    )
    build_sec = time.time() - t0

    eng = SearchEngine(spark, idx)
    qset = ["data", "merge sort", "the", "scan filter", "query"]
    for q in qset:  # warm: worker spin-up + term-stats memoization
        eng.search(q, None, mode="bm25", k=10).collect()
    t0 = time.time()
    for q in qset:
        eng.search(q, None, mode="bm25", k=10).collect()
    query_sec = time.time() - t0

    print(json.dumps({
        "codec": codec,
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(N_DOCS / build_sec, 1),
        "query_set_sec": round(query_sec, 2),
        "bytes": {
            t: _du(f"{idx}/{t}")
            for t in ("doc_store", "postings", "doc_map", "doc_stats",
                      "doc_len", "tags", "term_stats")
        },
        "phases": manifest.get("phase_seconds", {}),
    }))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    runs: dict = {c: [] for c in CODECS}
    pin = ["taskset", "-c", f"0-{CPUS - 1}"] if shutil.which("taskset") else []
    for _ in range(ROUNDS):
        for codec in CODECS:
            out = subprocess.run(
                pin + [sys.executable, __file__, "--child", codec],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            runs[codec].append(json.loads(line))
            print(line, flush=True)
    summary = {
        c: {
            "best_build_sec": min(r["build_sec"] for r in runs[c]),
            "all_build_sec": [r["build_sec"] for r in runs[c]],
            "best_query_set_sec": min(r["query_set_sec"] for r in runs[c]),
            "total_bytes": sum(runs[c][0]["bytes"].values()),
            "bytes": runs[c][0]["bytes"],
        }
        for c in CODECS
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
