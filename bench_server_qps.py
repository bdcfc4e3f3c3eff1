"""Concurrent HTTP-search throughput: per-request FAIR pools on vs off.

Round-4 verdict #5 (and its #3 anti-pattern finding): the HTTP server's
request threads used to share the default scheduler pool, so under
``spark.scheduler.mode=FAIR`` concurrent requests still convoyed
through one FIFO queue.  server.py now sets a per-request pool; this
harness measures what that is worth, through the REAL HTTP surface
(ThreadingHTTPServer + urllib clients), warmed, at a given pinned core
count:

    taskset -c 0-3  python bench_server_qps.py   # 4-core level
    taskset -c 0-15 python bench_server_qps.py   # 16-core level

Env: WT_QPS_DOCS (corpus size, default 100000), SPARK_GRAFT_CPUS
(local[N], default = visible cores), WT_QPS_CLIENTS (default 8),
WT_QPS_REPS (default 4).  Prints one JSON line with qps for
fair_pools=True and =False over the same server/index/session.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


QUERIES = ["data", "merge", "sort filter", "the", "query", "scan",
           "table group", "index"]


def measure(base: str, clients: int, reps: int) -> float:
    def one(q: str) -> None:
        body = json.dumps({"query": {"bool": {"must": {"match_phrase": {
            "content": {"query": q}}}}}}).encode()
        req = urllib.request.Request(
            f"{base}/indexes/default/_search?mode=bm25&k=10", data=body,
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
    with ThreadPoolExecutor(max_workers=clients) as pool:  # warm pass
        list(pool.map(one, QUERIES))
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=clients) as pool:
        list(pool.map(one, QUERIES * reps))
    return round(len(QUERIES) * reps / (time.time() - t0), 2)


def measure_msearch(base: str, reps: int) -> float:
    """Same query mix, but the whole set rides ONE ``_msearch`` request
    per rep (one Spark DAG per batch) — the batching answer to the
    same throughput question ``measure`` asks with threads."""
    lines = []
    for q in QUERIES:
        lines.append({})
        lines.append({"query": {"bool": {"must": {"match_phrase": {
            "content": {"query": q}}}}}, "size": 10})
    nd = "\n".join(json.dumps(l) for l in lines) + "\n"

    def one() -> None:
        req = urllib.request.Request(
            f"{base}/indexes/default/_msearch?mode=bm25", data=nd.encode(),
            headers={"Content-Type": "application/x-ndjson"}, method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            body = json.load(r)
            assert len(body["responses"]) == len(QUERIES)
    one()  # warm
    t0 = time.time()
    for _ in range(reps):
        one()
    return round(len(QUERIES) * reps / (time.time() - t0), 2)


def main() -> None:
    n_docs = int(os.environ.get("WT_QPS_DOCS", "100000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    clients = int(os.environ.get("WT_QPS_CLIENTS", "8"))
    reps = int(os.environ.get("WT_QPS_REPS", "4"))

    from watertower_spark.operators.index_build import build_index
    from watertower_spark.operators.search import SearchEngine
    from watertower_spark.server import make_server
    from watertower_spark.session import get_spark
    from watertower_spark.sources.corpus import synthetic_corpus_df

    spark = get_spark(cpus=cpus, shuffle_partitions=2 * cpus,
                      app_name=f"wt-server-qps-{cpus}",
                      extra_conf={"spark.scheduler.mode": "FAIR"})
    spark.sparkContext.setLogLevel("ERROR")
    idx = f"/tmp/wt_server_qps_idx_{n_docs}"
    if not os.path.exists(f"{idx}/_meta/manifest.json"):
        shutil.rmtree(idx, ignore_errors=True)
        docs, tags = synthetic_corpus_df(spark, n_docs, partitions=64)
        build_index(docs, tags, idx, default_lang="en",
                    docs_per_shard=max(256, -(-n_docs // 64)))
    eng = SearchEngine(spark, idx)

    out = {"docs": n_docs, "cpus": cpus, "clients": clients, "reps": reps}
    for fair in (False, True):  # off first: pools-on gets no warmth edge
        server = make_server({"default": eng}, fair_pools=fair)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{server.server_address[1]}"
        out[f"qps_pools_{'on' if fair else 'off'}"] = measure(
            base, clients, reps)
        if fair:
            out["qps_msearch"] = measure_msearch(base, reps)
        server.shutdown()
    out["pools_speedup"] = round(
        out["qps_pools_on"] / out["qps_pools_off"], 3)
    out["msearch_vs_threads"] = round(
        out["qps_msearch"] / out["qps_pools_on"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
