"""Cheap host-window probe (round-5 window log protocol).

Measures (1) the pure-CPU envelope at 4 and 16 procs, (2) the sf0.1
tokenize-count time (healthy band 0.21-0.38 s per count after warm,
degraded band 0.74+ s).  One JSON line out.  No index build — runs in
~40 s, safe to fire between protocol blocks.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import _cpu_probe  # noqa: E402


def main() -> None:
    p4 = _cpu_probe(4)
    p16 = _cpu_probe(16)
    from watertower_spark.session import get_spark
    from watertower_spark.gate import tokens

    spark = get_spark(cpus=16, shuffle_partitions=32, app_name="wt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tok = tokens(spark, sf_dir)
    times = []
    for _ in range(3):
        t0 = time.time()
        tok.count()
        times.append(round(time.time() - t0, 2))
    spark.stop()
    print(json.dumps({
        "cpu_probe_4": p4, "cpu_probe_16": p16,
        "cpu_scaling": round(p16 / p4 / 4, 3),
        "tokenize_counts_sec": times,
        "tokenize_best": min(times[1:]),
    }))


if __name__ == "__main__":
    main()
