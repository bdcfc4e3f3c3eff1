"""Interleaved A/B of minhash_lsh_pairs' two physical plans.

Round-4 verdict #2: q_minhash_dedup regressed 5.38 → 6.64 s across the
rewrite that carries each doc's shingle-hash set through the band
exchange (bands× the shingle bytes) to eliminate two verification
joins.  The same window also slowed the unchanged-code sentinel ~+19%,
so the regression may be host drift.  This harness answers it the only
way this hypervisor allows (BENCH_SCALING.md "measurement protocol"):
the two variants run INTERLEAVED in one window — A,B,A,B,… — so drift
hits both equally, with a fixed tokenize-and-count sentinel each round
to place the window on the known health scale.

    python bench_minhash_ab.py            # sf0.1, local[32], 4 rounds
    WT_AB_ROUNDS=6 SPARK_GRAFT_SF_DIR=... python bench_minhash_ab.py

Prints one JSON line: per-variant times, medians/bests, the ratio, and
the per-round sentinel.  The winner becomes minhash_lsh_pairs'
``carry_hsets`` default (and therefore what bench.py measures).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("WT_AB_ROUNDS", "4"))

    from watertower_spark.gate import tokens
    from watertower_spark.operators.dedup import minhash_lsh_pairs
    from watertower_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=cpus, app_name="wt-minhash-ab")
    spark.sparkContext.setLogLevel("ERROR")
    tok = tokens(spark, sf_dir)

    def run(carry: bool) -> float:
        t0 = time.time()
        minhash_lsh_pairs(tok, threshold=0.2, carry_hsets=carry).count()
        return round(time.time() - t0, 3)

    def sentinel() -> float:
        t0 = time.time()
        tok.count()
        return round(time.time() - t0, 3)

    run(True)  # one unmeasured warmup (JVM/codegen/Arrow init)
    carry_t, fetch_t, sent_t = [], [], []
    for _ in range(rounds):
        sent_t.append(sentinel())
        carry_t.append(run(True))
        fetch_t.append(run(False))
    out = {
        "metric": "minhash carry-through vs candidates-then-fetch (interleaved)",
        "sf_dir": sf_dir, "cpus": cpus, "rounds": rounds,
        "carry": carry_t, "fetch": fetch_t, "sentinel": sent_t,
        "carry_median": round(statistics.median(carry_t), 3),
        "fetch_median": round(statistics.median(fetch_t), 3),
        "carry_best": min(carry_t), "fetch_best": min(fetch_t),
        "fetch_over_carry_median": round(
            statistics.median(fetch_t) / statistics.median(carry_t), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
