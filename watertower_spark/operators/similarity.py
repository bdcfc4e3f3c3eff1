"""Similarity search over embedding columns (array<float>).

- brute_force_knn     — exact cosine top-k, fully relational (posexplode
                        + broadcast query + groupBy) → whole-stage codegen
- cosine_topk_arrow   — exact top-k via a vectorized Arrow kernel (one
                        numpy matmul per batch) — the fast single-query
                        path at scale
- lsh_bucketed_knn    — random-hyperplane LSH buckets as the approximate
                        scale path: candidates share >= 1 of n_tables
                        bucket codes; exact cosine re-rank of candidates
- rrf_fuse            — reciprocal-rank fusion of N ranked lists (the
                        lexical+dense hybrid-retrieval combiner)

Scale: brute force is O(N·d) per query — fine fanned out over
partitions for one query, wrong for query batches; the LSH path bounds
the candidate set per query by bucket size, turning top-k into a
bucket-join + rerank (the IVF-style pattern).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def brute_force_knn(emb: DataFrame, query_vec: list, k: int = 10,
                    exclude_vec_id: int | None = None) -> DataFrame:
    """Exact cosine top-k, relationally (no Python on the hot path)."""
    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5
    pe = emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
    if exclude_vec_id is not None:
        pe = pe.where(F.col("vec_id") != exclude_vec_id)
    qdf = pe.sparkSession.createDataFrame(list(enumerate(q)), "i int, y double")
    return (
        pe.join(F.broadcast(qdf), "i")
        .groupBy("vec_id")
        .agg(
            (
                F.sum(F.col("x").cast("double") * F.col("y"))
                / (F.sqrt(F.sum(F.col("x").cast("double") * F.col("x"))) * F.lit(qn))
            ).alias("cos")
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def cosine_topk_arrow(emb: DataFrame, query_vec: list, k: int = 10) -> DataFrame:
    """Exact top-k with a per-partition numpy matmul kernel + global merge."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            cos = (m @ q) / norms
            top = np.argsort(-cos, kind="stable")[:k]
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy()[top], "cos": cos[top]})

    partial = emb.select("vec_id", "embedding").mapInPandas(kernel, "vec_id long, cos double")
    return partial.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)


def lsh_bucket_codes(emb: DataFrame, n_planes: int = 12, n_tables: int = 4,
                     dim: int = 64, seed: int = 11) -> DataFrame:
    """(vec_id, table, bucket): random-hyperplane signatures per table."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            out_id, out_t, out_b = [], [], []
            for t in range(n_tables):
                bits = (m @ planes[t].T) > 0  # (n, n_planes)
                codes = (bits * (1 << np.arange(n_planes))).sum(axis=1)
                out_id.extend(pdf["vec_id"].tolist())
                out_t.extend([t] * len(pdf))
                out_b.extend(codes.tolist())
            yield pd.DataFrame({"vec_id": out_id, "table": out_t, "bucket": out_b})

    return emb.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_id long, table int, bucket long"
    )


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                             n_planes: int = 10, n_tables: int = 6,
                             dim: int = 64, seed: int = 11,
                             max_bucket: int = 2000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (va < vb, cos >= threshold).

    Candidates = vectors sharing any LSH table bucket (random
    hyperplanes: collision probability (1-θ/π)^n_planes per table);
    candidates verified with EXACT cosine, so the threshold is exact and
    LSH affects recall only.  Oversized buckets are dropped, not
    exploded (CC-scale guard)."""
    codes = lsh_bucket_codes(emb, n_planes, n_tables, dim, seed)
    from pyspark.sql import Window

    sized = codes.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("table", "bucket"))
    ).where(F.col("bsz") <= max_bucket)
    cand = (
        sized.alias("x")
        # merge hint: as with minhash_lsh_pairs, a statically-planned
        # broadcast would recompute the whole LSH-coding pipeline for
        # the build side; sort-merge lets both aliases reuse ONE
        # (table, bucket) exchange (guide §2.4)
        .hint("merge")
        .join(sized.alias("y"), ["table", "bucket"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("va"), F.col("y.vec_id").alias("vb"))
        .distinct()
    )
    pe = emb.select("vec_id", F.posexplode("embedding").alias("i", "x")) \
        .withColumn("x", F.col("x").cast("double"))
    joined = (
        cand.join(pe.select(F.col("vec_id").alias("va"), "i", F.col("x").alias("xa")), ["va"])
        .join(pe.select(F.col("vec_id").alias("vb"), "i", F.col("x").alias("xb")), ["vb", "i"])
        .groupBy("va", "vb")
        .agg(
            F.round(
                F.sum(F.col("xa") * F.col("xb"))
                / (F.sqrt(F.sum(F.col("xa") * F.col("xa"))) * F.sqrt(F.sum(F.col("xb") * F.col("xb")))),
                4,
            ).alias("cos")
        )
    )
    return joined.where(F.col("cos") >= threshold).select("va", "vb", "cos")


def ivf_index(emb: DataFrame, n_lists: int = 16, seed: int = 11,
              max_iter: int = 20):
    """IVF coarse quantizer (the classic inverted-file ANN layout):
    distributed k-means (pyspark.ml) assigns every vector to its nearest
    centroid's inverted list.  Returns ``(assigned, centers)`` where
    ``assigned`` carries a ``list_id`` column and ``centers`` is the
    (n_lists, dim) centroid matrix (driver-side, tiny).

    Scale path: persist ``assigned`` partitioned by ``list_id`` — a
    probe then reads exactly ``n_probe`` partitions instead of the
    whole table (partition pruning does the candidate narrowing)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = emb.select("vec_id", "embedding").withColumn(
        "_v", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter, featuresCol="_v").fit(v)
    assigned = model.transform(v).select(
        "vec_id", "embedding", F.col("prediction").alias("list_id")
    )
    centers = np.stack([c for c in model.clusterCenters()])
    return assigned, centers


def ivf_knn(assigned: DataFrame, centers: np.ndarray, query_vec: list,
            k: int = 10, n_probe: int = 4) -> DataFrame:
    """Approximate top-k over an IVF index: pick the ``n_probe`` nearest
    centroids driver-side (tiny matrix op), scan only their lists, exact
    cosine re-rank of the candidates."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = np.linalg.norm(centers - q, axis=1)
    probes = [int(i) for i in np.argsort(d, kind="stable")[:n_probe]]
    cand = assigned.where(F.col("list_id").isin(probes))
    return cosine_topk_arrow(cand.select("vec_id", "embedding"), q.tolist(), k)


def auto_n_probe(n_vectors: int, n_lists: int, k: int = 10,
                 target_candidates_per_k: int = 32) -> int:
    """Probe count from corpus cardinality (the IVF twin of
    ``auto_n_planes``): probe enough inverted lists that the expected
    candidate pool is ~32·k vectors.  Tiny corpora probe most lists —
    k-means centroids are noisy at n≈10^2-10^3, so neighbors scatter
    across lists (measured: the sf0.01 gate corpus needs 6/8 probes for
    8/10 recall, while sf0.1 reaches 10/10 at 3) — and large corpora
    keep both the probe fraction and the absolute candidate scan small."""
    import math

    want = target_candidates_per_k * k
    return max(3, min(n_lists, math.ceil(want * n_lists / max(n_vectors, 1))))


def auto_n_planes(n_vectors: int, target_bucket: int = 32,
                  lo: int = 2, hi: int = 24) -> int:
    """Plane count from corpus cardinality: aim for ~``target_bucket``
    vectors per bucket (expected occupancy N/2^planes).  Round 2's fixed
    n_planes=12 made expected occupancy ≪1 at small/sparse corpora, so
    the query collided with nothing and top-k silently returned empty —
    the plane count must FOLLOW the data, exactly like IVF's n_lists."""
    import math

    return max(lo, min(hi, int(math.log2(max(n_vectors / max(target_bucket, 1), 2.0)))))


_NVEC_CACHE: dict = {}


def resolve_n_vectors(emb: DataFrame) -> int:
    """Corpus cardinality WITHOUT a per-query count job.

    A bare parquet scan (no filter/join in the plan) answers from the
    file footers' row counts — a driver-side pyarrow read of metadata
    already resident in the page cache, zero Spark jobs.  Anything else
    falls back to ONE ``count()``.  Either way the answer is memoized
    (keyed by the scan's file set, or the plan object for non-scans), so
    a service issuing many queries against the same corpus pays the
    resolution once, not per search (round-4 verdict #4)."""
    import re

    files = tuple(sorted(emb.inputFiles()))
    plan = emb._jdf.queryExecution().analyzed().toString()
    # expression ids (#123L) differ between otherwise-identical reads of
    # the same path — normalize them out so re-reads share a cache entry,
    # while a FILTERED scan over the same files still keys differently
    key = (files, re.sub(r"#\d+", "", plan))
    if key in _NVEC_CACHE:
        return _NVEC_CACHE[key]
    n = None
    if files and all(f.endswith(".parquet") for f in files):
        # footer counts are exact only for an unfiltered scan; any
        # Filter/Join/Aggregate in the plan changes the cardinality
        if not any(op in plan for op in ("Filter", "Join", "Aggregate")):
            try:
                import pyarrow.parquet as pq

                n = sum(
                    pq.ParquetFile(f.removeprefix("file:")).metadata.num_rows
                    for f in files
                )
            except Exception:
                n = None
    if n is None:
        n = emb.count()
    _NVEC_CACHE[key] = n
    return n


def lsh_bucketed_knn(emb: DataFrame, query_vec: list, k: int = 10,
                     n_planes: int | None = None, n_tables: int = 4,
                     seed: int = 11, multiprobe: int = 1,
                     n_vectors: int | None = None) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any table bucket
    with the query (plus, with ``multiprobe`` ≥ 1, buckets within that
    Hamming distance of the query's code — the standard recall rescue
    for unlucky hyperplane splits at zero index cost); exact cosine
    re-rank of candidates only.

    ``n_planes=None`` derives the plane count from the corpus size
    (``n_vectors``; resolved job-free from parquet footer metadata and
    memoized when not supplied — ``resolve_n_vectors``) so bucket
    occupancy lands near the target regardless of scale."""
    if n_planes is None:
        if n_vectors is None:
            n_vectors = resolve_n_vectors(emb)
        n_planes = auto_n_planes(n_vectors)
    q = np.asarray(query_vec, dtype=np.float64)
    dim = q.shape[0]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    weights = 1 << np.arange(n_planes)
    q_buckets = []
    for t in range(n_tables):
        bits = (planes[t] @ q > 0).astype(np.int64)
        base_code = int((bits * weights).sum())
        probes = {base_code}
        if multiprobe >= 1:
            for i in range(n_planes):
                probes.add(base_code ^ (1 << i))  # Hamming-1 neighbors
        if multiprobe >= 2:
            for i in range(n_planes):
                for j in range(i + 1, n_planes):
                    probes.add(base_code ^ (1 << i) ^ (1 << j))
        q_buckets.extend((t, c) for c in sorted(probes))
    codes = lsh_bucket_codes(emb, n_planes, n_tables, dim, seed)
    qb = emb.sparkSession.createDataFrame(q_buckets, "table int, bucket long")
    cand_ids = codes.join(F.broadcast(qb), ["table", "bucket"]).select("vec_id").distinct()
    cand = emb.join(cand_ids, "vec_id")
    return cosine_topk_arrow(cand, query_vec.tolist() if hasattr(query_vec, "tolist") else query_vec, k)


def rrf_fuse(ranked: list, k: int = 60, id_col: str = "doc_id",
             rank_col: str = "rank", topk: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists.

    Each input DataFrame carries (id_col, rank_col) with rank starting
    at 1; the fused score is Σ 1/(k + rank) over the lists an id
    appears in, rounded to 6 so ordering is float-stable, ties broken
    by id.  The standard lexical+dense hybrid-retrieval combiner: it
    needs only ranks, so BM25 and cosine scores never have to be
    calibrated against each other.

    Scale: inputs are per-query top-k lists (tens to hundreds of
    rows), so the union + groupBy is a trivially small job regardless
    of corpus size — fusion cost is independent of N docs.
    """
    contribs = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("c"),
        )
        for df in ranked
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    return (
        u.groupBy(id_col)
        .agg(F.round(F.sum("c"), 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(topk)
    )
