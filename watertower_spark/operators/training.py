"""Training-set assembly operators: deterministic stratified sampling
and sequence packing.

A pre-training data pipeline ends by (a) MIXING sources/languages to
target proportions and (b) PACKING documents into fixed-length token
sequences.  Both are implemented here as pure DataFrame plans with an
explicit 100-TB posture:

- ``stratified_sample`` is a zero-shuffle narrow filter: membership is
  a pure function of (key, salt, stratum fraction), so no global
  count, no state, no sampling RNG to coordinate across executors —
  re-running the job, or running it on two disjoint slices of the
  corpus, selects the same documents.  This is how quota-mixing has
  to work at crawl scale: the quota is expressed as a per-stratum
  keep-fraction, not as a target row count that would need a global
  pre-count.
- ``pack_sequences`` needs a global token prefix-sum (every doc's
  offset in the virtual concatenated token stream).  A naive
  ``sum() OVER (ORDER BY doc_id)`` window collapses to ONE partition
  in Spark; this implementation is the classic two-phase distributed
  prefix sum instead: range-repartition by the order key, local
  cumulative sums per partition, a P-row exchange of partition totals
  (P = shuffle partitions, driver-size), then a broadcast join of the
  per-partition base offsets.  Wall-clock is one range shuffle +
  narrow maps regardless of corpus size, and the output is invariant
  to where the range boundaries land.

No reference-repo counterpart (these extend the engine toward the
training-data pipeline the brief's §"beyond the reference" names);
semantics follow the standard GPT-style concat-and-chunk description
(e.g. Brown et al. 2020 §2.2: documents are concatenated and split
into fixed-length sequences, documents crossing boundaries continue
in the next sequence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["stratified_sample", "sample_threshold_hex", "pack_sequences"]

_HEX_SPACE = 16 ** 8  # md5 prefix width used for the keep-gate


def sample_threshold_hex(fraction: float) -> str:
    """Map a keep-fraction to the 8-hex-digit threshold string.

    A row is kept iff the first 8 hex chars of md5(key:salt) compare
    lexicographically below this threshold; hex strings of equal
    length order identically to their numeric values, so the SAME
    literal works in Spark and in any ANSI SQL oracle with md5().
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def _keep_gate(key: Column, fraction: float, salt: str) -> Column:
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    digest = F.substring(
        F.md5(F.encode(F.concat_ws(":", key.cast("string"), F.lit(salt)), "utf-8")), 1, 8
    )
    return digest < F.lit(sample_threshold_hex(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "wt",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum subsampling (language/domain mixing).

    ``fractions`` maps stratum value -> keep fraction; strata absent
    from the map use ``default_fraction``.  Membership is
    ``md5(key ':' salt)[:8] < threshold(stratum)`` — a pure row-local
    predicate: the plan is a narrow filter on the scan (no shuffle, no
    RNG state), membership is reproducible across reruns and across
    partitionings, and disjoint corpus slices sample consistently.
    ``salt`` decorrelates independent sampling passes over the same
    corpus (two passes with different salts intersect at ~f1*f2).

    Returns the input rows that survive, unchanged (all columns pass
    through), so the operator composes anywhere in a cleaning cascade.
    """
    key = F.col(key_col)
    stratum = F.col(strata_col)
    gate: Column = _keep_gate(key, default_fraction, salt)
    for value, frac in sorted(fractions.items()):
        gate = F.when(stratum == F.lit(value), _keep_gate(key, float(frac), salt)).otherwise(gate)
    return df.where(gate)


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing layout over a distributed prefix sum.

    Documents are laid head-to-tail in ``order_col`` order into one
    virtual token stream, which is cut into sequences of ``seq_len``
    tokens (GPT-style packing: a document whose span crosses a cut
    continues in the next sequence).  Emits one row per input doc:

    - ``start_tok`` — the doc's offset in the virtual stream,
    - ``first_seq`` / ``last_seq`` — the sequence ids its span touches,
    - ``seq_offset`` — its offset within ``first_seq``.

    Scale shape: ``repartitionByRange(order_col)`` gives ordered,
    disjoint partitions; a window *partitioned by the physical
    partition id* computes local cumulative sums without ever
    collapsing to one task; partition totals (one row per partition)
    make a driver-sized exchange whose running sum is each partition's
    base offset, broadcast back.  The result equals the single-node
    ``SUM() OVER (ORDER BY order_col)`` exactly, but the widest
    exchange in the plan is the range shuffle of the (key, count)
    pairs — two columns, not the corpus.

    Docs with ``n_tokens <= 0`` occupy no span; they are assigned
    ``first_seq = last_seq = floor(start_tok / seq_len)`` (the
    sequence an empty doc "sits at") with a zero-width span.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n = F.col(n_tokens_col).cast("long")
    sized = docs.select(order_col, n.alias("n_tokens"))
    if num_partitions:
        sized = sized.repartitionByRange(num_partitions, order_col)
    else:
        sized = sized.repartitionByRange(order_col)
    sized = sized.withColumn("_pid", F.spark_partition_id())

    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sized.withColumn("_cum_in", F.sum("n_tokens").over(w_local))

    # one row per partition; the window below runs on P rows total
    totals = local.groupBy("_pid").agg(F.max("_cum_in").alias("_tot"))
    w_pid = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.withColumn("_base", F.coalesce(F.sum("_tot").over(w_pid), F.lit(0)))

    start = (F.col("_base") + F.col("_cum_in") - F.col("n_tokens")).alias("start_tok")
    out = local.join(F.broadcast(bases.select("_pid", "_base")), "_pid").select(
        order_col, "n_tokens", start
    )
    # integer `div`, not FP floor-divide: offsets reach 10^13+ tokens at
    # crawl scale, past double's exact-integer range
    return out.select(
        order_col,
        "n_tokens",
        "start_tok",
        F.expr(f"start_tok div {seq_len}").alias("first_seq"),
        F.expr(f"(start_tok + greatest(n_tokens - 1, 0L)) div {seq_len}").alias("last_seq"),
        (F.col("start_tok") % seq_len).alias("seq_offset"),
    )
