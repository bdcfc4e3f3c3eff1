"""Stateful streaming deduplication (custom operator via
``applyInPandasWithState``).

A continuous crawl delivers the same page again and again (recrawls,
mirrors, syndication).  ``dedup_first_seen`` is the streaming
counterpart of the batch ``dedup.exact_duplicates`` pass: it emits each
content key's FIRST occurrence and suppresses every later one — across
micro-batches and across restarts, because the seen-set lives in the
checkpointed per-group state store, not in memory.

Scale shape: state is partitioned by the content-hash grouping key
(bounded, uniformly distributed — md5 of the text), so the state store
shards across executors like any keyed stream; per key it holds ONE
long (occurrence count), not the payload, so state size is
O(distinct keys) with a ~few-dozen-byte constant.  The operator is a
single stateful exchange; no joins, no driver state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the md5 ``content_hash`` column (same key as batch dedup)."""
    return df.withColumn("content_hash", F.md5(F.encode(text_col, "utf-8")))


def dedup_first_seen(stream: DataFrame, key_col: str = "content_hash") -> DataFrame:
    """Streaming DataFrame → streaming DataFrame keeping only each
    key's first-ever row (append mode).

    Rows after the first — later in the same micro-batch, in a later
    batch, or after a restart — are dropped; the per-key state is the
    running occurrence count so re-delivery after recovery stays
    suppressed (state is versioned with the checkpoint).
    """
    out_schema = stream.schema
    state_schema = StructType([StructField("n_seen", LongType())])

    def keep_first(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n_seen,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if n_seen == 0 and len(pdf):
                yield pdf.iloc[[0]]
            n_seen += len(pdf)
        state.update((n_seen,))

    return stream.groupBy(key_col).applyInPandasWithState(
        keep_first, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def drain_first_seen(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    text_col: str = "text",
) -> None:
    """availableNow drain: read parquet files from ``input_dir``, keep
    first-seen documents by content hash, append them to ``output_dir``
    (parquet).  Re-running with the same checkpoint resumes the state
    store, so previously-seen content stays suppressed across drains —
    the cron-style incremental crawl pattern (same as
    ``incremental.ingest_available``)."""
    stream = with_content_hash(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 64).parquet(input_dir),
        text_col,
    )
    q = (
        dedup_first_seen(stream)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
