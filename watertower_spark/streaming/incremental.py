"""Streaming index ingestion.

The reference has no streaming path (SURVEY.md §2.5); its closest
analogue is per-document incremental RPC indexing.  Here crawl output
lands as parquet files in a directory and a Structured Streaming query
folds each micro-batch into the index through the same
``append_documents`` path used for batch increments — exactly-once per
batch via the checkpointed batch id + the manifest's url anti-join
(re-delivered rows are already in doc_map and are skipped).

``ingest_available`` uses availableNow semantics: drain whatever is in
the directory, then stop — the cron-style incremental crawl pattern.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from watertower_spark.operators.maintenance import append_documents
from watertower_spark.sources.corpus import DOC_SCHEMA


def ingest_available(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    tags_fn: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> int:
    """Drain input_dir into the index; returns number of micro-batches.

    ``tags_fn``, when given, maps each micro-batch to its
    ``(url, tags array<string>)`` sidecar — by default documents are
    ingested untagged (tags are caller data, never synthesized here).
    """
    n_batches = {"n": 0}

    def fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tags = tags_fn(batch_df) if tags_fn is not None else None
        append_documents(batch_df.sparkSession, index_dir, batch_df, tags)
        n_batches["n"] += 1

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]
