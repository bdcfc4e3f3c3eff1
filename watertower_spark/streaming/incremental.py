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

from pyspark.sql import SparkSession, functions as F

from watertower_spark.operators.maintenance import append_documents
from watertower_spark.sources.corpus import DOC_SCHEMA


def ingest_available(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    with_tags: bool = True,
) -> int:
    """Drain input_dir into the index; returns number of micro-batches."""
    n_batches = {"n": 0}

    def fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tags = None
        if with_tags:
            tags = batch_df.select(
                "url",
                F.array(F.concat(F.lit("t"), F.pmod(F.xxhash64("url"), F.lit(8)))).alias("tags"),
            )
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
