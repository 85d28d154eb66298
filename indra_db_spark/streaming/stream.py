"""Structured Streaming wrapper — continuous incremental assembly.

The reference runs batch-incremental updates driven by watermark tables
(principal_schema.py ``*_updates``; cli/xdd.py polls an S3 feed). The
Spark-native equivalent: a file-source stream over the pages landing
directory, each micro-batch applied through the same
``supplement_corpus`` body (exactly-once per batch via the checkpoint
dir + deterministic ids making replays idempotent).

Late/duplicate content (H3): deterministic ``raw_id`` + distill's
best-version rule mean a re-crawled url replaces its prior readings
idempotently regardless of arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from indra_db_spark.schemas import PAGES
from indra_db_spark.streaming.supplement import supplement_corpus


def incremental_assembly_stream(
    spark: SparkSession,
    pages_stream_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 day",
    **supplement_kwargs,
):
    """pages parquet-file stream → foreachBatch(supplement_corpus).

    Returns the StreamingQuery; callers drive it with
    ``q.processAllAvailable()`` (tests) or ``q.awaitTermination()``.
    """
    stream = (
        spark.readStream.schema(PAGES)
        .parquet(pages_stream_dir)
        .withWatermark("warc_ts", watermark)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        supplement_corpus(spark, out_dir, batch_df, **supplement_kwargs)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
