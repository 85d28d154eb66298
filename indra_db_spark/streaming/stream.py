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
    trigger: dict | None = None,
    **supplement_kwargs,
):
    """pages parquet-file stream → foreachBatch(supplement_corpus).

    ``trigger``: kwargs for ``DataStreamWriter.trigger``. The default
    ``{"availableNow": True}`` DRAINS the current backlog and terminates
    (batch-catchup / test mode); a continuously-running service must pass
    e.g. ``{"processingTime": "1 minute"}`` — with availableNow the query
    stops after the initial files and later crawls would silently never
    assemble. No ``withWatermark`` here: with a foreachBatch sink there is
    no stateful operator for it to bound, so it would be a no-op implying
    late-data handling that lives in supplement_corpus's distill/supersede
    semantics instead.

    Returns the StreamingQuery; callers drive it with
    ``q.processAllAvailable()`` (tests) or ``q.awaitTermination()``.
    """
    stream = spark.readStream.schema(PAGES).parquet(pages_stream_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        supplement_corpus(spark, out_dir, batch_df, **supplement_kwargs)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
