"""Stateful streaming dedup: first-seen-per-fingerprint across
micro-batches (applyInPandasWithState), equivalent to the batch window
twin, with state persisting across separate availableNow runs."""

from pyspark.sql import functions as F

from indra_db_spark.streaming.dedup_stream import (
    batch_first_seen,
    streaming_first_seen,
)


def _rows(spark, specs):
    return spark.createDataFrame(
        [(u, f) for u, f in specs], "url string, fp_hash long"
    ).withColumn(
        "warc_ts",
        F.to_timestamp(
            F.concat(
                F.lit("2026-01-0"),
                (F.pmod(F.xxhash64("url"), F.lit(8)) + 1).cast("string"),
            )
        ),
    )


def _run_available_now(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.schema(
        "url string, fp_hash long, warc_ts timestamp"
    ).parquet(src_dir)
    q = (
        streaming_first_seen(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_first_seen_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    b1 = _rows(spark, [("u1", 10), ("u2", 10), ("u3", 30)])
    b1.coalesce(1).write.mode("append").parquet(src)
    _run_available_now(spark, src, ckpt, out)
    got1 = sorted(r["fp_hash"] for r in spark.read.parquet(out).collect())
    assert got1 == [10, 30]

    # second run, SAME checkpoint: fp 10/30 recur -> suppressed by the
    # state store; fp 40 is new -> emitted exactly once
    b2 = _rows(spark, [("u4", 10), ("u5", 40), ("u6", 30), ("u7", 40)])
    b2.coalesce(1).write.mode("append").parquet(src)
    _run_available_now(spark, src, ckpt, out)
    rows = spark.read.parquet(out).collect()
    assert sorted(r["fp_hash"] for r in rows) == [10, 30, 40]

    # batch twin over the union picks the same first keys
    batch = batch_first_seen(b1.unionByName(b2))
    assert {r["fp_hash"] for r in batch.collect()} == {10, 30, 40}


def test_batch_twin_tiebreak(spark):
    df = spark.createDataFrame(
        [("b", 1), ("a", 1)], "url string, fp_hash long"
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2026-01-01")))
    got = batch_first_seen(df).collect()
    assert len(got) == 1 and got[0]["url"] == "a"  # (ts, url) min wins
