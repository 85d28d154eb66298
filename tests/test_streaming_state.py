"""Stateful streaming dedup: first-seen-per-fingerprint across
micro-batches (applyInPandasWithState), equivalent to the batch window
twin, with state persisting across separate availableNow runs."""

import pytest
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


def _ts_rows(spark, specs):
    """specs = [(url, fp, 'YYYY-MM-DD')]"""
    return spark.createDataFrame(
        [(u, f, t) for u, f, t in specs], "url string, fp_hash long, d string"
    ).select("url", "fp_hash", F.to_timestamp("d").alias("warc_ts"))


def test_streaming_ttl_evicts_state(spark, tmp_path):
    """ttl_seconds bounds the state store: keys silent for longer than the
    TTL (in event time, against the watermark) are evicted — the state
    row count DROPS across runs — while in-window dedup is unchanged and
    a recurrence of a refreshed (sliding-TTL) key stays suppressed. An
    evicted key that recurs is re-emitted: the documented bounded-state
    trade."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ttl = 10 * 24 * 3600  # 10 days of event time

    def run(batch):
        batch.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "url string, fp_hash long, warc_ts timestamp"
        ).parquet(src)
        q = (
            streaming_first_seen(stream, ttl_seconds=ttl)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q.lastProgress["stateOperators"][0]["numRowsTotal"]

    # run1: keys 10, 30 at Jan 1 -> both emitted, 2 state rows
    n1 = run(_ts_rows(spark, [("u1", 10, "2026-01-01"), ("u2", 30, "2026-01-01")]))
    assert sorted(r["fp_hash"] for r in spark.read.parquet(out).collect()) == [10, 30]
    assert n1 == 2
    # run2: duplicate 30 + new 40 at Feb 1. The data batch still runs at
    # the ~Jan 1 watermark (30 suppressed in-window, its TTL slides to
    # Feb 11), then the advanced watermark (Feb 1 - 1h) triggers Spark's
    # trailing no-data batch, which times out key 10 (Jan 11) — the
    # eviction lands within this run: state drops to {30, 40}
    n2 = run(_ts_rows(spark, [("u3", 30, "2026-02-01"), ("u4", 40, "2026-02-01")]))
    assert sorted(r["fp_hash"] for r in spark.read.parquet(out).collect()) == [10, 30, 40]
    assert n2 == 2
    # run3: new 50 at Feb 2; refreshed 30 (Feb 11) and 40 survive
    n3 = run(_ts_rows(spark, [("u5", 50, "2026-02-02")]))
    assert n3 == 3  # 30, 40, 50 — key 10's row stays gone
    # run4: evicted key 10 recurs -> re-emitted; refreshed 30 still deduped
    run(_ts_rows(spark, [("u6", 10, "2026-02-03"), ("u7", 30, "2026-02-03")]))
    got = sorted(r["fp_hash"] for r in spark.read.parquet(out).collect())
    assert got == [10, 10, 30, 40, 50]


def test_dedup_store_stream_drains_batches_and_replays_idempotently(
    spark, tmp_path
):
    """Streaming front end to the durable dedup store: two availableNow
    drains over a growing landing dir must leave the store equal to a
    full rebuild of everything landed, and a replayed micro-batch id
    (the crash/restart case foreachBatch actually produces) must no-op
    through the store's ledger instead of double-ingesting."""
    from indra_db_spark.operators.dedup_docs import dedup_clusters
    from indra_db_spark.operators.dedup_store import DedupStore
    from indra_db_spark.streaming.dedup_stream import dedup_store_stream
    from test_dedup_incremental import _clusters, _docs, batch_rows, corpus_rows

    land = tmp_path / "land"
    land.mkdir()
    store_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    t = 0.5

    old = _docs(spark, corpus_rows())
    old.coalesce(1).write.parquet(str(land / "w0"))
    q = dedup_store_stream(spark, f"{land}/*", store_root, ckpt, threshold=t)
    q.awaitTermination()

    st = DedupStore(spark, store_root)
    assert len(st.committed) >= 1
    assert _clusters(st.clusters()) == _clusters(
        dedup_clusters(old, method="minhash_lsh", threshold=t,
                       collapse_exact=True)
    )

    new = _docs(spark, batch_rows())
    new.coalesce(1).write.parquet(str(land / "w1"))
    q = dedup_store_stream(spark, f"{land}/*", store_root, ckpt, threshold=t)
    q.awaitTermination()

    st = DedupStore(spark, store_root)
    full = old.unionByName(new)
    expect = _clusters(
        dedup_clusters(full, method="minhash_lsh", threshold=t,
                       collapse_exact=True)
    )
    assert _clusters(st.clusters()) == expect

    # replay: re-ingesting any committed micro-batch id is a ledger no-op
    first = st.committed[0]
    assert st.ingest(old, first)["noop"]
    assert _clusters(st.clusters()) == expect

    # checkpoint reset (the ops hazard): a FRESH checkpoint restarts
    # Spark's batch numbering at 0 — without the per-checkpoint token in
    # the ingest id, the first batch through a new checkpoint would
    # collide with the first ledger entry, no-op, and be silently
    # dropped while the checkpoint marks its files processed. With the
    # token, a new checkpoint over NEW files ingests them...
    extra = _docs(spark, [(501, "wholly new third wave document about checkpoints")])
    land2 = tmp_path / "land2"
    land2.mkdir()
    extra.coalesce(1).write.parquet(str(land2 / "w2"))
    q = dedup_store_stream(
        spark, f"{land2}/*", store_root, str(tmp_path / "ckpt2"), threshold=t
    )
    q.awaitTermination()
    st = DedupStore(spark, store_root)
    assert st.docs().count() == full.count() + 1  # wave 3 ingested, once

    # ...and a new checkpoint over the ORIGINAL dir re-delivers already-
    # ingested files as new batch ids: the content-level strict_ids
    # guard fails LOUDLY (corpus-unique doc_id) instead of silently
    # dropping or double-ingesting
    q = dedup_store_stream(
        spark, f"{land}/*", store_root, str(tmp_path / "ckpt3"), threshold=t
    )
    with pytest.raises(Exception, match="already ingested"):
        q.awaitTermination()
    assert st.docs().count() == full.count() + 1  # nothing double-ingested
