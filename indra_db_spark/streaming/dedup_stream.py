"""Online exact-dedup over a crawl stream — custom stateful operator.

A 10^12-document crawl arrives incrementally; exact duplicates (same
normalized-content fingerprint) recur across fetches days apart. Batch
dedup re-shuffles the whole corpus every time; the streaming form keeps
ONE tiny state row per fingerprint in the state store and emits only the
first occurrence, forever, across micro-batches and restarts.

Reference relationship: the batch path's distill/exact-dedup semantics
([P] indra_db/reading/read_db.py::distill_stmts — keep one copy per
content key) re-expressed as a Structured Streaming stateful operator
(`applyInPandasWithState`, the task brief's named mechanism). State per
key: (first_seen_unix, n_dups) — O(keys), not O(rows).

Scale notes: state is hash-partitioned by the grouping key across
executors (RocksDB state store in production — set
`spark.sql.streaming.stateStore.providerClass`); the operator never
shuffles history, only the incoming micro-batch. Watermark-based state
TTL is WIRED via ``ttl_seconds`` (`GroupStateTimeout.EventTimeTimeout`,
sliding per-key expiry — eviction/re-admission pinned by test): the knob
for bounded state when keys stop recurring. Crawl dedup wants unbounded
retention, so the default stays NoTimeout.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_seen_unix", T.LongType()),
        T.StructField("n_dups", T.LongType()),
    ]
)


def _output_schema(ts_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("fp_hash", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
        ]
    )


def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "fp_hash",
    ts_col: str = "warc_ts",
    ttl_seconds: int | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """stream(url, <ts_col>, <key_col>) → first occurrence per key, ever.

    Within a micro-batch the earliest (ts, url) row wins (deterministic
    under re-execution); rows for keys whose state already exists are
    dropped and counted into the state's ``n_dups``.

    ``ttl_seconds``: bounded-state mode. When set, the stream gets an
    event-time watermark (``watermark_delay`` behind max event time) and
    each key's state carries an ``EventTimeTimeout`` of ``ttl_seconds``
    past the key's latest sighting (sliding TTL — every recurrence
    extends it). Once the watermark passes that timestamp the state row
    is evicted, so state size is bounded by the keys active inside one
    TTL window instead of all keys ever (the RocksDB-provider companion
    knob for 10^12-key crawls). Trade-off, stated plainly: a duplicate
    that recurs after ``ttl_seconds`` of silence is re-emitted as if
    new. Eviction + re-admission + unchanged in-window dedup are pinned
    by tests/test_streaming_state.py::test_streaming_ttl_evicts_state.
    Default (None) keeps the unbounded first-seen-forever semantics.
    """
    out_schema = _output_schema(ts_col)
    use_ttl = ttl_seconds is not None

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()  # watermark passed last sighting + TTL
            return iter(())
        first: pd.DataFrame | None = None
        n_new = 0
        max_ts_ms: int | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            n_new += len(pdf)
            batch_max = int(pdf[ts_col].max().value // 10**6)
            max_ts_ms = (
                batch_max if max_ts_ms is None else max(max_ts_ms, batch_max)
            )
            head = pdf.sort_values([ts_col, "url"], kind="mergesort").head(1)
            if first is None or (
                tuple(head.iloc[0][[ts_col, "url"]])
                < tuple(first.iloc[0][[ts_col, "url"]])
            ):
                first = head

        def set_ttl() -> None:
            if use_ttl and max_ts_ms is not None:
                # must stay strictly above the current watermark or Spark
                # rejects the timestamp (late rows can put sighting+TTL
                # behind it)
                state.setTimeoutTimestamp(
                    max(
                        max_ts_ms + int(ttl_seconds) * 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        if state.exists:
            first_seen, n_dups = state.get
            state.update((first_seen, n_dups + n_new))
            set_ttl()
            return iter(())  # all duplicates of an earlier batch
        if first is None:
            return iter(())
        state.update(
            (int(first.iloc[0][ts_col].value // 10**9), n_new - 1)
        )
        set_ttl()
        return iter([first[["fp_hash", "url", ts_col]]])

    src = stream.select(F.col(key_col).alias("fp_hash"), "url", F.col(ts_col))
    if use_ttl:
        src = src.withWatermark(ts_col, watermark_delay)
    return src.groupBy("fp_hash").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


def batch_first_seen(
    df: DataFrame, key_col: str = "fp_hash", ts_col: str = "warc_ts"
) -> DataFrame:
    """Batch twin of :func:`streaming_first_seen` — the equivalence oracle
    for IN-ORDER feeds (min-(ts,url) row per key via a window; same
    within-batch tiebreak). Semantics note: the streaming operator emits
    the first OBSERVED occurrence (append-mode output cannot retract), so
    when a later micro-batch carries an EARLIER timestamp the two differ:
    batch keeps the global (ts, url) minimum, streaming keeps the first
    arrival. Both are deterministic; pick per use case."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc("url"))
    return (
        df.select(F.col(key_col).alias("fp_hash"), "url", F.col(ts_col))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_store_stream(
    spark,
    docs_stream_dir: str,
    store_root: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    strict_ids: bool = True,
    **store_params,
):
    """documents parquet-file stream → foreachBatch(DedupStore.ingest):
    continuous NEAR-dup clustering with durable state — the streaming
    front end to :class:`~indra_db_spark.operators.dedup_store.DedupStore`
    (first-seen above is the EXACT-dup analog with in-state-store state).

    Exactly-once per micro-batch without any extra bookkeeping: Spark's
    ``foreachBatch`` batch_id is a monotonically increasing long that is
    REPLAYED with the same value after a crash/restart from the same
    checkpoint, and the store's ledger makes ``ingest`` with a committed
    batch_id a no-op — so replays converge instead of double-ingesting
    (the same idempotency argument as ``incremental_assembly_stream``'s
    deterministic raw_ids, shifted onto the store's commit protocol).

    Spark's batch ids are CHECKPOINT-scoped while the ledger is
    STORE-scoped, so the ingest id also carries a per-checkpoint token
    (a UUID persisted write-once inside ``checkpoint_dir``): an operator
    who deletes/recreates the checkpoint (or points a fresh one at an
    existing store) restarts batch numbering at 0, and bare ``b000…``
    would hit the old ledger entry and silently DROP every document in
    the new batch while the checkpoint marks its files processed. With
    the token, a new checkpoint mints ids the ledger has never seen;
    a same-checkpoint crash replay keeps the same token and still
    no-ops.

    Same trigger semantics as ``incremental_assembly_stream``: the
    default ``{"availableNow": True}`` drains the backlog and stops;
    a resident service passes a processingTime trigger. Returns the
    StreamingQuery.
    """
    import json
    import os
    import uuid

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from indra_db_spark.operators.dedup_store import DedupStore
    from indra_db_spark.sources import storage as _storage

    store = DedupStore(spark, store_root, **store_params)
    token_path = os.path.join(checkpoint_dir, "_dedup_stream_id.json")
    if os.path.exists(token_path):
        with open(token_path) as f:
            token = json.load(f)["token"]
    else:
        os.makedirs(checkpoint_dir, exist_ok=True)
        token = uuid.uuid4().hex[:12]
        _storage._write_json_atomic(token_path, {"token": token})
    schema = StructType([
        StructField(id_col, LongType()),
        StructField(text_col, StringType()),
    ])
    stream = spark.readStream.schema(schema).parquet(docs_stream_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.ingest(
            batch_df, f"{token}-b{batch_id:012d}",
            id_col=id_col, text_col=text_col, strict_ids=strict_ids,
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
