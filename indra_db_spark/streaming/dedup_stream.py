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
TTL (`GroupStateTimeout.EventTimeTimeout`) is the knob for bounded state
when keys are known to stop recurring; crawl dedup wants unbounded
retention, so the default here is NoTimeout.
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
) -> DataFrame:
    """stream(url, <ts_col>, <key_col>) → first occurrence per key, ever.

    Within a micro-batch the earliest (ts, url) row wins (deterministic
    under re-execution); rows for keys whose state already exists are
    dropped and counted into the state's ``n_dups``.
    """
    out_schema = _output_schema(ts_col)

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        first: pd.DataFrame | None = None
        n_new = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            n_new += len(pdf)
            head = pdf.sort_values([ts_col, "url"], kind="mergesort").head(1)
            if first is None or (
                tuple(head.iloc[0][[ts_col, "url"]])
                < tuple(first.iloc[0][[ts_col, "url"]])
            ):
                first = head
        if state.exists:
            first_seen, n_dups = state.get
            state.update((first_seen, n_dups + n_new))
            return iter(())  # all duplicates of an earlier batch
        if first is None:
            return iter(())
        state.update(
            (int(first.iloc[0][ts_col].value // 10**9), n_new - 1)
        )
        return iter([first[["fp_hash", "url", ts_col]]])

    keyed = stream.select(
        F.col(key_col).alias("fp_hash"), "url", F.col(ts_col)
    ).groupBy("fp_hash")
    return keyed.applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
