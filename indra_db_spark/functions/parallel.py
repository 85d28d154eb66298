"""Scan-parallelism floor for CPU-heavy operators (optimization guide
§2.2 / §6).

Parquet scans cannot split below row-group granularity: a byte-range
split only processes the row groups whose start offset falls inside it,
so a single-row-group file yields exactly ONE non-empty scan task no
matter how small ``spark.sql.files.maxPartitionBytes`` is. A corpus
that arrives as a few single-row-group files therefore pins every
scan-stage expression — regexp feature extraction, higher-order-
function winnowing, shingle explodes, Arrow GEMM batches — to a
handful of tasks (measured: the sf1.0 ``documents.parquet`` is one row
group of 50k docs, so a 32-core session ran the whole winnowing pass on
one core).

``fan_out`` raises such an input to at least the session's default
parallelism with one cheap round-robin exchange of the projected input.
It is a NO-OP in two cases:

* the input already has that many partitions (the production case — a
  100 TB scan has thousands of splits, and an unconditional repartition
  there would be a full extra shuffle of the corpus);
* the input plan already contains a shuffle-inducing node (aggregate,
  join, global sort, window, repartition, …) — the data is then already
  spread over ``spark.sql.shuffle.partitions``, and probing such a plan
  with ``.rdd`` could silently execute its query stages under AQE.

Operators call it on their *projected* input so the exchange ships only
the columns the operator reads (guide §2.3). Round-robin (keyless)
repartition is used deliberately: it is perfectly balanced, and
deterministic under task retry because Spark sorts before round-robin
repartitioning (SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Logical-plan node names that imply an exchange somewhere in the plan.
# A false positive (e.g. a column literally named "Join") merely skips
# the floor — never a correctness issue.
_SHUFFLE_NODES = (
    "Aggregate",
    "Join",
    "Window",
    "Repartition",
    "Deduplicate",
    "Distinct",
    "Intersect",
    "Except",
    "Sort [",  # global orderBy; sortWithinPartitions prints the same but is rare here
)


def _plan_has_shuffle(df: DataFrame) -> bool:
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True  # can't inspect → be conservative, skip the floor
    return any(tok in plan for tok in _SHUFFLE_NODES)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a narrow-over-scan ``df`` has at least ``min_partitions``
    partitions (default: the session's ``defaultParallelism``),
    repartitioning only when it has fewer. Row content and downstream
    results are unchanged — only the physical parallelism of the stage
    that consumes ``df``.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if target <= 1 or _plan_has_shuffle(df):
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        # planning the RDD lineage can fail for exotic plans; the floor
        # is an optimization, never a correctness requirement
        return df
    if current >= target:
        return df
    return df.repartition(target)
