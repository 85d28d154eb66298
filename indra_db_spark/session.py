"""SparkSession factory with scale-aware defaults.

Local-mode knobs mirror what a 1000-executor cluster deployment would set:
AQE on (runtime re-plan + skew-join splitting), shuffle partitions sized to
parallelism, Arrow enabled for pandas-UDF exchange, UTC timezone for
deterministic timestamp semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "indra_db_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    ``shuffle_partitions`` defaults to 2× the local parallelism — on a real
    cluster this would be sized to executor-cores × executors (and AQE
    coalesces down at runtime anyway).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        # local[N,maxFailures] is a legal master URL — only N sizes shuffles
        n = n.split(",")[0].strip()
        shuffle_partitions = 64 if not n.isdigit() else max(8, 2 * int(n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Scan-split size (guide §6). The bench/test inputs are MB-scale
        # parquet files whose row groups are ~20 MB, and the default 128 MB
        # split puts a whole multi-row-group file (e.g. the 126 MB sf1.0
        # lineitem) into ONE task; 16 MB splits let every row group scan in
        # parallel. On a production cluster reading TB-scale inputs set
        # SPARK_GRAFT_MAX_PARTITION_BYTES=512m-1g instead (large sequential
        # scans want fewer, bigger map tasks feeding any shuffle - §2.2).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
