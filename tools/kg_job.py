"""spark-submit entrypoint: full KG pipeline over a pages parquet dir.

Usage (master comes from spark-submit):
    spark-submit --master local[N] --py-files indra_db_spark.zip \
        tools/kg_job.py <pages_dir> <out_dir> [fingerprint]

Prints one JSON line: docs in, statements out, wall seconds, per-stage
walls (from the lineage manifests), docs/sec.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    pages_dir, out_dir = sys.argv[1], sys.argv[2]
    fp = sys.argv[3] if len(sys.argv) > 3 else f"job_{pages_dir}"

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from indra_db_spark.pipeline import run_pipeline

    pages = spark.read.parquet(pages_dir)
    n_docs = pages.count()
    t0 = time.time()
    res = run_pipeline(
        spark, pages, out_dir, pages_fingerprint=fp, resume=False, signatures=False
    )
    wall = time.time() - t0
    n_pa = res.tables["pa_statements"].count()
    cores = spark.sparkContext.defaultParallelism
    print(
        json.dumps(
            {
                "docs": n_docs,
                "pa_statements": n_pa,
                "wall_secs": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "cores": cores,
                "stages": {
                    s: rec.get("wall_secs") for s, rec in res.metrics.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
