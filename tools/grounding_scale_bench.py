"""Grounding broadcast-vs-shuffle fallback at a realistic map size.

VERDICT r4 #7: the auto fallback (`ground_statements(broadcast_map=None)`
drops the broadcast hint when the resolved map exceeds
GROUNDING_BROADCAST_MAX_ROWS = 2M rows) was equality-tested only at toy
size. This tool builds a >2M-row synthetic grounding map (the real dim
unioned with filler entries whose text_norm can never match a mention,
so both modes produce identical groundings), runs `ground_statements`
over a 1M-page corpus in BOTH modes, and records:

  * wall seconds per mode (warm, noop sink);
  * the physical-plan evidence: broadcast mode contains
    BroadcastHashJoin, fallback mode contains none (shuffle joins on the
    normalized text key — what a 1000-executor plan should do once the
    dim stops being "small");
  * that AUTO mode flipped to shuffle by measurement (resolved count >
    bound), not by explicit flag;
  * a cheap output-equality signature (row count + distinct mk_hash).

Usage: python tools/grounding_scale_bench.py [n_pages] [map_rows]
Prints one JSON line; merge the numbers into BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    map_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_200_000

    from indra_db_spark.operators.extract import extract_statements
    from indra_db_spark.operators.grounding import (
        GROUNDING_BROADCAST_MAX_ROWS,
        ground_statements,
        resolve_grounding_map,
    )
    from indra_db_spark.session import get_spark
    from indra_db_spark.sources import dims
    from indra_db_spark.sources.synth import (
        corpus_fingerprint,
        source_expr,
        synth_pages,
    )

    spark = get_spark(app_name="grounding_scale_bench", master="local[32]")
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"

    pages_dir = os.path.join(
        shm, f"kg_scale_pages_{n_pages}_{corpus_fingerprint()}"
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        synth_pages(spark, n_pages, seed=42).write.mode("overwrite").parquet(
            pages_dir
        )
    pages = spark.read.parquet(pages_dir)

    # Filler rows: text_norm is lowercase-alnum-normalized mention text in
    # real rows; the 'zzfill<i>' tokens never occur in the synth grammar,
    # so they ground nothing and the two modes must emit identical rows.
    real = dims.grounding_map_df(spark)
    filler = spark.range(map_rows).select(
        F.concat(F.lit("zzfill"), F.col("id")).alias("text_norm"),
        F.lit("FILL").alias("db_ns"),
        F.concat(F.lit("F"), F.col("id")).alias("db_id"),
        F.concat(F.lit("Filler "), F.col("id")).alias("name"),
        F.lit(0.1).alias("score"),
    )
    big_map = real.unionByName(filler).localCheckpoint()
    resolved_n = resolve_grounding_map(big_map).count()
    assert resolved_n > GROUNDING_BROADCAST_MAX_ROWS, resolved_n

    extracted = extract_statements(pages).localCheckpoint()

    def plan_of(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def timed(broadcast_map):
        df = ground_statements(
            extracted, big_map, source_expr=source_expr,
            broadcast_map=broadcast_map,
        )
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        sig = df.agg(
            F.count("*").alias("rows"),
            F.count_distinct("mk_hash").alias("hashes"),
        ).first()
        return wall, plan_of(df), (sig["rows"], sig["hashes"])

    w_bc, plan_bc, sig_bc = timed(True)
    w_sh, plan_sh, sig_sh = timed(False)
    w_auto, plan_auto, sig_auto = timed(None)

    assert "BroadcastHashJoin" in plan_bc
    assert "BroadcastHashJoin" not in plan_sh
    # the load-bearing check: AUTO flipped to shuffle from the measured
    # map size alone
    assert "BroadcastHashJoin" not in plan_auto
    assert sig_bc == sig_sh == sig_auto

    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "resolved_map_rows": resolved_n,
                "broadcast_bound": GROUNDING_BROADCAST_MAX_ROWS,
                "wall_broadcast": w_bc,
                "wall_shuffle": w_sh,
                "wall_auto_shuffle": w_auto,
                "auto_plan_has_broadcast_join": False,
                "output_rows": sig_bc[0],
                "distinct_mk_hash": sig_bc[1],
            }
        )
    )


if __name__ == "__main__":
    main()
