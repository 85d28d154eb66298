"""Hot-key (hub-entity) skew evidence — BASELINE.md protocol item 3.

Reports, for the synthetic hub-skewed corpus:
  * top mk_hash evidence counts (the TP53→MDM2 fan-in),
  * reduce-task row balance for the naive single-phase groupBy vs the
    two-phase salted aggregation (stage-1 keys = (mk_hash, salt)),
  * wall time of both plans,
and appends a section to BENCH/BASELINE.md.

Usage: python tools/skew_report.py [n_pages]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def partition_rows(df, key_cols: list[str], parts: int = 64) -> list[int]:
    """Rows per reduce partition if shuffled on key_cols (what a hash
    aggregate's final stage would receive)."""
    counts = (
        df.groupBy(F.pmod(F.hash(*key_cols), F.lit(parts)).alias("p"))
        .count()
        .collect()
    )
    by = {r["p"]: r["count"] for r in counts}
    return [by.get(i, 0) for i in range(parts)]


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

    from indra_db_spark.operators.dedup import build_pa_statements
    from indra_db_spark.operators.extract import extract_statements
    from indra_db_spark.operators.grounding import ground_statements
    from indra_db_spark.session import get_spark
    from indra_db_spark.sources import dims
    from indra_db_spark.sources.synth import source_expr as synth_source_expr, synth_pages

    spark = get_spark(app_name="skew_report", master="local[8]")
    raw_dir = f"/dev/shm/skew_raw_{n_pages}" if os.path.isdir("/dev/shm") else f"/tmp/skew_raw_{n_pages}"
    if not os.path.exists(os.path.join(raw_dir, "_SUCCESS")):
        pages = synth_pages(spark, n_pages, seed=42)
        ground_statements(
            extract_statements(pages), dims.grounding_map_df(spark),
            source_expr=synth_source_expr,
        ).write.mode("overwrite").parquet(raw_dir)
    raw = spark.read.parquet(raw_dir)
    n_raw = raw.count()

    top = (
        raw.groupBy("mk_hash", "matches_key")
        .count()
        .orderBy(F.desc("count"))
        .limit(3)
        .collect()
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    naive = raw.groupBy("mk_hash").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("raw_id", "matches_key")).alias("rep"),
    )
    force(naive)
    t0 = time.time()
    force(naive)
    t_naive = time.time() - t0

    salted = build_pa_statements(raw)
    force(salted)
    t0 = time.time()
    force(salted)
    t_salted = time.time() - t0

    bal_naive = partition_rows(raw, ["mk_hash"])
    bal_salted = partition_rows(
        raw.withColumn("_salt", F.pmod(F.xxhash64("raw_id"), F.lit(64))),
        ["mk_hash", "_salt"],
    )

    def stats(b):
        return max(b), round(sum(b) / len(b), 1), round(max(b) / (sum(b) / len(b)), 1)

    mn, an, rn = stats(bal_naive)
    ms, a_s, rs = stats(bal_salted)
    lines = f"""
## Hot-key skew: salted vs naive aggregation ({n_pages:,} pages, {n_raw:,} raw stmts)

Top fan-in keys (hub entity by construction — TP53GEN):

| matches_key | evidence rows |
|---|---|
{chr(10).join(f"| {r['matches_key']} | {r['count']:,} |" for r in top)}

Reduce-partition row balance on 64 partitions (what the final aggregate
stage receives):

| plan | max partition rows | mean | max/mean skew |
|---|---|---|---|
| naive groupBy(mk_hash) | {mn:,} | {an:,} | {rn}x |
| salted stage-1 groupBy(mk_hash, salt=pmod(xxhash64(raw_id),64)) | {ms:,} | {a_s:,} | {rs}x |

Warm wall time (local[8], noop sink): naive full agg {t_naive:.2f}s vs
two-phase salted pa build {t_salted:.2f}s. Property test
(tests/test_operators.py::test_salted_pa_equals_unsalted_pa) pins salted ==
naive results. At sandbox scale AQE absorbs this skew; at 10^12-doc scale
the hub key's single reduce task is the straggler the salt removes.
"""
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(lines)
    print(lines)


if __name__ == "__main__":
    main()
