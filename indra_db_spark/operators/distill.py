"""Distillation — best-content/best-reading selection + exact dupe drop.

Reference: indra_db/util/distill_stmts.py::distill_stmts — per text_ref
keep the best text_type (fulltext > abstract > title) and the newest reader
version, and drop exact duplicate raw statements. In the pages model the
content axis collapses (one text per url), so distill = keep the highest
``extractor_version`` per (url, extractor), then drop exact dupes per
(url, mk_hash, source_hash).

Plan shape: a window max over (url, extractor) — one shuffle on url, which
the downstream dedup groupBy reuses nothing from, so at scale this stage is
fused by AQE into the extract output partitioning. dropDuplicates is a
hash-aggregate on the composite key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def version_key(version_col) -> "F.Column":
    """Dotted version string → array<int> sort key. String max would
    invert once a component crosses a digit-count boundary ('2.9' > '2.10'
    lexicographically); arrays of ints compare component-wise. Non-numeric
    components order as 0 (try_cast) rather than erroring."""
    return F.transform(
        F.split(version_col, r"\."),
        lambda p: F.coalesce(p.try_cast("int"), F.lit(0)),
    )


def distill(raw: DataFrame) -> DataFrame:
    # ONE explicit shuffle on url: HashPartitioning(url) satisfies the
    # ClusteredDistribution of BOTH the (url, extractor) window and the
    # (url, mk_hash, source_hash) dedup aggregate, so Catalyst inserts no
    # further exchange — without it these are two full shuffles of wide
    # evidence rows.
    w = Window.partitionBy("url", "extractor")
    best = F.max(version_key(F.col("extractor_version"))).over(w)
    deduped = Window.partitionBy("url", "mk_hash", "source_hash").orderBy(
        F.asc("raw_id")  # deterministic survivor (dropDuplicates is not)
    )
    return (
        raw.repartition("url")
        .withColumn("_best_version", best)
        .where(version_key(F.col("extractor_version")) == F.col("_best_version"))
        .drop("_best_version")
        .withColumn("_rn", F.row_number().over(deduped))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
