"""MinHash-LSH dedup at pipeline scale (VERDICT r3 #4): the family is
oracle-correct and sf0.1-benched; this measures it over millions of
synth pages at production parameters (128 hashes / 16 bands) and reports
the numbers a 100 TB capacity plan needs: candidate-pair count, band
bucket skew (max/mean/p99 bucket size — hot buckets are the quadratic
risk of any LSH join), residual-join survival fraction, and end-to-end
dedup_clusters wall.

Corpus: n synth pages (text-bearing, ~5/7 of n after the null-html rows
drop) + a planted 10% near-duplicate slice (doc_id + n, three trailing
tokens appended — J ≈ 0.9 vs the original at 3-shingle grain), so the
candidate stage has real work at a realistic dup rate.

Usage: python tools/dedup_scale_bench.py [n_pages] [num_hashes] [bands]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    num_hashes = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    bands = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import functions as F

    from indra_db_spark.operators.dedup_docs import (
        dedup_clusters,
        minhash_lsh_candidates,
        minhash_signatures,
        word_shingles,
    )
    from indra_db_spark.session import get_spark
    from indra_db_spark.sources.synth import synth_pages

    spark = get_spark(app_name="dedup_scale_bench")
    # DEDUP_PAGES_PARQUET: reuse a pre-materialized pages corpus (e.g. the
    # scaling bench's cached 24M-page parquet) instead of regenerating —
    # rows are filtered to the first n_pages doc indices.
    pages_dir = os.environ.get("DEDUP_PAGES_PARQUET")
    if pages_dir:
        pages = spark.read.parquet(pages_dir)
    else:
        pages = synth_pages(spark, n_pages, seed=42)
    base = pages.where(F.col("text").isNotNull()).select(
        F.regexp_extract("url", r"doc/(\d+)", 1).cast("long").alias("doc_id"),
        "text",
    ).where(F.col("doc_id") < n_pages)
    dups = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + n_pages).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate copy marker")).alias(
            "text"
        ),
    )
    # materialize the corpus to parquet scratch (stable storage, off-heap)
    # rather than localCheckpoint — the input to every timed stage below
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    scratch = f"{shm}/dedup_bench_corpus"
    base.unionByName(dups).write.mode("overwrite").parquet(scratch)
    corpus = spark.read.parquet(scratch)
    n_docs = corpus.count()

    # exact-collapse representatives: what the LSH join sees when
    # dedup_clusters(collapse_exact=True) runs — one doc per distinct
    # normalized text
    from indra_db_spark.functions.hashing import fold_md5_64
    from indra_db_spark.functions.textnorm import collapse_ws_expr

    reps = (
        corpus.groupBy(fold_md5_64(collapse_ws_expr(F.col("text"))).alias("_fp"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .drop("_fp")
    )
    n_reps = reps.count()

    def bucket_stats(docs):
        rows_per_band = num_hashes // bands
        sig = minhash_signatures(docs, num_hashes=num_hashes)
        banded = sig.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.slice(
                        F.col("sig"), b * rows_per_band + 1, rows_per_band
                    ),
                )
            ).alias("band", "band_sig"),
        ).withColumn(
            "bucket",
            F.xxhash64(
                F.col("band"),
                F.concat_ws(
                    ",", F.transform("band_sig", lambda x: x.cast("string"))
                ),
            ),
        )
        b = (
            banded.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.max("sz").alias("max_sz"),
                F.avg("sz").alias("mean_sz"),
                F.expr("percentile_approx(sz, 0.99)").alias("p99_sz"),
                F.sum(F.expr("sz * (sz - 1) / 2")).alias("pair_budget"),
            )
            .collect()[0]
        )
        return {
            "n_buckets": int(b["n_buckets"]),
            "max_size": int(b["max_sz"]),
            "mean_size": round(float(b["mean_sz"]), 3),
            "p99_size": int(b["p99_sz"]),
            "skew_max_over_mean": round(b["max_sz"] / b["mean_sz"], 1),
            "candidate_pair_budget": int(b["pair_budget"]),
        }

    t0 = time.time()
    raw_buckets = bucket_stats(corpus)
    rep_buckets = bucket_stats(reps)
    bucket_wall = time.time() - t0

    # candidates over the COLLAPSED reps — the join dedup_clusters
    # actually runs with collapse_exact=True (the default)
    t0 = time.time()
    cands = minhash_lsh_candidates(
        reps, num_hashes=num_hashes, bands=bands
    ).localCheckpoint()
    n_cands = cands.count()
    cand_wall = time.time() - t0

    # residual survival: candidates whose exact Jaccard clears the
    # threshold (precision-1 filter inside dedup_clusters) — the fraction
    # tells how much of the candidate join was wasted work
    t0 = time.time()
    sets = (
        word_shingles(reps)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("_sh"))
    )
    surv = (
        cands.select("doc_a", "doc_b")
        .join(sets.select(F.col("doc_id").alias("doc_a"), F.col("_sh").alias("_sa")).hint("merge"), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("_sh").alias("_sb")).hint("merge"), "doc_b")
        .where(
            F.size(F.array_intersect("_sa", "_sb"))
            / F.size(F.array_union("_sa", "_sb"))
            >= 0.8
        )
        .count()
    )
    residual_wall = time.time() - t0

    t0 = time.time()
    clusters = dedup_clusters(
        corpus, method="minhash_lsh", threshold=0.8,
        num_hashes=num_hashes, bands=bands,
    ).localCheckpoint()
    clustered_docs = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    cluster_wall = time.time() - t0

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "n_docs": n_docs,
                "n_exact_reps": n_reps,
                "num_hashes": num_hashes,
                "bands": bands,
                "bucket_stats_raw_corpus": raw_buckets,
                "bucket_stats_collapsed_reps": rep_buckets,
                "candidate_pairs": n_cands,
                "surviving_pairs": surv,
                "residual_survival_frac": round(surv / max(1, n_cands), 4),
                "clustered_docs": clustered_docs,
                "n_clusters": n_clusters,
                "walls_s": {
                    "bucket_stats": round(bucket_wall, 1),
                    "candidates": round(cand_wall, 1),
                    "residual": round(residual_wall, 1),
                    "dedup_clusters_end_to_end": round(cluster_wall, 1),
                },
                "docs_per_sec_end_to_end": round(n_docs / cluster_wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
