"""Incremental LSH dedup vs full rebuild at pipeline scale.

The claim under measurement (operators/dedup_incremental.py +
operators/dedup_store.py): ingesting a crawl batch against an indexed
corpus costs O(batch + candidate region), not O(corpus) — the
supplement-vs-rebuild argument of [P] preassemble_db.py::supplement_corpus
applied to the dedup family. This tool builds an n-doc indexed corpus
(with a planted 10% near-dup slice, same regime as dedup_scale_bench),
ingests an m-doc batch (which also contains near-dups of corpus docs)
three ways, and reports walls:

  * rebuild:     dedup_clusters(corpus ∪ batch) from scratch;
  * supplement:  supplement_dedup_clusters over in-memory state
                 (the pure compute cost of the incremental path);
  * store:       DedupStore.ingest — supplement + the durable commit
                 (per-batch parquet partitions, scoped cluster rewrite,
                 staging backup, manifest), i.e. what production pays.

Equality is asserted, not assumed: the supplement's cluster table must
match the rebuild's exactly (order-insensitive content signature), and
the store's table must match the supplement's.

Usage: python tools/dedup_incremental_bench.py [n_base] [m_batch]
           [num_hashes] [bands]
Prints one JSON line; root for the store defaults to a tmpdir under
$DEDUP_STORE_ROOT or /dev/shm (tmpfs — keeps write IO off the bench).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _clusters_sig(df):
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(
            F.sum(
                F.xxhash64("doc_id", "cluster_id").cast("decimal(38,0)")
            ),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    m_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    num_hashes = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    bands = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from pyspark.sql import functions as F

    from indra_db_spark.operators.dedup_docs import dedup_clusters
    from indra_db_spark.operators.dedup_incremental import (
        build_dedup_index,
        supplement_dedup_clusters,
    )
    from indra_db_spark.operators.dedup_store import DedupStore
    from indra_db_spark.session import get_spark
    from indra_db_spark.sources.synth import synth_pages

    spark = get_spark(app_name="dedup_incremental_bench")
    lsh = dict(num_hashes=num_hashes, bands=bands)
    threshold = 0.5

    # corpus: first n_base text-bearing synth docs + 10% planted near-dups
    total_ids = n_base + m_batch
    pages = synth_pages(spark, int(total_ids * 7 / 5) + 16, seed=42)
    docs = (
        pages.where(F.col("text").isNotNull())
        .select(
            F.regexp_extract("url", r"doc/(\d+)", 1).cast("long").alias("doc_id"),
            "text",
        )
        .where(F.col("doc_id") < total_ids)
    )
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + total_ids).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate copy marker")).alias("text"),
    )
    orig_id = F.col("doc_id") - total_ids  # a planted dup's original
    # base: originals < n_base + their planted dups — EXCEPT every 100th,
    # whose dup is held back for the batch so the batch has genuine
    # cross-corpus near-dup edges, not just batch-internal ones
    base = (
        docs.where(F.col("doc_id") < n_base)
        .unionByName(planted.where((orig_id < n_base) & (orig_id % 100 != 0)))
        .localCheckpoint()
    )
    batch = (
        docs.where(F.col("doc_id") >= n_base)
        .unionByName(planted.where((orig_id >= n_base) | (orig_id % 100 == 0)))
        .localCheckpoint()
    )
    nb, mb = base.count(), batch.count()

    # amortized one-time state (not a per-batch cost, measured anyway)
    t0 = time.time()
    idx = build_dedup_index(base, **lsh)
    idx = type(idx)(
        doc_fps=idx.doc_fps.localCheckpoint(),
        fp_buckets=idx.fp_buckets.localCheckpoint(),
    )
    base_clusters = dedup_clusters(
        base, method="minhash_lsh", threshold=threshold, collapse_exact=True,
        **lsh,
    ).localCheckpoint()
    t_state = time.time() - t0

    # full rebuild over corpus ∪ batch
    t0 = time.time()
    full = dedup_clusters(
        base.unionByName(batch), method="minhash_lsh", threshold=threshold,
        collapse_exact=True, **lsh,
    ).localCheckpoint()
    full_sig = _clusters_sig(full)
    t_rebuild = time.time() - t0

    # supplement (in-memory state)
    t0 = time.time()
    res = supplement_dedup_clusters(
        idx, base_clusters, base, batch, threshold=threshold, **lsh
    )
    inc = res.clusters.localCheckpoint()
    inc_sig = _clusters_sig(inc)
    t_supp = time.time() - t0
    delta_rows = res.clusters_delta.count()

    # store ingest (durable commit path)
    root_base = os.environ.get("DEDUP_STORE_ROOT") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    store_root = tempfile.mkdtemp(prefix="dedup_store_", dir=root_base)
    try:
        st = DedupStore(
            spark, os.path.join(store_root, "s"), threshold=threshold, **lsh
        )
        t0 = time.time()
        st.ingest(base, "base")
        t_store_base = time.time() - t0
        t0 = time.time()
        stats = st.ingest(batch, "b1")
        t_store_batch = time.time() - t0
        store_sig = _clusters_sig(st.clusters())
    finally:
        shutil.rmtree(store_root, ignore_errors=True)

    assert inc_sig == full_sig, f"supplement != rebuild: {inc_sig} {full_sig}"
    assert store_sig == full_sig, f"store != rebuild: {store_sig} {full_sig}"

    print(
        json.dumps(
            {
                "n_base": nb,
                "m_batch": mb,
                "num_hashes": num_hashes,
                "bands": bands,
                "clusters": full_sig[0],
                "delta_rows": delta_rows,
                "affected_partitions": len(stats["affected_partitions"]),
                "store_partitions": stats["total_partitions"],
                "state_build_sec": round(t_state, 1),
                "rebuild_sec": round(t_rebuild, 1),
                "supplement_sec": round(t_supp, 1),
                "store_base_ingest_sec": round(t_store_base, 1),
                "store_batch_ingest_sec": round(t_store_batch, 1),
                "supplement_speedup": round(t_rebuild / t_supp, 2),
                "store_speedup": round(t_rebuild / t_store_batch, 2),
                "equal": True,
            }
        )
    )


if __name__ == "__main__":
    main()
