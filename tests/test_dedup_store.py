"""DedupStore: durable incremental dedup == full rebuild, through
crashes and retries.

Every test's oracle is the same as test_dedup_incremental's:
``dedup_clusters(all docs so far, method='minhash_lsh',
collapse_exact=True)`` — the store must reproduce it row-for-row after
any ingest sequence, including injected crashes at both sides of the
cluster-partition rewrite and idempotent re-ingest of committed batches.
"""

import os

import pytest

from indra_db_spark.operators.dedup_docs import dedup_clusters
from indra_db_spark.operators.dedup_incremental import build_dedup_index
from indra_db_spark.operators.dedup_store import DedupStore
from indra_db_spark.sources import storage
from test_dedup_incremental import (
    _clusters,
    _docs,
    _full,
    batch_rows,
    corpus_rows,
)

T = 0.5

B2_ROWS = [
    (201, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (202, "brand new content that matches nothing else at all here"),
    (203, "one two three four five six seven eight nine ten eleven"),
    (204, "wholly distinct trailing document closing the test set"),
]


def _store(spark, tmp_path, **kw):
    kw.setdefault("threshold", T)
    return DedupStore(spark, str(tmp_path / "store"), **kw)


def _cluster_files(root):
    """{relpath: (size, mtime_ns)} for every data file under clusters/."""
    out = {}
    base = os.path.join(root, "clusters")
    for dirpath, _, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, base)] = (st.st_size, st.st_mtime_ns)
    return out


def test_store_batches_equal_rebuild_and_reopen(spark, tmp_path):
    st = _store(spark, tmp_path)
    old = _docs(spark, corpus_rows())
    b1 = _docs(spark, batch_rows())
    b2 = _docs(spark, B2_ROWS)

    s0 = st.ingest(old, "base")
    assert s0["bootstrap"] and not s0["noop"]
    assert _clusters(st.clusters()) == _full(old, T)

    s1 = st.ingest(b1, "b1")
    assert not s1["bootstrap"]
    corpus1 = old.unionByName(b1)
    assert _clusters(st.clusters()) == _full(corpus1, T)
    # the rewrite touched a strict subset of partitions
    assert 0 < len(s1["affected_partitions"]) <= s1["total_partitions"]

    st.ingest(b2, "b2")
    corpus2 = corpus1.unionByName(b2)
    assert _clusters(st.clusters()) == _full(corpus2, T)

    # index tables cover the corpus exactly (same as a fresh build)
    idx = st.index()
    ref = build_dedup_index(corpus2)
    assert idx.doc_fps.count() == ref.doc_fps.count() == corpus2.count()
    assert idx.fp_buckets.count() == ref.fp_buckets.count()

    # reopen: params adopted from the manifest, state identical
    st2 = DedupStore(spark, str(tmp_path / "store"))
    assert st2.params["threshold"] == T and st2.params["bands"] == 4
    assert st2.committed == ["base", "b1", "b2"]
    assert _clusters(st2.clusters()) == _full(corpus2, T)


def test_reingest_committed_batch_is_noop(spark, tmp_path):
    st = _store(spark, tmp_path)
    old = _docs(spark, corpus_rows())
    b1 = _docs(spark, batch_rows())
    st.ingest(old, "base")
    st.ingest(b1, "b1")
    before = _clusters(st.clusters())
    assert st.ingest(b1, "b1")["noop"]
    assert st.ingest(old, "base")["noop"]
    assert _clusters(st.clusters()) == before
    assert st.committed == ["base", "b1"]


def test_unaffected_partitions_untouched_on_disk(spark, tmp_path):
    """A batch whose merges only reach batch-1 clusters must leave the
    base batch's cluster partition byte-identical on disk — the
    batch-partitioned layout's O(batch region) rewrite claim. Since the
    r5 exact-delta fix, joining b1's cluster {105, 106} WITHOUT changing
    its label (105 stays the min member) touches only the new batch's
    own partition — b1's rows are byte-identical, so not even b1 is
    backed up or rewritten."""
    st = _store(spark, tmp_path)
    st.ingest(_docs(spark, corpus_rows()), "base")
    st.ingest(_docs(spark, batch_rows()), "b1")
    before = _cluster_files(st.root)
    b2 = _docs(
        spark,
        [
            (202, "brand new content that matches nothing else at all here"),
            # ^ exact dup of the b1-only cluster {105, 106}
            (204, "wholly distinct trailing document closing the test set"),
        ],
    )
    stats = st.ingest(b2, "b2")
    after = _cluster_files(st.root)
    assert "base" not in stats["affected_partitions"]
    assert set(stats["affected_partitions"]) == {"b2"}
    affected_dirs = {f"_b={p}" for p in stats["affected_partitions"]}
    changed = {
        rel
        for rel in set(before) | set(after)
        if before.get(rel) != after.get(rel)
    }
    assert changed, "the batch rewrote nothing — test rows should merge"
    for rel in changed:
        assert rel.split(os.sep)[0] in affected_dirs, (
            f"{rel} changed outside the affected set {sorted(affected_dirs)}"
        )
    corpus = _docs(spark, corpus_rows() + batch_rows()).unionByName(b2)
    assert _clusters(st.clusters()) == _full(corpus, T)


@pytest.mark.parametrize("crash_after_write", [False, True])
def test_crash_during_cluster_rewrite_then_retry(
    spark, tmp_path, monkeypatch, crash_after_write
):
    """Kill the ingest at the cluster rewrite — before the overwrite ran
    (backup exists, table untouched) and after it ran (table rewritten,
    ledger not committed). The retry must converge to the clean result."""
    st = _store(spark, tmp_path)
    old = _docs(spark, corpus_rows())
    b1 = _docs(spark, batch_rows())
    st.ingest(old, "base")

    real = storage.scoped_overwrite

    def boom(df, table_path, part_col, scope_values, **kw):
        if crash_after_write:
            real(df, table_path, part_col, scope_values, **kw)
        raise RuntimeError("injected crash")

    monkeypatch.setattr(storage, "scoped_overwrite", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        st.ingest(b1, "b1")
    assert "b1" not in st.committed
    assert os.path.exists(st._staging("b1"))
    monkeypatch.setattr(storage, "scoped_overwrite", real)

    st.ingest(b1, "b1")
    assert st.committed == ["base", "b1"]
    assert not os.path.exists(st._staging("b1"))
    assert _clusters(st.clusters()) == _full(old.unionByName(b1), T)


def test_reopen_with_conflicting_params_raises(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.ingest(_docs(spark, corpus_rows()), "base")
    with pytest.raises(ValueError, match="threshold"):
        DedupStore(spark, st.root, threshold=0.9)
    with pytest.raises(ValueError, match="invalid batch_id"):
        st.ingest(_docs(spark, corpus_rows()), "_bad/id")


def test_compact_folds_history_and_ingest_continues(spark, tmp_path):
    st = _store(spark, tmp_path)
    old = _docs(spark, corpus_rows())
    b1 = _docs(spark, batch_rows())
    b2 = _docs(spark, B2_ROWS)
    st.ingest(old, "base")
    st.ingest(b1, "b1")
    corpus1 = old.unionByName(b1)
    before = _clusters(st.clusters())

    stats = st.compact("c0001")
    assert stats["batches_compacted"] == 2 and not stats["noop"]
    assert st.committed == ["c0001"]
    assert _clusters(st.clusters()) == before == _full(corpus1, T)
    assert st.docs().count() == corpus1.count()
    # on disk: exactly one partition per table survives
    for table, col in (
        ("docs", "batch_id"), ("doc_fps", "batch_id"),
        ("fp_buckets", "batch_id"), ("clusters", "_b"),
    ):
        dirs = [
            n for n in os.listdir(os.path.join(st.root, table))
            if n.startswith(f"{col}=")
        ]
        assert dirs == [f"{col}=c0001"], (table, dirs)
    # re-compacting to the same id is a no-op; to a committed id an error
    assert st.compact("c0001")["noop"]

    st.ingest(b2, "b2")
    assert _clusters(st.clusters()) == _full(corpus1.unionByName(b2), T)


def test_compact_crash_before_swap_and_after_swap(spark, tmp_path, monkeypatch):
    st = _store(spark, tmp_path)
    old = _docs(spark, corpus_rows())
    b1 = _docs(spark, batch_rows())
    st.ingest(old, "base")
    st.ingest(b1, "b1")
    corpus1 = old.unionByName(b1)
    expect = _full(corpus1, T)

    # crash BEFORE the ledger swap: new partitions written but invisible
    def no_swap(batches):
        raise RuntimeError("injected crash")

    monkeypatch.setattr(st, "_swap_ledger", no_swap)
    with pytest.raises(RuntimeError, match="injected crash"):
        st.compact("c0001")
    monkeypatch.undo()
    assert st.committed == ["base", "b1"]
    assert _clusters(st.clusters()) == expect  # stale c0001 dirs invisible

    # crash AFTER the swap, before GC: ledger-scoped reads hide the
    # now-unreferenced old partitions
    real_gc = st._gc
    monkeypatch.setattr(st, "_gc", lambda keep: (_ for _ in ()).throw(
        RuntimeError("injected crash")
    ))
    with pytest.raises(RuntimeError, match="injected crash"):
        st.compact("c0002")
    monkeypatch.undo()
    assert st.committed == ["c0002"]
    assert _clusters(st.clusters()) == expect
    real_gc({"c0002"})
    assert _clusters(st.clusters()) == expect


def test_strict_ids_reject_duplicates(spark, tmp_path):
    st = _store(spark, tmp_path)
    dup_batch = _docs(spark, corpus_rows() + [(1, "repeat of id one")])
    with pytest.raises(ValueError, match="duplicate doc_id"):
        st.ingest(dup_batch, "base")
    st.ingest(_docs(spark, corpus_rows()), "base")
    overlapping = _docs(spark, [(1, "already ingested"), (300, "fresh")])
    with pytest.raises(ValueError, match="already ingested"):
        st.ingest(overlapping, "b1")
    # strict_ids=False lets the caller take responsibility
    st.ingest(_docs(spark, [(300, "fresh")]), "b1")
    assert st.committed == ["base", "b1"]


def test_readers_and_compact_self_heal_after_crash(spark, tmp_path, monkeypatch):
    """A crash mid-cluster-rewrite must not leak half-rewritten
    (ledger-visible) partitions to ANY later entry point — not just a
    retry of the same batch_id (review r5). clusters()/index() after the
    crash must serve exactly the pre-batch state, and compact() must
    compact that state instead of baking the corruption in."""
    st = _store(spark, tmp_path)
    old = _docs(spark, corpus_rows())
    b1 = _docs(spark, batch_rows())
    st.ingest(old, "base")
    expect_pre = _full(old, T)

    real = storage.scoped_overwrite

    def boom(df, table_path, part_col, scope_values, **kw):
        # crash AFTER the overwrite ran: committed partitions now hold
        # post-batch labels while the ledger still lists them
        real(df, table_path, part_col, scope_values, **kw)
        raise RuntimeError("injected crash")

    monkeypatch.setattr(storage, "scoped_overwrite", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        st.ingest(b1, "b1")
    monkeypatch.undo()

    # a reader on the same handle — NO retry of b1 — heals to pre-batch
    assert _clusters(st.clusters()) == expect_pre
    idx = st.index()
    ref = build_dedup_index(old)
    assert idx.doc_fps.count() == ref.doc_fps.count() == old.count()

    # re-inject the crash so compact() faces fresh corruption directly
    monkeypatch.setattr(storage, "scoped_overwrite", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        st.ingest(b1, "b1")
    monkeypatch.undo()

    stats = st.compact("c0001")
    assert stats["batches_compacted"] == 1
    assert st.committed == ["c0001"]
    assert _clusters(st.clusters()) == expect_pre

    # the batch retried after compaction still converges to the rebuild
    st.ingest(b1, "b1")
    assert _clusters(st.clusters()) == _full(old.unionByName(b1), T)


def test_writer_lock_blocks_second_writer_and_reader_rollback(
    spark, tmp_path
):
    """ADVICE r5 (medium): a second writer must be refused while a live
    writer holds the lock, and a READER must not roll back the live
    writer's staging (it used to treat any staging as a crashed attempt
    and restore pre-images under the in-flight ingest)."""
    import json as _json
    import subprocess

    st = _store(spark, tmp_path)
    st.ingest(_docs(spark, corpus_rows()), "base")

    # simulate a live foreign writer: pid 1 always exists and is not us
    lock = os.path.join(st.root, "_writer.lock")
    with open(lock, "w") as f:
        _json.dump({"pid": 1}, f)
    staging = os.path.join(st.root, "_staging", "inflight")
    os.makedirs(staging)
    with open(os.path.join(staging, "marker"), "w") as f:
        f.write("x")

    # reader must NOT touch the live writer's staging
    st.docs().count()
    assert os.path.exists(os.path.join(staging, "marker"))

    # second writer must be refused outright
    with pytest.raises(RuntimeError, match="another writer"):
        st.ingest(_docs(spark, batch_rows()), "b1")
    assert os.path.exists(lock)  # the foreign lock was not clobbered

    # stale lock (dead pid): writer proceeds, recovery resumes
    p = subprocess.Popen(["true"])
    p.wait()
    with open(lock, "w") as f:
        _json.dump({"pid": p.pid}, f)
    st.ingest(_docs(spark, batch_rows()), "b1")
    corpus = _docs(spark, corpus_rows()).unionByName(_docs(spark, batch_rows()))
    assert _clusters(st.clusters()) == _full(corpus, T)
    # staging from the (dead) "crashed attempt" was recovered away, and
    # the stale lock was replaced then released
    assert not os.path.exists(staging)
    assert not os.path.exists(lock)
