"""Incremental LSH dedup == full rebuild, batch by batch.

The property under test: `supplement_dedup_clusters` over (index, old
clusters, old docs, batch) produces EXACTLY the cluster table that
`dedup_clusters(old ∪ batch, method='minhash_lsh', collapse_exact=True)`
produces from scratch — including cross-batch exact dups too short to
shingle, absorption of old singletons, and batches that merge existing
clusters (sub-threshold-transitivity regime).
"""

import pytest

from indra_db_spark.operators.dedup_docs import dedup_clusters
from indra_db_spark.operators.dedup_incremental import (
    build_dedup_index,
    supplement_dedup_clusters,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _clusters(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


def _full(df, threshold):
    return _clusters(
        dedup_clusters(
            df, method="minhash_lsh", threshold=threshold, collapse_exact=True
        )
    )


WORDS_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
WORDS_B = "red orange yellow green blue indigo violet umber ochre teal"
WORDS_C = "one two three four five six seven eight nine ten"


def corpus_rows():
    """Old corpus: near-dup pair, exact group, sub-k exact pair,
    singletons, plus an independent second cluster."""
    return [
        (1, WORDS_A),
        (2, WORDS_A + " extra"),          # near-dup of 1
        (3, WORDS_B),
        (4, WORDS_B),                      # exact dup of 3
        (5, "tiny doc"),                   # sub-k words (< k=3): no shingles
        (6, "tiny doc"),                   # sub-k exact group {5,6}
        (7, WORDS_C),                      # singleton
        (8, "completely unrelated words about maritime navigation charts"),
    ]


def batch_rows():
    return [
        (101, WORDS_A + " extra"),         # exact dup of old near-dup member 2
        (102, WORDS_B + " shade"),         # near-dup of old cluster {3,4}
        (103, "tiny doc"),                 # joins the sub-k exact group
        (104, WORDS_C + " eleven"),        # absorbs old singleton 7
        (105, "brand new content that matches nothing else at all here"),
        (106, "brand new content that matches nothing else at all here"),
        # ^ exact pair within the batch, fp never seen before
        (107, "solitary fresh document with no duplicate partner anywhere"),
    ]


@pytest.mark.parametrize("threshold", [0.5])
def test_supplement_equals_rebuild(spark, threshold):
    old = _docs(spark, corpus_rows())
    batch = _docs(spark, batch_rows())
    full = old.unionByName(batch)

    old_clusters = dedup_clusters(
        old, method="minhash_lsh", threshold=threshold, collapse_exact=True
    )
    idx = build_dedup_index(old)
    idx2, inc = supplement_dedup_clusters(
        idx, old_clusters, old, batch, threshold=threshold
    )

    assert _clusters(inc) == _full(full, threshold)
    # the index extended to cover the whole corpus
    assert idx2.doc_fps.count() == full.count()
    # cross-batch sub-k exact group actually clustered
    got = dict(_clusters(inc))
    assert got[103] == got[5] == got[6]
    # exact-dup-of-member landed in the near-dup cluster
    assert got[101] == got[1] == got[2]


def test_two_batches_equal_one_rebuild(spark):
    t = 0.5
    old = _docs(spark, corpus_rows())
    b1 = _docs(spark, batch_rows())
    b2 = _docs(
        spark,
        [
            (201, WORDS_A),                 # exact dup of doc 1 (fp from batch 0 era)
            (202, "brand new content that matches nothing else at all here"),
            # ^ exact dup of batch-1 pair {105, 106}
            (203, WORDS_C + " eleven"),     # exact dup of batch-1 doc 104
            (204, "wholly distinct trailing document closing the test set"),
        ],
    )

    c0 = dedup_clusters(old, method="minhash_lsh", threshold=t, collapse_exact=True)
    idx = build_dedup_index(old)
    idx1, c1 = supplement_dedup_clusters(idx, c0, old, b1, threshold=t)
    corpus1 = old.unionByName(b1)
    idx2, c2 = supplement_dedup_clusters(idx1, c1, corpus1, b2, threshold=t)

    assert _clusters(c2) == _full(corpus1.unionByName(b2), t)
    assert idx2.doc_fps.count() == corpus1.unionByName(b2).count()


def test_batch_merges_two_old_clusters(spark):
    """Below-transitivity threshold: a bridge doc overlapping two
    existing clusters merges them — labels must match the rebuild.
    (16 hashes / 8 bands: r=2 rows per band lifts the LSH hit
    probability at the bridge's J≈0.43 so the merge deterministically
    fires — verified empirically against this exact fixture.)"""
    t = 0.4
    lsh = dict(num_hashes=16, bands=8)
    half_a = "alpha beta gamma delta epsilon zeta eta theta"
    half_b = "red orange yellow green blue indigo violet umber"
    old = _docs(
        spark,
        [
            (1, half_a),
            (2, half_a + " upsilon"),    # cluster A {1,2}
            (11, half_b),
            (12, half_b + " lilac"),     # cluster B {11,12}
        ],
    )
    bridge = _docs(spark, [(100, half_a + " " + half_b)])

    c0 = dedup_clusters(
        old, method="minhash_lsh", threshold=t, collapse_exact=True, **lsh
    )
    # precondition: two distinct clusters before the bridge arrives
    assert len({cid for _, cid in _clusters(c0)}) == 2
    idx = build_dedup_index(old, **lsh)
    _, c1 = supplement_dedup_clusters(idx, c0, old, bridge, threshold=t, **lsh)

    want = _clusters(
        dedup_clusters(
            old.unionByName(bridge), method="minhash_lsh", threshold=t,
            collapse_exact=True, **lsh,
        )
    )
    assert _clusters(c1) == want
    got = dict(_clusters(c1))
    # the merge actually fired: one cluster holding both old clusters +
    # the bridge
    assert got[1] == got[2] == got[11] == got[12] == got[100] == 1


def test_empty_and_no_match_batches(spark):
    t = 0.5
    old = _docs(spark, corpus_rows())
    c0 = dedup_clusters(old, method="minhash_lsh", threshold=t, collapse_exact=True)
    idx = build_dedup_index(old)

    lonely = _docs(spark, [(301, "nothing here resembles anything previously ingested today")])
    idx1, c1 = supplement_dedup_clusters(idx, c0, old, lonely, threshold=t)
    assert _clusters(c1) == _clusters(c0)  # no new clusters
    assert idx1.doc_fps.count() == old.count() + 1

    # re-ingesting the lonely doc's text as a NEW id → exact pair forms
    twin = _docs(spark, [(302, "nothing here resembles anything previously ingested today")])
    corpus1 = old.unionByName(lonely)
    _, c2 = supplement_dedup_clusters(idx1, c1, corpus1, twin, threshold=t)
    assert _clusters(c2) == _full(corpus1.unionByName(twin), t)
    got = dict(_clusters(c2))
    assert got[301] == got[302] == 301


def test_clusters_delta_is_exactly_the_changed_rows(spark):
    """The store's partition-scoping certificate: clusters_delta must be
    EXACTLY the rows that differ from old_clusters. A batch that only
    ADDS members to existing clusters (labels keep their old min-member
    ids) must not re-emit the unchanged old members — re-emitting them
    makes the store back up and rewrite partitions byte-identically,
    wasted I/O and a widened crash window per batch (review r5)."""
    t = 0.5
    old = _docs(spark, corpus_rows())
    batch = _docs(spark, batch_rows())
    old_clusters = dedup_clusters(
        old, method="minhash_lsh", threshold=t, collapse_exact=True
    )
    idx = build_dedup_index(old)
    res = supplement_dedup_clusters(idx, old_clusters, old, batch, threshold=t)

    # every batch doc joins an EXISTING cluster without changing its
    # label (101→{1,2}, 102→{3,4}, 103→{5,6}), forms a new cluster with
    # an old singleton (104+7), or pairs within the batch (105,106);
    # 107 stays solitary. So the delta is the new docs + the previously
    # unclustered singleton 7 — and none of the unchanged members 1-6.
    delta_ids = {r["doc_id"] for r in res.clusters_delta.collect()}
    assert delta_ids == {7, 101, 102, 103, 104, 105, 106}

    old_rows = _clusters(old_clusters)
    delta_rows = _clusters(res.clusters_delta)
    assert not (delta_rows & old_rows), "delta re-emits identical old rows"

    # relabel carries only labels that actually changed
    rel = res.relabel.collect()
    assert all(r["_node"] != r["_new"] for r in rel)

    # and the assembled table still equals the rebuild
    assert _clusters(res.clusters) == _full(old.unionByName(batch), t)
