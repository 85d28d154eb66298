"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(n·q), the correctness
oracle. Scale path: LSH-bucketed ANN via deterministic random-hyperplane
signatures (md5-seeded, no RNG state): queries only compare within their
Hamming bucket, turning the n×q cross join into a bucket-local join.

Dot products use ``F.zip_with`` + ``F.aggregate`` (JVM higher-order
functions, no Python). At real scale the query side is the broadcast side.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from indra_db_spark.functions.parallel import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Zero-norm guard: 0/0 would be NaN, and Spark sorts NaN ABOVE every
    double — an all-zeros embedding (padding row, failed encoder) would
    otherwise become the rank-1 neighbor of every query. Defined as
    similarity 0 instead (matches the numpy GEMM path's where=norm>0)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    (query_id, neighbor_id, cos_sim, rank); self-matches excluded. The
    query side is broadcast — corpus is never shuffled at scale (fan_out
    only floors the parallelism of single-row-group demo inputs)."""
    c = fan_out(corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    ))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    sims = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(cosine(F.col("_qvec").cast("array<double>"), F.col("_cvec").cast("array<double>")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, salt: str = "") -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5 bytes.
    ``salt`` derives an independent family per LSH table; the default ""
    reproduces the original (oracle-pinned) family byte-for-byte."""
    import hashlib

    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        ctr = 0
        while len(vals) < dim:
            seed = f"plane{salt}:{p}|{ctr}" if salt else f"plane{p}|{ctr}"
            h = hashlib.md5(seed.encode()).digest()
            for i in range(0, 16, 2):
                if len(vals) >= dim:
                    break
                u = int.from_bytes(h[i : i + 2], "big") / 65535.0
                vals.append(2.0 * u - 1.0)
            ctr += 1
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit p = sign(vec · plane_p)."""
    bits = [
        F.when(
            _dot(vec.cast("array<double>"), F.array(*[F.lit(x) for x in plane])) >= 0,
            F.shiftleft(F.lit(1).cast("long"), p),
        ).otherwise(F.lit(0).cast("long"))
        for p, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest coarse centroids
    (IVF inverted lists). Centroid count is small → the argmin is a pure
    column expression over an array literal, no join."""
    vectors = fan_out(vectors)  # per-centroid dot products — spread the scan
    v = F.col(vec_col).cast("array<double>")
    sims = F.array(
        *[
            F.struct(
                (-_dot(v, F.array(*[F.lit(x) for x in c]))
                 / _norm(F.array(*[F.lit(float(x)) for x in c]))).alias("negsim"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    ordered = F.slice(F.array_sort(sims), 1, n_probe)
    return vectors.select(
        F.col(id_col), F.col(vec_col), F.explode(ordered).alias("_a")
    ).select(id_col, vec_col, F.col("_a.cid").alias("cell"))


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
) -> list[list[float]]:
    """Deterministic k-means-lite: seeds = the n_cells corpus vectors with
    the smallest ids (reproducible, no RNG), a few Lloyd iterations as
    whole-corpus aggregations. Centroid count is tiny → driver collect of
    centroids only, never of the corpus."""
    seeds = (
        corpus.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    )
    cents = [[float(x) for x in r[vec_col]] for r in seeds]
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col, n_probe=1)
        agg = (
            assigned.select(
                "cell", F.col(vec_col).cast("array<double>").alias("_v")
            )
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.array(*[
                    F.sum(F.col("_v")[i]).alias(f"s{i}")
                    for i in range(len(cents[0]))
                ]).alias("sums"),
            )
            .collect()
        )
        for r in agg:
            cents[r["cell"]] = [s / r["n"] for s in r["sums"]]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed into coarse cells; each query
    probes its ``n_probe`` nearest cells only. The cell equi-join replaces
    the cross join — at scale the inverted lists are the partition layout.

    Measured recall@5 vs :func:`brute_force_topk` at trained centroids
    (``train_centroids`` iters=3, 8 cells) on a seeded 400×16 corpus of
    overlapping clusters (tests/test_curation_ops.py::
    test_ivf_recall_vs_brute_force — floors pinned slightly below):

    ========  =========
    n_probe   recall@5
    ========  =========
    1         0.910
    2         0.980
    4         1.000
    ========  =========

    Recall is monotone in ``n_probe`` (probed cells nest; scoring within
    the candidate set is exact)."""
    cents = centroids or train_centroids(corpus, n_cells, id_col, vec_col)
    c = ivf_assign(corpus, cents, id_col, vec_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"), "cell"
    )
    q = ivf_assign(queries, cents, id_col, vec_col, n_probe=n_probe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"), "cell"
    )
    sims = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine(
                    F.col("_qvec").cast("array<double>"),
                    F.col("_cvec").cast("array<double>"),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: compare only within the same hyperplane bucket.

    Recall improves with fewer planes / multiple tables; this single-table
    variant is the shape demo — the bucket join replaces the cross join."""
    planes = _hyperplanes(dim, n_planes)
    c = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(cosine(F.col("_qvec").cast("array<double>"), F.col("_cvec").cast("array<double>")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (vec_a < vec_b,
    cos ≥ threshold) — O(n²), the correctness oracle for the LSH variant
    (same role jaccard_pairs plays for MinHash-LSH).

    Shape: one L2-normalized block of the corpus is broadcast to every
    executor and each Arrow batch computes a (batch × corpus) GEMM —
    dense linear algebra belongs in numpy/BLAS, not per-pair column
    expressions (a non-equi-join + interpreted higher-order cosine
    measured 107 s at n=2000, d=64; this runs in ~2 s). The broadcast
    block must fit in executor memory — that is the definition of this
    operator's applicability; beyond it, ``lsh_near_dup_pairs`` is the
    scale path (bucket equi-join, no all-pairs anywhere)."""
    import numpy as np
    import pandas as pd

    sc = corpus.sparkSession.sparkContext
    side = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    block = side.toPandas()
    ids_b = block["vec_id"].to_numpy(dtype="int64")
    mat = np.array(block["embedding"].tolist(), dtype="float64")
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    np.divide(mat, norms, out=mat, where=norms > 0)
    bc = sc.broadcast((ids_b, mat))
    # The GEMM is embarrassingly parallel over batch rows; a single-row-
    # group input would otherwise run the whole (n × n) product in one
    # Arrow task (measured 26 s at n=20k on one core of 32).
    side = fan_out(side)

    def gemm(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        ids_corpus, m_corpus = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids_a = pdf["vec_id"].to_numpy(dtype="int64")
            a = np.array(pdf["embedding"].tolist(), dtype="float64")
            an = np.linalg.norm(a, axis=1, keepdims=True)
            np.divide(a, an, out=a, where=an > 0)
            sims = np.round(a @ m_corpus.T, 6)
            ia, ib = np.nonzero(
                (sims >= threshold) & (ids_a[:, None] < ids_corpus[None, :])
            )
            yield pd.DataFrame(
                {
                    "vec_a": ids_a[ia],
                    "vec_b": ids_corpus[ib],
                    "cos_sim": sims[ia, ib],
                }
            )

    return side.mapInPandas(gemm, "vec_a long, vec_b long, cos_sim double")


def lsh_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 1,
) -> DataFrame:
    """Scale path for embedding near-dup: candidates = pairs sharing a
    hyperplane bucket in ANY of ``n_tables`` independent tables (the n²
    cross join becomes per-table bucket equi-joins; at cos ≥ 0.95 the
    angle is ≤ 18°, so collision probability per plane is 1-18/180 = 0.9
    → one 8-plane table recalls ~43%, t tables 1-(1-0.43)^t: 4 tables
    ≈ 0.90), exact-cosine residual keeps precision at 1.

    Each row is exploded ×n_tables with its per-table bucket; the join
    key is (table, bucket) so tables never cross-match. Candidate pairs
    are deduped BEFORE the cosine residual — each pair's vectors are
    scored once however many tables it collides in."""
    tagged = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_signature(
                            F.col(vec_col),
                            _hyperplanes(dim, n_planes, salt=str(t) if t else ""),
                        ).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("_tb"),
    ).select("_id", "_v", F.col("_tb.t").alias("_t"), F.col("_tb.bucket").alias("bucket"))
    a = tagged.select(
        F.col("_id").alias("vec_a"), F.col("_v").alias("_va"), "_t", "bucket"
    )
    b = tagged.select(
        F.col("_id").alias("vec_b"), F.col("_v").alias("_vb"), "_t", "bucket"
    )
    cands = (
        a.join(b, ["_t", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "_va", "_vb")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cands.withColumn(
            "cos_sim",
            F.round(
                cosine(F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")),
                6,
            ),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )
