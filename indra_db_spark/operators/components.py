"""Connected components over the refinement graph — pure DataFrame ops.

Analog of indra.preassembler's grouping of related statements
(``combine_related``: statements linked by refinement form one group).
GraphFrames is not a dependency → implemented as the alternating
**large-star / small-star** algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond"), which converges in O(log² n) rounds
on pathological graphs and ~2 rounds on shallow refinement forests.

Each iteration is two shuffles on node id; intermediate edge sets are
``localCheckpoint()``-ed to truncate lineage (iterative plans otherwise
grow exponentially in Catalyst). Convergence = edge multiset stable
(checked via count + hash-sum, one cheap agg per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("_mn", "u").alias("_m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("_m"))
    nbrs = o.join(mins, "u").select("v", "_m", "u")
    emitted = nbrs.select(F.col("v").alias("u"), F.col("_m").alias("v")).union(
        nbrs.select(F.col("u"), F.col("_m").alias("v"))
    )
    return emitted.where(F.col("u") != F.col("v")).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def connected_components(
    edges: DataFrame, src: str = "supported_mk_hash", dst: str = "supporting_mk_hash",
    max_iter: int = 20,
    checkpoint: str = "local",
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """→ (mk_hash, component_id) for every node appearing in ``edges``;
    component_id = min node id in the component.

    ``checkpoint``: ``'local'`` (executor-local blocks — fast, but lost on
    executor death; fine for single-JVM and short jobs) or ``'reliable'``
    (``sparkContext.setCheckpointDir`` + ``DataFrame.checkpoint()`` against
    the cluster FS — the production setting for multi-hour CC over large
    graphs, survives executor loss at the cost of one write per round).
    Reliable-mode caveats: ``setCheckpointDir`` is GLOBAL SparkContext
    state (pass a job-scoped dir), and Spark does not delete superseded
    non-streaming checkpoints unless
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — set it (or
    clean the dir after the job) or tens of rounds × a multi-TB edge set
    will accumulate one snapshot per round.
    ``stats`` (optional dict) is filled with {'rounds', 'edges_in'}.
    """
    if checkpoint == "reliable":
        sc = edges.sparkSession.sparkContext
        if checkpoint_dir is not None:
            sc.setCheckpointDir(checkpoint_dir)
        elif sc.getCheckpointDir() is None:
            raise ValueError(
                "checkpoint='reliable' needs checkpoint_dir (cluster FS path)"
            )
        ckpt = lambda df: df.checkpoint()
    elif checkpoint == "local":
        ckpt = lambda df: df.localCheckpoint()
    else:
        raise ValueError(f"unknown checkpoint mode {checkpoint!r}")
    e = ckpt(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sig = _signature(e)
    if stats is not None:
        stats["edges_in"] = sig[0]
        stats["rounds"] = 0
    if sig[0] == 0:  # no edges — skip the iteration machinery entirely
        return e.select(F.col("u").alias("mk_hash"), F.col("v").alias("component_id"))
    converged = False
    for i in range(max_iter):
        e = ckpt(_small_star(_large_star(e)))
        new_sig = _signature(e)
        if stats is not None:
            stats["rounds"] = i + 1
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # A non-converged edge set is NOT a star forest: nodes would carry
        # several conflicting component_ids and every downstream join
        # would silently fan out. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(edges={sig[0]}); raise max_iter (O(log² n) expected)"
        )
    # Converged star forest: every edge points node → root.
    roots = e.select(F.col("u").alias("mk_hash"), F.col("v").alias("component_id"))
    # Roots themselves appear only on the v side → add self-rows.
    self_rows = e.select(F.col("v").alias("mk_hash")).distinct().join(
        roots.select(F.col("mk_hash")), "mk_hash", "left_anti"
    ).select("mk_hash", F.col("mk_hash").alias("component_id"))
    return roots.union(self_rows)


def assign_components(pa_statements: DataFrame, pa_link: DataFrame) -> DataFrame:
    """(mk_hash, component_id) for the whole corpus — isolated statements
    are their own component (component_id = mk_hash)."""
    cc = connected_components(pa_link)
    return (
        pa_statements.select("mk_hash")
        .join(cc, "mk_hash", "left")
        .select(
            "mk_hash",
            F.coalesce("component_id", "mk_hash").alias("component_id"),
        )
    )
