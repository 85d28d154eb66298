"""Incremental preassembly — supplement an existing corpus with new pages.

Reference: indra_db/preassembly/preassemble_db.py::DbPreassembler
.supplement_corpus — merge a new raw-statement batch into the existing
pa corpus without rebuilding it: new unique statements are added, existing
ones gain evidence, and support links between old↔new are computed. The
``*_updates`` watermark tables make re-runs incremental.

Spark shape (snapshot-diff batch, also the foreachBatch body for the
Structured Streaming wrapper in :mod:`indra_db_spark.streaming.stream`):

  1. read new pages → extract → ground → new raw batch,
  2. idempotence: anti-join on deterministic ``raw_id`` vs existing raw,
  3. **affected set** = mk_hashes touched by the new batch ∪ every hash on
     a re-read url (a newer extractor version supersedes the url's old
     readings — distill semantics),
  4. re-aggregate pa rows ONLY for affected hashes (gathering all their
     raw evidence, old + new), merge into pa_statements by anti-join +
     union,
  5. refinement links recomputed only where one side is affected — two
     small-side joins against the full corpus, not a full self-join,
  6. belief recomputed for affected ∪ statements supported by affected
     (one-hop evidence inheritance),
  7. append-only evidence, full-partition overwrite for pa tables —
     idempotent under retry.

Every output equals the full rebuild on (old ∪ new) pages — property-
tested in tests/test_supplement.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from indra_db_spark.operators import belief as belief_op
from indra_db_spark.operators import dedup as dedup_op
from indra_db_spark.operators import distill as distill_op
from indra_db_spark.operators import extract as extract_op
from indra_db_spark.operators import grounding as ground_op
from indra_db_spark.operators import refine as refine_op
from indra_db_spark.operators.components import (
    assign_components,
    connected_components,
)
from indra_db_spark.sources import dims as dims_mod
from indra_db_spark.sources import storage
from indra_db_spark.pipeline import PA_BUCKETS


# shared with the incremental-dedup store (operators/dedup_store.py)
_scoped_overwrite = storage.scoped_overwrite


def _partitioned_by(table_path: str, part_col: str) -> bool:
    m = storage.read_manifest(table_path)
    return bool(m) and m.get("partition_by") == [part_col]


def _require_current_layout(spark: SparkSession, out_dir: str) -> None:
    """Fail fast on corpora built before the current (r3) schema.

    A pre-r3 corpus lacks the ``bounds`` agent-struct field, the evidence
    ``day`` partitioning, and the pa bucket partitioning; supplementing
    one would die mid-merge with an opaque AnalysisException (or worse,
    rewrite the wrong partitions). Schema-aligning on read is not sound
    either: the r3 BoundCondition grammar changes matches-keys, so the
    old pa rows would no longer agree with a rebuild. The only correct
    path is a full rebuild — say so explicitly (ADVICE r3)."""
    problems = []
    raw = storage.read_table(spark, f"{out_dir}/raw_statements")
    # existence check BEFORE indexing the struct field — a corpus missing
    # subj entirely should get the friendly rebuild-required ValueError,
    # not an opaque KeyError (ADVICE r4, low)
    if "subj" not in raw.columns:
        problems.append("raw_statements lacks the 'subj' agent column")
    else:
        subj_fields = [f.name for f in raw.schema["subj"].dataType.fields]
        if "bounds" not in subj_fields:
            problems.append(
                "raw_statements.subj lacks the 'bounds' condition field"
            )
    for table, col in (
        ("evidence", "day"),
        ("pa_statements", "bucket"),
        ("pa_link", "bucket"),
        ("pa_groups", "bucket"),  # r5: incremental-CC bucket scoping
    ):
        if not _partitioned_by(f"{out_dir}/{table}", col):
            problems.append(f"{table} is not partitioned by '{col}'")
    if problems:
        raise ValueError(
            f"corpus at {out_dir} predates the current schema "
            f"({'; '.join(problems)}); supplement_corpus cannot merge into "
            "it — rebuild the corpus with pipeline.run_pipeline first"
        )


def supplement_corpus(
    spark: SparkSession,
    out_dir: str,
    new_pages: DataFrame,
    grounding_map: DataFrame | None = None,
    isa_closure: DataFrame | None = None,
    priors: DataFrame | None = None,
    extractor_version: str = extract_op.EXTRACTOR_VERSION,
    source_expr=None,
    gather_isin_max: int = 20_000,
) -> dict[str, DataFrame]:
    """Merge new pages into the corpus at ``out_dir`` (built by
    pipeline.run_pipeline). Returns the updated tables.

    ``gather_isin_max``: per-source cap on the url sets the evidence
    gather collects to the driver to run as a pruned, filter-pushed read
    of the raw log — batch urls and affected-hash urls are each capped,
    so the pushed ``In(url, …)`` literal holds at most 2× this many
    values; above either cap the gather falls back to the semi-join full
    scan (see the step-4 comment). 0 forces the fallback."""
    grounding_map = (
        grounding_map if grounding_map is not None else dims_mod.grounding_map_df(spark)
    )
    isa_closure = (
        isa_closure if isa_closure is not None else dims_mod.isa_closure_df(spark)
    )
    priors = priors if priors is not None else dims_mod.source_priors_df(spark)

    _require_current_layout(spark, out_dir)  # pre-r3 corpus → rebuild
    path = lambda t: f"{out_dir}/{t}"
    old_raw = storage.read_table(spark, path("raw_statements")).drop("day")
    old_pa = storage.read_table(spark, path("pa_statements")).drop("bucket")
    old_link = storage.read_table(spark, path("pa_link")).drop("bucket")

    # 1-2. new raw batch, idempotent vs existing (deterministic raw_id).
    # The anti-join is DAY-SCOPED — a partition-pruned read of the raw
    # log, not a full scan (VERDICT r4 #3): raw_id is a pure function of
    # (url, extractor, version, span, matches_key) and a row lands in the
    # day partition of ITS OWN warc_ts, so a retried or re-applied batch
    # (identical rows ⇒ identical warc_ts) can only collide with raw rows
    # on the batch's own days. A re-CAPTURE of a url at a different
    # warc_ts with the same extractor version would duplicate raw_id
    # across days — but the full rebuild keeps both of those rows too
    # (extraction is page-row-local) and distill collapses them by
    # (url, mk_hash, source_hash) downstream, so the anti-join never
    # guarded that case. This bounds the idempotence check's scan by the
    # batch's days instead of the corpus.
    batch_days = [
        r["d"]
        for r in new_pages.select(
            F.date_format("warc_ts", "yyyy-MM-dd").alias("d")
        ).distinct().collect()
    ]
    old_raw_batch_days = storage.read_table(
        spark, path("raw_statements")
    ).where(F.col("day").isin(batch_days))
    grounded = ground_op.ground_statements(
        extract_op.extract_statements(new_pages, extractor_version),
        grounding_map,
        source_expr=source_expr,
    )
    new_raw = (
        grounded.join(old_raw_batch_days.select("raw_id"), "raw_id", "left_anti")
        # the USING anti-join moves raw_id first; keep the table's order
        # so the append's manifest schema matches the rebuild's
        .select(*grounded.columns)
        .localCheckpoint()  # consumed several times below
    )

    # 3. affected hashes: new batch hashes ∪ all hashes on re-read PAGES.
    # Urls come from new_pages, not new_raw: a re-read page that yields
    # ZERO statements at the bumped version must still supersede its old
    # readings (the full rebuild has none of them). When the batch's url
    # set is collectable (same cap as the gather below) the re-read
    # lookup is a literal isin PUSHED to the scan — row-group-skippable
    # over the url-sorted raw files — instead of a semi-join that decodes
    # the url column of the whole log.
    new_urls = new_pages.select("url").distinct()
    new_url_rows = new_urls.limit(gather_isin_max + 1).collect()
    # NULL urls are dropped from the literal lists: a semi-join never
    # matches a NULL key, so isin (same semantics) stays equivalent —
    # and sorted() would raise on None
    new_url_list = (
        sorted(r["url"] for r in new_url_rows if r["url"] is not None)
        if len(new_url_rows) <= gather_isin_max
        else None
    )
    reread = (
        old_raw.where(F.col("url").isin(new_url_list))
        if new_url_list is not None
        else old_raw.join(new_urls, "url", "left_semi")
    )
    affected = (
        new_raw.select("mk_hash")
        .unionByName(reread.select("mk_hash"))
        .distinct()
        .localCheckpoint()
    )

    # 4. gather raw evidence for re-distillation. The gather is URL-scoped,
    # not hash-scoped: distill's per-(url, extractor) version max must see
    # ALL of a url's rows — a hash-scoped subset could omit the url's
    # newest-version rows (their hashes unaffected) and resurrect evidence
    # an earlier version bump already superseded. The pa/evidence rebuild
    # is then restricted back to the affected hash set so the merge stays
    # disjoint with the kept (anti-joined) old rows.
    #
    # The gather is the batch's one FAT read of the raw log (every column,
    # evidence text included — everything else reads slim projections), so
    # it is bounded when the dirty url set is collectable: a column-pruned
    # slim scan finds the affected urls, a second slim filter-pushed scan
    # finds every day those urls appear on, and only then the fat read
    # runs PARTITION-PRUNED to those days and FILTER-PUSHED on url (a
    # literal isin reaches the parquet scan and skips row groups via
    # min/max stats — raw files are url-sorted within partitions for
    # exactly this; a semi-join can do neither). Above the cap (a hash
    # carried by very many urls) it falls back to the join-based full
    # scan, which is the correctness baseline.
    # the affected-url collect only runs when the pruned path is still
    # reachable — with new_url_list already over its cap this would be a
    # full-log slim scan whose result is thrown away
    aff_url_rows = (
        old_raw.join(affected, "mk_hash", "left_semi")
        .select("url")
        .distinct()
        .limit(gather_isin_max + 1)
        .collect()
        if new_url_list is not None
        else None
    )
    if aff_url_rows is not None and len(aff_url_rows) <= gather_isin_max:
        gather_urls = sorted(
            {r["url"] for r in aff_url_rows if r["url"] is not None}
            | set(new_url_list)
        )
        # ALL days where a gathered url appears (not just days of its
        # affected rows — distill must see every row of the url), via a
        # second slim filter-pushed scan of (url, day)
        gather_days = sorted(
            r["day"]
            for r in storage.read_table(spark, path("raw_statements"))
            .where(F.col("url").isin(gather_urls))
            .select("day")
            .distinct()
            .collect()
        )
        old_gather = (
            storage.read_table(spark, path("raw_statements"))
            .where(F.col("day").isin(gather_days))
            .where(F.col("url").isin(gather_urls))
            .drop("day")
        )
    else:
        aff_urls = (
            old_raw.join(affected, "mk_hash", "left_semi")
            .select("url")
            .unionByName(new_urls)
            .distinct()
        )
        old_gather = old_raw.join(aff_urls, "url", "left_semi")
    gathered = old_gather.unionByName(new_raw)
    distilled = (
        distill_op.distill(gathered)
        .join(affected, "mk_hash", "left_semi")
        .localCheckpoint()
    )
    pa_affected = dedup_op.build_pa_statements(distilled)

    merged_pa_base = (
        old_pa.drop("belief")
        .join(affected, "mk_hash", "left_anti")
        .unionByName(pa_affected)
    ).localCheckpoint()

    # 5. refinement: recompute edges touching affected only. Both joins put
    # the affected set on one side — never a full corpus self-join.
    aff_pa = merged_pa_base.join(affected, "mk_hash", "left_semi")
    links_spec_aff = refine_op.build_pa_link_restricted(
        specific=aff_pa, general=merged_pa_base, isa_closure=isa_closure
    )
    links_gen_aff = refine_op.build_pa_link_restricted(
        specific=merged_pa_base, general=aff_pa, isa_closure=isa_closure
    )
    aff_s = affected.withColumnRenamed("mk_hash", "supporting_mk_hash")
    aff_d = affected.withColumnRenamed("mk_hash", "supported_mk_hash")
    kept_links = old_link.join(aff_s, "supporting_mk_hash", "left_anti").join(
        aff_d, "supported_mk_hash", "left_anti"
    )
    merged_link = (
        kept_links.unionByName(links_spec_aff)
        .unionByName(links_gen_aff)
        .distinct()
        .localCheckpoint()
    )

    # 6. belief: affected ∪ one-hop supported-by-affected — in the OLD
    # link set too: when an affected supporter vanishes entirely, its edge
    # is absent from merged_link, but the statements it used to support
    # still need their (now lower) belief recomputed.
    dirty = (
        affected.unionByName(
            merged_link.unionByName(old_link)
            .join(aff_s, "supporting_mk_hash", "left_semi")
            .select(F.col("supported_mk_hash").alias("mk_hash"))
        )
        .distinct()
    )
    dirty_pa = merged_pa_base.join(dirty, "mk_hash", "left_semi")
    dirty_links = merged_link.join(
        dirty.withColumnRenamed("mk_hash", "supported_mk_hash"),
        "supported_mk_hash",
        "left_semi",
    )
    # compute_belief needs supporting stmts' counts → pass merged corpus
    # restricted to dirty ∪ their supporters.
    supporters = dirty_links.select(
        F.col("supporting_mk_hash").alias("mk_hash")
    ).distinct()
    belief_scope = merged_pa_base.join(
        dirty.unionByName(supporters).distinct(), "mk_hash", "left_semi"
    )
    new_belief = belief_op.compute_belief(belief_scope, dirty_links, priors).join(
        dirty, "mk_hash", "left_semi"
    )
    old_belief = old_pa.select("mk_hash", "belief").join(dirty, "mk_hash", "left_anti")
    beliefs = old_belief.unionByName(
        new_belief.withColumn("belief", F.coalesce("belief", F.lit(0.0)))
    )
    merged_final = (
        merged_pa_base.join(beliefs, "mk_hash", "left")
        .withColumn("belief", F.coalesce("belief", F.lit(0.0)))
        .select(
            "mk_hash", "matches_key", "type", "subj", "obj", "mods",
            "ev_count", "src_counts", "belief", "agent_count",
        )
        .withColumn("bucket", F.pmod("mk_hash", F.lit(PA_BUCKETS)))
        # materialize BEFORE the overwrite below — the plan reads the very
        # pa_statements files the write deletes (read-overwrite-same-path)
        .localCheckpoint()
    )

    # 7. writes. Evidence is rewritten for affected hashes (kept rows ∪
    # the re-distilled affected rows): a version-bumped re-read supersedes
    # the url's old readings, so their evidence rows must leave the table
    # or ev_count and the hydrated evidence arrays diverge from a full
    # rebuild. The rewrite is PARTITION-SCOPED (the table is
    # day-partitioned per SURVEY §8.1): only days holding ≥1 affected-hash
    # row — plus days the re-distilled rows land in — are overwritten;
    # untouched day partitions keep their files byte-for-byte (tested).
    # At deployment scale the same op is an Iceberg MERGE/delete-files;
    # the shim's dynamic partition overwrite carries the same contract.
    # raw_statements stays append-only (the immutable log — distill
    # interprets versions on read).
    old_ev = storage.read_table(spark, path("evidence"))
    new_ev = dedup_op.build_evidence(distilled)
    aff_day_list = [
        r["day"]
        for r in old_ev.join(affected, "mk_hash", "left_semi")
        .select("day")
        .unionByName(new_ev.select("day"))
        .distinct()
        .collect()
    ]
    merged_evidence = (
        # static isin on the partition column — guaranteed partition
        # pruning at the scan (a broadcast-semi relies on runtime DPP),
        # and only the affected days' kept rows are ever rewritten
        old_ev.where(F.col("day").isin(aff_day_list))
        .join(affected, "mk_hash", "left_anti")
        .unionByName(new_ev)
        # USING joins move their keys first — re-pin the rebuild's order
        # (build_evidence's) so the manifest schema stays identical
        .select(*new_ev.columns)
        .localCheckpoint()  # plan reads the files the write replaces
    )
    # every incremental write is a FAST commit (no whole-table content
    # hash / footer recount in the manifest — those default extras are
    # O(corpus) per batch, the same defeat as dedup_store's; rebuilds via
    # run_pipeline keep them as determinism evidence)
    _scoped_overwrite(
        merged_evidence,
        path("evidence"),
        "day",
        aff_day_list,
        compute_signature=False,
        recount=False,
    )

    # pa_statements: bucket-scoped rewrite. A pa row changes only when
    # its hash is in the DIRTY set (affected content ∪ belief-dirty ⊇
    # affected), so only buckets holding a dirty hash are rewritten —
    # untouched bucket directories keep their files byte-for-byte, same
    # contract as the evidence days above. (Non-bucketed corpora are
    # rejected up front by _require_current_layout.)
    dirty_buckets = [
        r["b"]
        for r in dirty.select(
            F.pmod("mk_hash", F.lit(PA_BUCKETS)).alias("b")
        ).distinct().collect()
    ]
    _scoped_overwrite(
        merged_final.where(F.col("bucket").isin(dirty_buckets)),
        path("pa_statements"),
        "bucket",
        dirty_buckets,
        compute_signature=False,
        recount=False,
    )

    # pa_link: bucket-scoped on pmod(supported_mk_hash) — the changed
    # edge set is (removed ∪ added), both small-side by construction.
    #
    # CRASH WINDOW (the in-flight marker below): every table except
    # pa_groups is ROW-LOCAL — after a crash mid-write, each row on disk
    # is either its pre- or post-batch version and the retry's anti-join/
    # union merges heal it row by row. pa_groups rows are NOT independent
    # (labels couple a whole component), and worse, the incremental seed
    # below derives its dirty region from the DIFF against pa_link: a
    # retry after a crash between the pa_link overwrite and the pa_groups
    # overwrite sees an empty diff (pa_link already merged), misses the
    # merge region, and permanently splits components that a rebuild
    # would join. So the two coupled writes are bracketed by a marker
    # file: written before the pa_link overwrite, removed after the
    # pa_groups overwrite. A retry that finds the marker falls back to
    # the self-healing FULL CC recompute + full pa_groups overwrite
    # (exactly the pre-r5 per-batch behavior — paid only on crash
    # recovery), which is correct against ANY mixed pa_link/pa_groups
    # disk state because it reads only the recomputed in-memory
    # merged_link_b.
    inflight_marker = f"{out_dir}/_supplement_inflight.json"
    groups_need_full_cc = os.path.exists(inflight_marker)
    link_cols = ["supported_mk_hash", "supporting_mk_hash"]
    merged_link_b = merged_link.select(*link_cols).withColumn(
        "bucket", F.pmod("supported_mk_hash", F.lit(PA_BUCKETS))
    ).localCheckpoint()
    # removed/added are consumed again AFTER pa_link is overwritten below
    # (the pa_groups touched-set union) — materialize them now, while the
    # old pa_link files they read still exist. Both are small by
    # construction (the batch's changed edge set).
    removed = old_link.join(
        merged_link.select(*link_cols), link_cols, "left_anti"
    ).localCheckpoint()
    added = merged_link.select(*link_cols).join(
        old_link, link_cols, "left_anti"
    ).localCheckpoint()
    link_buckets = [
        r["b"]
        for r in removed.unionByName(added)
        .select(F.pmod("supported_mk_hash", F.lit(PA_BUCKETS)).alias("b"))
        .distinct()
        .collect()
    ]
    storage._write_json_atomic(
        inflight_marker,
        {"stage": "pa_link+pa_groups", "batch_days": sorted(batch_days)},
    )
    _scoped_overwrite(
        merged_link_b.where(F.col("bucket").isin(link_buckets)),
        path("pa_link"),
        "bucket",
        link_buckets,
        compute_signature=False,
        recount=False,
    )

    # pa_groups: INCREMENTAL connected components (VERDICT r4 #2 — this
    # was the last full-corpus CC + full rewrite per batch). Old labels
    # partition the graph, and a supplement only adds nodes and
    # adds/removes edges INCIDENT TO AFFECTED hashes (links_*_aff put the
    # affected set on one side; kept_links removes exactly the
    # affected-incident old edges) — so a component's labeling can change
    # only if it contains an affected hash or an endpoint of an
    # added/removed edge. Seed from the prior labels:
    #   1. touched nodes = affected ∪ endpoints(added ∪ removed edges);
    #   2. dirty components = their old labels;
    #   3. region = every member of a dirty component ∪ touched (new
    #      hashes have no old label). The region is edge-closed: an added
    #      edge's endpoints are touched, and a kept old edge with one end
    #      in a dirty component has its other end in the SAME component.
    #   4. run the iterative CC on the region-induced subgraph of the
    #      merged edge set only; survivors outside any edge keep
    #      self-labels.
    # Labels are min-member ids, and dirty-region membership is identical
    # to the full CC's (components merge/split only through the region),
    # so the result equals assign_components on the full merged corpus —
    # property-tested in tests/test_supplement.py. Untouched components'
    # rows are kept byte-identical: the table is bucket-partitioned by
    # pmod(mk_hash) (layout guard above) and only buckets holding a
    # region member are rewritten. The CC iterations now cost
    # O(dirty region), not O(corpus); the remaining corpus-order work is
    # three single-pass joins against pa_groups (two longs per row).
    if groups_need_full_cc:
        # a prior attempt crashed inside the marker-bracketed window: the
        # on-disk pa_link/pa_groups may be any per-partition mix of pre-
        # and post-batch state, so the diff-seeded incremental path below
        # is unsound — recompute the labels from scratch off the
        # deterministic in-memory merge (self-healing, full overwrite)
        groups_full = (
            assign_components(merged_final, merged_link_b.select(*link_cols))
            .withColumn("bucket", F.pmod("mk_hash", F.lit(PA_BUCKETS)))
            .localCheckpoint()  # plan reads the pa_link/pa_groups files
        )
        # scoped overwrite across (disk ∪ frame) buckets, NOT a static
        # mode="overwrite": static overwrite deletes the whole directory
        # — manifest included — before the job commits, so a crash DURING
        # recovery would make the next attempt fail _require_current_layout
        # ("rebuild the corpus") even though pa_groups is fully
        # re-derivable. Dynamic per-partition replacement keeps the
        # manifest and untouched partitions alive through any crash, and
        # the marker (still present) routes every retry back here.
        disk_buckets = {
            int(name.split("=", 1)[1])
            for name in os.listdir(f"{out_dir}/pa_groups")
            if name.startswith("bucket=")
        }
        frame_buckets = {
            r["bucket"] for r in groups_full.select("bucket").distinct().collect()
        }
        _scoped_overwrite(
            groups_full,
            path("pa_groups"),
            "bucket",
            sorted(disk_buckets | frame_buckets),
            compute_signature=False,
            recount=False,
        )
        return _finish_supplement(spark, path, inflight_marker, new_raw)

    old_groups = storage.read_table(spark, path("pa_groups")).drop("bucket")
    _ends = lambda df, side: df.select(F.col(side).alias("mk_hash"))
    touched = (
        affected
        .unionByName(_ends(added, "supported_mk_hash"))
        .unionByName(_ends(added, "supporting_mk_hash"))
        .unionByName(_ends(removed, "supported_mk_hash"))
        .unionByName(_ends(removed, "supporting_mk_hash"))
        .distinct()
    )
    dirty_comps = (
        old_groups.join(touched, "mk_hash", "left_semi")
        .select("component_id")
        .distinct()
    )
    region = (
        old_groups.join(dirty_comps, "component_id", "left_semi")
        .select("mk_hash")
        .unionByName(touched)  # new hashes, absent from old_groups
        .distinct()
        .localCheckpoint()
    )
    sub_edges = merged_link_b.select(*link_cols).join(
        region.withColumnRenamed("mk_hash", "supported_mk_hash"),
        "supported_mk_hash",
        "left_semi",
    )
    cc_region = connected_components(sub_edges)
    region_labels = (
        merged_final.select("mk_hash")
        .join(region, "mk_hash", "left_semi")  # only SURVIVING region nodes
        .join(cc_region, "mk_hash", "left")
        .select(
            "mk_hash",
            F.coalesce("component_id", "mk_hash").alias("component_id"),
        )
    )
    group_buckets = [
        r["b"]
        for r in region.select(
            F.pmod("mk_hash", F.lit(PA_BUCKETS)).alias("b")
        ).distinct().collect()
    ]
    if group_buckets:
        # kept rows are only ever REWRITTEN inside group_buckets, so the
        # kept-side read is partition-pruned to those buckets (static
        # isin on the partition column). This drops one of the three
        # corpus-order pa_groups scans the r5 incremental CC left: only
        # the dirty-component member lookup and the touched-label lookup
        # still scan the full two-longs-per-row table.
        kept_in_region_buckets = (
            storage.read_table(spark, path("pa_groups"))
            .where(F.col("bucket").isin(group_buckets))
            .drop("bucket")
        )
        kept_groups = kept_in_region_buckets.join(
            dirty_comps, "component_id", "left_anti"
        )
        scoped_groups = (
            kept_groups.unionByName(region_labels)
            # a USING anti-join moves its key FIRST (component_id, mk_hash)
            # — re-pin the rebuild's column order or the supplement's
            # manifest schema silently diverges from run_pipeline's
            # (every row is already inside group_buckets: the kept read
            # is partition-pruned to them and region_labels ⊆ region,
            # whose pmod defined group_buckets)
            .select("mk_hash", "component_id")
            .withColumn("bucket", F.pmod("mk_hash", F.lit(PA_BUCKETS)))
            # plan reads the very pa_groups files the write replaces
            .localCheckpoint()
        )
        _scoped_overwrite(
            scoped_groups, path("pa_groups"), "bucket", group_buckets,
            compute_signature=False, recount=False,
        )
    return _finish_supplement(spark, path, inflight_marker, new_raw)


def _finish_supplement(spark, path, inflight_marker: str, new_raw: DataFrame):
    """Marker removal, commit-point raw append, read-back — shared by the
    incremental pa_groups path and the crash-recovery full-CC path."""
    # the coupled pa_link+pa_groups writes are complete and mutually
    # consistent — the next attempt may diff-seed again
    if os.path.exists(inflight_marker):
        os.remove(inflight_marker)
    # The raw append is the COMMIT POINT and therefore the LAST write: a
    # retry decides "is this batch already in?" via the raw_id anti-join,
    # so raw must only contain the batch once every derived table does. A
    # crash anywhere above leaves raw without the batch → the retry
    # re-derives everything (deterministically); appending raw first would
    # make that same retry a silent no-op with stale derived tables.
    storage.write_table(
        new_raw.withColumn("day", F.date_format("warc_ts", "yyyy-MM-dd")),
        path("raw_statements"),
        ["day"],
        mode="append",
        compute_signature=False,  # append row_count still accumulates O(1)
        sort_by=["url"],  # keep appended files row-group-skippable too
    )

    return {
        "pa_statements": storage.read_table(spark, path("pa_statements")),
        "pa_link": storage.read_table(spark, path("pa_link")),
        "evidence": storage.read_table(spark, path("evidence")),
        "raw_statements": storage.read_table(spark, path("raw_statements")),
        "pa_groups": storage.read_table(spark, path("pa_groups")),
    }
