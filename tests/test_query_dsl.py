"""Query DSL semantics — mirrors the reference's tests/test_query.py
pattern: build a tiny corpus, assert the exact hash set per query,
compose with & | ~."""

import pytest
from pyspark.sql import functions as F

from indra_db_spark import schemas
from indra_db_spark.operators.dedup import build_evidence, build_pa_statements
from indra_db_spark.operators.distill import distill
from indra_db_spark.operators.extract import extract_statements
from indra_db_spark.operators.grounding import ground_statements
from indra_db_spark.plans.query import (
    EmptyQuery,
    FromPapers,
    HasAgent,
    HasDatabases,
    HasHash,
    HasNumEvidence,
    HasOnlySource,
    HasReadings,
    HasSources,
    HasType,
    QueryContext,
    type_closure,
)
from indra_db_spark.sources import dims
from indra_db_spark.sources.knowledgebase import load_knowledgebase
from indra_db_spark.sources.synth import source_expr as synth_source_expr, synth_pages


@pytest.fixture(scope="module")
def ctx(spark):
    pages = synth_pages(spark, 300, seed=42)
    raw = distill(
        ground_statements(extract_statements(pages), dims.grounding_map_df(spark),
                          source_expr=synth_source_expr)
    )
    kb = load_knowledgebase(
        spark,
        "signor",
        [
            ("Activation", "HGNC", "11998", "TP53", "HGNC", "10001", "MDM2"),
            ("Inhibition", "HGNC", "9999", "NEWGENE", "HGNC", "10001", "MDM2"),
        ],
    )
    raw = raw.unionByName(kb)
    pa = build_pa_statements(raw)
    # no belief stage needed for DSL tests; fill the column
    pa = pa.withColumn("belief", F.lit(0.5)).select(
        *[f.name for f in schemas.PA_STATEMENTS.fields]
    )
    ev = build_evidence(raw)
    return QueryContext(pa_statements=pa.cache(), evidence=ev.cache())


def _hashes(q, ctx):
    return {r["mk_hash"] for r in q.hashes(ctx).collect()}


def test_has_agent_by_grounding(ctx):
    got = _hashes(HasAgent(namespace="HGNC", db_id="11998"), ctx)
    want = {
        r["mk_hash"]
        for r in ctx.pa_statements.where(
            (F.col("subj.db_ns") == "HGNC") & (F.col("subj.db_id") == "11998")
            | (F.col("obj.db_ns") == "HGNC") & (F.col("obj.db_id") == "11998")
        ).collect()
    }
    assert got == want and got


def test_has_agent_role(ctx):
    subj_only = _hashes(HasAgent(name="TP53", role="SUBJECT"), ctx)
    any_role = _hashes(HasAgent(name="TP53"), ctx)
    assert subj_only <= any_role


def test_has_type_and_closure(ctx):
    acts = _hashes(HasType(["Activation"]), ctx)
    regs = _hashes(HasType(["RegulateActivity"], include_subclasses=True), ctx)
    inhs = _hashes(HasType(["Inhibition"]), ctx)
    assert acts | inhs == regs
    assert set(type_closure(["Modification"])) >= {
        "Modification", "AddModification", "RemoveModification",
        "Phosphorylation", "Dephosphorylation", "Ubiquitination",
        "Acetylation", "Methylation",
    }  # extended vocabulary adds more (test_extended_type_closure)
    assert set(type_closure(["RemoveModification"])) >= {
        "RemoveModification", "Dephosphorylation",
    }
    assert set(type_closure(["RegulateAmount"])) == {
        "RegulateAmount", "IncreaseAmount", "DecreaseAmount",
    }
    everything = set(type_closure(["Statement"]))
    assert {
        "Activation", "Inhibition", "Complex", "Phosphorylation",
        "Dephosphorylation", "Ubiquitination", "Acetylation", "Methylation",
        "IncreaseAmount", "DecreaseAmount", "Gef", "Gap",
    } <= everything


def test_set_ops(ctx):
    a = HasAgent(namespace="HGNC", db_id="11998")
    t = HasType(["Activation"])
    got_and = _hashes(a & t, ctx)
    got_or = _hashes(a | t, ctx)
    sa, st = _hashes(a, ctx), _hashes(t, ctx)
    assert got_and == sa & st
    assert got_or == sa | st
    corpus = _hashes(EmptyQuery(), ctx)
    assert _hashes(~a, ctx) == corpus - sa
    # De Morgan
    assert _hashes(~(a | t), ctx) == _hashes(~a & ~t, ctx)


def test_get_statements_json_edge(ctx):
    """r3: the JSON serving boundary (G6 — typed structs internally,
    to_json only at the edge, the pa_statements.json payload analog):
    payload round-trips and honours ev_limit."""
    import json

    q = HasAgent(namespace="HGNC", db_id="11998")
    rows = q.get_statements_json(ctx, ev_limit=2, limit=3).collect()
    assert rows
    for r in rows:
        doc = json.loads(r["stmt_json"])
        assert {"matches_key", "type", "subj", "obj", "ev_count"} <= set(doc)
        assert len(doc.get("evidences") or []) <= 2
        # the JSON edge agrees with the typed edge on the same hash
        assert doc["matches_key"].startswith(doc["type"] + "(")


def test_has_agent_agent_num_validated(ctx):
    """r3: agent_num outside the binary model {0, 1} raises (schemas.py
    two-agent invariant) instead of silently matching nothing."""
    import pytest as _pytest

    assert _hashes(HasAgent(name="TP53", agent_num=0), ctx) == _hashes(
        HasAgent(name="TP53", role="SUBJECT"), ctx
    )
    with _pytest.raises(ValueError, match="agent_num"):
        _hashes(HasAgent(name="TP53", agent_num=2), ctx)


def test_empty_set_op_identities(ctx):
    """Union([]) is the empty SET (nothing matches); Intersection([]) is
    trivially true (everything matches) — duals, including under De
    Morgan: ~Union([]) == Intersection([]) (r2 VERDICT #2 regression)."""
    from indra_db_spark.plans.query import Intersection, Union

    corpus = _hashes(EmptyQuery(), ctx)
    assert _hashes(Union([]), ctx) == set()
    assert _hashes(Intersection([]), ctx) == corpus
    assert _hashes(~Union([]), ctx) == corpus
    assert _hashes(~Intersection([]), ctx) == set()


def test_has_hash_roundtrip(ctx):
    some = sorted(_hashes(HasType(["Complex"]), ctx))[:5]
    assert _hashes(HasHash(some), ctx) == set(some)


def test_sources_and_kb_flags(ctx):
    only_kb = _hashes(HasOnlySource("kb_signor"), ctx)
    has_kb = _hashes(HasSources(["kb_signor"]), ctx)
    dbs = _hashes(HasDatabases(), ctx)
    rds = _hashes(HasReadings(), ctx)
    assert only_kb <= has_kb <= dbs
    # the TP53-activates-MDM2 hub triple is both read and curated:
    both = has_kb & rds
    assert len(both) == 1
    # the never-read KB statement is db-only:
    assert len(only_kb) == 1
    corpus = _hashes(EmptyQuery(), ctx)
    assert rds | dbs == corpus


def test_has_num_evidence_and_from_papers(ctx):
    heavy = _hashes(HasNumEvidence(5), ctx)
    assert heavy  # hub triple has many evidences
    url = ctx.evidence.select("url").first()["url"]
    fp = _hashes(FromPapers([url]), ctx)
    want = {
        r["mk_hash"] for r in ctx.evidence.where(F.col("url") == url).collect()
    }
    assert fp == want


def test_get_statements_ev_limit_and_sort(ctx):
    q = HasAgent(namespace="HGNC", db_id="11998") & HasType(["Activation"])
    res = q.get_statements(ctx, ev_limit=3, sort_by="ev_count", limit=2).collect()
    assert len(res) <= 2
    assert all(len(r["evidences"]) <= 3 for r in res)
    if len(res) == 2:
        assert res[0]["ev_count"] >= res[1]["ev_count"]


def test_offset_pagination(ctx):
    q = EmptyQuery()
    page1 = q.get_statements(ctx, limit=5).collect()
    page2 = q.get_statements(ctx, limit=5, offset=5).collect()
    ids1 = {r["mk_hash"] for r in page1}
    ids2 = {r["mk_hash"] for r in page2}
    assert ids1.isdisjoint(ids2) and len(page2) == 5


def test_from_topics_and_ref_counts(spark, ctx):
    from indra_db_spark.operators.meta import build_topic_ref_counts
    from indra_db_spark.plans.query import FromTopics
    from indra_db_spark.sources.synth import (
        concept_rows,
        page_concepts,
        page_topics,
        topic_rows,
    )

    topics = page_topics(spark, 300, seed=42)
    concepts = page_concepts(spark, 300, seed=42)
    ctx2 = QueryContext(
        pa_statements=ctx.pa_statements,
        evidence=ctx.evidence,
        page_topics=topics,
        page_concepts=concepts,
    )
    some_topic = topics.first()["topic_id"]
    got = _hashes(FromTopics([some_topic]), ctx2)
    urls = {u for (u, t) in topic_rows(300) if t == some_topic}
    want = {
        r["mk_hash"]
        for r in ctx.evidence.where(F.col("url").isin(list(urls))).collect()
    }
    assert got == want and got

    # concept axis: C-prefixed ids dispatch to page_concepts (the
    # MeshTermMeta vs MeshConceptMeta split)
    some_concept = concepts.first()["topic_id"]
    got_c = _hashes(FromTopics([some_concept]), ctx2)
    c_urls = {u for (u, c) in concept_rows(300) if c == some_concept}
    want_c = {
        r["mk_hash"]
        for r in ctx.evidence.where(F.col("url").isin(list(c_urls))).collect()
    }
    assert got_c == want_c and got_c
    # mixed term+concept id list = union of both axes
    both = _hashes(FromTopics([some_topic, some_concept]), ctx2)
    assert both == got | got_c
    # concept ref counts reuse the same rollup (topic_num strips C too)
    crc = build_topic_ref_counts(concepts, ctx.evidence)
    crow = crc.where(F.col("topic_id") == some_concept).first()
    assert crow["topic_num"] == int(some_concept[1:])
    # the prefix survives alongside the number: T123 and C123 are distinct
    # topics, disambiguated by topic_kind (ADVICE r2)
    assert crow["topic_kind"] == "C"

    rc = build_topic_ref_counts(topics, ctx.evidence)
    row = rc.where(F.col("topic_id") == some_topic).first()
    # pages with no statements don't count into ref_count (evidence join)
    urls_with_ev = {
        r["url"] for r in ctx.evidence.select("url").distinct().collect()
    }
    assert row["ref_count"] == len(urls & urls_with_ev)
    assert row["topic_num"] == int(some_topic[1:])
    assert row["topic_kind"] == "T"


def test_result_modes(ctx):
    q = HasAgent(namespace="HGNC", db_id="11998")
    inter = q.get_interactions(ctx)
    rel = q.get_relations(ctx)
    ag = q.get_agents(ctx)
    n_hashes = len(_hashes(q, ctx))
    assert inter.count() == n_hashes
    assert rel.count() <= n_hashes
    assert ag.count() <= rel.count()
    # relation totals re-aggregate to interaction totals
    assert (
        rel.agg(F.sum("n_statements")).collect()[0][0] == n_hashes
    )
    row = ag.where(
        (F.col("subj_key") == "HGNC:11998") & (F.col("obj_key") == "HGNC:10001")
    ).first()
    assert row is not None and "Activation" in row["types"]


def test_keyset_pagination_equals_offset(ctx):
    """Keyset (after=...) pages reproduce exactly the offset pages, and
    full iteration via keyset yields the complete ordered result."""
    q = EmptyQuery()
    full = q.get_statements(ctx).orderBy(
        F.desc("ev_count"), F.asc("mk_hash")
    ).collect()
    # page through with keyset
    pages, after = [], None
    while True:
        page = q.get_statements(ctx, limit=7, after=after).collect()
        if not page:
            break
        pages.extend(page)
        last = page[-1]
        after = (last["ev_count"], last["mk_hash"])
    assert [(r["mk_hash"]) for r in pages] == [(r["mk_hash"]) for r in full]
    # and keyset page 2 == offset page 2
    off2 = q.get_statements(ctx, limit=7, offset=7).collect()
    p1 = q.get_statements(ctx, limit=7).collect()
    key2 = q.get_statements(
        ctx, limit=7, after=(p1[-1]["ev_count"], p1[-1]["mk_hash"])
    ).collect()
    assert [r["mk_hash"] for r in key2] == [r["mk_hash"] for r in off2]


def test_get_statements_hydration_is_selection_scoped(ctx):
    """The evidence aggregate must run AFTER a semi-join on the selected
    hashes — hydrating a limited page must not aggregate the full evidence
    table (scale guard: 10^9 evidence rows / 25 statements)."""
    q = HasType(["Activation"])
    df = q.get_statements(ctx, ev_limit=2, limit=5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the evidence side carries its own LeftSemi (statement side has one
    # too) — at least two semi joins in the optimized plan
    assert plan.count("LeftSemi") >= 2, plan
    # results identical to the unscoped reference formulation
    ref_ev = ctx.evidence.join(df.select("mk_hash"), "mk_hash", "left_semi")
    got = {
        (r["mk_hash"], frozenset(e["raw_id"] for e in r["evidences"]))
        for r in df.collect()
    }
    # recompute expected evidences per selected hash from the raw table
    # (best-first: longest evidence_text, raw_id tiebreak)
    import collections
    ev_by_hash = collections.defaultdict(list)
    for r in ref_ev.collect():
        ev_by_hash[r["mk_hash"]].append(
            (-len(r["evidence_text"] or ""), r["raw_id"])
        )
    want = {
        (mk, frozenset(rid for _, rid in sorted(v)[:2]))
        for mk, v in ev_by_hash.items()
    }
    assert got == want


def test_ev_limit_keeps_best_evidence_first(ctx):
    """ev_limit truncation keeps the richest (longest-text) evidence."""
    q = HasNumEvidence(3)
    res = q.get_statements(ctx, ev_limit=2).collect()
    assert res
    full = {
        r["mk_hash"]: sorted(
            ((e["raw_id"], len(e["evidence_text"] or "")) for e in r["evidences"]),
        )
        for r in q.get_statements(ctx).collect()
    }
    for r in res:
        assert len(r["evidences"]) <= 2
        kept = {e["raw_id"] for e in r["evidences"]}
        ranked = sorted(
            full[r["mk_hash"]], key=lambda t: (-t[1], t[0])
        )[: len(kept)]
        assert kept == {rid for rid, _ in ranked}


def test_extended_type_closure():
    from indra_db_spark.plans.query import TYPE_PARENTS, type_closure

    # every concrete type resolves to Statement through the hierarchy
    for t in TYPE_PARENTS:
        cur = t
        seen = set()
        while cur in TYPE_PARENTS:
            assert cur not in seen, f"cycle at {cur}"
            seen.add(cur)
            cur = TYPE_PARENTS[cur]
        assert cur == "Statement"
    # phospho family closure includes auto/trans variants
    assert set(type_closure(["Phosphorylation"])) == {
        "Phosphorylation", "Autophosphorylation", "Transphosphorylation",
    }
    assert "Sumoylation" in type_closure(["AddModification"])
    assert "Desumoylation" in type_closure(["RemoveModification"])
