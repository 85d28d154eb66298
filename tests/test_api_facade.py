"""Serving facade: HTTP-style params -> DSL Query -> hydrated statements
([P] rest_api/api.py parsing semantics, framework-free)."""

import pytest
from pyspark.sql import functions as F

from indra_db_spark import schemas
from indra_db_spark.api import parse_query, run_query
from indra_db_spark.operators.dedup import build_pa_statements
from indra_db_spark.operators.dedup import build_evidence
from indra_db_spark.operators.distill import distill
from indra_db_spark.operators.extract import extract_statements
from indra_db_spark.operators.grounding import ground_statements
from indra_db_spark.plans.query import (
    HasAgent,
    HasType,
    Not,
    QueryContext,
)
from indra_db_spark.sources import dims
from indra_db_spark.sources.synth import (
    source_expr as synth_source_expr,
    synth_pages,
)


@pytest.fixture(scope="module")
def ctx(spark):
    pages = synth_pages(spark, 200, seed=42)
    raw = distill(
        ground_statements(
            extract_statements(pages),
            dims.grounding_map_df(spark),
            source_expr=synth_source_expr,
        )
    )
    pa = build_pa_statements(raw).withColumn("belief", F.lit(0.5)).select(
        *[f.name for f in schemas.PA_STATEMENTS.fields]
    )
    return QueryContext(
        pa_statements=pa.cache(), evidence=build_evidence(raw).cache()
    )


def _hashes(q, ctx):
    return {r["mk_hash"] for r in q.hashes(ctx).collect()}


def test_entity_specs_and_equivalence(ctx):
    # name form == hand-built DSL
    got = _hashes(parse_query({"subject": "TP53"}), ctx)
    want = _hashes(HasAgent(name="TP53", role="SUBJECT"), ctx)
    assert got == want and got
    # grounding form db_id@NS
    got_g = _hashes(parse_query({"subject": "11998@HGNC"}), ctx)
    want_g = _hashes(
        HasAgent(db_id="11998", namespace="HGNC", role="SUBJECT"), ctx
    )
    assert got_g == want_g and got_g


def test_conjunction_negation_and_type(ctx):
    q = parse_query(
        {"subject": "TP53", "type": "Activation", "object": "MDM2!"}
    )
    want = _hashes(
        HasAgent(name="TP53", role="SUBJECT")
        & HasType(["Activation"])
        & Not(HasAgent(name="MDM2", role="OBJECT")),
        ctx,
    )
    assert _hashes(q, ctx) == want
    # subclass closure grows (or equals) the exact-type set
    narrow = _hashes(parse_query({"type": "Phosphorylation"}), ctx)
    wide = _hashes(
        parse_query({"type": "Modification", "type_subclasses": "true"}), ctx
    )
    assert narrow and narrow <= wide


def test_run_query_result_controls(ctx):
    rows = run_query(
        {"agent": "TP53", "limit": 5, "ev_limit": 2, "sort_by": "ev_count"},
        ctx,
    ).collect()
    assert 0 < len(rows) <= 5
    assert all(len(r["evidences"]) <= 2 for r in rows)
    evs = [r["ev_count"] for r in rows]
    assert evs == sorted(evs, reverse=True)


def test_rejects_unknown_and_empty():
    with pytest.raises(ValueError, match="unknown"):
        parse_query({"subjct": "TP53"})
    with pytest.raises(ValueError, match="empty"):
        parse_query({})


def test_rejects_bad_sort_by(ctx):
    """sort_by is validated at parse time like every other param — a bad
    column must be a ValueError, not an AnalysisException from deep
    inside get_statements (ADVICE r2)."""
    with pytest.raises(ValueError, match="sort_by"):
        run_query({"agent": "TP53", "sort_by": "subj"}, ctx)
    # belief remains a legal sort column
    rows = run_query({"agent": "TP53", "sort_by": "belief", "limit": 3}, ctx).collect()
    beliefs = [r["belief"] for r in rows]
    assert beliefs == sorted(beliefs, reverse=True)


def test_after_cursor_string_form(ctx):
    """HTTP string cursor "sort,hash" parses and pages correctly."""
    page1 = run_query({"agent": "TP53", "limit": 3}, ctx).collect()
    last = page1[-1]
    page2 = run_query(
        {"agent": "TP53", "limit": 3,
         "after": f"{last['ev_count']},{last['mk_hash']}"},
        ctx,
    ).collect()
    ids1 = {r["mk_hash"] for r in page1}
    assert page2 and not ({r["mk_hash"] for r in page2} & ids1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="after"):
        run_query({"agent": "TP53", "after": "5"}, ctx)
