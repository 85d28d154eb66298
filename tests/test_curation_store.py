"""Curation store + DSL flagging — mirrors the reference's
client/principal/curation.py submit/list/filter behavior
(principal_schema.py::Curation)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from indra_db_spark import schemas
from indra_db_spark.operators.curation import (
    curation_flags,
    list_curations,
    submit_curations,
)
from indra_db_spark.plans.query import (
    HasCuration,
    HasType,
    NotFlaggedIncorrect,
    QueryContext,
)


def _pa(spark):
    row = lambda mk, typ: (
        mk, f"{typ}(HGNC:1, HGNC:{mk})", typ,
        ("HGNC", "1", "A", [], None, []), ("HGNC", str(mk), "B", [], None, []),
        [], 1, {"src0": 1}, 0.5, 2,
    )
    return spark.createDataFrame(
        [row(1, "Activation"), row(2, "Activation"), row(3, "Inhibition")],
        schemas.PA_STATEMENTS,
    )


@pytest.fixture(scope="module")
def store(spark):
    path = tempfile.mkdtemp(prefix="kg_cur_") + "/curations"
    rows = [
        (1, 101, "correct", "looks right", "alice", "2024-02-01"),
        (1, 102, "grounding", "bad grounding", "bob", "2024-02-02"),
        (2, 201, "wrong_relation", "reversed", "alice", "2024-02-03"),
        (2, 202, "polarity", "sign flipped", "bob", "2024-02-04"),
    ]
    submit_curations(spark, path, rows)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_submit_is_idempotent_and_appends(spark, store):
    before = list_curations(spark, store).count()
    assert before == 4
    # re-submitting the identical curation is a no-op (deterministic id)
    submit_curations(
        spark, store, [(1, 101, "correct", "looks right", "alice", "2024-02-01")]
    )
    assert list_curations(spark, store).count() == before
    # a genuinely new curation appends
    submit_curations(
        spark, store, [(3, 301, "correct", "ok", "carol", "2024-02-05")]
    )
    assert list_curations(spark, store).count() == before + 1


def test_list_filters_conjunctive(spark, store):
    assert list_curations(spark, store, pa_hash=1).count() == 2
    assert list_curations(spark, store, pa_hash=1, curator="bob").count() == 1
    got = list_curations(spark, store, tag="wrong_relation").collect()
    assert len(got) == 1 and got[0]["pa_hash"] == 2
    assert list_curations(spark, store, pa_hash=1, source_hash=101).count() == 1


def test_unknown_tag_rejected(spark, store):
    with pytest.raises(ValueError):
        submit_curations(spark, store, [(9, 901, "nonsense", "", "x", "2024-01-01")])


def test_flags_and_dsl(spark, store):
    cur = list_curations(spark, store)
    flags = {r["mk_hash"]: r for r in curation_flags(cur).collect()}
    # stmt 1: correct + incorrect → NOT flagged (correct overrides)
    assert not flags[1]["is_flagged"]
    # stmt 2: two incorrect, no correct → flagged
    assert flags[2]["is_flagged"]

    ctx = QueryContext(
        pa_statements=_pa(spark),
        evidence=spark.createDataFrame([], schemas.EVIDENCE),
        curations=cur,
    )
    hashes = lambda q: {r["mk_hash"] for r in q.hashes(ctx).collect()}
    assert hashes(HasCuration()) == {1, 2, 3}
    assert hashes(HasCuration(tags=["correct"])) == {1, 3}
    assert hashes(HasCuration(curators=["bob"])) == {1, 2}
    assert hashes(NotFlaggedIncorrect()) == {1, 3}
    # composes with other leaves: serving filter drops curated-wrong stmts
    assert hashes(HasType(["Activation"]) & NotFlaggedIncorrect()) == {1}


def test_null_field_positions_do_not_collide(spark, tmp_path):
    """Review r2: concat_ws silently skips nulls — two curations that
    differ only in WHICH nullable field is null must get distinct ids."""
    from indra_db_spark.operators.curation import submit_curations

    path = str(tmp_path / "cur")
    rows = [
        (1, 101, "other", None, "bob", "2024"),
        (1, 101, "other", "bob", "2024", None),
    ]
    out = submit_curations(spark, path, rows)
    assert out.select("curation_id").distinct().count() == 2
