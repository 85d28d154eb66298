"""Stdlib HTTP binding over the serving facade ([P] rest_api/api.py's
Flask layer, re-expressed framework-free): real sockets end-to-end, plus
the pure route handler for error paths."""

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from indra_db_spark import schemas
from indra_db_spark.api import run_query
from indra_db_spark.operators.dedup import build_evidence, build_pa_statements
from indra_db_spark.operators.distill import distill
from indra_db_spark.operators.extract import extract_statements
from indra_db_spark.operators.grounding import ground_statements
from indra_db_spark.plans.query import QueryContext
from indra_db_spark.server import handle_request, serve_background
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


@pytest.fixture(scope="module")
def base_url(ctx):
    server, _ = serve_background(ctx)
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get_err(url):
    try:
        urllib.request.urlopen(url, timeout=120)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError(f"expected HTTP error for {url}")


def test_http_statements_match_run_query(base_url, ctx):
    status, rows = _get(f"{base_url}/statements?agent=TP53&limit=5")
    assert status == 200 and 0 < len(rows) <= 5
    want = {
        r["mk_hash"]
        for r in run_query({"agent": "TP53", "limit": 5}, ctx).collect()
    }
    assert {r["mk_hash"] for r in rows} == want
    # hydrated shape survives the JSON edge
    assert all("evidences" in r and "matches_key" in r for r in rows)


def test_http_statements_json_edge(base_url):
    status, rows = _get(f"{base_url}/statements/json?agent=TP53&limit=3")
    assert status == 200 and rows
    stmt = json.loads(rows[0]["stmt_json"])
    assert stmt["type"] and stmt["subj"]["db_ns"]


def test_http_result_grains_and_conjunction(base_url):
    for grain, key in (
        ("interactions", "subj_key"),
        ("relations", "n_statements"),
        ("agents", "types"),
    ):
        status, rows = _get(f"{base_url}/{grain}?agent=TP53")
        assert status == 200 and rows and key in rows[0], grain
    # repeated param → conjunctive leaves (both agents must appear)
    status, rows = _get(f"{base_url}/interactions?agent=TP53&agent=MDM2")
    assert status == 200
    for r in rows:
        keys = {r["subj_key"], r["obj_key"]}
        assert any("11998" in k for k in keys) and any(
            "10001" in k for k in keys
        )


def test_http_health_and_errors(base_url):
    assert _get(f"{base_url}/health") == (200, {"status": "ok"})
    code, body = _get_err(f"{base_url}/statements?bogus=1")
    assert code == 400 and "bogus" in body["error"]
    code, body = _get_err(f"{base_url}/statements")  # unconstrained dump
    assert code == 400 and "empty query" in body["error"]
    code, _ = _get_err(f"{base_url}/nope?agent=TP53")
    assert code == 404
    code, body = _get_err(f"{base_url}/statements?agent=TP53&sort_by=subj")
    assert code == 400 and "sort_by" in body["error"]


def test_handler_limit_caps(ctx):
    code, body = handle_request("/statements?agent=TP53&limit=0", ctx)
    assert code == 400 and b"limit" in body
    code, body = handle_request("/statements?agent=TP53&limit=999999", ctx)
    assert code == 400 and b"limit" in body
    code, body = handle_request("/agents?agent=TP53&limit=1", ctx)
    assert code == 200 and len(json.loads(body)) <= 1


def test_non_statement_routes_reject_result_params(ctx):
    """ADVICE r5 (low): /interactions, /relations and /agents apply only
    `limit`; other result-control params used to be silently ignored
    (offset=100 returned the first page with 200). They must 400."""
    for route in ("interactions", "relations", "agents"):
        code, body = handle_request(f"/{route}?agent=TP53&offset=100", ctx)
        assert code == 400 and b"offset" in body, (route, code, body)
    code, body = handle_request("/interactions?agent=TP53&ev_limit=2", ctx)
    assert code == 400 and b"ev_limit" in body
    # limit itself still works
    code, body = handle_request("/interactions?agent=TP53&limit=1", ctx)
    assert code == 200
