"""Hypothesis property tests for the deterministic kernels (FIXTURES.md
§A6 'property fixtures'). These run the PYTHON twins exhaustively (fast,
no Spark); the SQL==Python equivalence is pinned separately in
tests/test_hashing.py on sampled inputs."""

from hypothesis import given, settings, strategies as st

from indra_db_spark.functions.extract_html import extract_text_py
from indra_db_spark.functions.hashing import fold_md5_64_py, matches_key_py
from indra_db_spark.functions.textnorm import normalize_text_py

text = st.text(min_size=0, max_size=200)
key = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Nd")), min_size=1, max_size=12
).map(lambda s: f"HGNC:{s}")


@given(text)
@settings(max_examples=300)
def test_fold_is_signed_64(s):
    h = fold_md5_64_py(s)
    assert -(1 << 63) <= h <= (1 << 63) - 1


@given(text, text)
@settings(max_examples=200)
def test_fold_injective_on_distinct_inputs_practically(a, b):
    if a != b:
        # md5 collision chance negligible; equality must track input equality
        assert fold_md5_64_py(a) != fold_md5_64_py(b) or a == b
    else:
        assert fold_md5_64_py(a) == fold_md5_64_py(b)


@given(key, key)
@settings(max_examples=200)
def test_complex_symmetry(k1, k2):
    assert matches_key_py("Complex", k1, k2) == matches_key_py("Complex", k2, k1)


@given(key, key, st.permutations([("phosphorylation", "S", "15"), ("phosphorylation", "T", "308"), ("phosphorylation", "Y", "473")]))
@settings(max_examples=100)
def test_mods_order_invariance(k1, k2, mods):
    base = matches_key_py("Phosphorylation", k1, k2, mods)
    assert base == matches_key_py(
        "Phosphorylation", k1, k2, sorted(mods)
    )


@given(
    key,
    st.permutations(
        [("HGNC:1", True), ("HGNC:2", False), ("CHEBI:9", True)]
    ),
)
@settings(max_examples=100)
def test_bounds_order_invariance(k, bounds):
    """BoundCondition listing order never splits agent keys (sorted fold,
    r3), and each (entity, polarity) fold is distinct."""
    from indra_db_spark.functions.hashing import agent_key_py

    assert agent_key_py(k, bounds=list(bounds)) == agent_key_py(
        k, bounds=sorted(bounds)
    )
    assert agent_key_py(k, bounds=[("HGNC:1", True)]) != agent_key_py(
        k, bounds=[("HGNC:1", False)]
    )
    assert agent_key_py(k, bounds=[("HGNC:1", True)]) != agent_key_py(k)


@given(text)
@settings(max_examples=300)
def test_normalize_idempotent(s):
    n = normalize_text_py(s)
    assert normalize_text_py(n) == n
    assert all(c.islower() or c.isdigit() or c == "_" for c in n)


@given(text)
@settings(max_examples=200)
def test_extract_idempotent_on_plain_text(s):
    # text with no tags survives a second extraction byte-identically
    out = extract_text_py(s)
    if out is not None and "<" not in out:
        assert extract_text_py(out) == out


@given(st.lists(st.text(alphabet="ab <>/scriptstyle\n\t.", max_size=30), max_size=5))
@settings(max_examples=200)
def test_extract_deterministic(parts):
    html = ("<html><body>" + "".join(parts) + "</body></html>").encode("utf-8")
    assert extract_text_py(html) == extract_text_py(html)