"""Hash stability & canonicalization properties (FIXTURES.md §A6).

The SQL column expression and the Python twin must agree exactly —
the twin generates golden fixtures, the expression runs at scale.
"""

import random
import string

from pyspark.sql import functions as F

from indra_db_spark.functions.hashing import (
    fold_md5_64,
    fold_md5_64_py,
    matches_key_py,
)
from indra_db_spark.functions.textnorm import normalize_text_expr, normalize_text_py


def test_fold_md5_64_sql_equals_python(spark):
    rng = random.Random(42)
    strings = [
        "".join(rng.choices(string.printable[:95], k=rng.randint(0, 80)))
        for _ in range(1000)
    ] + ["", "a", "Activation(HGNC:11998, HGNC:10001)"]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", fold_md5_64(F.col("s")).alias("h")).collect()
    }
    for s in strings:
        assert got[s] == fold_md5_64_py(s), repr(s)


def test_fold_md5_64_signed_range():
    lo, hi = -(1 << 63), (1 << 63) - 1
    seen_neg = seen_pos = False
    for i in range(500):
        h = fold_md5_64_py(f"probe{i}")
        assert lo <= h <= hi
        seen_neg |= h < 0
        seen_pos |= h > 0
    assert seen_neg and seen_pos  # the sign fold actually exercises both halves


def test_normalize_text_sql_equals_python(spark):
    texts = ["TP53GEN", "Hello, World!", "  a--b__c  ", "MIXED case 42", "", "___"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {
        r["t"]: r["n"]
        for r in df.select("t", normalize_text_expr(F.col("t")).alias("n")).collect()
    }
    for t in texts:
        assert got[t] == normalize_text_py(t), repr(t)


def test_matches_key_complex_symmetric():
    a = matches_key_py("Complex", "HGNC:1", "HGNC:2")
    b = matches_key_py("Complex", "HGNC:2", "HGNC:1")
    assert a == b == "Complex(HGNC:1, HGNC:2)"
    # non-Complex is directional
    assert matches_key_py("Activation", "HGNC:1", "HGNC:2") != matches_key_py(
        "Activation", "HGNC:2", "HGNC:1"
    )


def test_matches_key_mods_sorted():
    a = matches_key_py(
        "Phosphorylation", "HGNC:1", "HGNC:2",
        [("phosphorylation", "S", "15"), ("phosphorylation", "T", "308")],
    )
    b = matches_key_py(
        "Phosphorylation", "HGNC:1", "HGNC:2",
        [("phosphorylation", "T", "308"), ("phosphorylation", "S", "15")],
    )
    assert a == b


def test_null_agent_keys_do_not_collapse(spark):
    """Review r3: Type(A, null) and Type(null, A) must hash differently
    (concat_ws skips nulls — the keys coalesce to '' first)."""
    from indra_db_spark.functions.hashing import matches_key_expr

    agent = (
        "struct<db_ns:string,db_id:string,"
        "muts:array<struct<position:string,residue_from:string,residue_to:string>>,"
        "activity:struct<activity_type:string,is_active:boolean>,"
        "bounds:array<struct<db_ns:string,db_id:string,name:string,is_bound:boolean>>>"
    )
    df = spark.createDataFrame(
        [("Activation", ("HGNC", "1", [], None, []), None),
         ("Activation", None, ("HGNC", "1", [], None, []))],
        f"type string, subj {agent}, obj {agent}",
    )
    keys = [
        r["k"] for r in df.select(
            matches_key_expr(
                F.col("type"), F.col("subj"), F.col("obj"),
                F.array().cast("array<struct<mod_type:string,residue:string,position:string>>"),
            ).alias("k")
        ).collect()
    ]
    assert keys[0] == "Activation(HGNC:1, )"
    assert keys[1] == "Activation(, HGNC:1)"
    assert keys[0] != keys[1]
