"""Text extraction byte-identity + reader-grammar units (FIXTURES.md §A6)."""

from pyspark.sql import functions as F

from indra_db_spark.functions.extract_html import extract_text_py, extract_text_series
from indra_db_spark.operators.extract import extract_mentions, extract_statements
from indra_db_spark.sources.synth import pages_pandas, synth_pages

import pandas as pd


def test_extractor_spec():
    html = (
        b"<html><head><script>var x = 1 < 2;</script><style>p{}</style></head>"
        b"<body>\n<p>A  activates\tB.</p>\r\n<div> C binds D. </div>\n\n</body></html>"
    )
    assert extract_text_py(html) == "A activates B.\nC binds D."


def test_extract_series_equals_scalar():
    pdf = pages_pandas(80, seed=42)
    got = extract_text_series(pdf["html"]).tolist()
    want = [extract_text_py(h) for h in pdf["html"]]
    assert got == want


def test_text_column_matches_extraction():
    # The per-row invariant: stored text == extract(html), byte-identical.
    pdf = pages_pandas(120, seed=42)
    for h, t in zip(pdf["html"], pdf["text"]):
        if t is not None:
            assert extract_text_py(h) == t


def test_extraction_parallelism_invariant(spark):
    """Same pages at 1 vs 8 partitions → identical extracted rows."""
    a = synth_pages(spark, 150, partitions=1)
    b = synth_pages(spark, 150, partitions=8)
    cols = ["url", "sent_idx", "start", "type", "subj_text", "obj_text"]
    ra = sorted(map(tuple, extract_statements(a).select(*cols).collect()))
    rb = sorted(map(tuple, extract_statements(b).select(*cols).collect()))
    assert ra == rb and len(ra) > 0


def test_statement_grammar(spark):
    pdf = pd.DataFrame(
        {
            "url": ["u1"],
            "warc_ts": [pd.Timestamp("2024-01-01")],
            "html": [None],
            "text": [
                "TP53GEN activates MDM2GEN. EGFRGEN phosphorylates AKT1GEN on T308. "
                "DECOYA binds KRASGEN. TP53GEN inhibits nothing here."
            ],
            "lang": ["en"],
        }
    )
    pages = spark.createDataFrame(pdf)
    rows = extract_statements(pages).orderBy("sent_idx").collect()
    got = [(r["type"], r["subj_text"], r["obj_text"], r["residue"], r["position"]) for r in rows]
    assert got == [
        ("Activation", "TP53GEN", "MDM2GEN", None, None),
        ("Phosphorylation", "EGFRGEN", "AKT1GEN", "T", "308"),
        ("Complex", "DECOYA", "KRASGEN", None, None),
    ]
    assert all(r["evidence_text"].endswith(".") for r in rows)


def test_non_english_skipped(spark):
    pdf = pd.DataFrame(
        {
            "url": ["u1"],
            "warc_ts": [pd.Timestamp("2024-01-01")],
            "html": [None],
            "text": ["TP53GEN activates MDM2GEN."],
            "lang": ["fr"],
        }
    )
    assert extract_statements(spark.createDataFrame(pdf)).count() == 0


def test_mentions(spark):
    pages = synth_pages(spark, 40)
    m = extract_mentions(pages)
    assert m.where(F.col("mention_id").isNull()).count() == 0
    # every statement's subject must appear as a mention on the same url
    stmts = extract_statements(pages).select("url", "subj_text").distinct()
    missing = stmts.join(
        m.select("url", F.col("text").alias("subj_text")).distinct(),
        ["url", "subj_text"],
        "left_anti",
    )
    assert missing.count() == 0


def test_object_entity_no_mid_token_match(spark):
    """ADVICE r2: the statement regex must not truncate mid-token when a
    lexicon entity is a strict prefix of a longer corpus token — the
    mention scan is \\b-wrapped, the statement pattern must agree."""
    from indra_db_spark.operators.extract import extract_statements
    from indra_db_spark.sources import lexicon as LX

    trig = sorted(LX.TRIGGERS)[0]
    ent = sorted(LX.LEXICON)[0]
    other = sorted(LX.LEXICON)[1]
    rows = [
        # object is a prefix of a longer token -> NO statement
        ("https://t.org/1", f"{other} {trig} {ent}berry today.", "en"),
        # clean object -> statement
        ("https://t.org/2", f"{other} {trig} {ent} today.", "en"),
        # residue position glued to a longer number-word -> suffix not parsed
        ("https://t.org/3", f"{other} {trig} {ent} on S303x.", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, text string, lang string"
    ).withColumn("html", F.lit(None).cast("binary")).withColumn(
        "warc_ts", F.current_timestamp()
    )
    got = extract_statements(pages).select("url", "residue", "position").collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r)
    assert "https://t.org/1" not in by_url
    assert len(by_url["https://t.org/2"]) == 1
    # page 3 still yields the core statement; the malformed suffix is ignored
    assert [
        (r["residue"], r["position"]) for r in by_url["https://t.org/3"]
    ] == [(None, None)]


def test_qualifier_window_bounds_agree_with_grammar(spark):
    """ADVICE r3: the mutation position is bounded to 5 digits so every
    grammar-legal qualifier fits the 32-char lookback window — the
    longest legal prefix ("X99999Y mutant inactive ") must be captured
    in full, and an over-long (grammar-illegal) position must drop the
    WHOLE mutation cleanly rather than truncate it mid-number."""
    from indra_db_spark.operators.extract import extract_statements
    from indra_db_spark.sources import lexicon as LX

    trig = sorted(LX.TRIGGERS)[0]
    ent = sorted(LX.LEXICON)[0]
    other = sorted(LX.LEXICON)[1]
    rows = [
        ("https://q.org/1", f"A99999B mutant inactive {other} {trig} {ent} now.", "en"),
        ("https://q.org/2", f"A123456B mutant {other} {trig} {ent} now.", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, text string, lang string"
    ).withColumn("html", F.lit(None).cast("binary")).withColumn(
        "warc_ts", F.current_timestamp()
    )
    got = {
        r["url"]: r
        for r in extract_statements(pages)
        .select("url", "subj_mut_from", "subj_mut_pos", "subj_mut_to", "subj_act")
        .collect()
    }
    r1 = got["https://q.org/1"]
    assert (r1["subj_mut_from"], r1["subj_mut_pos"], r1["subj_mut_to"]) == (
        "A", "99999", "B"
    )
    assert r1["subj_act"] == "inactive"
    r2 = got["https://q.org/2"]
    assert (r2["subj_mut_from"], r2["subj_mut_pos"], r2["subj_mut_to"]) == (
        None, None, None
    )


def test_extended_type_vocabulary(spark):
    """Extended (non-grammar) triggers are extracted and classified; the
    synthetic grammar stays pinned to GRAMMAR_TRIGGERS so golden corpora
    never remap as the vocabulary grows."""
    from indra_db_spark.operators.extract import extract_statements
    from indra_db_spark.sources import lexicon as LX
    from indra_db_spark.sources.synth import page_spec

    assert list(LX.GRAMMAR_TRIGGERS) == list(LX.TRIGGERS)[:12]
    ent_a, ent_b = sorted(LX.LEXICON)[:2]
    rows = [
        ("https://t.org/s", f"{ent_a} sumoylates {ent_b} today.", "en"),
        ("https://t.org/t", f"{ent_a} translocates {ent_b} now.", "en"),
        ("https://t.org/d", f"{ent_a} deubiquitinates {ent_b}.", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, text string, lang string"
    ).withColumn("html", F.lit(None).cast("binary")).withColumn(
        "warc_ts", F.current_timestamp()
    )
    got = {r["url"]: r["type"] for r in extract_statements(pages).collect()}
    assert got == {
        "https://t.org/s": "Sumoylation",
        "https://t.org/t": "Translocation",
        "https://t.org/d": "Deubiquitination",
    }
