"""Entity lexicon + broadcast dims (grounding map, ontology, priors).

Synthetic analog of the INDRA grounding resources: the grounding map
(indra.preassembler.grounding_mapper's gilda-style scored candidates) and
the isa ontology (indra.ontology bio_ontology) that indra_db preassembly
consults. All deterministic, spec in FIXTURES.md §A2–A4.

The lexicon deliberately contains:
  * HGNC-like genes (incl. the hub entity ``TP53GEN`` for skew tests),
  * CHEBI-like chemicals whose grounding-map ids carry a redundant
    ``CHEBI:`` prefix (exercises regularize_agent_id, G4),
  * FPLX-like families (refinement targets),
  * ambiguous texts with two scored groundings (W3 tie-break),
  * decoys absent from the grounding map (TEXT: fallback path).
"""

from __future__ import annotations

from indra_db_spark.functions.textnorm import normalize_text_py

GENES = [
    "TP53GEN", "MDM2GEN", "EGFRGEN", "KRASGEN", "BRAFGEN", "AKT1GEN",
    "MTORGEN", "MYCGEN", "JUNGEN", "FOSGEN", "STAT3GEN", "JAK2GEN",
    "SRCGEN", "ABL1GEN", "RAF1GEN", "MEK1GEN", "ERK2GEN", "P38GEN",
    "JNK1GEN", "CDK2GEN", "CCND1GEN", "RB1GEN", "PTENGEN", "PIK3CAGEN",
    "NFKB1GEN", "IKBKBGEN", "TNFGEN", "IL6GEN", "TGFB1GEN", "SMAD3GEN",
    "WNT1GEN", "CTNNB1GEN", "GSK3BGEN", "NOTCH1GEN", "HES1GEN", "SHHGEN",
    "GLI1GEN", "HIF1AGEN", "VEGFAGEN", "CASP3GEN",
]

CHEMICALS = [
    "ASPIRINCHEM", "IMATINIBCHEM", "RAPAMYCINCHEM", "DOXORUBICINCHEM",
    "PACLITAXELCHEM", "GEFITINIBCHEM", "SORAFENIBCHEM", "METFORMINCHEM",
]

FAMILIES = [
    "P53FAM", "RASFAM", "RAFFAM", "MEKFAM", "ERKFAM", "AKTFAM", "JNKFAM",
    "CDKFAM", "WNTFAM", "NFKBFAM",
]

AMBIGUOUS = ["AMBIG1", "AMBIG2"]
DECOYS = ["DECOYA", "DECOYB", "DECOYC", "DECOYD"]

LEXICON: list[str] = GENES + CHEMICALS + FAMILIES + AMBIGUOUS + DECOYS

# Gene → family isa edges (2-level tree; FIXTURES.md §A3).
GENE_FAMILY = {
    "TP53GEN": "P53FAM",
    "KRASGEN": "RASFAM",
    "BRAFGEN": "RAFFAM",
    "RAF1GEN": "RAFFAM",
    "MEK1GEN": "MEKFAM",
    "ERK2GEN": "ERKFAM",
    "AKT1GEN": "AKTFAM",
    "JNK1GEN": "JNKFAM",
    "CDK2GEN": "CDKFAM",
    "WNT1GEN": "WNTFAM",
    "NFKB1GEN": "NFKBFAM",
}

# Trigger word → statement type. Mirrors the breadth of indra.statements'
# concrete classes this grammar can emit: RegulateActivity
# (Activation/Inhibition), Complex, Add/RemoveModification
# (Phosphorylation/Dephosphorylation/Ubiquitination/Acetylation/
# Methylation), RegulateAmount (IncreaseAmount/DecreaseAmount), and the
# GTPase regulators Gef/Gap. The type hierarchy for
# HasType(include_subclasses) lives in plans/query.py::TYPE_PARENTS.
TRIGGERS = {
    "activates": "Activation",
    "inhibits": "Inhibition",
    "binds": "Complex",
    "phosphorylates": "Phosphorylation",
    "dephosphorylates": "Dephosphorylation",
    "ubiquitinates": "Ubiquitination",
    "acetylates": "Acetylation",
    "methylates": "Methylation",
    "increases": "IncreaseAmount",
    "decreases": "DecreaseAmount",
    "exchanges": "Gef",
    "hydrolyzes": "Gap",
    # Extended vocabulary (indra.statements breadth): recognized by the
    # extractor and the DSL type closure. The synthetic grammar emits only
    # GRAMMAR_TRIGGERS below so golden corpora (and the 24M-page scaling
    # input) stay byte-stable as this vocabulary grows.
    "sumoylates": "Sumoylation",
    "desumoylates": "Desumoylation",
    "glycosylates": "Glycosylation",
    "ribosylates": "Ribosylation",
    "farnesylates": "Farnesylation",
    "palmitoylates": "Palmitoylation",
    "deacetylates": "Deacetylation",
    "demethylates": "Demethylation",
    "deubiquitinates": "Deubiquitination",
    "autophosphorylates": "Autophosphorylation",
    "transphosphorylates": "Transphosphorylation",
    "translocates": "Translocation",
}

# The 12 trigger words the synthetic grammar EMITS (pinned; order matters:
# page_spec indexes this list modulo a counter hash, so appending to
# TRIGGERS must never remap existing pages).
GRAMMAR_TRIGGERS = [
    "activates", "inhibits", "binds", "phosphorylates", "dephosphorylates",
    "ubiquitinates", "acetylates", "methylates", "increases", "decreases",
    "exchanges", "hydrolyzes",
]

N_SOURCES = 20
P_RAND = 0.3
P_SYST = 0.05


def _gene_id(i: int) -> str:
    # TP53GEN gets the real-looking HGNC id from FIXTURES.md §A2.
    return "11998" if GENES[i] == "TP53GEN" else str(10000 + i)


def grounding_rows() -> list[tuple[str, str, str, str, float]]:
    """(text_norm, db_ns, db_id, name, score) rows — FIXTURES.md §A2."""
    rows: list[tuple[str, str, str, str, float]] = []
    for i, g in enumerate(GENES):
        rows.append((normalize_text_py(g), "HGNC", _gene_id(i), g[:-3], 0.95))
    for i, c in enumerate(CHEMICALS):
        # Redundant 'CHEBI:' prefix on purpose — grounding must regularize.
        rows.append(
            (normalize_text_py(c), "CHEBI", f"CHEBI:{50000 + i}", c[:-4], 0.9)
        )
    for i, f in enumerate(FAMILIES):
        rows.append((normalize_text_py(f), "FPLX", f, f, 0.85))
    # Ambiguous with distinct scores → higher wins.
    rows.append((normalize_text_py("AMBIG1"), "HGNC", "9001", "AMBIG1G", 0.9))
    rows.append((normalize_text_py("AMBIG1"), "CHEBI", "8001", "AMBIG1C", 0.6))
    # Ambiguous with a TIE → lexicographic (db_ns, db_id) wins: CHEBI < HGNC.
    rows.append((normalize_text_py("AMBIG2"), "HGNC", "9002", "AMBIG2G", 0.7))
    rows.append((normalize_text_py("AMBIG2"), "CHEBI", "8002", "AMBIG2C", 0.7))
    return rows


def resolved_grounding() -> dict[str, tuple[str, str, str]]:
    """text_norm → (db_ns, db_id_regularized, name), best-first resolution:
    score desc, then (db_ns, db_id) asc — the Python twin of the W3
    tie-break used by the Spark grounding operator."""
    best: dict[str, tuple[float, str, str, str]] = {}
    for text_norm, ns, db_id, name, score in grounding_rows():
        if db_id.startswith(ns + ":"):
            db_id = db_id[len(ns) + 1 :]
        cand = (-score, ns, db_id, name)
        if text_norm not in best or cand < best[text_norm]:
            best[text_norm] = cand
    return {k: (v[1], v[2], v[3]) for k, v in best.items()}


def ontology_rows() -> list[tuple[str, str, str, str, str]]:
    """(child_ns, child_id, parent_ns, parent_id, rel) — FIXTURES.md §A3."""
    rows = []
    for i, g in enumerate(GENES):
        fam = GENE_FAMILY.get(g)
        if fam:
            rows.append(("HGNC", _gene_id(i), "FPLX", fam, "isa"))
    return rows


def prior_rows() -> list[tuple[str, float, float]]:
    return [(f"src{i}", P_RAND, P_SYST) for i in range(N_SOURCES)]
