"""indra_db_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query and data-processing capabilities of
``kolusask/indra_db`` (fork of the public ``sorgerlab/indra_db``).

This is NOT a port: the reference is a PostgreSQL/SQLAlchemy batch system;
this engine re-expresses the same semantics as declarative Spark DataFrame
plans (Catalyst/Tungsten optimized), with vectorized pandas/Arrow UDFs only
where built-in operators cannot express the semantics (HTML text extraction,
regex statement extraction).

Pipeline (reference: indra_db preassembly, see SURVEY.md §4 L2):

    pages → extract_text → mentions/raw_statements → ground → distill
          → canonicalize (matches_key + mk_hash) → salted dedup
          → refinement join → connected components → belief
          → pa_statements / pa_link / evidence / meta tables

Reference anchors are given as ``path::Symbol`` in the public parent repo
layout (``/root/reference`` was empty at survey time — SURVEY.md §0).
"""

__version__ = "0.1.0"
