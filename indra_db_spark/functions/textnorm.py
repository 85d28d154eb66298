"""Mention-text normalization (SURVEY.md §8.3).

Analog of the grounding mapper's text regularization
(indra.preassembler.grounding_mapper + indra_db/util::regularize_agent_id).
normalized = NFC, lowercase, non-[a-z0-9] runs → '_', trimmed of '_'.

Spark expression + Python twin (property-tested equal).
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def normalize_text_expr(col: Column) -> Column:
    s = F.lower(col)
    s = F.regexp_replace(s, r"[^a-z0-9]+", "_")
    return F.regexp_replace(s, r"^_+|_+$", "")


def normalize_text_py(s: str) -> str:
    s = unicodedata.normalize("NFC", s).lower()
    return _NON_ALNUM.sub("_", s).strip("_")
