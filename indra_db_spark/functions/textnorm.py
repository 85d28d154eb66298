"""Text normalization helpers (SURVEY.md §8.3).

``normalize_text_*``: mention-text regularization for grounding keys —
lowercase, non-[a-z0-9] runs → '_', trimmed of '_'. The Spark expression
and the Python twin are property-tested equal; neither applies Unicode
NFC (Spark has no built-in normalizer — an ICU pass would need a pandas
UDF), so decomposed and precomposed accented forms normalize by their
raw codepoints on BOTH sides identically (e.g. NFD 'e'+combining-acute →
'e'; NFC 'é' → ''). Production corpora wanting NFC should normalize at
ingest.

``collapse_ws_expr``: the ONE whitespace-canonicalization used by every
content fingerprint (exact dedup, md5/winnow fingerprints, shingles) —
collapse ALL whitespace runs (incl. tabs/newlines) to single spaces,
then trim. A bare ``F.trim`` strips only ASCII spaces, so edge
tabs/newlines would survive and split fingerprints of identical content.
Keep the DuckDB twin (`__spark_entry__._NORM_TEXT`) in lockstep.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def normalize_text_expr(col: Column) -> Column:
    s = F.lower(col)
    s = F.regexp_replace(s, r"[^a-z0-9]+", "_")
    return F.regexp_replace(s, r"^_+|_+$", "")


def normalize_text_py(s: str) -> str:
    return _NON_ALNUM.sub("_", s.lower()).strip("_")


def collapse_ws_expr(col: Column, lower: bool = True) -> Column:
    s = F.lower(col) if lower else col
    return F.trim(F.regexp_replace(s, r"\s+", " "))
