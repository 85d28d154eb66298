"""Deterministic HTML → text extraction (SURVEY.md §8.2).

Per-row invariant from BASELINE.json input_hint: extracted ``text`` must be
**byte-identical per url** across runs and parallelism levels. This is the
analog of the reference reading pipeline's content prep
(indra_db/reading/read_db.py feeds reader processes plain text unzipped
from ``text_content.content``).

Spec (fixed grammar, no locale/time dependence):
  1. decode UTF-8 (strict — synthesized data is clean),
  2. remove <script>…</script> and <style>…</style> blocks,
  3. strip all remaining tags → '',
  4. collapse [ \\t]+ → ' ', normalize \\r\\n|\\r → \\n,
  5. strip each line, drop empty lines, join with '\\n'.

Implemented once as a pure Python function and once vectorized over a
pandas Series (used inside mapInPandas — Arrow batches, no per-row Python
at the Spark API level). The two are asserted equal in tests.
"""

from __future__ import annotations

import re

import pandas as pd

_SCRIPT_STYLE = re.compile(
    r"<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG = re.compile(r"<[^>]*>")
_HSPACE = re.compile(r"[ \t]+")
_CR = re.compile(r"\r\n|\r")


def extract_text_py(html: bytes | str | None) -> str | None:
    """Pure deterministic extractor — reference semantics, single value."""
    if html is None:
        return None
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    s = _SCRIPT_STYLE.sub("", s)
    s = _TAG.sub("", s)
    s = _CR.sub("\n", s)
    s = _HSPACE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized twin over a pandas Series of bytes/str (Arrow batch)."""
    s = html.map(
        lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b
    )
    s = s.str.replace(_SCRIPT_STYLE, "", regex=True)
    s = s.str.replace(_TAG, "", regex=True)
    s = s.str.replace(_CR, "\n", regex=True)
    s = s.str.replace(_HSPACE, " ", regex=True)
    return s.map(
        lambda t: None
        if t is None
        else "\n".join(ln for ln in (x.strip() for x in t.split("\n")) if ln)
    )
