"""Text normalization scalars (reference: app.py:1419-1422, 2793-3024).

Each has a pure-python form (used inside Arrow-batched UDFs and the pandas
test oracle) and, where useful, a Column-expression form so Catalyst can run
it JVM-side in relational stages.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS_RE = re.compile(r"\s+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9\s]")


def normalize_text(value: object) -> str:
    """Collapse whitespace + strip (app.py:1419-1422). Fast path: texts
    with no tabs/newlines/double spaces need only a strip — identical
    output, skips the regex scan on the hot extraction path."""
    if value is None:
        return ""
    s = str(value)
    # ascii guard: \s also matches unicode whitespace (NBSP etc.) — only
    # ascii texts may take the regex-free path
    if s.isascii() and "  " not in s and "\t" not in s and "\n" not in s \
            and "\r" not in s and "\x0b" not in s and "\x0c" not in s:
        return s.strip()
    return _WS_RE.sub(" ", s).strip()


def normalize_text_col(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def normalize_entity(value: object) -> str:
    """Trim surrounding whitespace only (app.py:2946-2961)."""
    if value is None:
        return ""
    return str(value).strip()


def normalize_phrase(text: object) -> str:
    """lower + strip non-alnum + collapse (app.py:2793-2797)."""
    if text is None:
        return ""
    cleaned = str(text).lower()
    cleaned = _NON_ALNUM_RE.sub(" ", cleaned)
    return _WS_RE.sub(" ", cleaned).strip()


def normalize_phrase_col(col: Column) -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )


def format_canonical(value: str) -> str:
    """<=4 chars -> upper else Title (app.py:2985-2990)."""
    if not value:
        return "unknown"
    if len(value) <= 4:
        return value.upper()
    return value.title()


def format_canonical_col(col: Column) -> Column:
    return F.when(F.length(col) <= 4, F.upper(col)).otherwise(F.initcap(col))


def can_merge_terms(a: str, b: str) -> bool:
    """Short-vs-long merge guard (app.py:2993-3000)."""
    if not a or not b or a == b:
        return False
    min_len = min(len(a), len(b))
    max_len = max(len(a), len(b))
    if min_len <= 2 and max_len > min_len:
        return False
    return True


def adaptive_threshold(term: str, base: float) -> float:
    """Per-term similarity floor by compact length (app.py:3003-3012)."""
    length = len((term or "").replace(" ", ""))
    if length <= 3:
        return max(0.95, base)
    if length <= 4:
        return max(0.92, base)
    if length <= 6:
        return max(0.88, base)
    return max(base, 0.82)


def adaptive_threshold_floor(base: float) -> float:
    """The GLOBAL minimum any per-term adaptive threshold can take
    (app.py:3003-3012): the four length tiers are max(0.95, b), max(0.92, b),
    max(0.88, b) and max(b, 0.82), so no candidate pair can pass the edge
    gate below ``max(base, 0.82)``. This is the exactness bound the
    prefix-filtered similarity join prunes against (linking.py)."""
    return max(base, 0.82)


def adaptive_threshold_col(term: Column, base: float) -> Column:
    """Column form of :func:`adaptive_threshold` for the candidate-pair table."""
    length = F.length(F.regexp_replace(term, r"\s", ""))
    b = F.lit(float(base))
    return (
        F.when(length <= 3, F.greatest(F.lit(0.95), b))
        .when(length <= 4, F.greatest(F.lit(0.92), b))
        .when(length <= 6, F.greatest(F.lit(0.88), b))
        .otherwise(F.greatest(b, F.lit(0.82)))
    )


def types_compatible(types_a, types_b) -> bool:
    """Non-UNKNOWN type sets must intersect (app.py:3015-3024)."""
    types_a = set(types_a or ())
    types_b = set(types_b or ())
    if not types_a and not types_b:
        return True
    clean_a = {t for t in types_a if t and t != "UNKNOWN"}
    clean_b = {t for t in types_b if t and t != "UNKNOWN"}
    if clean_a and clean_b:
        return not clean_a.isdisjoint(clean_b)
    if not clean_a and not clean_b:
        return True
    return False
