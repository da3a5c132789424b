"""Label canonicalization (reference: app.py:552-683).

Pure functions — run inside the extraction UDF and in driver-side config
handling. The label schema is static (dictionaries.MODEL_ID2LABEL); the
reference's runtime model-config override is intentionally dropped.
"""

from __future__ import annotations

import re
from functools import lru_cache

from ..dictionaries import (
    LABEL2ID,
    LABEL_PREFIX_PATTERN,
    LEGACY_LABEL_ALIASES,
    MODEL_ID2LABEL,
)

_WS = re.compile(r"\s+")


@lru_cache(maxsize=4096)
def _normalize_label_cached(cleaned: str) -> str:
    cleaned = re.sub(r"^[BIES]-", "", cleaned, flags=re.IGNORECASE)
    cleaned = cleaned.replace("-", "_").replace(" ", "_")
    return cleaned.upper()


def normalize_label_from_config(label: object) -> str:
    """app.py:552-556 — strip BIO prefix, unify separators, uppercase.
    Pure function of the string; label vocabulary is tiny, so the cached
    core carries the hot extraction path."""
    return _normalize_label_cached("" if label is None else str(label).strip())


def canonicalize_label(label: object) -> str:
    """app.py:661-683 — map any raw label to the active schema or UNKNOWN.
    Cached: pure string function over a tiny label vocabulary."""
    return _canonicalize_cached("" if label is None else str(label).strip())


@lru_cache(maxsize=4096)
def _canonicalize_cached(raw: str) -> str:
    if not raw:
        return "UNKNOWN"
    normalized = normalize_label_from_config(raw)
    match = LABEL_PREFIX_PATTERN.match(normalized)
    if match:
        resolved = MODEL_ID2LABEL.get(match.group("idx"))
        if resolved:
            return normalize_label_from_config(resolved)
    if normalized in LABEL2ID:
        return normalized
    alias = LEGACY_LABEL_ALIASES.get(normalized) or LEGACY_LABEL_ALIASES.get(
        normalized.replace("-", "_")
    )
    if alias and alias in LABEL2ID:
        return alias
    return "UNKNOWN"
