"""Deterministic per-turn mention detection.

This is the pure-Python core shared by the Spark extraction stage (where it
runs inside an Arrow-batched pandas UDF — one call per text, many texts per
Arrow batch, no Spark-level per-row Python) and by the pandas parity oracle
in ``tests/``. Because both sides share this module, any Spark/oracle
disagreement isolates a *plumbing* bug (explode, join, shuffle, dedup), which
is exactly what the parity tests are for.

Semantics mirror the reference extraction loop on its deterministic path
(/root/reference/app.py:3619-3933 with the DummyPipeline model fallback,
app.py:2784-2786), with the neural span detector replaced by a deterministic
scanner over the same dictionaries:

* abbreviation pre-expansion            app.py:2837-2851
* gazetteer injection                   app.py:3834-3869 (extended to all
                                        DOMAIN_TERM_CATEGORIES terms, not just
                                        multiword ones — our "model" substitute)
* value / material / property spans     patterns app.py:1037-1048 (detection is
                                        ours; typing cascade is the reference's)
* typing cascade                        app.py:3450-3489
* abbreviation entity injection         app.py:3802-3832
* per-(type, norm) first-only dedup     app.py:3780-3787
* acronym-variant merge                 app.py:2800-2834
* single-char filter                    app.py:3901-3903
* lonely-unit suppression               app.py:2543-2589
* trim + verb filter                    app.py:2408-2521 (fallback verb set;
                                        spaCy POS path intentionally dropped —
                                        not deterministic across environments)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .dictionaries import (
    ABBREVIATION_PATTERN,
    ACRONYM_LOOKUP,
    DOMAIN_TERM_CATEGORIES,
    FALLBACK_VERBS,
    MATERIAL_TOKEN_PATTERN,
    TRAILING_STOPWORDS,
    UNIT_ONLY_PATTERN,
    VALUE_SPAN_PATTERN,
)
from .functions.labels import canonicalize_label
from .functions.textnorm import normalize_text
from .functions.typing_rules import domain_category_for, map_entity_type

ENTITY_TYPES = sorted(
    {canonicalize_label(v) for v in DOMAIN_TERM_CATEGORIES.values()}
    | {
        "INORGANIC",
        "MATERIAL_AMOUNT",
        "MONOMER",
        "O",
        "ORGANIC",
        "POLYMER",
        "POLYMER_FAMILY",
        "PROP_NAME",
        "PROP_VALUE",
    }
)

DEFAULT_CONFIDENCE_THRESHOLD = 0.5

# Confidence assignments for the deterministic scanner (fixed, documented —
# the reference's analogs: gazetteer >=0.85 app.py:3861, abbreviation = the
# run threshold app.py:3821, model spans variable).
GAZETTEER_CONFIDENCE = 0.85
VALUE_CONFIDENCE = 0.90
MATERIAL_CONFIDENCE = 0.80
PROPERTY_CONFIDENCE = 0.85

_SINGLE_CHAR_RE = re.compile(r"^\s*[A-Za-z0-9]\s*$")

# ONE combined word-boundary alternation per term family (a per-term scan
# would walk the text ~80x; the alternation walks it once — measured 10x
# faster with identical matches). Alternatives ordered longest-first so at
# any position the longest term wins ("organic photovoltaic" before "opv");
# category resolved from the matched text.
def _boundary_alternation(terms) -> "re.Pattern[str]":
    ordered = sorted(terms, key=lambda t: (-len(t), t))
    return re.compile(
        r"(?<![A-Za-z0-9])(?:"
        + "|".join(re.escape(t) for t in ordered)
        + r")(?![A-Za-z0-9])",
        re.IGNORECASE,
    )


_GAZETTEER_PATTERN = _boundary_alternation(DOMAIN_TERM_CATEGORIES)
_GAZETTEER_CATEGORY = {t.lower(): c for t, c in DOMAIN_TERM_CATEGORIES.items()}

# Property keywords scanned as standalone spans (reference finds these via
# the neural model + PROPERTY_KEYWORDS cascade app.py:884-919, 3478-3480).
from .dictionaries import PROPERTY_KEYWORDS  # noqa: E402

_PROPERTY_PATTERN = _boundary_alternation(PROPERTY_KEYWORDS)


@dataclass
class Mention:
    entity: str
    entity_norm: str  # lowercased strip (reference entity_norm)
    entity_type: str
    confidence: float
    start: Optional[int]
    end: Optional[int]
    canonical_acr: Optional[str] = None  # ACRONYM_LOOKUP hit (app.py:2800-2834)
    is_user_entity: bool = False


@dataclass
class TurnExtraction:
    mentions: List[Mention] = field(default_factory=list)
    abbreviations: List[Tuple[str, str]] = field(default_factory=list)  # (abbr, expansion)


def preprocess_text(text: str) -> Tuple[str, Dict[str, str]]:
    """Abbreviation pre-expansion (app.py:2837-2851): rewrite
    ``expansion (ABBR)`` to ``expansion ABBR`` and harvest the pairs."""
    if not text:
        return "", {}
    if "(" not in text:
        # both rewrite patterns require a parenthesis — regex-free fast
        # path for the (majority) of turns that define no abbreviation
        return text, {}
    abbreviation_map: Dict[str, str] = {}

    def _replace(match: "re.Match[str]") -> str:
        expansion = normalize_text(match.group("expansion"))
        abbreviation = match.group("abbr").strip()
        # plain assignment: when a turn redefines an abbreviation the LAST
        # expansion wins, mirroring preprocess_abstract (app.py:2847)
        abbreviation_map[abbreviation] = expansion
        return f"{expansion} {abbreviation}"

    cleaned = ABBREVIATION_PATTERN.sub(_replace, text)
    cleaned = re.sub(r"\(([A-Z0-9]{2,})\)", r"\1", cleaned)
    return cleaned, abbreviation_map


def _scan_spans(work_text: str) -> List[Tuple[int, int, str, str, float]]:
    """Deterministic span scanner. Returns (start, end, text, hint, conf)
    sorted by (start, end). ``hint`` feeds the typing cascade as the
    pseudo model label.

    Claiming is first-come non-overlapping in a fixed priority order
    (gazetteer longest-first, property keywords, value spans, material
    tokens); the claimed-interval set is a bisect-maintained sorted list so
    long turns stay O(n log n), not O(n²)."""
    import bisect

    spans: List[Tuple[int, int, str, str, float]] = []
    starts: List[int] = []  # sorted starts of claimed (non-overlapping) spans
    ends: List[int] = []  # ends aligned with starts

    def _claim(s: int, e: int) -> bool:
        i = bisect.bisect_right(starts, s)
        if i > 0 and ends[i - 1] > s:  # previous interval covers s
            return False
        if i < len(starts) and starts[i] < e:  # next interval starts inside
            return False
        starts.insert(i, s)
        ends.insert(i, e)
        return True

    # 1. gazetteer terms (single longest-first alternation pass)
    for m in _GAZETTEER_PATTERN.finditer(work_text):
        if _claim(m.start(), m.end()):
            category = _GAZETTEER_CATEGORY.get(m.group(0).lower(), "UNKNOWN")
            spans.append((m.start(), m.end(), m.group(0), category, GAZETTEER_CONFIDENCE))
    # 2. property keywords
    for m in _PROPERTY_PATTERN.finditer(work_text):
        if _claim(m.start(), m.end()):
            spans.append((m.start(), m.end(), m.group(0), "PROP_NAME", PROPERTY_CONFIDENCE))
    # 3. numeric value (+unit) spans
    for m in VALUE_SPAN_PATTERN.finditer(work_text):
        if _claim(m.start(), m.end()):
            spans.append((m.start(), m.end(), m.group(0), "PROP_VALUE", VALUE_CONFIDENCE))
    # 4. material-looking tokens (letters+digits)
    for m in MATERIAL_TOKEN_PATTERN.finditer(work_text):
        if _claim(m.start(), m.end()):
            spans.append((m.start(), m.end(), m.group(0), "", MATERIAL_CONFIDENCE))

    spans.sort(key=lambda s: (s[0], s[1], s[2].lower()))
    return spans


def _trim_entity(raw_entity: str) -> Optional[str]:
    """Trailing-stopword strip + verb/length filter (app.py:2466-2509).
    Returns the trimmed entity, or None when the row must be dropped."""
    if not raw_entity.strip():
        return None
    token_list = raw_entity.split()
    if len(token_list) > 6 or len(raw_entity.strip()) > 80:
        return None
    tokens = list(token_list)
    while tokens:
        candidate = tokens[-1].rstrip(",.;:")
        if candidate.lower() in TRAILING_STOPWORDS:
            tokens.pop()
        else:
            break
    trimmed = " ".join(tokens).strip(",.;: ")
    if not trimmed:
        return None
    if {tok.lower() for tok in trimmed.split()} & FALLBACK_VERBS:
        return None
    return trimmed


def compile_user_patterns(
    user_entities: List[Tuple[str, str]],
) -> List[Tuple[str, str, "re.Pattern[str]"]]:
    """User-gazetteer patterns (app.py:2054-2059): dash/space variants +
    optional plural suffix, word-boundary guarded. Compiled once per
    executor; the term list ships as a broadcast/closure dimension."""
    compiled = []
    for term, entity_type in sorted(set(user_entities or [])):
        cleaned = re.sub(r"[‐-―]", "-", str(term)).strip()
        if not cleaned:
            continue
        flexible = re.escape(cleaned).replace(r"\-", "[-\\s]").replace(r"\ ", "[-\\s]")
        pattern = re.compile(
            r"(?<![A-Za-z0-9])" + flexible + r"(?:es|s)?(?![A-Za-z0-9])",
            re.IGNORECASE,
        )
        compiled.append((cleaned, entity_type, pattern))
    return compiled


def extract_turn(
    text: Optional[str],
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    user_patterns: Optional[List[Tuple[str, str, "re.Pattern[str]"]]] = None,
    reference_strict: bool = False,
    span_fn=None,
) -> TurnExtraction:
    """Full extraction for one turn of text.

    ``span_fn`` is the pluggable span detector: ``work_text -> [(start,
    end, text, hint, confidence)]``. Default is the deterministic scanner
    (:func:`_scan_spans`, the reference's DummyPipeline path); the neural
    token-classification detector (operators/neural.py — chunk → infer →
    offset remap, app.py:3619-3933) plugs in here, and EVERYTHING after the
    span list (typing cascade, injections, dedup, post-filters) is shared.

    ``reference_strict`` replicates the reference's OBSERVED lonely-unit
    behavior instead of the evidently-intended one — see :func:`_postfilter`.
    """
    result = TurnExtraction()
    if not text or not str(text).strip():
        return result
    text = str(text)

    work_text, abbr_map = preprocess_text(text)
    result.abbreviations = sorted(abbr_map.items())

    # abbreviation type hints (app.py:3700-3705)
    abbr_hints: Dict[str, str] = {}
    for abbr, expansion in abbr_map.items():
        abbr_norm = abbr.strip().lower()
        hinted = map_entity_type(entity_group="", text=expansion)
        if hinted == "UNKNOWN":
            hinted = map_entity_type(entity_group="", text=abbr_norm.upper())
        abbr_hints[abbr_norm] = hinted

    mentions: List[Mention] = []
    seen_spans: set[Tuple[int, int, str]] = set()
    per_type_seen: Dict[str, set] = {}
    existing_norms: set[str] = set()

    for start, end, raw_word, hint, conf in (span_fn or _scan_spans)(work_text):
        word = normalize_text(raw_word)
        if not word:
            continue
        span_key = (start, end, word.lower())
        if span_key in seen_spans:
            continue
        seen_spans.add(span_key)

        score = conf
        candidate_type = map_entity_type(hint, word)
        normalized_key = word.lower().strip()

        # domain-hint re-typing (app.py:3759-3766)
        domain_hint = domain_category_for(normalized_key) or domain_category_for(word)
        if not domain_hint and normalized_key.replace("-", " ") != normalized_key:
            domain_hint = domain_category_for(normalized_key.replace("-", " "))
        if domain_hint and (score < 0.7 or candidate_type in {"UNKNOWN", "O"}):
            candidate_type = domain_hint
            score = max(score, max(confidence_threshold + 0.05, 0.75))

        # abbreviation-hint re-typing (app.py:3768-3773)
        abbr_hint = abbr_hints.get(normalized_key)
        if abbr_hint and (candidate_type in {"UNKNOWN", "O"} or score < 0.7):
            candidate_type = abbr_hint
            score = max(score, max(confidence_threshold + 0.05, 0.75))

        if candidate_type not in ENTITY_TYPES:
            candidate_type = "UNKNOWN"
        if score < confidence_threshold:
            continue

        bucket = per_type_seen.setdefault(candidate_type, set())
        if normalized_key in bucket:
            continue
        bucket.add(normalized_key)
        existing_norms.add(normalized_key)
        mentions.append(
            Mention(
                entity=word,
                entity_norm=normalized_key,
                entity_type=candidate_type,
                confidence=round(score, 4),
                start=start,
                end=end,
            )
        )

    # abbreviation entity injection (app.py:3802-3832)
    for abbr, _expansion in sorted(abbr_map.items()):
        abbr_norm = abbr.strip().lower()
        if abbr_norm in existing_norms:
            continue
        candidate_type = abbr_hints.get(abbr_norm, "UNKNOWN")
        entity_type = candidate_type if candidate_type in ENTITY_TYPES else "UNKNOWN"
        bucket = per_type_seen.setdefault(entity_type, set())
        if abbr_norm in bucket:
            continue
        bucket.add(abbr_norm)
        existing_norms.add(abbr_norm)
        mentions.append(
            Mention(
                entity=abbr.strip(),
                entity_norm=abbr_norm,
                entity_type=entity_type,
                confidence=round(confidence_threshold, 4),
                start=None,
                end=None,
            )
        )

    # user-entity gazetteer injection (app.py:1974-2094): confidence 1.0,
    # is_user_entity=True, dedup vs existing (norm, start)
    if user_patterns:
        seen_keys = {(m.entity_norm, m.start) for m in mentions}
        for _term, entity_type, pattern in user_patterns:
            for match in pattern.finditer(work_text):
                word = normalize_text(match.group(0))
                if not word:
                    continue
                norm = word.lower().strip()
                key = (norm, match.start())
                if key in seen_keys:
                    continue
                seen_keys.add(key)
                etype = canonicalize_label(entity_type)
                mentions.append(
                    Mention(
                        entity=word,
                        entity_norm=norm,
                        entity_type=etype if etype in ENTITY_TYPES else "UNKNOWN",
                        confidence=1.0,
                        start=match.start(),
                        end=match.end(),
                        is_user_entity=True,
                    )
                )

    mentions = _postfilter(mentions, reference_strict=reference_strict)
    return TurnExtraction(mentions=mentions, abbreviations=result.abbreviations)


def _postfilter(
    mentions: List[Mention], reference_strict: bool = False
) -> List[Mention]:
    """Post passes, in reference order (app.py:3895-3933).

    ``reference_strict=False`` (default, pinned) runs lonely-unit
    suppression with the unit itself EXCLUDED from the distance check.
    ``reference_strict=True`` replicates the reference's observed behavior:
    its distance check includes the unit itself (distance 0 < 50 always
    passes, app.py:2577-2580) and NaN-start units are excluded by the
    dropna before `units` is built (app.py:2563), so the reference pass
    drops NOTHING — strict mode therefore skips the suppression entirely.
    """
    # stable order: (entity_type, entity) mirrors the reference's sort
    mentions = sorted(
        mentions,
        key=lambda m: (m.entity_type, m.entity, m.start if m.start is not None else -1),
    )

    # acronym merge (app.py:2800-2834): set Canonical + rewrite entity_norm
    from .functions.textnorm import normalize_phrase

    for m in mentions:
        canonical = ACRONYM_LOOKUP.get(normalize_phrase(m.entity))
        if canonical:
            m.canonical_acr = canonical
            m.entity_norm = canonical.lower()

    # single-char filter (app.py:3901-3903)
    mentions = [
        m for m in mentions if m.is_user_entity or not _SINGLE_CHAR_RE.match(m.entity)
    ]

    # lonely-unit suppression (app.py:2543-2589): unit-looking PROP_VALUE
    # spans with no OTHER PROP_VALUE start within 50 chars are dropped.
    # (The reference's distance check includes the unit itself — distance 0
    # always passes — so its pass drops nothing; we pin the evidently
    # intended semantics, self excluded, shared with the oracle. Strict
    # mode reproduces the reference's observed no-op — docstring above.)
    if not reference_strict:
        value_starts = [
            m.start
            for m in mentions
            if m.entity_type == "PROP_VALUE" and m.start is not None
        ]
        kept: List[Mention] = []
        for m in mentions:
            if (
                m.entity_type == "PROP_VALUE"
                and m.start is not None  # offset-less rows skip the check
                # (the reference's dropna excludes them, app.py:2560)
                and UNIT_ONLY_PATTERN.match(m.entity)
            ):
                near = any(
                    vs != m.start and abs(vs - m.start) < 50
                    for vs in value_starts
                )
                if not near:
                    continue
            kept.append(m)
        mentions = kept

    # trim + verb/length filter (app.py:2408-2521)
    out: List[Mention] = []
    for m in mentions:
        if m.is_user_entity:
            out.append(m)
            continue
        trimmed = _trim_entity(m.entity)
        if trimmed is None:
            continue
        if trimmed != m.entity:
            m.entity = trimmed
        out.append(m)
    return out
