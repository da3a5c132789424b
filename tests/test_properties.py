"""Property-based tests (hypothesis) over the pure-Python core."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from named_entity_algorithm_project_spark.detector import _trim_entity, extract_turn
from named_entity_algorithm_project_spark.functions.ngrams import char_wb_ngrams
from named_entity_algorithm_project_spark.functions.textnorm import (
    adaptive_threshold,
    normalize_phrase,
    normalize_text,
)
from named_entity_algorithm_project_spark.operators.canonical import (
    resolve_merge_chains,
)

text_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " .,%()-/°",
    max_size=400,
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_detector_deterministic_and_nonoverlapping(text):
    a = extract_turn(text)
    b = extract_turn(text)
    assert [vars(m) for m in a.mentions] == [vars(m) for m in b.mentions]
    # offset-bearing mentions never overlap (span-claim invariant)
    spans = sorted(
        (m.start, m.end) for m in a.mentions if m.start is not None
    )
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2, f"overlap: {(s1, e1)} vs {(s2, e2)}"
    # every mention respects the trim limits
    for m in a.mentions:
        assert len(m.entity.split()) <= 6
        assert len(m.entity) <= 80


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_trim_idempotent(text):
    once = _trim_entity(text)
    if once is not None:
        assert _trim_entity(once) == once


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_normalizers_idempotent(text):
    assert normalize_text(normalize_text(text)) == normalize_text(text)
    assert normalize_phrase(normalize_phrase(text)) == normalize_phrase(text)


@given(st.text(alphabet=string.ascii_lowercase + " ", min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_char_wb_ngram_count_formula(text):
    grams = char_wb_ngrams(text)
    expected = 0
    for w in normalize_text(text).split():
        padded = len(w) + 2
        for n in range(3, 6):
            if padded <= n:
                expected += 1
                break
            expected += padded - n + 1
    assert len(grams) == expected


@given(st.text(min_size=0, max_size=30), st.floats(0.5, 0.95))
@settings(max_examples=200, deadline=None)
def test_adaptive_threshold_bounds(term, base):
    t = adaptive_threshold(term, base)
    assert t >= base
    assert t >= 0.82
    assert t <= max(0.95, base)


@given(
    st.dictionaries(
        st.text(string.ascii_lowercase, min_size=1, max_size=4),
        st.text(string.ascii_lowercase, min_size=1, max_size=4),
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_merge_chain_resolution_terminal(merge_map):
    """Reference semantics (app.py:1797-1816, pinned by the golden cycle
    literals in test_golden_linking): identity entries are dropped before
    resolution, every surviving source resolves, and on an acyclic map
    every resolved target is terminal (not itself a source). With lowercase
    1-4 char keys the lowercasing arm is the identity, so the cleaned map
    is exactly the non-identity entries."""
    resolved = resolve_merge_chains(merge_map)
    cleaned = {s: t for s, t in merge_map.items() if s != t}
    assert set(resolved) == set(cleaned)
    for source, target in resolved.items():
        assert target  # never resolves to empty

    def reaches_cycle(source):
        seen = set()
        cur = source
        while cur in cleaned:
            if cur in seen:
                return True
            seen.add(cur)
            cur = cleaned[cur]
        return False

    for source, target in resolved.items():
        if not reaches_cycle(source):
            # acyclic chain: the resolved target is terminal
            assert target not in cleaned, (source, target, cleaned)
