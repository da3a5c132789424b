"""GOLDEN extraction fixture — expectations hand-derived from READING the
reference, never from running repo code.

Every expected mention / abbreviation / triple below was written by tracing
the reference sources by hand:

* preprocess_abstract (abbreviation rewrite)        app.py:2837-2851
* extraction loop + typing cascade                  app.py:3619-3933, 3450-3489
* domain_category_for                               app.py:3410-3421
* canonicalize_label + LEGACY_LABEL_ALIASES         app.py:661-683, 605-632
* abbreviation-entity injection                     app.py:3802-3832
* acronym-variant merge                             app.py:2800-2834
* single-char filter                                app.py:3901-3903
* lonely-unit suppression                           app.py:2543-2589
* trim + fallback-verb filter                       app.py:2408-2521
* nearest property<->value pairing                  app.py:2321-2405

The oracle in oracle_expected.py shares detector.extract_turn with the
system under test (independent orchestration, shared per-turn semantics),
so a detector-semantics bug reproducing on both sides would pass that
gate. THIS file closes the blind spot: the literals below came from a
human reading app.py, so a semantics mutation (flipping a cascade branch,
reordering a filter) fails here even when Spark and the pandas oracle
agree with each other.

The deterministic span scanner is the repo's documented model substitute
(detector.py module docstring): gazetteer / property-keyword / value /
material-token spans with fixed confidences 0.85 / 0.85 / 0.90 / 0.80,
then the REFERENCE's cascade and post-filters verbatim. Expectations
below therefore fix the scanner contract AND the reference semantics.
"""

import pytest

from named_entity_algorithm_project_spark.detector import extract_turn


def _rows(result):
    return [
        (m.entity, m.entity_norm, m.entity_type, m.confidence, m.start, m.end,
         m.canonical_acr)
        for m in result.mentions
    ]


def _case(text, work, mentions, abbreviations=()):
    return pytest.param(
        text, work, mentions, list(abbreviations), id=text[:40].strip()
    )


# Each case: (input text, expected work_text after abbreviation rewrite,
# expected mentions IN POSTFILTER ORDER (entity_type, entity, start),
# expected (abbr, expansion) pairs). Offsets are into the expected work
# text and are located with .index() on the hand-written literal.
W1 = "The perovskite layer improved."
W2 = "We studied power conversion efficiency PCE in devices."
W3 = "The binding layer material BLM was thin."
W4 = "The mobility reached 12.5 cm at room temperature."
W5 = "Organic photovoltaics improved efficiency markedly."
W6 = "The bulk heterojunction BHJ devices worked."
W7 = "P3HT films were processed quickly."
W8 = "The Si3N4-nitride film grew."
W9 = "It reached 15.3 % and 0.85 V under bias."
W10 = "Yield hit 92 % in trials."
W11 = "Red unit RU and blue unit RU differ."
W12 = "The cell rated 7 overall."

GOLDEN_TURNS = [
    # G1 — gazetteer term, domain cascade branch (app.py:3458-3460):
    # domain_category_for("perovskite") -> INORGANIC, gazetteer conf 0.85.
    _case(
        W1, W1,
        [("perovskite", "perovskite", "INORGANIC", 0.85,
          W1.index("perovskite"), W1.index("perovskite") + 10, None)],
    ),
    # G2 — abbreviation pre-expansion (app.py:2837-2851). The lazy
    # expansion group anchors at the LEFTMOST letter, so the harvested
    # expansion greedily includes the sentence prefix ("We studied power
    # conversion efficiency") — a reference quirk preserved on purpose.
    # Both the phrase and the residual "PCE" token are gazetteer hits
    # typed PROP_NAME via domain_category_for; the abbreviation injection
    # then skips "pce" because the norm already exists (app.py:3803-3805).
    # Postfilter order: "PCE" sorts before "power..." ("P" < "p").
    _case(
        "We studied power conversion efficiency (PCE) in devices.", W2,
        [("PCE", "pce", "PROP_NAME", 0.85,
          W2.index("PCE"), W2.index("PCE") + 3, None),
         ("power conversion efficiency", "power conversion efficiency",
          "PROP_NAME", 0.85, W2.index("power"),
          W2.index("power") + len("power conversion efficiency"), None)],
        [("PCE", "We studied power conversion efficiency")],
    ),
    # G3 — abbreviation-entity injection with the UNIT_ONLY quirk
    # (app.py:3469-3470): the expansion types UNKNOWN, the retry on the
    # upper-cased abbreviation hits UNIT_ONLY_PATTERN (any short alpha
    # token!) -> PROP_VALUE; injected at the run threshold with no
    # offsets (app.py:3802-3832). Offset-less units skip lonely-unit
    # suppression (the reference dropna, app.py:2563).
    _case(
        "The binding layer material (BLM) was thin.", W3,
        [("BLM", "blm", "PROP_VALUE", 0.5, None, None, None)],
        [("BLM", "The binding layer material")],
    ),
    # G4 — nearest-property pairing setup: two PROP_NAMEs (gazetteer
    # "mobility", keyword "temperature") around one value span.
    _case(
        W4, W4,
        [("mobility", "mobility", "PROP_NAME", 0.85,
          W4.index("mobility"), W4.index("mobility") + 8, None),
         ("temperature", "temperature", "PROP_NAME", 0.85,
          W4.index("temperature"), W4.index("temperature") + 11, None),
         ("12.5 cm", "12.5 cm", "PROP_VALUE", 0.9,
          W4.index("12.5"), W4.index("12.5") + 7, None)],
    ),
    # G5 — acronym-variant merge (app.py:2800-2834): "organic
    # photovoltaics" is an ACRONYM_CANONICAL_MAP variant of OPV ->
    # Canonical=OPV and entity_norm rewritten to "opv".
    _case(
        W5, W5,
        [("Organic photovoltaics", "opv", "ORGANIC", 0.85,
          0, len("Organic photovoltaics"), "OPV"),
         ("efficiency", "efficiency", "PROP_NAME", 0.85,
          W5.index("efficiency"), W5.index("efficiency") + 10, None)],
    ),
    # G6 — injected abbreviation that is itself an acronym variant:
    # "bulk heterojunction" is not a gazetteer term (model-only in the
    # reference), so only the injected "BHJ" survives; the acronym merge
    # then canonicalizes it (Canonical=BHJ).
    _case(
        "The bulk heterojunction (BHJ) devices worked.", W6,
        [("BHJ", "bhj", "PROP_VALUE", 0.5, None, None, "BHJ")],
        [("BHJ", "The bulk heterojunction")],
    ),
    # G7 — material token -> MATERIAL_PATTERN -> ORGANIC (app.py:3483-3488,
    # no inorganic clue), scanner conf 0.80.
    _case(
        W7, W7,
        [("P3HT", "p3ht", "ORGANIC", 0.8, 0, 4, None)],
    ),
    # G8 — MATERIAL_PATTERN with an inorganic clue word ("nitride",
    # app.py:3484-3486) -> INORGANIC. ("oxide" would NOT reach this
    # branch: it is also a MATERIAL_KEYWORD, which wins first.)
    _case(
        W8, W8,
        [("Si3N4-nitride", "si3n4-nitride", "INORGANIC", 0.8,
          W8.index("Si3N4"), W8.index("Si3N4") + 13, None)],
    ),
    # G9 — two value spans, zero properties; nothing suppressed (neither
    # is unit-only). Postfilter order: "0.85 V" < "15.3 %".
    _case(
        W9, W9,
        [("0.85 V", "0.85 v", "PROP_VALUE", 0.9,
          W9.index("0.85"), W9.index("0.85") + 6, None),
         ("15.3 %", "15.3 %", "PROP_VALUE", 0.9,
          W9.index("15.3"), W9.index("15.3") + 6, None)],
    ),
    # G10 — property keyword + percent value.
    _case(
        W10, W10,
        [("Yield", "yield", "PROP_NAME", 0.85, 0, 5, None),
         ("92 %", "92 %", "PROP_VALUE", 0.9,
          W10.index("92"), W10.index("92") + 4, None)],
    ),
    # G11 — abbreviation redefinition: LAST expansion wins
    # (app.py:2846-2847 plain dict assignment); the second match's lazy
    # expansion anchors at "and". One injected PROP_VALUE mention.
    _case(
        "Red unit (RU) and blue unit (RU) differ.", W11,
        [("RU", "ru", "PROP_VALUE", 0.5, None, None, None)],
        [("RU", "and blue unit")],
    ),
    # G12 — single-char filter (app.py:3901-3903): the bare "7" value
    # span is dropped; nothing else matches.
    _case(W12, W12, []),
]


@pytest.mark.parametrize("text,work,mentions,abbreviations", GOLDEN_TURNS)
def test_golden_turn(text, work, mentions, abbreviations):
    from named_entity_algorithm_project_spark.detector import preprocess_text

    got_work, _ = preprocess_text(text)
    assert got_work == work
    result = extract_turn(text)
    assert _rows(result) == mentions
    assert result.abbreviations == abbreviations


# ---------------------------------------------------------------------------
# span_fn-level goldens: cascade + post-filters on hand-written model spans
# (the shapes a neural detector produces that the scanner cannot).
# ---------------------------------------------------------------------------


def test_golden_trim_and_verb_filter():
    """app.py:2466-2509: trailing stopword popped from the entity TEXT
    (entity_norm untouched), then the fallback-verb check drops any
    mention whose remaining tokens contain is/are/was/were/be/been/being."""
    text = "The charge mobility of the film was measured."
    spans = [
        (4, 22, "charge mobility of", "PROP_NAME", 0.92),
        (27, 39, "was measured", "O", 0.9),
    ]
    result = extract_turn(text, span_fn=lambda _w: spans)
    assert _rows(result) == [
        ("charge mobility", "charge mobility of", "PROP_NAME", 0.92, 4, 22, None),
    ]


def test_golden_lonely_unit_default_vs_strict():
    """app.py:2543-2589: a unit-only PROP_VALUE ("mV" via the
    UNIT->PROP_VALUE legacy alias, app.py:614/631) with no other value
    start within 50 chars is suppressed under the pinned intended
    semantics; reference_strict replicates the reference's OBSERVED pass
    (distance 0 to itself always passes, app.py:2577-2580 — drops
    nothing)."""
    lonely = "Conductivity measured in mV here."
    spans = [(25, 27, "mV", "UNIT", 0.95)]
    assert _rows(extract_turn(lonely, span_fn=lambda _w: spans)) == []
    assert _rows(
        extract_turn(lonely, span_fn=lambda _w: spans, reference_strict=True)
    ) == [("mV", "mv", "PROP_VALUE", 0.95, 25, 27, None)]

    near = "Signal of 3 mV at baseline mV drift."
    spans2 = [
        (10, 14, "3 mV", "PROP_VALUE", 0.9),
        (27, 29, "mV", "UNIT", 0.95),
    ]
    assert _rows(extract_turn(near, span_fn=lambda _w: spans2)) == [
        ("3 mV", "3 mv", "PROP_VALUE", 0.9, 10, 14, None),
        ("mV", "mv", "PROP_VALUE", 0.95, 27, 29, None),
    ]


def test_golden_domain_hint_confidence_bump():
    """app.py:3759-3762: a low-score model span whose text is a domain
    term is retyped to the domain category and its score floored at
    max(threshold+0.05, 0.75)."""
    result = extract_turn(
        "perovskite observed.",
        span_fn=lambda _w: [(0, 10, "perovskite", "O", 0.55)],
    )
    assert _rows(result) == [
        ("perovskite", "perovskite", "INORGANIC", 0.75, 0, 10, None)
    ]


# ---------------------------------------------------------------------------
# nearest property<->value triples (app.py:2321-2405) on hand-written
# mention rows: nearest by |prop.start - value.start|, canonical preferred
# over entity for the subject, NULL-property values and value-less
# properties both emitted.
# ---------------------------------------------------------------------------


def test_golden_nearest_property_triples(spark):
    from named_entity_algorithm_project_spark.operators.triples import (
        build_triples,
    )

    schema = (
        "conv_id string, turn_idx int, entity string, entity_type string, "
        "canonical string, start int, confidence double"
    )
    rows = [
        # doc A (= W4): temperature (dist 16) beats mobility (dist 17)
        ("A", 0, "mobility", "PROP_NAME", None, 4, 0.85),
        ("A", 0, "temperature", "PROP_NAME", None, 37, 0.85),
        ("A", 0, "12.5 cm", "PROP_VALUE", None, 21, 0.9),
        # doc B (= W9): values with no property -> NULL subject
        ("B", 0, "15.3 %", "PROP_VALUE", None, 11, 0.9),
        ("B", 0, "0.85 V", "PROP_VALUE", None, 23, 0.9),
        # doc C: property with no value -> NULL object (app.py:2394-2403)
        ("C", 0, "Mobility", "PROP_NAME", None, 0, 0.85),
        # doc D: canonical preferred over entity text (app.py:2385)
        ("D", 0, "power conversion efficiency", "PROP_NAME", "PCE", 10, 0.85),
        ("D", 0, "18 %", "PROP_VALUE", None, 45, 0.9),
        # doc E: MATERIAL_AMOUNT counts as a value row (app.py:2365)
        ("E", 0, "5 mg", "MATERIAL_AMOUNT", None, 8, 0.8),
        ("E", 0, "density", "PROP_NAME", None, 30, 0.85),
    ]
    mentions = spark.createDataFrame(rows, schema)
    got = {
        (r["subj"], r["pred"], r["obj"], r["conv_id"])
        for r in build_triples(mentions).collect()
    }
    assert got == {
        ("temperature", "has_value", "12.5 cm", "A"),
        (None, "has_value", "15.3 %", "B"),
        (None, "has_value", "0.85 V", "B"),
        ("Mobility", "has_value", None, "C"),
        ("PCE", "has_value", "18 %", "D"),
        ("density", "has_value", "5 mg", "E"),
    }
