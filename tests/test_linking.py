"""Linking-stage units: TF-IDF parity with the reference formula, threshold
gates, type compatibility, canonical pick (SURVEY §2.5 L3-L9)."""

import math

import pytest
from pyspark.sql import functions as F

from named_entity_algorithm_project_spark.functions.ngrams import char_wb_ngrams
from named_entity_algorithm_project_spark.functions.textnorm import (
    adaptive_threshold,
    can_merge_terms,
    types_compatible,
)
from named_entity_algorithm_project_spark.operators.canonical import pick_canonicals
from named_entity_algorithm_project_spark.operators.linking import (
    compute_base_threshold,
    similarity_pairs,
    tfidf_weights,
)
from named_entity_algorithm_project_spark.oracle import _tfidf_cosine_pairs


def test_char_wb_ngrams_matches_sklearn_semantics():
    # sklearn pads each token with one space per side
    grams = char_wb_ngrams("abc")
    assert " ab" in grams and "abc" in grams and "bc " in grams
    assert " abc " in grams  # n=5 over the padded 5-char token
    # short padded token: all n=3 grams, then the whole token once at n=4,
    # then stop (sklearn's offset==0 break)
    assert char_wb_ngrams("ab") == [" ab", "ab ", " ab "]
    assert char_wb_ngrams("") == []


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("sklearn") is None,
    reason="sklearn not installed",
)
def test_tfidf_matches_sklearn_exactly():
    from sklearn.feature_extraction.text import TfidfVectorizer
    from sklearn.metrics.pairwise import cosine_similarity

    norms = ["polymer blend", "polymer blends", "P3HT", "organic solar cell",
             "organic solar cells", "bandgap", "PCE", "pce", "Perovskite",
             "perovskite"]
    vec = TfidfVectorizer(analyzer="char_wb", ngram_range=(3, 5))
    sk = cosine_similarity(vec.fit_transform(norms))
    ours = _tfidf_cosine_pairs(norms)
    for i in range(len(norms)):
        for j in range(i + 1, len(norms)):
            key = tuple(sorted((norms[i], norms[j])))
            assert ours.get(key, 0.0) == pytest.approx(sk[i][j], abs=1e-9)


def test_spark_tfidf_matches_oracle(spark):
    norms = [
        "polymer blend", "polymer blends", "P3HT", "organic solar cell",
        "organic solar cells", "bandgap", "band gap", "mobility",
        "PCE", "pce",
    ]
    oracle = _tfidf_cosine_pairs(norms)
    df = spark.createDataFrame([(n,) for n in norms], "norm string")
    weights = tfidf_weights(df, len(norms))
    pairs = {
        (r["a"], r["b"]): r["score"]
        for r in similarity_pairs(weights, salt_partitions=4).collect()
    }
    assert set(pairs) == set(oracle)
    for k, v in oracle.items():
        assert pairs[k] == pytest.approx(v, abs=1e-9), k
    # TfidfVectorizer's default lowercase=True preprocessing: case variants
    # are identical vectors (app.py:3050 uses the sklearn default)
    assert pairs[("PCE", "pce")] == pytest.approx(1.0, abs=1e-9)


def test_base_threshold_formula():
    # app.py:3275-3280
    assert compute_base_threshold(0) == 0.80
    assert compute_base_threshold(1000) == pytest.approx(0.80)
    assert compute_base_threshold(10000) == pytest.approx(0.82)
    assert compute_base_threshold(10**9) == pytest.approx(0.85)  # capped


def test_adaptive_threshold_floors():
    # app.py:3003-3012
    assert adaptive_threshold("abc", 0.8) == 0.95
    assert adaptive_threshold("abcd", 0.8) == 0.92
    assert adaptive_threshold("abcdef", 0.8) == 0.88
    assert adaptive_threshold("longer term", 0.8) == 0.82
    assert adaptive_threshold("longer term", 0.84) == 0.84
    # whitespace excluded from compact length
    assert adaptive_threshold("a b c", 0.8) == 0.95


def test_can_merge_guard():
    assert not can_merge_terms("ab", "abc")  # short vs long
    assert can_merge_terms("ab", "xy")  # both short, equal length
    assert can_merge_terms("abc", "abd")
    assert not can_merge_terms("same", "same")


def test_types_compatible_rules():
    assert types_compatible({"POLYMER"}, {"POLYMER", "ORGANIC"})
    assert not types_compatible({"POLYMER"}, {"ORGANIC"})
    assert types_compatible({"UNKNOWN"}, {"UNKNOWN"})
    assert not types_compatible({"POLYMER"}, {"UNKNOWN"})  # one clean, one not
    assert types_compatible(set(), set())


def test_canonical_pick_ordering(spark):
    # min by (not-acronym, -freq, len, lex): 'opv' (acronym) beats higher-freq
    comps = spark.createDataFrame(
        [("opv", "c1"), ("organic photovoltaic", "c1"), ("zzz", "c1"),
         ("beta", "c2"), ("alpha", "c2")],
        "norm string, component string",
    )
    norms = spark.createDataFrame(
        [("opv", 1), ("organic photovoltaic", 50), ("zzz", 99),
         ("beta", 5), ("alpha", 5)],
        "norm string, freq int",
    )
    got = {r["norm"]: r["canonical"] for r in pick_canonicals(comps, norms).collect()}
    assert got["organic photovoltaic"] == "opv"  # acronym rank wins
    assert got["zzz"] == "opv"
    # equal freq -> shorter term wins ('beta' len 4 < 'alpha' len 5)
    assert got["alpha"] == "beta"


def test_candidate_max_df_blocking_is_subset(spark):
    """The scale knob (drop ubiquitous n-grams from the similarity join)
    must only ever remove edges, never invent them."""
    from named_entity_algorithm_project_spark.datagen import (
        TRANSCRIPTS_SCHEMA,
        generate_rows,
    )
    from named_entity_algorithm_project_spark.operators.extract import (
        extract_mentions,
    )
    from named_entity_algorithm_project_spark.operators.linking import (
        build_linking_tables,
    )

    rows = generate_rows(n_convs=60, seed=17)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    mentions, abbrevs = extract_mentions(df)
    exact = {
        (r["src"], r["dst"])
        for r in build_linking_tables(mentions, abbrevs).edges.collect()
    }
    blocked = {
        (r["src"], r["dst"])
        for r in build_linking_tables(
            mentions, abbrevs, candidate_max_df=3
        ).edges.collect()
    }
    assert blocked <= exact


def test_extraction_invariant_under_partitioning(spark):
    """Mentions are identical whatever the input partitioning (narrow map —
    no order- or partition-dependence)."""
    from named_entity_algorithm_project_spark.datagen import (
        TRANSCRIPTS_SCHEMA,
        generate_rows,
    )
    from named_entity_algorithm_project_spark.operators.extract import (
        extract_mentions,
    )

    rows = generate_rows(n_convs=40, seed=18)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)

    def key_set(frame):
        m, _ = extract_mentions(frame)
        return {
            (r["conv_id"], r["turn_idx"], r["entity"], r["entity_type"], r["start"])
            for r in m.collect()
        }

    assert key_set(df.repartition(1)) == key_set(df.repartition(13, "conv_id"))
