"""L4 semantic-embedding linking: stub embedder, exact/LSH scoring parity
vs the numpy N² oracle, and end-to-end canonical-map parity through the
shared gate cascade (reference use_semantic path, app.py:3084-3110)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from named_entity_algorithm_project_spark.functions.embed import (
    cosine_matrix,
    embed_text,
)
from named_entity_algorithm_project_spark.operators.linking import (
    semantic_pairs_exact,
    semantic_pairs_lsh,
)

NORMS = [
    "organic photovoltaic", "organic photovoltaics", "organic solar cell",
    "polymer blend", "polymer blends", "P3HT", "bandgap", "band gap",
    "mobility", "perovskite solar cell", "perovskite solar cells",
    "bulk heterojunction", "fill factor", "PCE", "pce",
]


def test_stub_embedder_deterministic_and_normalized():
    a = embed_text("organic photovoltaic")
    b = embed_text("organic photovoltaic")
    assert np.array_equal(a, b)
    assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-12)
    assert np.linalg.norm(embed_text("")) == 0.0
    # case variants embed identically (char_wb_ngrams lowercases)
    assert np.array_equal(embed_text("PCE"), embed_text("pce"))


def test_gram_memo_identical_to_direct_hashing():
    # the per-process (gram, dim) memo is a pure cache: cold-path,
    # warm-path and a cache-bypassing from-scratch computation must
    # produce bit-identical vectors (r6 embed_batch 2.5x)
    from named_entity_algorithm_project_spark.functions import embed as E

    texts = NORMS + ["zinc oxide nanowire", "ZnO", ""]
    E._GRAM_CACHE.clear()
    cold = [E.embed_text(t) for t in texts]
    assert len(E._GRAM_CACHE) > 0  # memo populated
    warm = [E.embed_text(t) for t in texts]
    # from-scratch reference: direct hashing, no cache involvement
    def direct(text, dim=E.DEFAULT_EMBED_DIM):
        v = np.zeros(dim, dtype=np.float64)
        for gram in E.char_wb_ngrams(text or ""):
            bucket, sign = E._gram_bucket_sign(gram, dim)
            v[bucket] += sign
        n = float(np.linalg.norm(v))
        return v / n if n > 0 else v

    for c, w, t in zip(cold, warm, texts):
        assert np.array_equal(c, w), t
        assert np.array_equal(c, direct(t)), t
    # a different dim keys separately (no cross-dim collisions)
    assert np.array_equal(E.embed_text("ZnO", dim=32), direct("ZnO", dim=32))


def test_semantic_exact_matches_numpy_oracle(spark):
    mat = cosine_matrix(NORMS)
    expected = {
        tuple(sorted((NORMS[i], NORMS[j]))): mat[i, j]
        for i in range(len(NORMS))
        for j in range(i + 1, len(NORMS))
    }
    df = spark.createDataFrame([(x,) for x in NORMS], "norm string")
    got = {
        (r["a"], r["b"]): r["score"]
        for r in semantic_pairs_exact(df).collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-12), k


def test_semantic_lsh_subset_with_exact_scores_and_recall(spark):
    df = spark.createDataFrame([(x,) for x in NORMS], "norm string")
    exact = {
        (r["a"], r["b"]): r["score"]
        for r in semantic_pairs_exact(df).collect()
    }
    lsh = {
        (r["a"], r["b"]): r["score"]
        for r in semantic_pairs_lsh(df).collect()
    }
    # candidates are a subset; every emitted score is the exact cosine
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == pytest.approx(exact[k], abs=1e-12)
    # banded-LSH recall on high-cosine pairs (deterministic planes: this is
    # a fixed fact of the seeded fixture, not a flaky sample)
    hot = {k for k, v in exact.items() if v >= 0.9}
    assert hot
    recall = len(hot & set(lsh)) / len(hot)
    assert recall >= 0.8, f"banded-LSH recall {recall:.2f} on cosine>=0.9"


def test_semantic_end_to_end_canonical_parity(spark):
    """Full Stage B+C with score_source=semantic_exact vs the pandas oracle
    running the SAME gates over the numpy N² cosine matrix."""
    from named_entity_algorithm_project_spark import oracle as okg
    from named_entity_algorithm_project_spark.datagen import (
        TRANSCRIPTS_SCHEMA,
        generate_rows,
    )
    from named_entity_algorithm_project_spark.operators.canonical import (
        pick_canonicals,
    )
    from named_entity_algorithm_project_spark.operators.components import (
        connected_components,
    )
    from named_entity_algorithm_project_spark.operators.extract import (
        extract_mentions,
    )
    from named_entity_algorithm_project_spark.operators.linking import (
        build_linking_tables,
    )

    rows = generate_rows(n_convs=80, seed=31)
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    o_mentions, o_abbrevs = okg.oracle_mentions(pdf)
    oracle_map, _ = okg.oracle_linking(
        o_mentions, o_abbrevs, score_source="semantic"
    )

    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    mentions, abbrevs = extract_mentions(df)
    linking = build_linking_tables(
        mentions, abbrevs, score_source="semantic_exact"
    )
    nodes = (
        linking.norms.select("norm")
        .unionByName(linking.extra_nodes.select("norm"))
        .distinct()
    )
    comps = connected_components(nodes, linking.edges)
    cmap = {
        r["norm"]: r["canonical"]
        for r in pick_canonicals(comps, linking.norms).collect()
    }
    diffs = {
        k: (cmap.get(k), oracle_map.get(k))
        for k in set(cmap) | set(oracle_map)
        if cmap.get(k, k) != oracle_map.get(k, k)
    }
    assert not diffs, f"semantic canonical-map mismatches: {diffs}"
    # the semantic path must actually merge something on this corpus
    assert any(k != v for k, v in cmap.items())


def test_pipeline_accepts_semantic_score_source(spark, tmp_path):
    from named_entity_algorithm_project_spark.datagen import (
        TRANSCRIPTS_SCHEMA,
        generate_rows,
    )
    from named_entity_algorithm_project_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    rows = generate_rows(n_convs=15, seed=33)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    res = run_pipeline(
        spark,
        df,
        str(tmp_path / "sem"),
        config=PipelineConfig(n_buckets=2, score_source="semantic_lsh"),
        resume=False,
    )
    assert res.triples.count() > 0


def test_band_knobs_thread_through_and_cap_enforced(spark, tmp_path):
    """PipelineConfig.embed_bands/embed_band_bits reach semantic_pairs_lsh
    (more bands -> candidate superset at identical exact scores), and the
    63-plane signature cap raises a clear error."""
    from named_entity_algorithm_project_spark.operators.linking import (
        semantic_pairs_lsh,
    )

    norms = [f"poly{i}material" for i in range(60)] + [
        "polyAmaterial", "polyAmateria1",
    ]
    df = spark.createDataFrame([(n,) for n in norms], "norm string")
    # NOTE: different (bands, band_bits) combos reseed the hyperplane set
    # (n_planes changes), so candidate sets are NOT nested across configs —
    # the invariant is that every emitted score is the exact cosine.
    import numpy as np

    from named_entity_algorithm_project_spark.functions.embed import embed_batch

    emb = {n: v for n, v in zip(norms, embed_batch(norms))}
    few = semantic_pairs_lsh(df, bands=2, band_bits=4).collect()
    many = semantic_pairs_lsh(df, bands=12, band_bits=4).collect()
    assert len(many) > len(few)  # 12 bands collide far more than 2
    for r in few + many:
        assert abs(r["score"] - float(emb[r["a"]] @ emb[r["b"]])) < 1e-9

    with pytest.raises(ValueError, match="63"):
        semantic_pairs_lsh(df, bands=16, band_bits=4)  # 64 planes

    # the pipeline threads the knobs: an over-cap config fails fast
    from named_entity_algorithm_project_spark.datagen import (
        TRANSCRIPTS_SCHEMA,
        generate_rows,
    )
    from named_entity_algorithm_project_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    rows = generate_rows(n_convs=6, seed=23)
    tdf = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    with pytest.raises(ValueError, match="63"):
        run_pipeline(
            spark, tdf, str(tmp_path / "overcap"),
            config=PipelineConfig(
                n_buckets=2, score_source="semantic_lsh",
                embed_bands=32, embed_band_bits=4,
            ),
            resume=False,
        )
    # and a legal non-default combo runs end-to-end
    res = run_pipeline(
        spark, tdf, str(tmp_path / "legal"),
        config=PipelineConfig(
            n_buckets=2, score_source="semantic_lsh",
            embed_bands=12, embed_band_bits=5,
        ),
        resume=False,
    )
    assert res.triples.count() > 0


def test_semantic_lsh_auto_tier_selection(spark, monkeypatch):
    """Bands×bits AUTO keys off the vocabulary size exactly like the
    TF-IDF df-cap AUTO: 8x4 at/below the boundary, 10x6 above; an explicit
    dial always wins over the tier."""
    from named_entity_algorithm_project_spark.operators import linking

    # the tier function flips exactly at the boundary
    assert linking.semantic_lsh_tier(linking.SEMANTIC_AUTO_TIER_VOCAB) == (8, 4)
    assert linking.semantic_lsh_tier(linking.SEMANTIC_AUTO_TIER_VOCAB + 1) == (
        10,
        6,
    )

    # build_linking_tables resolves None dials through the tier (spied via
    # a recording wrapper; boundary shrunk so a test-sized corpus crosses it)
    from named_entity_algorithm_project_spark.datagen import (
        TRANSCRIPTS_SCHEMA,
        generate_rows,
    )
    from named_entity_algorithm_project_spark.operators.extract import (
        extract_mentions,
    )

    rows = generate_rows(n_convs=10, seed=5)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    mentions, abbrevs = extract_mentions(df)

    calls = []
    real = linking.semantic_pairs_lsh

    def spy(norms, dim=64, bands=8, band_bits=4):
        calls.append((bands, band_bits))
        return real(norms, dim=dim, bands=bands, band_bits=band_bits)

    monkeypatch.setattr(linking, "semantic_pairs_lsh", spy)

    linking.build_linking_tables(mentions, abbrevs, score_source="semantic_lsh")
    assert calls[-1] == (8, 4)  # small vocab -> base tier

    monkeypatch.setattr(linking, "SEMANTIC_AUTO_TIER_VOCAB", 1)
    linking.build_linking_tables(mentions, abbrevs, score_source="semantic_lsh")
    assert calls[-1] == (10, 6)  # past the boundary -> scale tier

    linking.build_linking_tables(
        mentions, abbrevs, score_source="semantic_lsh",
        embed_bands=6, embed_band_bits=5,
    )
    assert calls[-1] == (6, 5)  # explicit dials beat the AUTO tier
