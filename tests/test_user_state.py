"""User-state operators: canonical overrides (J4), merge-chain resolution
(J5), user-entity gazetteer through the full pipeline (X7)."""

import pytest
from pyspark.sql import functions as F

from named_entity_algorithm_project_spark.datagen import (
    TRANSCRIPTS_SCHEMA,
    generate_rows,
)
from named_entity_algorithm_project_spark.operators.canonical import (
    resolve_merge_chains,
)
from named_entity_algorithm_project_spark.pipeline import PipelineConfig, run_pipeline


def test_resolve_merge_chains():
    # app.py:1797-1816 path compression, cycle-safe
    assert resolve_merge_chains({"a": "b", "b": "c", "c": "d"}) == {
        "a": "d", "b": "d", "c": "d",
    }
    # cycles self-resolve -> the apply step drops identity rewrites (no-op)
    assert resolve_merge_chains({"x": "y", "y": "x"}) == {"x": "x", "y": "y"}
    assert resolve_merge_chains({}) == {}


def test_pipeline_user_state(spark, tmp_path):
    rows = generate_rows(n_convs=30, seed=13)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    cfg = PipelineConfig(
        n_buckets=2,
        user_entities=[("inert atmosphere", "O")],
        user_canonical={"Perovskite Materials": ["mapbi3"]},
        merge_map={"bandgap": "band gap energy"},
    )
    result = run_pipeline(
        spark, df, str(tmp_path / "out"), config=cfg, resume=False
    )
    ents = result.entities

    # X7: the user gazetteer term appears with confidence 1.0 and its type
    user_rows = ents.filter(F.col("is_user_entity")).collect()
    assert user_rows, "user entity never injected"
    assert all(r["confidence"] == 1.0 for r in user_rows)
    assert all(r["entity_norm"] == "inert atmosphere" for r in user_rows)

    # J4: variant rewritten to the user canonical (case-insensitive key)
    mapbi = ents.filter(F.lower(F.col("entity")) == "mapbi3").collect()
    assert mapbi, "expected MAPbI3 mentions in the corpus"
    assert all(r["canonical"] == "Perovskite Materials" for r in mapbi)
    assert all(r["canonical_display"] == "PEROVSKITE MATERIALS" for r in mapbi)

    # J5: merge map rewrote the canonical for 'bandgap' mentions
    bg = ents.filter(F.col("norm") == "bandgap").collect()
    assert bg
    assert all(r["canonical"] == "band gap energy" for r in bg)


def test_value_types_skip_overrides(spark, tmp_path):
    rows = generate_rows(n_convs=15, seed=14)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    # an override keyed on a numeric value must NOT apply (app.py:1769-1771)
    values = None
    base = run_pipeline(
        spark, df, str(tmp_path / "base"), config=PipelineConfig(n_buckets=1),
        resume=False,
    )
    some_value = (
        base.entities.filter(F.col("entity_type") == "PROP_VALUE")
        .select("entity")
        .first()["entity"]
    )
    cfg = PipelineConfig(
        n_buckets=1,
        user_canonical={"SHOULD NOT APPLY": [some_value.lower()]},
    )
    result = run_pipeline(
        spark, df, str(tmp_path / "out2"), config=cfg, resume=False
    )
    vrows = result.entities.filter(
        (F.col("entity") == some_value) & (F.col("entity_type") == "PROP_VALUE")
    ).collect()
    assert vrows
    assert all(r["canonical"] != "SHOULD NOT APPLY" for r in vrows)


def test_resume_reapplies_new_user_state(spark, tmp_path):
    """EP2/EP3 analog (app.py:4721-4784, 2149-2201): re-entry with changed
    user state reuses committed Stage-A extraction and recomputes only the
    downstream stages with the new overrides."""
    rows = generate_rows(n_convs=12, seed=15)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    out = str(tmp_path / "re")

    first = run_pipeline(
        spark, df, out, config=PipelineConfig(n_buckets=2), resume=False
    )
    assert len(first.lineage) == 2
    base_canon = {
        r["norm"]: r["canonical"]
        for r in first.entities.select("norm", "canonical").distinct().collect()
    }

    second = run_pipeline(
        spark,
        df,
        out,
        config=PipelineConfig(
            n_buckets=2, merge_map={"mobility": "charge mobility"}
        ),
        resume=True,
    )
    assert second.lineage == []  # extraction NOT recomputed
    new_canon = {
        r["norm"]: r["canonical"]
        for r in second.entities.select("norm", "canonical").distinct().collect()
    }
    assert new_canon["mobility"] == "charge mobility"
    # everything else unchanged
    unchanged = {k: v for k, v in base_canon.items() if v != "mobility"}
    for k, v in unchanged.items():
        assert new_canon[k] == v
