"""End-to-end Spark-vs-pandas-oracle parity (BASELINE.md triple quality gate).

The oracle (named_entity_algorithm_project_spark.oracle) re-implements every
stage single-process; the Spark pipeline must reproduce its mention table and
canonical map exactly, and its (subj, pred, obj) has_value set at P/R >= 0.95
(float edge effects in TF-IDF cosine thresholds are the only tolerated
source of divergence).
"""

import pandas as pd
import pytest

from named_entity_algorithm_project_spark import oracle as okg
from named_entity_algorithm_project_spark.datagen import (
    TRANSCRIPTS_SCHEMA,
    generate_rows,
)
from named_entity_algorithm_project_spark.pipeline import PipelineConfig, run_pipeline

N_CONVS = 300
SEED = 42


@pytest.fixture(scope="module")
def rows():
    return generate_rows(n_convs=N_CONVS, seed=SEED)


@pytest.fixture(scope="module")
def oracle_result(rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return okg.run_oracle(pdf)


@pytest.fixture(scope="module")
def spark_result(spark, rows, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_out"))
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    return run_pipeline(
        spark, df, out, config=PipelineConfig(n_buckets=4), resume=False
    )


def _mention_key(row):
    return (
        row["conv_id"],
        int(row["turn_idx"]),
        row["entity"],
        row["entity_type"],
        None if pd.isna(row["start"]) else int(row["start"]),
    )


def test_mentions_exact_parity(oracle_result, spark_result):
    spark_pdf = spark_result.entities.toPandas()
    oracle_pdf = oracle_result["mentions"]
    s = sorted(_mention_key(r) for _, r in spark_pdf.iterrows())
    o = sorted(_mention_key(r) for _, r in oracle_pdf.iterrows())
    assert len(s) > 100
    assert s == o


def test_canonical_map_parity(oracle_result, spark_result):
    spark_map = {
        r["norm"]: r["canonical"]
        for _, r in spark_result.canonical_map.toPandas().iterrows()
    }
    oracle_map = dict(oracle_result["canonical_map"])
    only_spark = {k for k in spark_map if spark_map[k] != oracle_map.get(k, k)}
    only_oracle = {k for k in oracle_map if oracle_map[k] != spark_map.get(k, k)}
    diffs = {
        k: (spark_map.get(k), oracle_map.get(k)) for k in only_spark | only_oracle
    }
    assert not diffs, f"canonical map mismatches: {diffs}"


def test_triples_precision_recall(oracle_result, spark_result):
    spark_triples = {
        (r["subj"], r["obj"], r["conv_id"], int(r["turn_idx"]))
        for _, r in spark_result.triples.toPandas().iterrows()
        if r["pred"] == "has_value"
    }
    oracle_triples = {
        (
            r["subj"] if pd.notna(r["subj"]) else None,
            r["obj"] if pd.notna(r["obj"]) else None,
            r["conv_id"],
            int(r["turn_idx"]),
        )
        for _, r in oracle_result["triples"].iterrows()
    }
    spark_triples = {
        (s if pd.notna(s) else None, o if pd.notna(o) else None, c, t)
        for s, o, c, t in spark_triples
    }
    assert oracle_triples, "oracle emitted no triples"
    tp = len(spark_triples & oracle_triples)
    precision = tp / max(len(spark_triples), 1)
    recall = tp / max(len(oracle_triples), 1)
    assert precision >= 0.95, (
        f"precision {precision:.4f}; spark-only sample: "
        f"{sorted(spark_triples - oracle_triples)[:10]}"
    )
    assert recall >= 0.95, (
        f"recall {recall:.4f}; oracle-only sample: "
        f"{sorted(oracle_triples - spark_triples)[:10]}"
    )


def test_same_as_triples_consistent(oracle_result, spark_result):
    spark_same_as = {
        (r["subj"], r["obj"])
        for _, r in spark_result.triples.toPandas().iterrows()
        if r["pred"] == "same_as"
    }
    oracle_same_as = {
        (v, c) for v, c in oracle_result["canonical_map"].items() if v != c
    }
    assert spark_same_as == oracle_same_as
