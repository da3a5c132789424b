"""Per-row invariant (BASELINE.json input_hint): per-turn text equality under
stable (conv_id, turn_idx) ordering after repartition(conv_id) +
sortWithinPartitions."""

from pyspark.sql import functions as F

from named_entity_algorithm_project_spark.datagen import (
    TRANSCRIPTS_SCHEMA,
    generate_rows,
)
from named_entity_algorithm_project_spark.pipeline import ordered_transcripts


def test_per_turn_text_equality_after_repartition(spark):
    rows = generate_rows(n_convs=50, seed=9)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    ordered = ordered_transcripts(df, n_partitions=7)

    # 1. no row lost/duplicated, text identical per (conv_id, turn_idx)
    original = {(r[0], r[1]): r[3] for r in rows}
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in ordered.collect()
    }
    assert got == original

    # 2. a conversation never spans partitions, and rows are sorted by
    # (conv_id, turn_idx) within each partition
    part_rows = ordered.select(
        F.spark_partition_id().alias("pid"), "conv_id", "turn_idx"
    ).collect()
    by_pid = {}
    conv_to_pid = {}
    for r in part_rows:
        by_pid.setdefault(r["pid"], []).append((r["conv_id"], r["turn_idx"]))
        prev = conv_to_pid.setdefault(r["conv_id"], r["pid"])
        assert prev == r["pid"], f"conversation {r['conv_id']} spans partitions"
    for pid, keys in by_pid.items():
        assert keys == sorted(keys), f"partition {pid} not sorted"


def test_turn_indices_dense_in_generator(spark):
    rows = generate_rows(n_convs=20, seed=10)
    by_conv = {}
    for conv_id, turn_idx, *_ in rows:
        by_conv.setdefault(conv_id, []).append(turn_idx)
    for conv, idxs in by_conv.items():
        assert idxs == list(range(len(idxs))), conv
