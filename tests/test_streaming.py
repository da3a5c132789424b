"""Incremental (Structured Streaming) extraction: exactly-once file intake,
append-only extraction table, lineage rows per micro-batch."""

import os

from named_entity_algorithm_project_spark.datagen import (
    TRANSCRIPTS_SCHEMA,
    generate_rows,
)
from named_entity_algorithm_project_spark.streaming import incremental_extract


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_extract_drains_and_resumes(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    rows = generate_rows(n_convs=12, seed=21)
    half = len(rows) // 2

    # batch 1: first half
    _write_batch(spark, rows[:half], input_dir)
    q = incremental_extract(spark, input_dir, out_dir)
    q.awaitTermination(120)

    ex_path = os.path.join(out_dir, "stage_a", "extraction_stream")
    first_count = spark.read.parquet(ex_path).count()
    assert first_count == half

    # batch 2: second half appended; restart drains ONLY the new file
    _write_batch(spark, rows[half:], input_dir)
    q2 = incremental_extract(spark, input_dir, out_dir)
    q2.awaitTermination(120)

    final = spark.read.parquet(ex_path)
    assert final.count() == len(rows)  # no duplicates: checkpoint tracked files
    # every turn extracted exactly once
    assert final.select("conv_id", "turn_idx").distinct().count() == len(rows)

    lineage = spark.read.parquet(os.path.join(out_dir, "lineage_stream"))
    rows_l = lineage.collect()
    assert len(rows_l) == 2
    assert sum(r["n_turns"] for r in rows_l) == len(rows)


def test_batch_replay_is_idempotent(spark, tmp_path):
    """A retried micro-batch (same batch_id) must not duplicate rows: the
    data write is dynamic-partition-overwrite of batch_id=K, and a batch
    whose lineage marker exists is skipped outright."""
    from named_entity_algorithm_project_spark.streaming import process_batch

    out_dir = str(tmp_path / "out_replay")
    ex_path = os.path.join(out_dir, "ex")
    ln_path = os.path.join(out_dir, "ln")
    rows = generate_rows(n_convs=6, seed=23)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)

    assert process_batch(spark, df, 0, ex_path, ln_path) is True
    n1 = spark.read.parquet(ex_path).count()
    assert n1 == len(rows)

    # full replay after commit: skipped, nothing changes
    assert process_batch(spark, df, 0, ex_path, ln_path) is False
    assert spark.read.parquet(ex_path).count() == n1
    assert spark.read.parquet(ln_path).count() == 1

    # partial-failure replay: data written but marker missing -> the rerun
    # overwrites the partition in place (still no duplicates)
    import shutil

    shutil.rmtree(os.path.join(ln_path, "batch_id=0"))
    assert process_batch(spark, df, 0, ex_path, ln_path) is True
    assert spark.read.parquet(ex_path).count() == n1
    assert (
        spark.read.parquet(ex_path)
        .select("conv_id", "turn_idx")
        .distinct()
        .count()
        == len(rows)
    )


def test_streaming_output_matches_batch(spark, tmp_path):
    from named_entity_algorithm_project_spark.operators.extract import (
        extract_mentions,
        split_extraction,
    )

    input_dir = str(tmp_path / "in2")
    out_dir = str(tmp_path / "out2")
    rows = generate_rows(n_convs=10, seed=22)
    _write_batch(spark, rows, input_dir)

    q = incremental_extract(spark, input_dir, out_dir)
    q.awaitTermination(120)

    streamed = spark.read.parquet(
        os.path.join(out_dir, "stage_a", "extraction_stream")
    )
    stream_mentions, _ = split_extraction(streamed)
    batch_mentions, _ = extract_mentions(
        spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    )

    def key_set(df):
        return {
            (r["conv_id"], r["turn_idx"], r["entity"], r["entity_type"], r["start"])
            for r in df.collect()
        }

    assert key_set(stream_mentions) == key_set(batch_mentions)
