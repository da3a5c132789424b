"""Incremental transcript ingestion via Structured Streaming.

The reference is batch-only (SURVEY §2.9); its "cached re-entry" (EP2) is
incremental view maintenance over immutable base results. The streaming
analog: an append-only transcripts directory consumed with a file source,
each micro-batch running the SAME Stage-A extraction transform and appending
to the extraction table, with Spark's own checkpoint directory providing
exactly-once file tracking. Downstream stages (linking, components, triples)
are corpus-global — they rerun over the accumulated extraction table per
the batch pipeline, exactly like the reference reapplies downstream passes
over cached extraction results.

``foreachBatch`` is used (not a plain writeStream sink) so each batch write
also appends a lineage/metrics row — the streaming twin of
io_tables.commit_bucket.
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import TRANSCRIPTS_SCHEMA
from ..operators.extract import extract_combined


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    confidence_threshold: float = 0.5,
    trigger_available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Stream new transcript parquet files through Stage-A extraction.

    Returns the StreamingQuery. With ``trigger_available_now`` the query
    drains everything currently present and stops — the incremental-batch
    mode a scheduled ingestion job uses; otherwise it runs continuously.
    """
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    extraction_path = os.path.join(output_dir, "stage_a", "extraction_stream")
    lineage_path = os.path.join(output_dir, "lineage_stream")
    checkpoint = os.path.join(output_dir, "_stream_checkpoint")

    def _process_batch(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        extracted = extract_combined(
            batch_df, confidence_threshold=confidence_threshold
        ).persist()
        extracted.write.mode("append").parquet(extraction_path)
        stats = extracted.agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.coalesce(F.sum(F.size("ex.mentions")), F.lit(0)).alias("n_mentions"),
        ).collect()[0]
        extracted.unpersist()
        lineage = spark.createDataFrame(
            [
                (
                    int(batch_id),
                    int(stats["n_turns"]),
                    int(stats["n_mentions"]),
                    int((time.time() - t0) * 1000),
                )
            ],
            "batch_id long, n_turns long, n_mentions long, wall_ms long",
        )
        lineage.coalesce(1).write.mode("append").parquet(lineage_path)

    writer = (
        stream.writeStream.foreachBatch(_process_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
