"""Table I/O: Iceberg-or-parquet sinks plus the lineage/commit protocol.

Production target is Iceberg (``df.writeTo(table).append()``, snapshot-based
resume); this sandbox has no Iceberg runtime, so the same interface writes
partitioned parquet directories with an explicit per-bucket lineage table
that plays the role of Iceberg's commit log:

    <root>/stage_a/mentions/bucket=K/   (data, written first)
    <root>/stage_a/abbrevs/bucket=K/
    <root>/lineage/bucket=K/            (single-row commit marker,
                                         written LAST = the commit point)

Resume = read the lineage table, skip committed buckets, reprocess the rest.
A bucket whose data write succeeded but whose lineage write didn't is
rewritten from scratch (overwrite mode), so partial data is never read —
the reader only ever lists buckets present in lineage.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.extract import ABBREVS_TABLE_SCHEMA, MENTIONS_TABLE_SCHEMA

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_mentions", T.LongType(), False),
        T.StructField("n_abbrevs", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), True),
        T.StructField("run_id", T.StringType(), False),
    ]
)


@dataclass
class StageAPaths:
    root: str

    @property
    def mentions(self) -> str:
        return os.path.join(self.root, "stage_a", "mentions")

    @property
    def abbrevs(self) -> str:
        return os.path.join(self.root, "stage_a", "abbrevs")

    @property
    def lineage(self) -> str:
        return os.path.join(self.root, "lineage")

    def mentions_bucket(self, bucket: int) -> str:
        return os.path.join(self.mentions, f"bucket={bucket}")

    def abbrevs_bucket(self, bucket: int) -> str:
        return os.path.join(self.abbrevs, f"bucket={bucket}")

    def lineage_bucket(self, bucket: int) -> str:
        return os.path.join(self.lineage, f"bucket={bucket}")


def committed_buckets(spark: SparkSession, paths: StageAPaths) -> List[int]:
    """Buckets whose lineage marker exists — the only source of truth."""
    if not os.path.isdir(paths.lineage):
        return []
    out = []
    for name in sorted(os.listdir(paths.lineage)):
        if name.startswith("bucket="):
            full = os.path.join(paths.lineage, name)
            if any(f.endswith(".parquet") for f in os.listdir(full)):
                out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def read_lineage(spark: SparkSession, paths: StageAPaths) -> Optional[DataFrame]:
    buckets = committed_buckets(spark, paths)
    if not buckets:
        return None
    return spark.read.parquet(
        *[paths.lineage_bucket(b) for b in buckets]
    )


def commit_bucket(
    spark: SparkSession,
    paths: StageAPaths,
    bucket: int,
    mentions: DataFrame,
    abbrevs: DataFrame,
    run_id: str,
) -> dict:
    """Write one bucket's Stage-A output, lineage marker last."""
    t0 = time.time()
    mentions.write.mode("overwrite").parquet(paths.mentions_bucket(bucket))
    abbrevs.write.mode("overwrite").parquet(paths.abbrevs_bucket(bucket))

    m = spark.read.schema(MENTIONS_TABLE_SCHEMA).parquet(paths.mentions_bucket(bucket))
    a = spark.read.schema(ABBREVS_TABLE_SCHEMA).parquet(paths.abbrevs_bucket(bucket))
    n_mentions = m.count()
    n_abbrevs = a.count()
    n_turns = m.select("conv_id", "turn_idx").distinct().count()
    wall_ms = int((time.time() - t0) * 1000)

    row = [(bucket, n_turns, n_mentions, n_abbrevs, wall_ms, None, run_id)]
    lineage = spark.createDataFrame(row, LINEAGE_SCHEMA).withColumn(
        "committed_at", F.current_timestamp()
    )
    # marker write is the commit point
    lineage.coalesce(1).write.mode("overwrite").parquet(
        paths.lineage_bucket(bucket)
    )
    return {
        "bucket": bucket,
        "n_turns": n_turns,
        "n_mentions": n_mentions,
        "n_abbrevs": n_abbrevs,
        "wall_ms": wall_ms,
    }


def read_stage_a(
    spark: SparkSession, paths: StageAPaths
) -> tuple[DataFrame, DataFrame]:
    """Read ONLY committed buckets (lineage-gated)."""
    buckets = committed_buckets(spark, paths)
    if not buckets:
        raise FileNotFoundError(f"no committed Stage-A buckets under {paths.root}")
    mentions = spark.read.schema(MENTIONS_TABLE_SCHEMA).parquet(
        *[paths.mentions_bucket(b) for b in buckets]
    )
    abbrevs = spark.read.schema(ABBREVS_TABLE_SCHEMA).parquet(
        *[paths.abbrevs_bucket(b) for b in buckets]
    )
    return mentions, abbrevs


def write_table(df: DataFrame, path: str, partition_by: Optional[List[str]] = None) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
