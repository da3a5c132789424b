"""End-to-end knowledge-graph construction pipeline.

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      Stage A  extract    — Arrow-UDF mention detection, checkpointed per
                            conv_id hash-bucket with lineage rows (resume
                            skips committed buckets)
      Stage B  link       — TF-IDF inverted-index similarity + abbrev/alias
                            edges (salted aggregation)
      Stage C  canonical  — iterative-join connected components + pick
      Stage D  triples    — nearest-property join -> (subj, pred, obj)
      Stage E  materialize— entities, triples, alias_groups, canonical_map,
                            metrics tables

Partitioning contract: transcripts are repartitioned by conv_id with
sortWithinPartitions(conv_id, turn_idx) before extraction — the stable
ordering invariant the per-turn text-equality check relies on. Buckets are
``pmod(xxhash64(conv_id), n_buckets)`` so a conversation never spans two
checkpoint units.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Dict, List, Mapping, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .detector import DEFAULT_CONFIDENCE_THRESHOLD
from .io_tables import (
    StageAPaths,
    commit_bucket,
    commit_buckets_batch,
    committed_buckets,
    read_stage_a,
    write_table,
)
from .operators.canonical import (
    alias_groups,
    apply_canonical_map,
    apply_user_overrides,
    pick_canonicals,
)
from .operators.components import connected_components
from .operators.extract import extract_combined
from .operators.linking import build_linking_tables
from .operators.triples import build_triples, mention_triples, same_as_triples


@dataclass
class PipelineConfig:
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD
    n_buckets: int = 8
    salt_partitions: int = 16
    candidate_max_df: Optional[int] = None
    user_entities: List[Tuple[str, str]] = field(default_factory=list)
    user_canonical: Optional[Mapping[str, List[str]]] = None
    merge_map: Optional[Mapping[str, str]] = None
    # Stage-A commit strategy. "batch" (default) writes every pending bucket
    # in ONE job (partitionBy(bucket) + dynamic overwrite) and then commits
    # the per-bucket lineage markers — at 1000 buckets the per-job fixed
    # cost of the sequential loop would dominate the stage. "sequential"
    # keeps the one-job-per-bucket loop: finer mid-stage failure granularity
    # (a crash loses at most one bucket's work instead of the in-flight
    # batch), useful when extraction wall >> job overhead.
    stage_a_mode: str = "batch"
    # replicate the reference's OBSERVED lonely-unit pass (a no-op) instead
    # of the pinned self-excluded semantics — detector._postfilter docstring
    reference_strict: bool = False
    # span detector: "deterministic" (reference DummyPipeline path) or
    # "neural[:<hf-model>]" (X2/X3: chunking + per-worker model singleton +
    # batched inference; ":stub" in model-less environments)
    detector: str = "deterministic"
    # linking candidate scorer: "tfidf" (reference primary path),
    # "semantic_exact" (L4 embedding cosine, O(N²) — small vocab), or
    # "semantic_lsh" (L4 banded-LSH blocked — the scale path)
    score_source: str = "tfidf"


@dataclass
class PipelineResult:
    mentions: DataFrame
    canonical_map: DataFrame
    entities: DataFrame
    triples: DataFrame
    lineage: List[dict]
    output_dir: str = ""
    metrics: Optional[DataFrame] = None


def ordered_transcripts(transcripts: DataFrame, n_partitions: Optional[int] = None) -> DataFrame:
    """Stable (conv_id, turn_idx) layout (north-rule invariant)."""
    parts = n_partitions or transcripts.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return transcripts.repartition(int(parts), "conv_id").sortWithinPartitions(
        "conv_id", "turn_idx"
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    output_dir: str,
    config: Optional[PipelineConfig] = None,
    resume: bool = True,
    fail_after_buckets: Optional[int] = None,
) -> PipelineResult:
    """Run (or resume) the full pipeline, materializing under output_dir.

    ``fail_after_buckets`` injects a crash after k Stage-A bucket commits —
    used by the resume tests only.
    """
    config = config or PipelineConfig()
    paths = StageAPaths(output_dir)
    run_id = uuid.uuid4().hex[:12]

    # ---------------- Stage A: bucketed, checkpointed extraction ----------
    bucketed = ordered_transcripts(transcripts).withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.col("conv_id")), F.lit(config.n_buckets)).cast("int"),
    )
    done = set(committed_buckets(spark, paths)) if resume else set()
    lineage_rows: List[dict] = []
    pending = [b for b in range(config.n_buckets) if b not in done]
    if pending and config.stage_a_mode == "batch":
        subset = (
            bucketed.filter(F.col("bucket").isin(pending)) if done else bucketed
        )
        extracted = extract_combined(
            subset,
            key_cols=("conv_id", "turn_idx", "bucket"),
            confidence_threshold=config.confidence_threshold,
            user_entities=config.user_entities,
            reference_strict=config.reference_strict,
            detector=config.detector,
        )
        lineage_rows = commit_buckets_batch(
            spark,
            paths,
            pending,
            extracted,
            run_id,
            fail_after_buckets=fail_after_buckets,
        )
    elif pending:
        # Cache the bucketed input once; each bucket job filters it.
        bucketed = bucketed.persist()
        try:
            for i, bucket in enumerate(pending):
                if fail_after_buckets is not None and i >= fail_after_buckets:
                    raise RuntimeError(
                        f"injected failure after {fail_after_buckets} buckets"
                    )
                subset = bucketed.filter(F.col("bucket") == bucket)
                extracted = extract_combined(
                    subset,
                    confidence_threshold=config.confidence_threshold,
                    user_entities=config.user_entities,
                    reference_strict=config.reference_strict,
                    detector=config.detector,
                )
                lineage_rows.append(
                    commit_bucket(spark, paths, bucket, extracted, run_id)
                )
        finally:
            bucketed.unpersist()

    mentions_raw, abbrevs = read_stage_a(spark, paths)

    # ---------------- Stage B: linking ------------------------------------
    linking = build_linking_tables(
        mentions_raw,
        abbrevs,
        salt_partitions=config.salt_partitions,
        candidate_max_df=config.candidate_max_df,
        score_source=config.score_source,
    )

    # ---------------- Stage C: components + canonical pick ----------------
    node_universe = (
        linking.norms.select("norm")
        .unionByName(linking.extra_nodes.select("norm"))
        .distinct()
    )
    components = connected_components(node_universe, linking.edges)
    canonical_map = pick_canonicals(components, linking.norms).persist()

    mentions = apply_canonical_map(mentions_raw, canonical_map)
    mentions = apply_user_overrides(
        mentions,
        user_canonical=config.user_canonical,
        merge_map=config.merge_map,
    )

    # ---------------- Stage D: triples ------------------------------------
    has_value = build_triples(mentions)
    mention_facts = mention_triples(mentions)
    same_as = same_as_triples(canonical_map).withColumns(
        {
            "conv_id": F.lit(None).cast("string"),
            "turn_idx": F.lit(None).cast("int"),
            "confidence": F.lit(1.0),
        }
    )
    triples = has_value.unionByName(mention_facts).unionByName(same_as)

    # ---------------- Stage E: materialize --------------------------------
    entities = mentions.select(
        "conv_id",
        "turn_idx",
        "entity",
        "entity_norm",
        "entity_type",
        "confidence",
        "start",
        "end",
        "is_user_entity",
        "norm",
        "canonical",
        "canonical_display",
    )
    write_table(
        entities.repartition(F.col("conv_id")),
        os.path.join(output_dir, "entities_canonical"),
    )
    # pipeline-level metrics (the lineage table holds per-bucket Stage-A
    # rows; this table holds the downstream-stage counters the reference
    # surfaced as run stats, app.py:3523-3601). Per-pred counts ride the
    # triples WRITE job via observe — the predicate vocabulary is closed,
    # so no separate groupBy job (and no triples persist) is needed.
    from pyspark.sql import Observation

    obs = Observation("stage_e_triples")
    triples_observed = triples.observe(
        obs,
        *[
            F.coalesce(
                F.sum(F.when(F.col("pred") == p, 1).otherwise(0)), F.lit(0)
            ).alias(f"n_{p}")
            for p in ("has_value", "mentions", "same_as")
        ],
    )
    # repartition on (pred, conv_id): partitionBy(pred) still writes clean
    # per-pred directories, but the write parallelizes across all tasks —
    # repartitioning on pred alone would funnel everything through 3 tasks
    # (one per predicate), a data-proportional serial choke
    write_table(
        triples_observed.repartition(F.col("pred"), F.col("conv_id")),
        os.path.join(output_dir, "triples"),
        partition_by=["pred"],
    )
    try:
        pred_counts = obs.get
    except Exception:
        # zero-row input: the CollectMetrics row never materializes and
        # obs.get trips a JVM assertion — fall back to counting the (empty)
        # written table directly
        rb = spark.read.schema(triples.schema).parquet(
            os.path.join(output_dir, "triples")
        )
        cnt = {
            r["pred"]: r["n"]
            for r in rb.groupBy("pred")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        pred_counts = {
            f"n_{p}": cnt.get(p, 0)
            for p in ("has_value", "mentions", "same_as")
        }
    # one multi-agg job for both canonical-map counters (was two jobs)
    cm_stats = canonical_map.agg(
        F.count(F.lit(1)).alias("n_norms"),
        F.coalesce(
            F.sum(
                F.when(F.col("norm") != F.col("canonical"), 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_merged"),
    ).collect()[0]
    metrics_rows = [
        ("base_threshold", float(linking.base_threshold)),
        ("n_canonical_norms", float(cm_stats["n_norms"])),
        ("n_merged_norms", float(cm_stats["n_merged"])),
        ("n_triples_has_value", float(pred_counts["n_has_value"])),
        ("n_triples_mentions", float(pred_counts["n_mentions"])),
        ("n_triples_same_as", float(pred_counts["n_same_as"])),
    ]
    metrics = spark.createDataFrame(metrics_rows, "metric string, value double")
    write_table(metrics.coalesce(1), os.path.join(output_dir, "metrics"))
    write_table(canonical_map, os.path.join(output_dir, "canonical_map"))
    write_table(
        alias_groups(canonical_map), os.path.join(output_dir, "alias_groups")
    )

    # read back with explicit schemas: empty tables have no part files to
    # infer from
    entities_rb = spark.read.schema(entities.schema).parquet(
        os.path.join(output_dir, "entities_canonical")
    )
    triples_rb = spark.read.schema(triples.schema).parquet(
        os.path.join(output_dir, "triples")
    )
    canonical_map.unpersist()
    return PipelineResult(
        mentions=entities_rb,
        canonical_map=spark.read.schema(canonical_map.schema).parquet(
            os.path.join(output_dir, "canonical_map")
        ),
        entities=entities_rb,
        triples=triples_rb,
        lineage=lineage_rows,
        output_dir=output_dir,
        metrics=spark.read.schema(metrics.schema).parquet(
            os.path.join(output_dir, "metrics")
        ),
    )
