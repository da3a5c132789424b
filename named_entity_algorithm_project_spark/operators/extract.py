"""Stage A — mention extraction over transcripts.

One Arrow-batched pandas UDF runs the deterministic detector
(:mod:`..detector`) per text; the Spark plan around it is pure DataFrame:

    transcripts --(pandas_udf: text -> struct<mentions,abbreviations>)-->
      posexplode(mentions)  -> mentions DF
      posexplode(abbrevs)   -> abbreviation-pairs DF

Scale notes:
* The UDF is the only Python in the stage and is Arrow-batched
  (spark.sql.execution.arrow.maxRecordsPerBatch controls batch size); no
  per-row Python UDFs anywhere (north-rule requirement).
* Extraction is embarrassingly parallel per turn — a narrow map, no shuffle.
  The caller decides partitioning; the pipeline repartitions by conv_id
  beforehand so downstream per-conversation joins reuse the layout.
* User gazetteer terms ship as a plain closure list (small dimension —
  an implicit broadcast); patterns compile once per executor worker.

Reference semantics: app.py:3619-3933 (see detector.py docstring for the
line-by-line mapping).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..detector import DEFAULT_CONFIDENCE_THRESHOLD, compile_user_patterns, extract_turn

MENTION_STRUCT = T.StructType(
    [
        T.StructField("entity", T.StringType(), False),
        T.StructField("entity_norm", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("start", T.IntegerType(), True),
        T.StructField("end", T.IntegerType(), True),
        T.StructField("canonical_acr", T.StringType(), True),
        T.StructField("is_user_entity", T.BooleanType(), False),
    ]
)

ABBREV_STRUCT = T.StructType(
    [
        T.StructField("abbr", T.StringType(), False),
        T.StructField("expansion", T.StringType(), False),
    ]
)

EXTRACTION_STRUCT = T.StructType(
    [
        T.StructField("mentions", T.ArrayType(MENTION_STRUCT), False),
        T.StructField("abbreviations", T.ArrayType(ABBREV_STRUCT), False),
    ]
)


def mentions_schema(key_fields: Iterable[T.StructField]) -> T.StructType:
    return T.StructType(list(key_fields) + list(MENTION_STRUCT.fields))


TRANSCRIPT_KEY_FIELDS = (
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
)

# Concrete storage schemas for the Stage-A checkpoint tables (explicit on
# read so empty buckets — zero part files — stay readable).
EXTRACTION_TABLE_SCHEMA = T.StructType(
    list(TRANSCRIPT_KEY_FIELDS) + [T.StructField("ex", EXTRACTION_STRUCT, True)]
)
MENTIONS_TABLE_SCHEMA = mentions_schema(TRANSCRIPT_KEY_FIELDS)
ABBREVS_TABLE_SCHEMA = T.StructType(
    list(TRANSCRIPT_KEY_FIELDS)
    + list(ABBREV_STRUCT.fields)
    + [
        T.StructField("abbr_norm", T.StringType(), True),
        T.StructField("expansion_norm", T.StringType(), True),
    ]
)


def extraction_udf(
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    user_entities: Optional[List[Tuple[str, str]]] = None,
    reference_strict: bool = False,
):
    """Build the Arrow-batched extraction UDF. ``user_entities`` is the
    small (term, type) user-gazetteer dimension, captured in the closure
    (implicit broadcast, app.py:1974-2094). ``reference_strict`` toggles
    the reference's observed lonely-unit semantics (detector._postfilter)."""
    user_entities = list(user_entities or [])

    @F.pandas_udf(EXTRACTION_STRUCT)
    def _extract(texts: pd.Series) -> pd.DataFrame:
        # compiled once per Arrow batch; cheap relative to batch size, and
        # safe (no cross-batch state)
        patterns = compile_user_patterns(user_entities) if user_entities else None
        mentions_out = []
        abbrevs_out = []
        for text in texts:
            result = extract_turn(
                text,
                confidence_threshold=confidence_threshold,
                user_patterns=patterns,
                reference_strict=reference_strict,
            )
            mentions_out.append(
                [
                    (
                        m.entity,
                        m.entity_norm,
                        m.entity_type,
                        float(m.confidence),
                        m.start,
                        m.end,
                        m.canonical_acr,
                        bool(m.is_user_entity),
                    )
                    for m in result.mentions
                ]
            )
            abbrevs_out.append(list(result.abbreviations))
        return pd.DataFrame(
            {"mentions": mentions_out, "abbreviations": abbrevs_out}
        )

    return _extract


def extract_combined(
    transcripts: DataFrame,
    text_col: str = "text",
    key_cols: Tuple[str, ...] = ("conv_id", "turn_idx"),
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    user_entities: Optional[List[Tuple[str, str]]] = None,
    reference_strict: bool = False,
    detector: str = "deterministic",
    added_tokens: Optional[List[str]] = None,
) -> DataFrame:
    """One row per turn: key_cols + ``ex`` struct<mentions, abbreviations>.
    This is the Stage-A checkpoint payload — writing it verbatim means the
    detector UDF runs exactly once per turn, ever; mentions/abbrevs explode
    lazily from the stored arrays on read.

    ``detector`` picks the span source behind the SAME UDF interface and
    output schema: "deterministic" (the reference's DummyPipeline path) or
    "neural[:<model>]" (X2/X3 — 512-token chunking, per-worker model
    singleton, batched inference; ":stub" or no suffix uses the
    deterministic fake in model-less environments — operators/neural.py)."""
    keys = [F.col(c) for c in key_cols]
    if detector.startswith("neural"):
        from .neural import neural_extraction_udf

        model_name = detector.split(":", 1)[1] if ":" in detector else "stub"
        udf = neural_extraction_udf(
            model_name,
            confidence_threshold,
            user_entities,
            reference_strict,
            added_tokens,
        )
    else:
        udf = extraction_udf(confidence_threshold, user_entities, reference_strict)
    return transcripts.select(
        *keys,
        udf(F.col(text_col)).alias("ex"),
    )


def split_extraction(
    extracted: DataFrame, key_cols: Tuple[str, ...] = ("conv_id", "turn_idx")
) -> Tuple[DataFrame, DataFrame]:
    """(mentions, abbreviation_pairs) views over a combined extraction frame."""
    mentions = extracted.select(
        *[F.col(c) for c in key_cols],
        F.explode(F.col("ex.mentions")).alias("m"),
    ).select(*key_cols, "m.*")

    abbrevs = (
        extracted.select(
            *[F.col(c) for c in key_cols],
            F.explode(F.col("ex.abbreviations")).alias("a"),
        )
        .select(*key_cols, "a.*")
        .withColumn("abbr_norm", F.trim(F.col("abbr")))
        .withColumn("expansion_norm", F.trim(F.col("expansion")))
    )
    return mentions, abbrevs


def extract_mentions(
    transcripts: DataFrame,
    text_col: str = "text",
    key_cols: Tuple[str, ...] = ("conv_id", "turn_idx"),
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    user_entities: Optional[List[Tuple[str, str]]] = None,
    reference_strict: bool = False,
    detector: str = "deterministic",
) -> Tuple[DataFrame, DataFrame]:
    """Run extraction; returns (mentions, abbreviation_pairs).

    Both outputs derive from ONE UDF invocation column, materialized via
    localCheckpoint so the detector runs once per row even though two frames
    consume it (unlike persist(), checkpoint blocks are released by the
    ContextCleaner when the frame goes out of scope — repeated ad-hoc
    invocations in one session don't accumulate cache residency). The
    pipeline uses :func:`extract_combined` + a checkpoint write instead;
    this convenience form serves ad-hoc queries and tests.
    """
    extracted = extract_combined(
        transcripts,
        text_col,
        key_cols,
        confidence_threshold,
        user_entities,
        reference_strict,
        detector,
    ).localCheckpoint(eager=True)
    return split_extraction(extracted, key_cols)


def single_char_filter(entity: Column, is_user: Column) -> Column:
    """app.py:3901-3903 as a Column predicate (used by relational re-checks;
    the detector already applies it in-UDF)."""
    return is_user | ~entity.rlike(r"^\s*[A-Za-z0-9]\s*$")
