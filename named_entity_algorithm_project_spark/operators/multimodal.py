"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data pipelines carry images/audio/video as ``binary`` columns with
a metadata struct; the engine's job is the Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — while the actual codec
calls are pluggable. The image/audio libraries are not in this container, so
the decode step is STUBBED two ways:

* ``decode_stub="deterministic"`` — a seeded fake decoder (payload bytes →
  stable pseudo-features) so the full plumbing is testable end-to-end;
* ``decode_stub="raise"`` — ``NotImplementedError`` marking exactly where
  PIL/torchaudio/ffmpeg plug in;
* ``decode_stub="wav"`` — a REAL codec for one media kind: ``kind=audio``
  payloads are parsed as RIFF/WAVE with the stdlib ``wave`` module and
  featurized from the actual PCM samples (per-window RMS); non-audio
  kinds keep the deterministic fake. Proves the plug point carries a real
  decoder end-to-end with zero extra dependencies.

Everything around the stub is real: ``mapInPandas`` with Arrow-batched
binary columns, fixed output schemas, per-batch (not per-row) iteration,
and partition sizing guidance (binary payloads blow past
``spark.sql.files.maxPartitionBytes`` assumptions — repartition by byte
budget, not row count).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Literal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
        # nullable: a malformed payload yields features=NULL (the decode
        # error is contained per row — one bad payload must not fail the
        # whole batch job)
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode + feature extraction: md5-seeded
    pseudo-features in [0, 1). Replace with the real codec:

        img = PIL.Image.open(io.BytesIO(payload))      # <- real decode
        feats = model(preprocess(img))                  # <- real features
    """
    digest = hashlib.md5(payload or b"").digest()
    out = []
    for i in range(dim):
        h = hashlib.md5(digest + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(h[:4], "big") / 2**32)
    return out


def decode_wav_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real audio decode + featurize, stdlib-only: parse the RIFF/WAVE
    container with ``wave``, convert PCM to float64 full-scale [-1, 1)
    (8/16/32-bit widths), and emit ``dim`` per-window RMS features over
    the interleaved sample stream. This is the un-stubbed proof of the
    codec plug point — an image/video codec lands in the same slot."""
    import io
    import wave

    with wave.open(io.BytesIO(payload or b""), "rb") as w:
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 2**15
    elif width == 1:  # 8-bit WAV PCM is unsigned
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2**31
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if samples.size == 0:
        return [0.0] * dim
    return [
        float(np.sqrt(np.mean(np.square(win)))) if win.size else 0.0
        for win in np.array_split(samples, dim)
    ]


def _decode_wav_safe(payload: bytes) -> list[float] | None:
    """Per-row containment for the real codec: a corrupt RIFF header, a
    truncated stream, or an unsupported PCM width (24-bit/float) yields
    features=NULL instead of failing the whole Spark job — the other stub
    modes tolerate arbitrary bytes, and the real decoder must too."""
    import wave

    try:
        return decode_wav_features(payload)
    except (wave.Error, ValueError, EOFError, OSError):
        return None


def probe_wav_meta(payload: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_channels, duration_ms) from a WAV header —
    metadata backfill for the ``meta`` struct."""
    import io
    import wave

    with wave.open(io.BytesIO(payload or b""), "rb") as w:
        rate = w.getframerate()
        return (
            rate,
            w.getnchannels(),
            int(w.getnframes() * 1000 / rate) if rate else 0,
        )


def extract_media_features(
    media: DataFrame,
    decode_stub: Literal["deterministic", "raise", "wav"] = "deterministic",
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas``.

    The UDF iterates Arrow batches (``batch_size_hint`` rows of binary each —
    set spark.sql.execution.arrow.maxRecordsPerBatch down for large
    payloads); inside a batch the codec loop is per-payload by necessity,
    but no Spark-level per-row Python exists.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires PIL/torchaudio/ffmpeg — not in "
                    "this container; plug the codec into _fake_decode's slot"
                )
            payloads = pdf["payload"]
            if decode_stub == "wav":
                feats = [
                    _decode_wav_safe(b) if k == "audio" else _fake_decode(b)
                    for b, k in zip(payloads, pdf["kind"])
                ]
            else:
                feats = [_fake_decode(b) for b in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int32"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "features": pd.Series(feats, index=pdf.index),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _featurize, FEATURES_SCHEMA
    )


def repartition_by_bytes(
    media: DataFrame, target_partition_bytes: int = 64 * 1024 * 1024
) -> DataFrame:
    """Partition media so each partition carries ~target bytes of payload —
    row-count partitioning is wrong for fat binary columns."""
    sized = media.withColumn(
        "_bytes", F.coalesce(F.length("payload"), F.lit(0)).cast("long")
    )
    total = sized.agg(F.sum("_bytes")).collect()[0][0] or 0
    n_parts = max(1, int(total / target_partition_bytes) + 1)
    return sized.repartitionByRange(n_parts, F.col("media_id")).drop("_bytes")


def frame_sample_stub(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (posexplode over a sequence sized from duration metadata); the frame
    grab itself is the stubbed codec call."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1,
                    F.lit(0),
                ),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames
