"""Deterministic stub embedder for entity norms (SURVEY §2.5 L4).

The reference's alternative linking path embeds unique entity norms with a
sentence-transformers MiniLM model and scores candidates by cosine over the
L2-normalized embeddings (app.py:3084-3110), feeding the SAME gate cascade
as the TF-IDF path (_build_cluster_maps). That model isn't in this
container and isn't deterministic across library versions, so the stub
embeds a norm as an L2-normalized bag of feature-hashed char n-grams
(blake2b bucket + sign hashing — the classic hashing trick): fully
deterministic everywhere, cheap, and string-similar norms (shared n-grams)
get high cosine — the geometry the linking gates need. A production
deployment swaps :func:`embed_batch` for a model forward pass; every piece
of Spark plumbing around it (Arrow-batched UDF, LSH bucketing, gated edge
union) is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np
import pandas as pd

from .ngrams import char_wb_ngrams

DEFAULT_EMBED_DIM = 64


def _gram_bucket_sign(gram: str, dim: int) -> tuple:
    h = int.from_bytes(
        hashlib.blake2b(gram.encode("utf-8"), digest_size=8).digest(), "big"
    )
    return (h >> 1) % dim, 1.0 if (h & 1) else -1.0


def embed_text(text: str, dim: int = DEFAULT_EMBED_DIM) -> np.ndarray:
    """L2-normalized hashed n-gram vector for one string (zero vector for
    empty/gram-less input)."""
    v = np.zeros(dim, dtype=np.float64)
    for gram in char_wb_ngrams(text or ""):
        bucket, sign = _gram_bucket_sign(gram, dim)
        v[bucket] += sign
    norm = float(np.linalg.norm(v))
    return v / norm if norm > 0 else v


def embed_batch(
    texts: Sequence[str], dim: int = DEFAULT_EMBED_DIM
) -> np.ndarray:
    """(n, dim) matrix of embeddings — the model-swap point."""
    return np.stack([embed_text(t, dim) for t in texts])


def embedding_udf(dim: int = DEFAULT_EMBED_DIM):
    """Arrow-batched pandas UDF: string column -> array<double> embedding."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # float64 so Spark-side cosines agree with the numpy parity oracle to
    # ~1e-15 (a real model swap would emit float32 and halve the bytes —
    # the threshold gates tolerate either)
    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype="object")
        mat = embed_batch([t or "" for t in texts], dim)
        return pd.Series(list(mat))

    return _embed


def cosine_matrix(texts: List[str], dim: int = DEFAULT_EMBED_DIM) -> np.ndarray:
    """N² numpy cosine over stub embeddings — the parity oracle's path
    (mirrors the reference's dense pytorch_cos_sim matrix, app.py:3098)."""
    mat = embed_batch(texts, dim)
    return mat @ mat.T
