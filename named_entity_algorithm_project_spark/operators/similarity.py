"""Similarity search over embedding columns (array<float>).

  cosine_topk         brute-force exact top-k (the baseline; one pass, JVM
                      higher-order functions, broadcast query vector)
  rp_lsh_buckets      random-hyperplane LSH signatures (deterministic,
                      xxhash64-derived planes — no RNG state to ship)
  lsh_topk            bucketed ANN: probe matching buckets only, exact
                      re-rank inside — the scale path

At 100 TB the brute-force scan is one full pass (fine for one-off queries,
wrong for query streams); rp_lsh assigns each vector to a signature bucket
so a query touches |bucket| << N vectors. Signature hamming-neighborhood
probing widens recall.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_scores(
    vectors: DataFrame,
    query: Sequence[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cos_sim) against a literal query vector (ships in the plan —
    an implicit broadcast)."""
    qv = F.array(*[F.lit(float(x)) for x in query])
    return vectors.select(
        F.col(id_col),
        (
            _dot(F.col(vec_col), qv)
            / (
                F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
                * F.sqrt(_dot(qv, qv))
            )
        ).alias("cos_sim"),
    )


def cosine_topk(
    vectors: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: Spark's TakeOrderedAndProject keeps only k rows per
    partition then merges — no global sort materializes."""
    return (
        cosine_scores(vectors, query, id_col, vec_col)
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _plane_component(plane: int, dim_idx: int) -> "F.Column":
    """Deterministic pseudo-gaussian hyperplane component from xxhash64 —
    reproducible across runs/executors with zero shipped state."""
    h = F.xxhash64(F.lit(plane), F.lit(dim_idx))
    # map int64 -> [-1, 1); uniform is fine for sign-projection LSH
    return (h.cast("double") / F.lit(float(2**63)))


def rp_lsh_signature(
    vec_col: "F.Column", dim: int, n_planes: int = 16
) -> "F.Column":
    """Sign-projection signature: bit i = (v . plane_i) >= 0."""
    sig = None
    for p in range(n_planes):
        proj = None
        for d in range(dim):
            term = F.element_at(vec_col, d + 1).cast("double") * _plane_component(p, d)
            proj = term if proj is None else proj + term
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def rp_lsh_buckets(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, bucket) — write-once index table, partitioned by
    bucket so a probe prunes partitions."""
    return vectors.select(
        F.col(id_col),
        F.col(vec_col),
        rp_lsh_signature(F.col(vec_col), dim, n_planes).alias("bucket"),
    )


def lsh_topk(
    indexed: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 16,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict to buckets within ``probe_hamming`` bits of the query's
    signature, exact cosine re-rank inside. Recall/cost dial = n_planes x
    probe_hamming."""
    import itertools

    spark = indexed.sparkSession
    qv = F.array(*[F.lit(float(x)) for x in query])
    q_sig_row = (
        spark.range(1)
        .select(rp_lsh_signature(qv, len(query), n_planes).alias("sig"))
        .collect()[0]
    )
    q_sig = q_sig_row["sig"]
    probes = [q_sig]
    for r in range(1, probe_hamming + 1):
        for bits in itertools.combinations(range(n_planes), r):
            flipped = q_sig
            for b in bits:
                flipped ^= 1 << b
            probes.append(flipped)
    candidates = indexed.filter(F.col("bucket").isin(probes))
    return (
        cosine_scores(candidates, query, id_col, vec_col)
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
