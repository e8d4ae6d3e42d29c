"""Similarity search over an embedding column (array<float>).

brute_force_topk — exact cosine top-k: one scan, one codegen'd dot
product per row, TakeOrderedAndProject for the top-k (no full sort, no
collect). This is the verification baseline.

lsh_ann_topk — the scale path: random-hyperplane LSH. Each vector gets a
B-bit signature (sign of dot with B fixed pseudo-random hyperplanes,
derived deterministically from a seed); the query probes only vectors
whose signature is within `probe_hamming` bits, then exact-reranks the
candidates. At cluster scale, signatures are computed once and stored
(partitioned/bucketed by signature prefix), so a query touches a handful
of buckets instead of the whole table — turning an O(n) scan into an
O(n/2^B · probes) bucket read.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qsvspark.functions.dedup import cosine


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for one query vector (broadcast as a literal)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def signature_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """B-bit signature as a long: bit b = 1 iff dot(v, plane_b) > 0."""
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), p, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long")))
    return sig


def lsh_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 12,
    probe_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: filter to signature-near candidates
    (hamming ≤ probe_hamming), exact-rerank the survivors."""
    planes = _hyperplanes(len(query_vec), bits, seed)
    qsig = 0
    for b, plane in enumerate(planes):
        dot = sum(q * p for q, p in zip(query_vec, plane))
        if dot > 0:
            qsig |= 1 << b
    sig = signature_expr(vec_col, planes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig).cast("long"))) <= probe_hamming
    )
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )
