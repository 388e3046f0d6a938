"""Deduplication operators for LLM training-data pipelines (north star,
BASELINE.json: dedup designed for 100 TB scale).

Four families, all bucketed — NEVER all-pairs:

  * exact        — hash-groupBy on a content key (dropDuplicates semantics)
  * MinHash LSH  — shingle -> k salted minhashes -> banded bucket join;
                   candidates verified with exact Jaccard
  * SimHash      — 16-bit signature from token hashes; near pairs blocked on
                   the top byte before Hamming distance
  * n-gram Jaccard — exact Jaccard within cheap blocking keys

Portability note: the hash primitive is md5 (hex string), identical across
engines, so every operator here is oracle-checkable in DuckDB.  Minhash
"permutations" are salted mins: min(md5(salt_k || shingle)) — the standard
a*h+b mod p permutation family replaced by an equally uniform, dialect-
portable construction.

Scale: the LSH band join shuffles on (band, band_value) — bucket sizes are
bounded by collision probability, and AQE's skew-join handles hot buckets.
The shingle explode is linear in corpus token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 8
ROWS_PER_BAND = 2          # 4 bands of 2: candidate iff >=1 band agrees
SHINGLE_WORDS = 3


def shingle_expr(text_col: str) -> str:
    """Distinct word-{SHINGLE_WORDS}-gram shingles of lower(text) as a SQL
    expression (JVM built-ins: split/sequence/slice/array_join)."""
    toks = f"split(lower({text_col}), ' ')"
    return (
        f"array_distinct(transform(sequence(1, greatest(size({toks}) - {SHINGLE_WORDS - 1}, 1)), "
        f"i -> array_join(slice({toks}, i, {SHINGLE_WORDS}), ' ')))"
    )


def with_shingles(df: DataFrame, text_col: str = "text", out: str = "shingles") -> DataFrame:
    return df.withColumn(out, F.expr(shingle_expr(text_col)))


def with_minhash(df: DataFrame, shingles_col: str = "shingles", n_hashes: int = N_HASHES) -> DataFrame:
    """k salted-min signatures; each is a min over the shingle set of an
    md5 keyed by the salt — order-free, partition-free, deterministic."""
    for k in range(n_hashes):
        df = df.withColumn(
            f"mh_{k}",
            F.expr(f"array_min(transform({shingles_col}, s -> md5(concat('s{k}:', s))))"),
        )
    return df


def lsh_bands(
    df: DataFrame,
    id_col: str,
    n_hashes: int = N_HASHES,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Long-format (id, band, band_value): band_value hashes the
    concatenation of its minhash rows, so bucket equality == all rows of the
    band agree."""
    n_bands = n_hashes // rows_per_band
    pieces = []
    for b in range(n_bands):
        cols = "||".join(f"mh_{b * rows_per_band + r}" for r in range(rows_per_band))
        pieces.append(f"{b}, md5({cols})")
    stack = f"stack({n_bands}, {', '.join(pieces)}) AS (band, bv)"
    return df.selectExpr(id_col, stack)


def candidate_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """Bucket join: docs sharing any band bucket, as distinct (a < b) pairs.
    This is the LSH step that replaces the O(n^2) all-pairs scan."""
    a = bands.select(F.col("band"), F.col("bv"), F.col(id_col).alias("id_a"))
    b = bands.select(F.col("band"), F.col("bv"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    shingled: DataFrame,
    id_col: str,
    shingles_col: str = "shingles",
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (verify stage of the
    candidate->verify pipeline)."""
    sa = shingled.select(F.col(id_col).alias("id_a"), F.col(shingles_col).alias("sh_a"))
    sb = shingled.select(F.col(id_col).alias("id_b"), F.col(shingles_col).alias("sh_b"))
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return joined.select(
        "id_a", "id_b", F.round(inter.cast("double") / union, 4).alias("jaccard")
    )


def exact_dup_groups(df: DataFrame, id_col: str, key: F.Column) -> DataFrame:
    """Exact dedup: hash-groupBy on a content key; returns duplicate groups
    (the dropDuplicates survivors are min(id) per group)."""
    return (
        df.select(F.col(id_col), key.alias("dup_key"))
        .groupBy("dup_key")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_copies") > 1)
    )


def with_simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """16-bit SimHash: bit j is the sign of the sum over tokens of
    (bit j of md5(token) ? +1 : -1).  Computed per-row with JVM built-ins
    (aggregate over the token array) — no explode, no shuffle."""
    toks = f"split(lower({text_col}), ' ')"
    hv = "cast(conv(substring(md5(t), 1, 4), 16, 10) AS INT)"
    # shiftright/shiftleft function form: the >>/<< operators do not parse
    # inside Spark lambda bodies
    bit_sums = ", ".join(
        f"aggregate({toks}, 0, (acc, t) -> acc + CASE WHEN (shiftright({hv}, {j}) & 1) = 1 THEN 1 ELSE -1 END)"
        for j in range(bits)
    )
    combine = " + ".join(
        f"shiftleft(CASE WHEN bs[{j}] > 0 THEN 1 ELSE 0 END, {j})" for j in range(bits)
    )
    return df.withColumn("bs", F.expr(f"array({bit_sums})")).withColumn(
        "simhash", F.expr(f"CAST({combine} AS INT)")
    ).drop("bs")


def simhash_near_pairs(df: DataFrame, id_col: str, max_hamming: int = 4) -> DataFrame:
    """Near-dup pairs by Hamming distance, blocked on the top byte of the
    signature (buckets shrink the join from all-pairs to 1/256)."""
    lhs = df.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("sh_a"),
        F.expr("shiftright(simhash, 8)").alias("blk"),
    )
    rhs = df.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sh_b"),
        F.expr("shiftright(simhash, 8)").alias("blk"),
    )
    return (
        lhs.join(rhs, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
