"""Deduplication operators for LLM training-data pipelines (north star,
BASELINE.json: dedup designed for 100 TB scale).

Four families, all bucketed — NEVER all-pairs:

  * exact        — hash-groupBy on a content key (dropDuplicates semantics)
  * MinHash LSH  — shingle -> k salted minhashes -> banded bucket join;
                   candidates verified with exact Jaccard
  * SimHash      — 60-bit signature from token hashes; near pairs found via
                   5 disjoint 12-bit-block buckets (pigeonhole-exhaustive for
                   Hamming <= 4) before exact Hamming distance
  * n-gram Jaccard — exact Jaccard within cheap blocking keys

Portability note: the hash primitive is md5 (first 48/32 bits as integers),
identical across engines, so every operator here is oracle-checkable in
DuckDB.  Minhash permutations are the textbook affine family
(a_k*v + b_k mod 2^48, a_k odd => bijective), computed as integer ops on a
single md5 per token.

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

# Affine minhash permutation family over Z_2^48: h_k(v) = (a_k*v + b_k)
# mod 2^48 with a_k ODD -> a bijection of the hash space (the textbook
# permutation construction).  v = first 48 bits of md5(shingle), so each
# shingle is crypto-hashed ONCE and the k permutations are integer ops.
# a_k < 2^15 keeps a_k * v < 2^63 (safe in both Spark and DuckDB BIGINT).
MINHASH_M = 1 << 48
MINHASH_A = (24593, 12289, 30269, 6151, 3079, 1543, 769, 389)
MINHASH_B = (101, 8021, 15941, 23861, 31781, 39701, 47621, 55541)


def shingle_expr(text_col: str, distinct: bool = True) -> str:
    """Word-{SHINGLE_WORDS}-gram shingles of lower(text) as a SQL expression
    (JVM built-ins: split/sequence/slice/array_join).  ``distinct=False``
    skips the O(n^2) array_distinct — min-over-multiset == min-over-set, so
    the signature path never needs it (exact Jaccard verification does).

    The outer ``transform(array(<toks>), tk -> ...)`` binds the token array
    ONCE as a lambda variable (the shingle_hash_expr idiom): higher-order
    functions evaluate interpreted, so a split() embedded in the per-window
    lambda body re-tokenizes the document at EVERY window position —
    O(tokens^2) per document (round-14: 4.3x measured on the verify-path
    shingle projection at sf0.1) — and a plain projected column would be
    inlined back into the lambda by CollapseProject."""
    toks = f"split(lower({text_col}), ' ')"
    inner = (
        f"flatten(transform(array({toks}), tk -> "
        f"transform(sequence(1, greatest(size(tk) - {SHINGLE_WORDS - 1}, 1)), "
        f"i -> array_join(slice(tk, i, {SHINGLE_WORDS}), ' '))))"
    )
    return f"array_distinct({inner})" if distinct else inner


def with_shingles(
    df: DataFrame, text_col: str = "text", out: str = "shingles", distinct: bool = True
) -> DataFrame:
    return df.withColumn(out, F.expr(shingle_expr(text_col, distinct)))


# rolling-combine multipliers for hashed shingles (sum < 2^56, overflow-safe)
SHINGLE_C = (13, 31, 61)


def shingle_hash_expr(text_col: str) -> str:
    """48-bit integer hash per word-{SHINGLE_WORDS}-gram WITHOUT materializing
    shingle strings: each token is md5-hashed once, then each window combines
    its {SHINGLE_WORDS} token hashes arithmetically.  This is the signature
    hot path at 100 TB — one crypto hash per token, integer ops per window,
    zero string concatenation.

    The outer ``transform(array(<hashes>), h -> ...)`` binds the token-hash
    array ONCE as a lambda variable, so the inner per-window ``element_at``
    references never re-evaluate it (a plain column reference would be
    inlined three times by CollapseProject)."""
    toks = f"split(lower({text_col}), ' ')"
    # pad with 2 zero-hashes so windows at the tail stay in bounds
    hv = (
        f"concat(transform({toks}, t -> "
        f"cast(conv(substring(md5(t), 1, 12), 16, 10) AS BIGINT)), array(0L, 0L))"
    )
    c1, c2, c3 = SHINGLE_C
    return (
        f"flatten(transform(array({hv}), h -> "
        f"transform(sequence(1, greatest(size(h) - {SHINGLE_WORDS + 1}, 1)), "
        f"i -> (element_at(h, i) * {c1} + element_at(h, i + 1) * {c2} "
        f"+ element_at(h, i + 2) * {c3}) % {MINHASH_M})))"
    )


def with_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    shingles_col: str = "shingles",
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """k salted-min signatures per id; each is a min over the shingle set of
    an md5 keyed by the salt — order-free, partition-free, deterministic.

    Formulated as explode -> hash-agg(min x k) rather than k per-row array
    traversals: the shingle array is computed ONCE (per-row formulations get
    the shingle expression inlined k times by CollapseProject), each shingle
    is md5-hashed once with the k permutations as integer ops, the mins
    partial-aggregate map-side, and the only shuffle is the narrow
    (id, k x int64) signature — the shape that survives 100 TB."""
    exploded = df.select(id_col, F.explode(shingles_col).alias("_sh"))
    if dict(exploded.dtypes)["_sh"] == "bigint":
        # pre-hashed shingles (shingle_hash_expr) — use directly
        exploded = exploded.withColumnRenamed("_sh", "_v")
    else:
        exploded = exploded.select(
            id_col,
            F.expr(
                "cast(conv(substring(md5(_sh), 1, 12), 16, 10) AS BIGINT)"
            ).alias("_v"),
        )
    aggs = [
        F.min(
            (F.lit(MINHASH_A[k]) * F.col("_v") + F.lit(MINHASH_B[k])) % F.lit(MINHASH_M)
        ).alias(f"mh_{k}")
        for k in range(n_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


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
        cols = ", ".join(
            f"cast(mh_{b * rows_per_band + r} AS STRING)" for r in range(rows_per_band)
        )
        pieces.append(f"{b}, md5(concat_ws(':', {cols}))")
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
    candidate->verify pipeline).  The shingle recompute is pruned to docs
    that appear in a candidate pair (semi-join pushes below the shingle
    projection), so verification cost tracks candidates, not corpus."""
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    pruned = shingled.join(F.broadcast(ids), id_col, "left_semi")
    sa = pruned.select(F.col(id_col).alias("id_a"), F.col(shingles_col).alias("sh_a"))
    sb = pruned.select(F.col(id_col).alias("id_b"), F.col(shingles_col).alias("sh_b"))
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return joined.select(
        "id_a", "id_b", F.round(inter.cast("double") / union, 4).alias("jaccard")
    )


# Blocked-pairwise joins are O(block²); an unbounded block key (language,
# length bucket, cluster label, ...) grows with the corpus, so at 100 TB a
# popular block alone explodes the pair count.  BLOCK_CAP bounds it: members
# are ranked within their block by id (deterministic) and split into
# sub-blocks of <= cap rows; pairs are only compared within a sub-block, so
# the per-sub-block pair count is <= C(cap, 2) = 2016 no matter how the
# corpus grows.  The cost is recall across sub-block boundaries — when that
# matters, route oversized blocks through the MinHash/SimHash LSH path
# instead (their bucket keys are content-derived and self-balancing).
BLOCK_CAP = 64


def with_sub_block(
    df: DataFrame, block_cols: list[str], id_col: str, cap: int = BLOCK_CAP
) -> DataFrame:
    """Add a ``sub`` column: rank-within-block (ordered by ``id_col``)
    integer-divided by ``cap``.  Join on block_cols + ``sub`` to bound
    pairwise fan-out.  Deterministic given unique ids, so a SQL oracle
    reproduces the exact same sub-blocking with ``row_number()``."""
    from pyspark.sql import Window

    w = Window.partitionBy(*block_cols).orderBy(id_col)
    return df.withColumn(
        "sub", F.floor((F.row_number().over(w) - 1) / F.lit(cap)).cast("int")
    )


def block_cap_report(
    df: DataFrame, block_cols: list[str], cap: int = BLOCK_CAP
) -> DataFrame:
    """Diagnostic for what the cap drops: for each oversized block, the
    member count and how many cross-pairs sub-blocking skips
    (C(n,2) - sum over sub-blocks of C(size,2)).  Fully distributed — emit
    it to a metrics sink next to the dedup output; at 100 TB this is the
    'log what a cap drops' obligation."""
    sizes = df.groupBy(*block_cols).agg(F.count("*").alias("n_members"))
    n = F.col("n_members")
    full = (n * (n - 1) / 2).cast("bigint")
    n_full_subs = F.floor(n / cap)
    rem = n % cap
    kept = (n_full_subs * (cap * (cap - 1) // 2) + (rem * (rem - 1) / 2)).cast(
        "bigint"
    )
    return sizes.filter(n > cap).select(
        *block_cols,
        "n_members",
        full.alias("pairs_unbounded"),
        kept.alias("pairs_compared"),
        (full - kept).alias("pairs_skipped"),
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


# 60-bit signatures in 5 disjoint 12-bit blocks: by pigeonhole, any pair
# within Hamming distance 4 is IDENTICAL on at least one block (4 differing
# bits cannot touch all 5 blocks) — guaranteed recall, never all-pairs.
# Width is the bucket-size
# lever: a block key must carry enough entropy that same-key buckets stay
# small as the corpus grows — the original 32-bit/6-7-bit-block layout had
# only 64-128 distinct values per block, so bucket population (and the
# pairwise join) grew LINEARLY with corpus size and the pair count
# quadratically (measured 28.6x runtime at 10x docs; 12-bit blocks make it
# 1.3x).  60 = 15 md5 hex chars, the widest that can't overflow a signed
# BIGINT through conv().
SIMHASH_BITS = 60
SIMHASH_BLOCKS = ((0, 12), (12, 12), (24, 12), (36, 12), (48, 12))  # (offset, width)
SIMHASH_MAX_HAMMING = len(SIMHASH_BLOCKS) - 1


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash: bit j is the sign of the sum over tokens of
    (bit j of md5(token) ? +1 : -1).  Returns (id_col, simhash).

    Formulated as token explode -> codegen'd hash agg of the 60 bit-sums
    (each token md5-hashed once; per-bit terms are integer shifts inside
    whole-stage codegen).  The per-row nested-lambda formulation is
    interpreted (higher-order functions don't codegen) and measured ~2x
    slower.  Shuffle payload is (id, 60 ints) after map-side partial agg.
    shiftright/shiftleft function form: >>/<< do not parse in lambdas."""
    # NULL text -> '' so the doc keeps a (deterministic) signature row on
    # both engines instead of vanishing in the explode
    toks = df.select(
        id_col,
        F.explode(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")).alias(
            "_t"
        ),
    ).select(
        id_col,
        F.expr("cast(conv(substring(md5(_t), 1, 15), 16, 10) AS BIGINT)").alias("_v"),
    )
    sums = [
        F.sum(
            F.expr(f"CASE WHEN (shiftright(_v, {j}) & 1) = 1 THEN 1 ELSE -1 END")
        ).alias(f"bs_{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*sums)
    combine = " + ".join(
        f"shiftleft(CAST(CASE WHEN bs_{j} > 0 THEN 1 ELSE 0 END AS BIGINT), {j})"
        for j in range(bits)
    )
    return agg.select(id_col, F.expr(f"CAST({combine} AS BIGINT)").alias("simhash"))


def simhash_blocks(df: DataFrame, id_col: str) -> DataFrame:
    """Long-format (id, block, block_value) over the disjoint bit blocks."""
    pieces = [
        f"{i}, (shiftright(simhash, {off}) & {(1 << width) - 1})"
        for i, (off, width) in enumerate(SIMHASH_BLOCKS)
    ]
    stack = f"stack({len(SIMHASH_BLOCKS)}, {', '.join(pieces)}) AS (blk, bv)"
    return df.selectExpr(id_col, "simhash", stack)


def simhash_near_pairs(
    df: DataFrame, id_col: str, max_hamming: int = SIMHASH_MAX_HAMMING
) -> DataFrame:
    """Near-dup pairs by Hamming distance via the disjoint-block bucket
    join: candidates agree on >= 1 block, which pigeonhole makes EXHAUSTIVE
    for hamming <= len(blocks) - 1 (the old top-byte blocking missed ~94%
    of hamming<=4 pairs whose differing bits fell outside the byte)."""
    if max_hamming > SIMHASH_MAX_HAMMING:
        raise ValueError(
            f"max_hamming {max_hamming} exceeds the pigeonhole guarantee "
            f"of {SIMHASH_MAX_HAMMING} for {len(SIMHASH_BLOCKS)} blocks"
        )
    blocks = simhash_blocks(df, id_col)
    lhs = blocks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "bv"
    )
    rhs = blocks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "bv"
    )
    return (
        lhs.join(rhs, ["blk", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.expr("cast(bit_count(sh_a ^ sh_b) AS INT)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def alternating_star_components(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., *Connected Components in MapReduce and Beyond*,
    SoCC'14) — the O(log n)-round algorithm the bounded label propagation
    in llm_dedup_clusters name-checks for pathological chains.  Label
    propagation needs diameter-many rounds (a 1M-node path graph = 1M
    rounds); alternating stars contract the graph geometrically, so
    convergence takes ~log2(diameter) rounds and the default cap of 64
    covers any component that fits in an int64 id space (diameter <
    2^64); the fail-stop below guards the cap rather than assuming it.

    Input: an undirected edge list with two integer-comparable columns
    (first two columns are taken as the endpoints).  Returns
    ``(node, label)`` with ``label`` = the component's minimum node id,
    for every node incident to at least one edge.

    Both operations are expressed as keyed aggregates + joins — no
    collect_set of neighborhoods, so a hub node's neighborhood never has
    to fit in one task's memory:

      * large-star: per node u, m = min(N(u) + {u}); every neighbor v > u
        re-attaches as edge (m, v).
      * small-star on the canonical (small, large) form: per node u
        grouped as the LARGER endpoint, m = min of its smaller neighbors;
        each smaller neighbor and u itself re-attach to m.

    Convergence is DETECTED, not assumed: each round's canonical edge set
    collapses to (count, xor-of-edge-hashes) — 16 bytes on the driver —
    and the loop stops when two consecutive rounds agree (the fixpoint of
    small∘large is exactly the star forest).  Each round's result is
    localCheckpoint-ed: iterative lineage would otherwise double the plan
    per round, and boundary-stable inputs matter more than replay here
    (fail-stop on executor loss, same trade as operators/ranking.py).

    Scale: every round is one hash-agg (min per node) + one broadcast-free
    keyed join on the edge list, so the cost is O(|E|) per round and
    O(|E| log n) total — at 100 TB the edge list (near-dup pairs) is tiny
    relative to the corpus that produced it, and the round count is
    bounded by the log of the largest component's diameter, not by the
    component count or corpus size."""
    a, b = edges.columns[:2]
    # lazy localCheckpoint: the checksum action immediately below is what
    # materializes it, so each round runs ONE job (checkpoint + checksum)
    # instead of two (eager materialize, then checksum) — half the driver
    # round-trips on a loop whose per-round data is tiny (round-13 opt)
    canon = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("ca"),
            F.greatest(F.col(a), F.col(b)).alias("cb"),
        )
        .filter(F.col("ca") != F.col("cb"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _checksum(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("ca", "cb")), F.lit(0)).alias("x"),
        ).collect()[0]
        return (row.n, row.x)

    prev = _checksum(canon)
    for _ in range(max_rounds):
        sym = canon.unionAll(
            canon.select(F.col("cb").alias("ca"), F.col("ca").alias("cb"))
        )
        # large-star: m(u) over ALL neighbors and self; v > u re-attaches to m
        lmins = sym.groupBy("ca").agg(
            F.least(F.min("cb"), F.first("ca")).alias("m")
        )
        large = (
            sym.filter(F.col("cb") > F.col("ca"))
            .join(lmins, "ca")
            .select(F.col("m").alias("ca"), F.col("cb").alias("cb"))
            .filter(F.col("ca") != F.col("cb"))
            .distinct()
        )
        # small-star on canonical (small=ca, large=cb): group by the larger
        # endpoint; m = min smaller neighbor (< cb by construction)
        smins = large.groupBy("cb").agg(F.min("ca").alias("m"))
        attach_small = (
            large.join(smins, "cb")
            .filter(F.col("ca") != F.col("m"))
            .select(F.col("m").alias("ca"), F.col("ca").alias("cb"))
        )
        attach_big = smins.select(F.col("m").alias("ca"), F.col("cb").alias("cb"))
        canon = (
            attach_small.unionAll(attach_big)
            .filter(F.col("ca") != F.col("cb"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = _checksum(canon)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"alternating_star_components: no fixpoint in {max_rounds} rounds"
        )
    # fixpoint = star forest: ca is the component min for every cb
    return canon.select(F.col("cb").alias("node"), F.col("ca").alias("label")).unionAll(
        canon.select(F.col("ca").alias("node"), F.col("ca").alias("label")).distinct()
    )
