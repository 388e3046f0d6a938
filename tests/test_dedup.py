"""Dedup operator semantics on synthetic corpora: MinHash-LSH recall on
planted near-dups, SimHash Hamming behavior, exact-dup grouping."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledgebot_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dup_groups(spark):
    df = _docs(
        spark,
        [(1, "same text here"), (2, "same text here"), (3, "unique"),
         (4, "same text here"), (5, "other dup"), (6, "other dup")],
    )
    groups = dd.exact_dup_groups(df, "doc_id", F.md5(F.col("text"))).collect()
    got = {(r.keeper_id, r.n_copies) for r in groups}
    assert got == {(1, 3), (5, 2)}


def test_minhash_lsh_finds_planted_near_dup(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok59", "changed")          # ~1 shingle differs
    far = " ".join(f"other{i}" for i in range(60))
    df = _docs(spark, [(1, base), (2, near), (3, far)])
    sh = dd.with_shingles(df)
    bands = dd.lsh_bands(dd.with_minhash(sh), "doc_id")
    pairs = dd.candidate_pairs(bands, "doc_id")
    verified = dd.jaccard_verify(pairs, sh, "doc_id")
    got = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert (1, 2) in got                  # near-dup found via band collision
    assert got[(1, 2)] > 0.9              # verified high Jaccard
    assert (1, 3) not in got and (2, 3) not in got  # far doc never a candidate


def test_identical_docs_always_collide(spark):
    df = _docs(spark, [(1, "a b c d e f g"), (2, "a b c d e f g")])
    sh = dd.with_shingles(df)
    pairs = dd.candidate_pairs(dd.lsh_bands(dd.with_minhash(sh), "doc_id"), "doc_id")
    assert [(r.id_a, r.id_b) for r in pairs.collect()] == [(1, 2)]


def test_simhash_identical_zero_hamming(spark):
    df = _docs(spark, [(1, "w1 w2 w3 w4"), (2, "w1 w2 w3 w4"), (3, "x1 x2 x3 x4")])
    hashed = dd.with_simhash(df)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dd.simhash_near_pairs(hashed, "doc_id").collect()
    }
    assert pairs.get((1, 2)) == 0


def test_simhash_blocking_is_exhaustive_for_guaranteed_hamming(spark):
    """Pigeonhole recall: ANY pair within hamming <= 4 collides on >= 1
    disjoint block, wherever the differing bits fall (the old top-byte
    blocking missed pairs whose diffs fell in the upper bits)."""
    import itertools
    import random

    rng = random.Random(3)
    base = rng.getrandbits(32)
    variants = [("b", base)]
    # flip 4 bits in adversarial positions: all-high, all-low, spread
    for name, bits in (
        ("high", (28, 29, 30, 31)),
        ("low", (0, 1, 2, 3)),
        ("spread", (3, 11, 19, 27)),
        ("block-straddle", (6, 7, 13, 14)),
    ):
        v = base
        for bit in bits:
            v ^= 1 << bit
        variants.append((name, v))
    df = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(variants)], "doc_id int, simhash bigint"
    )
    got = {
        (r.id_a, r.id_b)
        for r in dd.simhash_near_pairs(df, "doc_id").collect()
    }
    # every variant is within hamming 4 of the base (doc_id 0)
    for i in range(1, len(variants)):
        assert (0, i) in got, f"missed pair base<->{variants[i][0]}"


def test_minhash_deterministic_across_partitions(spark):
    rows = [(i, f"doc {i} " + " ".join(f"w{j}" for j in range(30))) for i in range(40)]
    a = dd.with_minhash(dd.with_shingles(_docs(spark, rows).repartition(1)))
    b = dd.with_minhash(dd.with_shingles(_docs(spark, rows).repartition(13)))
    cols = ["doc_id"] + [f"mh_{k}" for k in range(dd.N_HASHES)]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


# --- bounded blocked-pairwise (BLOCK_CAP sub-blocking) -----------------------

def test_sub_block_bounds_pairs_on_skewed_block(spark):
    """One hot block with 200 members: sub-blocking must bound every
    pairwise sub-block at <= BLOCK_CAP members, so the join fans out to at
    most ceil(200/64) * C(64,2) pairs instead of C(200,2)."""
    cap = dd.BLOCK_CAP
    df = spark.createDataFrame(
        [(i, "en") for i in range(200)], "doc_id int, lang string"
    )
    sub = dd.with_sub_block(df, ["lang"], "doc_id", cap)
    sizes = [r.n for r in sub.groupBy("lang", "sub").count().withColumnRenamed("count", "n").collect()]
    assert max(sizes) <= cap
    assert sum(sizes) == 200
    a = sub.select(F.col("doc_id").alias("id_a"), "lang", "sub")
    b = sub.select(F.col("doc_id").alias("id_b"), "lang", "sub")
    pairs = a.join(b, ["lang", "sub"]).filter(F.col("id_a") < F.col("id_b")).count()
    # 3 full sub-blocks of 64 + one of 8
    expected = 3 * (cap * (cap - 1) // 2) + (8 * 7 // 2)
    assert pairs == expected
    assert pairs < 200 * 199 // 2  # strictly fewer than unbounded


def test_sub_block_deterministic_across_partitions(spark):
    df = spark.createDataFrame(
        [(i, "x" if i % 3 else "y") for i in range(150)], "doc_id int, lang string"
    )
    one = dd.with_sub_block(df.repartition(1), ["lang"], "doc_id").collect()
    many = dd.with_sub_block(df.repartition(11), ["lang"], "doc_id").collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_block_cap_report_arithmetic(spark):
    """The drop-report is the 'log what the cap skips' obligation: for a
    block of 150 with cap 64, pairs_unbounded - pairs_compared must equal
    the cross-sub-block pairs the join never sees."""
    cap = dd.BLOCK_CAP
    df = spark.createDataFrame(
        [(i, "hot") for i in range(150)] + [(1000 + i, "cold") for i in range(5)],
        "doc_id int, lang string",
    )
    rows = {r.lang: r for r in dd.block_cap_report(df, ["lang"], cap).collect()}
    assert "cold" not in rows  # under the cap -> nothing dropped, not reported
    hot = rows["hot"]
    assert hot.n_members == 150
    assert hot.pairs_unbounded == 150 * 149 // 2
    # sub-blocks: 64, 64, 22
    assert hot.pairs_compared == 2 * (64 * 63 // 2) + (22 * 21 // 2)
    assert hot.pairs_skipped == hot.pairs_unbounded - hot.pairs_compared
