"""MLlib fitted-model variants agree with the engine's exact/declarative
formulations (MinHashLSH vs exact Jaccard, BRP-LSH vs exact distances,
CountVectorizer+IDF vs the SQL TF-IDF)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_mllib_minhash_finds_planted_neardup(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    base = [f"tok{i}" for i in range(40)]
    near = base[:-2] + ["changedA", "changedB"]          # jaccard ~ 0.9
    far = [f"other{i}" for i in range(40)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "toks"]
    )
    cv = CountVectorizer(inputCol="toks", outputCol="features", binary=True).fit(df)
    feats = cv.transform(df)
    lsh = MinHashLSH(inputCol="features", outputCol="h", numHashTables=8, seed=42).fit(
        feats
    )
    pairs = lsh.approxSimilarityJoin(feats, feats, 0.5, distCol="d")
    got = {
        (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]): r["d"]
        for r in pairs.filter(
            F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
        ).collect()
    }
    assert (1, 2) in got
    # MLlib's distCol is the EXACT Jaccard distance for candidates
    expect = 1 - len(set(base) & set(near)) / len(set(base) | set(near))
    assert abs(got[(1, 2)] - expect) < 1e-9
    assert (1, 3) not in got and (2, 3) not in got


def test_mllib_brp_ann_matches_exact_topk(spark, sf_dir):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", array_to_vector(F.col("embedding")).alias("features")
    )
    q = e.filter(F.col("vec_id") == 0).first()
    rest = e.filter(F.col("vec_id") != 0)

    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="h", bucketLength=0.5, numHashTables=4, seed=42
    ).fit(e)
    approx = [r.vec_id for r in brp.approxNearestNeighbors(rest, q.features, 5).collect()]

    qv = list(q.embedding)
    exact = sorted(
        (
            (math.dist(list(r.embedding), qv), r.vec_id)
            for r in rest.select("vec_id", "embedding").collect()
        )
    )
    exact_top20 = {v for _, v in exact[:20]}
    # every approx neighbor is a genuinely close vector (within exact top-20)
    assert set(approx) <= exact_top20
    assert len(approx) == 5


def test_mllib_tfidf_matches_sql_formulation(spark):
    from pyspark.ml.feature import IDF, CountVectorizer

    rows = [
        (1, "apple apple banana shared"),
        (2, "cherry shared shared banana"),
        (3, "durian durian durian shared"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "toks", F.split("text", " ")
    )
    cv_model = CountVectorizer(inputCol="toks", outputCol="tf").fit(df)
    tf = cv_model.transform(df)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    out = idf.transform(tf)
    vocab = cv_model.vocabulary

    def top_term(v):
        arr = v.toArray()
        best = max(range(len(arr)), key=lambda i: (arr[i], -ord(vocab[i][0])))
        return vocab[best]

    got = {r.doc_id: top_term(r.tfidf) for r in out.collect()}
    # MLlib IDF = ln((N+1)/(df+1)) — same smoothing as llm_tfidf_topterm
    assert got == {1: "apple", 2: "cherry", 3: "durian"}
