"""K4 schema DDL (drop + recreate) and K6 processed markers, plus IVF ANN
recall vs exact top-k."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_k4_create_or_replace_table(spark, tmp_path):
    # K4: the reference drops and recreates the vector collection schema
    # (VectorDatabase.py:43-61); engine form = CREATE OR REPLACE / overwrite
    # with a NEW schema, old data and old columns gone.
    spark.sql("DROP TABLE IF EXISTS kb_test_d5")
    spark.createDataFrame([(1, "a")], ["chunk_id", "text"]).write.mode(
        "overwrite"
    ).saveAsTable("kb_test_d5")
    assert spark.table("kb_test_d5").columns == ["chunk_id", "text"]

    spark.createDataFrame([(2, "b", 0.5)], ["chunk_id", "text", "score"]).write.mode(
        "overwrite"
    ).option("overwriteSchema", "true").saveAsTable("kb_test_d5")
    got = spark.table("kb_test_d5").collect()
    assert spark.table("kb_test_d5").columns == ["chunk_id", "text", "score"]
    assert len(got) == 1 and got[0].chunk_id == 2
    spark.sql("DROP TABLE kb_test_d5")


def test_k6_processed_marker_idempotent(spark):
    from knowledgebot_spark.sinks.keyed_parquet import with_processed_marker

    df = spark.createDataFrame([("k1", "x")], ["msg_key", "content"])
    once = with_processed_marker(df, "run-1")
    assert once.collect()[0].processed_run == "run-1"
    # re-marking (the reference's already_reacted no-op) overwrites to the
    # same value — idempotent
    twice = with_processed_marker(once.drop("processed_run"), "run-1")
    assert twice.collect()[0].processed_run == "run-1"


def test_ivf_recall_on_planted_clusters(spark):
    """On clustered data (the workload IVF exists for) probing 2/8 cells
    recovers the full exact top-k.  The driver's embeddings table is
    near-random (top cosine ~0.33), where low recall at nprobe/nlist is the
    expected information-theoretic behavior — so the mechanism is validated
    on planted clusters."""
    import random

    from knowledgebot_spark.operators import similarity as sim

    rng = random.Random(7)
    rows = []
    vid = 0
    # orthogonal centers: maximally separated directions, so the exact
    # cosine top-k is unambiguously within the query's cluster
    centers = [[1.0 if d == ci else 0.0 for d in range(8)] for ci in range(5)]
    for ci, c in enumerate(centers):
        for _ in range(40):
            rows.append(
                (vid, [v + rng.uniform(-0.05, 0.05) for v in c])
            )
            vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    got = sim.ivf_topk(df, k=10, nlist=8, nprobe=2, query_id=0)
    ivf_ids = [r.vec_id for r in got.collect()]
    # exact top-10 via brute force
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    exact = sim.topk_cosine(df.filter(F.col("vec_id") != 0), q, k=10)
    exact_ids = [r.vec_id for r in exact.collect()]
    overlap = len(set(ivf_ids) & set(exact_ids))
    assert overlap >= 9, f"IVF recall on clustered data: {overlap}/10"
    # all results come from the query's own cluster (ids 1..39)
    assert all(v < 40 for v in ivf_ids)
