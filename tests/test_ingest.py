"""E2 vector-ingest path end-to-end (SURVEY.md §3 E2): chunk files on disk
-> S6 whole-file glob scan -> S7 parse -> U1 chunk -> U4 embed -> D5 table
-> Q1/Q2 search over it."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from knowledgebot_spark.operators import chunker as ch
from knowledgebot_spark.operators import embedding as em

FILE1 = (
    "Channel Name: general\n"
    "Channel Members: Amy, Bob\n"
    "Message Date: 05 July 2025\n"
    "Message Author: Amy\n"
    "---\n\n"
    + " ".join(f"alpha{i}" for i in range(30))
)
FILE2 = (
    "Channel Name: random\n"
    "Channel Members: Cid\n"
    "Message Date: 06 July 2025\n"
    "Message Author: Cid\n"
    "Mentions: Amy\n"
    "---\n\n"
    + " ".join(f"beta{i}" for i in range(8))
)
FILE_EMPTY = "Channel Name: general\nMessage Author: Amy\n---\n\n   "


def test_glob_scan_parse_chunk_embed_search(spark, tmp_path):
    src = str(tmp_path / "export")
    os.makedirs(src)
    for name, content in [("a.txt", FILE1), ("b.txt", FILE2), ("c.txt", FILE_EMPTY)]:
        with open(f"{src}/{name}", "w") as fh:
            fh.write(content)

    # S6: whole-file glob scan with source-path column
    files = (
        spark.read.text(f"{src}/*.txt", wholetext=True)
        .withColumn("source", F.input_file_name())
    )
    assert files.count() == 3

    # S7 + P10 + F7
    parsed = ch.parse_header_body(files, "value").filter(F.col("body") != "")
    rows = {r.meta["Channel_Name"]: r for r in parsed.collect()}
    assert set(rows) == {"general", "random"}          # empty body dropped (F7)
    assert rows["random"].meta["Mentions"] == "Amy"

    # U1 chunker (reference defaults 20/5) -> chunk ordinals from posexplode
    chunks = ch.chunk_windows(parsed, "body", chunk_size=20, overlap=5)
    general = chunks.filter(
        F.col("meta")["Channel_Name"] == "general"
    ).orderBy("chunk_pos")
    got = [r.chunk_text for r in general.collect()]
    assert len(got) == 2                                # 30 tokens -> 2 windows
    assert got[0].split(" ")[0] == "alpha0"
    assert got[1].split(" ")[0] == "alpha15"            # stride 15

    # U4 embed -> D5 vector table (K3)
    d5 = em.with_embedding(
        chunks.select(
            F.concat_ws("#", "source", "chunk_pos").alias("chunk_id"),
            F.col("chunk_text").alias("text"),
            F.col("meta")["Channel_Name"].alias("channel_name"),
        ),
        text_col="text",
    )
    out = str(tmp_path / "d5")
    d5.write.parquet(out)
    table = spark.read.parquet(out)
    assert table.count() == 3                           # 2 + 1 chunks
    emb = table.select("embedding").first().embedding
    assert len(emb) == em.DEFAULT_DIM and all(0.0 <= v <= 1.0 for v in emb)

    # Q1: exact cosine top-k against a query vector (JVM dot product)
    q = em.embed_text("alpha0 alpha1 alpha2")
    qlit = F.array(*[F.lit(float(v)) for v in q])
    dot = F.aggregate(
        F.zip_with("embedding", qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.zip_with(c, c, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    )
    scored = table.withColumn(
        "score", dot / (norm(F.col("embedding")) * norm(qlit))
    )
    top = scored.orderBy(F.desc("score")).limit(1).collect()[0]
    assert top.channel_name == "general"

    # Q2: metadata filter BEFORE scoring
    filtered = scored.filter(F.col("channel_name") == "random")
    assert filtered.orderBy(F.desc("score")).limit(1).collect()[0].chunk_id.endswith(
        "#0"
    )
