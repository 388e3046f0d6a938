"""Format scans + file round-trip + full Python-UDF surface
(SURVEY.md §2.1 S6/S7/P10/F7/K1, §2.3 scans + UDF-surface rows).

The json/csv/text queries stage a copy of a parquet table in the target
format under /tmp, then read it back with the matching reader and
aggregate — exercising the real reader code path while the DuckDB oracle
computes the same aggregate straight from parquet (round-trip fidelity is
the assertion).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgebot_spark.operators import chunker as ck
from knowledgebot_spark.queries_pipeline import _SPINE_SQL
from knowledgebot_spark.registry import register
from knowledgebot_spark.sinks.keyed_parquet import serialize_chunk_files


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    from knowledgebot_spark.tables import read_table

    return read_table(spark, sf, name)


def _stage(sf: str, fmt: str) -> str:
    name = os.path.basename(sf.rstrip("/"))
    return f"/tmp/knowledgebot_spark/fmt/{name}/{fmt}"


# --- K1 ∘ S7 == identity: serialize chunk files, parse them back -------------

_ROUNDTRIP_ORACLE = f"""
WITH spine AS ({_SPINE_SQL})
SELECT chunk_key,
  channel_name,
  coalesce(members_csv, '') AS members_csv,
  pretty_date,
  author,
  mentions_csv,
  regexp_replace(regexp_replace(content, '^\\s+', ''), '\\s+$', '') AS body
FROM spine
WHERE regexp_replace(regexp_replace(content, '^\\s+', ''), '\\s+$', '') <> ''
"""


@register(
    "kb_file_roundtrip",
    sql=_ROUNDTRIP_ORACLE,
    tags=("K1", "S7", "P10", "F7"),
)
def kb_file_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """K1 serialization ∘ S7 parse == identity: the spine's chunks are
    serialized to the reference's on-disk file format (header lines +
    ``---`` + body) and parsed back; the oracle states the identity
    directly.  P10 normalizes header keys (Channel Name -> Channel_Name);
    F7 drops empty bodies."""
    from knowledgebot_spark.queries_pipeline import kb_spine_full

    files = serialize_chunk_files(kb_spine_full(spark, sf))
    parsed = ck.parse_header_body(files, "value")
    return parsed.filter(F.col("body") != "").select(
        "chunk_key",
        F.element_at("meta", "Channel_Name").alias("channel_name"),
        F.element_at("meta", "Channel_Members").alias("members_csv"),
        F.element_at("meta", "Message_Date").alias("pretty_date"),
        F.element_at("meta", "Message_Author").alias("author"),
        F.element_at("meta", "Mentions").alias("mentions_csv"),
        "body",
    )


# --- format scans (json / csv / text readers) --------------------------------

@register(
    "rel_scan_json",
    sql="""
SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_nation
FROM nation GROUP BY n_regionkey
""",
    tags=("scan", "json"),
)
def rel_scan_json(spark: SparkSession, sf: str) -> DataFrame:
    path = _stage(sf, "nation_json")
    _t(spark, sf, "nation").write.mode("overwrite").json(path)
    back = spark.read.schema(
        "n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string"
    ).json(path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"), F.min("n_name").alias("first_nation")
    )


@register(
    "rel_scan_csv",
    sql="""
SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
FROM customer GROUP BY c_mktsegment
""",
    tags=("scan", "csv"),
)
def rel_scan_csv(spark: SparkSession, sf: str) -> DataFrame:
    path = _stage(sf, "customer_csv")
    (
        _t(spark, sf, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite")
        .option("header", "true")
        .csv(path)
    )
    back = (
        spark.read.option("header", "true")
        .schema("c_custkey bigint, c_mktsegment string, c_acctbal double")
        .csv(path)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal")
    )


@register(
    "rel_scan_text",
    sql="""
SELECT count(*) AS n_lines, min(s_name) AS first_supplier, max(s_name) AS last_supplier
FROM supplier
""",
    tags=("scan", "text"),
)
def rel_scan_text(spark: SparkSession, sf: str) -> DataFrame:
    path = _stage(sf, "supplier_text")
    (
        _t(spark, sf, "supplier")
        .select(F.concat_ws("|", "s_suppkey", "s_name").alias("value"))
        .write.mode("overwrite")
        .text(path)
    )
    back = spark.read.text(path).select(
        F.split("value", r"\|").getItem(1).alias("s_name")
    )
    return back.agg(
        F.count("*").alias("n_lines"),
        F.min("s_name").alias("first_supplier"),
        F.max("s_name").alias("last_supplier"),
    )


# --- applyInPandas (grouped map) ---------------------------------------------

@register(
    "rel_apply_in_pandas",
    sql="""
SELECT c_custkey, c_mktsegment,
  CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS seg_rank
FROM customer
""",
    tags=("udf", "applyInPandas"),
)
def rel_apply_in_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas: per-segment rank computed inside an Arrow
    batch per group (the UDTF-shaped surface of §2.3; deterministic
    tie-break on custkey)."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["seg_rank"] = pdf.index + 1
        return pdf[["c_custkey", "c_mktsegment", "seg_rank"]]

    c = _t(spark, sf, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    return c.groupBy("c_mktsegment").applyInPandas(
        rank_group, "c_custkey bigint, c_mktsegment string, seg_rank bigint"
    )


# --- grouped-agg pandas UDF --------------------------------------------------

@register(
    "rel_pandas_grouped_agg",
    sql="""
SELECT l_returnflag, CAST(sum(l_quantity) AS BIGINT) AS total_qty, count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    tags=("udf", "pandas-grouped-agg"),
)
def rel_pandas_grouped_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Arrow partial aggregation); quantity is
    integer-valued so the float sum is exact."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def qty_sum(q: pd.Series) -> int:
        return int(q.sum())

    @pandas_udf("bigint")
    def row_count(q: pd.Series) -> int:
        return int(len(q))

    li = _t(spark, sf, "lineitem")
    # pandas grouped-agg UDFs cannot mix with JVM aggregates in one agg()
    return li.groupBy("l_returnflag").agg(
        qty_sum("l_quantity").alias("total_qty"),
        row_count("l_quantity").alias("n"),
    )


# --- Python UDTF -------------------------------------------------------------

@register(
    "rel_python_udtf",
    sql="""
SELECT p_partkey, CAST(t.pos AS INTEGER) AS word_no, t.w AS word
FROM (SELECT p_partkey, str_split(p_name, ' ') AS ws FROM part WHERE p_partkey <= 200),
LATERAL (SELECT unnest(ws) AS w, generate_subscripts(ws, 1) AS pos) t
""",
    tags=("udf", "udtf"),
)
def rel_python_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF (Spark >= 3.5): one output row per word of p_name."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_no int, word string")
    class SplitWords:
        def eval(self, name: str):
            for i, w in enumerate(name.split(" ")):
                yield i + 1, w

    spark.udtf.register("split_words", SplitWords)
    _t(spark, sf, "part").filter(F.col("p_partkey") <= 200).select(
        "p_partkey", "p_name"
    ).createOrReplaceTempView("udtf_part_src")
    return spark.sql(
        "SELECT s.p_partkey, t.word_no, t.word "
        "FROM udtf_part_src s, LATERAL split_words(s.p_name) t"
    )


@register(
    "rel_scan_orc",
    sql="""
SELECT p_brand, count(*) AS n_parts, round(sum(p_retailprice), 2) AS sum_price
FROM part GROUP BY p_brand
""",
    tags=("scan", "orc"),
)
def rel_scan_orc(spark: SparkSession, sf: str) -> DataFrame:
    """ORC scan — the second columnar format Spark ships natively (zero
    extra deps): stage part as ORC, read it back, aggregate.  ORC carries
    the same pushdown/pruning story as parquet (predicate pushdown +
    column projection reach the reader via the DSv2 ORC source)."""
    path = _stage(sf, "part_orc")
    (
        _t(spark, sf, "part")
        .select("p_partkey", "p_brand", "p_retailprice")
        .write.mode("overwrite")
        .orc(path)
    )
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
    )


# --- custom Python data source (Spark 4 DataSource API) -----------------------

@register(
    "rel_scan_python_ds",
    sql="""
WITH g AS (SELECT unnest(generate_series(0, 499)) AS doc_id)
SELECT CAST(doc_id % 8 AS INTEGER) AS shard,
  CAST(count(*) AS BIGINT) AS n,
  CAST(min(doc_id) AS BIGINT) AS min_id,
  CAST(max(doc_id) AS BIGINT) AS max_id,
  min(md5('doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0'))) AS min_md5
FROM g GROUP BY 1
""",
    tags=("scan", "python-datasource"),
)
def rel_scan_python_ds(spark: SparkSession, sf: str) -> DataFrame:
    """Scan through a CUSTOM Python data source (Spark 4 DataSource API,
    sources/synthetic.py): partitions() declares the parallel fetch plan
    (8 shards), read() yields only its shard's rows — the Spark-native
    model for the reference's paginated Slack API source.  The md5 over
    the payload proves the bytes, not just the counts, round-tripped."""
    from knowledgebot_spark.sources.synthetic import register_sources

    register_sources(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("n", "500")
        .option("parts", "8")
        .load()
    )
    return docs.groupBy("shard").agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
        F.min(F.md5("payload")).alias("min_md5"),
    )


# --- mapInArrow UDF surface ---------------------------------------------------

@register(
    "rel_map_in_arrow",
    sql="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(length(text) AS INTEGER) AS n_chars_arrow
FROM documents
""",
    tags=("udf-surface", "mapInArrow"),
)
def rel_map_in_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """mapInArrow — the zero-copy sibling of mapInPandas: the function
    receives raw pyarrow RecordBatches (no pandas conversion) and runs
    vectorized kernels from pyarrow.compute.  The right surface when the
    Python step is itself Arrow-native (tokenizers, Arrow-backed models):
    skips the pandas materialization both ways."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def char_counts(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(batch.column("text")), pa.int32()),
                ],
                ["doc_id", "n_chars_arrow"],
            )

    d = _t(spark, sf, "documents").select("doc_id", "text")
    return d.mapInArrow(char_counts, schema="doc_id long, n_chars_arrow int")


# --- U1 subword chunker (vendored BPE) ---------------------------------------

@register(
    "kb_chunker_subword",
    sql="""
SELECT doc_id, text AS reassembled FROM documents
""",
    tags=("U1", "udf-surface", "bpe"),
)
def kb_chunker_subword(spark: SparkSession, sf: str) -> DataFrame:
    """U1 with a REAL subword tokenizer: the vendored byte-level BPE
    (operators/bpe.py — the always-importable stand-in for the reference's
    tiktoken cl100k_base, TextProcessor.py:38-40) drives the pandas-UDF
    chunker over documents with overlap=0, and the query reassembles each
    document from its windows in chunk order.  The oracle states the
    lossless contract: reassembly == original text, hash-checked — a full
    differential gate on encode -> token windowing -> decode.  (Like
    tiktoken, token windows may split a multi-byte character at a window
    boundary; the testdata corpus is ASCII, where reassembly is exact.)

    Scale posture: the UDF is Arrow-batched and embarrassingly parallel;
    the reassembly groupBy shuffles once on doc_id with sort_array over
    (pos, text) structs — no window function, no driver collect."""
    from knowledgebot_spark.operators import bpe

    from knowledgebot_spark.tables import read_spread

    enc_fn, dec_fn = bpe.pair()
    d = read_spread(spark, sf, "documents").select("doc_id", "text")
    chunks = ck.chunk_text_pandas(
        d, "text", chunk_size=32, overlap=0, tokenizer=enc_fn, detokenizer=dec_fn
    )
    return (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_pos", "chunk_text"))
                    ),
                    lambda s: s.chunk_text,
                ),
                "",
            ).alias("reassembled")
        )
    )


# --- PERMISSIVE corrupt-record JSON scan -------------------------------------

@register(
    "rel_scan_json_corrupt",
    sql="""
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
FROM nation WHERE n_nationkey % 3 <> 0
ORDER BY n_nationkey
""",
    tags=("scan", "json", "robustness"),
)
def rel_scan_json_corrupt(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-drift tolerance: a JSON scan in PERMISSIVE mode quarantines
    malformed lines into ``_corrupt_record`` instead of failing the job —
    the posture a 100 TB crawl ingest needs (one bad shard must not kill
    the run).  Every 3rd nation row is staged as deliberately broken JSON;
    the query returns the clean subset and the oracle states exactly which
    rows survive.  (FAILFAST is the complementary mode for curated inputs;
    the corrupt rows stay queryable for quarantine audits.)"""
    path = _stage(sf, "nation_json_corrupt")
    rows = _t(spark, sf, "nation").selectExpr(
        "n_nationkey",
        "CASE WHEN n_nationkey % 3 = 0 THEN"
        "  '{\"n_nationkey\": ' || CAST(n_nationkey AS STRING) || ', \"n_name\": '"
        " ELSE"
        "  '{\"n_nationkey\": ' || CAST(n_nationkey AS STRING)"
        "    || ', \"n_name\": \"' || n_name || '\"}'"
        " END AS line",
    )
    rows.select("line").coalesce(1).write.mode("overwrite").text(path)
    back = spark.read.schema(
        "n_nationkey bigint, n_name string, _corrupt_record string"
    ).option("mode", "PERMISSIVE").json(path)
    return (
        back.filter(F.col("_corrupt_record").isNull())
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


@register(
    "rel_scan_xml",
    sql="""
SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
  round(sum(s_acctbal), 2) AS sum_bal, min(s_name) AS first_name
FROM supplier GROUP BY s_nationkey
""",
    tags=("scan", "xml"),
)
def rel_scan_xml(spark: SparkSession, sf: str) -> DataFrame:
    """Native XML source (Spark 4 built-in, no external package): stage
    supplier as an XML document tree (rowTag=supplier), read it back with
    an explicit schema, aggregate.  The oracle computes the same aggregate
    straight from parquet, so the assertion is round-trip fidelity of the
    XML writer/reader pair.  Schema is pinned (no inference pass) — at
    scale XML inference would be a second full read of the data."""
    path = _stage(sf, "supplier_xml")
    (
        _t(spark, sf, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .write.mode("overwrite")
        .option("rowTag", "supplier")
        .option("rootTag", "suppliers")
        .format("xml")
        .save(path)
    )
    back = (
        spark.read.schema(
            "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
        )
        .option("rowTag", "supplier")
        .format("xml")
        .load(path)
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("sum_bal"),
        F.min("s_name").alias("first_name"),
    )


@register(
    "rel_xml_functions",
    sql="""
SELECT n_nationkey, n_name, n_regionkey
FROM nation ORDER BY n_nationkey
""",
    tags=("scan", "xml", "scalar"),
)
def rel_xml_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Column-level XML codec: to_xml(struct) -> from_xml == identity on
    every nation row — the message-envelope pattern (XML payloads inside
    a fact column, e.g. legacy feeds landing in a lake) handled without
    leaving the JVM row pipeline.  Parity partner of rel_json_roundtrip
    and rel_variant_json; the oracle states the identity directly."""
    n = _t(spark, sf, "nation")
    xml = n.select(
        F.to_xml(
            F.struct("n_nationkey", "n_name", "n_regionkey"),
            {"rowTag": "nation"},
        ).alias("payload")
    )
    parsed = xml.select(
        F.from_xml(
            "payload", "n_nationkey bigint, n_name string, n_regionkey bigint"
        ).alias("r")
    )
    return parsed.select("r.n_nationkey", "r.n_name", "r.n_regionkey").orderBy(
        "n_nationkey"
    )


# --- binaryFile source scan (wave 9) ------------------------------------------

@register(
    "rel_scan_binary",
    sql="""
SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
  min(n_name) AS first_nation,
  CAST(sum(length(n_name)) AS BIGINT) AS name_bytes
FROM nation GROUP BY n_regionkey
""",
    tags=("scan", "binary", "multimodal"),
)
def rel_scan_binary(spark: SparkSession, sf: str) -> DataFrame:
    """Opaque-binary ingestion via Spark's built-in ``binaryFile`` source
    — the loading path for image/audio/video corpora (the multimodal
    north star stores media as binary columns + typed metadata; this is
    the source that gets raw bytes into a DataFrame).  Round-trip
    formulation, like the other scan queries: the nation table is staged
    as pipe-delimited text, re-read as OPAQUE BYTES (path/length/content
    columns), decoded and parsed entirely in-JVM (decode -> split ->
    explode), and the oracle asserts the recovered relational content
    against the registered view — proving the byte path is lossless, not
    just that a digest matched.

    Scale shape: binaryFile parallelizes per file; the decode/parse is
    in-row inside codegen.  A 100 TB media lake runs THIS scan into the
    mapInPandas decoders of operators/multimodal.py — bytes never touch
    the driver.
    """
    from knowledgebot_spark.tables import read_table

    path = _stage(sf, "nation_bin")
    n = read_table(spark, sf, "nation")
    n.select(
        F.concat_ws("|", F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey"))
        .alias("value")
    ).coalesce(1).write.mode("overwrite").text(path)
    raw = spark.read.format("binaryFile").load(path + "/*.txt")
    lines = raw.select(
        F.explode(
            F.split(F.rtrim(F.decode(F.col("content"), "UTF-8")), "\n")
        ).alias("line")
    ).filter(F.col("line") != "")
    parsed = lines.select(
        F.split("line", "\\|").alias("f")
    ).select(
        F.element_at("f", 1).cast("bigint").alias("n_nationkey"),
        F.element_at("f", 2).alias("n_name"),
        F.element_at("f", 3).cast("bigint").alias("n_regionkey"),
    )
    return parsed.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.min("n_name").alias("first_nation"),
        F.sum(F.length("n_name")).alias("name_bytes"),
    )


# --- S8/K5: checkpoint state round-trip as an oracled staging query ----------
# (round-6 advice item 4: the I/O-seam ops get real driver-hash evidence via
# the staging pattern — stage state, restart, oracle over the resumed values)

from knowledgebot_spark import model as _kbm


@register(
    "kb_checkpoint_roundtrip",
    sql=_kbm.MODEL_CTE
    + f"""
SELECT run_id, resumed_ckpt_micros, n_processed FROM (
  SELECT 1 AS run_id, CAST(0 AS BIGINT) AS resumed_ckpt_micros,
    (SELECT count(*) FROM messages
     WHERE ts_micros > 0
       AND ts_micros <= {_kbm.CKPT_MICROS}) AS n_processed
  UNION ALL
  SELECT 2, CAST({_kbm.CKPT_MICROS} AS BIGINT),
    (SELECT count(*) FROM messages
     WHERE ts_micros > {_kbm.CKPT_MICROS})
  UNION ALL
  SELECT 3, CAST({_kbm.CKPT_MICROS + _kbm.LOOKBACK_MICROS} AS BIGINT),
    (SELECT count(*) FROM messages
     WHERE ts_micros > {_kbm.CKPT_MICROS + _kbm.LOOKBACK_MICROS})
) ORDER BY run_id
""",
    tags=("S8", "K5", "F1", "staging"),
)
def kb_checkpoint_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S8 state read + K5 pre-scan-stamped atomic write, proven across a
    simulated restart (reference KnowledgeBot.py:110,133-163): run 1 starts
    with no state (checkpoint resumes to 0), processes every message that
    had arrived by its pre-scan stamp T1 = CKPT_MICROS, and commits T1;
    run 2 RE-READS the persisted state (must resume to exactly T1),
    processes the strictly-newer tail (F1 strict >), and commits its own
    stamp T2.  Row 3 re-loads state once more and must see T2, with only
    messages strictly newer than T2 left (zero at small SFs; at sf0.1 the
    corpus timeline extends past T2 — the oracle states the same count).  The resumed checkpoint values flow from the ACTUAL
    state files through ``sinks.checkpoint.IncrementalRun`` into the Spark
    filters/literals, so a broken resume (wrong stamp, truncated file,
    non-atomic write) hash-mismatches against the oracle's closed-form
    expectations."""
    import shutil

    from knowledgebot_spark import model
    from knowledgebot_spark.sinks.checkpoint import IncrementalRun, load_state

    t1 = model.CKPT_MICROS
    t2 = model.CKPT_MICROS + model.LOOKBACK_MICROS
    state = f"/tmp/knowledgebot_spark/ckpt/{os.path.basename(sf.rstrip('/'))}/roundtrip"
    shutil.rmtree(state, ignore_errors=True)

    m = model.messages(spark, sf)

    run1 = IncrementalRun(state, now_micros=t1)  # fresh dir -> resumes to 0
    ck1 = run1.checkpoint_micros
    run1.commit()  # K5: stamps PRE-scan time t1, atomically

    run2 = IncrementalRun(state, now_micros=t2)  # must resume to t1
    ck2 = run2.checkpoint_micros
    run2.commit()

    ck3 = int(load_state(state)["last_run_timestamp"])  # must be t2

    counts = m.agg(
        F.sum(
            F.when((F.col("ts_micros") > ck1) & (F.col("ts_micros") <= t1), 1).otherwise(0)
        ).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("ts_micros") > ck2, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("ts_micros") > ck3, 1).otherwise(0)).cast("bigint").alias("n3"),
    )
    return counts.selectExpr(
        f"stack(3, 1, CAST({ck1} AS BIGINT), n1, "
        f"2, CAST({ck2} AS BIGINT), n2, "
        f"3, CAST({ck3} AS BIGINT), n3) AS (run_id, resumed_ckpt_micros, n_processed)"
    ).orderBy("run_id")


@register(
    "kb_checkpoint_corrupt_default",
    sql=_kbm.MODEL_CTE
    + f"""
SELECT state_case, resumed_ckpt_micros, n_fresh FROM (
  SELECT 'corrupt' AS state_case, CAST(0 AS BIGINT) AS resumed_ckpt_micros,
    (SELECT count(*) FROM messages WHERE ts_micros > 0) AS n_fresh
  UNION ALL
  SELECT 'missing', CAST(0 AS BIGINT),
    (SELECT count(*) FROM messages WHERE ts_micros > 0)
  UNION ALL
  SELECT 'valid', CAST({_kbm.CKPT_MICROS} AS BIGINT),
    (SELECT count(*) FROM messages
     WHERE ts_micros > {_kbm.CKPT_MICROS})
) ORDER BY state_case
""",
    tags=("S8", "staging", "degenerate"),
)
def kb_checkpoint_corrupt_default(spark: SparkSession, sf: str) -> DataFrame:
    """S8 degenerate paths as driver-hash evidence (reference
    KnowledgeBot.py:139-155: missing OR undecodable state file -> default
    ``{'last_run_timestamp': 0}``, i.e. reprocess everything rather than
    silently skip): three state directories — one never written, one with
    garbage bytes where state.json should be, one valid (K5-written with
    CKPT_MICROS) — are loaded through the real S8 reader, and each resumed
    checkpoint drives a freshness count over the model messages.  The
    corrupt and missing cases must behave identically (resume to epoch 0,
    everything fresh); the valid case must match kb_freshness's n_fresh."""
    import shutil

    from knowledgebot_spark import model
    from knowledgebot_spark.sinks.checkpoint import load_state, save_state

    base = f"/tmp/knowledgebot_spark/ckpt/{os.path.basename(sf.rstrip('/'))}"
    cases = {}
    corrupt = f"{base}/corrupt"
    shutil.rmtree(corrupt, ignore_errors=True)
    os.makedirs(corrupt, exist_ok=True)
    with open(f"{corrupt}/state.json", "w", encoding="utf-8") as fh:
        fh.write("{not json at all")
    cases["corrupt"] = int(load_state(corrupt)["last_run_timestamp"])

    missing = f"{base}/missing"
    shutil.rmtree(missing, ignore_errors=True)
    cases["missing"] = int(load_state(missing)["last_run_timestamp"])

    valid = f"{base}/valid"
    shutil.rmtree(valid, ignore_errors=True)
    save_state(valid, {"last_run_timestamp": model.CKPT_MICROS})
    cases["valid"] = int(load_state(valid)["last_run_timestamp"])

    m = model.messages(spark, sf)
    counts = m.agg(
        *[
            F.sum(F.when(F.col("ts_micros") > ck, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{name}")
            for name, ck in cases.items()
        ]
    )
    stack_args = ", ".join(
        f"'{name}', CAST({ck} AS BIGINT), n_{name}" for name, ck in cases.items()
    )
    return counts.selectExpr(
        f"stack({len(cases)}, {stack_args}) AS (state_case, resumed_ckpt_micros, n_fresh)"
    ).orderBy("state_case")


# --- K4: schema DDL drop + create as an oracled staging query ----------------


@register(
    "kb_ddl_roundtrip",
    sql=_kbm.MODEL_CTE
    + """
SELECT CAST(count(*) AS BIGINT) AS n_channels,
  string_agg(name, ',' ORDER BY name) AS names_csv,
  CAST(0 AS BIGINT) AS n_stale
FROM channels_dim
""",
    tags=("K4", "ddl", "staging"),
)
def kb_ddl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """K4 schema DDL drop+create (reference VectorDatabase.py:43-60:
    ``schema.delete_class`` then ``create_class`` on every full run —
    recreate-from-scratch semantics).  Spark form: a managed table in a
    dedicated catalog database is created from a STALE generation
    (channels_dim plus poison marker rows), then DROPped and re-CREATEd
    from the current source — the read-back aggregate proves the stale
    generation is fully gone (n_stale must be 0; leaked rows would also
    corrupt n_channels/names_csv and hash-mismatch).  DDL goes through the
    session catalog (CREATE DATABASE / DROP TABLE / CREATE TABLE AS
    SELECT), not file manipulation, so what's exercised is the metastore
    path a warehouse deployment uses.

    Re-entrancy contract (shared by the checkpoint/marker staging queries):
    the build-time side effects (DROP/CREATE under the shared
    /tmp/knowledgebot_spark/ddl_warehouse, keyed per sf-dir) assume the
    driver harness's single-process, invoke-then-collect discipline.  The
    returned handle is lazy over a table this function itself drops and
    recreates — invoking the query fn again BEFORE collecting a previously
    returned DataFrame, or running two sessions against the same warehouse
    path, reads across generations.  A multi-tenant deployment would key
    the database per session (e.g. suffix the warehouse path with the
    session id) to make this safe; the harness contract makes that
    unnecessary here."""
    import shutil

    from knowledgebot_spark import model

    name = os.path.basename(sf.rstrip("/")).replace(".", "_").replace("-", "_")
    spark.sql(
        "CREATE DATABASE IF NOT EXISTS kb_ddl "
        "LOCATION '/tmp/knowledgebot_spark/ddl_warehouse'"
    )
    tbl = f"kb_ddl.channels_{name}"
    # the session catalog is in-memory: a PREVIOUS session's managed table
    # files can survive under the warehouse location while being unknown to
    # this catalog, so DROP TABLE IF EXISTS alone can't clear them — scrub
    # the orphaned location before the first CREATE (idempotent restart)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(f"/tmp/knowledgebot_spark/ddl_warehouse/channels_{name}", ignore_errors=True)

    dim = model.channels_dim(spark, sf)
    stale = dim.unionByName(
        dim.select(
            F.concat(F.lit("X"), "channel_id").alias("channel_id"),
            F.concat(F.lit("stale "), "name").alias("name"),
            "topic",
            "purpose",
        )
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    stale.write.saveAsTable(tbl)  # generation 1: poisoned

    spark.sql(f"DROP TABLE IF EXISTS {tbl}")  # K4 delete_class
    dim.write.saveAsTable(tbl)  # K4 create_class: clean generation 2

    back = spark.table(tbl)
    return back.agg(
        F.count("*").cast("bigint").alias("n_channels"),
        F.array_join(F.array_sort(F.collect_list("name")), ",").alias("names_csv"),
        F.sum(F.when(F.col("name").startswith("stale "), 1).otherwise(0))
        .cast("bigint")
        .alias("n_stale"),
    )


# --- S6: file glob scan as an oracled staging query ---------------------------


@register(
    "kb_glob_scan",
    sql="""
SELECT CAST(n_regionkey AS BIGINT) AS region_key,
  CAST(count(*) AS BIGINT) AS n_nations,
  min(n_name) AS first_nation,
  CAST(sum(length(n_name)) AS BIGINT) AS name_bytes
FROM nation GROUP BY 1 ORDER BY 1
""",
    tags=("S6", "glob", "staging"),
)
def kb_glob_scan(spark: SparkSession, sf: str) -> DataFrame:
    """S6 file-glob scan (reference KnowledgeBot.py export-folder glob of
    chunk ``.txt`` files): nations staged as text files in per-region
    directories, then discovered by GLOB — ``pathGlobFilter='*.txt'`` +
    ``recursiveFileLookup`` selects exactly the .txt part-files and skips
    the _SUCCESS markers the writer leaves beside them — with the region
    key recovered from the FILE PATH (``input_file_name``), not the file
    contents, which is the defining S6 behavior (path-derived metadata).
    The oracle recomputes the per-region aggregate from the parquet
    nation table; a glob that over- or under-selects files changes
    n_nations and hash-fails."""
    base = f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf.rstrip('/'))}/glob_nations"
    n = _t(spark, sf, "nation")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        (
            n.select(
                "n_regionkey",
                F.concat_ws("|", F.col("n_name"), F.col("n_nationkey").cast("string")).alias(
                    "value"
                ),
            )
            .repartition("n_regionkey")
            .write.mode("overwrite")
            .partitionBy("n_regionkey")
            .text(base)
        )
    files = (
        spark.read.option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .text(base)
        .withColumn(
            "region_key",
            F.regexp_extract(F.input_file_name(), r"n_regionkey=(\d+)", 1).cast("bigint"),
        )
    )
    parsed = files.select(
        "region_key", F.split_part("value", F.lit("|"), F.lit(1)).alias("n_name")
    )
    return (
        parsed.groupBy("region_key")
        .agg(
            F.count("*").alias("n_nations"),
            F.min("n_name").alias("first_nation"),
            F.sum(F.length("n_name")).alias("name_bytes"),
        )
        .orderBy("region_key")
    )


# --- K3: vector batch upsert as an oracled staging query ----------------------


@register(
    "kb_vector_upsert",
    sql="""
SELECT gen, CAST(count(*) AS BIGINT) AS n_vectors, CAST(sum(val) AS BIGINT) AS sum_val
FROM (
  SELECT CASE WHEN vec_id % 3 = 0 THEN 'g2' ELSE 'g1' END AS gen,
    CASE WHEN vec_id % 3 = 0
      THEN CAST(floor(embedding[1] * 1000 + 0.5) AS BIGINT) + 1000000
      ELSE CAST(floor(embedding[1] * 1000 + 0.5) AS BIGINT) END AS val
  FROM embeddings
) GROUP BY gen ORDER BY gen
""",
    tags=("K3", "upsert", "staging"),
)
def kb_vector_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """K3 vector batch upsert (reference VectorDatabase.py:73: batched
    upsert into the vector store) through the keyed idempotent sink:
    generation 1 writes every vector's quantized payload; a second batch
    re-ingests every ``vec_id % 3 == 0`` vector with updated values, and
    ``upsert_chunks`` must DELETE the stale rows for exactly those keys
    and append the new ones — touching only the bucket partitions the
    batch lands in (dynamic partition overwrite, never the whole table).
    Read-back aggregates by generation; a leaked stale row or a lost
    update changes both n_vectors and sum_val.  Values are quantized to
    BIGINT (floor(x*1000+.5) on the first component) so the hash compare
    is integer-exact across engines."""
    import shutil

    from knowledgebot_spark.sinks.keyed_parquet import upsert_chunks

    path = f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf.rstrip('/'))}/vec_upsert"
    shutil.rmtree(path, ignore_errors=True)

    e = _t(spark, sf, "embeddings")
    val = F.expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 1000 + 0.5) AS BIGINT)")
    gen1 = e.select(
        "vec_id",
        (F.col("vec_id") % 8).alias("bucket"),
        val.alias("val"),
        F.lit("g1").alias("gen"),
    )
    upsert_chunks(spark, path, gen1, key_col="vec_id", partition_cols=("bucket",))

    batch2 = (
        e.filter(F.col("vec_id") % 3 == 0)
        .select(
            "vec_id",
            (F.col("vec_id") % 8).alias("bucket"),
            (val + 1000000).alias("val"),
            F.lit("g2").alias("gen"),
        )
    )
    upsert_chunks(spark, path, batch2, key_col="vec_id", partition_cols=("bucket",))

    back = spark.read.parquet(path)
    return (
        back.groupBy("gen")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("val").cast("bigint").alias("sum_val"),
        )
        .orderBy("gen")
    )


# --- K6: processed marker as an oracled staging query -------------------------


@register(
    "kb_processed_markers",
    sql=f"""
WITH spine AS ({_SPINE_SQL})
SELECT CASE WHEN channel_name = 'chan africa' THEN 'run2' ELSE 'run1' END AS processed_run,
  CAST(count(*) AS BIGINT) AS n_chunks
FROM spine GROUP BY 1 ORDER BY 1
""",
    tags=("K6", "marker", "staging"),
)
def kb_processed_markers(spark: SparkSession, sf: str) -> DataFrame:
    """K6 processed marker (reference KnowledgeBot.py mortar-board
    reaction: mark a message processed; re-processing overwrites the same
    marker idempotently).  Run 1 lands every spine chunk with marker
    'run1'; run 2 REPROCESSES one channel's messages and the keyed upsert
    must overwrite exactly those rows' markers with 'run2' — stale 'run1'
    markers on reprocessed keys, or flipped markers on untouched keys,
    change the per-marker counts.  The oracle states the same partition
    from the spine CTE (reprocessed channel -> run2, everything else ->
    run1)."""
    import shutil

    from knowledgebot_spark.queries_pipeline import kb_spine_full
    from knowledgebot_spark.sinks.keyed_parquet import upsert_chunks, with_processed_marker

    path = f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf.rstrip('/'))}/markers"
    shutil.rmtree(path, ignore_errors=True)

    spine = kb_spine_full(spark, sf).select(
        "msg_key", "chunk_key", "channel_name", "msg_date"
    )
    run1 = with_processed_marker(spine, "run1")
    upsert_chunks(spark, path, run1, key_col="msg_key")

    redo = with_processed_marker(
        spine.filter(F.col("channel_name") == "chan africa"), "run2"
    )
    upsert_chunks(spark, path, redo, key_col="msg_key")

    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("processed_run"))
        .agg(F.count("*").alias("n_chunks"))
        .orderBy("processed_run")
    )


# --- P13: truthy / list / validation config casts as an oracled query ---------

# Fixture matrix evaluated through the REAL config layer at query build;
# the oracle states the expected outputs as literals, so any behavior
# change in parse_bool/parse_list/EngineConfig validation hash-fails.
_CONFIG_CASES = (
    ("bool_TRUE", "KB_ENABLE_LLM", "TRUE"),
    ("bool_1", "KB_ENABLE_LLM", "1"),
    ("bool_yes_ws", "KB_ENABLE_LLM", "  yes  "),
    ("bool_On", "KB_ENABLE_LLM", "On"),
    ("bool_0", "KB_ENABLE_LLM", "0"),
    ("bool_no", "KB_ENABLE_LLM", "no"),
    ("bool_absent", "KB_ENABLE_LLM", None),
    ("list_padded", "KB_CHANNELS", " a , b ,, c "),
    ("list_empty", "KB_CHANNELS", ""),
    ("list_absent", "KB_CHANNELS", None),
    ("int_default", "KB_THREAD_MAX_AGE_DAYS", None),
    ("int_set", "KB_THREAD_MAX_AGE_DAYS", "30"),
    ("overlap_ge_size", "KB_CHUNK_OVERLAP", "100"),
    ("size_nonpositive", "KB_CHUNK_LENGTH", "0"),
)


@register(
    "kb_config_casts",
    sql="""
SELECT * FROM (VALUES
  ('bool_TRUE', 'true'), ('bool_1', 'true'), ('bool_yes_ws', 'true'),
  ('bool_On', 'true'), ('bool_0', 'false'), ('bool_no', 'false'),
  ('bool_absent', 'false'),
  ('list_padded', 'a|b|c'), ('list_empty', ''), ('list_absent', ''),
  ('int_default', '7'), ('int_set', '30'),
  ('overlap_ge_size', 'rejected:ValueError'),
  ('size_nonpositive', 'rejected:ValueError')
) t(case_id, resolved) ORDER BY case_id
""",
    tags=("P13", "config"),
)
def kb_config_casts(spark: SparkSession, sf: str) -> DataFrame:
    """P13 truthy/config casts (reference Config/Schema.py:83 truthy set,
    :119-122 comma-list split+strip, env-over-default resolution) driven
    through the REAL ``knowledgebot_spark.config`` layer: each fixture env
    is resolved via ``EngineConfig.from_env`` and the resolved field (or
    the validation rejection — the overlap>=size / size<=0 guards that fix
    the reference's infinite-loop, SURVEY.md §2.2) becomes a row the
    oracle pins as a literal.  A semantics drift in parse_bool/parse_list
    or a dropped validation changes ``resolved`` and hash-fails.  The
    config plane is driver-side by nature; Spark's role is carrying the
    resolved matrix into the comparable result."""
    from knowledgebot_spark.config import EngineConfig

    rows = []
    for case_id, var, raw in _CONFIG_CASES:
        env = {} if raw is None else {var: raw}
        try:
            cfg = EngineConfig.from_env(env)
            if var == "KB_ENABLE_LLM":
                resolved = "true" if cfg.enable_llm else "false"
            elif var == "KB_CHANNELS":
                resolved = "|".join(cfg.channels)
            elif var == "KB_THREAD_MAX_AGE_DAYS":
                resolved = str(cfg.thread_max_age_days)
            else:
                resolved = "ok"
        except ValueError:
            resolved = "rejected:ValueError"
        rows.append((case_id, resolved))
    return spark.createDataFrame(rows, "case_id string, resolved string").orderBy(
        "case_id"
    )
