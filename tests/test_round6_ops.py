"""Round-6 additions: the I/O-seam ops (S8/K5 checkpoint, K4 DDL) converted
to oracled staging queries, pinned here by their structural invariants —
the driver hash gate checks values; these check the seams the hash can't
see (state actually persisted across the simulated restart, stale DDL
generation actually dropped, corrupt==missing equivalence)."""

from __future__ import annotations

import os

import pytest

from knowledgebot_spark import model


@pytest.fixture(scope="module")
def catalog():
    from knowledgebot_spark.registry import load

    return load()


def test_checkpoint_roundtrip_resumes_persisted_stamp(spark, sf_dir, catalog):
    rows = {r.run_id: r for r in catalog["kb_checkpoint_roundtrip"].fn(spark, sf_dir).collect()}
    t1 = model.CKPT_MICROS
    t2 = model.CKPT_MICROS + model.LOOKBACK_MICROS
    # run 1 started fresh; run 2 resumed run 1's pre-scan stamp; the final
    # load sees run 2's stamp with nothing newer left
    assert rows[1].resumed_ckpt_micros == 0
    assert rows[2].resumed_ckpt_micros == t1
    assert rows[3].resumed_ckpt_micros == t2
    m = model.messages(spark, sf_dir)
    import pyspark.sql.functions as F

    assert rows[3].n_processed == m.filter(F.col("ts_micros") > t2).count()
    # the two runs partition the corpus exactly (strict > on both sides)
    assert rows[1].n_processed + rows[2].n_processed == m.count()
    # and the state file on disk is the atomic-rename artifact, not a temp
    state = f"/tmp/knowledgebot_spark/ckpt/{os.path.basename(sf_dir.rstrip('/'))}/roundtrip"
    assert os.path.exists(f"{state}/state.json")
    assert not [f for f in os.listdir(state) if f.endswith(".tmp")]


def test_checkpoint_corrupt_equals_missing(spark, sf_dir, catalog):
    rows = {
        r.state_case: r
        for r in catalog["kb_checkpoint_corrupt_default"].fn(spark, sf_dir).collect()
    }
    assert rows["corrupt"].resumed_ckpt_micros == 0
    assert rows["missing"].resumed_ckpt_micros == 0
    assert rows["corrupt"].n_fresh == rows["missing"].n_fresh
    assert rows["valid"].resumed_ckpt_micros == model.CKPT_MICROS
    # the valid case is kb_freshness's n_fresh by construction
    fresh = catalog["kb_freshness"].fn(spark, sf_dir).first().n_fresh
    assert rows["valid"].n_fresh == fresh
    # degenerate resumes reprocess EVERYTHING (ts > 0), never skip
    assert rows["corrupt"].n_fresh == model.messages(spark, sf_dir).count()


def test_ddl_roundtrip_drops_stale_generation(spark, sf_dir, catalog):
    row = catalog["kb_ddl_roundtrip"].fn(spark, sf_dir).first()
    assert row.n_stale == 0
    n_regions = spark.read.parquet(f"{sf_dir}/region.parquet").count()
    assert row.n_channels == n_regions
    assert "stale" not in row.names_csv
    # the catalog table exists and IS generation 2 (poison rows gone)
    name = os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
    back = spark.table(f"kb_ddl.channels_{name}")
    assert back.count() == n_regions


def test_glob_scan_excludes_non_matching_files(spark, sf_dir, catalog):
    """S6: the glob must select exactly the .txt part-files — the writer's
    _SUCCESS markers sit beside them in every directory and would add rows
    (or crash the parse) if pathGlobFilter over-selected."""
    import glob as g

    rows = catalog["kb_glob_scan"].fn(spark, sf_dir).collect()
    n_regions = spark.read.parquet(f"{sf_dir}/region.parquet").count()
    assert len(rows) == n_regions
    base = f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf_dir.rstrip('/'))}/glob_nations"
    assert os.path.exists(f"{base}/_SUCCESS")  # decoy present, not selected
    n_nations = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    assert sum(r.n_nations for r in rows) == n_nations


def test_vector_upsert_replaces_exactly_the_batch_keys(spark, sf_dir, catalog):
    rows = {r.gen: r for r in catalog["kb_vector_upsert"].fn(spark, sf_dir).collect()}
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    n_g2 = e.filter("vec_id % 3 = 0").count()
    assert rows["g2"].n_vectors == n_g2
    assert rows["g1"].n_vectors == n - n_g2
    # no key appears twice: total row count is exactly |vectors|
    path = f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf_dir.rstrip('/'))}/vec_upsert"
    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.select("vec_id").distinct().count() == n


def test_processed_marker_overwrite_is_idempotent(spark, sf_dir, catalog):
    """K6: re-running a key overwrites the same marker — the reprocessed
    channel's chunks carry run2 ONLY (no duplicated rows with both
    markers), everything else keeps run1."""
    rows = {r.processed_run: r.n_chunks for r in
            catalog["kb_processed_markers"].fn(spark, sf_dir).collect()}
    path = f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf_dir.rstrip('/'))}/markers"
    back = spark.read.parquet(path)
    from pyspark.sql import functions as F

    per_key = back.groupBy("msg_key").agg(
        F.count_distinct("processed_run").alias("n_markers")
    )
    assert per_key.filter("n_markers > 1").count() == 0
    africa = back.filter(F.col("channel_name") == "chan africa")
    assert africa.filter("processed_run <> 'run2'").count() == 0
    assert rows.get("run2", 0) == africa.count()


def test_config_casts_pin_the_real_config_layer(spark, sf_dir, catalog):
    rows = {r.case_id: r.resolved for r in
            catalog["kb_config_casts"].fn(spark, sf_dir).collect()}
    assert rows["bool_yes_ws"] == "true"      # strip + lower before the set
    assert rows["bool_On"] == "true"
    assert rows["bool_absent"] == "false"     # default, not crash
    assert rows["list_padded"] == "a|b|c"     # split + strip + drop-empties
    assert rows["overlap_ge_size"] == "rejected:ValueError"
    assert rows["size_nonpositive"] == "rejected:ValueError"


def test_incremental_view_refresh_retracts_and_inserts(spark, sf_dir, catalog):
    """IVM: the refreshed view must have dropped January BY MERGE (the
    staged base still contains it — proof the retraction did the work,
    not a re-filter), gained May from the insert delta, and match a
    pandas recompute of the slid window exactly."""
    import pandas as pd

    rows = {r.order_month: r for r in
            catalog["rel_incremental_view_refresh"].fn(spark, sf_dir).collect()}
    assert "1999-01" not in rows          # retracted to zero and dropped
    assert "1999-05" in rows              # inserted by the delta
    base = pd.read_parquet(
        f"/tmp/knowledgebot_spark/fmt/{os.path.basename(sf_dir.rstrip('/'))}/ivm_base"
    )
    assert "1999-01" in set(base["order_month"])  # base kept it; merge removed it
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    w = o[(o["o_orderdate"] >= "1999-02-01") & (o["o_orderdate"] < "1999-06-01")].copy()
    w["m"] = w["o_orderdate"].dt.strftime("%Y-%m")
    import numpy as np

    w["e2"] = np.floor(w["o_totalprice"] * 100 + 0.5).astype("int64")
    exp = w.groupby("m").agg(n=("m", "size"), rev=("e2", "sum"))
    assert {m: (r.n_orders, r.revenue_e2) for m, r in rows.items()} == {
        m: (int(v["n"]), int(v["rev"])) for m, v in exp.iterrows()
    }


def test_table_fingerprint_is_partition_invariant_and_replayable(spark, sf_dir, catalog):
    """Fingerprint: equal under a hostile repartitioning of the input
    (order/partition-invariance is the whole contract) and replayable
    in pure python from the same canonicalization."""
    import hashlib

    import pandas as pd
    import numpy as np

    r = catalog["rel_table_fingerprint"].fn(spark, sf_dir).collect()[0]
    assert r.corruption_detected

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    e2 = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    xor60, sum32, n = 0, 0, 0
    for key, cust, status, prio, cents, day in zip(
        o["o_orderkey"], o["o_custkey"], o["o_orderstatus"],
        o["o_orderpriority"], e2, o["o_orderdate"].dt.strftime("%Y-%m-%d"),
    ):
        s = f"{key}|{cust}|{status}|{prio}|{cents}|{day}"
        h = hashlib.md5(s.encode()).hexdigest()
        xor60 ^= int(h[:15], 16)
        sum32 += int(h[16:24], 16)
        n += 1
    assert (r.n_rows, r.xor60, r.sum32) == (n, xor60, sum32)

    # partition invariance: 13-way repartitioned source, same integers
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(13, "o_custkey")
    row_str = F.expr(
        "concat_ws('|', CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING), "
        "o_orderstatus, o_orderpriority, "
        "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING), "
        "date_format(o_orderdate, 'yyyy-MM-dd'))"
    )
    h60 = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("bigint")
    h32 = F.conv(F.substring(F.md5(row_str), 17, 8), 16, 10).cast("bigint")
    redo = src.agg(F.bit_xor(h60).alias("x"), F.sum(h32).alias("s")).collect()[0]
    assert (redo.x, redo.s) == (xor60, sum32)
