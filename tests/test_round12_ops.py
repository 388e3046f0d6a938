"""Round-12 additions: the bootstrap nodes-index claw-back (two-commit
bootstrap), the frozen-schema manifest invariant, the flat-ledger
stage-dir sweep, and the ingest-gated epoch pack composition."""

from __future__ import annotations

import os

import pytest


# --- bootstrap two-commit claw-back (VERDICT r11 #3) -------------------------------


def test_bootstrap_still_commits_nodes_index(spark, sf_dir, tmp_path):
    """The bootstrap batch now commits labels+champions then the nodes
    index as an immediate second flip (half the hot-exchange rows); the
    END state must be indistinguishable from the one-commit version:
    nodes == labels row-for-row, next delta batch shard-prunable."""
    from pyspark.sql import functions as F

    from knowledgebot_spark import queries_streaming as qs
    from knowledgebot_spark.tables import read_table

    base = str(tmp_path / "boot2c")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    qs._champion_maintain(base, docs, 0)
    man = qs._manifest_load(f"{base}/snap")
    assert man is not None and "nodes" in man["tables"]
    assert man["gen"] == 2, "bootstrap should be exactly two manifest flips"
    labels = {
        (r.node, r.label)
        for r in qs._manifest_table_read(spark, f"{base}/snap", "labels").collect()
    }
    nodes = {
        (r.node, r.label)
        for r in qs._manifest_table_read(spark, f"{base}/snap", "nodes").collect()
    }
    assert labels and nodes == labels
    # nodes shards really are node-keyed (prunable by endpoint shard)
    n = qs._snap_n_shards()
    for s in man["tables"]["nodes"]:
        got = qs._manifest_table_read(spark, f"{base}/snap", "nodes", {int(s)})
        if got is None:
            continue
        bad = got.filter(F.pmod("node", F.lit(n)).cast("int") != int(s)).count()
        assert bad == 0, f"nodes shard {s} holds foreign-node rows"


def test_bootstrap_crash_between_flips_is_recoverable(spark, sf_dir, tmp_path, monkeypatch):
    """A crash BETWEEN the bootstrap's labels+champions flip and its
    nodes flip leaves the loudly-guarded no-'nodes'-index state, and
    rebuild_nodes_index is the advertised repair — after it, the next
    delta batch proceeds normally."""
    from pyspark.sql import functions as F

    from knowledgebot_spark import queries_streaming as qs
    from knowledgebot_spark.tables import read_table

    base = str(tmp_path / "bootcrash")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    real_commit = qs._manifest_commit
    calls = {"n": 0}

    def crashing_commit(root, updates, n_shards):
        calls["n"] += 1
        if calls["n"] == 2:  # the nodes flip
            raise RuntimeError("injected crash before nodes flip")
        return real_commit(root, updates, n_shards)

    monkeypatch.setattr(qs, "_manifest_commit", crashing_commit)
    with pytest.raises(RuntimeError, match="injected crash"):
        qs._champion_maintain(base, docs.filter(F.col("doc_id") % 2 == 0), 0)
    monkeypatch.setattr(qs, "_manifest_commit", real_commit)

    # the guarded state: delta refresh refuses to run on it
    with pytest.raises(ValueError, match="no 'nodes' index"):
        qs._champion_maintain(base, docs.filter(F.col("doc_id") % 2 == 1), 1)

    # the tested repair, then business as usual
    assert qs.rebuild_nodes_index(spark, f"{base}/snap") > 0
    qs._champion_maintain(base, docs.filter(F.col("doc_id") % 2 == 1), 1)
    labels = {
        (r.node, r.label)
        for r in qs._manifest_table_read(spark, f"{base}/snap", "labels").collect()
    }
    nodes = {
        (r.node, r.label)
        for r in qs._manifest_table_read(spark, f"{base}/snap", "nodes").collect()
    }
    assert labels and nodes == labels


# --- frozen-schema manifest invariant (ADVICE r11) ---------------------------------


def test_manifest_commit_rejects_schema_evolution(spark, tmp_path):
    """_manifest_table_read projects OLD-generation shard files with the
    LATEST column list and no mergeSchema; a commit that silently changed
    a table's column set would make reads sampling-dependent.  The commit
    must refuse."""
    from knowledgebot_spark.queries_streaming import _manifest_commit

    root = str(tmp_path / "frozen")
    df = spark.createDataFrame(
        [(1, 1, 1)], "node BIGINT, label BIGINT, _shard INT"
    )
    _manifest_commit(root, {"labels": (df, {1})}, 4)
    # same schema again: fine (the normal per-batch path)
    _manifest_commit(root, {"labels": (df, {1})}, 4)
    evolved = spark.createDataFrame(
        [(1, 1, 0, 1)], "node BIGINT, label BIGINT, extra BIGINT, _shard INT"
    )
    with pytest.raises(ValueError, match="frozen-schema"):
        _manifest_commit(root, {"labels": (evolved, {1})}, 4)


# --- ingest-gated epoch pack (VERDICT r11 #5) --------------------------------------


def test_ingest_gated_docs_never_packed(spark, sf_dir):
    """VERDICT r11 #5 done-condition: a document the near-dup gate
    blocked must never appear in ANY pack of the composed
    ingest -> gate -> mixture -> pack query.  Packed docs are a subset
    of admitted (a low-weight source legitimately packs only its
    residual-prefix docs when full_epochs = 0), and every admitted doc
    of a full-epoch source must appear."""
    from pyspark.sql import functions as F

    from knowledgebot_spark import queries_streaming as qs
    from knowledgebot_spark.queries_llm import _epoch_pack_rows
    from knowledgebot_spark.tables import read_table

    dec = qs._neardup_gate_decisions(spark, sf_dir, "test_gate_pack")
    blocked = {r.doc_id for r in dec.filter("is_blocked").collect()}
    admitted = {r.doc_id for r in dec.filter("NOT is_blocked").collect()}
    assert blocked, "fixture has no near-dups — test vacuous"
    assert admitted

    docs = read_table(spark, sf_dir, "documents").join(
        dec.filter(~F.col("is_blocked")).select("doc_id"), "doc_id", "left_semi"
    )
    packed = {
        r.doc_id
        for r in _epoch_pack_rows(docs).select("doc_id").distinct().collect()
    }
    assert not (packed & blocked), sorted(packed & blocked)[:5]
    assert packed and packed <= admitted, (
        f"packed-but-not-admitted: {sorted(packed - admitted)[:5]}"
    )
    # sources replicated at >= 1 full epoch must pack EVERY admitted doc
    from knowledgebot_spark.queries_llm import _epoch_frames_from

    plan, _ws = _epoch_frames_from(docs)
    full_sources = {
        r.source for r in plan.filter("full_epochs >= 1").collect()
    }
    assert full_sources, "no full-epoch source at this weight draw — vacuous"
    admitted_full = {
        r.doc_id
        for r in docs.select("doc_id", "source").collect()
        if r.source in full_sources
    }
    assert admitted_full <= packed, (
        f"full-epoch docs missing from packs: {sorted(admitted_full - packed)[:5]}"
    )


def test_ingest_pack_composition_matches_stage_outputs(spark, sf_dir):
    """The composed query must be exactly its two registered stages run
    back-to-back: per-source pack totals == the gate's n_kept docs'
    token mass, and the registered query's own output equals packing the
    gate-admitted corpus directly (no recipe drift inside the
    composition)."""
    from pyspark.sql import functions as F

    from knowledgebot_spark import queries_streaming as qs
    from knowledgebot_spark.queries_llm import _epoch_pack_agg, _epoch_pack_rows
    from knowledgebot_spark.tables import read_table

    out = {
        (r.source, r.pack_id): (r.n_docs, r.pack_tokens, r.pack_checksum)
        for r in qs.stream_epoch_ingest_pack(spark, sf_dir).collect()
    }
    dec = qs._neardup_gate_decisions(spark, sf_dir, "test_gate_pack2")
    docs = read_table(spark, sf_dir, "documents").join(
        dec.filter(~F.col("is_blocked")).select("doc_id"), "doc_id", "left_semi"
    )
    want = {
        (r.source, r.pack_id): (r.n_docs, r.pack_tokens, r.pack_checksum)
        for r in _epoch_pack_agg(_epoch_pack_rows(docs)).collect()
    }
    assert out == want


# --- flat-ledger stage-dir sweep (ADVICE r11) --------------------------------------


def test_compact_flat_ledger_sweeps_abandoned_stage_dirs(spark, tmp_path):
    """A crash between the staged write and the move-in loop leaks a
    `.compact_<uuid>` sibling; the next pass must sweep it (and its own
    pass must leave none behind)."""
    from knowledgebot_spark.queries_streaming import _compact_flat_ledger

    d = str(tmp_path / "ledger")
    for i in range(6):
        spark.range(i * 10, i * 10 + 10).toDF("id_a").write.mode(
            "append"
        ).parquet(d)
    # simulate the abandoned stage of a crashed prior pass
    orphan = f"{d}.compact_deadbeef"
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-x.parquet"), "w") as fh:
        fh.write("junk")

    before = {r.id_a for r in spark.read.parquet(d).collect()}
    retired = _compact_flat_ledger(spark, d, max_files=4)
    assert retired > 0
    assert not os.path.exists(orphan), "abandoned stage dir not swept"
    parent = os.path.dirname(d)
    strays = [e for e in os.listdir(parent) if ".compact_" in e]
    assert not strays, f"pass left its own stage dirs: {strays}"
    assert {r.id_a for r in spark.read.parquet(d).collect()} == before
