"""Round-7 additions: alternating-star connected components, the
compaction planner, snapshot diff, hashed-feature classifier, leakage-safe
split, and JL random projection.  The driver hash gate checks values at
sf0.01; these pin the structural properties the hash can't see — O(log n)
convergence on a chain label propagation cannot finish, bin-capacity
bounds, diff completeness, group-atomicity, and JL energy concentration."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def catalog():
    from knowledgebot_spark.registry import load

    return load()


# --- alternating-star connected components ------------------------------------


def test_alternating_star_beats_label_prop_on_long_chain(spark):
    """A 64-node path graph has diameter 63: the CLUSTER_ITERS=3 label
    propagation in llm_dedup_clusters cannot resolve it, alternating
    stars must — in ~log2(63) rounds, enforced by the operator's own
    max_rounds cap (64 >> log2(63) ~ 6, with 64 ≥ log2 of any int64
    diameter)."""
    from knowledgebot_spark.operators.dedup import alternating_star_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    labels = {
        r.node: r.label for r in alternating_star_components(edges).collect()
    }
    assert len(labels) == 64
    assert all(labels[i] == 0 for i in range(64))


def test_alternating_star_multi_component_and_idempotent(spark):
    from knowledgebot_spark.operators.dedup import alternating_star_components

    # triangle + chain + isolated edge, plus a duplicate/reversed edge to
    # prove input canonicalization
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12), (5, 6), (6, 7), (1, 2), (2, 1), (1, 2)],
        "id_a long, id_b long",
    )
    out = sorted(tuple(r) for r in alternating_star_components(edges).collect())
    assert out == [
        (1, 1), (2, 1),
        (5, 5), (6, 5), (7, 5),
        (10, 10), (11, 10), (12, 10),
    ]


def test_alternating_star_matches_label_prop_on_corpus(spark, sf_dir, catalog):
    """The two registered algorithms must give the SAME clustering on the
    real near-dup graph (near-cliques, where bounded label prop is also
    correct) — two implementations, one answer."""
    a = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in catalog["llm_cc_alternating_star"].fn(spark, sf_dir).collect()
    }
    b = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in catalog["llm_dedup_clusters"].fn(spark, sf_dir).collect()
    }
    assert a == b and len(a) > 0


# --- compaction planner --------------------------------------------------------


def test_compaction_plan_capacity_and_completeness(spark, sf_dir, catalog):
    from knowledgebot_spark.queries_relational import _COMPACT_BINS, _COMPACT_FILES

    rows = catalog["rel_compaction_plan"].fn(spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    sizes = (
        np.floor(o["o_totalprice"] * 100 + 0.5)
        .astype("int64")
        .groupby(o["o_orderkey"] % _COMPACT_FILES)
        .sum()
    )
    target = int(sizes.sum()) // _COMPACT_BINS + 1
    # completeness: every file landed in exactly one bin
    assert sum(r.n_files for r in rows) == len(sizes)
    assert sum(r.bin_bytes for r in rows) == int(sizes.sum())
    # bin ids are the contiguous prefix 0..n-1 (prefix-sum packing)
    assert [r.bin_id for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r.target_bytes == target
        # capacity-relaxed NFD bound: overshoot strictly less than the
        # bin's own largest member file
        assert r.bin_bytes < target + r.max_file_bytes
        assert r.fill_e4 == r.bin_bytes * 10000 // target
    # all bins except possibly the last are filled past target - max_file
    for r in rows[:-1]:
        assert r.bin_bytes > target - r.max_file_bytes


def test_compaction_plan_matches_sequential_replay(spark, sf_dir, catalog):
    """Replaying the same prefix-sum packing sequentially in pandas must
    give identical bin assignments — the distributed cumsum is exact."""
    from knowledgebot_spark.queries_relational import _COMPACT_BINS, _COMPACT_FILES

    rows = catalog["rel_compaction_plan"].fn(spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    sizes = (
        np.floor(o["o_totalprice"] * 100 + 0.5)
        .astype("int64")
        .groupby(o["o_orderkey"] % _COMPACT_FILES)
        .sum()
        .reset_index()
    )
    sizes.columns = ["file_id", "size_bytes"]
    sizes = sizes.sort_values(
        ["size_bytes", "file_id"], ascending=[False, True]
    ).reset_index(drop=True)
    target = int(sizes["size_bytes"].sum()) // _COMPACT_BINS + 1
    sizes["bin_id"] = (sizes["size_bytes"].cumsum() - 1) // target
    expect = (
        sizes.groupby("bin_id")["size_bytes"].agg(["count", "sum"]).reset_index()
    )
    got = sorted((r.bin_id, r.n_files, r.bin_bytes) for r in rows)
    ref = sorted(
        (int(b), int(c), int(s))
        for b, c, s in zip(expect["bin_id"], expect["count"], expect["sum"])
    )
    assert got == ref


# --- snapshot diff -------------------------------------------------------------


def test_snapshot_diff_counts_match_pandas_replay(spark, sf_dir, catalog):
    rows = {r.change_type: r for r in catalog["rel_snapshot_diff"].fn(spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c1 = o["o_orderkey"].map(
        lambda k: hashlib.md5(str(k).encode()).hexdigest()[0]
    )
    n_removed = int((c1 == "0").sum())
    n_changed = int((c1 == "f").sum())
    n_added = int((c1 == "a").sum())
    n_unchanged = len(o) - n_removed - n_changed
    assert rows["removed"].n_rows == n_removed
    assert rows["changed"].n_rows == n_changed
    assert rows["added"].n_rows == n_added
    assert rows["unchanged"].n_rows == n_unchanged
    # the xor checksum actually identifies the key sets, not just counts
    def xor60(keys):
        acc = 0
        for k in keys:
            acc ^= int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        return acc

    assert rows["removed"].key_xor60 == xor60(o["o_orderkey"][c1 == "0"])
    assert rows["added"].key_xor60 == xor60(o["o_orderkey"][c1 == "a"] + (1 << 40))


# --- hashed-feature quality classifier ------------------------------------------


def test_quality_classifier_score_replays_in_python(spark, sf_dir, catalog):
    """Recompute one source's aggregate score from raw text with plain
    Python md5 — pins feature construction (unigrams + bigrams), bucket
    hashing, and the weight derivation end to end."""
    from knowledgebot_spark.queries_llm import _QC_BUCKETS

    rows = {r.source: r for r in catalog["llm_quality_classifier"].fn(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    src = sorted(d["source"].unique())[0]

    def weight(feat: str) -> int:
        bucket = int(hashlib.md5(feat.encode()).hexdigest()[:3], 16) % _QC_BUCKETS
        return int(hashlib.md5(f"w{bucket}".encode()).hexdigest()[:4], 16) % 2001 - 1000

    n_docs = n_keep = total = 0
    for text in d[d["source"] == src]["text"]:
        tk = text.lower().split(" ")
        feats = tk + [f"{a}_{b}" for a, b in zip(tk, tk[1:])]
        score = sum(weight(f) for f in feats)
        n_docs += 1
        n_keep += score >= 0
        total += score
    r = rows[src]
    assert (r.n_docs, r.n_keep, r.sum_score_e3) == (n_docs, n_keep, total)


# --- leakage-safe split ----------------------------------------------------------


def test_leakage_safe_split_group_atomicity(spark, sf_dir, catalog):
    rows = catalog["llm_leakage_safe_split"].fn(spark, sf_dir).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # the in-band proof: no group straddles two splits
    assert all(r.max_splits_per_group == 1 for r in rows)
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == len(d)
    # exact-dup twins (same normalized 8-word prefix) land in ONE split:
    # replay the grouping in pandas and check each group's docs share a split
    keys = d["text"].map(
        lambda t: hashlib.md5(
            " ".join(t.lower().split(" ")[:8]).encode()
        ).hexdigest()
    )
    n_groups = keys.nunique()
    assert sum(r.n_groups for r in rows) == n_groups


# --- JL random projection ---------------------------------------------------------


def test_random_projection_matches_numpy_and_preserves_energy(spark, sf_dir, catalog):
    from knowledgebot_spark.queries_llm import _GRAM_D, _RP_K

    rows = catalog["llm_random_projection"].fn(spark, sf_dir).collect()
    assert [r.k for r in rows] == list(range(1, _RP_K + 1))
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(e["embedding"].to_numpy()).astype("float64")
    Q = np.floor(X * 10000 + 0.5).astype("int64")
    S = np.empty((_GRAM_D, _RP_K), dtype="int64")
    for i in range(1, _GRAM_D + 1):
        for k in range(1, _RP_K + 1):
            S[i - 1, k - 1] = (
                1 if hashlib.md5(f"rp{i}_{k}".encode()).hexdigest()[0] < "8" else -1
            )
    Y = Q @ S
    tot_x2 = int((Q * Q).sum())
    for r in rows:
        assert r.sum_y_e4 == int(Y[:, r.k - 1].sum())
        assert r.sum_y2_e8 == int((Y[:, r.k - 1] ** 2).sum())
        assert r.ratio_e4 == r.sum_y2_e8 * 10000 // tot_x2
        # JL concentration: each dim's energy within 3x of the input energy
        # (loose by design — it's a health check, not a tolerance test)
        assert 0 < r.ratio_e4 < 30000


def test_random_projection_partition_invariant(spark, sf_dir, catalog):
    """Partial sums merge by addition: a hostile repartition must not
    change a single output integer."""
    from knowledgebot_spark.queries_llm import llm_random_projection

    base = {
        (r.k, r.sum_y_e4, r.sum_y2_e8, r.ratio_e4)
        for r in llm_random_projection(spark, sf_dir).collect()
    }

    import knowledgebot_spark.tables as tables

    orig = tables.read_table

    def spread(spark_, sf_, name):
        df = orig(spark_, sf_, name)
        return df.repartition(13) if name == "embeddings" else df

    try:
        tables.read_table = spread
        # queries_llm imported read_table by name — patch both references
        import knowledgebot_spark.queries_llm as qllm

        qorig = qllm._t
        qllm._t = spread
        redo = {
            (r.k, r.sum_y_e4, r.sum_y2_e8, r.ratio_e4)
            for r in llm_random_projection(spark, sf_dir).collect()
        }
    finally:
        tables.read_table = orig
        qllm._t = qorig
    assert redo == base


# --- wave 2: dynamic partition pruning -------------------------------------------


def test_dpp_join_plans_dynamic_pruning_and_matches_flat(spark, sf_dir, catalog):
    """The staged year-partitioned fact must carry a runtime pruning
    subquery (dynamicpruning#N in the executed plan) — the join-driven
    partition elimination the query exists to prove — and its values
    must equal the flat filtered aggregate."""
    df = catalog["rel_dpp_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    rows = {r.order_year: (r.n_orders, r.revenue_e2) for r in df.collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o["o_orderdate"].dt.year >= 1996]
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    expect = {
        str(y): (int((o["o_orderdate"].dt.year == y).sum()),
                 int(cents[o["o_orderdate"].dt.year == y].sum()))
        for y in sorted(o["o_orderdate"].dt.year.unique())
    }
    assert rows == expect


# --- wave 2: sketch join-cardinality ----------------------------------------------


def test_join_cardinality_sketch_bounds(spark, sf_dir, catalog):
    r = catalog["rel_join_cardinality_sketch"].fn(spark, sf_dir).collect()[0]
    l = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    exact = int((l.groupby("l_partkey").size() ** 2).sum())
    assert r.exact_pairs == exact
    # CM inner product NEVER underestimates (collisions only add mass)
    assert r.est_ge_exact and r.est_pairs >= exact
    assert r.over_ratio_e4 == r.est_pairs * 10000 // exact
    # and with d=4 rows x w=512 cells the overestimate stays useful
    # (loose engineering bound; at sf0.001 keys/cell is tiny)
    assert r.est_pairs <= exact * 10


def test_join_cardinality_sketch_replays_in_python(spark, sf_dir, catalog):
    from knowledgebot_spark.queries_relational import _AMS_D, _AMS_W

    r = catalog["rel_join_cardinality_sketch"].fn(spark, sf_dir).collect()[0]
    l = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    best = None
    for j in range(1, _AMS_D + 1):
        cells = {}
        for k in l["l_partkey"]:
            c = int(hashlib.md5(f"cm{j}_{k}".encode()).hexdigest()[:4], 16) % _AMS_W
            cells[c] = cells.get(c, 0) + 1
        e = sum(v * v for v in cells.values())
        best = e if best is None or e < best else best
    assert r.est_pairs == best


# --- wave 2: Kneser-Ney scoring ----------------------------------------------------


def test_kneser_ney_differs_from_add1_but_same_contract(spark, sf_dir, catalog):
    """KN and add-1 score the same held-out documents under the same
    vocabulary; the rankings overlap heavily (both find the same junk)
    but the scores must NOT be identical — otherwise the discounting/
    continuation machinery isn't actually engaged."""
    kn = catalog["llm_kneser_ney_lm"].fn(spark, sf_dir).collect()
    add1 = catalog["llm_lm_perplexity"].fn(spark, sf_dir).collect()
    assert len(kn) == len(add1) > 0
    kn_scores = {r.doc_id: r.nll for r in kn}
    a1_scores = {r.doc_id: r.nll for r in add1}
    shared = set(kn_scores) & set(a1_scores)
    assert shared, "the two models should flag overlapping documents"
    assert any(kn_scores[d] != a1_scores[d] for d in shared)
    # every nll is positive and finite (the continuation add-1 floor works)
    assert all(np.isfinite(r.nll) and r.nll > 0 for r in kn)


def test_alternating_star_empty_and_selfloop_edges(spark):
    """Degenerate inputs: an empty edge list converges immediately to an
    empty labeling; self-loops are canonicalized away."""
    from knowledgebot_spark.operators.dedup import alternating_star_components

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert alternating_star_components(empty).count() == 0
    loops = spark.createDataFrame([(7, 7), (9, 9), (3, 4)], "id_a long, id_b long")
    out = sorted(tuple(r) for r in alternating_star_components(loops).collect())
    assert out == [(3, 3), (4, 3)]


def test_random_projection_zero_energy_corpus_does_not_abort(spark, tmp_path):
    """An embeddings table whose every vector quantizes to zero at e4
    must report ratio_e4 = 0, not abort on ANSI divide-by-zero (the class
    of latent abort the degenerate suite exists for — the shared fixture
    masks this one because it also holds full-energy vectors)."""
    from knowledgebot_spark.queries_llm import llm_random_projection

    d = str(tmp_path / "zero")
    import os

    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(0, [0.0] * 64, 1), (1, [1e-30] * 64, 2), (2, [4.9e-5] * 64, 3)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{d}/embeddings.parquet")
    rows = llm_random_projection(spark, d).collect()
    assert len(rows) == 16
    assert all((r.sum_y_e4, r.sum_y2_e8, r.ratio_e4) == (0, 0, 0) for r in rows)


# --- wave 3: schema evolution -------------------------------------------------------


def test_schema_evolution_null_backfill_and_column_isolation(spark, sf_dir, catalog):
    rows = {r.file_gen: r for r in catalog["rel_schema_evolution"].fn(spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    y = o["o_orderdate"].dt.year
    cents = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    assert rows["v1"].n_rows == int((y < 1996).sum())
    assert rows["v2"].n_rows == int((y >= 1996).sum())
    # the new column exists ONLY on v2 rows; v1 reads it back as NULL
    assert rows["v1"].n_with_new_col == 0
    assert rows["v2"].n_with_new_col == rows["v2"].n_rows
    assert rows["v1"].rank_sum == -rows["v1"].n_rows  # all coalesced to -1
    assert rows["v2"].rank_sum == int((o.loc[y >= 1996, "o_orderkey"] % 5).sum())
    # original columns aggregate identically across generations
    assert rows["v1"].cents_sum == int(cents[y < 1996].sum())
    assert rows["v2"].cents_sum == int(cents[y >= 1996].sum())


def test_alternating_star_hub_graph(spark):
    """A 2,000-leaf star stresses the hub-neighborhood path: the operator
    is built from keyed min-aggregates + joins precisely so a hub's
    neighborhood never has to materialize in one task (no collect_set);
    the star must converge immediately with the hub as root."""
    from knowledgebot_spark.operators.dedup import alternating_star_components

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 2001)], "id_a long, id_b long"
    )
    out = alternating_star_components(edges).collect()
    assert len(out) == 2001
    assert all(r.label == 0 for r in out)
