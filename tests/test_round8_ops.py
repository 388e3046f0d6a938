"""Round-8 hardening: staging retry idempotency (the crash-between-write-
and-marker class of bug VERDICT r07 found in rel_schema_evolution), and
degenerate-input coverage for the round-7 operators the shared fixtures
don't stress."""

from __future__ import annotations

import os
import re
import shutil

import pandas as pd


# --- staging retry idempotency ------------------------------------------------


def test_schema_evolution_retry_from_half_staged_dir(spark, sf_dir, tmp_path):
    """Simulate the exact crash window VERDICT r07 flagged: both generation
    writes landed but the process died before the _STAGED touch.  The
    retry re-runs the whole staging block; with overwrite semantics it
    reconverges to the same layout (a mode("append") on gen=v2 would
    permanently double its rows and flip every v2 aggregate)."""
    from knowledgebot_spark.queries_relational import rel_schema_evolution

    d = str(tmp_path / "retrysf")
    os.makedirs(d)
    os.symlink(
        os.path.join(sf_dir, "orders.parquet"), os.path.join(d, "orders.parquet")
    )
    base = "/tmp/knowledgebot_spark/fmt/retrysf/orders_two_gen"
    shutil.rmtree(base, ignore_errors=True)

    first = {r.file_gen: r for r in rel_schema_evolution(spark, d).collect()}
    assert os.path.exists(os.path.join(base, "_STAGED"))

    # crash window: data written, marker lost -> next run must re-stage
    os.remove(os.path.join(base, "_STAGED"))
    retried = {r.file_gen: r for r in rel_schema_evolution(spark, d).collect()}

    assert set(retried) == {"v1", "v2"}
    for gen in ("v1", "v2"):
        assert retried[gen].n_rows == first[gen].n_rows
        assert retried[gen].n_with_new_col == first[gen].n_with_new_col
        assert retried[gen].rank_sum == first[gen].rank_sum
        assert retried[gen].cents_sum == first[gen].cents_sum
    # and the values are right, not merely stable: pandas ground truth
    o = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    y = o["o_orderdate"].dt.year
    assert retried["v2"].n_rows == int((y >= 1996).sum())
    assert retried["v2"].rank_sum == int((o.loc[y >= 1996, "o_orderkey"] % 5).sum())
    shutil.rmtree(base, ignore_errors=True)


def test_partition_pruning_stage_retry_reconverges(spark, sf_dir, tmp_path):
    """Same crash class for the shared year-partitioned layout: kill the
    _SUCCESS marker after a complete stage and re-run; overwrite staging
    must reproduce identical partition contents (no doubled years)."""
    from knowledgebot_spark.queries_relational import _stage_orders_by_year

    d = str(tmp_path / "prunesf")
    os.makedirs(d)
    os.symlink(
        os.path.join(sf_dir, "orders.parquet"), os.path.join(d, "orders.parquet")
    )
    stage_base = "/tmp/knowledgebot_spark/fmt/prunesf/orders_by_year"
    shutil.rmtree(stage_base, ignore_errors=True)

    base = _stage_orders_by_year(spark, d)
    first = spark.read.parquet(base).groupBy("order_year").count()
    first_rows = {r.order_year: r["count"] for r in first.collect()}

    os.remove(os.path.join(base, "_SUCCESS"))
    base2 = _stage_orders_by_year(spark, d)
    again = spark.read.parquet(base2).groupBy("order_year").count()
    assert {r.order_year: r["count"] for r in again.collect()} == first_rows
    shutil.rmtree(stage_base, ignore_errors=True)


# --- degenerate inputs for round-7 operators ----------------------------------


def test_alternating_star_empty_and_self_loop_edges(spark):
    """Empty edge lists and pure self-loops are both zero-information
    inputs: the operator must return an empty frame, not iterate or
    throw — the checksum fixpoint is immediate on an empty canonical
    set."""
    from knowledgebot_spark.operators.dedup import alternating_star_components

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert alternating_star_components(empty).count() == 0
    loops = spark.createDataFrame([(7, 7), (9, 9)], "id_a long, id_b long")
    assert alternating_star_components(loops).count() == 0


def test_alternating_star_duplicate_and_reversed_edges(spark):
    """The same undirected edge arriving in both orientations and
    multiplicities must not change the labeling (canonicalization +
    distinct happen before round 1)."""
    from knowledgebot_spark.operators.dedup import alternating_star_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2), (10, 11)],
        "id_a long, id_b long",
    )
    labels = {r.node: r.label for r in alternating_star_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def _write_documents(path: str, rows: list[tuple[int, str]]) -> None:
    """Minimal documents table in the driver testdata schema
    (doc_id, text, lang, source, n_chars)."""
    os.makedirs(path, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "text": pd.Series([r[1] for r in rows], dtype="object"),
            "lang": ["en"] * len(rows),
            "source": ["wiki"] * len(rows),
            "n_chars": pd.Series([len(r[1]) for r in rows], dtype="int64"),
        }
    ).to_parquet(os.path.join(path, "documents.parquet"))


def test_leakage_safe_split_empty_documents(spark, tmp_path):
    """Zero input documents: the split report must be empty (no
    divide-by-zero in the share computation, no phantom splits)."""
    from knowledgebot_spark.queries_llm import llm_leakage_safe_split

    d = str(tmp_path / "nodocs")
    _write_documents(d, [])
    assert llm_leakage_safe_split(spark, d).count() == 0


def test_kneser_ney_single_token_docs_yield_empty(spark, tmp_path):
    """Documents with a single token contribute zero bigrams on either
    side of the split: the model must return an empty scoring frame
    (nothing to score), not NaN or a crash."""
    from knowledgebot_spark.queries_llm import llm_kneser_ney_lm

    d = str(tmp_path / "onetok")
    # md5-prefix split: ids 1,2,4 train; 0,3,5 held — all single-token
    _write_documents(
        d, [(0, "alpha"), (1, "beta"), (2, "alpha"), (3, "gamma"),
            (4, "beta"), (5, "alpha")]
    )
    assert llm_kneser_ney_lm(spark, d).count() == 0


def test_kneser_ney_empty_train_stream_scores_finite(spark, tmp_path):
    """Held-out bigrams with an EMPTY training stream must score through
    the continuation-probability add-1 floor — finite, non-null — the
    regime textbook KN leaves undefined and the docstring documents as
    a deliberate deviation."""
    from knowledgebot_spark.queries_llm import llm_kneser_ney_lm

    d = str(tmp_path / "notrain")
    # ids 1,2,4 are train (single-token -> zero train bigrams);
    # ids 0,3 are held-out WITH bigrams
    _write_documents(
        d, [(0, "alpha beta gamma"), (1, "beta"), (2, "alpha"),
            (3, "gamma delta"), (4, "beta")]
    )
    rows = llm_kneser_ney_lm(spark, d).collect()
    assert {r.doc_id for r in rows} == {0, 3}
    import math

    for r in rows:
        assert r.nll is not None and math.isfinite(r.nll)


# --- round-8 pipeline analytics ----------------------------------------------


def test_mention_graph_known_endpoints_and_reciprocity(spark, sf_dir):
    """Every edge endpoint resolves to a KNOWN user (the inner dim joins
    drop unknown U9xxxx ids and NULL authors), weights are positive, and
    the reciprocal flag is exactly 'the reversed pair exists'."""
    from knowledgebot_spark.queries_pipeline import kb_mention_graph

    rows = kb_mention_graph(spark, sf_dir).collect()
    assert rows, "model guarantees mention edges"
    pairs = {(r.src, r.dst) for r in rows}
    for r in rows:
        assert r.weight >= 1
        assert r.reciprocal == ((r.dst, r.src) in pairs)
        # resolved names, never raw ids — check BOTH endpoints against the
        # raw-id shape itself (U followed by digits), not one prefix each
        assert re.match(r"U\d{6}", r.src) is None
        assert re.match(r"U\d{6}", r.dst) is None


def test_thread_latency_matches_model_arithmetic(spark, sf_dir):
    """Replies are doc_id%5==4 answering doc_id-5 in the same channel, so
    every lag is exactly 5*137 s plus the fractional-micros delta — a
    pure-python replay over the documents table must reproduce the
    grouped aggregates bit-for-bit."""
    import collections

    from knowledgebot_spark.queries_pipeline import kb_thread_latency

    n_docs = len(pd.read_parquet(os.path.join(sf_dir, "documents.parquet")))
    per_day = collections.defaultdict(list)
    for d in range(n_docs):
        if d % 5 == 4 and d > 4:
            p = d - 5
            ts = lambda x: (1700000000 + x * 137) * 1_000_000 + x % 7
            import datetime

            day = datetime.datetime.fromtimestamp(
                (1700000000 + p * 137), datetime.timezone.utc
            ).strftime("%Y%m%d")
            per_day[day].append(ts(d) - ts(p))
    rows = {r.parent_date: r for r in kb_thread_latency(spark, sf_dir).collect()}
    assert set(rows) == set(per_day)
    for day, lags in per_day.items():
        r = rows[day]
        assert r.n_replies == len(lags)
        assert r.min_micros == min(lags)
        assert r.max_micros == max(lags)
        assert r.avg_micros_half_up == (2 * sum(lags) + len(lags)) // (2 * len(lags))


def test_channel_mention_overlap_bounds_and_symmetric_inputs(spark, sf_dir):
    """Jaccard stays in [0, 10000], pairs are canonically ordered, and
    n_shared <= min(n_a, n_b) — the set-algebra invariants the fixed-point
    formula depends on."""
    from knowledgebot_spark.queries_pipeline import kb_channel_mention_overlap

    rows = kb_channel_mention_overlap(spark, sf_dir).collect()
    assert rows, "the 90000+d%53 mention series guarantees cross-channel overlap"
    for r in rows:
        assert r.ch_a < r.ch_b
        assert 0 <= r.n_shared <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard_e4 <= 10000
        assert r.jaccard_e4 == r.n_shared * 10000 // (r.n_a + r.n_b - r.n_shared)


# --- degenerate fact-table inputs for the layout/reconciliation family --------
#
# The shared degenerate fixture (test_degenerate_inputs.py) only builds
# events/documents/embeddings; the round-6/7 layout, reconciliation, and
# staging queries read orders/lineitem and had no legal-but-extreme
# coverage: single-year date spans (zero-match pruning filters, one
# staged partition, an EMPTY generation for schema evolution),
# zero/negative money, and fully-degenerate z-order key ranges (every
# key identical -> quantization bounds collapse).  Execute-only, the
# same contract as the shared sweep: the plan must run, not abort.

import pytest


_LAYOUT_FAMILY = [
    "rel_compaction_plan",
    "rel_snapshot_diff",
    "rel_table_fingerprint",
    "rel_schema_evolution",
    "rel_dpp_join",
    "rel_partition_pruning",
    "rel_zorder_skipping",
    "rel_bloom_join_prune",
    "rel_incremental_view_refresh",
    "rel_join_cardinality_sketch",
    # round-8 pipeline analytics on a dim-starved, mention-free corpus
    "kb_mention_graph",
    "kb_thread_latency",
    "kb_channel_mention_overlap",
]


@pytest.fixture(scope="module")
def hostile_fact_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostilefact"))
    o = pd.read_parquet(os.path.join(sf_dir, "orders.parquet")).head(7).copy()
    # single-year span: the 1995/1996 pruning windows match NOTHING, the
    # year-partitioned stage has exactly one partition, and schema
    # evolution's gen=v2 (>=1996) is EMPTY
    o["o_orderdate"] = pd.Timestamp("1993-03-01")
    o["o_totalprice"] = [0.0, -12.5, 12.5, 0.01, -0.01, 99.99, 0.0]
    o.to_parquet(os.path.join(d, "orders.parquet"))
    li = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet")).head(10).copy()
    # every z-order key identical -> pmax == smax == k, quantization
    # collapses to one cell; zero/negative money through the e2 paths
    li["l_partkey"] = 17
    li["l_suppkey"] = 3
    li["l_quantity"] = 0.0
    li["l_extendedprice"] = [0.0, -1.0] + [float(i) for i in range(8)]
    li.to_parquet(os.path.join(d, "lineitem.parquet"))
    for t in ("region", "nation"):
        pd.read_parquet(os.path.join(sf_dir, f"{t}.parquet")).to_parquet(
            os.path.join(d, f"{t}.parquet")
        )
    # dim-starved users: 3 customers -> almost every mention/author
    # unresolvable, the mention graph may legitimately be empty
    pd.read_parquet(os.path.join(sf_dir, "customer.parquet")).head(3).to_parquet(
        os.path.join(d, "customer.parquet")
    )
    # mention-free, thread-free corpus: 6 docs (no doc_id%5==4 reply
    # beyond doc 4's guard), empty/whitespace texts
    pd.DataFrame(
        {
            "doc_id": pd.Series(range(6), dtype="int64"),
            "text": ["", "   ", "a", "plain words here", "x y", "zz " * 30],
            "lang": ["en"] * 6,
            "source": ["wiki"] * 6,
            "n_chars": pd.Series([0, 3, 1, 16, 3, 90], dtype="int64"),
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.parametrize("name", _LAYOUT_FAMILY)
def test_layout_family_survives_hostile_facts(spark, hostile_fact_dir, name):
    from knowledgebot_spark.registry import load

    fn = load()[name].fn
    fn(spark, hostile_fact_dir).write.format("noop").mode("overwrite").save()


# --- randomized cross-check: alternating-star vs pure-python union-find -------


def test_alternating_star_matches_union_find_on_random_graphs(spark):
    """Deterministic pseudo-random edge lists (md5-derived, no RNG state)
    across several densities, each checked against a pure-python
    union-find: same components, same min-id labels.  This is the net
    the shaped tests (chain, star, clique) can't provide — arbitrary
    topology, including isolated pairs, bridges, and multi-hub merges."""
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    from knowledgebot_spark.operators.dedup import alternating_star_components

    for trial, (n_nodes, n_edges) in enumerate(
        [(12, 6), (30, 18), (50, 60), (40, 20), (25, 80)]
    ):
        edges = [
            (h(f"t{trial}a{i}") % n_nodes, h(f"t{trial}b{i}") % n_nodes)
            for i in range(n_edges)
        ]
        # union-find ground truth over nodes incident to >= 1 real edge
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for a, b in edges:
            if a == b:
                continue
            touched.update((a, b))
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        want = {}
        comp_min = {}
        for x in touched:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        for x in touched:
            want[x] = comp_min[find(x)]

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.node: r.label for r in alternating_star_components(df).collect()}
        assert got == want, f"trial {trial}: {got} != {want}"


# --- dedup champion: the keep decision ---------------------------------------


def test_dedup_champion_is_cluster_argmax(spark, sf_dir):
    """Champion rows must agree with the cluster labeling: one champion
    per cluster, it is the max-n_chars member (doc_id ASC tie-break),
    cluster_size matches the labeling, and n_dropped = size - 1."""
    from knowledgebot_spark.queries_corpus import (
        llm_cc_alternating_star,
        llm_dedup_champion,
    )

    clusters = llm_cc_alternating_star(spark, sf_dir).collect()
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet")).set_index(
        "doc_id"
    )["n_chars"]
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    champs = {r.cluster_id: r for r in llm_dedup_champion(spark, sf_dir).collect()}
    assert set(champs) == set(by_cluster)
    for cid, members in by_cluster.items():
        want = min(members, key=lambda d: (-int(docs[d]), d))
        r = champs[cid]
        assert r.champion_doc_id == want
        assert r.champion_n_chars == int(docs[want])
        assert r.cluster_size == len(members)
        assert r.n_dropped == len(members) - 1
