"""Independent Python recomputation oracles for wave 4-8 ops — a third
engine (pure Python, no Spark, no DuckDB) recomputes each result from the
raw parquet, so a shared misunderstanding between the Spark plan and its
SQL oracle cannot hide (the test_events_analytics recomputation pattern)."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def _docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    return t.to_pylist()


def test_bpe_counts_match_python(spark, sf_dir):
    from knowledgebot_spark.queries_llm import llm_bpe_merge_candidates

    freq: dict[str, int] = {}
    for row in _docs():
        for w in row["text"].lower().split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    pairs: dict[str, int] = {}
    for w, f in freq.items():
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            pairs[p] = pairs.get(p, 0) + f
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.pair, r.n)
        for r in sorted(
            llm_bpe_merge_candidates(spark, sf_dir).collect(),
            key=lambda r: (-r.n, r.pair),
        )
    ]
    assert got == want


def test_sorted_neighborhood_matches_python(spark, sf_dir):
    from knowledgebot_spark.queries_llm import (
        _SNM_JACCARD,
        _SNM_W,
        llm_dedup_sorted_neighborhood,
    )

    recs = []
    for row in _docs():
        toks = row["text"].lower().split(" ")
        recs.append(
            {
                "doc_id": row["doc_id"],
                "toks": set(toks),
                "skey": " ".join(toks[:3]),
                "blk": toks[0] if toks else "",
            }
        )
    by_blk: dict[str, list[dict]] = {}
    for r in recs:
        by_blk.setdefault(r["blk"], []).append(r)
    want = set()
    for blk in by_blk.values():
        blk.sort(key=lambda r: (r["skey"], r["doc_id"]))
        for i, cur in enumerate(blk):
            for j in range(max(0, i - _SNM_W), i):
                prev = blk[j]
                inter = len(cur["toks"] & prev["toks"])
                union = len(cur["toks"] | prev["toks"])
                jac = inter / union
                if round(jac, 4) >= _SNM_JACCARD:
                    want.add(
                        (
                            min(cur["doc_id"], prev["doc_id"]),
                            max(cur["doc_id"], prev["doc_id"]),
                        )
                    )
    got = {
        (r.id_a, r.id_b)
        for r in llm_dedup_sorted_neighborhood(spark, sf_dir).collect()
    }
    assert got == want


def test_pareto_matches_python(spark, sf_dir):
    from knowledgebot_spark.queries_relational import rel_pareto_share

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).to_pylist()
    rev: dict[int, int] = {}
    for r in li:
        e4 = math.floor(r["l_extendedprice"] * (1 - r["l_discount"]) * 10000 + 0.5)
        rev[r["l_partkey"]] = rev.get(r["l_partkey"], 0) + e4
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(rev.values())
    want = {}
    cum = 0
    for rank, (pk, e4) in enumerate(ranked, start=1):
        if cum * 10 < total * 8:
            want[pk] = (rank, e4)
        cum += e4
    got = {
        r.l_partkey: (r.rank, r.rev_e4)
        for r in rel_pareto_share(spark, sf_dir).collect()
    }
    assert got == want


def test_weighted_sample_matches_python(spark, sf_dir):
    from knowledgebot_spark.queries_llm import _WS_K, llm_weighted_sample

    keyed = []
    for row in _docs():
        h = int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        w = max(float(row["n_chars"]), 1.0)
        keyed.append((round(u ** (1.0 / w), 6), row["doc_id"]))
    keyed.sort(key=lambda kv: (-kv[0], kv[1]))
    want = {doc_id for _, doc_id in keyed[:_WS_K]}
    got = {r.doc_id for r in llm_weighted_sample(spark, sf_dir).collect()}
    assert got == want


def test_kmeans_matches_python(spark, sf_dir):
    """Full two-iteration Lloyd recompute in pure Python integer/double
    math — same quantization, same tie-breaks, same fold order."""
    from knowledgebot_spark.queries_llm import (
        _KM_K,
        _KM_SCALE,
        llm_kmeans_embeddings,
    )

    vecs = {
        r["vec_id"]: [
            math.floor(float(x) * _KM_SCALE + 0.5) for x in r["embedding"]
        ]
        for r in pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    }

    def assign(qv, cents):
        best = None
        for cid, c in sorted(cents.items()):
            d = 0.0
            for x, y in zip(qv, c):
                t = (x - y) * (x - y)
                d += t
            if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                best = (d, cid)
        return best

    cents0 = {vid: vecs[vid] for vid in range(_KM_K)}
    a1: dict[int, int] = {vid: assign(qv, cents0)[1] for vid, qv in vecs.items()}
    sums: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for vid, cid in a1.items():
        counts[cid] = counts.get(cid, 0) + 1
        s = sums.setdefault(cid, [0] * len(vecs[vid]))
        for i, x in enumerate(vecs[vid]):
            s[i] += x
    cents1 = {
        cid: [s[i] / counts[cid] for i in range(len(s))] for cid, s in sums.items()
    }
    want: dict[int, list] = {}
    for vid, qv in vecs.items():
        d, cid = assign(qv, cents1)
        di = math.floor(d + 0.5)
        want.setdefault(cid, [0, 0])
        want[cid][0] += 1
        want[cid][1] += di
    got = {
        r.cluster_id: [r.n_members, r.inertia_q]
        for r in llm_kmeans_embeddings(spark, sf_dir).collect()
    }
    assert got == want


def test_kcenter_matches_python(spark, sf_dir):
    """Exact FPS recompute: all-integer distances make the greedy
    trajectory bit-reproducible in any engine."""
    from knowledgebot_spark.queries_llm import _KC_K, llm_coreset_kcenter

    vecs = {
        r["vec_id"]: [math.floor(float(x) * 1000 + 0.5) for x in r["embedding"]]
        for r in pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pylist()
    }
    sel = [0]
    want = [(1, 0, 0)]
    for rank in range(2, _KC_K + 1):
        best = None
        for vid, qv in vecs.items():
            if vid in sel:
                continue
            dmin = min(
                sum((x - y) * (x - y) for x, y in zip(qv, vecs[s])) for s in sel
            )
            if best is None or dmin > best[0] or (dmin == best[0] and vid < best[1]):
                best = (dmin, vid)
        sel.append(best[1])
        want.append((rank, best[1], best[0]))
    got = sorted(
        (r.rank, r.vec_id, r.dmin)
        for r in llm_coreset_kcenter(spark, sf_dir).collect()
    )
    assert got == sorted(want)
