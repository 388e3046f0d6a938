"""Corpus-curation query semantics on a planted fixture: contamination is
detected, PII is scrubbed, repetition is scored, boilerplate is found, the
eval source is excluded from the mixture, and near-dup cliques resolve to
one cluster."""

from __future__ import annotations

import hashlib

import pytest

from knowledgebot_spark import queries_corpus as qc

_NEAR_BASE = " ".join(f"tok{i}" for i in range(60))

# (doc_id, text, source)
_DOCS = [
    # bench doc (held-out eval source) and one training doc copying a 5-gram
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "src19"),
    (2, "alpha beta gamma delta epsilon something else entirely here now", "src0"),
    (3, "totally different words nothing shared at all okay fine sure", "src1"),
    # degenerate repetition
    (4, "loop loop loop loop loop loop loop loop loop loop", "src2"),
    # PII: email + phone + denylist term
    (5, "contact me at bob@example.com or +1 555-123-4567 key stuff", "src3"),
    # near-dup clique (each pair differs by one token out of 60)
    (6, _NEAR_BASE, "src4"),
    (7, _NEAR_BASE.replace("tok59", "changed"), "src4"),
    (8, _NEAR_BASE.replace("tok0", "altered"), "src4"),
    # boilerplate: same 3-gram header across 6 docs, unique tails
    *[
        (9 + i, f"standard header block unique{i} content{i} words{i}", "src5")
        for i in range(6)
    ],
    # shorter than the decontamination n-gram width
    (15, "tiny doc", "src6"),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("corpus")
    rows = [(i, t, "en", s, len(t)) for i, t, s in _DOCS]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(f"{path}/documents.parquet")
    return str(path)


def test_decontaminate_flags_planted_overlap(spark, corpus_dir):
    out = {r.doc_id: r for r in qc.llm_decontaminate(spark, corpus_dir).collect()}
    assert 1 not in out                       # bench docs are not scored
    assert len(out) == len(_DOCS) - 1         # every training doc has a row
    assert out[2].contaminated and out[2].n_hits == 1   # the copied 5-gram
    assert not out[3].contaminated and out[3].n_hits == 0
    assert out[15].n_grams == 1               # sub-width doc still scored
    for r in out.values():
        assert 0 <= r.hit_frac <= 1
        assert r.contaminated == (r.n_hits > 0)


def test_pii_scrub_counts_and_bytes(spark, corpus_dir):
    out = {r.doc_id: r for r in qc.llm_pii_scrub(spark, corpus_dir).collect()}
    pii = out[5]
    assert pii.n_email == 1 and pii.n_phone >= 1 and pii.n_term == 1
    clean_doc = out[3]
    text3 = next(t for i, t, _ in _DOCS if i == 3)
    assert clean_doc.n_email == clean_doc.n_phone == clean_doc.n_term == 0
    # untouched docs round-trip byte-identically
    assert clean_doc.clean_md5 == hashlib.md5(text3.lower().encode()).hexdigest()
    assert pii.clean_md5 != hashlib.md5(
        next(t for i, t, _ in _DOCS if i == 5).lower().encode()
    ).hexdigest()


def test_repetition_scores_degenerate_doc(spark, corpus_dir):
    out = {r.doc_id: r for r in qc.llm_repetition(spark, corpus_dir).collect()}
    assert out[4].n_unique_grams == 1          # all 3-grams are "loop loop loop"
    assert out[4].rep_ratio > 0.8
    assert out[4].top_tok_frac == 1.0
    assert out[3].rep_ratio == 0.0             # no repeated gram
    assert out[3].top_tok_frac < 0.2


def test_boilerplate_finds_shared_header(spark, corpus_dir):
    rows = qc.llm_boilerplate_ngrams(spark, corpus_dir).collect()
    got = {r.gram: r.doc_freq for r in rows}
    assert got == {"standard header block": 6}  # only gram in >= 5 docs
    assert rows[0].df_frac == round(6 / len(_DOCS), 4)


def test_domain_mix_excludes_eval_source(spark, corpus_dir):
    rows = qc.llm_domain_mix(spark, corpus_dir).collect()
    by_src = {r.source: r for r in rows}
    assert by_src["src19"].rate_permille == 0
    assert by_src["src19"].n_kept == 0
    for r in rows:
        assert 0 <= r.n_kept <= r.n_total


def test_shard_assign_partitions_everything(spark, corpus_dir):
    rows = qc.llm_shard_assign(spark, corpus_dir).collect()
    assert sum(r.n_docs for r in rows) == len(_DOCS)
    assert all(0 <= r.shard < qc.N_SHARDS for r in rows)


def test_dedup_clusters_resolve_planted_clique(spark, corpus_dir):
    rows = qc.llm_dedup_clusters(spark, corpus_dir).collect()
    got = {r.doc_id: (r.cluster_id, r.cluster_size) for r in rows}
    # exactly the planted clique, one cluster, keeper = min doc_id
    assert got == {6: (6, 3), 7: (6, 3), 8: (6, 3)}
