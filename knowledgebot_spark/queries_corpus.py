"""Corpus-curation query catalog (north star: the operations a large-scale
LLM training-data pipeline runs between raw crawl and tokenized shards):
benchmark decontamination, PII scrubbing, boilerplate detection, repetition
scoring, domain mixture sampling, shard assignment, and duplicate-cluster
resolution.

Everything is JVM built-ins (no Python UDFs); hash-based decisions use the
md5 primitive shared with operators.dedup so every query is oracle-checkable
in DuckDB.  Beyond-reference scope: the reference bot (KnowledgeBot.py)
curates one Slack workspace; these are the same curation stages at corpus
scale, per BASELINE.json's 100 TB north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgebot_spark.operators import dedup as dd
from knowledgebot_spark.registry import _REGISTRY, register
from knowledgebot_spark.tables import read_spread as _ts
from knowledgebot_spark.tables import read_table as _t

# make sure the minhash query (whose oracle SQL llm_dedup_clusters embeds)
# is registered before we look it up
import knowledgebot_spark.queries_llm  # noqa: E402,F401


def _gram_expr(text_col: str, n: int, distinct: bool = True) -> str:
    """Word-n-gram list of lower(text) as a SQL expression — the
    generalized form of operators.dedup.shingle_expr (fixed n=3).

    The outer ``transform(array(<toks>), tk -> ...)`` binds the token
    array ONCE (the shingle_hash_expr idiom): HOF lambdas evaluate
    interpreted, so an embedded split() re-tokenizes at every gram
    position — O(tokens^2) per document (round-14: 4.3x measured on the
    gram projection at sf0.1); CollapseProject would inline a projected
    column straight back into the lambda."""
    toks = f"split(lower({text_col}), ' ')"
    inner = (
        f"flatten(transform(array({toks}), tk -> "
        f"transform(sequence(1, greatest(size(tk) - {n - 1}, 1)), "
        f"i -> array_join(slice(tk, i, {n}), ' '))))"
    )
    return f"array_distinct({inner})" if distinct else inner


def _duck_grams(n: int, tk: str = "tk") -> str:
    """DuckDB twin of _gram_expr (list slicing is inclusive both ends)."""
    return (
        f"list_distinct([array_to_string({tk}[i:i+{n - 1}], ' ') "
        f"for i in generate_series(1, greatest(len({tk}) - {n - 1}, 1))])"
    )


# engine-portable hash bucket: first 8 hex chars of md5 -> BIGINT < 2^32
def _bucket(col: F.Column, mod: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % mod
    )


def _duck_bucket(col: str, mod: int) -> str:
    return f"(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT % {mod})"


# --- benchmark decontamination ----------------------------------------------

BENCH_SOURCE = "src19"   # held-out eval source; its n-grams are the blocklist
DECON_N = 5              # n-gram width (the common 8-to-13-gram check, scaled
                         # down to the fixture's ~30-word vocabulary)


@register(
    "llm_decontaminate",
    sql=f"""
WITH g AS (
  SELECT doc_id, source, {_duck_grams(DECON_N)} AS gs
  FROM (SELECT doc_id, source, str_split(lower(text), ' ') AS tk FROM documents)
),
bench AS (SELECT DISTINCT unnest(gs) AS gm FROM g WHERE source = '{BENCH_SOURCE}'),
corpus AS (
  SELECT doc_id, unnest(gs) AS gm FROM g WHERE source <> '{BENCH_SOURCE}'
),
hits AS (
  SELECT doc_id, count(*) AS n_hits FROM corpus JOIN bench USING (gm) GROUP BY 1
)
SELECT g.doc_id,
  CAST(len(g.gs) AS BIGINT) AS n_grams,
  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
  round(coalesce(h.n_hits, 0) * 1.0 / greatest(len(g.gs), 1), 4) AS hit_frac,
  coalesce(h.n_hits, 0) > 0 AS contaminated
FROM g LEFT JOIN hits h USING (doc_id)
WHERE g.source <> '{BENCH_SOURCE}'
""",
    tags=("decontamination", "ngram-overlap"),
)
def llm_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    {DECON_N}-gram with the held-out eval source.  The eval side is tiny
    relative to the corpus (an eval set, not a crawl), so its distinct-gram
    blocklist is BROADCAST and the check is a map-side semi-join per
    training gram — no corpus-sized shuffle at 100 TB; the only wide op is
    the per-doc hit count, keyed by doc_id."""
    d = _t(spark, sf, "documents")
    grams = d.select(
        "doc_id", "source", F.expr(_gram_expr("text", DECON_N)).alias("gs")
    )
    bench = (
        grams.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode("gs").alias("gm"))
        .distinct()
    )
    corpus = grams.filter(F.col("source") != BENCH_SOURCE)
    hits = (
        corpus.select("doc_id", F.explode("gs").alias("gm"))
        .join(F.broadcast(bench), "gm")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return (
        corpus.select("doc_id", F.size("gs").cast("bigint").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_hits.cast("bigint").alias("n_hits"),
            F.round(
                n_hits / F.greatest(F.col("n_grams"), F.lit(1)), 4
            ).alias("hit_frac"),
            (n_hits > 0).alias("contaminated"),
        )
    )


# --- PII scrubbing -----------------------------------------------------------

# RE2-safe patterns (no backrefs/lookaround), identical semantics in Java
# regex (Spark) and DuckDB's RE2: email, phone-like digit runs, and a
# configurable denylist term standing in for custom redaction rules.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9() -]{6,}[0-9]"
PII_TERM = r"\bkey\b"


@register(
    "llm_pii_scrub",
    sql=f"""
WITH scrubbed AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '{PII_EMAIL}')) AS n_email,
    len(regexp_extract_all(lower(text), '{PII_PHONE}')) AS n_phone,
    len(regexp_extract_all(lower(text), '{PII_TERM}')) AS n_term,
    regexp_replace(regexp_replace(regexp_replace(lower(text),
      '{PII_EMAIL}', '[EMAIL]', 'g'),
      '{PII_PHONE}', '[PHONE]', 'g'),
      '{PII_TERM}', '[TERM]', 'g') AS clean
  FROM documents
)
SELECT doc_id,
  CAST(n_email AS BIGINT) AS n_email,
  CAST(n_phone AS BIGINT) AS n_phone,
  CAST(n_term AS BIGINT) AS n_term,
  CAST(length(clean) AS BIGINT) AS clean_len,
  md5(clean) AS clean_md5
FROM scrubbed
""",
    tags=("pii", "redaction"),
)
def llm_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrubbing: count and redact email / phone / denylist-term
    matches per document.  Pure per-row regexp built-ins inside whole-stage
    codegen — zero shuffles, embarrassingly parallel at any scale; the
    scrubbed text is verified via md5 so the oracle checks the actual
    redacted bytes, not just the counts."""
    d = _t(spark, sf, "documents")
    low = F.lower(F.col("text"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(low, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ),
        PII_TERM,
        "[TERM]",
    )
    def n(pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(low, F.lit(pat), 0)).cast("bigint")

    return d.select(
        "doc_id",
        n(PII_EMAIL).alias("n_email"),
        n(PII_PHONE).alias("n_phone"),
        n(PII_TERM).alias("n_term"),
        F.length(clean).cast("bigint").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


# --- boilerplate detection ---------------------------------------------------

BOILER_N = 3          # n-gram width
BOILER_MIN_DOCS = 5   # appears in >= this many distinct docs => boilerplate


@register(
    "llm_boilerplate_ngrams",
    sql=f"""
WITH g AS (
  SELECT doc_id, {_duck_grams(BOILER_N)} AS gs
  FROM (SELECT doc_id, str_split(lower(text), ' ') AS tk FROM documents)
),
df AS (
  SELECT gm AS gram, count(*) AS doc_freq
  FROM (SELECT doc_id, unnest(gs) AS gm FROM g) GROUP BY 1
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT gram, CAST(doc_freq AS BIGINT) AS doc_freq,
  round(doc_freq * 1.0 / n_docs, 4) AS df_frac
FROM df, n WHERE doc_freq >= {BOILER_MIN_DOCS}
""",
    tags=("boilerplate", "doc-frequency"),
)
def llm_boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate detection: {BOILER_N}-grams occurring in >=
    {BOILER_MIN_DOCS} distinct documents (headers, footers, license
    blurbs at corpus scale).  Per-doc distinct grams explode into ONE
    hash-aggregation keyed by gram — map-side partial counts make the
    shuffle carry (gram, count) not (gram, doc) pairs; the corpus size
    joins in as a broadcast 1-row aggregate, never a driver action."""
    d = _ts(spark, sf, "documents")
    counts = (
        d.select(F.explode(F.expr(_gram_expr("text", BOILER_N))).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("doc_freq"))
    )
    n = d.agg(F.count("*").alias("n_docs"))
    return (
        counts.filter(F.col("doc_freq") >= BOILER_MIN_DOCS)
        .crossJoin(F.broadcast(n))
        .select(
            "gram",
            F.col("doc_freq").cast("bigint").alias("doc_freq"),
            F.round(F.col("doc_freq") / F.col("n_docs"), 4).alias("df_frac"),
        )
    )


# --- within-document repetition ---------------------------------------------

@register(
    "llm_repetition",
    sql=f"""
WITH t AS (SELECT doc_id, str_split(lower(text), ' ') AS tk FROM documents),
g AS (
  SELECT doc_id,
    [array_to_string(tk[i:i+{BOILER_N - 1}], ' ')
     for i in generate_series(1, greatest(len(tk) - {BOILER_N - 1}, 1))] AS gs
  FROM t
),
tc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY 1, 2
),
tt AS (SELECT doc_id, max(c) AS top_tok_n FROM tc GROUP BY 1),
nt AS (SELECT doc_id, len(tk) AS n_tokens FROM t)
SELECT g.doc_id,
  CAST(len(gs) AS BIGINT) AS n_grams,
  CAST(len(list_distinct(gs)) AS BIGINT) AS n_unique_grams,
  round(1 - len(list_distinct(gs)) * 1.0 / greatest(len(gs), 1), 4) AS rep_ratio,
  round(tt.top_tok_n * 1.0 / greatest(nt.n_tokens, 1), 4) AS top_tok_frac
FROM g JOIN tt USING (doc_id) JOIN nt USING (doc_id)
""",
    tags=("repetition", "quality"),
)
def llm_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition: duplicated-{BOILER_N}-gram ratio plus the
    top single-token frequency — the cheap degenerate-text detectors (looped
    generations, keyword stuffing) a corpus filter runs before perplexity
    scoring.  The gram ratio is per-row array math (no shuffle); the top
    token count is one (doc_id, token) hash-agg then a max keyed by doc_id,
    both map-side-combinable at 100 TB."""
    d = _t(spark, sf, "documents")
    gs = F.expr(_gram_expr("text", BOILER_N, distinct=False))
    n_grams = F.size(gs)
    n_unique = F.size(F.array_distinct(gs))
    per_row = d.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).alias("n_tokens"),
        n_grams.cast("bigint").alias("n_grams"),
        n_unique.cast("bigint").alias("n_unique_grams"),
        F.round(
            F.lit(1) - n_unique / F.greatest(n_grams, F.lit(1)), 4
        ).alias("rep_ratio"),
    )
    top = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_tok_n"))
    )
    return per_row.join(top, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_unique_grams",
        "rep_ratio",
        F.round(
            F.col("top_tok_n") / F.greatest(F.col("n_tokens"), F.lit(1)), 4
        ).alias("top_tok_frac"),
    )


# --- domain mixture sampling -------------------------------------------------

# target keep-rate per source in permille: the eval source is excluded
# entirely; even-numbered sources are majority domains (70%), odd are
# downweighted (40%); unknown sources fall back to 50%.
MIX_RATES = {
    f"src{i}": (0 if i == 19 else 700 if i % 2 == 0 else 400) for i in range(20)
}
MIX_DEFAULT = 500


@register(
    "llm_domain_mix",
    sql=f"""
WITH rated AS (
  SELECT source,
    CASE source {' '.join(f"WHEN '{s}' THEN {r}" for s, r in MIX_RATES.items())}
      ELSE {MIX_DEFAULT} END AS rate_permille,
    {_duck_bucket('doc_id', 1000)} AS bucket
  FROM documents
)
SELECT source, CAST(rate_permille AS BIGINT) AS rate_permille,
  CAST(count(*) AS BIGINT) AS n_total,
  CAST(sum(CASE WHEN bucket < rate_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM rated GROUP BY 1, 2
""",
    tags=("sampling", "domain-mix"),
)
def llm_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Domain mixture sampling: downsample each source toward a target
    mixture with a DETERMINISTIC hash gate (md5 permille of doc_id <
    per-source rate) — stable across runs, engines, and partitionings,
    unlike RNG-seeded sample().  The keep decision is a map-side predicate;
    only the per-source audit counts shuffle.  At 100 TB the same
    expression gates the write path and this query is its audit report."""
    d = _t(spark, sf, "documents")
    rate = F.lit(MIX_DEFAULT)
    for s, r in MIX_RATES.items():
        rate = F.when(F.col("source") == s, r).otherwise(rate)
    bucket = _bucket(F.col("doc_id"), 1000)
    return (
        d.select("source", rate.alias("rate_permille"), bucket.alias("bucket"))
        .groupBy("source", "rate_permille")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(
                F.when(F.col("bucket") < F.col("rate_permille"), 1).otherwise(0)
            ).cast("bigint").alias("n_kept"),
        )
        .select(
            "source",
            F.col("rate_permille").cast("bigint").alias("rate_permille"),
            "n_total",
            "n_kept",
        )
    )


# --- shard assignment --------------------------------------------------------

N_SHARDS = 16


@register(
    "llm_shard_assign",
    sql=f"""
SELECT {_duck_bucket('doc_id', N_SHARDS)} AS shard,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents GROUP BY 1
""",
    tags=("sharding", "output-layout"),
)
def llm_shard_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5-bucket(doc_id)
    % {N_SHARDS}, the content-stable layout for tokenized output files
    (resumable, engine-independent, no RNG).  This query is the balance
    audit — docs/bytes/source-spread per shard; a skewed shard here means a
    skewed training file.  One hash-agg keyed by shard; the real write is
    ``df.repartition(shard).write`` using the same expression."""
    d = _t(spark, sf, "documents")
    return (
        d.select(
            _bucket(F.col("doc_id"), N_SHARDS).alias("shard"), "n_chars", "source"
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )


# --- duplicate-cluster resolution -------------------------------------------

CLUSTER_JACCARD = 0.8
CLUSTER_ITERS = 3  # >= max component diameter; near-dup clusters at
                   # jaccard 0.8 are near-cliques (measured diameter 1 on
                   # the fixtures), so 3 hops is already conservative —
                   # production runs with convergence detection instead of
                   # a fixed count


def _near_dup_edges(spark: SparkSession, sf: str) -> DataFrame:
    """The MinHash-LSH near-dup edge list (Jaccard >= CLUSTER_JACCARD) both
    cluster-resolution queries consume.  Shared on purpose: the two queries
    are pinned to ONE oracle SQL, so their edge construction must stay
    byte-identical — a tweak applied to only one would silently
    desynchronize the 'two algorithms, one driver hash' parity claim."""
    docs = _t(spark, sf, "documents")
    hashed = docs.select(
        "doc_id", F.expr(dd.shingle_hash_expr("text")).alias("shingles")
    )
    pairs = dd.candidate_pairs(
        dd.lsh_bands(dd.with_minhash(hashed), "doc_id"), "doc_id"
    )
    verified = dd.jaccard_verify(pairs, dd.with_shingles(docs, "text"), "doc_id")
    return verified.filter(F.col("jaccard") >= CLUSTER_JACCARD).select(
        "id_a", "id_b"
    )


@register(
    "llm_dedup_clusters",
    sql=None,  # assigned below: embeds the llm_dedup_minhash oracle as a CTE
    tags=("dedup", "connected-components"),
)
def llm_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster resolution: pairwise near-dup output (MinHash LSH,
    Jaccard >= {CLUSTER_JACCARD}) -> connected components -> one keeper per
    cluster (min doc_id), the step that turns a pair list into delete
    decisions.  Components via iterated min-label propagation over the
    (symmetric, cached) edge list — {CLUSTER_ITERS} bounded Pregel rounds,
    each a broadcast-sized join + hash-agg keyed by node.  Edge count
    tracks the near-dup rate (tiny vs corpus), so at 100 TB the rounds are
    cheap relative to the LSH scan; production would localCheckpoint per
    round to truncate lineage (the alternating-star variant of
    Kiveris et al. cuts rounds to O(log n) for pathological chains)."""
    near = _near_dup_edges(spark, sf)
    # symmetric edges WITH self-loops, cached: self-loops make one round
    # `labels(b) -> min per a` alone (labels referenced ONCE per round, so
    # the logical plan stays LINEAR in rounds — the textbook two-reference
    # form `labels ∪ msgs` doubles the plan tree per round, 2^k analysis
    # cost); the cache keeps the LSH pipeline from re-running per round
    edges = (
        near.union(
            near.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        .union(
            near.select("id_a", F.col("id_a").alias("id_b"))
            .union(near.select(F.col("id_b").alias("id_a"), "id_b"))
        )
        .distinct()
        .cache()
    )
    labels = edges.select(F.col("id_a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(CLUSTER_ITERS):
        labels = (
            edges.join(
                labels.select(
                    F.col("node").alias("id_b"), F.col("label").alias("nb_label")
                ),
                "id_b",
            )
            .groupBy(F.col("id_a").alias("node"))
            .agg(F.min("nb_label").alias("label"))
        )
    # converged labels feed both the size agg and the final join — cache so
    # the propagation chain executes once, not twice
    labels = labels.cache()
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )


_REGISTRY["llm_dedup_clusters"].sql = f"""
WITH RECURSIVE verified AS (
{_REGISTRY["llm_dedup_minhash"].sql}
),
pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= {CLUSTER_JACCARD}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
),
lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
SELECT l.doc_id, l.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM lab l JOIN sizes s USING (cluster_id)
"""


# --- end-to-end pipeline composition ----------------------------------------


@register(
    "llm_pipeline_e2e",
    sql=f"""
WITH scored AS (
  SELECT doc_id, source, text, n_chars,
    len(str_split(text, ' ')) AS n_tokens,
    round(len(list_filter(str_split(lower(text), ' '),
                          t -> t IN ('the', 'a'))) * 1.0
          / greatest(len(str_split(text, ' ')), 1), 4) AS stop_ratio,
    round(n_chars * 1.0 / greatest(len(str_split(text, ' ')), 1), 4)
      AS mean_tok_len
  FROM documents
), kept AS (
  SELECT doc_id, source, text, n_chars FROM scored
  WHERE n_tokens >= 10 AND n_tokens <= 100000
    AND mean_tok_len <= 12 AND stop_ratio > 0
), deduped AS (
  SELECT doc_id, source, text, n_chars FROM (
    SELECT *, md5(array_to_string(str_split(lower(text), ' ')[1:8], ' '))
      AS dup_key
    FROM kept
  ) QUALIFY doc_id = min(doc_id) OVER (PARTITION BY dup_key)
), g AS (
  SELECT doc_id, source, n_chars, {_duck_grams(DECON_N)} AS gs
  FROM (SELECT doc_id, source, n_chars,
               str_split(lower(text), ' ') AS tk FROM deduped)
), bench AS (
  SELECT DISTINCT unnest({_duck_grams(DECON_N)}) AS gm
  FROM (SELECT str_split(lower(text), ' ') AS tk FROM documents
        WHERE source = '{BENCH_SOURCE}')
), contaminated AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(gs) AS gm FROM g) c JOIN bench USING (gm)
), clean AS (
  SELECT doc_id, n_chars FROM g
  WHERE source <> '{BENCH_SOURCE}'
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT {_duck_bucket('doc_id', N_SHARDS)} AS shard,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM clean GROUP BY 1
""",
    tags=("pipeline", "composition"),
)
def llm_pipeline_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """The composed curation pipeline a training-data run executes as ONE
    Spark job: C4-style quality filter -> exact dedup (min-doc_id keeper
    per content key) -> benchmark decontamination (drop docs sharing any
    {DECON_N}-gram with the held-out eval source) -> shard assignment with
    per-shard balance stats.  Stage semantics are byte-identical to the
    standalone queries (llm_corpus_filter / llm_dedup_exact /
    llm_decontaminate / llm_shard_assign); composing them declaratively
    lets Catalyst pipeline the per-row stages into a single pass over the
    corpus — shuffles only at the dedup window, the hit count, and the
    final shard rollup, all keyed and bounded.  This is the 'switch your
    pipeline to one plan' artifact: no materialization between stages."""
    from pyspark.sql import Window as W

    d = _t(spark, sf, "documents")  # NOT spread: 6 scan subtrees would each pay the reshuffle (measured 24% slower)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_ratio = F.round(
        F.size(
            F.filter(F.split(F.lower("text"), " "), lambda t: t.isin("the", "a"))
        )
        / F.greatest(n_tokens, F.lit(1)),
        4,
    )
    mean_tok_len = F.round(F.col("n_chars") / F.greatest(n_tokens, F.lit(1)), 4)
    kept = d.filter(
        (n_tokens >= 10)
        & (n_tokens <= 100000)
        & (mean_tok_len <= 12)
        & (stop_ratio > 0)
    ).select("doc_id", "source", "text", "n_chars")

    dup_key = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.lower("text"), " "), 1, 8))
    )
    deduped = (
        kept.withColumn("dup_key", dup_key)
        .withColumn("_keeper", F.min("doc_id").over(W.partitionBy("dup_key")))
        .filter(F.col("doc_id") == F.col("_keeper"))
        .drop("dup_key", "_keeper")
    )

    grams = deduped.select(
        "doc_id", "source", "n_chars",
        F.expr(_gram_expr("text", DECON_N)).alias("gs"),
    )
    bench = (
        d.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode(F.expr(_gram_expr("text", DECON_N))).alias("gm"))
        .distinct()
    )
    contaminated = (
        grams.select("doc_id", F.explode("gs").alias("gm"))
        .join(F.broadcast(bench), "gm")
        .select("doc_id")
        .distinct()
    )
    clean = grams.filter(F.col("source") != BENCH_SOURCE).join(
        contaminated, "doc_id", "left_anti"
    )
    return clean.select(
        _bucket(F.col("doc_id"), N_SHARDS).alias("shard"), "n_chars"
    ).groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# --- duplicated-span detection (substring-level dedup planning) --------------

SPAN_N = 8  # span width in tokens — the "long enough to be meaningful"
            # threshold of substring-dedup work (Lee et al. 2022 use 50
            # BPE tokens; scaled to the fixture's short docs)


@register(
    "llm_span_dedup",
    sql=f"""
WITH t AS (SELECT doc_id, str_split(lower(text), ' ') AS tk FROM documents),
s AS (
  SELECT doc_id, unnest(spans) AS gram FROM (
    SELECT doc_id,
      [array_to_string(tk[i:i+{SPAN_N - 1}], ' ')
       for i in generate_series(1, greatest(len(tk) - {SPAN_N - 1}, 1))] AS spans
    FROM t)
),
df AS (SELECT gram, count(DISTINCT doc_id) AS ndocs FROM s GROUP BY 1)
SELECT s.doc_id,
  count(*) AS n_spans,
  CAST(count(*) FILTER (WHERE df.ndocs >= 2) AS BIGINT) AS n_dup_spans,
  round(count(*) FILTER (WHERE df.ndocs >= 2) * 1.0 / count(*), 4) AS dup_frac
FROM s JOIN df USING (gram)
GROUP BY s.doc_id
""",
    tags=("dedup", "span", "substring"),
)
def llm_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-span dedup PLANNING (the Spark-expressible core of exact
    substring deduplication, Lee et al. 2022 'Deduplicating Training Data
    Makes Language Models Better'): every positional {SPAN_N}-token span,
    scored by whether it recurs in >= 2 distinct documents — per doc, the
    fraction of its spans that are cross-document duplicates (the material
    a substring-cut pass would remove).

    Differs from llm_boilerplate_ngrams (corpus-level frequent-gram list)
    by being positional and per-document: the same gram at 3 positions
    counts 3 spans.

    Scale: span STRINGS (~50 bytes each) are hashed to 64-bit keys before
    any wide operator, then positional spans collapse to (doc_id, ghash,
    multiplicity) — a map-side-combinable hash-agg — so the doc-frequency
    agg and the join-back shuffle ~6x fewer bytes than the string-keyed
    formulation; the final agg re-weights by multiplicity and keys by
    doc_id.  (xxhash64 collisions across distinct grams are ~(n^2)/2^65 —
    immaterial next to the SPAN_N-gram approximation itself.)  All keyed,
    nothing all-pairs, no driver action."""
    d = _ts(spark, sf, "documents")
    per = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform({_gram_expr('text', SPAN_N, distinct=False)}, "
                    "g -> xxhash64(g))"
                )
            ).alias("ghash"),
        )
        .groupBy("doc_id", "ghash")
        .agg(F.count("*").alias("mult"))
    )
    docfreq = per.groupBy("ghash").agg(F.count("*").alias("ndocs"))
    dup_w = F.sum(F.when(F.col("ndocs") >= 2, F.col("mult")).otherwise(0))
    return (
        per.join(docfreq, "ghash")
        .groupBy("doc_id")
        .agg(
            F.sum("mult").alias("n_spans"),
            dup_w.cast("bigint").alias("n_dup_spans"),
            F.round(dup_w / F.sum("mult"), 4).alias("dup_frac"),
        )
    )


# --- deterministic global shuffle (training order) ---------------------------

SHUFFLE_SEED = "epoch0"
SHUFFLE_SHARDS = 16


@register(
    "llm_global_shuffle",
    sql=f"""
WITH keyed AS (
  SELECT doc_id, md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key,
  CAST({_duck_bucket("doc_id", SHUFFLE_SHARDS).replace("doc_id", "shuffle_key")} AS BIGINT) AS shard,
  CAST(row_number() OVER (
    PARTITION BY {_duck_bucket("doc_id", SHUFFLE_SHARDS).replace("doc_id", "shuffle_key")}
    ORDER BY shuffle_key, doc_id) AS BIGINT) AS rank_in_shard
FROM keyed
""",
    tags=("shuffle", "training-order", "determinism"),
)
def llm_global_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic corpus shuffle for training order: every epoch's read
    order must be (a) pseudorandom, (b) reproducible across reruns and
    engines, (c) computable without a global sort.  Keyed md5(seed:doc_id)
    gives (a)+(b); sharding the keyspace and ranking WITHIN each shard
    gives (c) — readers consume shards round-robin, and the window is
    partitioned (per-shard sort), never a single-partition global
    row_number, which is the anti-pattern at 100 TB."""
    from pyspark.sql import Window as W

    d = _t(spark, sf, "documents").select("doc_id")
    keyed = d.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit(f"{SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))),
    ).withColumn("shard", _bucket(F.col("shuffle_key"), SHUFFLE_SHARDS))
    w = W.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shuffle_key",
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("rank_in_shard"),
    )


# --- segment-level exact dedup with reassembly -------------------------------

SEG_TOKENS = 20  # segment width: the C4/Dolma-style sub-document dedup unit
                 # (they use lines/paragraphs; the fixture corpus has no
                 # newlines, so fixed token blocks stand in)


@register(
    "llm_segment_dedup",
    sql=f"""
WITH t AS (SELECT doc_id, str_split(lower(text), ' ') AS tk FROM documents),
seg AS (
  SELECT doc_id, seg, CAST(pos AS BIGINT) AS pos FROM (
    SELECT doc_id,
      [array_to_string(tk[i:i+{SEG_TOKENS - 1}], ' ')
       for i in generate_series(1, greatest(len(tk), 1), {SEG_TOKENS})] AS segs
    FROM t),
  LATERAL (SELECT unnest(segs) AS seg, generate_subscripts(segs, 1) AS pos)
),
ranked AS (
  SELECT doc_id, seg, pos,
    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM seg
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_segments,
  CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
  coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '')
    AS text_dedup
FROM ranked GROUP BY doc_id
""",
    tags=("dedup", "segment", "reassembly"),
)
def llm_segment_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-document exact dedup with surgical removal (C4/Dolma drop
    duplicate lines corpus-wide; fixed {SEG_TOKENS}-token segments stand in
    for lines here): each segment is kept only at its FIRST corpus
    occurrence (min (doc_id, pos)), and each document is reassembled from
    its surviving segments in position order.

    Scale: winner election is one hash-agg keyed by segment (min struct —
    map-side combinable, no window over the corpus); the keep-filter is a
    join back on segment; reassembly groups by doc_id with sort_array —
    three keyed shuffles, no all-pairs, no driver action."""
    d = _t(spark, sf, "documents")
    toks = "split(lower(text), ' ')"
    # outer transform(array(...)) binds the token array once per row (the
    # shingle_expr/round-14 interpreted-HOF fix)
    segs_expr = (
        f"flatten(transform(array({toks}), tk -> "
        f"transform(sequence(1, greatest(size(tk), 1), {SEG_TOKENS}), "
        f"s -> array_join(slice(tk, s, {SEG_TOKENS}), ' '))))"
    )
    seg = d.select(
        "doc_id", F.posexplode(F.expr(segs_expr)).alias("pos0", "seg")
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "seg")
    winners = seg.groupBy("seg").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    flagged = seg.join(winners, "seg").withColumn(
        "kept", (F.col("doc_id") == F.col("w.doc_id")) & (F.col("pos") == F.col("w.pos"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("pos", "seg"))
                        )
                    ),
                    lambda s: s.seg,
                ),
                " ",
            ),
            F.lit(""),
        ).alias("text_dedup"),
    )


# --- BPE-ish regex token accounting ------------------------------------------

# GPT-2-style pre-tokenizer classes, restricted to the regex subset Java
# and RE2 agree on: letter runs, digit runs, non-alphanumeric runs.
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


@register(
    "llm_token_count_regex",
    sql=f"""
WITH per AS (
  SELECT source,
    len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_toks
  FROM documents
)
SELECT source,
  count(*) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
  round(avg(n_toks), 4) AS avg_tokens
FROM per GROUP BY source
""",
    tags=("token-count", "accounting"),
)
def llm_token_count_regex(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus token accounting with a BPE-ish pre-tokenizer regex (the
    GPT-2 pattern's portable core: letter runs / digit runs / punctuation
    runs) — the budget unit sits between whitespace words
    (llm_token_budget) and true subword BPE (kb_chunker_subword).  Pure
    JVM regex per row then a per-source hash-agg: pipelined,
    map-side-combinable, no shuffle growth with corpus size beyond the
    bounded source key space."""
    d = _t(spark, sf, "documents")
    n_toks = F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0)))
    return (
        d.select("source", n_toks.alias("n_toks"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_toks"), 4).alias("avg_tokens"),
        )
    )


# --- release manifest with shard checksums (wave 10) --------------------------

@register(
    "llm_release_manifest",
    sql=f"""
WITH assigned AS (
  SELECT {_duck_bucket('doc_id', N_SHARDS)} AS shard, doc_id, md5(text) AS h,
    len(str_split(text, ' ')) AS tk
  FROM documents
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(tk) AS BIGINT) AS n_tokens,
  md5(string_agg(h, '' ORDER BY doc_id)) AS shard_checksum
FROM assigned GROUP BY shard
""",
    tags=("sharding", "manifest", "integrity"),
)
def llm_release_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-release manifest: per training shard, document and token
    counts plus a CONTENT CHECKSUM — md5 over the doc_id-ordered
    concatenation of per-document content hashes, so a consumer can
    verify a shipped shard byte-for-byte without re-reading the source
    corpus (and a re-run producing the same manifest proves the release
    is reproducible end-to-end).  Pairs with llm_shard_assign's balance
    audit and llm_dataset_card's summary: card + manifest is what a
    release actually publishes.

    Shape: one shard-keyed hash agg; the ordered string_agg is bounded
    per shard (corpus/N_SHARDS docs, 32 bytes each) — at 100 TB raise
    N_SHARDS so per-shard hash chains stay small, same knob as the file
    layout itself.  Every output is exact (counts + digests).
    """
    d = _t(spark, sf, "documents")
    assigned = d.select(
        _bucket(F.col("doc_id"), N_SHARDS).alias("shard"),
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("tk"),
    )
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("tk").alias("n_tokens"),
        F.md5(
            F.expr("listagg(h) WITHIN GROUP (ORDER BY doc_id)")
        ).alias("shard_checksum"),
    )


# --- connected components, the O(log n) way (round 7) -------------------------


@register(
    "llm_cc_alternating_star",
    sql=None,  # assigned below: identical oracle to llm_dedup_clusters —
               # two algorithms, one answer
    tags=("dedup", "connected-components", "alternating-star", "iterative"),
)
def llm_cc_alternating_star(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster resolution again — same near-dup edges (MinHash
    LSH, Jaccard >= {CLUSTER_JACCARD}), same (doc_id, cluster_id,
    cluster_size) answer — but components via ALTERNATING LARGE-STAR /
    SMALL-STAR contraction (Kiveris et al., SoCC'14;
    operators/dedup.py:alternating_star_components) instead of the
    diameter-bounded label propagation in llm_dedup_clusters.  This is the
    production path that query's docstring promises: convergence is
    detected (16-byte edge-set checksum per round), not assumed from a
    fixed round count, and a chain-shaped component of ANY diameter
    converges in ~log2(diameter) rounds where label propagation needs
    diameter rounds.  Hash-checked against the same recursive-CTE closure
    oracle as llm_dedup_clusters — the strongest possible parity statement
    for an iterative algorithm: two independent implementations, one
    driver hash."""
    near = _near_dup_edges(spark, sf)
    labels = dd.alternating_star_components(near)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )


_REGISTRY["llm_cc_alternating_star"].sql = _REGISTRY["llm_dedup_clusters"].sql


@register(
    "llm_dedup_champion",
    sql=None,  # assigned below: extends the shared closure oracle with the
               # champion window
    tags=("dedup", "champion", "keep-decision", "curation"),
)
def llm_dedup_champion(spark: SparkSession, sf: str) -> DataFrame:
    """The KEEP decision the cluster queries stop short of: per near-dup
    cluster (same MinHash-LSH edges, components via the O(log n)
    alternating-star operator), elect ONE champion — the longest document
    (n_chars DESC), doc_id ASC as the deterministic tie-break — and count
    what gets dropped.  llm_dedup_clusters keeps min-doc_id, the arrival
    heuristic; real curation keeps the best-quality member
    (the "which copy survives" policy in every dedup paper's pipeline),
    and this query pins that policy cross-engine.  Shape: cluster labels
    join the documents dim once, then ONE label-partitioned window picks
    rank 1 — cost tracks the near-dup node set (tiny vs corpus), never
    the corpus itself.  At 100 TB the window partitions by cluster id, so
    no skew beyond the largest duplicate cluster."""
    from pyspark.sql import Window

    near = _near_dup_edges(spark, sf)
    labels = dd.alternating_star_components(near)
    docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
    joined = labels.join(
        docs, labels.node == docs.doc_id
    ).select(F.col("label").alias("cluster_id"), "doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ws = Window.partitionBy("cluster_id")
    ranked = joined.select(
        "cluster_id",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(ws).alias("cluster_size"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("champion_doc_id"),
            F.col("n_chars").cast("bigint").alias("champion_n_chars"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            (F.col("cluster_size") - 1).cast("bigint").alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


_REGISTRY["llm_dedup_champion"].sql = f"""
WITH RECURSIVE verified AS (
{_REGISTRY["llm_dedup_minhash"].sql}
),
pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= {CLUSTER_JACCARD}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
),
lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
joined AS (
  SELECT l.cluster_id, l.doc_id, d.n_chars
  FROM lab l JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY cluster_id
                       ORDER BY n_chars DESC, doc_id ASC) AS rn,
    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM joined
)
SELECT cluster_id,
  doc_id AS champion_doc_id,
  CAST(n_chars AS BIGINT) AS champion_n_chars,
  CAST(cluster_size AS BIGINT) AS cluster_size,
  CAST(cluster_size - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1
ORDER BY cluster_id
"""
