"""External-LLM enrichment variant of U2 (keywords) / U3 (summary).

Mirrors the reference's ``LLMService/LLMService.py`` call semantics:

  * ``get_keywords`` (LLMService.py:118-134): empty/non-string input -> [],
    any error -> [] (logged, never raised), LLM over-delivery trimmed to
    ``top_n`` (the A4 trim at :129-131).
  * ``get_summary`` (LLMService.py:137-151): empty/non-string -> None,
    error -> None, ``max_retries`` retry loop (instructor ``max_retries=3``
    at :146) — here an explicit bounded-attempt retry with backoff.
  * the engine flag ``enable_llm`` (Config/Schema.py:10) gates the whole
    thing; flag-off falls back to the deterministic defaults that the
    oracle-checked ``kb_keywords`` / ``kb_summary`` queries implement.

Scale shape (the part the reference, a single-threaded bot, does not have):
enrichment runs inside ``mapInPandas`` — per executor-core Arrow batches,
grouped into client batches of ``batch_size``, submitted to a
``ThreadPoolExecutor`` with ``max_concurrency`` workers.  At 100 TB this is
the only sane topology: the inference fleet sees bounded fan-out per
executor, the driver is never in the data path, and a lost task replays
only its own batch.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

ENRICH_SCHEMA = "doc_id long, keywords string, summary string"


@dataclass(frozen=True)
class LLMEnrichConfig:
    top_n: int = 5            # keywords per doc (KnowledgeBot.py:522 call-site)
    max_words: int = 25       # summary length cap (KnowledgeBot.py:523)
    retries: int = 3          # instructor max_retries (LLMService.py:146)
    batch_size: int = 16      # texts per endpoint call
    max_concurrency: int = 4  # in-flight endpoint calls per task
    backoff_s: float = 0.0    # base backoff between attempts (0 in tests)


class LLMClientError(RuntimeError):
    """Transport/endpoint failure — retried, then swallowed per reference."""


def _call_with_retry(fn: Callable[[], object], retries: int, backoff_s: float):
    """At most ``retries`` attempts; linear backoff; re-raises the last
    error for the caller to convert into the reference's []/None result."""
    last: Exception | None = None
    for attempt in range(max(1, retries)):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — endpoint errors are data here
            last = e
            if backoff_s:
                time.sleep(backoff_s * (attempt + 1))
    raise LLMClientError(str(last)) from last


def enrich_pandas_batch(
    client, texts: list, cfg: LLMEnrichConfig
) -> tuple[list[str], list[str | None]]:
    """Enrich one Arrow batch: chunk into endpoint batches, run them on a
    bounded thread pool, apply per-reference failure semantics.

    ``client`` must expose ``get_keywords_batch(texts, top_n) ->
    list[list[str]]`` and ``get_summary_batch(texts, max_words) ->
    list[str|None]`` — the batched twins of LLMService.get_keywords/
    get_summary.  Returns (keywords-as-joined-string, summary) aligned with
    ``texts``; keyword lists are ', '-joined so the output schema stays
    driver-canonicalizer-safe.
    """
    n = len(texts)
    # reference guard: non-string/empty input short-circuits before any call
    valid = [isinstance(t, str) and bool(t) for t in texts]
    chunks: list[list[str]] = []
    buf: list[str] = []
    for t, ok in zip(texts, valid):
        if not ok:
            continue
        buf.append(t)
        if len(buf) >= cfg.batch_size:
            chunks.append(buf)
            buf = []
    if buf:
        chunks.append(buf)

    keywords: list[str] = [""] * n
    summaries: list[str | None] = [None] * n

    def run_chunk(chunk: list[str]) -> tuple[list, list]:
        try:
            kw = _call_with_retry(
                lambda: client.get_keywords_batch(chunk, cfg.top_n),
                cfg.retries,
                cfg.backoff_s,
            )
            # A4 trim: the LLM may ignore top_n (LLMService.py:129-131)
            kw = [list(k)[: cfg.top_n] for k in kw]
        except LLMClientError:
            kw = [[] for _ in chunk]  # [Keyword Extraction Error] -> []
        try:
            sm = _call_with_retry(
                lambda: client.get_summary_batch(chunk, cfg.max_words),
                cfg.retries,
                cfg.backoff_s,
            )
        except LLMClientError:
            sm = [None for _ in chunk]  # [Summary Generation Error] -> None
        return kw, sm

    # chunks cover the valid items in order, so results map back onto
    # contiguous runs of valid_positions
    valid_positions = [i for i, ok in enumerate(valid) if ok]
    with ThreadPoolExecutor(max_workers=cfg.max_concurrency) as pool:
        futures = [pool.submit(run_chunk, c) for c in chunks]
        results = [f.result() for f in futures]
    pos = 0
    for kw, sm in results:
        span = valid_positions[pos : pos + len(kw)]
        pos += len(kw)
        for p, k, s in zip(span, kw, sm):
            keywords[p] = ", ".join(k)
            summaries[p] = s
    return keywords, summaries


def enrich_documents(
    docs: DataFrame,
    client_factory: Callable[[], object],
    cfg: LLMEnrichConfig = LLMEnrichConfig(),
) -> DataFrame:
    """LLM-on enrichment over a (doc_id, text) DataFrame.

    ``client_factory`` is a zero-arg picklable callable invoked ONCE PER
    TASK on the executor (connection reuse across Arrow batches); the
    returned client is never shipped from the driver.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in it:
            kw, sm = enrich_pandas_batch(client, list(pdf["text"]), cfg)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "keywords": kw, "summary": sm}
            )

    return docs.select("doc_id", "text").mapInPandas(run, schema=ENRICH_SCHEMA)


class DeterministicStubClient:
    """Offline stand-in endpoint: keywords = first ``top_n`` distinct
    lowercase whitespace tokens in order of appearance, summary = first
    ``max_words`` words.  Deterministic, hence DuckDB-oracle-checkable —
    it exists so the batching/retry/concurrency machinery itself sits
    behind the driver's correctness gate."""

    def get_keywords_batch(self, texts: list[str], top_n: int) -> list[list[str]]:
        out = []
        for t in texts:
            seen: list[str] = []
            for tok in t.lower().split(" "):
                if tok and tok not in seen:
                    seen.append(tok)
                if len(seen) >= top_n:
                    break
            out.append(seen)
        return out

    def get_summary_batch(self, texts: list[str], max_words: int) -> list[str | None]:
        return [" ".join(t.split(" ")[:max_words]) for t in texts]


def enrich_or_default(
    docs: DataFrame,
    enable_llm: bool,
    client_factory: Callable[[], object] | None = None,
    cfg: LLMEnrichConfig = LLMEnrichConfig(),
) -> DataFrame:
    """The engine-facing switch (Config/Schema.py:10 ``enable_llm``):
    flag-off -> deterministic JVM-side defaults (same results as the
    oracle-checked ``kb_keywords``/``kb_summary`` queries), flag-on ->
    ``enrich_documents`` against the supplied client."""
    if enable_llm:
        if client_factory is None:
            raise ValueError("enable_llm=True requires a client_factory")
        return enrich_documents(docs, client_factory, cfg)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    counted = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("tok"))
    kw = (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cfg.top_n)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "tok"))),
                    lambda s: s["tok"],
                ),
                ", ",
            ).alias("keywords")
        )
    )
    sm = docs.select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, cfg.max_words), " ").alias(
            "summary"
        ),
    )
    return kw.join(sm, "doc_id")
