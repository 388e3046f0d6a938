"""External-LLM enrichment (U2/U3 LLM-on variant): batching, bounded
concurrency, retry, and reference failure semantics (LLMService.py:118-151),
plus flag-off parity with the deterministic defaults."""

from __future__ import annotations

import threading
import time

import pytest

from knowledgebot_spark.operators.llm_enrich import (
    DeterministicStubClient,
    LLMEnrichConfig,
    enrich_documents,
    enrich_or_default,
    enrich_pandas_batch,
)

CFG = LLMEnrichConfig(top_n=3, max_words=4, retries=3, batch_size=4, max_concurrency=2)


class RecordingClient(DeterministicStubClient):
    """Stub endpoint that records batch sizes and peak in-flight calls."""

    def __init__(self, fail_first: int = 0, sleep_s: float = 0.0):
        self.kw_batches: list[int] = []
        self.sm_batches: list[int] = []
        self.fail_first = fail_first
        self.sleep_s = sleep_s
        self.calls = 0
        self.in_flight = 0
        self.peak_in_flight = 0
        self._lock = threading.Lock()

    def _enter(self):
        with self._lock:
            self.calls += 1
            self.in_flight += 1
            self.peak_in_flight = max(self.peak_in_flight, self.in_flight)
            should_fail = self.calls <= self.fail_first
        if self.sleep_s:
            time.sleep(self.sleep_s)
        if should_fail:
            with self._lock:
                self.in_flight -= 1
            raise ConnectionError("endpoint down")

    def _exit(self):
        with self._lock:
            self.in_flight -= 1

    def get_keywords_batch(self, texts, top_n):
        self._enter()
        try:
            self.kw_batches.append(len(texts))
            return super().get_keywords_batch(texts, top_n)
        finally:
            self._exit()

    def get_summary_batch(self, texts, max_words):
        self._enter()
        try:
            self.sm_batches.append(len(texts))
            return super().get_summary_batch(texts, max_words)
        finally:
            self._exit()


def test_batching_splits_at_batch_size():
    client = RecordingClient()
    texts = [f"doc {i} alpha beta gamma delta" for i in range(10)]
    kw, sm = enrich_pandas_batch(client, texts, CFG)
    assert client.kw_batches == [4, 4, 2]
    assert client.sm_batches == [4, 4, 2]
    assert kw[0] == "doc, 0, alpha"          # top_n=3 distinct, in order
    assert sm[0] == "doc 0 alpha beta"       # max_words=4 truncation
    assert len(kw) == len(sm) == 10


def test_empty_and_nonstring_short_circuit():
    """Reference guard (LLMService.py:119-120,138-139): empty/non-string
    inputs never reach the endpoint; keywords=[] -> '', summary=None."""
    client = RecordingClient()
    kw, sm = enrich_pandas_batch(client, ["", None, "hello world"], CFG)
    assert kw == ["", "", "hello, world"]
    assert sm == [None, None, "hello world"]
    assert client.kw_batches == [1]          # only the one valid text


def test_retry_then_success():
    client = RecordingClient(fail_first=2)
    kw, sm = enrich_pandas_batch(client, ["alpha beta"], CFG)
    assert kw == ["alpha, beta"]
    assert sm == ["alpha beta"]
    assert client.calls >= 3                 # 2 failures + success


def test_exhausted_retries_give_reference_defaults():
    """Error after retries -> keywords [] / summary None, never a raise
    (LLMService.py:132-134,149-151)."""
    client = RecordingClient(fail_first=10**6)
    kw, sm = enrich_pandas_batch(client, ["alpha beta", "gamma"], CFG)
    assert kw == ["", ""]
    assert sm == [None, None]
    # retries bounded: 1 chunk x 2 tasks x retries=3 attempts
    assert client.calls == 6


def test_concurrency_is_bounded():
    client = RecordingClient(sleep_s=0.03)
    texts = [f"text {i}" for i in range(32)]  # 8 chunks of 4
    enrich_pandas_batch(client, texts, CFG)
    assert client.peak_in_flight <= CFG.max_concurrency
    assert client.peak_in_flight >= 2        # the pool actually parallelizes


def test_oversized_llm_response_trimmed_to_top_n():
    """A4 trim: the LLM may ignore top_n (LLMService.py:129-131)."""

    class Overdeliver(DeterministicStubClient):
        def get_keywords_batch(self, texts, top_n):
            return [["k%d" % i for i in range(top_n + 7)] for _ in texts]

    kw, _ = enrich_pandas_batch(Overdeliver(), ["x"], CFG)
    assert kw == ["k0, k1, k2"]


def test_spark_end_to_end_and_flag_off_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    on = enrich_documents(docs, DeterministicStubClient).orderBy("doc_id")
    rows = on.collect()
    assert len(rows) == 40
    for r in rows:
        assert isinstance(r.keywords, str) and r.keywords
        assert len(r.keywords.split(", ")) <= 5
        assert len(r.summary.split(" ")) <= 25

    # flag-off: deterministic default equals the oracle-checked kb_keywords/
    # kb_summary semantics (TF top-5 alphabetic ties + 25-word truncation)
    off = enrich_or_default(docs, enable_llm=False).orderBy("doc_id").collect()
    assert len(off) == 40
    first = docs.orderBy("doc_id").first()
    toks = first.text.lower().split(" ")
    from collections import Counter

    cnt = Counter(toks)
    expected = [t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    got = sorted(off[0].keywords.split(", "), key=lambda t: (-cnt[t], t))
    assert got == expected
    assert off[0].summary == " ".join(first.text.split(" ")[:25])


def test_flag_on_without_factory_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="client_factory"):
        enrich_or_default(docs, enable_llm=True)
