"""Text-analysis operators for LLM training-data pipelines (north star):
token counting, quality scoring, language-ID heuristic, document
fingerprinting.  All JVM built-ins — no UDFs in the hot path; every
operator is deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish token classes: word pieces, digit runs, single punctuation marks
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in")
DE_STOPWORDS = ("der", "die", "das", "und", "zu")
ES_STOPWORDS = ("el", "la", "los", "y", "de")


def _stop_hits(toks: str, words: tuple[str, ...]) -> str:
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    return f"size(filter({toks}, t -> array_contains({arr}, t)))"


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + regex token counts, distinct counts, avg token length.

    avg length is computed as integer-sum / integer-count so the division is
    the only FP op (bit-reproducible across engines)."""
    toks = f"split(lower({text_col}), ' ')"
    return (
        df.withColumn("n_tokens", F.expr(f"size({toks})"))
        .withColumn("n_distinct_tokens", F.expr(f"size(array_distinct({toks}))"))
        .withColumn(
            # Column API, not expr(): Spark SQL string literals eat the \s escape
            "n_bpe_tokens",
            F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)),
        )
        .withColumn(
            "avg_token_len",
            F.round(
                F.expr(f"aggregate({toks}, 0, (a, t) -> a + length(t))").cast("double")
                / F.col("n_tokens"),
                6,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.expr(_stop_hits(toks, EN_STOPWORDS)).cast("double") / F.col("n_tokens"),
                6,
            ),
        )
    )


def with_quality(df: DataFrame) -> DataFrame:
    """Composite quality score in [0, 1]: stopword presence, word-length
    plausibility, and length saturation — the standard cheap pre-filters a
    training corpus applies before expensive model-based scoring."""
    return df.withColumn(
        "quality",
        F.round(
            0.4 * F.col("stopword_ratio")
            + 0.3 * F.least(F.col("avg_token_len") / 8.0, F.lit(1.0))
            + 0.3 * F.least(F.col("n_tokens") / 256.0, F.lit(1.0)),
            6,
        ),
    )


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-profile language heuristic (deterministic tie-break:
    en > de > es > und)."""
    toks = f"split(lower({text_col}), ' ')"
    en, de, es = (
        _stop_hits(toks, EN_STOPWORDS),
        _stop_hits(toks, DE_STOPWORDS),
        _stop_hits(toks, ES_STOPWORDS),
    )
    return df.withColumn(
        "lang_pred",
        F.expr(
            f"CASE WHEN ({en}) >= ({de}) AND ({en}) >= ({es}) AND ({en}) > 0 THEN 'en' "
            f"WHEN ({de}) >= ({es}) AND ({de}) > 0 THEN 'de' "
            f"WHEN ({es}) > 0 THEN 'es' ELSE 'und' END"
        ),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: full-document md5 of the normalized text plus a
    winnowing-style fingerprint (min shingle hash) that survives small
    edits."""
    from knowledgebot_spark.operators.dedup import shingle_expr

    norm = f"array_join(split(lower(trim({text_col})), ' '), ' ')"
    return df.withColumn("content_md5", F.expr(f"md5({norm})")).withColumn(
        "winnow_fp", F.expr(f"array_min(transform({shingle_expr(text_col)}, s -> md5(s)))")
    )


def nfc_clean_udf():
    """Arrow-batched text normalizer: Unicode NFC composition, control-char
    strip (C0 minus tab/newline, plus DEL), and whitespace collapse — the
    standard corpus-cleaning stage run before tokenization/dedup so that
    visually-identical strings hash identically (a decomposed `e`+U+0301
    and a composed U+00E9 must be the SAME document to a dedup key).

    NFC has no JVM builtin in Spark, so this is a pandas_udf (ArrowEval,
    never row-at-a-time BatchEval) — the sanctioned slow path, kept narrow:
    one string column in, one out, everything around it stays in codegen.
    The DuckDB oracle mirrors each step (nfc_normalize + the same RE2-safe
    character classes); Python's ``\\s`` is Unicode-wide while RE2's is
    ASCII, so the collapse pattern spells the ASCII class explicitly.
    """
    import re
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ctrl = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")
    ws = re.compile(r"[\t\n\f\r ]+")

    def _clean(s):
        def f(x):
            if x is None:
                return None
            x = unicodedata.normalize("NFC", x)
            x = ctrl.sub("", x)
            return ws.sub(" ", x).strip()

        return s.map(f)

    # this module uses `from __future__ import annotations` (string hints),
    # which pandas_udf's type inference cannot resolve for a locally-bound
    # pd — attach real annotation objects instead
    _clean.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("string")(_clean)
