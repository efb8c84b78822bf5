"""Text analysis over the documents table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd) -- at 100 TB these run
as one projection over the parquet scan with full pushdown; no shuffle.
Every function has an exactly-equivalent DuckDB SQL oracle (floats rounded
to fixed dp on both sides so value-hash comparison is stable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z0-9]+"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ein"],
    "fr": ["le", "et", "les", "des", "une"],
    "es": ["el", "y", "los", "las", "una"],
}


def ws_tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace + regex ('BPE-ish' word/number pieces) token counts."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.size(ws_tokens(t)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(WORD_RE), 0)).alias("n_re_tokens"),
        F.length(t).alias("n_chars_m"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality components + combined score (fixed 4dp rounding)."""
    t = F.col("text")
    n_chars = F.length(t)
    n_tok = F.size(ws_tokens(t))
    n_alnum = F.length(F.regexp_replace(t, "[^a-z0-9]", ""))
    punct_ratio = (n_chars - n_alnum - (n_tok - 1)).cast("double") / n_chars
    stop_hits = F.size(
        F.array_intersect(ws_tokens(t), F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    )
    stop_ratio = stop_hits.cast("double") / n_tok
    mean_wlen = (n_alnum.cast("double") / n_tok)
    score = (
        F.when(n_tok >= 10, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.0, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_chars.alias("q_chars"),
        n_tok.alias("q_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(score, 2).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit argmax language guess (n-gram-heuristic family);
    deterministic tie-break by language order en>de>fr>es, 'und' =
    undetermined when no list hits."""
    toks = ws_tokens(F.col("text"))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    guess = (
        F.when(best <= 0, F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["de"] == best, F.lit("de"))
        .when(hits["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return docs.select(
        "doc_id", F.col("lang").alias("label_lang"), guess.alias("guessed_lang"),
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Canonical document fingerprint: md5 of the normalized text (the
    rolling-hash/fingerprint family; md5 chosen because every engine
    agrees on it byte-for-byte)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))
