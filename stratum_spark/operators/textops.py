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
        # regexp_count: same non-overlapping match count as
        # size(regexp_extract_all(..)) without materializing the match
        # array per row
        F.regexp_count(t, F.lit(WORD_RE)).alias("n_re_tokens"),
        F.length(t).alias("n_chars_m"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality components + combined score (fixed 4dp rounding)."""
    t = F.col("text")
    n_chars = F.length(t)
    n_tok = F.size(ws_tokens(t))
    # count [a-z0-9] chars directly (regexp_count) instead of building a
    # stripped COPY of every document just to take its length -- same
    # value (single-char matches cannot overlap), no per-row allocation
    n_alnum = F.regexp_count(t, F.lit("[a-z0-9]"))
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


def repetition_scores(docs: DataFrame, n: int = 3) -> DataFrame:
    """Intra-document repeated n-gram ratio (the Gopher/MassiveText
    repetition quality rule): 1 - distinct_grams/total_grams, high for
    boilerplate/looping text. Pure projection -- no shuffle, no UDF;
    the transform/slice lambdas run in Spark's interpreted expression
    path (same trade as word_shingles; for a shuffle-based codegen
    formulation at extreme scale, dedup.py::gram_frame + two counts).
    Docs shorter than n tokens count their single whole-doc gram."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    ratio = F.round(
        F.lit(1.0) - n_distinct.cast("double") / n_grams.cast("double"), 4)
    return docs.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        ratio.alias("rep_ratio"),
        (ratio > 0.2).alias("repetitive"),
    )


# PII patterns: no lookarounds, so the same source compiles identically
# under Java regex (Spark) and RE2 (DuckDB) -- the oracle parity depends
# on that.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+?\d[\d\-]{6,}\d"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction pass (the scrub stage every training-data pipeline
    runs before tokenization): emails then phone-like digit runs are
    replaced with typed placeholders, with per-doc match counts for the
    pipeline's redaction-rate metrics. Phones are counted AFTER email
    redaction so digits inside an address are never double-counted.
    Pure projection; order of the two rules is part of the contract."""
    t = F.col(text_col)
    # regexp_count == size(regexp_extract_all(.., 0)): same
    # non-overlapping match semantics, no per-row match-array build
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    t1 = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    n_phones = F.regexp_count(t1, F.lit(PHONE_RE))
    t2 = F.regexp_replace(t1, PHONE_RE, "[PHONE]")
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        t2.alias("redacted"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Canonical document fingerprint: md5 of the normalized text (the
    rolling-hash/fingerprint family; md5 chosen because every engine
    agrees on it byte-for-byte)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))
