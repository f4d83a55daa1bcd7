"""Text analysis operators for training-data curation, all native SQL.

language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + a BPE-ish regex), and
document fingerprinting (min-of-8-gram-md5 winnowing) — each over the
driver's documents table with a DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "que", "y"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count, BPE-ish subword count (runs of word chars /
    digits / single punctuation — a tokenizer-free proxy for BPE token
    pressure), and char stats."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).alias("bpe_ish_tokens"),
        F.length("text").alias("chars"),
        F.round(
            F.length("text")
            / F.greatest(F.size(toks), F.lit(1)).cast("double"),
            4,
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: stopword ratio, mean word length, short-doc and
    repetition flags (the C4/Gopher-style filters, SQL-only)."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    stop_all = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*stop_all))
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / F.size(toks)
    return docs.select(
        "doc_id",
        F.round(stop_hits / F.size(toks), 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_token_ratio"),
        (F.size(toks) >= 10).alias("len_ok"),
        F.round(
            (stop_hits / F.size(toks)) * 0.5 + distinct_ratio * 0.5, 4
        ).alias("quality"),
    ).orderBy("doc_id")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID; ties broken by fixed language order."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.col("text")), " ")

    def hit_count(ws: list[str]):
        # single-arg lambda: Spark binds higher-order lambda params by arity
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    hits = {lang: hit_count(ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    pred = (
        F.when(best == 0, F.lit("unk"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["de"] == best, F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return docs.select(
        "doc_id",
        *[v.alias(f"hits_{k}") for k, v in hits.items()],
        pred.alias("pred_lang"),
    ).orderBy("doc_id")


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: minimum md5 over all 8-char
    windows (rolling-hash flavored, engine-portable), plus the whole-text
    digest."""
    docs = _docs(spark, sf_dir)
    n_windows = F.greatest(F.length("text") - 7, F.lit(1))
    # running-min aggregate, NOT array_min(transform(...)): the transform
    # materializes one 32-char digest per character — an O(doc_len) array
    # per row that would be tens of MB for MB-scale documents.  The fold
    # keeps O(1) state per row; values are identical.  "g"*32 sorts above
    # every hex digest, so the seed never survives (n_windows >= 1).
    min_window = F.aggregate(
        F.sequence(F.lit(1), n_windows),
        F.lit("g" * 32),
        lambda acc, i: F.least(
            acc, F.md5(F.substring(F.col("text"), i, F.lit(8)))
        ),
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("digest"),
        min_window.alias("min_shingle_md5"),
    ).orderBy("doc_id")
