"""Text analysis operators for training-data curation, all native SQL.

language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + a BPE-ish regex), document
fingerprinting (min-of-8-gram-md5 winnowing), Gopher-style repetition
stats, benchmark-contamination check, PII scrubbing, and deterministic
stratified sampling — each over the driver's documents table with a
DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
    ).repartition(1).sortWithinPartitions("doc_id")


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
    ).repartition(1).sortWithinPartitions("doc_id")


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
    ).repartition(1).sortWithinPartitions("doc_id")


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
    ).repartition(1).sortWithinPartitions("doc_id")


# ---------------------------------------------------------------------------
# Gopher-style repetition statistics
# ---------------------------------------------------------------------------


def repetition_stats_df(docs: DataFrame) -> DataFrame:
    """Word-level repetition filters in the Gopher/MassiveText style
    (Rae et al. 2021, §A1.1): fraction of tokens taken by the most
    frequent unigram, fraction of bigram slots taken by the most frequent
    bigram, and the duplicate-5-gram fraction.  ``keep`` applies the
    documented thresholds (0.30 / 0.18 / 0.30).

    Scale shape: the per-doc mode (most frequent n-gram) is computed by
    explode -> two-level groupBy — both shuffles are keyed by
    (doc_id, gram) then doc_id, so partial aggregation does the heavy
    lifting map-side and skew is bounded by the longest single document,
    not by any global hot key.  The duplicate-5-gram fraction needs no
    mode, so it stays fully in-row (array_distinct over the gram array —
    zero shuffle).  A driver-side loop or a global gram table would be
    wrong here: nothing about these stats crosses document boundaries.
    """
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n_tok")
    )

    def grams(n: int):
        # guard: sequence(1, 0) would DESCEND ([1, 0]) — never build it
        return F.when(
            F.col("n_tok") >= n,
            F.transform(
                F.sequence(F.lit(1), F.col("n_tok") - (n - 1)),
                lambda i: F.array_join(F.slice("toks", i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    top_uni = (
        base.select("doc_id", F.explode("toks").alias("g"))
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_uni"))
    )
    top_bi = (
        base.select("doc_id", F.explode(grams(2)).alias("g"))
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bi"))
    )
    g5 = grams(5)
    dup5 = F.when(
        F.col("n_tok") >= 5,
        F.round(
            1 - F.size(F.array_distinct(g5)) / F.size(g5).cast("double"), 4
        ),
    ).otherwise(F.lit(0.0))

    out = (
        base.select("doc_id", "n_tok", dup5.alias("dup_5gram_frac"))
        .join(top_uni, "doc_id")
        .join(top_bi, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tok").alias("n_tokens"),
            F.round(F.col("top_uni") / F.col("n_tok"), 4).alias(
                "top_unigram_frac"
            ),
            F.round(
                F.coalesce(F.col("top_bi"), F.lit(0))
                / F.greatest(F.col("n_tok") - 1, F.lit(1)),
                4,
            ).alias("top_bigram_frac"),
            "dup_5gram_frac",
        )
    )
    return out.withColumn(
        "keep",
        (
            (F.col("top_unigram_frac") <= 0.30)
            & (F.col("top_bigram_frac") <= 0.18)
            & (F.col("dup_5gram_frac") <= 0.30)
        ).cast("int"),
    ).repartition(1).sortWithinPartitions("doc_id")


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats_df(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Benchmark contamination check
# ---------------------------------------------------------------------------

CONTAM_K = 5  # words per contamination shingle (13 in the GPT-3 paper;
# 5 here because the fixture documents are short)


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan (the GPT-3 appendix-C / PaLM
    procedure): build word K-grams of every training document and flag
    documents sharing any K-gram with a held-out benchmark set — here
    deterministically `doc_id % 100 == 0`, standing in for MMLU/GSM8K
    prompts.

    Scale shape: benchmark suites are tiny (~10^5 grams) next to a
    100 TB corpus, so the gram set is DISTINCT-ed and broadcast — the
    corpus side is never shuffled; each task streams its grams against
    the in-memory hash set.  The per-doc count then reuses the doc_id
    grouping.  The wrong plan (shuffle equi-join on gram) would move the
    entire exploded corpus — K times the input — across the network.
    """
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n_tok"),
        (F.col("doc_id") % 100 == 0).cast("int").alias("is_benchmark"),
    )
    gram_list = F.when(
        F.col("n_tok") >= CONTAM_K,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tok") - (CONTAM_K - 1)),
            lambda i: F.array_join(F.slice("toks", i, CONTAM_K), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        "doc_id", "is_benchmark", F.explode(gram_list).alias("g")
    )
    bench_grams = (
        grams.filter(F.col("is_benchmark") == 1).select("g").distinct()
    )
    hits = (
        grams.filter(F.col("is_benchmark") == 0)
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    n_grams = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        base.select("doc_id", "is_benchmark")
        .join(n_grams, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "is_benchmark",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .withColumn(
            "contaminated",
            (
                (F.col("is_benchmark") == 0) & (F.col("n_contaminated") > 0)
            ).cast("int"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns restricted to syntax Java regex and RE2 (DuckDB) interpret
# identically — no lookarounds, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b1[3-9]\d{9}\b"  # Chinese mobile, the reference's domain
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact emails / CN mobile numbers / IPv4 literals.
    Pure map-side Catalyst regex (codegen'd, zero shuffle, zero Python).
    Redaction order email -> phone -> ip: the email pattern can consume
    digits a later pattern would half-match, never vice versa."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ),
        PII_IP,
        "[IP]",
    )

    def n(pat: str):
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))

    return docs.select(
        "doc_id",
        n(PII_EMAIL).alias("n_emails"),
        n(PII_PHONE).alias("n_phones"),
        n(PII_IP).alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    ).repartition(1).sortWithinPartitions("doc_id")


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the fixture corpus carries no PII, so each document
    is deterministically augmented with synthetic contact lines (a pure
    function of doc_id, mirrored in the DuckDB oracle) before scrubbing —
    making hit counts non-trivial and the redaction path exercised."""
    docs = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 139"),
        F.lpad((F.col("doc_id") % 100000000).cast("string"), 8, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    return pii_scrub_df(docs.select("doc_id", aug.alias("text")))


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# md5-prefix thresholds: lexicographic compare of the 32-hex digest
# against a one-char bound keeps exactly that fraction of a uniform hash.
SAMPLE_THRESHOLDS = {"en": "8", "de": "4", "es": "2"}  # 1/2, 1/4, 1/8


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language downsampling with a DETERMINISTIC hash gate — the
    domain-mix rebalancing step of a training-data pipeline (keep 50% en,
    25% de, 12.5% es here).  keep iff md5(doc_id:lang) < threshold(lang).

    Scale shape: pure map-side filter — no shuffle, no RNG.  Unlike
    df.sample(), the decision is a function of the ROW, so it is stable
    across retries, partitionings, and engines (the DuckDB oracle
    reproduces it bit-for-bit), and re-running the pipeline on an
    appended table keeps prior decisions — the property that matters when
    sampling feeds an incremental ingest."""
    docs = _docs(spark, sf_dir)
    key = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang"))
    )
    thresh = F.lit(None).cast("string")
    expr = None
    for lang, t in SAMPLE_THRESHOLDS.items():
        cond = F.col("lang") == lang
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(
            cond, F.lit(t)
        )
    thresh = expr.otherwise(F.lit("g"))  # unknown langs: keep all
    return (
        docs.select("doc_id", "lang", "source", key.alias("sample_key"))
        .filter(F.col("sample_key") < thresh)
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

TFIDF_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = TFIDF_K) -> DataFrame:
    """Per-document top-k TF-IDF terms — the keyword-extraction /
    feature-weighting step of a corpus-analysis pipeline.

    tf = in-doc term count; idf = ln((N+1)/(df+1)) (add-one smoothed);
    score rounded to 4 decimals BEFORE ranking so the rank order is the
    rounded order in every engine; ties break on the term string.

    Scale shape: term frequency and document frequency are each one
    groupBy with map-side partial aggregation (keys (doc_id, term) and
    term — no global hot key beyond stopwords, which partial agg absorbs).
    idf joins back on the term key; the vocabulary is corpus-sized state,
    so this stays a shuffle join rather than a broadcast (at 10^12 tokens
    the distinct-term table is still millions of rows — broadcastable
    only after a frequency cutoff).  The final top-k is a doc_id window.
    """
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    terms = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = df_t.select(
        "term", F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)).alias("idf")
    )
    from pyspark.sql.window import Window

    scored = tf.join(idf, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf") * F.col("idf"), 4).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "score")
        .repartition(1).sortWithinPartitions("doc_id", "rank")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (data selection for language models)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed-feature dimension (10^4..10^6 in the paper;
# 256 here so the 500-doc oracle corpus populates every bucket)


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al., NeurIPS
    2023): score every raw document by how target-domain-like it is
    under a hashed bag-of-bigrams bigram model.  Per doc,

        log w(doc) = sum over bigram features of
                     ln( p_target(bucket) / p_raw(bucket) )

    with bigrams hashed into ``DSIR_BUCKETS`` buckets and add-one
    smoothed bucket probabilities.  High log-weight docs look like the
    target domain; the resampling step keeps docs proportional to w.
    Target here is the deterministic stand-in ``source = 'src0'`` (in a
    real pipeline: a curated high-quality corpus).

    Engine-portable determinism: the bucket key is the 2-hex-char md5
    prefix of the bigram (a STRING key — no integer-hash divergence
    between engines), and the per-bucket log-ratio is rounded to 6
    decimals then summed as DECIMAL(18,6) — decimal addition is exact
    and associative, so the per-doc sum cannot depend on partition
    order (a float64 sum would differ between Spark's partial-agg order
    and DuckDB's scan order in the last ulp).

    Scale shape (100 TB): two passes over exploded bigrams, both with
    map-side partial aggregation — (a) bucket counts collapse to
    DSIR_BUCKETS rows regardless of corpus size, (b) the per-doc sum
    groups on doc_id.  The learned bucket-weight table is tiny and
    BROADCAST; the corpus is never shuffled except by doc_id for the
    final sum (and that shuffle carries one decimal per feature, not
    text).  This is why DSIR runs at trillion-token scale: model state
    is O(buckets), corpus work is one streaming pass."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    base = docs.select(
        "doc_id",
        (F.col("source") == "src0").cast("int").alias("is_target"),
        toks.alias("toks"),
        F.size(toks).alias("n_tok"),
    )
    big_list = F.when(
        F.col("n_tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tok") - 1),
            lambda i: F.array_join(F.slice("toks", i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = base.select(
        "doc_id", "is_target", F.explode(big_list).alias("g")
    ).withColumn("bucket", F.substring(F.md5("g"), 1, 2))

    counts = feats.groupBy("bucket").agg(
        F.sum("is_target").alias("tgt"), F.count("*").alias("tot")
    )
    totals = counts.agg(
        F.sum("tgt").alias("t_tot"), F.sum("tot").alias("a_tot")
    )
    b = float(DSIR_BUCKETS)
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log(
                ((F.col("tgt") + 1.0) / (F.col("t_tot") + b))
                / (
                    (F.col("tot") - F.col("tgt") + 1.0)
                    / (F.col("a_tot") - F.col("t_tot") + b)
                )
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("w"),
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("w").alias("sumw"))
    )
    return (
        base.select("doc_id", "is_target")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce("n_feats", F.lit(0).cast("bigint")).alias("n_feats"),
            # emitted as DECIMAL end-to-end: a cast to double would hit
            # engine-specific round() midpoint behavior on re-rounding
            F.coalesce(
                F.col("sumw"), F.lit(0).cast("decimal(28,6)")
            ).alias("dsir_logweight"),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Training-sequence packing
# ---------------------------------------------------------------------------

SEQ_LEN = 128  # tokens per packed training sequence


def _pack_projection() -> list:
    """The packed-sequence projection shared VERBATIM by sequence_pack,
    training_manifest, and sequence_pack_incremental (and mirrored by
    their three oracle SQL blocks): a doc whose token stream occupies
    [cum_end - n_tokens, cum_end) lands in sequences
    start div L .. (end-1) div L.  One definition so the three
    operators can never drift on the packing arithmetic."""
    return [
        "source",
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("cum_end") - F.col("n_tokens"))
        .cast("bigint")
        .alias("start_tok"),
        F.expr(f"(cum_end - n_tokens) div {SEQ_LEN}")
        .cast("bigint")
        .alias("first_seq"),
        F.expr(f"(cum_end - 1) div {SEQ_LEN}")
        .cast("bigint")
        .alias("last_seq"),
    ]



def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in a
    deterministic order and split the token stream into fixed
    ``SEQ_LEN``-token training sequences, reporting for every document
    the sequences it lands in.  This is the final batching step of every
    LLM data pipeline (docs -> token stream -> equal-length rows).

    Packing is PER SOURCE SHARD (partition by ``source``, order by
    doc_id): the running token offset is a window cumulative sum, and a
    doc spanning [start, end) covers sequences start div L through
    (end-1) div L.  All integer arithmetic — engine- and
    partition-order-exact.

    Scale shape: a running sum within a shard is inherently sequential,
    so the parallel unit is the shard (here ``source``; in production
    the ingest file), exactly how packing is sharded in real pipelines —
    no global coordination, each shard packs independently, and the
    window shuffle is one exchange on the shard key.  A global pack
    (single window over 10^12 docs) would serialize on one task; the
    per-shard form never does."""
    docs = _docs(spark, sf_dir)
    from pyspark.sql.window import Window

    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = docs.select(
        "source", "doc_id", n_tok.alias("n_tokens")
    ).withColumn("cum_end", F.sum("n_tokens").over(w))
    return (
        base.select(*_pack_projection())
        .withColumn(
            "n_seqs_spanned", F.col("last_seq") - F.col("first_seq") + 1
        )
        .repartition(1)
        .sortWithinPartitions("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Curation decision fusion
# ---------------------------------------------------------------------------


def curation_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual per-document KEEP/DROP decision a curation pipeline
    ships: fuse the independent quality signals (C4 / Gopher style) and
    report which gates failed, so drops are auditable.

    Gates (all must pass to keep):
      len_ok       — >= 10 tokens (quality_score's length gate)
      rep_ok       — Gopher repetition thresholds (repetition_stats.keep)
      lang_ok      — stopword-vote language identified (pred_lang != unk)
      stop_ok      — stopword_ratio >= 0.03 (C4's "reads like prose")

    Scale shape: every signal is an independent map-side/partial-agg
    pipeline over the same scan (see their docstrings); the fusion joins
    per-doc single rows on doc_id — each join input is exactly one row
    per document, so the fusion costs one co-partitioned shuffle of
    already-collapsed data, like dedup_signal_fusion."""
    q = quality_score(spark, sf_dir).select(
        "doc_id", "stopword_ratio", "len_ok"
    )
    r = repetition_stats(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_ok")
    )
    lang = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    fused = (
        q.join(r, "doc_id")
        .join(lang, "doc_id")
        .select(
            "doc_id",
            F.col("len_ok").cast("int").alias("len_ok"),
            "rep_ok",
            (F.col("pred_lang") != "unk").cast("int").alias("lang_ok"),
            (F.col("stopword_ratio") >= 0.03).cast("int").alias("stop_ok"),
        )
        .withColumn(
            "keep",
            (
                (F.col("len_ok") == 1)
                & (F.col("rep_ok") == 1)
                & (F.col("lang_ok") == 1)
                & (F.col("stop_ok") == 1)
            ).cast("int"),
        )
    )
    return fused.repartition(1).sortWithinPartitions("doc_id")


# ---------------------------------------------------------------------------
# source-mix rebalancing
# ---------------------------------------------------------------------------

MIX_MOD = 16777216  # 24-bit gate space
MIX_KNUTH = 2654435761  # Knuth multiplicative hash constant


def source_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward a target source mix — the DoReMi-ish
    static domain-weighting step: given target weights per source
    (here: weight k+1 for source ``src{k}``, declared not learned), keep
    each source at rate min(1, target_share * total / count) with a
    deterministic per-row hash gate.

    Two-pass shape: a tiny per-source count aggregate (one shuffle of
    O(sources) rows), rates broadcast-joined back, then a pure map-side
    gate — the corpus itself is never shuffled.  All arithmetic is
    integer (rate in 1/2^24 units, Knuth multiplicative row hash) so
    the decision is retry-stable and engine-exact; like
    stratified_sample, appends keep prior decisions."""
    docs = _docs(spark, sf_dir)
    src_w = (
        F.regexp_extract(F.col("source"), r"src(\d+)", 1).cast("long") + 1
    )
    # the declared weight is a function of the source key, so it rides
    # the counts aggregate — ONE definition feeds both wsum and rate24
    counts = docs.groupBy("source").agg(
        F.count("*").alias("cnt"), F.max(src_w).alias("w")
    )
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.sum("w").alias("wsum")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(MIX_MOD),
            F.expr(f"({MIX_MOD} * total * w) div (wsum * cnt)"),
        ).alias("rate24"),
    )
    gate = (F.col("doc_id") * F.lit(MIX_KNUTH)) % F.lit(MIX_MOD)
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(gate < F.col("rate24"))
        .select("doc_id", "source", "rate24")
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# corpus-LM perplexity scoring
# ---------------------------------------------------------------------------


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram language-model perplexity — the CCNet-style
    quality signal (Wenzek et al., LREC 2020 score with a KenLM model;
    here the LM is a unigram model fit on the corpus itself, so the
    operator is self-contained and engine-exact): documents whose token
    distribution diverges from the corpus read as high-perplexity and
    get filtered or down-weighted.

    ppl(doc) = exp(-mean_t ln p(t)),  p(t) = (count(t)+1) / (T+V)
    (add-one smoothing over the corpus vocabulary).

    Scale shape: one explode + groupBy builds the vocabulary (shuffle
    O(distinct tokens), partial-agg map-side); the fitted LM is a
    vocabulary-sized table — language-sized (~10^6 rows), broadcast to
    the scoring join, so the corpus itself shuffles only for the final
    per-doc mean.  At 10^12 docs the LM fit is a one-off job and the
    scorer joins against its persisted output."""
    return (
        _doc_perplexities(_docs(spark, sf_dir))
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


def _doc_perplexities(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, ppl) unsorted core of lm_perplexity — shared
    with uncertainty_sample."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = vocab.agg(
        F.sum("c").alias("t_total"), F.count("*").alias("v_size")
    )
    lm = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.log(
            (F.col("c") + 1.0) / (F.col("t_total") + F.col("v_size"))
        ).alias("lp"),
    )
    return (
        toks.join(F.broadcast(lm), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.exp(-F.avg("lp")), 4).alias("ppl"),
        )
    )


# ---------------------------------------------------------------------------
# percentile-threshold outlier filter
# ---------------------------------------------------------------------------

OUTLIER_LO, OUTLIER_HI = 0.01, 0.99


def length_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass distribution-based outlier gate: per-language p01/p99
    length thresholds from pass one, broadcast back, every doc flagged
    in a map-side pass two — the data-driven version of a fixed length
    cut (truncated docs and concatenation blobs sit in the tails of
    their OWN language's distribution, not a global one).

    Exact percentile here (the verifier twin); the 100 TB swap is
    approx_percentile with the same two-pass shape.  The threshold
    table is O(languages) — broadcast, corpus never shuffled."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    th = docs.groupBy("lang").agg(
        F.round(
            F.expr(f"percentile(n_chars, {OUTLIER_LO}D)"), 6
        ).alias("lo"),
        F.round(
            F.expr(f"percentile(n_chars, {OUTLIER_HI}D)"), 6
        ).alias("hi"),
    )
    return (
        docs.join(F.broadcast(th), "lang")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "lo",
            "hi",
            (
                (F.col("n_chars") >= F.col("lo"))
                & (F.col("n_chars") <= F.col("hi"))
            ).cast("int").alias("keep"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


CHUNK_CHARS = 256
CHUNK_STRIDE = 192


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping fixed-size training chunks
    (CHUNK_CHARS window, CHUNK_STRIDE stride — 25% overlap), the
    context-window packing precursor every LLM data pipeline runs.

    Pure Catalyst: offsets come from ``sequence(0, len-1, stride)``
    exploded map-side (no shuffle at all — the output keeps the input's
    partitioning), chunks are ``substring`` slices.  Memory per row is
    bounded by doc length x (1/stride) overlap factor; empty docs emit
    exactly one empty chunk so downstream row accounting stays 1:1
    auditable against the input.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, greatest(length(text) - 1, 0),"
                f" {CHUNK_STRIDE}), o -> substring(text, o + 1, {CHUNK_CHARS}))"
            )
        ).alias("chunk_id", "chunk"),
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * CHUNK_STRIDE).alias("offset"),
        F.length("chunk").alias("chunk_len"),
        "chunk",
    )


SAMPLE_HASH_A = 2654435761
SAMPLE_HASH_M = 2**32
SAMPLE_RATE_PCT = 10


def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling: keep a document iff the high range
    of its portable multiplicative hash falls under rate% of 2^32 —
    the web-scale sampling idiom.

    Why hash, not rand(): the sample is a pure function of the key, so
    it is (a) reproducible across runs and retries (a re-executed task
    samples identically — rand() breaks exactly-once semantics under
    speculative execution), (b) CONSISTENT across tables — any other
    table keyed by doc_id samples the same ids, so sampled joins stay
    inner-complete, and (c) map-side only: zero shuffle, zero state,
    trivially parallel at any scale (plan pinned by
    tests/test_plans.py::test_hash_sample_map_side_only).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.pmod(F.col("doc_id") * F.lit(SAMPLE_HASH_A), F.lit(SAMPLE_HASH_M))
    thr = SAMPLE_HASH_M * SAMPLE_RATE_PCT // 100
    return (
        docs.withColumn("h", h)
        .filter(F.col("h") < thr)
        .select("doc_id", "source", "lang", "n_chars", "h")
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# Zero-width characters stripped by text_normalize (ZWSP, ZWNJ, ZWJ, BOM).
_ZW_CODEPOINTS = (0x200B, 0x200C, 0x200D, 0xFEFF)


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-aware text canonicalization — the step every multilingual
    training pipeline runs before dedup/tokenization: NFC normalization
    (composed and decomposed forms of the same grapheme must hash
    identically or every dedup signal silently misses cross-source
    duplicates), CRLF -> LF, zero-width character strip, horizontal
    whitespace collapse, edge trim.

    The corpus is ASCII, so adversarial inputs are SYNTHESIZED
    deterministically: docs get a decomposed (e +  ̈ U+0301) or
    precomposed (é U+00E9) prefix by doc_id residue — NFC must map both
    to the same byte sequence — plus a tab run, a CRLF, and a trailing
    zero-width space.

    NFC itself has no Catalyst builtin, so it runs as an Arrow-batched
    pandas UDF (``unicodedata.normalize`` — the slow-path rule: vectorized
    python only where the JVM genuinely lacks the primitive); everything
    around it (prefix synthesis, length accounting) is native SQL.  The
    stage is map-side only — zero shuffle at any scale.  The DuckDB
    oracle reproduces the full chain via ``nfc_normalize`` + regexes.
    """
    import re
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    zw = "".join(chr(c) for c in _ZW_CODEPOINTS)
    zw_re = re.compile(f"[{zw}]")
    ws_re = re.compile(r"[ \t]+")

    def _kernel(s):  # pd.Series -> pd.Series (module has deferred
        # annotations, so the signature is declared via returnType below)
        def one(x: str) -> str:
            x = unicodedata.normalize("NFC", x)
            x = x.replace("\r\n", "\n").replace("\r", "\n")
            x = zw_re.sub("", x)
            x = ws_re.sub(" ", x)
            return x.strip(" \t\n")

        return s.map(one)

    nfc_clean = pandas_udf(_kernel, "string")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prefix = (
        # decomposed e + combining acute vs the precomposed codepoint:
        # NFC must send both to the same bytes
        F.when(F.col("doc_id") % 3 == 0, F.lit("e\u0301 "))
        .when(F.col("doc_id") % 3 == 1, F.lit("\u00e9 "))
        .otherwise(F.lit(""))
    )
    raw = F.concat(
        prefix, F.lit("\t "), F.col("text"), F.lit("\r\n tail\u200b")
    )
    return (
        docs.select("doc_id", raw.alias("raw"))
        .select(
            "doc_id",
            F.length("raw").alias("n_raw"),
            nfc_clean(F.col("raw")).alias("norm"),
        )
        .select(
            "doc_id",
            "n_raw",
            F.length("norm").alias("n_norm"),
            F.substring("norm", 1, 40).alias("norm_head"),
            F.substring("norm", -12, 12).alias("norm_tail"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# mojibake repair table: UTF-8 bytes of the good char mis-decoded as
# cp1252 (the classic double-encoding corruption) -> the intended char.
# Applied in this order on both engines; the 3-char 'â€x' sequences and
# 'Ã©' cannot overlap each other or ASCII base text, so the chain is
# confluent.
MOJIBAKE_PAIRS = (
    ("â€™", "’"),  # â€™ -> ' (right single quote)
    ("â€œ", "“"),  # â€œ -> " (left double quote)
    ("â€”", "—"),  # â€” -> — (em dash)
    ("Ã©", "é"),        # Ã©  -> é
)


def encoding_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake detection + repair — the encoding-hygiene pass (ftfy's
    core case) every web-scale text pipeline runs before dedup: text
    that was UTF-8 encoded but decoded as cp1252 shows the classic
    'Ã©' / 'â€™' double-encoding artifacts, which poison shingles,
    tokenizers, and near-dup signals until repaired.

    The corpus is ASCII, so corrupted inputs are SYNTHESIZED
    deterministically (same rule in the DuckDB oracle): by doc_id
    residue a mojibake suffix is appended (3x Ã©, a â€™/â€” pair, a
    â€œ/â€™ pair, or nothing), then the operator repairs via the fixed
    ``MOJIBAKE_PAIRS`` chain and counts per-pair occurrences from char
    lengths — all integers, engine-exact.

    Scale shape: a single map-side projection of chained ``replace``
    expressions — native Catalyst, no UDF, no shuffle (except the
    check-gate sort); at 10^12 documents this runs at parquet-scan
    speed with the text column pruned straight from the scan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corrupt = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" cafÃ© rÃ©sumÃ©"))
        .when(
            F.col("doc_id") % 4 == 1,
            F.lit(" donâ€™t â€” wait"),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.lit(" â€œquotedâ€™"),
        )
        .otherwise(F.lit("")),
    )
    out = docs.select(
        "doc_id", F.length("text").alias("base_len"), corrupt.alias("c")
    )
    n_hits = F.lit(0).cast("bigint")
    repaired = F.col("c")
    for bad, good in MOJIBAKE_PAIRS:
        n_hits = n_hits + F.floor(
            (F.length("c") - F.length(F.replace(F.col("c"), F.lit(bad), F.lit(""))))
            / F.lit(len(bad))
        ).cast("bigint")
        repaired = F.replace(repaired, F.lit(bad), F.lit(good))
    return (
        out.select(
            "doc_id",
            n_hits.alias("n_mojibake"),
            (n_hits > 0).alias("was_corrupted"),
            F.length("c").alias("n_chars_bad"),
            F.length(repaired).alias("n_chars_fixed"),
            # the appended (now repaired) suffix, positionally — avoids
            # engine-divergent negative-start substring on short docs
            F.substring(
                repaired, F.col("base_len") + 1, F.lit(40)
            ).alias("fixed_tail"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


GROUP_SAMPLE_K = 5


def group_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group deterministic sample: for every source, the
    GROUP_SAMPLE_K documents with the smallest portable hash — the
    spot-check sample a curation review pulls per slice, stable across
    runs and machines (rand()-based sampling is neither).

    One shuffle on the group key, then a row_number window; the
    multiplicative hash is injective on doc_id < 2^32, so ordering has
    no ties and the sample is fully deterministic."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.pmod(F.col("doc_id") * F.lit(SAMPLE_HASH_A), F.lit(SAMPLE_HASH_M))
    w = Window.partitionBy("source").orderBy("h")
    return (
        docs.withColumn("h", h)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= GROUP_SAMPLE_K)
        .select("source", "rn", "doc_id", "lang", "n_chars")
        .repartition(1)
        .sortWithinPartitions("source", "rn")
    )


N_SHARDS = 8


def shard_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + balanced shard packing — the
    manifest a training dataloader needs: every document gets a shard,
    a position within that shard, and the cumulative byte offset where
    its text starts, all reproducible bit-for-bit across runs.

    The permutation is the portable multiplicative hash (injective on
    doc_id < 2^32 — no ties, no rand()): shard = h mod N_SHARDS, order
    within a shard = ascending h.  Because h is uniform, shards balance
    to ~corpus/N_SHARDS rows each with no planning pass.

    Scale shape: ONE shuffle, on the shard key; position and offset are
    per-shard windows (each window partition IS a shard — at 100 TB
    N_SHARDS is thousands, so no partition exceeds a target shard
    size and there is never a global single-partition sort).  The
    offset window is the running sum a shard writer keeps for free when
    streaming rows out in order."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.pmod(F.col("doc_id") * F.lit(SAMPLE_HASH_A), F.lit(SAMPLE_HASH_M))
    w = Window.partitionBy("shard").orderBy("h")
    return (
        docs.select("doc_id", "n_chars")
        .withColumn("h", h)
        .withColumn("shard", F.pmod(F.col("h"), F.lit(N_SHARDS)))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "byte_offset",
            F.coalesce(
                F.sum("n_chars").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        )
        .select("doc_id", "shard", "pos", "byte_offset")
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


POSTING_BLOCK = 64  # doc_ids per partial posting block (thousands in prod)


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-index build: term -> document frequency, corpus frequency,
    and a delta-encoded posting list (first doc_id, then doc_id gaps —
    the compression every real index applies before varint coding), with
    the per-doc term frequencies aligned to the same order.

    Scale shape: one explode (map-side), then a TWO-STAGE aggregation
    keyed on (term, doc_block) before (term).  The block stage bounds
    reducer state for hot terms (stopwords appear in nearly every
    document — a single-stage groupBy(term) collect_list concentrates
    the whole corpus's worst posting list in one task's memory); block
    partials arrive pre-sorted, so the final merge is an ordered concat,
    not a resort.  At true scale the writer keeps one row PER BLOCK
    (skip pointers) and never materializes the full list; we concat here
    so the output is one exact row per term for the DuckDB oracle."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    per_doc = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    blocks = (
        per_doc.withColumn("blk", F.floor(F.col("doc_id") / POSTING_BLOCK))
        .groupBy("term", "blk")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf"))
            ).alias("plist"),
            F.count("*").alias("df_part"),
            F.sum("tf").alias("cf_part"),
        )
    )
    merged = blocks.groupBy("term").agg(
        F.flatten(
            F.transform(
                F.sort_array(F.collect_list(F.struct("blk", "plist"))),
                lambda s: s["plist"],
            )
        ).alias("plist"),
        F.sum("df_part").alias("df"),
        F.sum("cf_part").alias("cf"),
    )
    ds = F.transform(F.col("plist"), lambda s: s["doc_id"])
    shifted = F.concat(
        F.array(F.lit(0).cast("long")), F.slice(ds, 1, F.size(ds) - 1)
    )
    gaps = F.zip_with(ds, shifted, lambda a, b: a - b)
    tfs = F.transform(F.col("plist"), lambda s: s["tf"])
    return (
        merged.select(
            "term",
            "df",
            "cf",
            F.concat_ws(
                ",", F.transform(gaps, lambda g: g.cast("string"))
            ).alias("doc_gaps"),
            F.concat_ws(
                ",", F.transform(tfs, lambda t: t.cast("string"))
            ).alias("tfs"),
        )
        .repartition(1)
        .sortWithinPartitions("term")
    )


PMI_MIN_COUNT = 5  # drop noise bigrams below this support
PMI_TOP_K = 50


def pmi_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-k adjacent word bigrams by LIFT
    P(xy)/(P(x)P(y)) — the monotone core of PMI (PMI = ln lift), kept
    in EXACT integer arithmetic (parts-per-million, bigint div) so the
    cross-engine hash cannot flip on a libm ulp: lift_ppm =
    (1e6 * c_xy * N) div (c_x * c_y), with c_x / c_y the left/right
    bigram marginals and N the total bigram count.

    Scale shape: bigrams are formed array-side (zip of two slices — no
    self-join on position), ONE (w1, w2) shuffle counts them, and both
    marginals + N derive from that counted table (vocabulary-sized, not
    corpus-sized), broadcast back.  The min-count filter runs before
    the top-k so the TakeOrdered heap sees only supported pairs.

    Integer-overflow bound: 1e6 * c_xy * N must stay under 2^63, i.e.
    c_xy * N < 9.2e12 — holds through ~3M bigrams even for the hottest
    pair; past that, drop the 1e6 scale (or rescale to per-thousand) —
    lift ORDERING is unaffected because the divisor is per-pair."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    cxy = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    lx = cxy.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    rx = cxy.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    n = cxy.agg(F.sum("c_xy").alias("np"))
    return (
        cxy.join(F.broadcast(lx), "w1")
        .join(F.broadcast(rx), "w2")
        .crossJoin(F.broadcast(n))
        .filter(F.col("c_xy") >= PMI_MIN_COUNT)
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            F.expr("(1000000 * c_xy * np) div (c_x * c_y)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(
            F.desc("lift_ppm"), F.desc("c_xy"), "w1", "w2"
        )
        .limit(PMI_TOP_K)
    )


HRW_P = 2147483647  # Mersenne prime 2^31-1: m*m stays inside int64
HRW_SHARDS = 8


def _hrw_shard(n_shards: int) -> "Column":
    """Highest-random-weight (rendezvous) shard pick: argmax over shards
    of SQUARE((doc*K + s*40503) mod P) mod P, tie-break larger s — all
    array-side.  The squaring matters: any hash LINEAR in s makes the
    9 per-shard values one arithmetic progression mod M, whose argmax
    barely depends on the doc (measured: 0.2% movement instead of 1/9);
    the quadratic-residue scramble restores per-doc independence
    (measured: 10.5% movement, every move to the new shard)."""
    return F.sort_array(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_shards - 1)),
            lambda s: F.struct(
                (
                    (
                        (
                            (
                                F.col("doc_id") * 2654435761
                                + s.cast("long") * 40503
                            )
                            % HRW_P
                        )
                        * (
                            (
                                F.col("doc_id") * 2654435761
                                + s.cast("long") * 40503
                            )
                            % HRW_P
                        )
                    )
                    % HRW_P
                ).alias("hv"),
                s.cast("long").alias("s"),
            ),
        ),
        asc=False,
    )[0]["s"]


def rendezvous_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (HRW) hashing for shard assignment that is STABLE
    under resharding — the property mod-N sharding lacks: growing the
    fleet from S to S+1 moves only ~1/(S+1) of keys, and every key that
    moves, moves TO the new shard (never between old shards), so cache
    affinity / local state on the surviving shards is untouched.

    Emits each doc's shard under S=8 and S=9 plus the moved flag; the
    HRW invariant (moved => new shard) is pinned in a test, the full
    assignment by the DuckDB oracle.  Pure map-side projection — the
    argmax over shards is an array fold per row, no shuffle, no UDF."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return (
        docs.select(
            "doc_id",
            _hrw_shard(HRW_SHARDS).alias("shard8"),
            _hrw_shard(HRW_SHARDS + 1).alias("shard9"),
        )
        .withColumn(
            "moved", (F.col("shard8") != F.col("shard9")).cast("int")
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


VOCAB_TOP = 100


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary truncation report: the top-V words by corpus
    frequency with each word's cumulative corpus coverage in exact ppm —
    the table that answers 'how big must the vocab be to cover 95% of
    tokens?' before training a tokenizer.

    Scale shape: ONE (word) count shuffle over the token stream (map-
    side partial agg), then the top-V rides ``orderBy().limit()`` —
    the distributed TakeOrderedAndProject heap — so the vocabulary
    table is never globally sorted; the rank/cumsum window runs on the
    V survivors only (coverage at rank r sums rows above r, all of
    which survive the cut)."""
    docs = _docs(spark, sf_dir)
    uni = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    total = uni.agg(F.sum("cnt").alias("tot"))
    top = uni.orderBy(F.desc("cnt"), "word").limit(VOCAB_TOP)
    # tiny-window: ≤ VOCAB_TOP rows survive the TakeOrdered heap; the
    # cumulative coverage at rank r only sums rows ABOVE r, all of
    # which survive the limit, so the cumsum is unchanged
    w = Window.orderBy(F.desc("cnt"), "word")
    ranked = (
        top.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "cum",
            F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "word",
            "cnt",
            F.expr("(cum * 1000000) div tot").alias("coverage_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("rnk")
    )


MASK_P = 2147483647  # Mersenne 2^31-1 (square-mix, same as HRW)
MASK_ONE_IN = 20     # span-start rate: 1/20 of positions
MASK_SPAN = 3        # tokens per span -> ~15% masked, T5 defaults


def span_corruption_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption mask generation — the deterministic
    preprocessing a span-denoising pretraining run applies to every
    document: ~1/20 of token positions start a 3-token mask span
    (≈15% corruption), overlapping spans merge, and the whole mask is a
    pure function of (doc_id, position) so any worker, any retry, any
    engine regenerates the identical mask (no RNG state to ship).

    Position selection uses the square-mod-prime mix: a hash LINEAR in
    position degenerates to a fixed-stride comb (every 20th token —
    periodic, not noise-like; same failure mode as the HRW linear hash).

    All array-side per row: zero shuffle, scan-speed."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)

    def hsel(p):
        m = (F.col("doc_id") * 2654435761 + p.cast("long") * 40503) % MASK_P
        return ((m * m) % MASK_P) % MASK_ONE_IN == 0

    starts = F.filter(F.sequence(F.lit(1), n), hsel)
    masked = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(
                    starts,
                    lambda p: F.sequence(
                        p, F.least(p + (MASK_SPAN - 1), n)
                    ),
                )
            )
        )
    )
    n_spans = F.size(
        F.filter(masked, lambda p: ~F.array_contains(masked, p - 1))
    )
    return (
        docs.select(
            "doc_id",
            n.alias("n_tokens"),
            F.size(masked).alias("n_masked"),
            n_spans.alias("n_spans"),
            F.coalesce(
                F.try_element_at(masked, F.lit(1)), F.lit(0)
            ).alias("first_masked_pos"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "join", "filter")
BM25_TOP = 50


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed query — the search-engine
    scoring function over the same posting statistics the inverted-index
    builder emits: idf(t) = ln(1 + (N - df + .5)/(df + .5)), tf
    saturation k1=1.2, length normalization b=0.75 against the mean
    document length.

    Scale shape: tf rows exist only for (doc, query-term) pairs — the
    token explode is filtered to the query vocabulary BEFORE the count
    shuffle, so the aggregate is query-sized, not corpus-sized; df and
    avgdl are one tiny broadcast each; the final top-k is a TakeOrdered
    heap.  Scores round to 4 decimals (repo precedent for ln-based
    oracles: lm_perplexity)."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    base = docs.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("t")
    )
    hits = base.filter(F.col("t").isin(*BM25_QUERY))
    tf = hits.groupBy("doc_id", "t").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    n_df = hits.select("doc_id", "t").distinct().groupBy("t").agg(
        F.count("*").alias("df")
    )
    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    scored = (
        tf.join(F.broadcast(n_df), "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1
                    + (F.col("n") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(BM25_TOP)


DRIFT_TOP = 30


def term_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two corpus snapshots (here:
    even vs odd doc_id halves — in production yesterday's vs today's
    partition): per-term share of each snapshot in exact ppm, ranked by
    absolute share delta — the table a data-quality gate alerts on when
    a scraper change floods one template's vocabulary.

    Integer-exact: shares are (cnt * 1e6) div total per side; delta is
    their difference.  One (term, side) count shuffle, then a term-level
    pivot via conditional aggregation — no join between the sides."""
    docs = _docs(spark, sf_dir)
    toks = (
        docs.select(
            (F.col("doc_id") % 2 == 0).alias("is_a"),
            F.explode(F.split(F.lower("text"), " ")).alias("term"),
        )
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("cnt_b"),
    )
    tot = counts.agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    scored = counts.crossJoin(F.broadcast(tot)).select(
        "term",
        "cnt_a",
        "cnt_b",
        F.expr("(cnt_a * 1000000) div greatest(tot_a, 1)").alias(
            "share_a_ppm"
        ),
        F.expr("(cnt_b * 1000000) div greatest(tot_b, 1)").alias(
            "share_b_ppm"
        ),
    ).withColumn(
        "drift_ppm",
        F.abs(F.col("share_a_ppm") - F.col("share_b_ppm")),
    )
    return scored.orderBy(
        F.desc("drift_ppm"), "term"
    ).limit(DRIFT_TOP)


CONJ_QUERY = ("spark", "join", "filter")


def conjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-AND search via posting intersection — the other half of
    the inverted-index story next to BM25's ranked OR: a doc qualifies
    iff it contains EVERY query term.  Execution is the index way
    (filter the token stream to query terms, count distinct matched
    terms per doc, keep count == |query|), not a scan with
    LIKE-conjunctions: per-term postings are exactly what the shuffle
    carries, and the cheapest term bounds the candidate set the same
    way a real engine intersects smallest-df-first.  Emits per-doc
    per-term tf columns so the oracle checks the match structure, not
    just membership."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    hits = docs.select(
        "doc_id", F.explode(toks).alias("t")
    ).filter(F.col("t").isin(*CONJ_QUERY))
    per = hits.groupBy("doc_id").agg(
        F.countDistinct("t").alias("n_terms"),
        *[
            F.sum(F.when(F.col("t") == q, 1).otherwise(0)).alias(f"tf_{q}")
            for q in CONJ_QUERY
        ],
    )
    return (
        per.filter(F.col("n_terms") == len(CONJ_QUERY))
        .drop("n_terms")
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


NEXT_TOKEN_HEADS = 20
NEXT_TOKEN_K = 3


def bigram_next_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram transition table: for the NEXT_TOKEN_HEADS most frequent
    head words, their top NEXT_TOKEN_K followers with conditional
    probability in exact ppm — the count-based LM a data pipeline
    builds for perplexity filters and autocomplete baselines.

    Shape: one (w1, w2) count shuffle (shared with pmi_bigram_lift's
    plan), head marginals from the counted table, two vocabulary-sized
    window ranks — nothing corpus-sized past the first aggregate."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    cxy = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    heads = (
        cxy.groupBy("w1")
        .agg(F.sum("c_xy").alias("c_head"))
        .orderBy(F.desc("c_head"), "w1")
        .limit(NEXT_TOKEN_HEADS)
        .withColumn(
            "head_rank",
            F.row_number().over(
                # tiny-window: ≤ NEXT_TOKEN_HEADS rows post-TakeOrdered
                Window.orderBy(F.desc("c_head"), "w1")
            ),
        )
    )
    ranked = (
        cxy.join(F.broadcast(heads), "w1")
        .withColumn(
            "next_rank",
            F.row_number().over(
                Window.partitionBy("w1").orderBy(
                    F.desc("c_xy"), "w2"
                )
            ),
        )
        .filter(F.col("next_rank") <= NEXT_TOKEN_K)
    )
    return (
        ranked.select(
            "w1",
            F.col("head_rank").cast("int").alias("head_rank"),
            F.col("next_rank").cast("int").alias("next_rank"),
            "w2",
            "c_xy",
            "c_head",
            F.expr("(c_xy * 1000000) div c_head").alias("cond_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("head_rank", "next_rank")
    )


KN_DISCOUNT_MILLI = 750  # the standard 0.75 absolute discount, milli-counts


def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (Kneser & Ney,
    ICASSP 1995; Chen & Goodman, 1998) — the smoothing every
    count-based LM quality filter actually ships, because raw MLE
    bigrams assign zero to unseen continuations and over-trust
    boilerplate:

        P_KN(w2|w1) = max(c(w1,w2) - D, 0) / c(w1·)
                      + (D · N1+(w1·) / c(w1·)) · N1+(·w2) / N1+(··)

    with D = 0.75.  The continuation weight N1+(·w2) (how many DISTINCT
    heads precede w2) is what separates KN from plain backoff —
    'Francisco' is frequent but only ever follows 'San', so its continuation mass
    is tiny.  All arithmetic is integer fixed-point: counts in
    milli-units against ``KN_DISCOUNT_MILLI``, each of the two terms
    floor-divided to ppb separately (documented two-floor convention,
    identical in both engines), products widened to decimal(38,0) /
    hugeint so 10^12-scale counts cannot overflow bigint.  c(w1·) is
    the bigram-sum marginal (standard for interpolated KN), so the
    whole table derives from ONE bigram count.

    Scale shape: one (w1,w2) count shuffle (the same plan as
    pmi_bigram_lift / bigram_next_token), two vocabulary-sized
    marginal aggregates joined back on their keys, and a 1-row
    broadcast for the type total — nothing corpus-sized past the first
    aggregate, no windows at all."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    cxy = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    left = cxy.groupBy("w1").agg(
        F.sum("c_xy").alias("c_head"),
        F.count("*").alias("n1p_left"),
    )
    right = cxy.groupBy("w2").agg(F.count("*").alias("n1p_right"))
    types = cxy.agg(F.count("*").alias("n_types"))
    d = KN_DISCOUNT_MILLI
    return (
        cxy.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.col("c_head").cast("bigint").alias("c_head"),
            F.col("n1p_left").cast("bigint").alias("n1p_left"),
            F.col("n1p_right").cast("bigint").alias("n1p_right"),
            (
                F.expr(
                    f"cast(greatest(c_xy * 1000 - {d}, 0) as decimal(38,0))"
                    " * 1000000 div c_head"
                )
                + F.expr(
                    f"cast({d} as decimal(38,0)) * 1000000 * n1p_left"
                    " * n1p_right div (c_head * n_types)"
                )
            )
            .cast("bigint")
            .alias("p_kn_ppb"),
        )
        .repartition(1)
        .sortWithinPartitions("w1", "w2")
    )


CALIB_BUCKETS = 10


def quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration table: quality score bucketed into tenths
    (floor(score*10), score ∈ [0,1]) crossed with the shipped KEEP/DROP
    decision — the curve a curation team reads before moving a
    threshold ('bucket 3 keeps 40%: tightening to 0.4 drops these many
    docs').  Keep rate in exact ppm per bucket.

    Scale shape: both inputs are per-doc single rows (quality_score is
    map-side; curation_decision is the fused gate table), so the join is
    one co-partitioned doc_id shuffle and the rollup is <= 11 rows."""
    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.least(
            F.floor(F.col("quality") * CALIB_BUCKETS).cast("bigint"),
            F.lit(CALIB_BUCKETS - 1).cast("bigint"),
        ).alias("bucket"),
    )
    k = curation_decision(spark, sf_dir).select("doc_id", "keep")
    return (
        q.join(k, "doc_id")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_kept"),
        )
        .select(
            "bucket",
            "n_docs",
            F.col("n_kept").cast("bigint").alias("n_kept"),
            F.expr("(n_kept * 1000000) div n_docs").alias("keep_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("bucket")
    )


# ---------------------------------------------------------------------------
# Pareto-frontier (skyline) document selection
# ---------------------------------------------------------------------------


def pareto_frontier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query over (vocabulary richness, length): the documents no
    other document dominates on BOTH axes — the multi-criteria shortlist
    a curation team starts from when no single quality scalar is agreed
    (Borzsony et al., ICDE'01 skyline operator).

    Dominance: doc B dominates doc A iff
    ``(q_B > q_A and len_B >= len_A) or (q_B = q_A and len_B > len_A)``
    where q = distinct-token count and len = n_chars (both exact
    integers, so the frontier set is engine-exact).

    Scale shape: NOT the quadratic all-pairs dominance test.  The corpus
    collapses to one row per distinct q (max len per q — a partial-agg
    shuffle over at most |vocab-size| groups); a window over that TINY
    collapsed table computes ``best_len_above(q)`` = max len among
    strictly-higher q; the frontier test is then a broadcast join back
    to the unshuffled corpus.  Work is one map-side pass + one
    sketch-sized window, exactly the two-pass shape of
    ``length_outlier_filter``.  The same trick is the standard
    distributed skyline: grid-collapse, frontier-of-collapsed,
    broadcast-filter (at 100 TB the q domain stays bounded by the
    tokenizer vocabulary, not the corpus).
    """
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("bigint").alias("q"),
        F.col("n_chars").alias("len"),
    )
    per_q = scored.groupBy("q").agg(F.max("len").alias("max_len"))
    w = (
        # tiny-window: per-q collapsed table, bounded by |vocab| sizes
        Window.orderBy(F.desc("q"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    collapsed = per_q.select(
        "q",
        "max_len",
        F.coalesce(F.max("max_len").over(w), F.lit(-1)).alias(
            "best_len_above"
        ),
    )
    return (
        scored.join(F.broadcast(collapsed), "q")
        .filter(
            (F.col("best_len_above") < F.col("len"))
            & (F.col("max_len") <= F.col("len"))
        )
        .select(
            "doc_id",
            F.col("q").alias("distinct_tokens"),
            F.col("len").alias("n_chars"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup with document reconstruction
# ---------------------------------------------------------------------------

PARA_W = 10  # words per paragraph chunk


def paragraph_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at sub-document granularity with REASSEMBLY (the Lee
    et al., ACL'22 deduplicate-then-rebuild step): documents are split
    into consecutive ``PARA_W``-word paragraphs, every paragraph that
    already occurred earlier in the corpus (global first-occurrence
    order = min (doc_id, chunk_idx)) is dropped, and each document is
    rebuilt from its surviving paragraphs — so shared boilerplate
    disappears but the unique remainder of a partially-duplicated page
    SURVIVES, where whole-doc dedup would discard it entirely.

    Scale shape: chunking is a map-side posexplode; the survivor table
    is one groupBy on the content hash whose aggregate (min struct) is
    partial-aggregable, so the hot boilerplate paragraph collapses
    map-side instead of flooding one reducer; the keep-mark is an
    equi-join back on that hash (AQE skew-split handles the residual
    hot keys, same as the LSH bucket join); reassembly is one doc_id
    regroup.  Total work O(corpus words), three shuffles, no windows
    over data-sized partitions."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(PARA_W)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * PARA_W + 1, PARA_W), " "
        ),
    )
    chunks = docs.select(
        "doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk",
        F.md5("chunk").alias("h"),
    )
    surv = chunks.groupBy("h").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("first_occ")
    )
    marked = chunks.join(surv, "h").select(
        chunks["doc_id"],
        chunks["chunk_idx"],
        chunks["chunk"],
        (
            (F.col("first_occ.doc_id") == chunks["doc_id"])
            & (F.col("first_occ.chunk_idx") == chunks["chunk_idx"])
        ).alias("keep"),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("chunk_idx", "chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("text_dedup"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense ANN fused with reciprocal-rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al., SIGIR'09)
RRF_SCALE = 1_000_000_000  # contributions in integer parts-per-billion
HYBRID_TOP = 10


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID search — the modern retrieval default: the lexical BM25
    list and the dense cosine list fused by reciprocal-rank fusion,
    ``rrf(d) = Σ_lists 1/(k + rank_d)`` (Cormack et al., SIGIR'09),
    which needs NO score calibration between the incomparable BM25 and
    cosine scales — only ranks.  ``embeddings.vec_id`` indexes the same
    corpus as ``documents.doc_id`` (vec i is doc i's embedding), so the
    fusion key is the document id.

    Contributions are exact integers (``RRF_SCALE div (k + rank)``), so
    the fused ordering is engine-exact; documents found by only one
    retriever fuse with the other contribution = 0 (full outer join).

    Scale shape: both inputs are ALREADY top-k lists (BM25_TOP=50 and
    TOP_K=10 rows) — the fusion itself is sketch-sized work on two
    broadcastable lists; all corpus-sized effort lives inside the two
    retrievers, each already scale-shaped (query-vocab-filtered posting
    aggregate; broadcast-query brute scan with TakeOrdered)."""
    from ocr_spark.operators.similarity import brute_topk

    lex = bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        # tiny-window: ≤ BM25_TOP rows (bm25_topk ends in limit())
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .cast("bigint")
        .alias("lex_rank"),
    )
    sem = brute_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        # tiny-window: ≤ TOP_K rows (brute_topk ends in limit())
        .over(Window.orderBy(F.desc("cos"), "vec_id"))
        .cast("bigint")
        .alias("sem_rank"),
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
            (
                F.when(
                    F.col("lex_rank").isNotNull(),
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + lex_rank)"),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("sem_rank").isNotNull(),
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + sem_rank)"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("rrf_ppb"),
        )
    )
    top = fused.orderBy(F.desc("rrf_ppb"), "doc_id").limit(HYBRID_TOP)
    return top.select(
        F.row_number()
        # tiny-window: ≤ HYBRID_TOP rows post-TakeOrdered
        .over(Window.orderBy(F.desc("rrf_ppb"), "doc_id"))
        .cast("bigint")
        .alias("rank"),
        "doc_id",
        "lex_rank",
        "sem_rank",
        "rrf_ppb",
    )


# ---------------------------------------------------------------------------
# End-to-end training manifest: curate -> dedup -> pack, one declarative plan
# ---------------------------------------------------------------------------


def training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one declarative plan — what a user
    of this engine actually ships nightly: quality gates
    (`curation_decision`), near-dup survivor selection
    (`near_dup_clusters`), and GPT-style sequence packing
    (`sequence_pack`'s arithmetic) composed into a single DataFrame DAG
    whose output is the per-document training-shard manifest (which
    fixed-length sequences each surviving document occupies).

    Because every stage is declarative, Catalyst sees the WHOLE
    pipeline: the packing cumsum runs only over documents that passed
    both gates, scans are shared, and no intermediate corpus is
    materialized — the composition argument for building curation on a
    relational engine instead of chained batch scripts.

    Scale shape: the gate inputs are per-doc single-row tables (their
    own docstrings cover their shuffles); the fusion is two
    co-partitioned doc_id joins of collapsed rows; packing re-windows
    per source shard over the FILTERED stream (smaller than the corpus
    by the keep x survivor rate).  The oracle composes the component
    oracles verbatim as CTEs, so the end-to-end answer can never drift
    from the audited parts."""
    from ocr_spark.operators.dedup import near_dup_clusters

    keep = curation_decision(spark, sf_dir).select("doc_id", "keep")
    surv = near_dup_clusters(spark, sf_dir).select(
        "doc_id", "is_survivor"
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    shipped = (
        docs.join(keep, "doc_id")
        .join(surv, "doc_id")
        .filter((F.col("keep") == 1) & (F.col("is_survivor") == 1))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = shipped.withColumn("cum_end", F.sum("n_tokens").over(w))
    return (
        packed.select(*_pack_projection())
        .repartition(1)
        .sortWithinPartitions("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Site-template mining: most frequent paragraphs per source
# ---------------------------------------------------------------------------

TEMPLATE_TOP = 3
TEMPLATE_MIN_DOCS = 2


def source_template_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPLATE MINING — the discovery step behind boilerplate removal:
    per source (site), the paragraphs that repeat across the most
    documents (nav bars, footers, cookie banners all surface here), with
    their document-coverage in exact ppm.  Production pipelines mine
    this table periodically and feed the top rows to the line/paragraph
    strip stage; `paragraph_dedup_rebuild` then removes them globally.

    Scale shape: chunking is the same map-side posexplode as
    paragraph_dedup_rebuild; the frequency table is ONE partial-agg
    groupBy on (source, chunk-hash) — the hot template paragraph
    collapses map-side — and the top-k window runs over the collapsed
    (source, hash) table, orders of magnitude smaller than the corpus."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(PARA_W)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * PARA_W + 1, PARA_W), " "),
    )
    chunks = docs.select(
        "doc_id", "source", F.explode(chunk_arr).alias("chunk")
    )
    per_src_docs = docs.groupBy("source").agg(
        F.count("*").alias("n_docs")
    )
    freq = (
        chunks.select("source", "doc_id", "chunk")
        .distinct()  # coverage counts documents, not occurrences
        .groupBy("source", "chunk")
        .agg(F.count("*").alias("n_docs_with"))
        .filter(F.col("n_docs_with") >= TEMPLATE_MIN_DOCS)
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("n_docs_with"), "chunk"
    )
    return (
        freq.join(F.broadcast(per_src_docs), "source")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TEMPLATE_TOP)
        .select(
            "source",
            F.col("rank").cast("int").alias("rank"),
            "chunk",
            "n_docs_with",
            F.expr("(n_docs_with * 1000000) div n_docs").alias(
                "coverage_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("source", "rank")
    )


# ---------------------------------------------------------------------------
# Exact-proportion train/val/test split
# ---------------------------------------------------------------------------

SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # test = remainder


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic three-way split with EXACT per-source proportions —
    what a hash gate cannot give (hash splits only converge to 80/10/10
    in expectation; contractual splits need ranks): documents are
    ranked within their source by the portable multiplicative hash
    (pseudorandom but reproducible order), and the first 80% of ranks
    go to train, next 10% to val, rest to test — sizes exact to the
    floor-division boundary, stable across reruns and engines.

    Scale shape: one window rank per source shard (the shard is the
    parallel unit, same as sequence_pack) plus a broadcast of per-source
    counts; no global sort.  At 10^12 docs per-shard ranks are the
    two-pass bucketed cumsum if a single shard outgrows a task."""
    from ocr_spark.operators.relational import KMV_HASH_A, KMV_HASH_M

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    h = F.pmod(F.col("doc_id") * F.lit(KMV_HASH_A), F.lit(KMV_HASH_M))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id"))
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    ranked = docs.withColumn("rk", F.row_number().over(w)).join(
        F.broadcast(counts), "source"
    )
    split = (
        F.when(
            F.col("rk") <= F.expr(f"(n * {SPLIT_TRAIN_PCT}) div 100"),
            F.lit("train"),
        )
        .when(
            F.col("rk")
            <= F.expr(
                f"(n * {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT}) div 100"
            ),
            F.lit("val"),
        )
        .otherwise(F.lit("test"))
    )
    return (
        ranked.select(
            "doc_id", "source", split.alias("split")
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Incremental sequence packing (append-only continuation of shard streams)
# ---------------------------------------------------------------------------

PACK_BATCH_SPLIT_FRAC = 4  # batch = the last 1/4 of doc_ids


def sequence_pack_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-ONLY packing — the nightly-ingest property ``sequence_pack``
    alone doesn't give you: tonight's batch continues each shard's token
    stream from a tiny persisted state (per-shard total tokens so far)
    instead of re-packing the historical corpus.  Invariant (the whole
    point, pinned in tests and by the oracle): the incremental result
    equals the full re-pack restricted to the batch — offsets are
    append-stable, so yesterday's already-written training sequences
    never change.

    Corpus split is deterministic for the oracle: "history" = the first
    3/4 of doc_ids, "batch" = the rest.

    Scale shape: state is one row per shard (sum of token counts — a
    partial-agg over history at state-build time, O(shards) forever
    after); the nightly run windows ONLY the batch (cost O(batch), not
    O(corpus)) and broadcast-joins the state row."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    n = docs.count()
    split_id = n - n // PACK_BATCH_SPLIT_FRAC
    state = (
        docs.filter(F.col("doc_id") < split_id)
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("state_end"))
    )
    batch = docs.filter(F.col("doc_id") >= split_id)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        batch.join(F.broadcast(state), "source", "left")
        .withColumn(
            "cum_end",
            F.coalesce("state_end", F.lit(0))
            + F.sum("n_tokens").over(w),
        )
    )
    return (
        packed.select(*_pack_projection())
        .repartition(1)
        .sortWithinPartitions("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# Budget allocation: largest-remainder (Hamilton) apportionment
# ---------------------------------------------------------------------------

BUDGET_TOTAL = 10_000  # crawl/token budget units to apportion


def budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT budget apportionment across sources — the largest-remainder
    (Hamilton) method: each source gets ``floor(budget · share)`` seats,
    then the leftover seats go to the largest fractional remainders
    (ties to the smaller source name, deterministic).  This is how a
    fixed crawl/token budget is split proportionally so the per-source
    integers SUM EXACTLY to the budget — naive rounding over- or
    under-shoots, and a float share drifts between engines; remainders
    here are exact integers (``budget·tokens mod total``).

    Scale shape: one partial-agg groupBy to collapse the corpus to one
    row per source; everything after runs on the O(sources) table —
    the window ranking remainders touches sketch-sized data only."""
    docs = _docs(spark, sf_dir).select(
        "source", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    per_src = docs.groupBy("source").agg(
        F.sum("n_tokens").alias("tok")
    )
    tot = per_src.agg(F.sum("tok").alias("total"))
    base = (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tok",
            F.expr(f"({BUDGET_TOTAL} * tok) div total").alias("floor_alloc"),
            F.expr(f"({BUDGET_TOTAL} * tok) % total").alias("rem"),
        )
    )
    leftover = F.lit(BUDGET_TOTAL) - F.sum("floor_alloc").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    ranked = base.withColumn(
        "rem_rank",
        # tiny-window: one row per source (k sources), never the corpus
        F.row_number().over(Window.orderBy(F.desc("rem"), "source")),
    ).withColumn("leftover", leftover)
    return (
        ranked.select(
            "source",
            F.col("tok").cast("bigint").alias("tok"),
            (
                F.col("floor_alloc")
                + (F.col("rem_rank") <= F.col("leftover")).cast("bigint")
            )
            .cast("bigint")
            .alias("alloc"),
        )
        .repartition(1)
        .sortWithinPartitions("source")
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth curve
# ---------------------------------------------------------------------------

HEAPS_CHECKPOINTS = (1000, 2000, 5000, 10000, 20000, 50000)


def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve (Heaps' law): distinct terms seen after
    the first N tokens of the corpus stream, at fixed checkpoints — the
    corpus-linguistics diagnostic behind tokenizer sizing ("how much
    more vocab does 10x data buy") and dedup health (a flattening curve
    flags boilerplate flooding).

    Token stream order is deterministic: documents by doc_id, tokens by
    position; a term's FIRST-OCCURRENCE sequence number is
    ``min(global_seq)``; distinct-at-N is then a count of first
    occurrences ≤ N — exact integers, no windows over the token stream.

    Scale shape: the global token sequence uses per-document offsets
    from the two-pass bucketed cumsum (``bucketed_exclusive_cumsum`` —
    one grid-bucket shuffle over per-doc counts, never a
    single-partition sort), so tokens get their seq MAP-SIDE; the only
    token-volume shuffle is the min-per-term partial agg, and the
    checkpoint rollup runs on the vocabulary-sized table."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
    )
    counts = docs.select(
        "doc_id", F.size("toks").alias("n_tok")
    )
    from ocr_spark.operators.relational import bucketed_exclusive_cumsum

    offsets = bucketed_exclusive_cumsum(
        counts, "doc_id", "n_tok", "off"
    ).select("doc_id", "off")
    toks = (
        docs.join(offsets, "doc_id")
        .select(
            "off", F.posexplode("toks").alias("pos", "term")
        )
        .select((F.col("off") + F.col("pos") + 1).alias("seq"), "term")
    )
    first = toks.groupBy("term").agg(F.min("seq").alias("first_seq"))
    cps = spark.createDataFrame(
        [(c,) for c in HEAPS_CHECKPOINTS], "checkpoint bigint"
    )
    return (
        cps.join(
            first, F.col("first_seq") <= F.col("checkpoint"), "left"
        )
        .groupBy("checkpoint")
        .agg(F.count("term").alias("distinct_terms"))
        .repartition(1)
        .sortWithinPartitions("checkpoint")
    )


# ---------------------------------------------------------------------------
# Source-mix Shannon entropy
# ---------------------------------------------------------------------------


def source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity of the corpus source mix — Shannon entropy of the
    per-source document shares plus the normalized form H/ln(k) in
    [0,1]: the one-number answer to "is tonight's crawl still balanced
    or did one feed flood us", read next to `source_mix_rebalance`
    (which enforces a target mix) and `gini_concentration` (the value
    analog).  Single ln per source over the collapsed k-row table,
    round-6 (ln-oracle precedent).

    Scale shape: one partial-agg groupBy to k source rows; the entropy
    fold is over k numbers."""
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(F.count("*").alias("n"))
    tot = per.agg(
        F.sum("n").alias("tn"), F.count("*").alias("k")
    )
    terms = per.crossJoin(F.broadcast(tot)).select(
        "k",
        (
            -(F.col("n") / F.col("tn"))
            * F.log(F.col("n") / F.col("tn"))
        ).alias("term"),
    )
    return terms.groupBy("k").agg(
        F.round(F.sum("term"), 6).alias("entropy_nats"),
        # k=1 => ln(k)=0: define normalized entropy of a single-source
        # mix as 0.0 (no diversity) instead of 0/0
        F.when(
            F.col("k") > 1,
            F.round(
                F.sum("term") / F.log(F.col("k").cast("double")), 6
            ),
        ).otherwise(F.lit(0.0)).alias("entropy_normalized"),
    ).select(
        F.col("k").cast("bigint").alias("n_sources"),
        "entropy_nats",
        "entropy_normalized",
    )


# ---------------------------------------------------------------------------
# URL path-tree rollup
# ---------------------------------------------------------------------------

PATH_MIN_DOCS = 2


def url_path_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-structure rollup: page counts at every URL path PREFIX
    (the /section → /section/sub tree a crawl planner reads to budget
    depth).  Paths are synthesized deterministically from doc_id
    (`/cat{id%5}/sub{id%20}/page{id}` — same expression in the oracle);
    each page contributes one count to each of its ancestors.

    Scale shape: the prefix explode is map-side (depth is bounded by
    URL structure, ~3-10); the count is one partial-agg groupBy on the
    prefix key — hot prefixes (the root sections) collapse map-side."""
    docs = _docs(spark, sf_dir).select("doc_id")
    cat = F.concat(F.lit("/cat"), (F.col("doc_id") % 5).cast("string"))
    sub = F.concat(
        cat, F.lit("/sub"), (F.col("doc_id") % 20).cast("string")
    )
    page = F.concat(
        sub, F.lit("/page"), F.col("doc_id").cast("string")
    )
    prefixes = docs.select(
        F.posexplode(F.array(cat, sub, page)).alias("d", "prefix")
    ).select((F.col("d") + 1).alias("depth"), "prefix")
    return (
        prefixes.groupBy("depth", "prefix")
        .agg(F.count("*").alias("n_pages"))
        .filter(F.col("n_pages") >= PATH_MIN_DOCS)
        .select(
            F.col("depth").cast("int").alias("depth"),
            "prefix",
            F.col("n_pages").cast("bigint").alias("n_pages"),
        )
        .repartition(1)
        .sortWithinPartitions("depth", "prefix")
    )


# ---------------------------------------------------------------------------
# Quantile normalization across sources (batch-effect removal)
# ---------------------------------------------------------------------------


def quantile_normalize_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION of a per-document metric across sources —
    the batch-effect removal trick (ubiquitous in bioinformatics, and
    the right fix when one crawl source systematically inflates a
    signal): each document's length is replaced by the GLOBAL value at
    its within-source quantile, so every source ends up with the same
    marginal distribution and cross-source thresholds become fair.

    All-integer and engine-exact: within-source rank r of n_s maps to
    the global order statistic at rank ``ceil(r·N / n_s)`` (ties broken
    by doc_id on both sides).

    Scale shape: one rank window per source shard + the two-pass
    bucketed global rank (``bucketed_global_rank`` — bit-equal to a
    global window, no single-partition sort at 10^12 docs); the
    mapping join is on the computed rank key, uniform by
    construction."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    n_total = docs.count()
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    ranked = (
        docs.withColumn("r", F.row_number().over(ws))
        .join(F.broadcast(counts), "source")
        .withColumn(
            "g_target",
            F.expr(f"(r * {n_total} + n_s - 1) div n_s"),
        )
    )
    from ocr_spark.operators.relational import bucketed_global_rank

    glob = bucketed_global_rank(
        docs, "n_chars", "doc_id", rank_col="g"
    ).select("g", F.col("n_chars").alias("norm_chars"))
    return (
        ranked.join(glob, ranked["g_target"] == glob["g"])
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("norm_chars").cast("bigint").alias("norm_chars"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Distributed BPE merge training
# ---------------------------------------------------------------------------

BPE_ROUNDS = 6


def bpe_merges(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_ROUNDS
) -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al., ACL 2016),
    distributed: the tokenizer-training step of an LLM data pipeline.
    Each round counts adjacent symbol pairs across the corpus (weighted
    by word frequency), picks the most frequent pair (ties to the
    lexicographically smallest), and merges it everywhere; the output
    is the ordered merge table — the artifact a tokenizer ships.

    Execution shape (the kmeans_clusters pattern): the distinct-word
    frequency table is built once (one groupBy shuffle) and persisted;
    the per-round symbol state lives in a COLUMN EXPRESSION stack over
    it (each merge is one literal ``replace``), so a round costs one
    map-side pass plus one pair-count partial agg, and the winning pair
    travels through ``orderBy().limit(1)`` (TakeOrdered, distributed)
    into bounded driver state — never a corpus collect, never a global
    window.

    Symbol sequences are delimiter-framed strings (``|c|`` per symbol,
    so a pair boundary is ``||``): merging pair (a,b) is the literal
    non-overlapping left-to-right ``replace('|a||b|' -> '|ab|')``,
    which is exactly greedy BPE merge order — and exactly what the
    DuckDB oracle replays round by round (fold-vs-replace equivalence
    is pinned in tests).  Safe because the corpus alphabet cannot
    contain the frame char (whitespace-split words; fixture text is
    [a-zA-Z0-9])."""
    docs = _docs(spark, sf_dir)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
        .withColumn("s", F.regexp_replace("word", "(.)", r"|$1|"))
        .select("wc", "s")
        .persist()
    )
    out_schema = (
        "round int, left_sym string, right_sym string, merged string, "
        "pair_count long"
    )
    merges: list[tuple[int, str, str, str, int]] = []
    s_expr = F.col("s")
    syms = (
        "split(substring(cur, 2, length(cur) - 2), '\\\\|\\\\|')"
    )
    for rnd in range(1, rounds + 1):
        cur = words.select("wc", s_expr.alias("cur"))
        # adjacent pairs = zip of the array with its own 1-shift (slice
        # lengths clamp to 0 for single-symbol words — no index access)
        pairs = cur.select(
            "wc",
            F.explode(
                F.expr(
                    f"zip_with("
                    f"slice({syms}, 1, greatest(size({syms}) - 1, 0)),"
                    f"slice({syms}, 2, greatest(size({syms}) - 1, 0)),"
                    f"(a, b) -> struct(a as l, b as r))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(
                F.col("p.l").alias("left_sym"),
                F.col("p.r").alias("right_sym"),
            )
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word fully merged: nothing left to count
        l, r = top[0]["left_sym"], top[0]["right_sym"]
        merges.append((rnd, l, r, l + r, int(top[0]["pair_count"])))
        s_expr = F.replace(
            s_expr, F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|")
        )
    words.unpersist()
    return (
        spark.createDataFrame(merges, out_schema)
        .repartition(1)
        .sortWithinPartitions("round")
    )


def bpe_tokenize(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_ROUNDS
) -> DataFrame:
    """Apply a trained BPE merge table to the corpus: per document, the
    whitespace word count, char mass, post-merge token count, and the
    tokens-per-kchar compression — the number a pipeline watches to
    budget sequence packing and to spot tokenizer/corpus drift.

    The merge table is bpe_merges' bounded output (R rows, collected —
    the same driver-state shape as k-means centroids); applying it is R
    literal ``replace`` steps in merge order folded into ONE map-side
    expression stack over the exploded words, then a single per-doc
    aggregation shuffle.  Token count per word is read off the framed
    string arithmetically (each symbol contributes two frame chars) —
    no arrays materialized.  All integer; ppm with truncating div."""
    merges = [
        (r["left_sym"], r["right_sym"], r["merged"])
        for r in bpe_merges(spark, sf_dir, rounds=rounds).collect()
    ]
    docs = _docs(spark, sf_dir)
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    s = F.regexp_replace("word", "(.)", r"|$1|")
    for l, r, m in merges:
        s = F.replace(s, F.lit(f"|{l}||{r}|"), F.lit(f"|{m}|"))
    n_syms = (
        (F.length(s) - F.length(F.replace(s, F.lit("|"), F.lit(""))))
        / 2
    ).cast("long")
    return (
        w.select(
            "doc_id",
            F.length("word").alias("wl"),
            n_syms.alias("n_syms"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("wl").alias("n_chars"),
            F.sum("n_syms").alias("n_tokens"),
        )
        .withColumn(
            "tokens_per_kchar",
            F.expr("(n_tokens * 1000) div n_chars"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Hashed n-gram linear classifier inference (fastText-style)
# ---------------------------------------------------------------------------

NGC_BUCKETS = 1024  # feature-hash buckets (fastText's `-bucket`)
NGC_CLASSES = 4  # fixture label space
NGC_WRANGE = 2001  # weights uniform in [-1000, 1000]


def _ngc_weight(bucket, cls: int):
    """Weight of (bucket, class): md5-derived integer in [-1000, 1000].
    A REAL deployment broadcasts trained weights; deriving them from
    the same hash family keeps the fixture model engine-exact while
    exercising the identical inference plan."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ngw:"),
                        bucket.cast("string"),
                        F.lit(f":{cls}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % NGC_WRANGE
        - 1000
    )


def hashed_ngram_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style (Joulin et al., EACL'17) linear text classifier
    INFERENCE at corpus scale: every word unigram and adjacent bigram
    is feature-hashed into NGC_BUCKETS buckets, each bucket carries an
    integer weight per class, and a document's class scores are the
    sums of its grams' weights — argmax wins, ties to the smallest
    class id.  This is the model-inference-as-dataflow primitive a
    100 TB curation run uses for topic / quality / language routing:
    no Python in the loop, no weight table shuffled — scoring is pure
    map-side Catalyst expression work.

    The weight matrix here is the md5-derived fixture of `_ngc_weight`
    (deterministic, engine-exact); a production run swaps in trained
    weights via a broadcast join on `bucket` without touching the
    plan's shape.

    Scale shape: grams are built array-side (zip of two slices for the
    bigrams — no positional self-join), exploded, scored map-side, and
    collapsed by ONE partial-agg groupBy(doc_id) carrying the 4 class
    sums; the argmax + margin are projection-only.  One shuffle total,
    keyed on doc_id."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = docs.select(
        "doc_id", F.explode(F.concat(toks, bigrams)).alias("g")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ngc:"), F.col("g"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % NGC_BUCKETS
    )
    scored = grams.select("doc_id", bucket.alias("b"))
    agg = scored.groupBy("doc_id").agg(
        *[
            F.sum(_ngc_weight(F.col("b"), c)).alias(f"score_{c}")
            for c in range(NGC_CLASSES)
        ]
    )
    s = [F.col(f"score_{c}") for c in range(NGC_CLASSES)]
    predicted = (
        F.when((s[0] >= s[1]) & (s[0] >= s[2]) & (s[0] >= s[3]), 0)
        .when((s[1] >= s[2]) & (s[1] >= s[3]), 1)
        .when(s[2] >= s[3], 2)
        .otherwise(3)
        .cast("int")
    )
    ranked = F.array_sort(F.array(*s))
    return (
        agg.select(
            "doc_id",
            *[f"score_{c}" for c in range(NGC_CLASSES)],
            predicted.alias("predicted_class"),
            (
                F.element_at(ranked, NGC_CLASSES)
                - F.element_at(ranked, NGC_CLASSES - 1)
            ).alias("margin"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


def bpe_fertility(
    spark: SparkSession, sf_dir: str, rounds: int = BPE_ROUNDS
) -> DataFrame:
    """Tokenizer fertility per (source, lang): tokens-per-word (the
    'fertility' a multilingual pipeline watches — sources the tokenizer
    fragments badly burn sequence budget and under-train) and
    tokens-per-kchar, rolled up from the per-doc bpe_tokenize output.
    A source whose fertility_ppm drifts up between snapshots signals
    corpus contamination or tokenizer mismatch before loss curves do.

    Exactness: sums are integers; fertility_ppm is the exact rational
    (2n+d) div (2d) half-away; tokens_per_kchar keeps bpe_tokenize's
    truncating-div convention.

    Scale shape: bpe_tokenize's one expression-stack pass + per-doc
    shuffle, one doc_id equi-join against the (doc_id, source, lang)
    projection, then ONE partial-agg groupBy whose output is
    (source x lang)-domain-sized."""
    per_doc = bpe_tokenize(spark, sf_dir, rounds=rounds).select(
        "doc_id", "n_words", "n_chars", "n_tokens"
    )
    meta = _docs(spark, sf_dir).select("doc_id", "source", "lang")
    return (
        per_doc.join(meta, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "n_words",
            "n_chars",
            "n_tokens",
            F.expr(
                "(2 * cast(n_tokens as decimal(38,0)) * 1000000 + n_words)"
                " div (2 * n_words)"
            ).alias("fertility_ppm"),
            F.expr(
                "(cast(n_tokens as decimal(38,0)) * 1000) div n_chars"
            ).alias("tokens_per_kchar"),
        )
        .repartition(1)
        .sortWithinPartitions("source", "lang")
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain mixture reweighting (multiplicative weights)
# ---------------------------------------------------------------------------

DOREMI_ETA_PPM = 200_000  # MW step size 0.2
DOREMI_ROUNDS = 4


def doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture optimization in the DoReMi shape (Xie et al.,
    NeurIPS'23): per source domain, an excess-loss signal drives
    multiplicative-weights updates w <- w * (1 + eta * excess),
    renormalized each round, producing the sampling mixture the next
    training run uses.  The excess signal here is the deterministic
    corpus proxy ``(mean_chars - min) / (max - min)`` per source (a
    real run plugs per-domain proxy-vs-reference eval losses into the
    same column); the linearized MW update keeps every quantity an
    exact integer — no exp/log.

    Exactness: integer ppm weights throughout — uniform start
    ``1e6 div n_sources``, per-round multiplier ``1e6 + (eta_ppm *
    excess_ppm) div 1e6``, renormalization ``(v * 1e6) div sum(v)``
    (truncating div both engines); DOREMI_ROUNDS fixed rounds unrolled
    identically in the oracle.

    Scale shape: ONE corpus scan collapses to the source-domain stats
    table (partial-agg groupBy); every MW round is arithmetic on that
    tiny table plus a 1-row broadcast sum — the optimization loop costs
    nothing at any corpus size, the scan is the only data-sized term."""
    docs = _docs(spark, sf_dir)
    stats = docs.groupBy("source").agg(
        F.expr("sum(n_chars) div count(*)").alias("stat")
    )
    rng = stats.agg(
        F.min("stat").alias("lo"),
        F.max("stat").alias("hi"),
        F.count("*").alias("n_src"),
    )
    cur = (
        stats.crossJoin(F.broadcast(rng))
        .select(
            "source",
            F.expr(
                "((stat - lo) * 1000000) div greatest(hi - lo, 1)"
            ).alias("excess_ppm"),
            F.expr("1000000 div n_src").alias("w"),
        )
    )
    mult = f"(1000000 + ({DOREMI_ETA_PPM} * excess_ppm) div 1000000)"
    for _ in range(DOREMI_ROUNDS):
        v = cur.withColumn("v", F.expr(f"w * {mult}"))
        tot = v.agg(F.sum("v").alias("tv"))
        cur = (
            v.crossJoin(F.broadcast(tot))
            .select(
                "source",
                "excess_ppm",
                F.expr("(v * 1000000) div tv").alias("w"),
            )
        )
    return (
        cur.select("source", "excess_ppm", F.col("w").alias("weight_ppm"))
        .repartition(1)
        .sortWithinPartitions("source")
    )


# Gopher rule battery (Rae et al., arXiv:2112.11446, Appendix A /
# MassiveText quality filters), thresholds re-centered on this corpus
# so the gate produces a real pass/fail mix.
GOPHER_WORDS_MIN = 20
GOPHER_WORDS_MAX = 80
GOPHER_MEANLEN_MIN_PPM = 3_000_000  # mean word length in [3, 10]
GOPHER_MEANLEN_MAX_PPM = 10_000_000
GOPHER_TOPTOKEN_MAX_PPM = 120_000  # most-common token <= 12% of tokens
GOPHER_STOP_MIN = 2  # >= 2 distinct stopwords present
GOPHER_ALPHA_MIN_PPM = 800_000  # >= 80% purely alphabetic tokens
GOPHER_STOPLIST = ("a", "and", "of", "that", "the", "to", "with")


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style per-document quality-rule battery
    (Rae et al. 2021, Appendix A): named boolean rules — word-count
    band, mean-word-length band, most-common-token concentration,
    distinct-stopword floor, alphabetic-token floor — plus the AND of
    all of them as the keep gate.  Unlike ``quality_score`` (one scalar
    for ranking) this is the FILTER surface: each rule is reported
    separately so a curation run can attribute exactly why a document
    fell out, per the reference pipeline's per-field fail reasons
    (reference analog: obj_det gate predicates, `core/fields.py:36`).

    Exactness: every ratio is integer parts-per-million with floor
    division — no doubles anywhere, so the value-hash gate holds.

    Scale shape: 100% map-side — one parquet scan, per-row array ops
    (split / filter / transform / aggregate), zero shuffles and zero
    Python.  The top-token count deliberately avoids an explode +
    groupBy(doc_id, token) shuffle: it scans the (bounded-length)
    token array per distinct token map-side instead, which is O(L^2)
    in document length but O(0) in cluster communication — at 100 TB
    the network, not the per-row CPU, is the binding constraint."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    # `div` = exact integral floor division (a double quotient could
    # round across an integer boundary and disagree with the oracle)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda t: t == d)),
        )
    )
    stop_distinct = F.size(
        F.filter(
            F.array_distinct(toks), lambda t: t.isin(*GOPHER_STOPLIST)
        )
    )
    alpha_cnt = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$")))
    raw = docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        sum_len.cast("bigint").alias("sum_len"),
        top_cnt.cast("bigint").alias("top_cnt"),
        stop_distinct.cast("bigint").alias("stop_distinct"),
        alpha_cnt.cast("bigint").alias("alpha_cnt"),
    )
    out = raw.select(
        "doc_id",
        "n_words",
        F.expr("(sum_len * 1000000) div n_words").alias("meanlen_ppm"),
        F.expr("(top_cnt * 1000000) div n_words").alias("top_token_ppm"),
        "stop_distinct",
        F.expr("(alpha_cnt * 1000000) div n_words").alias("alpha_ppm"),
    ).select(
        "*",
        F.col("n_words").between(GOPHER_WORDS_MIN, GOPHER_WORDS_MAX)
        .alias("r_words"),
        F.col("meanlen_ppm").between(
            GOPHER_MEANLEN_MIN_PPM, GOPHER_MEANLEN_MAX_PPM
        ).alias("r_meanlen"),
        (F.col("top_token_ppm") <= GOPHER_TOPTOKEN_MAX_PPM)
        .alias("r_toptoken"),
        (F.col("stop_distinct") >= GOPHER_STOP_MIN).alias("r_stop"),
        (F.col("alpha_ppm") >= GOPHER_ALPHA_MIN_PPM).alias("r_alpha"),
    )
    keep = (
        F.col("r_words")
        & F.col("r_meanlen")
        & F.col("r_toptoken")
        & F.col("r_stop")
        & F.col("r_alpha")
    )
    return (
        out.withColumn("keep", keep)
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic global training-order shuffle (epoch shard assignment)
# ---------------------------------------------------------------------------

SHUFFLE_SHARD_DOCS = 64  # docs per training shard; at scale, size to shard bytes


def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pre-training epoch shuffle: assign every document a
    reproducible pseudo-random position in a GLOBAL training order and
    cut that order into fixed-size shards — what a trainer's data
    loader consumes.  The permutation key is the portable
    multiplicative hash (doc_id * A mod 2^32; A odd, so the map is a
    bijection below 2^32 — collisions only via the doc_id tie-break),
    which makes the shuffle deterministic across reruns, engines, and
    cluster sizes — unlike ``DataFrame.orderBy(rand())``, which is
    neither reproducible nor retry-stable.

    Scale shape: the global position comes from ``bucketed_global_rank``
    (grid-bucketed two-pass rank), so the corpus shuffles exactly once
    on the bucket key and NO single task ever sorts the whole input;
    shard_id / pos_in_shard are pure map-side arithmetic on the rank.
    At 10^12 docs raise RANK_BUCKETS so one bucket fits a task."""
    from ocr_spark.operators.relational import (
        KMV_HASH_A,
        KMV_HASH_M,
        bucketed_global_rank,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    keyed = docs.withColumn(
        "shuffle_key",
        F.pmod(F.col("doc_id") * F.lit(KMV_HASH_A), F.lit(KMV_HASH_M)),
    )
    ranked = bucketed_global_rank(
        keyed, "shuffle_key", "doc_id", rank_col="rk"
    )
    pos = F.col("rk") - 1
    return (
        ranked.select(
            "doc_id",
            "shuffle_key",
            pos.alias("global_pos"),
            F.expr(f"(rk - 1) div {SHUFFLE_SHARD_DOCS}").alias("shard_id"),
            (pos % SHUFFLE_SHARD_DOCS).alias("pos_in_shard"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# CCNet-style cross-corpus boilerplate chunk removal
# ---------------------------------------------------------------------------

BOILER_MIN_DOCS = 3  # a chunk repeated across >= this many docs is boilerplate


def boilerplate_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-threshold boilerplate removal (the CCNet line-dedup
    rule, Wenzek et al. LREC'20): a chunk that recurs across
    ``BOILER_MIN_DOCS`` or more DISTINCT documents is template noise
    (headers, footers, cookie banners) and is dropped from EVERY
    document — including its first occurrence, which is what separates
    this from ``paragraph_dedup_rebuild``'s keep-first rule: keep-first
    preserves one copy of the boilerplate; the frequency rule removes
    the template entirely while leaving genuinely rare text untouched.

    Scale shape: chunking is a map-side posexplode (the
    ``paragraph_dedup_rebuild`` chunker); the doc-frequency table is a
    two-level aggregate — distinct (hash, doc_id) first, so the hot
    boilerplate hash partially aggregates map-side, then a count per
    hash; the boiler mark rejoins on the hash equi-join (AQE skew-split
    absorbs the residual hot keys) and reassembly is one doc_id
    regroup.  No windows, O(corpus words) total work."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(PARA_W)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * PARA_W + 1, PARA_W), " "
        ),
    )
    chunks = docs.select(
        "doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk",
        F.md5("chunk").alias("h"),
    )
    freq = (
        chunks.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
    )
    boiler = freq.filter(F.col("nd") >= BOILER_MIN_DOCS).select(
        "h", F.lit(True).alias("is_boiler")
    )
    marked = chunks.join(boiler, "h", "left").select(
        "doc_id",
        "chunk_idx",
        "chunk",
        F.coalesce(F.col("is_boiler"), F.lit(False)).alias("is_boiler"),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.col("is_boiler").cast("bigint")).alias("n_boiler"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_boiler"),
                                F.struct("chunk_idx", "chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("text_kept"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Alpha-temperature language sampling budgets (XLM-R style)
# ---------------------------------------------------------------------------

TEMP_TOTAL_BUDGET = 100000  # docs drawn per epoch across all languages


def temperature_sampling_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multilingual temperature sampling at alpha = 0.5 (the XLM-R /
    mT5 recipe, Conneau et al. ACL'20): per-language draw probability
    p_l proportional to c_l^alpha, flattening the natural distribution so
    low-resource languages are upsampled relative to their share.  The
    weight c^0.5 is the EXACT integer square root (floor-sqrt with a
    +/-1 correction, so no dependence on libm rounding), and the fixed
    epoch budget is apportioned by largest remainder (Hamilton) —
    floor shares first, the leftover seats to the largest fractional
    remainders, ties to the lexicographically first language — so the
    budgets sum to TEMP_TOTAL_BUDGET exactly and are engine-exact.

    Scale shape: one per-language count aggregate (map-side partial,
    O(languages) rows out), then all arithmetic on the tiny language
    table; the two windows rank O(languages) rows.  The corpus is
    touched once and never shuffled."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    s0 = F.floor(F.sqrt(F.col("cnt").cast("double"))).cast("bigint")
    w = (
        s0
        + F.when((s0 + 1) * (s0 + 1) <= F.col("cnt"), 1).otherwise(0)
        - F.when(s0 * s0 > F.col("cnt"), 1).otherwise(0)
    )
    weighted = counts.select("lang", "cnt", w.alias("w"))
    tot = weighted.agg(
        F.sum("w").alias("wsum"), F.sum("cnt").alias("total")
    )
    base = weighted.crossJoin(F.broadcast(tot)).select(
        "lang",
        "cnt",
        "w",
        "total",
        F.expr(f"({TEMP_TOTAL_BUDGET} * w) div wsum").alias("base"),
        F.expr(f"({TEMP_TOTAL_BUDGET} * w) % wsum").alias("rem"),
    )
    spent = base.agg(F.sum("base").alias("spent"))
    ranked = base.crossJoin(F.broadcast(spent)).withColumn(
        "seat_rank",
        F.row_number().over(
            # tiny-window: O(languages) rows, never the corpus
            Window.orderBy(F.desc("rem"), F.asc("lang"))
        ),
    )
    budget = F.col("base") + F.when(
        F.col("seat_rank")
        <= F.lit(TEMP_TOTAL_BUDGET) - F.coalesce(F.col("spent"), F.lit(0)),
        1,
    ).otherwise(0)
    return (
        ranked.withColumn("budget", budget.cast("bigint"))
        .select(
            "lang",
            "cnt",
            "w",
            "budget",
            F.expr("(cnt * 1000000) div total").alias("natural_ppm"),
            F.expr(f"(budget * 1000000) div {TEMP_TOTAL_BUDGET}").alias(
                "sampled_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("lang")
    )


# ---------------------------------------------------------------------------
# Positional phrase search over the inverted index
# ---------------------------------------------------------------------------

PHRASE_QUERY = ("slow", "hash", "batch")  # the fixed 3-term test phrase


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase retrieval via positional posting-list joins — the
    inverted-index primitive BM25 cannot express (bag-of-words scoring
    finds co-occurrence; a phrase needs POSITIONS): term i of the
    phrase must appear at position p+i of the same document.  Emits one
    row per matching document with its occurrence count and first
    match position.

    Scale shape: the token posexplode is filtered to the query
    vocabulary BEFORE any shuffle (the bm25_topk convention — posting
    rows exist only for the 3 query terms, so the joined relations are
    query-sized, not corpus-sized), then two equi-joins on
    (doc_id, adjusted position) stitch adjacent terms.  No windows, no
    corpus shuffle."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    posting = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    ).filter(F.col("tok").isin(*PHRASE_QUERY))
    parts = [
        posting.filter(F.col("tok") == term).select(
            "doc_id", (F.col("pos") - i).alias("start")
        )
        for i, term in enumerate(PHRASE_QUERY)
    ]
    matches = parts[0]
    for nxt in parts[1:]:
        matches = matches.join(nxt, ["doc_id", "start"])
    return (
        matches.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("start").cast("bigint").alias("first_pos"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# T5-style span-corruption masking plan
# ---------------------------------------------------------------------------

CORRUPT_BLOCK = 20  # tokens per masking block
CORRUPT_SPAN = 3  # masked span length (T5 mean span)
CORRUPT_OFF_A = 2654435761  # per-(doc, block) offset hash
CORRUPT_OFF_B = 40503


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span-corruption masking (the T5 denoising
    objective, Raffel et al. JMLR'20): ~15% of tokens masked in
    mean-length-``CORRUPT_SPAN`` spans, each span replaced by a
    sentinel in the encoder input and emitted after its sentinel in
    the decoder target.  The T5 recipe samples spans randomly; at
    pipeline scale the mask must be a pure FUNCTION of (doc, position)
    — retry-stable, append-stable, engine-replayable — so each
    ``CORRUPT_BLOCK``-token block masks one span at a hashed in-block
    offset (one span per 20 tokens = the 15% rate), and the trailing
    partial block stays unmasked.

    Scale shape: entirely map-side string/array work on each document
    row (HOF transforms, no UDF, no shuffle but the check-gate sort);
    the mask plan never materializes positions — the corrupted input
    and target rebuild directly from slices."""
    docs = _docs(spark, sf_dir)
    a, b_, blk, spn = (
        CORRUPT_OFF_A,
        CORRUPT_OFF_B,
        CORRUPT_BLOCK,
        CORRUPT_SPAN,
    )
    off_max = blk - spn + 1
    toks = "split(text, ' ')"
    n = f"size({toks})"
    n_blocks = f"({n} div {blk})"
    off = f"((doc_id * {a} + b * {b_}) % {off_max})"
    pre = f"array_join(slice({toks}, b * {blk} + 1, {off}), ' ')"
    post = (
        f"array_join(slice({toks}, b * {blk} + {off} + {spn} + 1,"
        f" {blk} - {off} - {spn}), ' ')"
    )
    sentinel = "concat('<extra_id_', cast(b as string), '>')"
    block_piece = (
        f"array_join(filter(array({pre}, {sentinel}, {post}),"
        " x -> x != ''), ' ')"
    )
    remainder = (
        f"array_join(slice({toks}, {n_blocks} * {blk} + 1,"
        f" {n} - {n_blocks} * {blk}), ' ')"
    )
    corrupted = (
        "array_join(filter(concat(transform(sequence(0,"
        f" {n_blocks} - 1), b -> {block_piece}), array({remainder})),"
        " x -> x != ''), ' ')"
    )
    masked_span = (
        f"array_join(slice({toks}, b * {blk} + {off} + 1, {spn}), ' ')"
    )
    target = (
        f"array_join(transform(sequence(0, {n_blocks} - 1),"
        f" b -> concat({sentinel}, ' ', {masked_span})), ' ')"
    )
    return (
        docs.select(
            "doc_id",
            F.expr(n).cast("bigint").alias("n_tokens"),
            F.expr(n_blocks).cast("bigint").alias("n_blocks"),
            F.expr(f"{n_blocks} * {spn}").cast("bigint").alias("n_masked"),
            F.expr(
                f"case when {n} > 0 then ({n_blocks} * {spn} * 1000000)"
                f" div {n} else 0 end"
            ).alias("masked_ppm"),
            F.expr(f"case when {n_blocks} > 0 then {corrupted}"
                   " else text end").alias("corrupted"),
            F.expr(f"case when {n_blocks} > 0 then {target}"
                   " else '' end").alias("target"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose, Engel, Cramer & Cowley, 2010)
# ---------------------------------------------------------------------------

RAKE_MAX_PHRASE = 4  # candidate phrases longer than this are discarded
RAKE_TOP_K = 3  # keywords emitted per document
RAKE_STOP_N = 10  # generated stoplist: top-N corpus tokens by frequency


def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE — Rapid Automatic Keyword Extraction (Rose et al., in
    'Text Mining: Applications and Theory', 2010) with the paper's
    GENERATED stoplist (its §1.2.3: on corpora whose function words
    are not English's, the delimiter list is built from the corpus
    itself): delimiters are the RAKE_STOP_N most frequent word tokens
    (freq desc, token asc ties) plus the static en stopwords plus every
    punctuation run; candidate phrases are the maximal delimiter-free
    token runs; each word scores deg(w)/freq(w) per document (freq =
    occurrences in that doc's candidates, deg = sum of the lengths of
    the phrases those occurrences sit in, self included); a phrase
    scores the sum of its word scores and each document keeps its
    RAKE_TOP_K best (score desc, phrase asc).

    Engine-exactness: word scores are half-away integer ppm, phrase
    scores sum those rounded ppms, and the stoplist cut is a fully
    ordered TakeOrdered — integral everywhere, deterministic ties.

    Scale shape: pass 1 (stoplist) is one partial-agg token count and
    a distributed orderBy().limit(N) — a TakeOrderedAndProject, never
    a single-task window — whose N-row result BROADCASTS onto the
    token stream; pass 2 segments runs with a per-DOCUMENT window
    cumsum over is_stop (partition cardinality = doc length, bounded),
    then freq/deg is a (doc, word) partial-agg groupBy, the phrase
    score one (doc, word) equi-join back, and top-K a per-document
    window.  No corpus-cardinality sort anywhere."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "regexp_extract_all(lower(text),"
                " '[a-z0-9]+|[^a-z0-9 ]+', 0)"
            )
        ).alias("pos", "tok"),
    )
    is_word = F.col("tok").rlike("^[a-z0-9]+$")
    gen_stop = (
        tok.where(is_word)
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(RAKE_STOP_N)
        .select("tok", F.lit(True).alias("gen_stop"))
    )
    static_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    flagged = tok.join(F.broadcast(gen_stop), "tok", "left").select(
        "doc_id",
        "pos",
        "tok",
        (
            F.coalesce(F.col("gen_stop"), F.lit(False))
            | ~is_word
            | F.array_contains(static_stop, F.col("tok"))
        ).alias("is_stop"),
    )
    wseg = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seg = flagged.withColumn(
        "seg_id", F.sum(F.col("is_stop").cast("int")).over(wseg)
    )
    phr = (
        seg.where(~F.col("is_stop"))
        .groupBy("doc_id", "seg_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ).alias("words")
        )
        .where(F.size("words").between(1, RAKE_MAX_PHRASE))
        .select("doc_id", "words")
    )
    occ = phr.select(
        "doc_id", F.size("words").alias("plen"),
        F.explode("words").alias("w"),
    )
    wscore = occ.groupBy("doc_id", "w").agg(
        F.expr(
            "(2 * sum(plen) * cast(1000000 as bigint) + count(*))"
            " div (2 * count(*))"
        ).alias("w_ppm")
    )
    cand = (
        phr.select(
            "doc_id", F.array_join("words", " ").alias("phrase"), "words"
        )
        .dropDuplicates(["doc_id", "phrase"])
        .select(
            "doc_id", "phrase", F.size("words").alias("n_words"),
            F.explode("words").alias("w"),
        )
    )
    scored = (
        cand.join(wscore, ["doc_id", "w"])
        .groupBy("doc_id", "phrase", "n_words")
        .agg(F.sum("w_ppm").alias("score_ppm"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("phrase")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= RAKE_TOP_K)
        .select("doc_id", "rank", "phrase", "n_words", "score_ppm")
        .repartition(1)
        .sortWithinPartitions("doc_id", "rank")
    )


# ---------------------------------------------------------------------------
# TextTiling topic segmentation (Hearst, CL 23(1), 1997)
# ---------------------------------------------------------------------------

TS_BLOCK = 10  # tokens per pseudo-sentence block (paper's w)
TS_WIN = 2  # blocks per comparison window each side (paper's k)
TS_CUT_PPB = 200_000_000  # fixed depth cutoff (the paper's LC variant)


def texttiling_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling topic-boundary detection (Hearst, Computational
    Linguistics 23(1), 1997): tokens group into TS_BLOCK-token
    pseudo-sentence blocks; every gap g between blocks compares the
    term vectors of the TS_WIN blocks before vs after via cosine; a
    gap's DEPTH is how far its similarity dips below both neighbors;
    gaps deeper than a cutoff are topic boundaries — the lexical-
    cohesion segmenter a chunking / RAG pipeline runs before packing
    (doc_chunk_overlap cuts by length; this cuts where the TOPIC
    changes).

    Two documented deviations keep the contract integer-exact: the
    similarity is cosine SQUARED in half-away ppb (dot^2 * 1e9 /
    (|l|^2 |r|^2) — no sqrt; squaring is monotone on [0,1] so peak
    structure is preserved), and depth uses the immediate lag/lead
    neighbors with a FIXED cutoff (the paper's LC low-cut variant)
    instead of the hill-climb + mean-sigma rule, which needs sqrt
    again.

    Scale shape: block counts are one map-side posexplode + partial
    agg; each block fans out to its <= 2*TS_WIN gap memberships
    ARRAY-side (an equi-join key, never a range join); dot/norms are
    (doc, gap, term) partial aggs; lag/lead run in windows partitioned
    BY DOCUMENT — per-partition cardinality is the doc's gap count,
    never the corpus."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
    )
    blk = (
        tok.select(
            "doc_id", F.expr(f"pos div {TS_BLOCK}").alias("b"), "term"
        )
        .groupBy("doc_id", "b", "term")
        .agg(F.count("*").alias("cnt"))
    )
    nblk = blk.groupBy("doc_id").agg((F.max("b") + 1).alias("nblk"))
    lft = blk.select(
        "doc_id",
        F.explode(F.expr(f"sequence(b + 1, b + {TS_WIN})")).alias("g"),
        "term",
        "cnt",
    )
    rgt = blk.select(
        "doc_id",
        F.explode(F.expr(f"sequence(b - {TS_WIN} + 1, b)")).alias("g"),
        "term",
        "cnt",
    )
    lv = lft.groupBy("doc_id", "g", "term").agg(F.sum("cnt").alias("lc"))
    rv = rgt.groupBy("doc_id", "g", "term").agg(F.sum("cnt").alias("rc"))
    valid = nblk.where(F.col("nblk") >= 2 * TS_WIN).select(
        "doc_id",
        F.explode(
            F.expr(f"sequence({TS_WIN}, nblk - {TS_WIN})")
        ).alias("g"),
    )
    na = lv.groupBy("doc_id", "g").agg(
        F.sum(F.col("lc") * F.col("lc")).alias("na")
    )
    nb = rv.groupBy("doc_id", "g").agg(
        F.sum(F.col("rc") * F.col("rc")).alias("nb")
    )
    dot = (
        lv.join(rv, ["doc_id", "g", "term"])
        .groupBy("doc_id", "g")
        .agg(F.sum(F.col("lc") * F.col("rc")).alias("dot"))
    )
    c = (
        valid.join(na, ["doc_id", "g"])
        .join(nb, ["doc_id", "g"])
        .join(dot, ["doc_id", "g"], "left")
        .select(
            "doc_id",
            "g",
            F.expr(
                "(2 * coalesce(dot, 0) * coalesce(dot, 0) * 1000000000"
                " + na * nb) div (2 * na * nb)"
            ).alias("cos2_ppb"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("g")
    depth = (
        F.coalesce(F.lag("cos2_ppb").over(w), F.col("cos2_ppb"))
        - F.col("cos2_ppb")
    ) + (
        F.coalesce(F.lead("cos2_ppb").over(w), F.col("cos2_ppb"))
        - F.col("cos2_ppb")
    )
    return (
        c.withColumn("depth_ppb", depth)
        .select(
            "doc_id",
            F.col("g").cast("int").alias("gap"),
            "cos2_ppb",
            "depth_ppb",
            (F.col("depth_ppb") >= TS_CUT_PPB).cast("int").alias(
                "is_boundary"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id", "gap")
    )


# ---------------------------------------------------------------------------
# Good-Turing frequency smoothing (Good, Biometrika 1953)
# ---------------------------------------------------------------------------


def good_turing_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple Good-Turing counts-of-counts over corpus bigrams (Good,
    Biometrika 40:237, 1953): for every observed frequency r, N_r =
    how many distinct bigrams occur exactly r times, and the adjusted
    count r* = (r+1) * N_(r+1) / N_r — the estimator Katz backoff and
    the unseen-mass bound (p_unseen = N_1 / N) are built on, and the
    third smoothing view next to kneser_ney_bigram (continuation
    counts) and lm_perplexity (add-k).  Emitted in half-away ppm;
    where N_(r+1) = 0 the simple estimator is undefined and r*_ppm is
    emitted as 0 (the paper's smoothed-N_r refinement needs a log-log
    regression, out of the integer contract — documented, not faked).

    Scale shape: bigrams build ARRAY-side per doc (slice windows, no
    positional self-join); gram counts are one partial-agg groupBy
    (the only corpus-sized shuffle); counts-of-counts collapses that
    to O(distinct r) rows, and the N_(r+1) lookup is a self equi-join
    on the tiny spectrum table."""
    docs = _docs(spark, sf_dir)
    grams = docs.select(
        F.explode(
            F.expr(
                # sequence(1, 0) DESCENDS in Spark, so short docs need
                # an explicit empty-array branch, not a clamped bound
                "case when size(split(text, ' ')) >= 2 then"
                " transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 2)))"
                " else cast(array() as array<string>) end"
            )
        ).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count("*").alias("r"))
    nr = counts.groupBy("r").agg(F.count("*").alias("n_r"))
    nr1 = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        nr.join(nr1, "r", "left")
        .select(
            "r",
            "n_r",
            F.coalesce("n_r1", F.lit(0)).alias("n_r1"),
            F.expr(
                "case when n_r1 is null or n_r1 = 0 then 0 else"
                " (2 * (r + 1) * n_r1 * cast(1000000 as bigint) + n_r)"
                " div (2 * n_r) end"
            ).alias("r_star_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("r")
    )


# ---------------------------------------------------------------------------
# Chi-squared feature selection (Yang & Pedersen, ICML 1997)
# ---------------------------------------------------------------------------

CHI2_TOP_K = 3  # strongest terms kept per class


def chi2_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class chi-squared term selection (Yang & Pedersen, ICML'97
    — their CHI consistently beat MI and term strength): for every
    (lang, term), the 2x2 presence table a/b/c/d over documents and
    chi2 = n (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — the classic
    feature screen before training the fastText-style quality/lang
    classifier (hashed_ngram_classify), surfacing the vocabulary that
    actually separates a class.  Each class keeps its CHI2_TOP_K terms
    (chi2 desc, term asc).

    Integer-exact: all four marginals are int64 counts and chi2 is
    emitted in half-away MILLI-units — n (ad-bc)^2 * 1000 stays under
    2^63 up to ~10^5 docs; past that the numerator lifts to
    decimal(38,0) (documented bound, the feature_correlation policy).
    chi2 is nonnegative, so no sign decomposition is needed.

    Scale shape: document term PRESENCE is one map-side
    array_distinct explode; (class, term) counts, term totals, and
    class totals are three partial-agg groupBys, the two small ones
    broadcast back; the top-K window partitions BY CLASS (partition
    cardinality = per-class vocabulary — bounded by the lexicon, and
    the salted two-phase window is the drop-in if a web-scale lexicon
    makes a class partition hot)."""
    docs = _docs(spark, sf_dir)
    pres = docs.select(
        "lang",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias(
            "term"
        ),
    )
    a_tab = pres.groupBy("lang", "term").agg(F.count("*").alias("a"))
    tw = pres.groupBy("term").agg(F.count("*").alias("tw"))
    gd = docs.groupBy("lang").agg(F.count("*").alias("gd"))
    n = docs.count()
    # ALL (class, term) pairs — a term ABSENT from a class (a = 0) is
    # exactly as informative as one confined to it (chi2 is symmetric
    # in presence/absence), so the grid is vocab x classes, not just
    # the observed pairs
    cells = (
        tw.crossJoin(F.broadcast(gd))
        .join(a_tab, ["lang", "term"], "left")
        .na.fill({"a": 0})
        .select(
            "lang",
            "term",
            "a",
            (F.col("tw") - F.col("a")).alias("b"),
            (F.col("gd") - F.col("a")).alias("c"),
            (F.lit(n) - F.col("gd") - (F.col("tw") - F.col("a"))).alias(
                "d"
            ),
        )
    )
    chi2 = cells.select(
        "lang",
        "term",
        F.col("a").alias("df_in_class"),
        F.expr(
            f"case when (a+b) * (c+d) * (a+c) * (b+d) = 0 then 0 else"
            f" (2 * {n} * (a*d - b*c) * (a*d - b*c)"
            f" * cast(1000 as bigint) + (a+b) * (c+d) * (a+c) * (b+d))"
            f" div (2 * (a+b) * (c+d) * (a+c) * (b+d)) end"
        ).alias("chi2_milli"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("chi2_milli").desc(), F.col("term")
    )
    return (
        chi2.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= CHI2_TOP_K)
        .select("lang", "rank", "term", "df_in_class", "chi2_milli")
        .repartition(1)
        .sortWithinPartitions("lang", "rank")
    )


# ---------------------------------------------------------------------------
# Flesch readability (Flesch 1948; Kincaid et al. 1975)
# ---------------------------------------------------------------------------

FRE_EASY_MILLI = 70_000  # FRE >= 70: 'easy' (7th-grade) band
FRE_STANDARD_MILLI = 50_000  # FRE >= 50: 'standard'; below: 'difficult'


def flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring — Flesch Reading Ease (Flesch, J. Appl.
    Psych. 1948: 206.835 − 1.015·words/sentence − 84.6·syllables/word)
    and the Flesch-Kincaid grade level (Kincaid et al., NTIS 1975:
    0.39·w/s + 11.8·y/w − 15.59), the filter every readability-tiered
    corpus mix (textbook-grade vs web-grade) buckets on.

    Counts are pure regex: words = `[a-z]+` runs of the lowercased
    text, sentence breaks = `[.!?]+` runs (min 1), syllables ≈ vowel
    GROUPS `[aeiouy]+` (the classic dictionary-free proxy; monotone
    with true syllable count on English text).  Scores are exact
    integer MILLI-units with each rational term truncated once
    ((1015·w) div s is 1.015·w/s in millis — same trunc div both
    engines, all terms nonnegative so trunc == floor), so there is no
    float anywhere and the band thresholds are exact.

    Scale shape: map-side only — three regexp_extract_all counts and
    integer arithmetic per row, zero shuffles before the report tail;
    at 10^12 docs this is a single scan stage that pipelines into
    whatever consumes the band column."""
    docs = _docs(spark, sf_dir)
    lt = F.lower(F.col("text"))
    w = F.greatest(
        F.size(F.regexp_extract_all(lt, F.lit("[a-z]+"), F.lit(0))),
        F.lit(1),
    ).cast("bigint")
    s = F.greatest(
        F.size(F.regexp_extract_all(lt, F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("bigint")
    y = F.size(
        F.regexp_extract_all(lt, F.lit("[aeiouy]+"), F.lit(0))
    ).cast("bigint")
    fre = (
        F.lit(206_835)
        - F.expr("(1015 * _w) div _s")
        - F.expr("(84600 * _y) div _w")
    )
    fk = (
        F.expr("(390 * _w) div _s")
        + F.expr("(11800 * _y) div _w")
        - F.lit(15_590)
    )
    return (
        docs.select(
            "doc_id",
            w.alias("_w"),
            s.alias("_s"),
            y.alias("_y"),
        )
        .select(
            "doc_id",
            F.col("_w").alias("n_words"),
            F.col("_s").alias("n_sentences"),
            F.col("_y").alias("n_syllable_groups"),
            fre.alias("fre_milli"),
            fk.alias("fk_grade_milli"),
        )
        .withColumn(
            "band",
            F.when(F.col("fre_milli") >= FRE_EASY_MILLI, F.lit("easy"))
            .when(
                F.col("fre_milli") >= FRE_STANDARD_MILLI,
                F.lit("standard"),
            )
            .otherwise(F.lit("difficult")),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency power-law fit (Zipf 1949; exact bit-length logs)
# ---------------------------------------------------------------------------


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the corpus vocabulary's Zipf exponent — the one-number
    health check on a text corpus's naturalness (natural language sits
    near slope −1; boilerplate-flooded or template-heavy crawls bend
    it): least-squares slope of log2(freq) against log2(rank) over the
    full rank-frequency table.

    Exactness trick: the logs are EXACT INTEGER bit lengths
    (floor(log2(x)) = length(bin(x)) − 1 — pure string length of the
    binary form, no libm, so there is no transcendental to disagree
    across engines); the least-squares normal equations run in
    decimal(38,0) (n·Σxy − Σx·Σy overflows bigint once vocab crosses
    ~10^9 terms), the slope reports as sign-decomposed trunc-div
    millis, and R² — whose cross-product square exceeds decimal(38) —
    is a double computed from bit-identical integer inputs with one
    terminal round-6 (the rocchio/cosine precedent).

    Scale shape: one token-count shuffle (map-side partial agg), ranks
    from the two-pass ``bucketed_global_rank`` grid (never a
    single-partition sort of the vocabulary), then ONE five-sum
    partial agg collapses everything to a 1-row report."""
    from ocr_spark.operators.relational import bucketed_global_rank

    docs = _docs(spark, sf_dir)
    uni = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = bucketed_global_rank(
        uni, "cnt", "word", descending=True, rank_col="rank"
    ).select(
        F.expr("length(bin(rank)) - 1").alias("x"),
        F.expr("length(bin(cnt)) - 1").alias("y"),
    )
    d38 = "decimal(38,0)"
    sums = ranked.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.expr(
            "case when n < 2 or n * sxx - sx * sx = 0 then null else"
            " cast(case when n * sxy - sx * sy < 0"
            "  then -((-(n * sxy - sx * sy) * 1000)"
            "         div (n * sxx - sx * sx))"
            "  else ((n * sxy - sx * sy) * 1000)"
            "       div (n * sxx - sx * sx) end as bigint) end"
        ).alias("slope_milli"),
        F.expr(
            "case when n < 2 or n * sxx - sx * sx = 0"
            " or n * syy - sy * sy = 0 then null else"
            " round(cast(n * sxy - sx * sy as double)"
            "       * cast(n * sxy - sx * sy as double)"
            "       / (cast(n * sxx - sx * sx as double)"
            "          * cast(n * syy - sy * sy as double)), 6) end"
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Policy-lexicon scoring with obfuscation normalization (UT1-style stage)
# ---------------------------------------------------------------------------

POLICY_LEXICON = ("slow", "dup", "big")
# leet-speak folding: the five standard substitution characters, both
# engines fold with the same 1:1 translate
LEET_FROM = "0@315"
LEET_TO = "oaeis"
POLICY_RATE_MILLI = 40  # flag at >= 4% lexicon-token rate or >= 2 terms


def policy_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocklist stage every web-corpus pipeline runs (UT1 /
    LDNOOBW-style term lists): per document, lexicon-token hits AFTER
    obfuscation folding — leet substitutions (0->o, @->a, 3->e, 1->i,
    5->s) are folded with a 1:1 ``translate`` before matching, so
    's l 0 w'-style evasion scores the same as the plain term.

    The fixture corpus is clean, so evasion is SYNTHESIZED in-query
    (the homoglyph_dedup pattern): every doc_id % 5 == 1 document is
    leet-obfuscated first, and the scorer must see through it — its
    score must equal the un-obfuscated twin's.

    Flag rule, all integer: rate_milli = hits * 1000 div tokens;
    flagged when rate >= POLICY_RATE_MILLI or >= 2 distinct terms.

    Scale shape: pure per-row Catalyst string/array expressions — no
    shuffle but the output-ordering tail, no UDF, no join; the lexicon
    is a literal array (broadcast-free)."""
    lex = ", ".join(f"'{t}'" for t in POLICY_LEXICON)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            "doc_id",
            (F.col("doc_id") % 5 == 1).cast("int").alias("obfuscated"),
            F.when(
                F.col("doc_id") % 5 == 1,
                F.translate("text", LEET_TO, LEET_FROM),
            )
            .otherwise(F.col("text"))
            .alias("wire_text"),
        )
        .select(
            "doc_id",
            "obfuscated",
            F.expr(
                f"filter(split(translate(wire_text, '{LEET_FROM}',"
                f" '{LEET_TO}'), ' '), t -> t != '')"
            ).alias("toks"),
        )
        .select(
            "doc_id",
            "obfuscated",
            F.expr(
                f"filter(toks, t -> array_contains(array({lex}), t))"
            ).alias("hits_arr"),
            F.size("toks").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "obfuscated",
            F.size("hits_arr").cast("bigint").alias("hits"),
            F.size(F.array_distinct("hits_arr"))
            .cast("bigint")
            .alias("distinct_terms"),
            F.expr(
                "case when n_tokens = 0 then cast(0 as bigint)"
                " else cast(size(hits_arr) * 1000 div n_tokens as bigint)"
                " end"
            ).alias("rate_milli"),
        )
        .withColumn(
            "flagged",
            (
                (F.col("rate_milli") >= POLICY_RATE_MILLI)
                | (F.col("distinct_terms") >= 2)
            ).cast("int"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


def distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity per source — distinct-1/2/3 (Li et al.
    NAACL'16): the share of unigram/bigram/trigram OCCURRENCES that are
    unique types, in exact ppm.  The standard cheap monitor for
    template collapse in synthetic/augmented corpora: a source whose
    generator loops emits many tokens but few types, and distinct-n
    falls before perplexity notices.

    Scale shape: n-grams explode map-side from each document alone
    (no joins); each (source, n) slice needs one distinct-count and
    one count — both map-side-combining aggregates on the same
    (source, n, gram) shuffle key; output is sources x 3 rows.  The
    ppm ratio is integer trunc-div of two counts."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "source",
        F.expr("filter(split(lower(text), ' '), t -> t != '')").alias(
            "toks"
        ),
    )
    grams = toks.select(
        "source",
        F.explode(
            F.flatten(
                F.array(
                    *[
                        F.expr(
                            f"transform(sequence(1, greatest(0,"
                            f" size(toks) - {n} + 1)), i ->"
                            f" struct({n} as n, array_join(slice(toks, i,"
                            f" {n}), ' ') as gram))"
                        )
                        for n in (1, 2, 3)
                    ]
                )
            )
        ).alias("g"),
    ).select("source", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count("*").alias("total_grams"),
            F.countDistinct("gram").alias("distinct_grams"),
        )
        .select(
            "source",
            F.col("n").cast("int").alias("n"),
            F.col("total_grams").cast("bigint").alias("total_grams"),
            F.col("distinct_grams").cast("bigint").alias("distinct_grams"),
            F.expr(
                "cast(distinct_grams * cast(1000000 as bigint)"
                " div total_grams as bigint)"
            ).alias("distinct_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("source", "n")
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence drift (Lin, IEEE Trans. IT 1991)
# ---------------------------------------------------------------------------


def js_divergence_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the even/odd-half term
    distributions (Lin 1991) — the SCALAR summarizing what
    ``term_drift``'s per-term delta table itemizes, and the
    bounded/symmetric alternative to PSI's bucket-KL: JS needs no
    smoothing (the mixture m=(p+q)/2 is positive wherever either side
    is), is symmetric, and is capped at ln 2 — the one number a corpus
    refresh gate thresholds on.

    Engine-exactness: each term's contribution ``p·ln(p/m)+q·ln(q/m)``
    is >= 0 (log-sum inequality), so rounding the HALF-weighted
    contribution to integer micro-nats (round(x*5e5), half-up ==
    half-away on non-negatives) is engine-stable under the repo's
    ln-round precedent (psi_drift/bm25), and the total is an
    associative BIGINT sum — no float accumulation order anywhere.

    Scale shape: one (term, side) count shuffle with map-side
    partials, the two totals as a broadcast 1-row aggregate, the
    per-term kernel pure Catalyst arithmetic, and one single-row final
    sum — identical frame to term_drift, no window, no join between
    the sides."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        (F.col("doc_id") % 2 == 0).alias("is_a"),
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("cnt_b"),
    )
    tot = counts.agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    contrib = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "cast(round(("
                "  case when cnt_a = 0 then 0.0 else"
                "   (cnt_a / cast(tot_a as double)) *"
                "   ln(2.0 * (cnt_a / cast(tot_a as double)) /"
                "      (cnt_a / cast(tot_a as double)"
                "       + cnt_b / cast(tot_b as double))) end"
                " + case when cnt_b = 0 then 0.0 else"
                "   (cnt_b / cast(tot_b as double)) *"
                "   ln(2.0 * (cnt_b / cast(tot_b as double)) /"
                "      (cnt_a / cast(tot_a as double)"
                "       + cnt_b / cast(tot_b as double))) end"
                ") * 500000) as bigint)"
            ).alias("term_js_micro")
        )
    )
    return contrib.agg(
        F.sum("term_js_micro").alias("js_micro"),
        F.count("*").alias("n_terms"),
    ).crossJoin(F.broadcast(tot))


# ---------------------------------------------------------------------------
# Isotonic calibration (PAV solution via the minimax identity;
# Robertson, Wright & Dykstra 1988; Zadrozny & Elkan KDD 2002)
# ---------------------------------------------------------------------------


def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone (isotonic) calibration of the quality-score keep-rate
    curve — what ``quality_calibration`` reports raw, fitted so the
    calibrated keep probability never DECREASES as the score rises
    (Zadrozny & Elkan, KDD 2002: isotonic regression is the standard
    score-calibration step before thresholding a filter model).

    Instead of iterating pool-adjacent-violators, the fit uses the
    closed-form minimax identity (Robertson-Wright-Dykstra eq. 1.9):
        iso(i) = max_{j<=i} min_{k>=i} mean(keep over buckets j..k)
    which is pure joins/aggregates — no sequential loop on either
    engine.  Means are rounded to ppm FIRST (half-away integer rule),
    so the minimax runs over integers; rounding is monotone, hence the
    fitted curve is still non-decreasing.

    Scale shape: everything after the per-bucket rollup lives on
    CALIB_BUCKETS (<=10) rows — the prefix-sum window is annotated
    tiny, the (j,k) range table is B^2, the minimax B^3 — constants,
    broadcast-joined; the only corpus-sized work is
    quality_calibration's own one-shuffle rollup."""
    bins = quality_calibration(spark, sf_dir).select(
        "bucket", "n_docs", "n_kept", F.col("keep_ppm").alias("raw_ppm")
    )
    cum = bins.select(
        "bucket",
        F.sum("n_kept")
        .over(
            # tiny-window: CALIB_BUCKETS (<=10) per-bucket rollup rows
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("ck"),
        F.sum("n_docs")
        .over(
            # tiny-window: CALIB_BUCKETS (<=10) per-bucket rollup rows
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cd"),
    )
    lo = cum.join(bins, "bucket").select(
        F.col("bucket").alias("j"),
        (F.col("ck") - F.col("n_kept")).alias("k_lo"),
        (F.col("cd") - F.col("n_docs")).alias("d_lo"),
    )
    hi = cum.select(
        F.col("bucket").alias("k"),
        F.col("ck").alias("k_hi"),
        F.col("cd").alias("d_hi"),
    )
    ranges = (
        lo.join(F.broadcast(hi), F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            F.expr(
                "(2 * (k_hi - k_lo) * cast(1000000 as bigint)"
                " + (d_hi - d_lo)) div (2 * (d_hi - d_lo))"
            ).alias("mean_ppm"),
        )
    )
    i_tab = bins.select(F.col("bucket").alias("i"))
    inner = (
        ranges.join(
            F.broadcast(i_tab),
            (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k")),
        )
        .groupBy("i", "j")
        .agg(F.min("mean_ppm").alias("inner_min"))
    )
    iso = inner.groupBy("i").agg(F.max("inner_min").alias("iso_ppm"))
    return (
        bins.join(iso, bins.bucket == iso.i)
        .select("bucket", "n_docs", "n_kept", "raw_ppm", "iso_ppm")
        .repartition(1)
        .sortWithinPartitions("bucket")
    )


# ---------------------------------------------------------------------------
# Term burstiness (Church & Gale 1995: "Poisson mixtures")
# ---------------------------------------------------------------------------

BURST_MIN_DF = 3  # ignore terms seen in fewer docs (noise floor)
BURST_TOP = 50


def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness per term: mean occurrences per
    CONTAINING document (cf/df) — the statistic separating bursty
    content words (appear many times in few docs: names, topics,
    boilerplate tokens) from evenly-spread function words, which a
    Poisson model can't tell apart from cf alone.  High burst at high
    df is the template/boilerplate signature the dedup stoplists
    (winnowing, RAKE) key on.

    Engine-exactness: cf and df are integer counts off one (doc,term)
    pre-aggregation; burst is the half-away ppm ratio; output is the
    deterministic top-``BURST_TOP`` by (burst desc, df desc, term).

    Scale shape: explode -> ONE (doc_id, term) map-side-combined
    count (the distinct-per-doc and total counts then come from the
    SAME aggregate: df = count, cf = sum — no countDistinct
    expansion); the final cut is TakeOrdered, never a window."""
    docs = _docs(spark, sf_dir)
    per_doc = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("k"))
    )
    stats = per_doc.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("k").alias("cf")
    )
    return (
        stats.filter(F.col("df") >= BURST_MIN_DF)
        .select(
            "term",
            F.col("df").cast("bigint").alias("df"),
            F.col("cf").cast("bigint").alias("cf"),
            F.expr(
                "(2 * cf * cast(1000000 as bigint) + df) div (2 * df)"
            ).alias("burst_ppm"),
        )
        .orderBy(F.desc("burst_ppm"), F.desc("df"), "term")
        .limit(BURST_TOP)
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (classifier meta-eval vs corpus truth)
# ---------------------------------------------------------------------------


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-vote ``lang_id`` classifier
    against the corpus ground-truth ``lang`` column — the meta-eval
    that closes the classifier loop the way ann_recall_eval closes the
    ANN loop: per (true, predicted) cell counts plus the within-class
    rate in exact ppm, so per-language recall sits on the diagonal and
    every systematic confusion (e.g. es read as unk on short docs) is
    one off-diagonal row.

    Scale shape: lang_id is map-side; the matrix is ONE two-key
    partial-agg groupBy (cells <= languages^2, tiny), the class totals
    a second aggregate of the cells themselves (never a second corpus
    pass), broadcast back onto the cells."""
    truth = _docs(spark, sf_dir).select("doc_id", F.col("lang").alias(
        "true_lang"
    ))
    pred = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    cells = (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )
    totals = cells.groupBy("true_lang").agg(
        F.sum("n_docs").alias("class_total")
    )
    return (
        cells.join(F.broadcast(totals), "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("class_total").cast("bigint").alias("class_total"),
            F.expr(
                "(2 * n_docs * cast(1000000 as bigint) + class_total)"
                " div (2 * class_total)"
            ).alias("cell_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# Skip-gram pair extraction (word2vec preprocessing; Mikolov 2013)
# ---------------------------------------------------------------------------

SKIPGRAM_WINDOW = 2
SKIPGRAM_MIN_COUNT = 2
SKIPGRAM_TOP = 100


def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(center, context) co-occurrence pairs within a ±SKIPGRAM_WINDOW
    token window — the word2vec/GloVe training-pair extraction step
    (Mikolov et al. 2013), counted corpus-wide and cut to the
    ``SKIPGRAM_TOP`` most frequent pairs above ``SKIPGRAM_MIN_COUNT``
    — the table an embedding trainer (or a PMI collocation miner, cf.
    pmi_bigram_lift) consumes.

    Engine-exactness: pairs come from per-document lead() offsets 1..W
    emitted in BOTH directions (so the pair relation is symmetric by
    construction); counts are integers and the cut is the
    deterministic (n desc, center, context) TakeOrdered.

    Scale shape: posexplode -> per-DOCUMENT position windows (lead
    over the doc partition, never global), one (center, context)
    map-side-combined count shuffle, TakeOrdered final cut."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = toks.select(
        "term",
        *[
            F.lead("term", d).over(w).alias(f"l{d}")
            for d in range(1, SKIPGRAM_WINDOW + 1)
        ],
    )
    pairs = None
    for d in range(1, SKIPGRAM_WINDOW + 1):
        fwd = leads.filter(F.col(f"l{d}").isNotNull()).select(
            F.col("term").alias("center"), F.col(f"l{d}").alias("context")
        )
        bwd = fwd.select(
            F.col("context").alias("center"), F.col("center").alias("context")
        )
        both = fwd.unionByName(bwd)
        pairs = both if pairs is None else pairs.unionByName(both)
    return (
        pairs.groupBy("center", "context")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= SKIPGRAM_MIN_COUNT)
        .orderBy(F.desc("n"), "center", "context")
        .limit(SKIPGRAM_TOP)
    )


# ---------------------------------------------------------------------------
# CCNet perplexity-bucket mix (Wenzek et al., LREC 2020 §4.3)
# ---------------------------------------------------------------------------


def perplexity_bucket_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's defining curation step (Wenzek et al., LREC 2020): split
    each language's documents into head / middle / tail TERTILES of LM
    perplexity (low perplexity = cleanest third), producing the
    (lang, bucket) mix table a pretraining sampler draws from —
    lm_perplexity gives the score, this gives the cut.

    Engine-exactness: perplexity is lm_perplexity's round-4 double
    scaled to integer millis; tertile edges are EXACT order
    statistics — the smallest ppl value whose cumulative doc count
    reaches ceil(n/3) resp. ceil(2n/3) per language — and bucket
    assignment compares integers against those edges (ties land low,
    deterministically on both engines).

    Scale shape: the cumulative window runs per language over
    DISTINCT ppl-milli values (value cardinality, orders of magnitude
    below doc count — the bucketed-cumsum convention), edges collapse
    to a languages-sized broadcast row set, and the final mix is one
    (lang, bucket) partial-agg rollup."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    ppl = lm_perplexity(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("ppl") * 1000).cast("bigint").alias("pplm"),
    )
    pm = docs.join(ppl, "doc_id")
    counts = pm.groupBy("lang", "pplm").agg(
        F.count("*").alias("nd"), F.sum("n_tokens").alias("nt")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("pplm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("nd").over(w))
    ntot = pm.groupBy("lang").agg(F.count("*").alias("n"))
    edged = cum.join(F.broadcast(ntot), "lang")
    e1 = (
        edged.filter(F.col("cum") >= F.expr("(n + 2) div 3"))
        .groupBy("lang")
        .agg(F.min("pplm").alias("e1"))
    )
    e2 = (
        edged.filter(F.col("cum") >= F.expr("(2 * n + 2) div 3"))
        .groupBy("lang")
        .agg(F.min("pplm").alias("e2"))
    )
    edges = e1.join(e2, "lang")
    return (
        pm.join(F.broadcast(edges), "lang")
        .select(
            "lang",
            F.expr(
                "case when pplm <= e1 then 'head'"
                " when pplm <= e2 then 'middle'"
                " else 'tail' end"
            ).alias("bucket"),
            "n_tokens",
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("tok_total"),
        )
        .repartition(1)
        .sortWithinPartitions("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# Per-source bigram entropy rate (Shannon 1951 printed-English estimate)
# ---------------------------------------------------------------------------


def entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source conditional entropy rate H(next|current) of the word
    bigram chain (Shannon 1951's printed-language estimate) — the
    text-INTERNAL diversity number next to ``source_entropy`` (which
    measures the source MIX): template-generated or looping text shows
    a collapsed entropy rate long before exact dedup fires, making
    this the cheap first-pass synthetic-text tripwire.

    H = sum over bigrams of (c_ab/T) * ln(c_a/c_ab), each term >= 0
    (c_ab <= c_a), rounded to integer micro-nats per bigram
    (non-negative, so half-up == half-away) and summed as bigints —
    the js_divergence_drift accumulation discipline: no float sum
    order exists.  c_a counts the FIRST-position occurrences so the
    conditional distribution is proper.

    Scale shape: per-doc lead() pairs (the skipgram_pairs window
    shape), one (source, a, b) count shuffle with map-side partials,
    one (source, a) rollup joined back co-keyed, one per-source sum."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source",
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.select(
            "source",
            F.col("term").alias("a"),
            F.lead("term").over(w).alias("b"),
        )
        .filter(F.col("b").isNotNull())
    )
    cab = pairs.groupBy("source", "a", "b").agg(F.count("*").alias("c_ab"))
    ca = cab.groupBy("source", "a").agg(F.sum("c_ab").alias("c_a"))
    tot = cab.groupBy("source").agg(F.sum("c_ab").alias("t"))
    term = (
        cab.join(ca, ["source", "a"])
        .join(F.broadcast(tot), "source")
        .select(
            "source",
            F.expr(
                "cast(round((c_ab / cast(t as double))"
                " * ln(c_a / cast(c_ab as double)) * 1000000) as bigint)"
            ).alias("h_micro"),
        )
    )
    return (
        term.groupBy("source")
        .agg(
            F.sum("h_micro").alias("entropy_rate_micro"),
            F.count("*").alias("n_bigram_types"),
        )
        .repartition(1)
        .sortWithinPartitions("source")
    )


# ---------------------------------------------------------------------------
# Padding-waste audit (dynamic-batching efficiency for inference/training)
# ---------------------------------------------------------------------------

PAD_BATCH = 32  # sequences per inference batch


def padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding overhead of dynamic batching under two schedulers — the
    measurement behind length-bucketed batch inference (and behind this
    repo's own width-sorted OCR sub-batches, core/recognize.py): batch
    ``PAD_BATCH`` docs at a time, pad each batch to its longest member,
    and compare total padded tokens when batches are formed in arrival
    (doc_id) order vs token-length-sorted order.  The sorted strategy's
    waste_ppm is the classic 2-5x padding saving that makes
    length-sorted batching standard in serving stacks.

    Scale shape: both global orders come from ``bucketed_global_rank``
    (two-pass grid-bucketed rank — the only unpartitioned window
    touches O(RANK_BUCKETS) offset rows, never the corpus), then one
    tiny per-batch aggregate and one per-strategy rollup.  No
    corpus-cardinality window, one shuffle per rank plus two partial
    aggs."""
    from ocr_spark.operators.relational import bucketed_global_rank

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    arrival = bucketed_global_rank(docs, "doc_id", "doc_id").withColumn(
        "strategy", F.lit("arrival")
    )
    by_len = bucketed_global_rank(docs, "n_tokens", "doc_id").withColumn(
        "strategy", F.lit("sorted")
    )
    batches = (
        arrival.unionByName(by_len)
        .withColumn("batch", F.expr(f"(rk - 1) div {PAD_BATCH}"))
        .groupBy("strategy", "batch")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_tokens").alias("actual"),
            F.max("n_tokens").alias("mx"),
        )
    )
    per = batches.groupBy("strategy").agg(
        F.count("*").alias("n_batches"),
        F.sum("actual").alias("actual_tokens"),
        F.sum(F.col("cnt") * F.col("mx")).alias("padded_tokens"),
    )
    return (
        per.withColumn(
            "waste_ppm",
            F.expr(
                "(2 * (padded_tokens - actual_tokens) * 1000000"
                " + padded_tokens) div (2 * padded_tokens)"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("strategy")
    )


# ---------------------------------------------------------------------------
# Dataset card (the publishable corpus datasheet, long format)
# ---------------------------------------------------------------------------


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-query corpus datasheet (Gebru et al., "Datasheets for
    Datasets", CACM 2021) — the summary block a curation pipeline
    publishes next to every release, in long (metric, value) format so
    downstream dashboards diff releases row-wise: corpus size, token
    budget, source/language breadth, English share, exact-duplicate
    share, short-document share, mean document length.  Rates are
    half-away ppm; the mean is half-away milli-tokens.

    Scale shape: one scan feeding a handful of map-side aggregates
    (count / sum / conditional sum), two exact distinct counts on
    low-cardinality keys, and one digest groupBy for the duplicate
    share (the dedup_exact shuffle) — every result is a driver-side
    scalar (tiny-stats policy), assembled into the card as literals."""
    docs = _docs(spark, sf_dir)
    toks = F.size(F.split(F.col("text"), " "))
    base = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(toks.cast("bigint")).alias("n_tokens"),
        F.sum((toks < 10).cast("bigint")).alias("short_docs"),
        F.sum((F.col("lang") == "en").cast("bigint")).alias("en_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
    ).first()
    n = int(base["n_docs"])
    if n == 0:
        return spark.createDataFrame([], "metric string, value bigint")
    dup = (
        docs.select(F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)
            ).alias("dup_docs")
        )
        .first()["dup_docs"]
    )

    def ppm(x: int) -> int:
        return (2 * x * 1_000_000 + n) // (2 * n)

    rows = [
        ("dup_docs_ppm", ppm(int(dup))),
        ("english_docs_ppm", ppm(int(base["en_docs"]))),
        ("mean_doc_tokens_milli",
         (2 * 1000 * int(base["n_tokens"]) + n) // (2 * n)),
        ("n_docs", n),
        ("n_langs", int(base["n_langs"])),
        ("n_sources", int(base["n_sources"])),
        ("n_tokens", int(base["n_tokens"])),
        ("short_docs_ppm", ppm(int(base["short_docs"]))),
    ]
    return (
        spark.createDataFrame(rows, "metric string, value bigint")
        .repartition(1)
        .sortWithinPartitions("metric")
    )


# ---------------------------------------------------------------------------
# Packing-length sweep (choose SEQ_LEN from measured tail waste)
# ---------------------------------------------------------------------------

PACK_SWEEP_LENS = (64, 128, 256, 512)


def packing_seqlen_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How the sequence length is actually chosen: for each candidate
    SEQ_LEN, the per-shard token streams (sequence_pack's shape) cut
    into ceil(total/L) sequences, and the TAIL waste — the padded
    remainder of each shard's final sequence — reported in half-away
    ppm of the padded total.  Longer sequences amortize per-sequence
    overhead but strand more tail; the sweep quantifies the tradeoff
    on the real corpus (the packing twin of padding_waste_audit's
    batching sweep).

    Scale shape: ONE aggregate computes every per-source token total
    (map-side partials); the sweep over PACK_SWEEP_LENS is arithmetic
    on the O(sources) totals — no per-length rescan."""
    docs = _docs(spark, sf_dir)
    totals = (
        docs.select(
            "source",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("t"),
        )
        .groupBy("source")
        .agg(F.sum("t").alias("total"))
        .collect()
    )
    if not totals:
        return spark.createDataFrame(
            [],
            "seq_len int, n_shards bigint, n_seqs bigint, "
            "actual_tokens bigint, padded_tokens bigint, tail_waste_ppm bigint",
        )
    rows = []
    for L in PACK_SWEEP_LENS:
        n_seqs = sum(-(-int(r["total"]) // L) for r in totals)
        actual = sum(int(r["total"]) for r in totals)
        padded = n_seqs * L
        waste = (2 * (padded - actual) * 1_000_000 + padded) // (2 * padded)
        rows.append((L, len(totals), n_seqs, actual, padded, waste))
    return (
        spark.createDataFrame(
            rows,
            "seq_len int, n_shards bigint, n_seqs bigint, "
            "actual_tokens bigint, padded_tokens bigint, tail_waste_ppm bigint",
        )
        .repartition(1)
        .sortWithinPartitions("seq_len")
    )


# ---------------------------------------------------------------------------
# Weak-supervision label model (majority vote + LF diagnostics)
# ---------------------------------------------------------------------------


def label_model_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snorkel-style weak supervision (Ratner et al., VLDB 2018) over
    heuristic labeling functions voting "is this document English":
    LF1 = the ' the ' stopword heuristic (abstains on very short
    docs), LF2 = the metadata lang tag with deterministic 10% noise
    (every 10th doc flipped — the dirty-upstream-tag model), LF3 = a
    deliberately weak length-parity heuristic.  The label model here
    is plain majority-over-non-abstains (ties -> negative), and the
    output is the per-LF diagnostic a practitioner reads before
    weighting: coverage (non-abstain rate) and agreement with the
    majority — Snorkel's accuracy proxy when no gold labels exist.

    Scale shape: one scan, all three LF votes are map-side Catalyst
    expressions, one majority projection, one 3-row aggregate — no
    shuffle beyond the final partial agg."""
    docs = _docs(spark, sf_dir)
    lf1 = (
        F.when(F.length("text") < 20, F.lit(-1))
        .when(F.col("text").contains(" the "), F.lit(1))
        .otherwise(F.lit(0))
    )
    lf2 = F.when(
        F.col("doc_id") % 10 == 0,
        1 - (F.col("lang") == "en").cast("int"),
    ).otherwise((F.col("lang") == "en").cast("int"))
    lf3 = (F.col("n_chars") % 2 == 0).cast("int")
    v = docs.select(
        lf1.alias("v1"), lf2.alias("v2"), lf3.alias("v3")
    )
    pos = (
        F.when(F.col("v1") == 1, 1).otherwise(0)
        + F.col("v2")
        + F.col("v3")
    )
    cnt = (
        F.when(F.col("v1") >= 0, 1).otherwise(0) + F.lit(2)
    )
    maj = (2 * pos > cnt).cast("int")
    vm = v.withColumn("maj", maj)
    agg = vm.agg(
        F.count("*").alias("n"),
        F.sum((F.col("v1") >= 0).cast("bigint")).alias("c1"),
        F.sum(
            ((F.col("v1") >= 0) & (F.col("v1") == F.col("maj")))
            .cast("bigint")
        ).alias("a1"),
        F.sum((F.col("v2") == F.col("maj")).cast("bigint")).alias("a2"),
        F.sum((F.col("v3") == F.col("maj")).cast("bigint")).alias("a3"),
    ).first()
    n = int(agg["n"]) if agg["n"] is not None else 0
    if n == 0:
        return spark.createDataFrame(
            [],
            "lf string, n_votes bigint, coverage_ppm bigint, "
            "agree_majority_ppm bigint",
        )

    def ppm(x: int, d: int) -> int:
        return (2 * x * 1_000_000 + d) // (2 * d)

    c1 = int(agg["c1"])
    rows = [
        ("lf1_stopword", c1, ppm(c1, n),
         ppm(int(agg["a1"]), c1) if c1 else 0),
        ("lf2_lang_tag", n, 1_000_000, ppm(int(agg["a2"]), n)),
        ("lf3_parity", n, 1_000_000, ppm(int(agg["a3"]), n)),
    ]
    return (
        spark.createDataFrame(
            rows,
            "lf string, n_votes bigint, coverage_ppm bigint, "
            "agree_majority_ppm bigint",
        )
        .repartition(1)
        .sortWithinPartitions("lf")
    )



UNCERTAIN_K = 50


def uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The human-review queue an active-learning curation loop ships
    (uncertainty sampling, Lewis & Gale SIGIR 1994): the documents
    whose CCNet-style perplexity sits CLOSEST to the corpus median —
    the gate's decision boundary — are exactly the ones where a label
    changes the filter, so they go to review first.  Margin =
    |ppl_e4 − median_e4| on the 4-dp-quantized integer scale; the
    median is the exact order statistic at ceil(n/2) via the two-pass
    rank; the queue is the UNCERTAIN_K smallest margins
    (orderBy().limit() — TakeOrdered, never a global sort), ties by
    doc_id.

    Scale shape: the perplexity core's shapes, one two-pass rank for
    the median, one map-side margin projection, one distributed
    top-K."""
    from ocr_spark.operators.relational import bucketed_global_rank

    ppl = _doc_perplexities(_docs(spark, sf_dir)).select(
        "doc_id",
        F.expr("cast(round(ppl * 10000) as bigint)").alias("ppl_e4"),
    )
    n = ppl.count()
    if n == 0:
        return spark.createDataFrame(
            [], "doc_id long, ppl_e4 bigint, median_e4 bigint, "
                "margin bigint"
        )
    ranked = bucketed_global_rank(ppl, "ppl_e4", "doc_id")
    k = (50 * n + 99) // 100
    med = int(ranked.filter(F.col("rk") == k).first()["ppl_e4"])
    return (
        ppl.withColumn("median_e4", F.lit(med).cast("bigint"))
        .withColumn(
            "margin", F.abs(F.col("ppl_e4") - F.lit(med)).cast("bigint")
        )
        .orderBy("margin", "doc_id")
        .limit(UNCERTAIN_K)
    )
