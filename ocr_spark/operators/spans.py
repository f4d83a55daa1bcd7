"""Span algebra in native Spark SQL (no UDFs).

The pipeline's span handling decomposed into oracle-checkable pieces:
explode, transform/splice, ordered reassembly, plus the SQL twins of the
geometry operators (y-gap row clustering as a lag/sum window, reading-order
rank) — SURVEY.md §2.5's window-function surface.

The interleaved corpus is not among the driver's DuckDB views, so these
operators run over spans *derived deterministically from the documents
table in pure SQL* — the same derivation is expressed in DuckDB by
__spark_entry__.oracle_sql(), giving value-level cross-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def derived_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, pos, kind, tok): word tokens become spans;
    every token whose length is divisible by 3 plays a media span."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).select(
        "doc_id",
        "pos",
        F.when(F.length("tok") % 3 == 0, F.lit("media"))
        .otherwise(F.lit("text"))
        .alias("kind"),
        "tok",
    )


def span_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span explode + per-kind counts per document."""
    return (
        derived_spans(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias(
                "n_media"
            ),
            F.min(F.when(F.col("kind") == "media", F.col("pos"))).alias(
                "first_media_pos"
            ),
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


def span_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The splice contract: media spans get new text (here: a pure-SQL
    stand-in transform, reverse(upper(tok))), text spans pass through,
    reassembled in offset order — the same collect_list/array_sort shape as
    operators/pipeline.extract_documents reassembly."""
    spans = derived_spans(spark, sf_dir).withColumn(
        "new_text",
        F.when(
            F.col("kind") == "media", F.reverse(F.upper("tok"))
        ).otherwise(F.col("tok")),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "new_text"))
                    ),
                    lambda s: s["new_text"],
                ),
                "|",
            ).alias("spliced")
        )
        .repartition(1).sortWithinPartitions("doc_id")
    )


def pdf_page_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF multi-page lineage (reference obj_det/objd_util.py:95-111: one
    PDF -> N rasterized page rows): parse the page count from the
    ``pdf://...#{n}`` ref grammar and emit one row per page via
    posexplode — the flatMap shape the pipeline kernel applies when it
    renders pdf:// media (fixtures/render.py)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % 20 == 0
    )
    k = F.col("o_orderkey")
    ref = F.concat(
        F.lit("pdf://o"), k.cast("string"), F.lit("/0#"),
        (k % 3 + 2).cast("string"),
    )
    refs = orders.select(ref.alias("media_ref"))
    n = F.regexp_extract("media_ref", r"#(\d+)$", 1).cast("int")
    return (
        refs.select(
            "media_ref",
            n.alias("n_pages"),
            F.posexplode(F.sequence(F.lit(0), n - 1)).alias("page_idx", "_p"),
        )
        .select("media_ref", "page_idx", "n_pages")
        .repartition(1).sortWithinPartitions("media_ref", "page_idx")
    )


def synth_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic box layouts derived from events (FIXTURES.md §4 shape):
    pseudo-random but engine-portable x/y from arithmetic on event_id."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        (F.col("event_id") % 97).alias("page_id"),
        F.col("event_id").alias("box_id"),
        ((F.col("event_id") * 37) % 499).alias("x"),
        ((F.col("event_id") * 17) % 311).alias("y"),
    )


def row_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """y-gap row clustering as a window: sort by y within a page, start a
    new row when the gap to the previous box is >= 10px (lag + cumulative
    sum sessionization) — the SQL twin of core.reading_order.group_rows /
    the reference's table-row clustering (obj_det/ocr_context.py:427-449).
    """
    boxes = synth_boxes(spark, sf_dir)
    w = Window.partitionBy("page_id").orderBy("y", "box_id")
    gap = F.when(
        F.col("y") - F.lag("y", 1).over(w) >= 10, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        boxes.withColumn("new_row", F.coalesce(gap, F.lit(0)))
        .withColumn(
            "row_id",
            F.sum("new_row").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select("page_id", "box_id", "y", "row_id")
        .repartition(1).sortWithinPartitions("page_id", "box_id")
    )


def reading_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reading-order rank = row_number over (row_id, x) after y-gap
    clustering — the window-function form of sorted_boxes (the exact bubble
    variant lives in core.reading_order; agreement on non-adversarial
    layouts is tested in tests/test_spans.py)."""
    boxes = synth_boxes(spark, sf_dir)
    w = Window.partitionBy("page_id").orderBy("y", "box_id")
    clustered = (
        boxes.withColumn(
            "new_row",
            F.coalesce(
                F.when(F.col("y") - F.lag("y", 1).over(w) >= 10, F.lit(1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "row_id",
            F.sum("new_row").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    rank_w = Window.partitionBy("page_id").orderBy("row_id", "x", "box_id")
    return clustered.select(
        "page_id",
        "box_id",
        F.row_number().over(rank_w).alias("reading_rank"),
    ).repartition(1).sortWithinPartitions("page_id", "box_id")


def line_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union_rbox contract (apphelper/image.py:317-375): same-row boxes
    joined by ' ' in x order; rows emitted per (page, row)."""
    clustered = row_cluster(spark, sf_dir)
    boxes = synth_boxes(spark, sf_dir).select("box_id", "x")
    joined = clustered.join(boxes, "box_id")
    return (
        joined.groupBy("page_id", "row_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("x", "box_id"))
                    ),
                    lambda s: s["box_id"].cast("string"),
                ),
                " ",
            ).alias("merged_ids"),
            F.count("*").alias("n_boxes"),
        )
        .repartition(1).sortWithinPartitions("page_id", "row_id")
    )


def union_rbox_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union_rbox's RELATIVE line merge (apphelper/image.py:317-375) as a
    distributed operator: boxes grouped per page by the
    alpha*min(h)/2 centre-distance criterion via the core.reading_order
    kernel in an ``applyInPandas`` stage (one shuffle on page_id).

    Layout contract that makes this DuckDB-checkable: heights are
    CONSTANT per page and the input order is ascending cy, so the
    any-member-exceeds rule reduces to an anchored recursion the oracle
    expresses with a recursive CTE.  Mixed-height behaviour (where the
    relative rule diverges from the fixed 10px rule) is pinned by
    tests/test_core.py."""
    import pandas as pd

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    boxes = ev.select(
        (F.col("event_id") % 97).alias("page_id"),
        F.col("event_id").alias("box_id"),
        ((F.col("event_id") * 37) % 499).alias("x"),
        ((F.col("event_id") * 17) % 311).alias("y"),
        (20 + (F.col("event_id") % 97) % 5 * 8).alias("h"),  # per-page const
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        from ocr_spark.core.reading_order import union_rows

        pdf = pdf.sort_values(["y", "box_id"], kind="mergesort")
        quads = [
            (int(x), int(y), 30, int(h))
            for x, y, h in zip(pdf["x"], pdf["y"], pdf["h"])
        ]
        groups = union_rows(quads)
        page = int(pdf["page_id"].iloc[0])
        ids = pdf["box_id"].to_numpy()
        return pd.DataFrame(
            {
                "page_id": [page] * len(groups),
                "grp": list(range(1, len(groups) + 1)),
                "merged_ids": [
                    " ".join(str(int(ids[i])) for i in g) for g in groups
                ],
                "n_boxes": [len(g) for g in groups],
            }
        )

    out = boxes.groupBy("page_id").applyInPandas(
        merge, "page_id int, grp int, merged_ids string, n_boxes int"
    )
    return out.repartition(1).sortWithinPartitions("page_id", "grp")


def media_ref_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document media-blob dedup over the interleaved corpus —
    the image/asset dedup step of a multimodal pipeline: the same image
    embedded by thousands of pages should be STORED once and referenced
    everywhere else.  Media spans group by content key (here the token
    that plays the blob; in production a binary-content digest), and
    each blob reports how widely it is shared, its canonical holder
    (deterministic min doc_id), and the bytes a content-addressed store
    saves vs materializing every occurrence.

    Scale shape: one shuffle on the content key with map-side partial
    aggregation (count/min/sum all combine); blob keys are ~unique so
    the post-shuffle table is small and skew-free — the heavy explode
    stays map-side.  Only blobs shared by >1 document surface (the
    actionable rows)."""
    m = derived_spans(spark, sf_dir).filter(F.col("kind") == "media")
    return (
        m.groupBy(F.col("tok").alias("media_key"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .withColumn(
            "bytes_saved",
            (
                (F.col("n_occurrences") - 1) * F.length("media_key")
            ).cast("bigint"),
        )
        .repartition(1)
        .sortWithinPartitions("media_key")
    )


# ---------------------------------------------------------------------------
# Caption mining from interleaved spans (the OBELICS/LAION pairing step)
# ---------------------------------------------------------------------------

CAPTION_MAX_TOKS = 8


def caption_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine (image, caption-candidate) pairs from INTERLEAVED documents
    — the pairing primitive behind image-text corpora (LAION from
    alt-text, OBELICS from surrounding text): for every media span, the
    contiguous text runs immediately BEFORE and AFTER it are caption
    candidates; the longer run wins (ties -> before) and the caption is
    clipped to ``CAPTION_MAX_TOKS`` tokens (``run_toks`` reports the
    unclipped length so a consumer can re-rank).

    Zero self-joins on the span table: a per-doc cumulative media count
    assigns every text span to the gap it lives in (after media i /
    before media i+1), text runs aggregate once per (doc, gap), and
    each media span picks up its two runs by (doc, gap) equi-joins —
    the window is per-document (bounded by doc length, the
    sequence_pack convention), never corpus-cardinality.
    """
    spans = derived_spans(spark, sf_dir)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = spans.withColumn(
        "m_cnt",
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).over(w),
    )
    runs = (
        cnt.filter(F.col("kind") == "text")
        .groupBy("doc_id", "m_cnt")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    1,
                    CAPTION_MAX_TOKS,
                ),
                " ",
            ).alias("run_text"),
            F.count("*").alias("run_toks"),
        )
    )
    media = cnt.filter(F.col("kind") == "media").select(
        "doc_id",
        F.col("pos").alias("media_pos"),
        F.col("tok").alias("media_tok"),
        F.col("m_cnt").alias("mi"),
    )
    before = runs.select(
        "doc_id",
        (F.col("m_cnt") + 1).alias("mi"),
        F.col("run_text").alias("before_text"),
        F.col("run_toks").alias("before_toks"),
    )
    after = runs.select(
        "doc_id",
        F.col("m_cnt").alias("mi"),
        F.col("run_text").alias("after_text"),
        F.col("run_toks").alias("after_toks"),
    )
    paired = (
        media.join(before, ["doc_id", "mi"], "left")
        .join(after, ["doc_id", "mi"], "left")
        .select(
            "doc_id",
            "media_pos",
            "media_tok",
            F.coalesce("before_toks", F.lit(0)).alias("bt"),
            F.coalesce("after_toks", F.lit(0)).alias("af"),
            "before_text",
            "after_text",
        )
    )
    return (
        paired.filter((F.col("bt") > 0) | (F.col("af") > 0))
        .select(
            "doc_id",
            "media_pos",
            "media_tok",
            F.when(F.col("bt") >= F.col("af"), F.col("before_text"))
            .otherwise(F.col("after_text"))
            .alias("caption"),
            F.when(F.col("bt") >= F.col("af"), F.lit("before"))
            .otherwise(F.lit("after"))
            .alias("side"),
            F.when(F.col("bt") >= F.col("af"), F.col("bt"))
            .otherwise(F.col("af"))
            .cast("bigint")
            .alias("run_toks"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id", "media_pos")
    )


# ---------------------------------------------------------------------------
# Interleaved multimodal sequence packing (text tokens + media placeholders)
# ---------------------------------------------------------------------------

IPACK_SHARDS = 4


def interleaved_pack(spark: SparkSession, corpus_path: str) -> DataFrame:
    """Sequence packing for the INTERLEAVED corpus itself — the step
    that turns (doc_id, spans) rows into multimodal training sequences
    (Flamingo/MM1-style): every text span contributes its token count,
    every media span contributes exactly ONE placeholder token (the
    <image> slot the vision encoder later fills), and the concatenated
    shard stream is cut into SEQ_LEN-token sequences.  Output maps
    every span to its token interval (start_tok, first_seq, last_seq)
    — the manifest a loader needs to splice pixel features into the
    token stream at the right positions.

    Scale shape: sequence_pack's per-shard running sum (the shard —
    doc_id residue here, ingest file in production — is the parallel
    unit; one window shuffle on the shard key, never global), over
    posexploded spans (map-side)."""
    from ocr_spark.operators.text_analysis import SEQ_LEN

    df = spark.read.parquet(corpus_path).select("doc_id", "spans")
    ex = df.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "s")
    )
    toks = (
        F.when(
            F.col("s.kind") == "text",
            F.size(F.split(F.col("s.text"), " ")),
        )
        .otherwise(F.lit(1))
        .cast("bigint")
    )
    base = ex.select(
        "doc_id",
        "span_idx",
        F.col("s.kind").alias("kind"),
        toks.alias("n_tokens"),
        (
            F.expr("cast(right(doc_id, 8) as int)") % IPACK_SHARDS
        ).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "span_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = base.withColumn("cum_end", F.sum("n_tokens").over(w))
    return (
        p.select(
            "doc_id",
            "span_idx",
            "kind",
            "n_tokens",
            F.col("shard").cast("int").alias("shard"),
            (F.col("cum_end") - F.col("n_tokens")).alias("start_tok"),
            F.expr(f"(cum_end - n_tokens) div {SEQ_LEN}").alias(
                "first_seq"
            ),
            F.expr(f"(cum_end - 1) div {SEQ_LEN}").alias("last_seq"),
        )
        .repartition(1)
        .sortWithinPartitions("doc_id", "span_idx")
    )
