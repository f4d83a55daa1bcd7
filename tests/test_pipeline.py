"""End-to-end span-sequence-equality gate (the BASELINE.json invariant):
(kind, text, media_ref, order) per document, Spark pipeline vs the
layout-side ground truth — plus physical-plan assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.pipeline import extract_documents


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_path):
    return spark.read.parquet(corpus_path)


@pytest.mark.parametrize("mode", ["exploded", "fused"])
def test_span_sequence_equality(spark, corpus_df, mode):
    out = extract_documents(corpus_df.select("doc_id", "spans"), mode=mode)
    joined = out.join(
        corpus_df.select("doc_id", "expected_spans", "expect_success"), "doc_id"
    )
    total = corpus_df.count()
    assert joined.count() == total  # no doc lost or duplicated

    wrong_status = joined.filter(
        F.col("success") != F.col("expect_success")
    ).count()
    assert wrong_status == 0

    # span-sequence equality on (kind, text, media_ref, order) for every
    # successful document
    mismatched = joined.filter(
        F.col("success")
        & (F.to_json("spans") != F.to_json("expected_spans"))
    ).count()
    assert mismatched == 0

    # failed documents keep their original spans (media text empty)
    failed_bad = joined.filter(
        ~F.col("success")
        & F.exists(
            "spans", lambda s: (s["kind"] == "media") & (s["text"] != "")
        )
    ).count()
    assert failed_bad == 0


def test_exploded_mode_shuffles_once_for_reassembly(spark, corpus_df):
    out = extract_documents(corpus_df.select("doc_id", "spans"), mode="exploded")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # regroup aggregation present; scan should not read expected_spans
    assert "partial_collect_list" in plan or "collect_list" in plan


def test_fused_mode_plan_has_no_aggregate(spark, corpus_df):
    out = extract_documents(corpus_df.select("doc_id", "spans"), mode="fused")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan


def test_column_pruning_reaches_scan(spark, corpus_path):
    """Selecting only doc_id must not read the spans column (ReadSchema)."""
    df = spark.read.parquet(corpus_path).select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "spans" not in plan.split("ReadSchema")[-1]
