"""Detector-chain field extraction: kernel equality vs fixture ground
truth, and Spark-stage equality vs the pure-Python normalizer twins
(the reference-semantics oracle, functions/normalizers_py.py)."""

from __future__ import annotations

import pytest

from ocr_spark.core.fields import FAMILY_TYPE, classify_family, extract_fields
from ocr_spark.fixtures.invoice import (
    FAMILIES,
    FAMILY_FIELDS,
    ground_truth,
    render_invoice,
)
from ocr_spark.functions import normalizers_py as pyref


@pytest.mark.parametrize("family", FAMILIES)
def test_kernel_reads_ground_truth(family):
    for i in range(6):
        ref = f"inv://k{i}#{family}"
        got = extract_fields(render_invoice(ref).image)
        exp = {"family": family, "type": FAMILY_TYPE[family], **ground_truth(ref)}
        assert got == exp


def test_gate_predicates():
    # verbatim reference gates (stock_detect.py:206-210, _v2:214-218,
    # bill_detect.py:163-167; vat terminal objd_util.py:181-186)
    assert classify_family("总务入库单") == "stock_v1"
    assert classify_family("结算入库单") == "stock_v1"
    assert classify_family("药品入库单") == "stock_v2"
    assert classify_family("票据") == "bill"
    assert classify_family("电子发票(专用发票)") == "vat"
    assert classify_family("") == "vat"


def _expected_record(ref: str) -> dict:
    """Reference-semantics expected output computed from layout ground
    truth through the pure-Python normalizer twins."""
    fam = ref.rsplit("#", 1)[-1]
    gt = ground_truth(ref)
    raw = {f: gt.get(f, "") for f in FAMILY_FIELDS[fam]}
    title = pyref.get_title(gt["title"])
    check_code = pyref.get_num(raw.get("check_code", ""))
    total_amount = pyref.get_amount(raw.get("total_amount", ""))
    amount_with_tax = pyref.get_amount(raw.get("amount_with_tax", ""))
    tax = pyref.get_amount(raw.get("tax", ""))
    if tax == "¥ 0.00" and raw.get("total_amount") and raw.get("amount_with_tax"):
        a = float(total_amount.split()[1])
        b = float(amount_with_tax.split()[1])
        tax = f"¥ {round(a - b, 2):.2f}"
    total = pyref.get_amount(raw.get("total", ""))
    total2 = pyref.get_amount(raw.get("total2", ""))
    total3 = pyref.get_chinese_amount(raw.get("total3", ""))
    stock_total = next(
        (t for t in (total, total2, total3) if t != "¥ 0.00"), "¥ 0.00"
    )
    return {
        "media_ref": ref,
        "family": fam,
        "type": FAMILY_TYPE[fam],
        "title": title,
        "invoice_code": pyref.get_num(raw.get("invoice_code", "")),
        "invoice_number": pyref.get_num(raw.get("invoice_number", "")),
        "billing_date": pyref.get_date(raw.get("billing_date", "")),
        "check_code": check_code,
        "total_amount": total_amount,
        "tax": tax,
        "amount_with_tax": amount_with_tax,
        "buy_title": pyref.get_title(raw.get("buy_title", "")),
        "sale_title": pyref.get_title(raw.get("sale_title", "")),
        "invoice_type": pyref.judge_invoice_type(title, check_code),
        "doc_number": pyref.get_num(raw.get("doc_number", "")),
        "idate": pyref.get_date(raw.get("idate", "")),
        "total": total,
        "total2": total2,
        "total3": total3,
        "stock_total_amount": stock_total,
        "cnt": pyref.get_num(raw.get("cnt", "")),
        "page": pyref.get_page(raw.get("page", "")),
    }


def test_spark_stage_matches_python_oracle(spark):
    from ocr_spark.operators.fields import extract_invoice_fields

    refs = [f"inv://s{i}#{fam}" for i in range(4) for fam in FAMILIES]
    df = spark.createDataFrame([(r,) for r in refs], "media_ref string")
    got = {r["media_ref"]: r.asDict() for r in extract_invoice_fields(df).collect()}
    assert set(got) == set(refs)
    for ref in refs:
        assert got[ref] == _expected_record(ref), ref
