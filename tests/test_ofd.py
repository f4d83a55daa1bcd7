"""OFD container codec roundtrip (reference util/ofd_util.py:8-44)."""

from __future__ import annotations

import pytest

from ocr_spark.sources.ofd import build_ofd_bytes, parse_ofd_bytes


def test_roundtrip():
    fields = {
        "InvoiceCode": "012345678901",
        "TotalAmount": "1234.56",
        "Buyer": "买方单位",
    }
    assert parse_ofd_bytes(build_ofd_bytes(fields)) == fields


def test_empty_custom_datas():
    assert parse_ofd_bytes(build_ofd_bytes({})) == {}


def test_not_a_zip_raises():
    with pytest.raises(Exception):
        parse_ofd_bytes(b"not a zip container")
