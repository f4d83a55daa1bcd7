"""QR matrix codec + enhancement retry ladder (reference
util/tool.py:353-389: pyzbar decode with up to 3 cumulative
Brightness/Sharpness/Contrast retries), and its wiring through the
detector-chain stage (vat_detect.py:341 crops the YOLO 'qrcode' region
and hands it to the ladder)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.core import qr
from ocr_spark.core.fields import extract_fields
from ocr_spark.fixtures.invoice import _QR_LOW_CONTRAST_PROB, ground_truth, render_invoice
from ocr_spark.fixtures.render import _rng

PAYLOAD = "01,31,123456789012,12345678,4312.07,20240311,731852"


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=1, max_size=80))
def test_encode_decode_roundtrip(payload):
    assert qr.decode(qr.encode(payload)) == payload


def test_decode_handles_all_four_rotations():
    img = qr.encode(PAYLOAD)
    for k in range(4):
        assert qr.decode(np.rot90(img, k)) == PAYLOAD


def test_decode_rejects_corruption():
    img = qr.encode(PAYLOAD).copy()
    # flip a data module block: checksum must catch it
    img[40:44, 40:44] = 255 - img[40:44, 40:44]
    assert qr.decode(img) == ""


def test_decode_rejects_non_qr_ink():
    assert qr.decode(np.full((120, 120), 255, np.uint8)) == ""
    blob = np.full((120, 120), 255, np.uint8)
    blob[10:110, 10:110] = 0  # solid square: separator ring reads dark
    assert qr.decode(blob) == ""


def test_low_contrast_fails_raw_then_ladder_recovers():
    """The underexposed patch (10/60) sits entirely below the fixed
    reader threshold: the raw decode AND the first brightness retry both
    fail; the ladder's compounding second pass (brightness applied twice,
    then sharpness — the reference recurses with the already-enhanced
    image, util/tool.py:367) separates the module levels."""
    low = qr.encode(PAYLOAD, dark=10, light=60)
    assert qr.decode(low) == ""  # index 0
    b1 = qr.enhance_brightness(low, 2.0)
    assert qr.decode(b1) == ""  # index 1: 20/120, still both dark
    b2 = qr.enhance_sharpness(qr.enhance_brightness(b1, 2.0), 1.5)
    assert qr.decode(b2) == PAYLOAD  # index 2: 40/240 separates
    assert qr.get_qrcode_data(low) == PAYLOAD


def test_ladder_gives_up_after_three_retries():
    # all-dark garbage never decodes; the recursion must terminate at
    # index > 3 (reference util/tool.py:354-355) returning ''
    assert qr.get_qrcode_data(np.zeros((120, 120), np.uint8)) == ""


def test_clean_patch_decodes_without_enhancement():
    img = qr.encode(PAYLOAD)
    assert qr.decode(img) == PAYLOAD  # index 0 — no retry cost


def _qr_refs(n=80):
    refs = [f"inv://t{i}#vat" for i in range(n)]
    return [r for r in refs if "qrcode" in ground_truth(r)]


def test_pipeline_decodes_qr_from_pixels():
    """End-to-end: the rendered page carries the payload ONLY as a pixel
    matrix (no text row); extract_fields must detect the square region,
    crop it from the original pixels, and decode it — including the
    underexposed patches that exercise the retry ladder."""
    low = clean = 0
    for ref in _qr_refs(40):
        gt = ground_truth(ref)
        if _rng("qrpatch:" + ref).random() < _QR_LOW_CONTRAST_PROB:
            low += 1
        else:
            clean += 1
        d = extract_fields(render_invoice(ref).image)
        assert d.get("qrcode", "") == gt["qrcode"], ref
    assert low and clean  # both exposure regimes exercised


def test_qr_payload_is_not_a_text_row():
    """The payload must not be recoverable from the recognized rows —
    proof the decode ran on pixels, not on a smuggled text row."""
    from ocr_spark.core.extract import ocr_page_state

    ref = _qr_refs(40)[0]
    gt = ground_truth(ref)
    st_ = ocr_page_state(render_invoice(ref).image)
    assert all(gt["qrcode"] not in row for row in st_.rows)
    assert st_.qr_boxes  # the region was detected as a QR candidate


def test_qr_region_does_not_dilute_page_confidence():
    """With the QR box excluded from recognition, a clean QR-carrying
    page must still score full confidence (no phantom garbage row
    dragging the orientation vote or triggering the deskew ladder)."""
    from ocr_spark.core.extract import ocr_page_state

    for ref in _qr_refs(40)[:5]:
        page = render_invoice(ref)
        if page.skew_deg:
            continue  # skewed pages legitimately pay the ladder
        st_ = ocr_page_state(page.image)
        assert st_.conf == pytest.approx(1.0), ref
