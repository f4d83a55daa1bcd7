"""Detector-chain field extraction (the reference's four live detectors
as one generic stage).

Reference shape (obj_det/objd_util.py:152-204): try stock_v1 -> stock_v2
-> bill -> vat; each detector OCRs labeled regions and a title gate
decides whether its result wins.  Here the whole page is OCR'd once
(detection + angle pass + recognition from core/extract.py) and the
gates run over the recognized title, which preserves the first-gate-wins
semantics without four redundant passes — the fusion SURVEY.md §4 calls
for ("fuse the detector chain into one stage").

Gate predicates, verbatim from the reference:
* stock_v1: '总务' in title or '结算' in title (stock_detect.py:206-210)
* stock_v2: '药' in title                      (stock_detect_v2.py:214-218)
* bill:     '据' in title                      (bill_detect.py:163-167)
* else vat (the terminal detector, objd_util.py:181-186)

Box->label assignment is positional (reading-order row index -> field
name per family) — the deterministic stand-in for the YOLO class heads,
whose weights are absent (.MISSING_LARGE_BLOBS).
"""

from __future__ import annotations

import numpy as np

from ..fixtures.invoice import FAMILY_FIELDS
from .extract import ocr_page_rows

# result `type` discriminator (reference response envelope, api.py:50-64 /
# objd_util.py:160-186): '01' invoice-like (vat/bill), '02' stock,
# '03' unrecognized.
FAMILY_TYPE = {"vat": "01", "bill": "01", "stock_v1": "02", "stock_v2": "02"}


def classify_family(title: str) -> str:
    """First-gate-wins detector dispatch on the recognized title."""
    if "总务" in title or "结算" in title:
        return "stock_v1"
    if "药" in title:
        return "stock_v2"
    if "据" in title:
        return "bill"
    return "vat"


def extract_fields(img: np.ndarray) -> dict[str, str]:
    """Labeled-document image -> raw field texts + family + type.

    Returns {'family', 'type', 'title', <field>: raw_text...}; fields the
    detected family does not define are absent (the Spark stage back-fills
    defaults, mirroring vat_detect.py:423-429 / stock_detect.py:196-204).
    """
    rows, _conf = ocr_page_rows(img)
    title = rows[0] if rows else ""
    family = classify_family(title)
    out = {"family": family, "type": FAMILY_TYPE[family], "title": title}
    body = rows[1:]
    # QR region stand-in: the reference's qrcode label is a detected
    # region decoded by pyzbar (vat_detect.py:341); here the decoded CSV
    # payload is a rendered row, recognized by shape (the VAT QR format
    # always leads with '01,' and has >= 6 commas — no other fixture
    # field contains a comma).
    if family == "vat" and body and body[-1].startswith("01,") and body[-1].count(",") >= 6:
        out["qrcode"] = body[-1]
        body = body[:-1]
    for name, text in zip(FAMILY_FIELDS[family], body):
        out[name] = text
    return out
