"""Deterministic labeled-document fixtures for the detector-chain stage.

The reference's four live detectors (obj_det/vat_detect.py:237-434,
stock_detect.py:61-211, stock_detect_v2.py:54-219, bill_detect.py:57-170)
share one contract: locate labeled field regions on a document image, OCR
each region, then normalize per label.  The YOLO weights are absent
(.MISSING_LARGE_BLOBS), so the fixture side renders documents whose field
regions are *rows in a fixed reading order* — detection still has to find
the boxes and the recognizer still has to read them; only the box->label
assignment is positional instead of learned, preserving the stage shape.

Grammar: ``inv://{key}#{family}`` with family in FAMILIES.  Layout and
field values are pure functions of sha256 via the same RNG discipline as
fixtures/render.py; ``expected_fields`` exposes the ground truth for the
pytest equality gate without running the pipeline.

Row 0 is always the title and carries the family's gate keyword, so the
detector-chain dispatch (objd_util.py:152-204: try stock_v1 -> stock_v2
-> bill -> vat, first gate wins; gates at stock_detect.py:206-210
['总务'/'结算'], stock_detect_v2.py:214-218 ['药'], bill_detect.py:163-167
['据']) reproduces the family from pixels alone.
"""

from __future__ import annotations

import numpy as np

from .render import Line, RenderedPage, _render_lines, _rng
from .glyphs import GLYPH_H

FAMILIES = ("vat", "stock_v1", "stock_v2", "bill")

# Field rows per family, in render/reading order after the title.
# Key sets follow the reference converters (vat_detect.py:22-47,
# stock_detect.py:12-32, bill_detect.py:10-23), trimmed to the fields the
# fixture glyph alphabet can render.
FAMILY_FIELDS: dict[str, list[str]] = {
    "vat": [
        "invoice_code", "invoice_number", "billing_date", "check_code",
        "total_amount", "tax", "amount_with_tax", "buy_title", "sale_title",
        # complex-range fields (config.ocrRange == 'complex',
        # vat_detect.py:35-47), routed through process_buy_sale_field
        "buy_tax", "buy_addr", "buy_bank",
        "sale_tax", "sale_addr", "sale_bank",
    ],
    "stock_v1": [
        "doc_number", "idate", "total", "total2", "total3", "cnt", "page",
    ],
    "stock_v2": [
        "doc_number", "idate", "total", "total2", "total3", "cnt", "page",
    ],
    "bill": [
        "invoice_code", "invoice_number", "billing_date", "total_amount",
        "check_code", "amount_with_tax", "buy_title", "sale_title",
    ],
}

_VAT_TITLES = [
    "电子发票(普通发票)",
    "电子发票(专用发票)",
    "专用发票",
    "电子普通发票",
    "普通发票",
]
_TITLES = {
    "stock_v1": ["总务入库单", "结算入库单"],
    "stock_v2": ["药品入库单"],
    "bill": ["票据", "单据"],
}
_ORG_WORDS = ["spark", "query", "batch", "data", "merge", "total"]


def _amount(rng: np.random.Generator) -> str:
    return f"¥{int(rng.integers(1, 999_999))}.{int(rng.integers(0, 100)):02d}"


def _date(rng: np.random.Generator) -> str:
    return (
        f"{int(rng.integers(2019, 2027))}年{int(rng.integers(1, 13)):02d}月"
        f"{int(rng.integers(1, 29)):02d}日"
    )


def _chinese_amount(rng: np.random.Generator) -> str:
    digits = "壹贰叁肆伍陆柒捌玖"
    return (
        digits[rng.integers(0, 9)] + "万" + digits[rng.integers(0, 9)] + "仟"
        + digits[rng.integers(0, 9)] + "佰" + digits[rng.integers(0, 9)] + "拾"
        + digits[rng.integers(0, 9)] + "元"
        + digits[rng.integers(0, 9)] + "角" + digits[rng.integers(0, 9)] + "分"
    )


def _field_value(field: str, rng: np.random.Generator) -> str:
    if field == "invoice_code":
        return "".join(str(rng.integers(0, 10)) for _ in range(12))
    if field in ("invoice_number", "doc_number"):
        return "".join(str(rng.integers(0, 10)) for _ in range(8))
    if field in ("billing_date", "idate"):
        return _date(rng)
    if field in ("check_code", "cnt"):
        return "".join(str(rng.integers(0, 10)) for _ in range(6))
    if field in ("total_amount", "tax", "amount_with_tax", "total", "total2"):
        return _amount(rng)
    if field == "total3":
        return _chinese_amount(rng)
    if field == "page":
        a = int(rng.integers(1, 9))
        return f"第{a}页/共{int(rng.integers(a, 10))}页"
    if field in ("buy_title", "sale_title"):
        w = _ORG_WORDS[rng.integers(0, len(_ORG_WORDS))]
        w2 = _ORG_WORDS[rng.integers(0, len(_ORG_WORDS))]
        return f"{w}:{w2}"  # colon exercises the get_title normalizer
    if field in ("buy_tax", "sale_tax"):
        # tax id: digits + uppercase letters, exercises get_tax
        d = "".join(str(rng.integers(0, 10)) for _ in range(9))
        ls = "".join("ABCDEFGHJK"[rng.integers(0, 10)] for _ in range(4))
        return f"税号{d}{ls}"
    if field in ("buy_addr", "sale_addr"):
        w = _ORG_WORDS[rng.integers(0, len(_ORG_WORDS))]
        w2 = _ORG_WORDS[rng.integers(0, len(_ORG_WORDS))]
        tel = "".join(str(rng.integers(0, 10)) for _ in range(7))
        return f"地址:{w}市{w2}路 电话{tel}"
    if field in ("buy_bank", "sale_bank"):
        w = _ORG_WORDS[rng.integers(0, len(_ORG_WORDS))]
        acct = "".join(str(rng.integers(0, 10)) for _ in range(12))
        return f"开户行:{w}银行{w}支行 {acct}"
    raise KeyError(field)


_QR_TYPES = ["01", "04", "10", "31", "32"]


def _qr_payload(rng: np.random.Generator) -> str:
    """VAT QR CSV payload in the reference format (util/tool.py:321-336):
    [0] constant '01', [1] invoice_type, [2] invoice_code,
    [3] invoice_number, [4] amount, [5] date YYYYMMDD, [6] check_code.
    Drawn independently of the rendered field rows, so QR values and OCR
    values DISAGREE — the branch choice is observable."""
    t = _QR_TYPES[rng.integers(0, len(_QR_TYPES))]
    code = "".join(str(rng.integers(0, 10)) for _ in range(12))
    num = "".join(str(rng.integers(0, 10)) for _ in range(8))
    amount = f"{int(rng.integers(1, 999_999))}.{int(rng.integers(0, 100)):02d}"
    date = (
        f"{int(rng.integers(2019, 2027))}{int(rng.integers(1, 13)):02d}"
        f"{int(rng.integers(1, 29)):02d}"
    )
    check = "".join(str(rng.integers(0, 10)) for _ in range(6))
    return f"01,{t},{code},{num},{amount},{date},{check}"


def family_of(media_ref: str) -> str:
    fam = media_ref.rsplit("#", 1)[-1]
    if fam not in FAMILIES:
        raise ValueError(f"not an invoice ref: {media_ref}")
    return fam


def ground_truth(media_ref: str) -> dict[str, str]:
    """Raw (pre-normalization) field texts, keyed by field name + 'title',
    exactly as the recognizer will read them. Pure function of media_ref."""
    fam = family_of(media_ref)
    rng = _rng("inv:" + media_ref)
    if fam == "vat":
        title = _VAT_TITLES[rng.integers(0, len(_VAT_TITLES))]
    else:
        opts = _TITLES[fam]
        title = opts[rng.integers(0, len(opts))]
    fields = {"title": title}
    for f in FAMILY_FIELDS[fam]:
        fields[f] = _field_value(f, rng)
    # Half the vat documents carry a decodable QR region (stamped as a
    # pixel matrix patch, see render_invoice; the reference branches on
    # pyzbar success, vat_detect.py:341-370).
    if fam == "vat" and rng.integers(0, 2) == 1:
        fields["qrcode"] = _qr_payload(rng)
    return fields


# Fraction of QR-carrying invoices rendered UNDEREXPOSED (module grays
# 10/60 instead of 0/255): both levels sit below the reader's fixed
# threshold, so the raw decode fails and the reference's enhancement
# retry ladder (core/qr.get_qrcode_data = util/tool.py:353-367) must
# brighten the patch before the bits separate — the pixel-level stressor
# the ladder exists for.
_QR_LOW_CONTRAST_PROB = 0.4
_QR_GAP = 12  # blank px between the last field row's ink and the patch


def render_invoice(media_ref: str) -> RenderedPage:
    """Render the labeled document: one field per row, reading order =
    title, then FAMILY_FIELDS[family] order. Same rotation/seal stressors
    as the generic fixture pages.

    A QR-carrying vat document gets its payload stamped as a REAL pixel
    matrix patch below the last field row (core/qr.encode), never as a
    text row: the pipeline must detect the square region, crop it, and
    decode it through the retry ladder, mirroring the reference's
    YOLO-label-crop -> pyzbar chain (vat_detect.py:341).  The patch gap
    (12..19 px with jitter) sits above the band-split threshold (>= 1
    blank row) and below the multi-region splitter's MIN_REGION_GAP=32,
    so the QR stays inside its invoice's region on batch-scanned sheets.
    Exposure/placement draws come from a dedicated RNG stream so every
    pre-existing layout/stressor draw is byte-identical."""
    from ..core import qr as qrmod

    fields = ground_truth(media_ref)
    fam = family_of(media_ref)
    texts = [fields["title"]] + [fields[f] for f in FAMILY_FIELDS[fam]]
    rng = _rng("invlayout:" + media_ref)
    patches = None
    if "qrcode" in fields:
        qrng = _rng("qrpatch:" + media_ref)
        dark, light = (
            (10, 60) if qrng.random() < _QR_LOW_CONTRAST_PROB else (0, 255)
        )
        patch = qrmod.encode(fields["qrcode"], dark=dark, light=light)
        scale = 2
        margin = 4 * scale
        row_pitch = (GLYPH_H + 4) * scale
        # below the deepest possible ink of the last row (max jitter 7)
        y = margin + (len(texts) - 1) * row_pitch + 7 + GLYPH_H * scale + _QR_GAP
        x = margin + int(qrng.integers(0, 33))
        patches = [(x, y, patch)]
    return _render_lines(texts, rng, scale=2, patches=patches)


def expected_crop_labels(media_ref: str) -> list[str]:
    """Layout-side expected label sequence of the save-crop debug sink
    (core/fields.save_crops) for one single-invoice ref: title, then the
    family's fields in reading order, then 'qrcode' when the ground truth
    carries a QR region (emitted last because QR candidate boxes are
    appended after the text rows).  Pure function of media_ref — never
    runs the pipeline."""
    fam = family_of(media_ref)
    gt = ground_truth(media_ref)
    labels = ["title"] + list(FAMILY_FIELDS[fam])
    if "qrcode" in gt:
        labels.append("qrcode")
    return labels


# --- multi-invoice pages -------------------------------------------------
# Grammar: ``inv://{key}#multi`` — a batch-scanned sheet carrying SEVERAL
# invoices on one page image (the reference's legacy whole-page route,
# obj_det/v1/detect.py:71-156: YOLO finds each invoice region, crops it
# with ``im0[y1:y3, x0:x2]`` and emits one record per region).  The number
# of sub-invoices and their families are drawn from the fixture RNG, so
# detection must COUNT the regions from pixels — the ref does not say n.

# Vertical whitespace between pasted sub-invoices.  Internal blank runs
# inside one rendered invoice are <= row_pitch - glyph_h + jitter = 16 px
# (scale 2); the explicit gap plus two 8 px sub-image margins puts the
# inter-invoice blank run at >= 64 px, so the region splitter's 32 px
# threshold (core/fields.MIN_REGION_GAP) has a 2x margin on both sides.
_MULTI_GAP = 48

# Sheet-level scan-skew probability.  Skew on a batch-scanned sheet is a
# property of the SCAN (the paper sat crooked on the glass), so it is
# applied once to the composited sheet, never per sub-invoice — exactly
# the regime the reference's page-level angle preprocess assumes
# (table_extract.py:325-446 deskews the page BEFORE region work).  Higher
# than the single-page _SKEW_PROB because multi sheets are the primary
# test bed for deskew-before-region-crop.
_MULTI_SKEW_PROB = 0.25


def is_multi(media_ref: str) -> bool:
    return media_ref.rsplit("#", 1)[-1] == "multi"


def multi_sub_refs(media_ref: str) -> list[str]:
    """The deterministic sub-invoice refs composited onto a #multi page,
    top-to-bottom.  Each sub-ref is a full single-invoice ref, so layout,
    values and expected records all reuse the single-invoice machinery."""
    if not is_multi(media_ref):
        raise ValueError(f"not a multi-invoice ref: {media_ref}")
    rng = _rng("multi:" + media_ref)
    n = int(rng.integers(2, 5))
    base = media_ref.rsplit("#", 1)[0]
    return [
        f"{base}/r{i}#{FAMILIES[rng.integers(0, len(FAMILIES))]}"
        for i in range(n)
    ]


def render_multi(
    media_ref: str,
) -> tuple[np.ndarray, list[tuple[int, int, int, int]], int]:
    """Composite the sub-invoices onto one white sheet, stacked
    top-to-bottom with ``_MULTI_GAP`` whitespace and a small random x
    indent each, then (sometimes) skew the WHOLE sheet by a small scan
    angle.  Returns (image, ground-truth region boxes (x0,y0,x1,y1) in
    PRE-skew, pre-padding sheet coordinates, skew_deg) — the boxes are the
    layout-side truth the region detector must recover (within margin
    tolerance; on skewed sheets the skew padding shifts both axes, so box
    comparisons should use unskewed refs), never an input to the pipeline.

    Each sub-invoice is pasted FLAT: a sub whose own render drew the
    small-angle skew stressor is derotated first via the exact
    scatter-inverse (geometry.rotate_image == the inverse of the render's
    rotate_scatter on the same canvas).  Physically, small-angle skew on a
    batch-scanned sheet comes from the scan itself, so it is applied once
    at sheet level; per-sub 90-degree rotations (crooked paste-ups) are
    kept — the per-crop orientation vote handles those exactly."""
    from ..core.geometry import rotate_image, rotate_scatter

    subs = []
    for r in multi_sub_refs(media_ref):
        page = render_invoice(r)
        im = page.image
        if page.skew_deg:
            im = rotate_image(im, float(page.skew_deg))
        subs.append(im)
    rng = _rng("multilayout:" + media_ref)
    xoffs = [int(rng.integers(0, 33)) for _ in subs]
    width = max(im.shape[1] + dx for im, dx in zip(subs, xoffs)) + 8
    height = sum(im.shape[0] for im in subs) + _MULTI_GAP * (len(subs) - 1) + 16
    sheet = np.full((height, width, 3), 255, dtype=np.uint8)
    boxes = []
    y = 8
    for im, dx in zip(subs, xoffs):
        h, w = im.shape[:2]
        sheet[y : y + h, dx : dx + w] = im
        boxes.append((dx, y, dx + w, y + h))
        y += h + _MULTI_GAP
    skew_deg = 0
    if rng.random() < _MULTI_SKEW_PROB:
        skew_deg = int(rng.choice([-5, -4, -3, -2, 2, 3, 4, 5]))
        # same padding contract as fixtures/render._rasterize: corner
        # displacement at 5 deg is <= r*theta ~ 0.031*(h+w); no ink clips
        p = int(0.035 * (sheet.shape[0] + sheet.shape[1])) + 4
        canvas = np.full(
            (sheet.shape[0] + 2 * p, sheet.shape[1] + 2 * p, 3), 255, np.uint8
        )
        canvas[p:-p, p:-p] = sheet
        sheet = rotate_scatter(canvas, float(skew_deg))
    return sheet, boxes, skew_deg


def expected_multi_records(media_ref: str) -> list[dict]:
    """Reference-semantics expected output rows for one #multi page: the
    single-invoice expected record of each sub-ref, re-keyed to the parent
    ref + its region index (the ref emits one record per cropped region,
    obj_det/v1/detect.py:150-156)."""
    out = []
    for i, sub in enumerate(multi_sub_refs(media_ref)):
        rec = expected_record(sub)
        rec["media_ref"] = media_ref
        rec["region_idx"] = i
        out.append(rec)
    return out


def _bs_norm(s: str) -> str:
    """process_buy_sale_field pre-normalization (vat_detect.py:197,209)."""
    return s.strip().replace("：", ":").replace("，", ",").replace("；", ";")


def _tax_arith(tax: str, total: str, awt: str) -> str:
    """Twin of the tax arithmetic (vat_detect.py:412-421)."""
    import re

    m1 = re.search(r"(-?\d+\.?\d*)", total)
    m2 = re.search(r"(-?\d+\.?\d*)", awt)
    if tax == "¥ 0.00" and m1 and m2:
        return f"¥ {round(float(m1.group(1)) - float(m2.group(1)), 2):.2f}"
    return tax


def expected_record(ref: str) -> dict:
    """Reference-semantics expected output of the full detector-chain stage
    (operators/fields.extract_invoice_fields) for one media_ref, computed
    from layout ground truth through the pure-Python normalizer twins
    (functions/normalizers_py.py) — never through the Spark stage itself.
    Used by the pytest equality gate AND the driver's DuckDB value oracle
    (persisted to parquet by __spark_entry__._invoice_expected_path)."""
    from ..core.fields import FAMILY_TYPE
    from ..functions import normalizers_py as pyref

    fam = ref.rsplit("#", 1)[-1]
    gt = ground_truth(ref)
    raw = {f: gt.get(f, "") for f in FAMILY_FIELDS[fam]}
    title = pyref.get_title(gt["title"])
    check_code = pyref.get_num(raw.get("check_code", ""))
    total_amount = pyref.get_amount(raw.get("total_amount", ""))
    amount_with_tax = pyref.get_amount(raw.get("amount_with_tax", ""))
    tax_ocr = pyref.get_amount(raw.get("tax", ""))
    tax = tax_ocr
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
    rec = {
        "media_ref": ref,
        # single-invoice routes carry one implicit whole-page region
        # (multi-region pages re-key this, expected_multi_records)
        "region_idx": 0,
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
        "buy_tax": pyref.get_tax(raw.get("buy_tax", "").strip()),
        "buy_addr": pyref.extract_addr(_bs_norm(raw.get("buy_addr", ""))),
        "buy_bank": pyref.extract_bank(_bs_norm(raw.get("buy_bank", ""))),
        "sale_tax": pyref.get_tax(raw.get("sale_tax", "").strip()),
        "sale_addr": pyref.extract_addr(_bs_norm(raw.get("sale_addr", ""))),
        "sale_bank": pyref.extract_bank(_bs_norm(raw.get("sale_bank", ""))),
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
    # QR-present branch twin (vat_detect.py:341-370 + _vat_qrcode,
    # util/tool.py:321-336): identity fields from the payload; amounts
    # per invoice type; buy/sale titles stay OCR-routed (no blanking,
    # vat_detect.py:361-367).
    qr = gt.get("qrcode", "")
    if fam == "vat" and qr:
        p = qr.split(",")
        t = p[1].strip()
        qr_amount = pyref.get_float(p[4])
        if t in ("31", "32"):
            b_total, b_awt, b_tax = total_amount, qr_amount, tax_ocr
        elif t in ("01", "04"):
            b_total, b_awt, b_tax = qr_amount, amount_with_tax, tax_ocr
        else:
            b_total, b_awt, b_tax = qr_amount, "¥ 0.00", "¥ 0.00"
        rec.update(
            title=(
                "电子发票（普通发票）" if t == "32"
                else "电子发票（专用发票）" if t == "31"
                else title
            ),
            invoice_type=t,
            invoice_code=p[2].strip(),
            invoice_number=p[3].strip(),
            billing_date=f"{p[5][:4]}年{p[5][4:6]}月{p[5][6:8]}日",
            check_code=pyref.get_num(p[6]) if t in ("04", "10") else "",
            total_amount=b_total,
            amount_with_tax=b_awt,
            tax=_tax_arith(b_tax, b_total, b_awt),
        )
    return rec
