"""End-to-end single-image / single-document extraction.

The chain per media item mirrors the reference's request path
(fapi.py:233-263 -> obj_det/objd_util.py:152-204): decode -> angle pass ->
seal removal -> detection -> recognition -> reading-order merge, with
per-item failure isolation (reference fapi.py:255-263 wraps each request
item in try/except and degrades to success=false).

These functions are the kernels called by the Spark pandas UDFs in
operators/pipeline.py AND the single-node oracle for the pytest
span-sequence-equality gate.
"""

from __future__ import annotations

import numpy as np

from ..fixtures.render import render
from . import detect
from .reading_order import group_rows, sorted_boxes
from .recognize import recognize_batch


def ocr_page_rows(
    img: np.ndarray, drop_score: float = 0.0
) -> tuple[list[str], float]:
    """One page image -> (reading-ordered row texts, confidence).

    Angle classification: try the 4 cardinal orientations and keep the one
    with the best recognition confidence (the classical stand-in for the
    reference's VGG angle classifier, obj_det/v1/opencv_dnn_detect.py:64-122
    applied via rotate(), obj_det/objd_util.py:38-62). Early-exits on a
    perfect score, which is the common case, like the reference's
    first-gate-wins detector chain (objd_util.py:160-186).
    """
    # Seal removal + binarization commute with 90-degree rotation, so the
    # ink mask is computed ONCE and rotated per orientation (the reference
    # re-runs preprocessing per rotate() call; this is the columnar-friendly
    # equivalent at 1/4 the preprocessing cost for rotated pages).
    gray = detect.remove_seal_to_gray(img)
    ink0 = detect.binarize(gray)
    if not ink0.any():
        return [], 0.0

    best_rows: list[str] = []
    best_conf = -1.0
    for k in (0, 1, 2, 3):
        ink = np.rot90(ink0, -k) if k else ink0
        scale = detect.estimate_unit_scale(ink)
        boxes = detect.detect_lines(ink, scale)
        if not boxes:
            continue
        # Cheap orientation probe: recognize up to 3 boxes; a wrong
        # orientation scores ~0 without paying full-page recognition
        # (the classical stand-in for the reference's angle classifier
        # keeping its batched shape, obj_det/v1/opencv_dnn_detect.py:64-122).
        probe_texts, probe_confs = recognize_batch(
            [b.bitmap for b in boxes[:3]]
        )
        probe = float(np.mean(probe_confs)) if probe_confs else 0.0
        if probe <= best_conf and probe < 1.0:
            continue
        texts, confs = recognize_batch([b.bitmap for b in boxes])
        # drop_score gate: discard low-confidence lines before the
        # reading-order merge (reference predict_system.py:103-107,
        # default 0.5 there; 0.0 here keeps every line).
        if drop_score > 0.0:
            kept = [j for j, s in enumerate(confs) if s >= drop_score]
            boxes = [boxes[j] for j in kept]
            texts = [texts[j] for j in kept]
            confs = [confs[j] for j in kept]
        conf = float(np.mean(confs)) if confs else 0.0
        if conf > best_conf:
            xywh = [(b.x, b.y, b.w, b.h) for b in boxes]
            order = sorted_boxes(xywh)
            rows = group_rows(xywh, order)
            best_rows = [" ".join(texts[i] for i in row) for row in rows]
            best_conf = conf
        if conf >= 1.0:
            break
    return best_rows, max(best_conf, 0.0)


def ocr_page(img: np.ndarray) -> tuple[str, float]:
    """One page image -> (reading-ordered text, confidence); rows joined
    by newline."""
    rows, conf = ocr_page_rows(img)
    return "\n".join(rows), conf


def ocr_media_ref(media_ref: str) -> str:
    """media_ref -> extracted text (pages joined by \\n). Raises on decode
    failure — the caller isolates per row."""
    pages = render(media_ref)
    return "\n".join(ocr_page(p.image)[0] for p in pages)


def extract_spans(
    spans: list[dict],
) -> tuple[list[dict], bool, str, int]:
    """Fill every media span's text via OCR; text spans pass through.

    Returns (spans ordered by offset, success, message, n_media). A failing
    media span poisons only its own document (success=False, original spans
    kept), not the batch — the index-map isolation technique of the
    reference batch recognizer (obj_det/ocr_context.py:239-266).
    """
    out: list[dict] = []
    n_media = 0
    try:
        for s in sorted(spans, key=lambda s: s["offset"]):
            if s["kind"] == "media":
                n_media += 1
                out.append(
                    {
                        "kind": "media",
                        "text": ocr_media_ref(s["media_ref"]),
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                )
            else:
                out.append(dict(s))
        return out, True, "", n_media
    except Exception as exc:  # per-document isolation
        return (
            [dict(s) for s in sorted(spans, key=lambda s: s["offset"])],
            False,
            f"{type(exc).__name__}: {exc}",
            n_media,
        )
