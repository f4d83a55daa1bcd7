"""DB-style text-line detection, pure numpy.

Contract mirrored from the reference detection stage
(tools/infer/predict_det.py:37-272): binarized probability map -> box
clustering -> min-size filter, plus the red-seal-removal preprocessing
(remove_red.py:16-35) and Otsu thresholding.  All operations are
vectorized array ops so they batch cleanly inside Arrow-fed pandas UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# min-size filter: reference drops boxes with side <= 3px
# (tools/infer/predict_det.py:194-195).
MIN_BOX_SIDE = 3

# QR-candidate gate (the classical stand-in for the reference's YOLO
# 'qrcode' class head, obj_det/vat_detect.py:341): a detected box routes
# to the QR decoder instead of text recognition when it is big, square
# and dense.  Text-line boxes can never qualify: glyph rows are at most
# GLYPH_H * scale = 28 px tall (scale 4) and the shortest token is 2
# glyphs wide (aspect >= 1.7), while the QR frame ring guarantees the
# patch detects as ONE square box >= 9 modules (= 36 px) per side; 48
# adds margin.
QR_MIN_SIDE = 48
QR_ASPECT = (0.8, 1.25)
QR_MIN_DENSITY = 0.3


@dataclass
class LineBox:
    """Axis-aligned detected text-line box + its unit-scale ink bitmap."""

    x: int
    y: int
    w: int
    h: int
    bitmap: np.ndarray  # (7, W) bool, downsampled to glyph-unit scale


def otsu_threshold(channel: np.ndarray) -> int:
    """Otsu's threshold on a uint8 channel (numpy port — no cv2 in env)."""
    hist = np.bincount(channel.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    omega = np.cumsum(hist) / total
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    denom[denom == 0] = np.nan
    sigma_b = (mu_t * omega - mu) ** 2 / denom
    if np.all(np.isnan(sigma_b)):
        return 0
    return int(np.nanargmax(sigma_b))


def remove_seal_to_gray(img: np.ndarray) -> np.ndarray:
    """Red-seal removal -> grayscale, per the reference contract.

    The reference thresholds the red channel with Otsu at 0.95x the found
    threshold and rebuilds the image from the thresholded red channel
    (remove_red.py:16-35): red seals are *bright* in the red channel, ink is
    dark in every channel, so the thresholded red channel IS the clean
    grayscale page.
    """
    red = img[..., 0] if img.ndim == 3 else img
    if red.min() == red.max():  # uniform page, nothing to threshold
        return np.full_like(red, 255)
    thresh = otsu_threshold(red)
    cond = int(thresh * 0.95)
    return np.where(red > cond, 255, 0).astype(np.uint8)


def binarize(gray: np.ndarray) -> np.ndarray:
    """Binarized probability map -> ink mask (prob = (255-gray)/255,
    thresh 0.3 per reference tools/infer/utility.py:52)."""
    return (255 - gray.astype(np.int16)) > int(0.3 * 255)


def _runs(mask_1d: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, stop) runs of True in a 1-d bool array."""
    if not mask_1d.any():
        return []
    padded = np.concatenate(([False], mask_1d, [False]))
    diff = np.diff(padded.astype(np.int8))
    starts = np.flatnonzero(diff == 1)
    stops = np.flatnonzero(diff == -1)
    return list(zip(starts.tolist(), stops.tolist()))


def estimate_unit_scale(ink: np.ndarray, robust: bool = False) -> int:
    """Glyph pixel scale of the page = gcd of all horizontal ink-run lengths.

    Fixture glyphs guarantee every glyph column has ink and glyphs are
    separated by exactly one blank unit column, so every horizontal ink run
    is a multiple of the render scale; their gcd recovers it.  This replaces
    the reference's fixed imgsz/limit_side_len resize contract
    (tools/infer/utility.py:48) with an exact equivalent for synthetic media.

    ``robust=True`` (the deskew fallback path) takes the gcd over the run
    lengths that occur with >= 5% frequency: a handful of single-pixel
    resampling artifacts otherwise force the gcd to 1 (one length-1 run
    is enough), while legitimate lengths repeat across the page.
    """
    if not ink.any():
        return 1
    padded = np.concatenate(
        [np.zeros((ink.shape[0], 1), bool), ink, np.zeros((ink.shape[0], 1), bool)],
        axis=1,
    )
    diff = np.diff(padded.astype(np.int8), axis=1)
    starts = np.flatnonzero(diff == 1)
    stops = np.flatnonzero(diff == -1)
    lengths = stops - starts  # row-major flattening keeps starts/stops paired
    uniq, counts = np.unique(lengths, return_counts=True)
    if robust:
        keep = counts >= max(2, 0.05 * len(lengths))
        if keep.any():
            uniq = uniq[keep]
    return int(np.gcd.reduce(uniq))


def split_qr_boxes(
    boxes: list[LineBox],
) -> tuple[list[LineBox], list[LineBox]]:
    """Partition detected boxes into (text lines, QR candidates).

    Runs right after detection everywhere recognition or probing consumes
    boxes: a QR region recognizes as garbage under every orientation, so
    leaving it in the text stream would both emit a phantom row and drag
    the page/orientation confidence (the reference never has this problem
    because its YOLO heads emit the 'qrcode' label separately).
    """
    text: list[LineBox] = []
    qr: list[LineBox] = []
    for b in boxes:
        if (
            min(b.w, b.h) >= QR_MIN_SIDE
            and QR_ASPECT[0] <= b.w / b.h <= QR_ASPECT[1]
            and float(b.bitmap.mean()) >= QR_MIN_DENSITY
        ):
            qr.append(b)
        else:
            text.append(b)
    return text, qr


def detect_lines(ink: np.ndarray, scale: int) -> list[LineBox]:
    """Ink mask -> text-line boxes with unit-scale bitmaps.

    Two-level projection clustering (the classical stand-in for the DB
    probability-map box clustering): horizontal bands of rows containing
    ink, then within each band column runs merged when the gap is < 2
    unit columns (intra-line gaps are exactly 1 unit: the glyph spacing
    column; distinct boxes on a row are >= 2 units apart by construction).
    """
    boxes: list[LineBox] = []
    for y0, y1 in _runs(ink.any(axis=1)):
        band = ink[y0:y1]
        col_runs = _runs(band.any(axis=0))
        if not col_runs:
            continue
        merged: list[list[int]] = [list(col_runs[0])]
        for s, e in col_runs[1:]:
            if s - merged[-1][1] < 2 * scale:
                merged[-1][1] = e
            else:
                merged.append([s, e])
        for x0, x1 in merged:
            sub = band[:, x0:x1]
            rows = np.flatnonzero(sub.any(axis=1))
            by0, by1 = int(rows[0]), int(rows[-1]) + 1
            w, h = x1 - x0, by1 - by0
            if w <= MIN_BOX_SIDE or h <= MIN_BOX_SIDE:
                continue  # min-size filter (predict_det.py:194-195)
            crop = sub[by0:by1]
            bitmap = crop[::scale, ::scale]  # exact: render upscales by kron
            boxes.append(LineBox(int(x0), int(y0 + by0), int(w), int(h), bitmap))
    return boxes
