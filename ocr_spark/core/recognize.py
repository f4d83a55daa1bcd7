"""CTC-style batched text recognition, pure numpy.

Contract mirrored from the reference CRNN stage (crnn/network_torch.py):

* ``recognize_batch`` pads all line bitmaps of a batch to the max width and
  runs ONE vectorized forward pass — the padded-tensor batching of the
  reference ``CRNN.predict_batch`` (crnn/network_torch.py:157-200).
* Per-timestep class scores over a sliding window (the "sequence model"),
  argmax over timesteps, then CTC greedy collapse: drop blanks and repeats
  (reference ``strLabelConverter``, crnn/util.py:16-22).
* Lines narrower than one glyph return '' (reference width<8 guard,
  network_torch.py:141-142).

Timestep geometry: glyph advance is 6 unit columns, windows are 5 wide at
stride 3 — every even timestep is glyph-aligned, every odd timestep straddles
a glyph boundary and decodes to blank, which is what keeps repeated
characters ("11") from collapsing, exactly the role of the CTC blank.
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from ..fixtures.glyphs import ADVANCE, BLANK, CLASS_TO_CHAR, GLYPH_H, GLYPH_W, TEMPLATES

_STRIDE = ADVANCE // 2  # 3: two timesteps per glyph cell
# Noise tolerance: a window decodes to its nearest template when within
# NOISE_TAU flipped bits, else blank.  Safe because the font's margins
# (pinned by tests/test_glyphs.py) satisfy BOTH
#   min pairwise template hamming (6) >= 2*NOISE_TAU + 2  (unique nearest)
#   min straddle-window distance  (4) >  NOISE_TAU        (CTC blanks hold)
NOISE_TAU = 2
# fallback-engine tolerance: must stay < min straddle distance (4)
FALLBACK_TAU = 3
# (n_classes, 35) template matrix for one-matmul hamming distance.
_TMPL_FLAT = TEMPLATES.reshape(TEMPLATES.shape[0], -1).astype(np.int16)
_TMPL_POP = _TMPL_FLAT.sum(axis=1)  # ink bits per template


def ctc_greedy_decode(pred: np.ndarray) -> str:
    """Drop blanks and collapse repeats (reference crnn/util.py:16-22)."""
    out: list[str] = []
    prev = BLANK
    for cls in pred.tolist():
        if cls != BLANK and cls != prev:
            out.append(CLASS_TO_CHAR[cls])
        prev = cls
    return "".join(out)


def recognize_batch(bitmaps: list[np.ndarray]) -> tuple[list[str], list[float]]:
    """Recognize a batch of unit-scale line bitmaps (each (7, W) bool).

    Returns (texts, confidences); confidence is the fraction of glyph cells
    decoded with an exact template match (1.0 on in-distribution fixtures) —
    it drives the angle-classification vote in core/extract.py and maps to
    the reference's drop_score gate (predict_system.py:106).
    """
    if not bitmaps:
        return [], []
    texts: list[str] = ["" for _ in bitmaps]
    confs: list[float] = [0.0 for _ in bitmaps]
    keep = [
        i
        for i, b in enumerate(bitmaps)
        if b.shape[0] == GLYPH_H and b.shape[1] >= GLYPH_W
    ]
    if not keep:
        return texts, confs

    # Sort by width and process in width-homogeneous sub-batches: each
    # sub-batch pads only to ITS max width, so short lines don't pay for
    # the longest line's padding — the reference's aspect-ratio-sort
    # batching trick (tools/infer/predict_cls.py:80-86). Positional
    # results map back through the original indices (the index-map
    # isolation of ocr_context.py:239-266).
    keep.sort(key=lambda i: bitmaps[i].shape[1])
    for start in range(0, len(keep), _SUB_BATCH):
        sub = keep[start : start + _SUB_BATCH]
        _recognize_padded(bitmaps, sub, texts, confs)

    # Hybrid fallback (reference _ocr, obj_det/ocr_context.py:97-144:
    # primary engine first, second engine only on the empty slots): lines
    # that decoded empty retry with the looser matcher (tau=FALLBACK_TAU;
    # still below the straddle margin, so CTC blanks hold — nearest-match
    # uniqueness is best-effort there, as with any second engine).
    retry = [i for i in keep if texts[i] == ""]
    if retry:
        _recognize_padded(bitmaps, retry, texts, confs, tau=FALLBACK_TAU)
    return texts, confs


_SUB_BATCH = 64  # sub-batch size (reference OCR_BATCH_SIZE family of knobs)

# Per-line 180-degree classifier gate (reference cls_thresh=0.9,
# tools/infer/utility.py:116): adopt the flipped reading only when its
# confidence clears this AND beats the unflipped one.
CLS_THRESH = 0.9


def recognize_batch_cls(
    bitmaps: list[np.ndarray], cls_thresh: float = CLS_THRESH
) -> tuple[list[str], list[float], list[bool]]:
    """det -> cls -> rec chain with the per-LINE 180-degree classifier.

    The reference runs a dedicated direction classifier on every line crop
    and rotates a crop in place when it labels '180' above cls_thresh
    (tools/infer/predict_cls.py:115-119, thresh utility.py:116) — so a page
    whose lines disagree in orientation (pasted content, rotated stamps)
    still reads.  The classical stand-in uses the recognizer itself as the
    direction scorer: lines whose upright decode is already confident
    (>= cls_thresh) skip the flip probe (they cannot be adopted anyway —
    the flipped read would have to strictly beat them above the same
    gate), and only the low-confidence minority pays a second decode of
    its 180-rotated bitmap, batched through the same width-sorted padded
    tensors.  Returns (texts, confs, flipped_flags).
    """
    texts, confs = recognize_batch(bitmaps)
    flipped = [False] * len(bitmaps)
    low = [
        i
        for i, c in enumerate(confs)
        if c < cls_thresh
        and bitmaps[i].shape[0] == GLYPH_H
        and bitmaps[i].shape[1] >= GLYPH_W
    ]
    if low:
        # rot90 twice == the reference's cv2.rotate(crop, ROTATE_180)
        t2, c2 = recognize_batch(
            [np.ascontiguousarray(np.rot90(bitmaps[i], 2)) for i in low]
        )
        for j, i in enumerate(low):
            if c2[j] > cls_thresh and c2[j] > confs[i]:
                texts[i], confs[i], flipped[i] = t2[j], c2[j], True
    return texts, confs, flipped


def _recognize_padded(
    bitmaps: list[np.ndarray],
    keep: list[int],
    texts: list[str],
    confs: list[float],
    tau: int = NOISE_TAU,
) -> None:
    """Recognize one width-sorted sub-batch in a single padded tensor,
    writing results into texts/confs at the original positions."""
    widths = [bitmaps[i].shape[1] for i in keep]
    w_max = max(widths)
    # pad to (N, 7, Wmax) — the reference's max-width zero-padded batch
    # tensor (crnn/network_torch.py:170-177).
    batch = np.zeros((len(keep), GLYPH_H, w_max), dtype=bool)
    for row, i in enumerate(keep):
        batch[row, :, : widths[row]] = bitmaps[i]

    if w_max < GLYPH_W:
        return
    # all windows: (N, T, 7, 5) -> flatten -> hamming vs all templates in
    # one einsum (XOR popcount = a.pop + t.pop - 2*a@t).
    wins = sliding_window_view(batch, (GLYPH_H, GLYPH_W), axis=(1, 2))[
        :, 0, ::_STRIDE, :, :
    ]
    n, t = wins.shape[0], wins.shape[1]
    flat = wins.reshape(n * t, GLYPH_H * GLYPH_W).astype(np.int16)
    inter = flat @ _TMPL_FLAT.T  # (N*T, C)
    dist = flat.sum(axis=1, keepdims=True) + _TMPL_POP[None, :] - 2 * inter
    dist[:, BLANK] = tau + 1  # blank never wins within tolerance
    best = dist.argmin(axis=1)
    best[dist.min(axis=1) > tau] = BLANK  # too far from any glyph
    preds = best.reshape(n, t)

    for row, i in enumerate(keep):
        # timesteps that exist for this line's true width
        t_i = max((widths[row] - GLYPH_W) // _STRIDE + 1, 0)
        pred = preds[row, :t_i]
        text = ctc_greedy_decode(pred)
        n_cells = (widths[row] + 1) // ADVANCE
        texts[i] = text
        confs[i] = (
            min(len(text), n_cells) / n_cells if n_cells > 0 else 0.0
        )
