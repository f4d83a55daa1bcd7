"""Deterministic synthetic glyph font.

The container has no image libraries and the reference repo's model weights
are absent (reference `.MISSING_LARGE_BLOBS`), so fixture media is rendered
from a synthetic monospaced bitmap font that is a *pure function of this
module's source* — every process (driver, executor python workers, pytest)
derives the identical font, which is what makes the end-to-end
span-equality gate exact.

Design constraints (all load-bearing for the recognition stage):

* Each glyph is a 7x5 binary bitmap (rows x cols), advance = 6 columns
  (5 ink + 1 blank spacing column).
* The four corner bits are always set, so a rendered line's ink bounding
  box aligns exactly with the glyph grid (detection box <-> glyph cell
  alignment needs no sub-cell search).
* Bitmaps are derived from sha256(char) — stable across processes, unlike
  Python's randomized ``hash``.
* Uniqueness and CTC-safety (no cross-boundary window of any glyph pair
  exactly matches a third template) are asserted by tests/test_glyphs.py;
  SALT is bumped if the derivation ever violates them.

Vocabulary mirrors the character classes the reference normalizes
(reference util/tool.py:37-50 translate tables, crnn/keys.py alphabet):
digits, currency/punct, Latin, and the CJK numerals/units/date chars.
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_H = 7
GLYPH_W = 5
ADVANCE = 6  # glyph width + 1 spacing column
SALT = b"ocr-spark-font-v1"

# Character classes the reference's normalizers exercise
# (util/tool.py:37-50, crnn/keys.py).
_DIGITS = "0123456789"
_PUNCT = "¥.,/-():%"
_LATIN = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CJK = (
    "年月日号第页共"  # dates & page marks
    "壹贰叁肆伍陆柒捌玖拾佰仟万亿元角分整"  # upper-case amounts
    "零〇一二三四五六七八九十百千"  # lower-case numerals
    "发票专用普通电子总务结算药品据入库单"  # invoice-type keywords
    "地址购销方税开户行银支市路话账位"  # complex-range addr/bank fields
)

ALPHABET: str = _DIGITS + _PUNCT + _LATIN + _CJK
# index 0 is reserved for the CTC blank, mirroring the reference's CTC
# greedy decode contract (reference crnn/util.py:16-22).
BLANK = 0


def _glyph_bits(ch: str) -> np.ndarray:
    """7x5 bool bitmap for ``ch``, pure function of (SALT, ch)."""
    digest = hashlib.sha256(SALT + ch.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
    # Corner bits pin the ink bounding box to the glyph grid.
    g[0, 0] = g[0, -1] = g[-1, 0] = g[-1, -1] = True
    # Every column must carry ink: horizontal ink runs then have gaps of
    # exactly one spacing column inside a line, which is what lets the
    # detection stage (core/detect.py) recover the render scale and split
    # line boxes without knowing the scale a priori.
    empty_cols = ~g.any(axis=0)
    g[GLYPH_H // 2, empty_cols] = True
    return g


def _build_font() -> tuple[dict[str, np.ndarray], np.ndarray]:
    glyphs: dict[str, np.ndarray] = {}
    seen: dict[bytes, str] = {}
    for ch in ALPHABET:
        g = _glyph_bits(ch)
        key = np.packbits(g).tobytes()
        if key in seen:  # pragma: no cover - guarded by test_glyphs
            raise AssertionError(f"glyph collision: {ch!r} vs {seen[key]!r}")
        seen[key] = ch
        glyphs[ch] = g
    # Template tensor for vectorized recognition: (n_classes, 7, 5) where
    # class i+1 is ALPHABET[i] (class 0 = blank = all-false window).
    templates = np.zeros((len(ALPHABET) + 1, GLYPH_H, GLYPH_W), dtype=bool)
    for i, ch in enumerate(ALPHABET):
        templates[i + 1] = glyphs[ch]
    return glyphs, templates


GLYPHS, TEMPLATES = _build_font()
CHAR_TO_CLASS = {ch: i + 1 for i, ch in enumerate(ALPHABET)}
CLASS_TO_CHAR = {i + 1: ch for i, ch in enumerate(ALPHABET)}


def render_text_line(text: str) -> np.ndarray:
    """Render ``text`` as a 7 x (6*len-1) bool ink mask (True = ink).

    Spaces are not rendered — like the reference's per-box recognition
    (one detected box = one contiguous snippet), multi-word content is
    emitted as separate boxes and re-joined by the reading-order merge
    (reference apphelper/image.py:317-375 joins row groups with ' ').
    """
    if not text:
        return np.zeros((GLYPH_H, 0), dtype=bool)
    if " " in text:
        raise ValueError("rendered lines are space-free; split into boxes")
    width = ADVANCE * len(text) - 1
    out = np.zeros((GLYPH_H, width), dtype=bool)
    for i, ch in enumerate(text):
        out[:, i * ADVANCE : i * ADVANCE + GLYPH_W] = GLYPHS[ch]
    return out
