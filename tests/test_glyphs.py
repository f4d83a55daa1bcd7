"""Font invariants that the detection/recognition contracts depend on."""

from __future__ import annotations

import numpy as np

from ocr_spark.fixtures import glyphs
from ocr_spark.fixtures.glyphs import (
    ADVANCE,
    ALPHABET,
    GLYPH_H,
    GLYPH_W,
    GLYPHS,
    TEMPLATES,
)


def test_glyphs_unique():
    keys = {np.packbits(g).tobytes() for g in GLYPHS.values()}
    assert len(keys) == len(ALPHABET)


def test_every_column_has_ink():
    """Scale recovery (core/detect.estimate_unit_scale) requires ink in
    every glyph column so intra-line gaps are exactly one spacing column."""
    for ch, g in GLYPHS.items():
        assert g.any(axis=0).all(), ch


def test_corner_bits_pin_bbox():
    for ch, g in GLYPHS.items():
        assert g[0, 0] and g[0, -1] and g[-1, 0] and g[-1, -1], ch


def test_ctc_boundary_windows_never_match_a_template():
    """A stride-3 window straddling any glyph pair boundary must not equal
    any template exactly — otherwise CTC greedy decode would hallucinate a
    character between two real ones. Exhaustive over the full alphabet."""
    tmpl = {np.packbits(t).tobytes() for t in TEMPLATES[1:]}
    chars = list(ALPHABET)
    pair = np.zeros((GLYPH_H, 2 * ADVANCE - 1), dtype=bool)
    bad = []
    for a in chars:
        pair[:, :GLYPH_W] = GLYPHS[a]
        for b in chars:
            pair[:, ADVANCE : ADVANCE + GLYPH_W] = GLYPHS[b]
            window = pair[:, 3 : 3 + GLYPH_W]  # the boundary timestep
            if np.packbits(window).tobytes() in tmpl:
                bad.append((a, b))
    assert not bad, f"boundary collisions: {bad[:5]}"


def test_render_text_line_roundtrip():
    from ocr_spark.core.recognize import recognize_batch

    samples = ["0123456789", "¥123.45", "2024年01月03日", "第1页/共3页", "invoice", "壹万贰仟元叁角", "11,00"]
    bitmaps = [glyphs.render_text_line(t) for t in samples]
    texts, confs = recognize_batch(bitmaps)
    assert texts == samples
    assert all(c == 1.0 for c in confs)


def test_repeated_chars_survive_ctc():
    from ocr_spark.core.recognize import recognize_batch

    texts, _ = recognize_batch([glyphs.render_text_line("1122334455")])
    assert texts == ["1122334455"]
