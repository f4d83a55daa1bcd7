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


def test_noise_tolerance_margins():
    """The margins that make NOISE_TAU-tolerant decoding safe: unique
    nearest template and straddle windows staying blank."""
    import numpy as np

    from ocr_spark.core.recognize import NOISE_TAU
    from ocr_spark.fixtures.glyphs import (
        ADVANCE, ALPHABET, GLYPH_H, GLYPH_W, GLYPHS,
    )

    T = np.stack([GLYPHS[c] for c in ALPHABET]).reshape(
        len(ALPHABET), -1
    ).astype(np.int16)
    pair_d = (T[:, None, :] != T[None, :, :]).sum(axis=2)
    iu = np.triu_indices(len(ALPHABET), 1)
    assert pair_d[iu].min() >= 2 * NOISE_TAU + 2

    worst = 99
    for a in ALPHABET:
        for b in ALPHABET:
            pair = np.zeros((GLYPH_H, 2 * ADVANCE - 1), bool)
            pair[:, :GLYPH_W] = GLYPHS[a]
            pair[:, ADVANCE : ADVANCE + GLYPH_W] = GLYPHS[b]
            w = pair[:, 3 : 3 + GLYPH_W].reshape(-1).astype(np.int16)
            worst = min(worst, int(np.abs(w[None, :] - T).sum(axis=1).min()))
    assert worst > NOISE_TAU


def test_recognize_tolerates_bit_noise():
    """Flipping up to NOISE_TAU bits inside one glyph window must not
    change the decode (CRNN-robustness stand-in)."""
    import numpy as np

    from ocr_spark.core.recognize import NOISE_TAU, recognize_batch
    from ocr_spark.fixtures.glyphs import render_text_line

    rng = np.random.default_rng(0)
    for text in ["¥123.45", "2024年01月", "spark", "壹万贰仟"]:
        clean = render_text_line(text)
        noisy = clean.copy()
        # flip NOISE_TAU bits inside the first glyph's 7x5 window
        for _ in range(NOISE_TAU):
            y, x = int(rng.integers(0, 7)), int(rng.integers(0, 5))
            noisy[y, x] = ~noisy[y, x]
        texts, confs = recognize_batch([noisy])
        assert texts == [text]
