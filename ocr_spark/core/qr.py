"""Deterministic fixture QR matrix codec + the reference's enhancement
retry ladder, pure numpy.

The reference decodes a detected QR region with pyzbar and, when the
decode fails, retries up to 3 times after cumulatively enhancing the
image (``get_qrcode_data``, util/tool.py:353-367: Brightness 2.0, then
Sharpness 1.5, then Contrast 2.0 via PIL.ImageEnhance).  Neither pyzbar
nor PIL is in this environment, so the *codec* is a deterministic module
grid (encode and decode are exact inverses on clean renders) while the
*decode stage contract* — a fixed-threshold reader that genuinely fails
on degraded pixels until the enhancement ladder rescues it — is kept
faithfully:

* ``decode`` thresholds at a FIXED gray level (the weak-reader stand-in
  for pyzbar's binarizer): an underexposed render whose light modules
  sit below the threshold fails exactly like a real washed-out photo.
* ``get_qrcode_data`` mirrors the reference ladder INCLUDING its
  compounding quirk: the recursive call passes the already-enhanced
  image onward, so retry ``index`` applies ``optimization[0:index]`` on
  top of the previous retries' output (brightness ends up applied twice
  by the time contrast runs).  The enhancers are numpy twins of the PIL
  ImageEnhance operators at the reference's factors.

Grid format (self-describing, checksummed):
    quiet zone  QUIET modules of light on every side
    frame       1-module dark ring  (detection anchor: gives the region
                solid left/right edges, so band projection sees one box)
    separator   1-module light ring
    data        n x n modules, row-major bits:
                [16-bit length | 32-bit FNV-1a of payload | payload bytes]
Orientation is resolved by trying the 4 cardinal rotations; a wrong
rotation scrambles the bit stream and fails the 32-bit checksum.
"""

from __future__ import annotations

import numpy as np

MODULE = 4  # px per module (a multiple of the invoice render scale 2,
# so QR ink-run lengths never drag the page unit-scale gcd below 2)
QUIET = 2  # light quiet-zone modules around the frame
THRESH = 128  # the weak reader's fixed dark threshold (pyzbar stand-in)


def _fnv1a(data: bytes) -> int:
    h = 2166136261
    for b in data:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def _to_bits(value: int, width: int) -> list[int]:
    return [(value >> (width - 1 - i)) & 1 for i in range(width)]


def _grid(payload: bytes) -> np.ndarray:
    """Payload -> bool module matrix (True = dark), frame + separator
    included (side = n + 4 modules)."""
    bits = (
        _to_bits(len(payload), 16)
        + _to_bits(_fnv1a(payload), 32)
        + [(b >> (7 - i)) & 1 for b in payload for i in range(8)]
    )
    n = int(np.ceil(np.sqrt(len(bits))))
    m = n + 4
    g = np.zeros((m, m), dtype=bool)
    g[0, :] = g[-1, :] = g[:, 0] = g[:, -1] = True  # dark frame ring
    data = np.zeros(n * n, dtype=bool)
    data[: len(bits)] = np.asarray(bits, dtype=bool)
    g[2 : 2 + n, 2 : 2 + n] = data.reshape(n, n)
    return g


def encode(payload: str, dark: int = 0, light: int = 255) -> np.ndarray:
    """Render ``payload`` as a gray uint8 QR patch (quiet zone included).

    ``dark``/``light`` set the two module gray levels — the fixture's
    exposure stressor: (0, 255) is a clean print; (10, 60) is an
    underexposed one whose light modules sit below ``THRESH`` until the
    ladder's brightness passes lift them.
    """
    g = _grid(payload.encode("utf-8"))
    m = g.shape[0]
    img = np.full((m + 2 * QUIET, m + 2 * QUIET), light, dtype=np.uint8)
    img[QUIET : QUIET + m, QUIET : QUIET + m] = np.where(g, dark, light)
    return img.repeat(MODULE, axis=0).repeat(MODULE, axis=1)


def _sample_dark(crop: np.ndarray, m: int) -> np.ndarray:
    """Module dark-matrix of an upright crop: MIN over the central 2x2 of
    each module cell.  Deskew resampling erosion only LIGHTENS pixels
    (rotate_scatter is lighter-wins, geometry.py), so the darkest central
    pixel is the erosion-tolerant module estimate; a light module cannot
    be darkened, so min-sampling never flips bits the other way."""
    h, w = crop.shape
    cy = ((np.arange(m) + 0.5) * h / m).astype(np.float64)
    cx = ((np.arange(m) + 0.5) * w / m).astype(np.float64)
    y0 = np.clip(np.round(cy).astype(np.int64) - 1, 0, h - 2)
    x0 = np.clip(np.round(cx).astype(np.int64) - 1, 0, w - 2)
    a = crop[y0][:, x0]
    b = crop[y0][:, x0 + 1]
    c = crop[y0 + 1][:, x0]
    d = crop[y0 + 1][:, x0 + 1]
    out = np.minimum(np.minimum(a, b), np.minimum(c, d))
    return out < THRESH


def _decode_upright(crop: np.ndarray, m: int) -> str:
    dark = _sample_dark(crop, m)
    # frame ring must be solid dark, separator ring solid light — the
    # self-check that rejects mis-located or mis-thresholded crops (an
    # underexposed patch thresholds solid: its "separator" reads dark).
    ring0 = np.concatenate([dark[0, :], dark[-1, :], dark[:, 0], dark[:, -1]])
    ring1 = np.concatenate(
        [dark[1, 1:-1], dark[-2, 1:-1], dark[1:-1, 1], dark[1:-1, -2]]
    )
    if not ring0.all() or ring1.any():
        return ""
    n = m - 4
    bits = dark[2 : 2 + n, 2 : 2 + n].ravel()
    if len(bits) < 48:
        return ""
    length = int(np.packbits(bits[:16]).view(">u2")[0])
    if 48 + 8 * length > n * n:
        return ""
    want = int(np.packbits(bits[16:48]).view(">u4")[0])
    data = np.packbits(bits[48 : 48 + 8 * length]).tobytes()
    if _fnv1a(data) != want:
        return ""
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return ""


def decode(gray: np.ndarray) -> str:
    """One decode attempt at the fixed threshold; '' on failure.

    Locates the frame as the bounding box of sub-threshold pixels, infers
    the module count from the box side, and tries the 4 cardinal
    rotations (the 32-bit checksum arbitrates orientation)."""
    g = np.asarray(gray)
    if g.ndim == 3:
        g = g[..., 0]
    ink = g < THRESH
    if not ink.any():
        return ""
    ys, xs = np.nonzero(ink)
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    h, w = y1 - y0, x1 - x0
    side = (h + w) / 2.0
    if side < 9 * MODULE or abs(h - w) > 0.2 * side:
        return ""
    m = int(round(side / MODULE))
    if m < 9:
        return ""
    crop = g[y0:y1, x0:x1]
    for k in range(4):
        payload = _decode_upright(np.rot90(crop, k) if k else crop, m)
        if payload:
            return payload
    return ""


# --- PIL ImageEnhance twins (numpy, grayscale) ---------------------------


def enhance_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """ImageEnhance.Brightness: blend towards black -> out = img * factor."""
    return np.clip(img.astype(np.float64) * factor, 0, 255).astype(np.uint8)


def enhance_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """ImageEnhance.Contrast: blend from the solid-mean image (PIL rounds
    the L-histogram mean) -> out = mean + factor * (img - mean)."""
    mean = int(img.mean() + 0.5)
    out = mean + factor * (img.astype(np.float64) - mean)
    return np.clip(out, 0, 255).astype(np.uint8)


def enhance_sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    """ImageEnhance.Sharpness: blend from the SMOOTH-filtered image
    (PIL kernel [[1,1,1],[1,5,1],[1,1,1]]/13, 1-px border left unfiltered)
    -> out = smooth + factor * (img - smooth)."""
    f = img.astype(np.float64)
    p = np.pad(f, 1, mode="edge")
    smooth = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:] +
        p[1:-1, :-2] + 5.0 * p[1:-1, 1:-1] + p[1:-1, 2:] +
        p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    ) / 13.0
    smooth[0, :] = f[0, :]
    smooth[-1, :] = f[-1, :]
    smooth[:, 0] = f[:, 0]
    smooth[:, -1] = f[:, -1]
    out = smooth + factor * (f - smooth)
    return np.clip(out, 0, 255).astype(np.uint8)


_OPTIMIZATION = (
    lambda im: enhance_brightness(im, 2.0),
    lambda im: enhance_sharpness(im, 1.5),
    lambda im: enhance_contrast(im, 2.0),
)


def get_qrcode_data(gray: np.ndarray, index: int = 0) -> str:
    """The reference retry ladder (util/tool.py:353-367), numpy twins.

    Retry ``index`` applies ``optimization[0:index]`` and recurses with
    the ENHANCED image on failure — the reference passes ``img`` (not the
    original) to the recursive call, so enhancements compound across
    retries (brightness runs twice before contrast ever does).  Kept
    bit-faithful because the compounding is exactly what rescues an
    underexposed patch: one brightness pass leaves both module levels
    below the reader threshold, the second separates them."""
    if index > 3:
        return ""
    img = gray
    for fn in _OPTIMIZATION[:index]:
        img = fn(img)
    payload = decode(img)
    if payload:
        return payload
    return get_qrcode_data(img, index + 1)
