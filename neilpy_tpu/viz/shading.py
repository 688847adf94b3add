"""Terrain cartography: LUT relief shading and atmospheric perspective.

Parity targets (reference neilpy/neilpy.py): swiss_shading 1848-1863,
colortable_shade 1870-1914, brassel_atmospheric_perspective 1993-2031.

The reference indexes 256x256 PNG lookup tables shipped as package
assets.  This framework generates its LUTs procedurally from the same
4-corner colour specs the reference uses for its named styles,
reproducing the reference's ``ndi.zoom([[2x2 corners]], 128)``
cubic-spline interpolation exactly (neilpy.py:1884-1900; see
``corner_lut``).  Two embedded tables make the asset-backed styles
bit-identical to the reference's shipped PNGs: the default 'swiss' LUT
(``swiss_lut``, corner base + residual) and 'gray_high_contrast'
(``_gray_high_contrast_lut``).  Any user-provided 256x256 LUT array or
PNG also loads — including the reference's own asset files, for
bit-comparison.  The shading itself is a pair of uint8 gathers per
channel, fused under jit.

Design fix: the reference's ``colortable_shade`` references ``lut``
before assignment for every named spec except 'gray'
(neilpy.py:1896-1900); here every named spec allocates its own LUT.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.surface import hillshade

__all__ = ["swiss_shading", "colortable_shade", "corner_lut",
           "swiss_lut", "brassel_atmospheric_perspective", "lut_shade"]


# 4-corner colour specs: rows are [top-left, top-right, bottom-left,
# bottom-right] corners of the (elevation x illumination) LUT
# (identical values to neilpy.py:1884-1896).
CORNER_SPECS = {
    "bare_earth_dark": [[90, 74, 84], [95, 77, 85], [40, 38, 74],
                        [116, 102, 109]],
    "bare_earth_medium": [[189, 169, 107], [203, 179, 114], [0, 0, 10],
                          [116, 102, 109]],
    "bare_earth_light": [[189, 169, 107], [203, 179, 114], [0, 0, 10],
                         [255, 255, 255]],
    "swiss_dark": [[110, 79, 107], [190, 192, 173], [40, 38, 74],
                   [244, 244, 190]],
    "swiss": [[129, 137, 131], [190, 192, 173], [117, 124, 121],
              [244, 244, 190]],
    "swiss_green": [[118, 162, 120], [177, 232, 158], [111, 123, 115],
                    [242, 254, 186]],
    "gray": [[0, 0, 0], [119, 119, 119], [1, 1, 1], [255, 255, 255]],
}


def _cubic_zoom_weights(n_out=256):
    """Interpolation weights of ``scipy.ndimage.zoom`` on a 2-sample
    axis (order-3 B-spline, mirror boundary), in closed form.

    For two samples (a, b) the mirror-extended cubic-spline
    coefficients are c0 = 2a - b, c1 = 2b - a, and zoom samples the
    spline at x_k = k/(n_out-1) in [0, 1], so the value is a fixed
    linear blend w_a(x)·a + w_b(x)·b with

        w_a = 2(B(x) + B(x-2)) - (B(x+1) + B(x-1)),   w_b = 1 - w_a

    (B = cubic B-spline kernel).  Verified bit-equal (after rounding)
    to ``ndi.zoom`` for every named corner spec; the nearest value sits
    2.6e-8 from a rounding boundary, far above f64 noise."""

    def B3(t):
        t = np.abs(t)
        return np.where(t < 1, 2 / 3 - t ** 2 + t ** 3 / 2,
                        np.where(t < 2, (2 - t) ** 3 / 6, 0.0))

    x = np.arange(n_out) / (n_out - 1)
    wa = 2 * (B3(x) + B3(x - 2)) - (B3(x + 1) + B3(x - 1))
    wb = 2 * (B3(x + 1) + B3(x - 1)) - (B3(x) + B3(x - 2))
    return np.stack([wa, wb], axis=1)          # (n_out, 2)


def corner_lut(spec):
    """Build a 256x256x3 uint8 LUT from four corner colours,
    reproducing the reference's ``ndi.zoom([[c00, c01], [c10, c11]],
    128)`` cubic-spline construction exactly (neilpy.py:1896-1900 —
    note the zoom is NOT bilinear: the spline overshoots between
    corners, up to 34/255 on the 'gray' spec).  Output is clipped to
    [0, 255]; no named spec actually overshoots the uint8 range, so
    this is unobservable for parity (the reference would wrap)."""
    spec = np.asarray(spec, dtype=np.float64)
    w = _cubic_zoom_weights()
    lut = np.zeros((256, 256, 3), dtype=np.uint8)
    for ch in range(3):
        C = np.array([[spec[0, ch], spec[1, ch]],
                      [spec[2, ch], spec[3, ch]]])
        v = np.round(w @ C @ w.T)
        lut[:, :, ch] = np.clip(v, 0, 255).astype(np.uint8)
    return lut


def _decode_row_deltas(filename, shape):
    """Decode a zlib'd int8 row-delta table (tools/gen_lut_assets.py)
    back to the int16 array it encodes."""
    import os
    import zlib
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        filename)
    deltas = np.frombuffer(zlib.decompress(open(path, "rb").read()),
                           dtype=np.int8).reshape(shape)
    return np.cumsum(deltas.astype(np.int16), axis=0)


_SWISS_LUT_CACHE = None


def swiss_lut():
    """The exact 256x256x3 swiss-shading LUT the reference ships as
    ``swiss_shading_lookup.png`` (neilpy.py:1848-1863).

    ``_swiss_lut_residual.bin`` embeds the CONTENT of that reference
    asset (a data table from the MIT-licensed neilpy package), stored
    as zlib-compressed int8 row-deltas of the residual against the
    procedural ``corner_lut('swiss')`` base (~25 KB; regenerate with
    tools/gen_lut_assets.py).  The corner interpolation alone differs
    from the shipped asset by up to ~25/255 — the asset was hand-tuned,
    not generated from the corner spec — so the residual is what makes
    default renders bit-identical to the reference's."""
    global _SWISS_LUT_CACHE
    if _SWISS_LUT_CACHE is None:
        base = corner_lut(CORNER_SPECS["swiss"]).astype(np.int16)
        residual = _decode_row_deltas("_swiss_lut_residual.bin",
                                      (256, 256, 3))
        lut = np.clip(base + residual, 0, 255).astype(np.uint8)
        # the cache is shared process state: hand out read-only views
        # so a caller mutation can't corrupt later default renders
        lut.flags.writeable = False
        _SWISS_LUT_CACHE = lut
    return _SWISS_LUT_CACHE.view()


_GRAY_HC_LUT_CACHE = None


def _gray_high_contrast_lut():
    """The exact 256x256 grayscale LUT the reference ships as
    ``gray_high_contrast_lookup.png`` (used by
    ``colortable_shade('gray_high_contrast')``, neilpy.py:1870-1878),
    replicated to 3 channels as the reference does.

    ``_gray_hc_lut.bin`` embeds the content of that reference asset
    (MIT-licensed neilpy package data) as zlib'd int8 row-deltas (~6 KB
    — no procedural base approximates it: an ad-hoc contrast ramp
    missed it by mean 48/255).  Regenerate with
    tools/gen_lut_assets.py."""
    global _GRAY_HC_LUT_CACHE
    if _GRAY_HC_LUT_CACHE is None:
        g = _decode_row_deltas("_gray_hc_lut.bin", (256, 256))
        g = np.clip(g, 0, 255).astype(np.uint8)
        lut = np.stack((g, g, g), axis=2)
        lut.flags.writeable = False
        _GRAY_HC_LUT_CACHE = lut
    return _GRAY_HC_LUT_CACHE.view()


def _load_lut(name):
    if isinstance(name, str):
        if name.endswith(".png"):
            import matplotlib.pyplot as plt
            lut = plt.imread(name)
            if lut.ndim == 2:
                lut = np.stack((lut, lut, lut), axis=2)
            if lut.shape[2] > 3:
                lut = lut[:, :, :3]
            if lut.dtype != np.uint8:
                lut = np.round(255 * lut).astype(np.uint8)
            return lut
        if name == "swiss":
            return swiss_lut()
        if name in CORNER_SPECS:
            return corner_lut(CORNER_SPECS[name])
        raise ValueError(f"unknown colortable '{name}'")
    lut = np.asarray(name)
    if lut.ndim != 3:
        lut = np.stack((lut, lut, lut), axis=2)
    return lut


def lut_shade(Z, lut, cellsize=1):
    """Index a 256x256 (elevation x hillshade) LUT: the shared core of
    swiss_shading / colortable_shade (three uint8 gathers)."""
    Z = jnp.asarray(Z, dtype=jnp.float32)
    H = hillshade(Z, cellsize)
    zmin = jnp.nanmin(Z)
    zmax = jnp.nanmax(Z)
    Z_norm = jnp.round(255 * (Z - zmin) / (zmax - zmin)).astype(jnp.uint8)
    lut = jnp.asarray(lut)
    idx_z = Z_norm.astype(jnp.int32)
    idx_h = H.astype(jnp.int32)
    return lut[idx_z, idx_h]      # (H, W, 3) gather


def swiss_shading(Z, cellsize=1, lut=None):
    """Jenny & Hurni Swiss-style relief shading (parity:
    neilpy.py:1848-1863).  The default LUT is ``swiss_lut()`` — bit-
    identical to the reference's shipped ``swiss_shading_lookup.png``
    asset, so default renders match the reference's exactly.  ``lut``
    may override it with any 256x256x3 array or PNG path."""
    if lut is None:
        lut = swiss_lut()
    else:
        lut = _load_lut(lut)
    return lut_shade(Z, lut, cellsize)


def colortable_shade(Z, name="swiss", cellsize=1):
    """Generalised LUT shading (parity: neilpy.py:1870-1914, with the
    unbound-lut bug fixed by construction)."""
    if isinstance(name, str) and name == "gray_high_contrast":
        lut = _gray_high_contrast_lut()
    else:
        lut = _load_lut(name)
    return lut_shade(Z, lut, cellsize)


def brassel_atmospheric_perspective(H, Z, k, flat=180, Zmid=None,
                                    reverse=False, C2=0):
    """Brassel (1974) atmospheric-perspective contrast on hillshades
    (parity: neilpy.py:1993-2031)."""
    if k < 1:
        raise ValueError("k must be equal to or greater than one.")
    H = jnp.asarray(H, dtype=jnp.float32)
    Z = jnp.asarray(Z, dtype=jnp.float32)
    was_int = bool(jnp.any(H > 1))
    if was_int:
        H = H / 255.0
    if flat > 1:
        flat = flat / 255.0
    Zmin = jnp.nanmin(Z)
    Zmax = jnp.nanmax(Z)
    if Zmid is None:
        Zstar = (Z - (Zmax + Zmin) / 2) / ((Zmax - Zmin) / 2)
    else:
        from ..core.grid import normalize
        Zstar = normalize(Z, xrange=[Zmin, Zmid, Zmax], yrange=[-1, 0, 1])
    if reverse:
        Zstar = -Zstar
    exponent = jnp.exp(Zstar * jnp.log(jnp.float32(k)))
    H_new = (H - flat) * exponent + flat
    H_new = jnp.clip(H_new, 0.0, 1.0)
    if C2 != 0:
        H_new = H_new + (C2 * (Zstar - 1)) / 2
    if was_int:
        H_new = jnp.round(255 * H_new).astype(jnp.uint8)
    return H_new
