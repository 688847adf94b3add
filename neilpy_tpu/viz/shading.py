"""Terrain cartography: LUT relief shading and atmospheric perspective.

Parity targets (reference neilpy/neilpy.py): swiss_shading 1848-1863,
colortable_shade 1870-1914, brassel_atmospheric_perspective 1993-2031.

The reference indexes 256x256 PNG lookup tables shipped as package
assets.  This framework generates its LUTs procedurally from the same
4-corner colour specs the reference uses for its named styles
(neilpy.py:1884-1900: bilinear `ndi.zoom` between corner colours), and
can also load any user-provided 256x256 LUT array or PNG — including
the reference's own asset files, for bit-comparison.  The shading
itself is a pair of uint8 gathers per channel, fused under jit.

Design fix: the reference's ``colortable_shade`` references ``lut``
before assignment for every named spec except 'gray'
(neilpy.py:1896-1900); here every named spec allocates its own LUT.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.surface import hillshade

__all__ = ["swiss_shading", "colortable_shade", "corner_lut",
           "brassel_atmospheric_perspective", "lut_shade"]


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


def corner_lut(spec):
    """Build a 256x256x3 uint8 LUT by bilinear interpolation between
    four corner colours (equivalent to the reference's
    ``ndi.zoom([[c00, c01], [c10, c11]], 128)`` construction)."""
    spec = np.asarray(spec, dtype=np.float64)
    t = np.linspace(0.0, 1.0, 256)
    wy = t[:, None]          # elevation axis
    wx = t[None, :]          # illumination axis
    lut = np.zeros((256, 256, 3), dtype=np.uint8)
    for ch in range(3):
        c00, c01, c10, c11 = spec[0, ch], spec[1, ch], spec[2, ch], spec[3, ch]
        top = c00 * (1 - wx) + c01 * wx
        bot = c10 * (1 - wx) + c11 * wx
        lut[:, :, ch] = np.round(top * (1 - wy) + bot * wy).astype(np.uint8)
    return lut


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
    neilpy.py:1848-1863).  ``lut`` may override the procedural LUT with
    a 256x256x3 array (e.g. loaded from the reference's
    ``swiss_shading_lookup.png``)."""
    if lut is None:
        lut = corner_lut(CORNER_SPECS["swiss"])
    else:
        lut = _load_lut(lut)
    return lut_shade(Z, lut, cellsize)


def colortable_shade(Z, name="swiss", cellsize=1):
    """Generalised LUT shading (parity: neilpy.py:1870-1914, with the
    unbound-lut bug fixed by construction)."""
    if isinstance(name, str) and name == "gray_high_contrast":
        # high-contrast gray ramp: steeper illumination response
        t = np.linspace(0, 1, 256)
        g = np.clip((t[None, :] - 0.2) / 0.6, 0, 1)
        lut = np.round(255 * np.repeat(g, 256, axis=0)).astype(np.uint8)
        lut = np.stack((lut, lut, lut), axis=2)
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
