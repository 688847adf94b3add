"""Regenerate the embedded LUT asset tables in neilpy_tpu/viz/.

The reference ships two 256x256 PNG lookup tables as package data
(reference setup.py:31): ``swiss_shading_lookup.png`` (RGB, used by
swiss_shading, neilpy.py:1848-1863) and
``gray_high_contrast_lookup.png`` (grayscale, used by
colortable_shade('gray_high_contrast'), neilpy.py:1870-1878).  For
bit-exact default renders this framework embeds their *content* (both
assets come from the MIT-licensed reference package):

* ``_swiss_lut_residual.bin`` — zlib-compressed int8 row-deltas of the
  residual (asset - corner_lut('swiss')); adding it to the procedural
  cubic-zoom base reproduces the PNG exactly (~25-30 KB).
* ``_gray_hc_lut.bin`` — zlib-compressed int8 row-deltas of the
  grayscale asset itself (no procedural base approximates it well;
  ~6 KB, smaller than the 7 KB PNG).

Run from the repo root after any corner_lut change:
    python tools/gen_lut_assets.py
"""

import os
import sys
import zlib

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/neilpy"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "neilpy_tpu", "viz")


def row_delta_encode(arr):
    """int16 array -> zlib'd int8 row-deltas (first row kept verbatim)."""
    a = arr.astype(np.int16)
    d = np.diff(a, axis=0, prepend=np.zeros_like(a[:1]))
    if d.min() < -128 or d.max() > 127:
        raise ValueError(f"row deltas exceed int8: [{d.min()}, {d.max()}]")
    return zlib.compress(d.astype(np.int8).tobytes(), 9)


def row_delta_decode(blob, shape):
    d = np.frombuffer(zlib.decompress(blob), dtype=np.int8).reshape(shape)
    return np.cumsum(d.astype(np.int16), axis=0)


def main():
    from neilpy_tpu.viz.shading import corner_lut, CORNER_SPECS

    # swiss residual vs the procedural cubic-zoom base
    png = np.asarray(Image.open(os.path.join(REF, "swiss_shading_lookup.png")))
    asset = png[:, :, :3].astype(np.int16)
    base = corner_lut(CORNER_SPECS["swiss"]).astype(np.int16)
    residual = asset - base
    blob = row_delta_encode(residual)
    rec = np.clip(base + row_delta_decode(blob, residual.shape), 0, 255)
    assert np.array_equal(rec.astype(np.uint8), asset.astype(np.uint8))
    fn = os.path.join(OUT, "_swiss_lut_residual.bin")
    open(fn, "wb").write(blob)
    print(f"{fn}: {len(blob)} bytes (residual range "
          f"[{residual.min()}, {residual.max()}])")

    # gray_high_contrast: the asset itself, row-delta coded
    g = np.asarray(Image.open(os.path.join(REF,
                                           "gray_high_contrast_lookup.png")))
    assert g.shape == (256, 256) and g.dtype == np.uint8
    blob = row_delta_encode(g)
    rec = row_delta_decode(blob, g.shape)
    assert np.array_equal(rec.astype(np.uint8), g)
    fn = os.path.join(OUT, "_gray_hc_lut.bin")
    open(fn, "wb").write(blob)
    print(f"{fn}: {len(blob)} bytes")


if __name__ == "__main__":
    main()
