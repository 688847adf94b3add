"""Terrain visualization gallery — runnable port of the reference
notebook "Terrain Visualization and Processing.ipynb".

The full cartographic stack on one DEM: slope, aspect, ESRI curvature,
hillshade, multiple illumination, PSSM bonemap, skyview factor,
openness, geomorphon classes, Swiss shading (Jenny & Hurni) and the
corner-LUT colortable variants, finished with Brassel atmospheric
perspective.

    python examples/terrain_visualization.py
"""

import os
import sys

import numpy as np

for _p in (os.path.dirname(os.path.abspath(__file__)),
           os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")):
    if _p not in sys.path:
        sys.path.insert(0, _p)
import neilpy_tpu as nt
from _common import FAST, load_sample_dem, out, use_agg

plt = use_agg()

Z, cellsize, T = load_sample_dem()
lookup = 8 if FAST else 20
print(f"DEM {Z.shape}, cellsize {cellsize}")

# ----------------------------------------------------------------------
# Derivative surfaces (notebook cells 3-12)
# ----------------------------------------------------------------------
S = np.asarray(nt.slope(Z, cellsize=cellsize, return_as="degrees"))
assert (S >= 0).all() and (S <= 90).all()

A = np.asarray(nt.aspect(Z, return_as="degrees", flat_as=np.nan))
ok = np.isfinite(A)
assert (A[ok] >= 0).all() and (A[ok] <= 360).all()

K, K_plan, K_profile = (np.asarray(c) for c in
                        nt.esri_curvature(Z, cellsize=cellsize))

H = np.asarray(nt.hillshade(Z, cellsize=cellsize, zenith=45, azimuth=315))
assert H.min() >= 0 and H.max() <= 255

MH = np.asarray(nt.multiple_illumination(Z, cellsize=cellsize,
                                         zeniths=np.array([45]),
                                         azimuths=3))
P = np.asarray(nt.pssm(Z, cellsize=cellsize))
assert P.shape[-1] in (3, 4)  # colormapped RGB(A)

SV = np.asarray(nt.skyview_factor(Z, cellsize=cellsize,
                                  lookup_pixels=lookup))
assert (SV <= 1 + 1e-6).all()

O = np.asarray(nt.openness(Z, cellsize=cellsize,
                           lookup_pixels=max(4, lookup // 2)))
G = np.asarray(nt.geomorphons(Z, cellsize=cellsize, lookup_pixels=lookup,
                              threshold_angle=1))

# ----------------------------------------------------------------------
# Cartographic renders (notebook cells 15-17): Swiss shading from the
# Jenny & Hurni LUT structure, plus corner-LUT variants.
# ----------------------------------------------------------------------
SW = np.asarray(nt.swiss_shading(Z, cellsize))
assert SW.shape == Z.shape + (3,) and SW.dtype == np.uint8

variants = ["swiss", "swiss_dark", "swiss_green", "bare_earth_dark"]
shades = {name: np.asarray(nt.colortable_shade(Z, name, cellsize))
          for name in variants}

B = np.asarray(nt.brassel_atmospheric_perspective(H.astype(float), Z, k=2))

# ----------------------------------------------------------------------
# Gallery figure
# ----------------------------------------------------------------------
panels = [
    (Z, "elevation", dict(cmap="terrain")),
    (S, "slope", dict(cmap="bone_r")),
    (A, "aspect", dict(cmap="hsv")),
    (K, "ESRI curvature", dict(cmap="bwr", vmin=-1, vmax=1)),
    (H, "hillshade", dict(cmap="gray", vmin=0, vmax=255)),
    (MH, "multiple illumination", dict(cmap="gray_r")),
    (P, "PSSM bonemap", {}),
    (SV, "skyview factor", dict(cmap="bone")),
    (O, "openness", dict(cmap="gray",
                         vmin=np.percentile(O, 5),
                         vmax=np.percentile(O, 95))),
    (G, "geomorphons", dict(cmap="tab10")),
    (SW, "swiss shading", {}),
    (B, "brassel perspective", dict(cmap="gray")),
]
fig, axes = plt.subplots(3, 4, figsize=(18, 10))
for ax, (img, title, kw) in zip(axes.ravel(), panels):
    ax.imshow(img, **kw)
    ax.set_title(title)
    ax.axis("off")
fig.tight_layout()
fig.savefig(out("terrain_gallery.png"), dpi=110)
plt.close(fig)
print("wrote", out("terrain_gallery.png"))

fig, axes = plt.subplots(2, 2, figsize=(12, 8))
for ax, name in zip(axes.ravel(), variants):
    ax.imshow(shades[name])
    ax.set_title(name)
    ax.axis("off")
fig.savefig(out("colortable_variants.png"), dpi=110)
plt.close(fig)
print("wrote", out("colortable_variants.png"))

print("terrain visualization complete")
