"""DEM filters — runnable port of the reference notebook
"DEM Filters.ipynb".

The ``neilpy_tpu.filters`` module carries the pedagogical per-pixel
definitions of the classic neighborhood operators, to be run through
``scipy.ndimage.generic_filter`` exactly as the notebook does.  They
are deliberately slow (a Python call per pixel); this port runs each
one on a crop and then checks it against the fused fast path — the
relationship the notebook describes ("you will find these filters much
slower than equivalent functions") made executable.

    python examples/dem_filters.py
"""

import os
import sys

import numpy as np
import scipy.ndimage as ndi

for _p in (os.path.dirname(os.path.abspath(__file__)),
           os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")):
    if _p not in sys.path:
        sys.path.insert(0, _p)
import neilpy_tpu as nt
from neilpy_tpu.filters import (esri_planar_slope, esri_curvature,
                                terrain_ruggedness, openness_filter,
                                life_filter)
from _common import FAST, load_sample_dem, out, use_agg

plt = use_agg()

Z, cellsize, T = load_sample_dem()
# generic_filter runs a Python function per pixel — crop, as anyone
# sane would (the notebook runs full-size and just waits)
ch, cw = (48, 64) if FAST else (150, 220)
r0, c0 = Z.shape[0] // 3, Z.shape[1] // 3
Zc = np.asarray(Z[r0:r0 + ch, c0:c0 + cw], dtype=float)
print(f"DEM crop {Zc.shape}, cellsize {cellsize}")

# ----------------------------------------------------------------------
# ESRI local planar slope (notebook cells 7-9)
# ----------------------------------------------------------------------
S = ndi.generic_filter(Zc, esri_planar_slope, size=3, mode="nearest",
                       extra_keywords={"cellsize": cellsize,
                                       "degrees": True})
S_fast = np.asarray(nt.esri_slope(Zc, cellsize=cellsize,
                                  return_as="degrees"))
# interior must agree exactly with the vectorized stencil (both are
# Horn 3x3); the border differs only via generic_filter's pad mode
d = np.nanmax(np.abs(S[1:-1, 1:-1] - S_fast[1:-1, 1:-1]))
print(f"slope: generic_filter vs fused interior max delta {d:.2e} deg")
assert d < 5e-3, d   # fast path is f32

# ----------------------------------------------------------------------
# ESRI curvature / profile / plan (notebook cells 12-16)
# ----------------------------------------------------------------------
C = ndi.generic_filter(Zc, esri_curvature, size=3, mode="nearest",
                       extra_keywords={"cellsize": cellsize})
C_profile = ndi.generic_filter(Zc, esri_curvature, size=3, mode="nearest",
                               extra_keywords={"cellsize": cellsize,
                                               "kind": "profile"})
C_plan = ndi.generic_filter(Zc, esri_curvature, size=3, mode="nearest",
                            extra_keywords={"cellsize": cellsize,
                                            "kind": "plan"})
K, K_plan, K_profile = (np.asarray(a) for a in
                        nt.esri_curvature(Zc, cellsize=cellsize))
# reference quirk, replicated for parity: neilpy.py:565-568 and
# filters.py:259-275 define plan/profile with OPPOSITE signs (the
# general curvature agrees); the filters module follows filters.py,
# the fused op follows neilpy.py — hence the flip here
for name, slow, fast in [("curvature", C, K),
                         ("profile", C_profile, -K_profile),
                         ("plan", C_plan, -K_plan)]:
    m = np.isfinite(slow[1:-1, 1:-1]) & np.isfinite(fast[1:-1, 1:-1])
    d = np.nanmax(np.abs((slow[1:-1, 1:-1] - fast[1:-1, 1:-1])[m]))
    print(f"esri {name}: interior max delta {d:.2e}")
    assert d < 5e-3, (name, d)   # f32 vs f64

# ----------------------------------------------------------------------
# Terrain Ruggedness Index, Riley et al. 1999 (notebook cells 18-20)
# ----------------------------------------------------------------------
TRI = ndi.generic_filter(Zc, terrain_ruggedness, size=3)
# vectorized oracle from the same definition: sqrt(mean of squared
# differences to the 8 neighbors)
acc = np.zeros_like(Zc)
for dd in range(8):
    acc += (np.asarray(nt.ashift(Zc, dd)) - Zc) ** 2
TRI_fast = np.sqrt(acc / 8.0)
d = np.nanmax(np.abs(TRI[1:-1, 1:-1] - TRI_fast[1:-1, 1:-1]))
print(f"TRI: generic_filter vs ashift-vectorized interior delta {d:.2e}")
assert d < 1e-9, d

# ----------------------------------------------------------------------
# Openness (notebook cells 22-24) — the windowed per-pixel definition
# vs the full scan at the same lookup distance
# ----------------------------------------------------------------------
lookup_pixels = 3 if FAST else 5
O = ndi.generic_filter(Zc, openness_filter, size=2 * lookup_pixels + 1,
                       extra_keywords={"cellsize": cellsize})
O_fast = np.asarray(nt.openness(Zc, cellsize=cellsize,
                                lookup_pixels=lookup_pixels))
b = lookup_pixels
d = np.nanmax(np.abs(O[b:-b, b:-b] - O_fast[b:-b, b:-b]))
print(f"openness L={lookup_pixels}: interior max delta {d:.2e} deg")
assert d < 5e-3, d   # f32 vs f64

# ----------------------------------------------------------------------
# Conway's life (the notebook module's demo filter) — a glider glides
# ----------------------------------------------------------------------
board = np.zeros((8, 8))
board[1, 2] = board[2, 3] = board[3, 1] = board[3, 2] = board[3, 3] = 1
step = board
for _ in range(4):
    step = ndi.generic_filter(step, life_filter, size=3, mode="constant")
# after 4 generations a glider is the same shape shifted (+1, +1)
assert np.array_equal(step[1:4, 2:5] * 0 + step[2:5, 2:5],
                      step[2:5, 2:5])
assert np.array_equal(np.roll(np.roll(board, 1, 0), 1, 1), step)
print("life: glider advanced one diagonal step in 4 generations")

fig, axes = plt.subplots(1, 4, figsize=(16, 3.2))
for ax, (img, title, cmap) in zip(axes, [
        (S, "slope (deg)", "jet"),
        (C, "esri curvature", "bwr"),
        (TRI, "terrain ruggedness", "jet"),
        (O, "positive openness", "bone")]):
    ax.imshow(img, cmap=cmap)
    ax.set_title(title)
    ax.set_axis_off()
fig.savefig(out("dem_filters.png"), dpi=90)
plt.close(fig)
print("wrote", out("dem_filters.png"))

print("dem filters complete")
