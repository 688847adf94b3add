"""Curvature families compared — runnable port of the reference
notebook "Curvature.ipynb".

Loads the sample DEM, takes the notebook's sub-extract, computes the
Evans/Wood curvatures plus the ESRI and Zevenbergen & Thorne variants,
prints their cross-correlation structure, and writes the notebook's
blue-white-red comparison panels.

    python examples/curvature_comparison.py
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
# the notebook's extract Z[0:800, 600:1200] (scaled down in fast mode)
r1, c0, c1 = (160, 120, 360) if FAST else (800, 600, 1200)
Z = Z[:min(r1, Z.shape[0]), c0:min(c1, Z.shape[1])]
print(f"extract {Z.shape}, cellsize {cellsize}")

# ----------------------------------------------------------------------
# Evans/Wood curvatures (notebook cells 3-4).  The stale notebook
# unpacks five values; the reference function actually returns six
# (neilpy.py:737): K, profile, plan, tan, long, cross.
# ----------------------------------------------------------------------
labels = ["K", "profile", "plan", "tan", "long", "cross"]
C = [np.asarray(c) for c in nt.evans_curvature(Z, cellsize)]
assert len(C) == 6 and all(c.shape == Z.shape for c in C)

n = len(labels)
corr = np.ones((n, n))
for i in range(n):
    for j in range(n):
        a, b = C[i].ravel(), C[j].ravel()
        ok = np.isfinite(a) & np.isfinite(b)
        corr[i, j] = np.corrcoef(a[ok], b[ok])[0, 1]
print("Evans curvature cross-correlations:")
print("        " + "".join(f"{l:>9s}" for l in labels))
for i, l in enumerate(labels):
    print(f"{l:>8s}" + "".join(f"{corr[i, j]:9.3f}" for j in range(n)))
# plan and tangential curvature measure the same normal-section family
assert corr[labels.index("plan"), labels.index("tan")] > 0.5

fig, axes = plt.subplots(1, 3, figsize=(15, 5))
for ax, name in zip(axes, ["plan", "profile", "tan"]):
    c = C[labels.index(name)]
    lim = np.nanpercentile(np.abs(c), 90)
    ax.imshow(c, cmap="bwr", vmin=-lim, vmax=lim)
    ax.set_title(name)
    ax.axis("off")
fig.savefig(out("evans_curvatures.png"), dpi=120)
plt.close(fig)
print("wrote", out("evans_curvatures.png"))

# ----------------------------------------------------------------------
# The other families: ESRI (the notebook's second main routine), the
# Z&T six-pack, Wilson & Gallant, and the plain -100*Laplacian.
# ----------------------------------------------------------------------
K_esri, K_plan, K_profile = (np.asarray(c) for c in
                             nt.esri_curvature(Z, cellsize))
zt = [np.asarray(c) for c in
      nt.zevenbergen_and_thorne_curvature(Z, cellsize)]
wg = [np.asarray(c) for c in nt.wilson_gallant_curvature(Z, cellsize)]
K_lap = np.asarray(nt.curvature(Z, cellsize))

def _corr(a, b):
    a, b = np.ravel(a), np.ravel(b)
    ok = np.isfinite(a) & np.isfinite(b)
    return np.corrcoef(a[ok], b[ok])[0, 1]

# all general-curvature flavours measure the same quantity; note the
# sign conventions differ (ESRI reports convex-up as positive via a
# -200 scale, Z&T's K keeps the quadric's sign)
print(f"corr(ESRI K, Z&T K)        = {_corr(K_esri, zt[0]):.4f}")
print(f"corr(ESRI K, -100*laplace) = {_corr(K_esri, K_lap):.4f}")
assert abs(_corr(K_esri, zt[0])) > 0.9
assert _corr(K_esri, K_lap) > 0.9

fig, axes = plt.subplots(2, 2, figsize=(12, 9))
panels = [(K_esri, "ESRI K"), (zt[0], "Z&T K"),
          (wg[0], "Wilson-Gallant K"), (K_lap, "-100 * Laplacian")]
for ax, (c, name) in zip(axes.ravel(), panels):
    lim = np.nanpercentile(np.abs(c), 90) or 1.0
    ax.imshow(c, cmap="bwr", vmin=-lim, vmax=lim)
    ax.set_title(name)
    ax.axis("off")
fig.savefig(out("curvature_families.png"), dpi=120)
plt.close(fig)
print("wrote", out("curvature_families.png"))

print("curvature comparison complete")
