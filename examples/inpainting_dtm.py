"""Inpainting a DTM with missing observations — runnable port of the
reference notebook "Inpainting a DTM with missing observations.ipynb".

The notebook reads a ground raster full of NaN holes (the unsampled
cells of a gridded lidar ground surface) and fills them with
``apply_parallel(inpaint_nans_by_springs, I, 100, 30)`` — tile-wise
spring inpainting with a 30-px halo.  The input raster isn't shipped,
so this port rebuilds the same situation from an ISPRS cloud when
available (grid the ground returns at fine resolution -> real NaN
holes) and otherwise from a synthetic surface with punched holes.

    python examples/inpainting_dtm.py
"""

import os
import sys

import numpy as np

for _p in (os.path.dirname(os.path.abspath(__file__)),
           os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")):
    if _p not in sys.path:
        sys.path.insert(0, _p)
import neilpy_tpu as nt
from _common import FAST, out, use_agg

plt = use_agg()

# ----------------------------------------------------------------------
# Build a holey ground raster (the notebook's ground.tif stand-in)
# ----------------------------------------------------------------------
samp = "/root/reference/sample_data/samp53.txt"
if os.path.exists(samp) and not FAST:
    import pandas as pd
    df = pd.read_csv(samp, header=None, names=["x", "y", "z", "g"],
                     delimiter="\t")
    g = df[df.g == 0]          # labeled ground returns only
    I, T = nt.create_dem(g.x, g.y, g.z, cellsize=2, bin_type="min")
    I = np.asarray(I, dtype=np.float32)
else:
    rng = np.random.default_rng(3)
    H, W = (120, 160) if FAST else (400, 600)
    I = (rng.normal(size=(H, W)).cumsum(axis=0).cumsum(axis=1)
         .astype(np.float32))
    holes = rng.random((H, W)) < .25
    holes[H // 3:H // 3 + H // 6, W // 3:W // 3 + W // 5] = True
    I = np.where(holes, np.nan, I)
    T = nt.from_origin(0, H, 1, 1)

n_nan = int(np.isnan(I).sum())
print(f"raster {I.shape}, {n_nan} NaN cells "
      f"({100 * n_nan / I.size:.1f}%)")
nt.imwrite(out("ground.tif"), I, {"transform": T, "nodata": None})

# ----------------------------------------------------------------------
# Tile-parallel inpaint, exactly the notebook call (cell 4):
# 100x100 tiles with a 30 pixel halo
# ----------------------------------------------------------------------
J = nt.apply_parallel(nt.inpaint_nans_by_springs, I.copy(), 100, 30)
J = np.asarray(J)
print("NaNs after inpaint:", int(np.isnan(J).sum()))
assert not np.isnan(J).any()
# known cells pass through untouched
m = ~np.isnan(I)
assert np.array_equal(J[m], I[m])

# the tiled result matches the untiled solve where the solution is
# locally determined: a spring equilibrium cell is controlled by data
# within a few hole-widths, so inside the 30-px halo contract (cells
# no farther than half the halo from known data) tiled == untiled to
# a tiny fraction of the elevation range.  Cells deeper inside huge
# holes are pure extrapolation in BOTH solves and may genuinely
# differ — the same caveat applies to the notebook's skimage call.
import scipy.ndimage as ndi
J_full = np.asarray(nt.inpaint_nans_by_springs(I.copy()))
dist = ndi.distance_transform_edt(np.isnan(I))
near = dist <= 15
# ... and outside the 30-px global border band, where apply_parallel's
# edge padding replaces the free boundary (the documented contract:
# pixels farther than `depth` from the global edge match untiled)
near[:30, :] = near[-30:, :] = near[:, :30] = near[:, -30:] = False
d = float(np.nanmax(np.abs((J - J_full)[near])))
rng_z = float(np.nanmax(I[m]) - np.nanmin(I[m]))
print(f"tiled vs untiled, cells within 15 px of data: max delta "
      f"{d:.4f} ({100 * d / rng_z:.3f}% of elevation range)")
assert d < 0.02 * rng_z, (d, rng_z)

# ----------------------------------------------------------------------
# Write the result (notebook cell 6)
# ----------------------------------------------------------------------
nt.imwrite(out("ground_inpainted.tif"), J.astype(np.float32),
           {"transform": T, "nodata": None})
K, meta = nt.imread(out("ground_inpainted.tif"))
assert np.allclose(K, J, equal_nan=True)
print("wrote", out("ground_inpainted.tif"))

fig, axes = plt.subplots(1, 2, figsize=(11, 4))
axes[0].imshow(I)
axes[0].set_title("ground with NaN holes")
axes[1].imshow(J)
axes[1].set_title("spring-inpainted")
for ax in axes:
    ax.set_axis_off()
fig.savefig(out("inpainting.png"), dpi=90)
plt.close(fig)

print("inpainting complete")
