"""Spatial autocorrelation on a raster — runnable port of the
reference notebook "Spatial Autocorrelation on a Raster.ipynb".

Getis-Ord Gi* hotspot detection on slope and on curvature, the
ArcGIS-style significance bins, the hotspot GeoTIFF + worldfile the
notebook writes, plus the global/local Moran's I statistics this
framework adds beyond reference parity.

    python examples/spatial_autocorrelation.py
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
if FAST:
    Z = Z[:200, :300]
print(f"DEM {Z.shape}, cellsize {cellsize}")

# ----------------------------------------------------------------------
# Gi* on slope (notebook cells 4-5): footprint=7 square neighborhood
# ----------------------------------------------------------------------
S = np.asarray(nt.slope(Z, cellsize))
Zs, Ps, Gs = nt.rasterGi(S, footprint=7)
Zs, Gs = np.asarray(Zs), np.asarray(Gs)
assert Gs.shape == Z.shape
# z-scores must be standard-normal-ish over a large raster: both tails
# populated and significance bins present
print(f"slope Gi* z-scores: min {Zs.min():.1f} max {Zs.max():.1f}; "
      f"bins {sorted(np.unique(Gs).astype(int))}")
assert Zs.max() > 2 and Zs.min() < -2
assert set(np.unique(Gs).astype(int)) <= {-3, -2, -1, 0, 1, 2, 3}

# ----------------------------------------------------------------------
# Gi* on curvature (notebook cells 7-8): Laplacian of the DEM
# ----------------------------------------------------------------------
C = np.asarray(nt.curvature(Z, cellsize)) / -100.0  # back to a plain Laplacian
Zc, Pc, Gc = nt.rasterGi(C, footprint=7)
Zc, Gc = np.asarray(Zc), np.asarray(Gc)

fig, axes = plt.subplots(1, 2, figsize=(12, 5))
axes[0].imshow(Gs, cmap="bwr", vmin=-3, vmax=3)
axes[0].set_title("slope hotspots (Gi* bins)")
axes[1].imshow(Gc, cmap="bwr", vmin=-3, vmax=3)
axes[1].set_title("curvature hotspots (Gi* bins)")
for ax in axes:
    ax.axis("off")
fig.savefig(out("gi_hotspots.png"), dpi=120)
plt.close(fig)
print("wrote", out("gi_hotspots.png"))

# the notebook's outputs: hotspot raster + worldfile
nt.imwrite(out("curvature_hotspots.tif"), Gc.astype(np.int16),
           {"transform": T, "nodata": None})
nt.write_worldfile(T, out("curvature_hotspots.tfw"))
print("wrote", out("curvature_hotspots.tif"), "+ .tfw")

# ----------------------------------------------------------------------
# Beyond parity: Moran's I (global + local), same neighbor logic
# ----------------------------------------------------------------------
I_global, E_I, z_I = (float(v) for v in nt.morans_i(S, footprint=7))
I_local = np.asarray(nt.local_morans_i(S, footprint=7))
print(f"global Moran's I on slope: {I_global:.4f} "
      f"(E[I] {E_I:.5f}, z {z_I:.1f})")
# terrain slope is positively autocorrelated, overwhelmingly
# significant under the normality null
assert 0.05 < I_global <= 1.01 and z_I > 10
assert I_local.shape == Z.shape

# ----------------------------------------------------------------------
# Multi-chip: the same statistics sharded over the device mesh
# (skipped on a single device; pytest runs this on 8 virtual devices)
# ----------------------------------------------------------------------
import jax

if len(jax.devices()) >= 2:
    from neilpy_tpu.dist import make_mesh, sharded_morans_i, sharded_rastergi

    mesh = make_mesh()
    Zd, Pd, Gd = sharded_rastergi(S, footprint=7, mesh=mesh)
    np.testing.assert_allclose(np.asarray(Zd), Zs, rtol=2e-4, atol=2e-4)
    I_d, _, z_d = (float(v) for v in sharded_morans_i(S, footprint=7,
                                                      mesh=mesh))
    assert abs(I_d - I_global) < 1e-3, (I_d, I_global)
    print(f"sharded over {mesh.devices.size} devices: "
          f"Gi* and global Moran's I match the single-device values")
else:
    print("single device: skipping the sharded cross-check")

print("spatial autocorrelation complete")
