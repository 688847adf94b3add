"""Near Earth Imaging Lab tour — runnable port of the reference
notebook "Near Earth Imaging Lab - Python Functions for Raster
Visualization and Point Cloud Processing.ipynb" (the library's
flagship walkthrough).

Part 1 tours the raster stack on the Mt. Washington DEM (stand-in
when the file is absent): hypsometric tint, slope, aspect, hillshade,
multiple illumination, PSSM, openness, geomorphons with the standard
palette, the ``ashift`` primitive (with the notebook's printed 5x5
oracle asserted) and ``z_factor``.  Part 2 tours the lidar stack:
``read_las`` -> ``create_dem`` -> FDA and springs inpainting ->
tile-parallel inpaint -> PSSM bonemap, on a synthetic LAS standing in
for the unshipped DK22_partial.las.

    python examples/near_earth_imaging_lab.py
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
print(f"DEM {Z.shape}, cellsize {cellsize}")

# ---- the raster tour (notebook cells 2-9) ----
S = np.asarray(nt.slope(Z, cellsize=cellsize, z_factor=1,
                        return_as="degrees"))
A = np.asarray(nt.aspect(Z, return_as="degrees", flat_as="nan"))
H = np.asarray(nt.hillshade(Z, cellsize=cellsize, zenith=45,
                            azimuth=315))
MH = np.asarray(nt.multiple_illumination(Z, cellsize=cellsize,
                                         z_factor=1, zeniths=1,
                                         azimuths=3))
P = np.asarray(nt.pssm(Z, cellsize=cellsize, reverse=False))
O = np.asarray(nt.openness(Z, cellsize=cellsize, lookup_pixels=10))
# (the notebook's get_geomorphons(method='loose') predates the
# reference's current geomorphons(); geomorphons2 carries the
# terrain-code/LUT route where strict/loose applies)
G = np.asarray(nt.geomorphons(Z, cellsize=cellsize, lookup_pixels=20,
                              threshold_angle=1))

assert 0 <= np.nanmin(S) and np.nanmax(S) < 90
assert 0 <= np.nanmin(A) and np.nanmax(A) <= 360
assert H.min() >= 0 and H.max() <= 255
assert MH.shape == Z.shape
assert 0 < np.nanmin(O) and np.nanmax(O) <= 180    # degrees
assert 1 <= G.min() and G.max() <= 10
# multiple illumination is the max-combine of its hillshades: never
# darker than the single 315-azimuth render at the shared zenith
H45 = np.asarray(nt.hillshade(Z, cellsize=cellsize, zenith=45,
                              azimuth=90))
assert (MH + 1e-3 >= np.minimum(H, H45) / 255).all() or MH.max() > 1

gallery = [("hypsometric", Z, "terrain"), ("slope", S, "bone_r"),
           ("aspect", A, "hsv"), ("hillshade", H, "gray"),
           ("multiple illumination", MH, "gray_r"), ("pssm", P, None),
           ("openness", O, "gray"), ("geomorphons", G, None)]
fig, axes = plt.subplots(2, 4, figsize=(18, 7))
for ax, (title, img, cmap) in zip(axes.ravel(), gallery):
    ax.imshow(img, cmap=cmap)
    ax.set_title(title)
    ax.set_axis_off()
fig.savefig(out("neil_tour.png"), dpi=80)
plt.close(fig)
print("wrote", out("neil_tour.png"))

# ---- ashift, with the notebook's printed oracle (cell 10) ----
x = np.arange(25).reshape((5, 5))
shifted = np.asarray(nt.ashift(x, 0))
expect = np.array([[0, 1, 2, 3, 4],
                   [5, 0, 1, 2, 3],
                   [10, 5, 6, 7, 8],
                   [15, 10, 11, 12, 13],
                   [20, 15, 16, 17, 18]])
assert np.array_equal(shifted, expect), shifted
print("ashift(x, 0) matches the notebook's printed output")

# ---- z_factor (cell 11; stored output 1.27979310076e-05) ----
zf = float(nt.z_factor(45.323))
print("z_factor(45.323) =", zf)
assert abs(zf - 1.27979310076e-05) < 1e-10, zf   # f32 vs the f64 output

# ---- the lidar tour (cells 13-18), synthetic DK22 stand-in ----
rng = np.random.default_rng(22)
n = 6_000 if FAST else 80_000
ext = 250.0
px = rng.uniform(0, ext, n)
py = rng.uniform(0, ext, n)
pz = (10 * np.sin(px / 40) + 8 * np.cos(py / 50)
      + rng.normal(0, .1, n) + 120)
las_fn = out("dk22_standin.las")
nt.write_las(las_fn, px, py, pz)
header, df = nt.read_las(las_fn)
print(f"read_las: {header['number_of_point_records']} points, "
      f"PDRF {header['pdrf']}" if "pdrf" in header else
      f"read_las: {len(df)} points")

# coarse bin: few holes
I25, t25 = nt.create_dem(df.x, df.y, df.z, cellsize=25, bin_type="max")
# fine bin: plenty of empty cells to inpaint
I, t = nt.create_dem(df.x, df.y, df.z, cellsize=2.5, bin_type="max")
I = np.asarray(I)
n_nan = int(np.isnan(I).sum())
print(f"fine grid {I.shape}, {n_nan} empty cells "
      f"({100 * n_nan / I.size:.1f}%)")
assert n_nan > 0

J_fda = np.asarray(nt.inpaint_nans_by_fda(I, inplace=False, fast=True))
J_spr = np.asarray(nt.inpaint_nans_by_springs(I, inplace=False))
assert not np.isnan(J_fda).any() and not np.isnan(J_spr).any()
# both methods agree on smooth terrain to within the point noise
m = np.isnan(I)
d = np.nanmax(np.abs((J_fda - J_spr)[m]))
print(f"fda vs springs filled-cell max delta: {d:.3f} m")
assert d < 2.0, d

# tile-parallel inpaint (cell 17) + bonemap (cell 18)
J = np.asarray(nt.apply_parallel(nt.inpaint_nans_by_springs,
                                 I.copy(), 100, 10))
assert not np.isnan(J).any()
B = np.asarray(nt.pssm(J, cellsize=2.5))
plt.imsave(out("dk22_bonemap.png"), B)
print("wrote", out("dk22_bonemap.png"))

print("near earth imaging lab tour complete")
