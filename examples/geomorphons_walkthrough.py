"""Geomorphons, openness, and terrain codes — runnable port of the
reference notebook "Geomorphons, Openness, and Terrain Codes.ipynb".

Walks the same path: DEM -> geomorphon classes (paletted PNG +
worldfile), positive/negative openness, the 3x3 micro-morphology
oracles from Jasiewicz & Stepinski's Figure 3, ternary terrain codes
and their lowest rotational/reflectional equivalents, the terrain-code
frequency distribution, and the `ashift` primitive that powers the
whole stack.

    python examples/geomorphons_walkthrough.py
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

Z, cellsize, T, source = load_sample_dem(return_source=True)
if source == "ovr":
    # real terrain at 2x/4x reduction: hold the notebook's PHYSICAL
    # lookup distance (25 px at full res) across the resolution change
    lookup = max(3, round(25 * Z.shape[0] / 847))
else:
    lookup = 10 if FAST else 25
print(f"DEM {Z.shape} ({source}), cellsize {cellsize}, "
      f"lookup_pixels {lookup}")

# ----------------------------------------------------------------------
# Geomorphon classes (notebook cell 5): 1 flat, 2 peak, 3 ridge,
# 4 shoulder, 5 spur, 6 slope, 7 hollow, 8 footslope, 9 valley, 10 pit
# ----------------------------------------------------------------------
G = np.asarray(nt.geomorphons(Z, cellsize=cellsize, lookup_pixels=lookup,
                              threshold_angle=1))
assert G.shape == Z.shape and 1 <= G.min() and G.max() <= 10
counts = np.bincount(G.ravel(), minlength=11)[1:]
for cls, name in enumerate(["flat", "peak", "ridge", "shoulder", "spur",
                            "slope", "hollow", "footslope", "valley",
                            "pit"], start=1):
    print(f"  {cls:2d} {name:10s} {100 * counts[cls - 1] / G.size:6.2f}%")

# paletted PNG + worldfile, like the notebook's imsave + write_worldfile
nt.write_paletted_png(out("sample_dem_geomorphons.png"),
                      G.astype(np.uint8), nt.geomorphon_cmap())
nt.write_worldfile(T, out("sample_dem_geomorphons.pgw"))
print("wrote", out("sample_dem_geomorphons.png"), "+ .pgw")

# When real terrain feeds this walkthrough (the full-res file via
# SAMPLE_DEM, or the .ovr-recovered 2x/4x DEM), compare against the
# golden portal raster like notebook cells 6-8.
golden = "/root/reference/sample_data/sample_dem_geomorphons.tif"
if source in ("full", "ovr") and os.path.exists(golden):
    G2, _ = nt.imread(golden)
    k = round(G2.shape[0] / G.shape[0])
    sub = G2[::k, ::k][:G.shape[0], :G.shape[1]]
    agreement = np.mean(G == sub)
    print(f"agreement vs portal raster ({k}x subsampled): "
          f"{agreement:.4f}")
    assert agreement > (0.5 if k > 1 else 0.7), agreement

# ----------------------------------------------------------------------
# Openness (notebook cells 9-11): negative openness is the positive
# openness of the negated DEM.
# ----------------------------------------------------------------------
O_pos = np.asarray(nt.openness(Z, cellsize=cellsize,
                               lookup_pixels=max(5, lookup // 2)))
O_neg = np.asarray(nt.openness(-Z, cellsize=cellsize,
                               lookup_pixels=max(5, lookup // 2)))
assert (O_pos > 0).all() and (O_pos < 180).all()
fig, axes = plt.subplots(1, 2, figsize=(10, 5))
for ax, O, title in [(axes[0], O_pos, "positive openness"),
                     (axes[1], O_neg, "negative openness")]:
    ax.imshow(O, cmap="jet", vmin=np.percentile(O, 5),
              vmax=np.percentile(O, 95))
    ax.set_title(title)
    ax.axis("off")
fig.savefig(out("openness.png"), dpi=120)
plt.close(fig)
print("wrote", out("openness.png"))

# ----------------------------------------------------------------------
# 3x3 micro-morphologies (notebook cells 14-17) — the J&S Figure 3
# oracles, asserted.
# ----------------------------------------------------------------------
micro = [
    (np.array([[1, 1, 1], [1, 2, 1], [1, 1, 1]], float), 2, "peak"),
    (np.array([[0, 0, 0], [2, 1, 2], [2, 2, 2]], float), 7, "hollow"),
    (np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], float), 10, "pit"),
    # the notebook's cell-16 array [[0,0,0],[0,1,0],[0,0,0]] — a raised
    # centre — is of course a peak again through the geomorphons2 path
    (np.array([[0, 0, 0], [0, 1, 0], [0, 0, 0]], float), 2, "peak (cell 16)"),
    (np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], float), 6, "slope"),
    # same ternary counts as the simple slope -> same class, despite
    # the scrambled arrangement (notebook cell 17's point)
    (np.array([[0, 1, 2], [2, 1, 0], [0, 1, 2]], float), 6, "slope"),
]
for ZI, expect, name in micro:
    g = np.asarray(nt.geomorphons(ZI, lookup_pixels=1))[1, 1]
    print(f"  3x3 {name}: geomorphon code {g}")
    assert g == expect, (name, g, expect)

# ----------------------------------------------------------------------
# Terrain codes (notebook cell 18): raw base-3 pattern and its lowest
# rotational/reflectional equivalent.
# ----------------------------------------------------------------------
ZI = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], float)
tc = np.asarray(nt.ternary_pattern_from_openness(ZI, lookup_pixels=1))[1, 1]
tc_low = np.asarray(nt.ternary_pattern_from_openness(
    ZI, lookup_pixels=1, lowest=True))[1, 1]
print(f"slope terrain code {tc} -> lowest equivalent {tc_low}")
assert tc == 2240 and tc_low == 160

# ----------------------------------------------------------------------
# Terrain-code frequencies (notebook cells 20-21): J&S report the top
# 30 codes cover ~85% of terrain.
# ----------------------------------------------------------------------
TC = np.asarray(nt.ternary_pattern_from_openness(
    Z, cellsize=cellsize, lookup_pixels=max(5, lookup // 2),
    threshold_angle=1, lowest=True))
codes, num = np.unique(TC, return_counts=True)
order = np.argsort(num)[::-1]
top30 = 100 * num[order][:30].sum() / num.sum()
print(f"{codes.size} distinct lowest-equivalent codes; "
      f"top 30 cover {top30:.1f}% of cells")
assert top30 > 50  # heavily concentrated distribution

fig = plt.figure(figsize=(5, 3))
plt.plot(np.cumsum(num[order]) / num.sum(), ".")
plt.xlim((0, 50)); plt.ylim((0, 1))
plt.xlabel("terrain-code rank"); plt.ylabel("cumulative fraction")
fig.savefig(out("terrain_code_frequencies.png"), dpi=120)
plt.close(fig)

# ----------------------------------------------------------------------
# The ashift primitive (notebook cell 23): directional whole-array
# shift with edge replication — the reason the scan costs 8*L shifts,
# not a per-pixel filter.
# ----------------------------------------------------------------------
x = np.arange(25.0).reshape(5, 5)
print("ashift(x, direction=0, n=1):")
print(np.asarray(nt.ashift(x, 0, 1)).astype(int))

print("geomorphons walkthrough complete")
