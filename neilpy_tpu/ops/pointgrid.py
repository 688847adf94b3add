"""Point-cloud to raster gridding (``create_dem``).

Reference: neilpy/neilpy.py:1110-1166 — edges snapped to the cellsize
with a half-cell margin, a north-up affine, inverse-affine floor
binning, then a pandas ``groupby(flat_index).min()/.max()`` scatter.

TPU-native design
-----------------
* Bin-index computation stays in **float64 on host** (numpy): UTM
  coordinates (~1e5-1e6) with metre cells cannot survive f32 without
  misbinning points near cell edges; this is cheap O(N) arithmetic.
* The reduction is a device **scatter-min/max** (``array.at[idx].min``)
  over the flat grid — XLA lowers this to a sorted segment reduce on
  TPU.  min/max are exact in any float width, so the f32 device path
  bit-matches the f64 host path whenever the inputs are f32-representable.
* ``bin_points`` is exposed separately so sharded pipelines can bin on
  host once and shard the (index, z) streams across devices, combining
  per-device partial grids with a min/max ``psum``-style tree.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from ..core.affine import Affine

__all__ = ["create_dem", "bin_points", "scatter_reduce"]


def _floor2(x, v):
    return v * np.floor(x / v)


def _ceil2(x, v):
    return v * np.ceil(x / v)


def bin_points(x, y, cellsize=1, edges=None):
    """Compute grid shape, affine transform, and per-point flat bin
    indices (host, float64).

    Returns (flat_index int64 array, in_range bool array, (ny, nx), t).
    Matches the reference edge snapping exactly (neilpy.py:1117-1143):
    x edges from floor(min/cs)*cs - .5cs to ceil(max/cs)*cs + 1.5cs,
    y edges descending (north-up).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if edges is None:
        cellsize = float(cellsize)
        xedges = np.arange(_floor2(x.min(), cellsize) - .5 * cellsize,
                           _ceil2(x.max(), cellsize) + 1.5 * cellsize,
                           cellsize)
        yedges = np.arange(_ceil2(y.max(), cellsize) + .5 * cellsize,
                           _floor2(y.min(), cellsize) - 1.5 * cellsize,
                           -cellsize)
        in_range = np.ones(x.shape, dtype=bool)
    else:
        xedges, yedges = np.asarray(edges[0]), np.asarray(edges[1])
        out = ((x < xedges[0]) | (x > xedges[-1])
               | (y > yedges[0]) | (y < yedges[-1]))
        in_range = ~out
        cellsize = float(abs(xedges[1] - xedges[0]))
    nx, ny = len(xedges) - 1, len(yedges) - 1
    t = Affine.from_origin(xedges[0], yedges[0], cellsize, cellsize)
    c, r = (~t) * (x, y)
    c = np.floor(c).astype(np.int64)
    r = np.floor(r).astype(np.int64)
    # guard: out-of-range points map to bin 0 but are masked out
    c_cl = np.clip(c, 0, nx - 1)
    r_cl = np.clip(r, 0, ny - 1)
    in_range &= (c == c_cl) & (r == r_cl)
    flat = r_cl * nx + c_cl
    return flat, in_range, (ny, nx), t


@partial(jax.jit, static_argnames=("n_cells", "bin_type"))
def scatter_reduce(flat_index, z, valid, n_cells, bin_type="max"):
    """Device scatter-min/max of z into a flat grid of n_cells.

    Invalid points are routed to the reduction identity so padded /
    out-of-range entries never contribute — this keeps the call jittable
    with a fixed point-count (pad freely).
    """
    z = jnp.asarray(z, dtype=jnp.float32)
    idx = jnp.asarray(flat_index, dtype=jnp.int32)
    if bin_type == "max":
        ident = -jnp.inf
        z = jnp.where(valid, z, ident)
        grid = jnp.full((n_cells,), ident, dtype=jnp.float32)
        grid = grid.at[idx].max(z, mode="drop")
        return jnp.where(jnp.isneginf(grid), jnp.nan, grid)
    elif bin_type == "min":
        ident = jnp.inf
        z = jnp.where(valid, z, ident)
        grid = jnp.full((n_cells,), ident, dtype=jnp.float32)
        grid = grid.at[idx].min(z, mode="drop")
        return jnp.where(jnp.isposinf(grid), jnp.nan, grid)
    else:
        raise ValueError("This type not supported.")


def create_dem(x, y, z, cellsize=1, bin_type="max", inpaint=False,
               edges=None, use_binned_statistic=False):
    """Scatter-to-grid DEM creation (parity: neilpy.py:1110-1166).

    Returns (I, t): the (ny, nx) float grid with NaN empty cells and the
    affine transform.  ``inpaint=True`` spring-inpaints the gaps.
    """
    del use_binned_statistic  # scipy fallback not needed on this path
    z = np.asarray(z, dtype=np.float64)
    flat, valid, (ny, nx), t = bin_points(x, y, cellsize=cellsize,
                                          edges=edges)
    grid = scatter_reduce(flat, z, valid, ny * nx, bin_type=bin_type)
    I = jnp.reshape(grid, (ny, nx))
    if inpaint:
        from .inpaint import inpaint_nans_by_springs
        I = inpaint_nans_by_springs(I)
    return I, t
