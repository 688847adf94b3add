"""Sharded (multi-chip) raster pipelines over a 2-D device mesh.

This is the TPU-native replacement for the reference's
``apply_parallel(func, Z, tile_size, overlap)`` tiling
(test_neilpy.py:45, SURVEY.md §2.5): the DEM lives sharded across the
mesh, stencils run under ``shard_map`` after an ICI halo exchange sized
by the stencil radius, and outputs stay sharded for downstream stages.
The tiled==untiled property the reference trusted ``apply_parallel``
to preserve is asserted by the test suite on a virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .halo import halo_exchange_2d, block_origin
from ..ops.visibility import (directional_ratio_extrema,
                              _angles_from_extrema, classes_from_counts)

__all__ = ["make_mesh", "sharded_geomorphons", "sharded_openness",
           "sharded_skyview",
           "sharded_hillshade", "pad_to_mesh", "sharded_apply"]

from .halo import sharded_apply  # re-export


def make_mesh(devices=None, shape=None, axis_names=("ty", "tx")):
    """Build a 2-D mesh from the available devices (factored as close
    to square as possible unless ``shape`` is given)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        ny = int(np.floor(np.sqrt(n)))
        while n % ny:
            ny -= 1
        shape = (ny, n // ny)
    devs = np.asarray(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, axis_names)


def pad_to_mesh(Z, mesh, axis_names=("ty", "tx"), fill=jnp.nan):
    """Pad a raster on the bottom/right so both dims divide the mesh.
    Returns (padded, original_shape)."""
    ny = mesh.shape[axis_names[0]]
    nx = mesh.shape[axis_names[1]]
    H, W = Z.shape
    Hp = -(-H // ny) * ny
    Wp = -(-W // nx) * nx
    if (Hp, Wp) != (H, W):
        Z = jnp.pad(jnp.asarray(Z), ((0, Hp - H), (0, Wp - W)),
                    constant_values=fill)
    return Z, (H, W)


@partial(jax.jit, static_argnames=("mesh", "lookup_pixels", "axis_names",
                                   "global_shape", "engine", "cellsize",
                                   "threshold_angle", "fast", "how_fast"))
def _sharded_counts(Zs, mesh, cellsize, lookup_pixels, threshold_angle,
                    global_shape, axis_names=("ty", "tx"),
                    engine="xla", fast=False, how_fast=20):
    ny = mesh.shape[axis_names[0]]
    nx = mesh.shape[axis_names[1]]
    bh = global_shape[0] // ny
    bw = global_shape[1] // nx
    r = int(lookup_pixels)

    def local(block):
        oy, ox = block_origin((bh, bw), axis_names)
        if engine == "pallas":
            # NaN halo beyond mesh == beyond raster: the kernel skips
            # NaNs and applies the global edge-replication correction
            # from (origin, global_shape)
            from ..ops.pallas_scan import openness_counts_pallas_block
            padded = halo_exchange_2d(block, r, axis_names, (ny, nx),
                                      mode="nan")
            return openness_counts_pallas_block(
                padded, (oy, ox), global_shape, r, cellsize=cellsize,
                threshold_angle=threshold_angle, vma=axis_names,
                fast=fast, how_fast=how_fast)
        # NaN halo beyond the mesh, like the Pallas branch: the blocked
        # scan skips NaN reads and restores the global edge-replication
        # contribution from (origin, global_shape)
        padded = halo_exchange_2d(block, r, axis_names, (ny, nx),
                                  mode="nan")
        mx, mn, seen = directional_ratio_extrema(
            padded, cellsize=cellsize, lookup_pixels=r,
            origin=(oy - r, ox - r), global_shape=global_shape,
            fast=fast, how_fast=how_fast)
        pos = jnp.rad2deg(_angles_from_extrema(mx, seen))
        neg = jnp.rad2deg(_angles_from_extrema(-mn, seen))
        diff = pos - neg
        t = jnp.float32(threshold_angle)
        num_pos = jnp.sum(diff > t, axis=0).astype(jnp.uint8)
        num_neg = jnp.sum(diff < -t, axis=0).astype(jnp.uint8)
        return (num_pos[r:r + bh, r:r + bw], num_neg[r:r + bh, r:r + bw])

    spec = P(*axis_names)
    # check_vma=False: the pallas interpret-mode DMA mixes varying and
    # unvarying operands in a dynamic_slice, which the vma checker
    # cannot type yet (it suggests this workaround itself)
    return shard_map(local, mesh=mesh, in_specs=(spec,),
                     out_specs=(spec, spec), check_vma=False)(Zs)


def sharded_geomorphons(Z, mesh=None, cellsize=1, lookup_pixels=1,
                        threshold_angle=1, axis_names=("ty", "tx"),
                        engine="auto", fast=False, how_fast=20):
    """Geomorphon classification sharded over a device mesh — the
    multi-chip analog of ``geomorphons`` (bit-identical to the
    single-device kernel; asserted in tests).

    ``engine='auto'`` uses the Pallas VMEM-ladder kernel per shard on
    the TPU backend (halo exchange feeds it real neighbour data), the
    XLA scan otherwise.
    """
    if mesh is None:
        mesh = make_mesh()
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    Zp, orig = pad_to_mesh(jnp.asarray(Z, dtype=jnp.float32), mesh,
                           axis_names)
    spec = P(*axis_names)
    Zs = jax.device_put(Zp, NamedSharding(mesh, spec))
    num_pos, num_neg = _sharded_counts(
        Zs, mesh, float(cellsize), int(lookup_pixels),
        float(threshold_angle), tuple(Zp.shape), axis_names, engine,
        fast=bool(fast), how_fast=int(how_fast))
    G = classes_from_counts(num_pos, num_neg)
    return G[: orig[0], : orig[1]]


def _sharded_extrema_map(Z, mesh, cellsize, lookup_pixels, axis_names,
                         epilogue):
    """Shared scaffold for mesh-sharded extrema consumers: pad to the
    mesh, halo-exchange each block, run the ratio-extrema scan with a
    global origin, and crop ``epilogue(mx, seen) -> (H, W)`` back to
    the original shape."""
    if mesh is None:
        mesh = make_mesh()
    Zp, orig = pad_to_mesh(jnp.asarray(Z, dtype=jnp.float32), mesh,
                           axis_names)
    ny = mesh.shape[axis_names[0]]
    nx = mesh.shape[axis_names[1]]
    bh, bw = Zp.shape[0] // ny, Zp.shape[1] // nx
    r = int(lookup_pixels)
    gshape = tuple(Zp.shape)

    def local(block):
        oy, ox = block_origin((bh, bw), axis_names)
        padded = halo_exchange_2d(block, r, axis_names, (ny, nx),
                                  mode="nan")
        mx, _, seen = directional_ratio_extrema(
            padded, cellsize=jnp.float32(cellsize), lookup_pixels=r,
            origin=(oy - r, ox - r), global_shape=gshape)
        out = epilogue(mx, seen)
        return out[r:r + bh, r:r + bw]

    spec = P(*axis_names)
    Zs = jax.device_put(Zp, NamedSharding(mesh, spec))
    out = shard_map(local, mesh=mesh, in_specs=(spec,),
                    out_specs=spec)(Zs)
    return out[: orig[0], : orig[1]]


def sharded_openness(Z, mesh=None, cellsize=1, lookup_pixels=1,
                     axis_names=("ty", "tx")):
    """Positive openness sharded over a device mesh."""
    return _sharded_extrema_map(
        Z, mesh, cellsize, lookup_pixels, axis_names,
        lambda mx, seen: jnp.rad2deg(
            jnp.mean(_angles_from_extrema(mx, seen), axis=0)))


def sharded_skyview(Z, mesh=None, cellsize=1, lookup_pixels=1,
                    axis_names=("ty", "tx")):
    """Skyview factor sharded over a device mesh — the same
    ratio-extrema reformulation as ``skyview_factor`` (reference
    neilpy.py:1360-1384).  The clip at 0 absorbs both boundary-zero
    and never-seen contributions, so the sharded result equals the
    single-device kernel."""
    from ..ops.visibility import svf_from_extrema
    return _sharded_extrema_map(Z, mesh, cellsize, lookup_pixels,
                                axis_names,
                                lambda mx, seen: svf_from_extrema(mx))


def sharded_hillshade(Z, mesh=None, cellsize=1, z_factor=1, zenith=45,
                      azimuth=315, axis_names=("ty", "tx")):
    """Hillshade sharded over a device mesh.  Radius-1 halo with linear
    extrapolation reproduces np.gradient's one-sided edge differences
    at the global boundary exactly."""
    from ..ops.surface import hillshade
    if mesh is None:
        mesh = make_mesh()
    from .halo import sharded_apply as _apply
    Zp, orig = pad_to_mesh(jnp.asarray(Z, dtype=jnp.float32), mesh,
                           axis_names, fill=0.0)
    out = _apply(lambda b: hillshade(b, cellsize=cellsize,
                                     z_factor=z_factor, zenith=zenith,
                                     azimuth=azimuth),
                 Zp, mesh, radius=1, mode="linear",
                 axis_names=axis_names)
    return out[: orig[0], : orig[1]]
