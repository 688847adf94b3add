"""Multi-chip SMRF: the full ground-filter raster phase sharded over a
2-D device mesh, plus a data-parallel point phase.

The reference never distributes SMRF (it is single-process,
neilpy.py:1685-1808); its only scaling tool was tile-with-overlap
``apply_parallel``.  Here the *whole* raster phase — spring inpaint
(CG), low-outlier opening, the 18-window progressive opening ladder,
the provisional-DTM inpaint — runs under one ``shard_map`` program with
ICI halo exchanges sized per stage:

* morphology: reflect boundaries are *equivalent to truncated
  footprints* for min/max (every mirrored position duplicates a value
  already inside the window), so out-of-domain cells are simply routed
  to the reduction identity (+/-inf) and each opening stage exchanges a
  radius-w halo — bit-identical to the single-device kernel;
* spring inpaint: matrix-free flexible CG whose operator exchanges a
  1-px halo per iteration, whose inner products are ``psum``
  tree-reductions over the mesh, and whose preconditioner is the
  Galerkin multigrid K-cycle with sharded fine levels (halo-exchanged
  smoothing, exact local 2x2 aggregation) handed off to a replicated
  coarse hierarchy; node degrees come from *global* coordinates so mesh
  seams and the true raster boundary are handled exactly;
* the block padding needed to make the raster mesh-divisible is
  masked out of the domain by global coordinates (never reflected or
  inpainted), so sharded == single-device up to CG convergence.

The point phase (bicubic lift + adaptive threshold) is data-parallel:
points shard across every device, spline coefficients are replicated.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .halo import halo_exchange_2d
from .api import make_mesh, pad_to_mesh
from ..ops.morphology import _disk_morph_padded
from ..ops.spline import spline_coefficients_2d, spline_ev_2d
from ..ops.inpaint import (_coarsen_level, _kcycle, _blocksum2,
                           _prolong2)
from ..core.shift import gradient2d

__all__ = ["sharded_smrf", "sharded_springs_fill",
           "sharded_progressive_filter"]

_INF = jnp.float32(jnp.inf)


def _domain_mask(block_shape, origin, global_shape):
    """True for cells of this (possibly halo-padded) block that lie
    inside the true raster; the bottom/right mesh padding and any halo
    sticking past the raster edge are False."""
    gy = lax.broadcasted_iota(jnp.int32, block_shape, 0) + origin[0]
    gx = lax.broadcasted_iota(jnp.int32, block_shape, 1) + origin[1]
    return ((gy >= 0) & (gy < global_shape[0])
            & (gx >= 0) & (gx < global_shape[1]))


def _block_origin(block_shape, axis_names):
    iy = lax.axis_index(axis_names[0])
    ix = lax.axis_index(axis_names[1])
    return iy * block_shape[0], ix * block_shape[1]


def _halo_opening(block, radius, origin, global_shape, axis_names,
                  mesh_shape):
    """One grey opening (erosion then dilation) with per-stage halo
    exchange; out-of-domain cells are routed to the reduce identity,
    which equals scipy's reflect boundary for min/max (see module
    docstring)."""
    r = int(radius)
    bh, bw = block.shape

    def stage(x, reduce_fn, ident):
        p = halo_exchange_2d(x, r, axis_names, mesh_shape, mode="zero")
        dom = _domain_mask(p.shape, (origin[0] - r, origin[1] - r),
                           global_shape)
        p = jnp.where(dom, p, ident)
        return _disk_morph_padded(p, r, reduce_fn)

    eroded = stage(block, jnp.minimum, _INF)
    return stage(eroded, jnp.maximum, -_INF)


def _gather_global(x, axis_names):
    """All-gather a sharded 2-D block into the full (replicated) global
    array on every device (two tiled all_gathers over the mesh axes)."""
    g = lax.all_gather(x, axis_names[0], axis=0, tiled=True)
    return lax.all_gather(g, axis_names[1], axis=1, tiled=True)


def _slice_block(g, block_shape, axis_names):
    """Slice this device's block back out of a replicated global
    array."""
    iy = lax.axis_index(axis_names[0])
    ix = lax.axis_index(axis_names[1])
    return lax.dynamic_slice(
        g, (iy * block_shape[0], ix * block_shape[1]), block_shape)


def _apply_sh(x, diag, Ep, Sp, axis_names, mesh_shape):
    """Sharded 5-point coefficient-array apply (the per-level operator
    of ``ops.inpaint._apply_level``): one 1-px halo exchange of ``x``;
    the coupling arrays arrive pre-padded."""
    xp = halo_exchange_2d(x, 1, axis_names, mesh_shape, mode="zero")
    return (diag * x
            - Ep[1:-1, 1:-1] * xp[1:-1, 2:] - Ep[1:-1, :-2] * xp[1:-1, :-2]
            - Sp[1:-1, 1:-1] * xp[2:, 1:-1] - Sp[:-2, 1:-1] * xp[:-2, 1:-1])


def _sharded_mg_levels(unknown, deg, axis_names, mesh_shape,
                       min_block=256):
    """Galerkin hierarchy for the sharded spring solve.

    The finest levels stay SHARDED: each device coarsens its own block
    (exact, because block extents are kept even so 2x2 aggregates never
    straddle a device boundary) and per-level halo-padded coupling
    arrays feed ``_apply_sh``.  Once the local block reaches
    ``min_block`` (or an odd extent), that level is all-gathered and
    the hierarchy continues REPLICATED — every device runs the
    identical coarse cycle, so no further communication below the
    handoff.  Returns ``(sharded_levels, replicated_levels)`` where
    ``sharded_levels[-1]`` is the handoff level (its gathered twin is
    ``replicated_levels[0]``).
    """
    up = halo_exchange_2d(unknown, 1, axis_names, mesh_shape,
                          mode="zero")
    u = unknown
    diag = deg * u
    E = up[1:-1, 1:-1] * up[1:-1, 2:]
    S = up[1:-1, 1:-1] * up[2:, 1:-1]

    def pad_es(E, S):
        return (halo_exchange_2d(E, 1, axis_names, mesh_shape,
                                 mode="zero"),
                halo_exchange_2d(S, 1, axis_names, mesh_shape,
                                 mode="zero"))

    slevels = [(diag, E, S, u, *pad_es(E, S))]
    while (max(mesh_shape) > 1 and min(u.shape) > min_block
           and u.shape[0] % 2 == 0 and u.shape[1] % 2 == 0):
        diag, E, S, u = _coarsen_level(diag, E, S, u)
        slevels.append((diag, E, S, u, *pad_es(E, S)))

    rfine = tuple(_gather_global(a, axis_names)
                  for a in slevels[-1][:4])
    rlevels = [rfine]
    while min(rlevels[-1][3].shape) > 4:
        rlevels.append(_coarsen_level(*rlevels[-1]))
    return slevels, rlevels


def _kcycle_sh(r, slevels, rlevels, l, axis_names, mesh_shape,
               omega=0.9, nsmooth=2, kdepth=2):
    """Sharded multigrid K-cycle: the distributed twin of
    ``ops.inpaint._kcycle``.  Sharded levels smooth with halo-exchanged
    applies and psum inner products; at the handoff level the residual
    is gathered and the single-device cycle finishes the recursion
    replicated."""
    def dot(a, b):
        return lax.psum(jnp.sum(a * b), axis_names)

    m = len(slevels) - 1
    if l == m:
        rg = _gather_global(r, axis_names)
        xg = _kcycle(rg, rlevels, 0, omega, nsmooth, kdepth)
        return _slice_block(xg, r.shape, axis_names)

    diag, E, S, u, Ep, Sp = slevels[l]
    bh, bw = u.shape
    invD = jnp.where(diag > 0, omega / diag, 0.0) * u

    def A(x):
        return _apply_sh(x * u, diag, Ep, Sp, axis_names, mesh_shape) * u

    def smooth(_, x):
        return x + invD * (r - A(x))

    x = lax.fori_loop(0, nsmooth, smooth, jnp.zeros_like(r))
    rc = _blocksum2(r - A(x)) * slevels[l + 1][3]

    if kdepth > 0 and l + 1 < m:
        dc, Ec, Sc, uc, Epc, Spc = slevels[l + 1]

        def Ac(xx):
            return _apply_sh(xx * uc, dc, Epc, Spc, axis_names,
                             mesh_shape) * uc

        def _safe(num, den):
            return jnp.where(den != 0,
                             num / jnp.where(den != 0, den, 1.0), 0.0)

        xc = jnp.zeros_like(rc)
        rr = rc
        z = _kcycle_sh(rr, slevels, rlevels, l + 1, axis_names,
                       mesh_shape, omega, nsmooth, kdepth - 1)
        p = z
        rz = dot(rr, z)
        for _ in range(2):
            Ap = Ac(p)
            alpha = _safe(rz, dot(p, Ap))
            xc = xc + alpha * p
            r_new = rr - alpha * Ap
            z_new = _kcycle_sh(r_new, slevels, rlevels, l + 1,
                               axis_names, mesh_shape, omega, nsmooth,
                               kdepth - 1)
            rz_new = dot(r_new, z_new)
            beta = _safe(rz_new - dot(rr, z_new), rz)
            p = z_new + beta * p
            rr, z, rz = r_new, z_new, rz_new
    else:
        xc = _kcycle_sh(rc, slevels, rlevels, l + 1, axis_names,
                        mesh_shape, omega, nsmooth,
                        kdepth if l + 1 == m else 0)
    x = x + _prolong2(xc, bh, bw) * u
    return lax.fori_loop(0, nsmooth, smooth, x)


def _springs_fill_local(block, origin, global_shape, axis_names,
                        mesh_shape, tol, maxiter, mg_min_block=256):
    """Spring-graph inpaint of the local block: flexible CG on the
    masked graph Laplacian with a 1-px halo exchange inside the
    operator, psum inner products, and the sharded Galerkin K-cycle as
    preconditioner (parity: ops/inpaint.py single-device solver)."""
    dom = _domain_mask(block.shape, origin, global_shape)
    nanmask = jnp.isnan(block) & dom
    unknown = nanmask.astype(jnp.float32)
    known_mask = (jnp.isfinite(block) & dom).astype(jnp.float32)
    known_vals = jnp.where(known_mask > 0, jnp.nan_to_num(block), 0.0)

    gy = lax.broadcasted_iota(jnp.int32, block.shape, 0) + origin[0]
    gx = lax.broadcasted_iota(jnp.int32, block.shape, 1) + origin[1]
    H, W = global_shape
    deg = ((gy > 0).astype(jnp.float32) + (gy < H - 1).astype(jnp.float32)
           + (gx > 0).astype(jnp.float32) + (gx < W - 1).astype(jnp.float32))
    deg = deg * dom

    def nbr_sum(X, mask):
        Xm = X * mask
        p = halo_exchange_2d(Xm, 1, axis_names, mesh_shape, mode="zero")
        return (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:])

    def apply_fn(x):
        x = x * unknown
        return (deg * x - nbr_sum(x, unknown)) * unknown

    def dot(a, b):
        return lax.psum(jnp.sum(a * b), axis_names)

    b = nbr_sum(known_vals, known_mask) * unknown

    slevels, rlevels = _sharded_mg_levels(unknown, deg, axis_names,
                                          mesh_shape,
                                          min_block=mg_min_block)
    precond = lambda r_: _kcycle_sh(r_, slevels, rlevels, 0,
                                    axis_names, mesh_shape)

    total_known = lax.psum(jnp.sum(known_mask), axis_names)
    mean = (lax.psum(jnp.sum(known_vals), axis_names)
            / jnp.maximum(total_known, 1.0))
    x0 = unknown * mean

    bnorm = jnp.sqrt(dot(b, b))
    atol2 = (tol * jnp.maximum(bnorm, 1e-30)) ** 2

    r0 = b - apply_fn(x0)
    z0 = precond(r0)
    rz0 = dot(r0, z0)

    def cond(state):
        x, r_, p_, z_, rz, it = state
        return (dot(r_, r_) > atol2) & (it < maxiter)

    def body(state):
        # flexible (Polak–Ribière) CG: robust to the nonlinear K-cycle
        x, r_, p_, z_, rz, it = state
        Ap = apply_fn(p_)
        alpha = rz / dot(p_, Ap)
        x = x + alpha * p_
        r_new = r_ - alpha * Ap
        z_new = precond(r_new)
        rz_new = dot(r_new, z_new)
        beta = (rz_new - dot(r_, z_new)) / rz
        p_ = z_new + beta * p_
        return x, r_new, p_, z_new, rz_new, it + 1

    x, _, _, _, _, _ = lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.int32(0)))
    return jnp.where(nanmask, x, block)


@partial(jax.jit, static_argnames=("mesh", "windows", "global_shape",
                                   "axis_names", "low_outlier_fill",
                                   "maxiter", "mg_min_block"))
def _sharded_raster(Zs, mesh, windows, thresholds, low_threshold,
                    global_shape, axis_names=("ty", "tx"),
                    low_outlier_fill=False, tol=1e-7, maxiter=4000,
                    mg_min_block=256):
    ny = mesh.shape[axis_names[0]]
    nx = mesh.shape[axis_names[1]]
    mesh_shape = (ny, nx)

    def local(block):
        origin = _block_origin(block.shape, axis_names)
        dom = _domain_mask(block.shape, origin, global_shape)

        is_empty = jnp.isnan(block) & dom
        Zmin = _springs_fill_local(block, origin, global_shape,
                                   axis_names, mesh_shape, tol, maxiter,
                                   mg_min_block)

        opened = _halo_opening(-Zmin, 1, origin, global_shape,
                               axis_names, mesh_shape)
        low_outliers = ((-Zmin - opened) > low_threshold) & dom

        if low_outlier_fill:
            Zmin = _springs_fill_local(
                jnp.where(low_outliers, jnp.nan, Zmin), origin,
                global_shape, axis_names, mesh_shape, tol, maxiter,
                mg_min_block)

        last = Zmin
        objects = jnp.zeros(block.shape, dtype=bool)
        for i, w in enumerate(windows):
            opened = _halo_opening(last, w, origin, global_shape,
                                   axis_names, mesh_shape)
            objects = objects | ((last - opened) > thresholds[i])
            last = opened
        objects = (objects | is_empty | low_outliers) & dom

        Zpro = _springs_fill_local(jnp.where(objects, jnp.nan, Zmin),
                                   origin, global_shape, axis_names,
                                   mesh_shape, tol, maxiter,
                                   mg_min_block)
        return Zpro, objects

    spec = P(*axis_names)
    return shard_map(local, mesh=mesh, in_specs=(spec,),
                     out_specs=(spec, spec))(Zs)


def sharded_springs_fill(A, mesh=None, axis_names=("ty", "tx"),
                         tol=1e-7, maxiter=4000, mg_min_block=256):
    """Spring inpaint over a device mesh (multi-chip
    ``inpaint_nans_by_springs``): halo-exchanged flexible CG with the
    sharded Galerkin K-cycle preconditioner, exact global boundary
    handling.  ``mg_min_block`` sets the block size below which the
    multigrid hierarchy switches from sharded (halo-exchanged) levels
    to a replicated coarse solve."""
    if mesh is None:
        mesh = make_mesh()
    A = jnp.asarray(A, dtype=jnp.float32)
    gshape = tuple(A.shape)
    Ap, orig = pad_to_mesh(A, mesh, axis_names)
    ny = mesh.shape[axis_names[0]]
    nx = mesh.shape[axis_names[1]]
    spec = P(*axis_names)
    Zs = jax.device_put(Ap, NamedSharding(mesh, spec))

    @partial(jax.jit, static_argnames=())
    def run(Zs):
        def local(block):
            origin = _block_origin(block.shape, axis_names)
            return _springs_fill_local(block, origin, gshape,
                                       axis_names, (ny, nx), tol,
                                       maxiter, mg_min_block)
        return shard_map(local, mesh=mesh, in_specs=(spec,),
                         out_specs=spec)(Zs)

    return run(Zs)[: orig[0], : orig[1]]


def sharded_progressive_filter(Z, windows, mesh=None, cellsize=1,
                               slope_threshold=.15,
                               axis_names=("ty", "tx")):
    """Progressive morphological opening ladder over a device mesh
    (multi-chip ``progressive_filter``); bit-identical to the
    single-device ladder."""
    if mesh is None:
        mesh = make_mesh()
    windows = np.atleast_1d(np.asarray(windows))
    Z = jnp.asarray(Z, dtype=jnp.float32)
    gshape = tuple(Z.shape)
    Zp, orig = pad_to_mesh(Z, mesh, axis_names)
    ny = mesh.shape[axis_names[0]]
    nx = mesh.shape[axis_names[1]]
    thresholds = jnp.asarray(slope_threshold * (windows * cellsize),
                             dtype=jnp.float32)
    spec = P(*axis_names)
    Zs = jax.device_put(Zp, NamedSharding(mesh, spec))
    win = tuple(int(w) for w in windows)

    @jax.jit
    def run(Zs, thresholds):
        def local(block):
            origin = _block_origin(block.shape, axis_names)
            last = block
            objects = jnp.zeros(block.shape, dtype=bool)
            for i, w in enumerate(win):
                opened = _halo_opening(last, w, origin, gshape,
                                       axis_names, (ny, nx))
                objects = objects | ((last - opened) > thresholds[i])
                last = opened
            return objects
        return shard_map(local, mesh=mesh, in_specs=(spec,),
                         out_specs=spec)(Zs)

    return run(Zs, thresholds)[: orig[0], : orig[1]]


def sharded_smrf(x, y, z, cellsize=1, windows=5, slope_threshold=.15,
                 elevation_threshold=.5, elevation_scaler=1.25,
                 low_filter_slope=5, low_outlier_fill=False, mesh=None,
                 axis_names=("ty", "tx"), tol=1e-7, maxiter=4000,
                 mg_min_block=256):
    """Multi-chip SMRF (same signature/semantics as
    ``pipelines.smrf.smrf``): spatially-sharded raster phase +
    data-parallel point phase.

    Returns (Zpro, t, object_cells, is_object_point).
    """
    if mesh is None:
        mesh = make_mesh()
    if np.isscalar(windows):
        windows = np.arange(windows) + 1
    windows = np.atleast_1d(np.asarray(windows))

    # --- gridding: exact host f64 binning + the tuned device
    # scatter-min (same path as single-chip create_dem) ---------------
    from ..ops.pointgrid import create_dem
    Zmin_raw, t = create_dem(x, y, z, cellsize=cellsize, bin_type="min")
    gshape = tuple(Zmin_raw.shape)

    Zp, orig = pad_to_mesh(Zmin_raw, mesh, axis_names)
    spec = P(*axis_names)
    Zs = jax.device_put(Zp, NamedSharding(mesh, spec))

    thresholds = jnp.asarray(slope_threshold * (windows * cellsize),
                             dtype=jnp.float32)
    Zpro_s, objects_s = _sharded_raster(
        Zs, mesh, tuple(int(w) for w in windows), thresholds,
        jnp.float32(low_filter_slope * cellsize), gshape, axis_names,
        bool(low_outlier_fill), tol=tol, maxiter=maxiter,
        mg_min_block=mg_min_block)
    Zpro = Zpro_s[: orig[0], : orig[1]]
    object_cells = objects_s[: orig[0], : orig[1]]

    # --- point phase: replicated spline coefficients, points sharded
    # across every device (pure data parallelism) ---------------------
    coeffs_Z = spline_coefficients_2d(Zpro)
    gy, gx = gradient2d(Zpro, cellsize)
    coeffs_S = spline_coefficients_2d(jnp.sqrt(gy ** 2 + gx ** 2))

    x64 = np.asarray(x, dtype=np.float64)
    y64 = np.asarray(y, dtype=np.float64)
    z64 = np.asarray(z, dtype=np.float64)
    c, r = (~t) * (x64, y64)
    n = len(c)
    n_dev = int(np.prod([mesh.shape[a] for a in axis_names]))
    n_pad = -(-n // n_dev) * n_dev

    def padded(a, fill=0.0):
        out = np.full(n_pad, fill, dtype=np.float32)
        out[:n] = a
        return out

    pspec = P(axis_names)
    rs = jax.device_put(padded(r), NamedSharding(mesh, pspec))
    cs = jax.device_put(padded(c), NamedSharding(mesh, pspec))
    zs = jax.device_put(padded(z64), NamedSharding(mesh, pspec))

    @jax.jit
    def point_phase(coeffs_Z, coeffs_S, rs, cs, zs):
        def local(cz, cs_, r_, c_, z_):
            ev = spline_ev_2d(cz, r_, c_, offset=0.5)
            sv = spline_ev_2d(cs_, r_, c_, offset=0.5)
            req = (jnp.float32(elevation_threshold)
                   + jnp.float32(elevation_scaler) * sv)
            return jnp.abs(ev - z_) > req
        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), pspec, pspec, pspec),
            out_specs=pspec)(coeffs_Z, coeffs_S, rs, cs, zs)

    is_object_point = point_phase(coeffs_Z, coeffs_S, rs, cs, zs)[:n]
    return Zpro, t, object_cells, is_object_point
