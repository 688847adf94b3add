"""NaN inpainting as matrix-free jit-compiled linear solves.

Reference: neilpy/neilpy.py:1171-1283 — D'Errico-style inpainting via
sparse least squares (``lsqr``) over (a) a 4-neighbour "spring" graph
(method 4, the one used by ``create_dem`` and ``smrf``) and (b) a
second-difference operator (method 0/1).

TPU-native design
-----------------
Both systems have symmetric positive (semi-)definite normal equations
whose operators are local stencils on the grid:

* springs: ``(L x)_p = deg(p) * x_p - sum_{q ~ p, q unknown} x_q`` with
  ``deg`` = number of in-bounds 4-neighbours; RHS = sum of known
  neighbour values.  This graph Laplacian's least-squares equilibrium
  is exactly what lsqr converges to, so a matrix-free conjugate-gradient
  solve with a Jacobi preconditioner reproduces it without ever
  building a sparse matrix — every apply is four shifts and adds that
  XLA fuses, and the whole solve jits onto the TPU (and shards with a
  1-px halo exchange).

* fda: normal operator ``D^T D`` of the stacked row/column
  second-difference operator, again applied matrix-free with pad/slice
  stencils.  Rows whose support contains no NaN contribute constants
  and drop out of the minimisation, which is why this matches the
  reference's ``fast=True`` row restriction (neilpy.py:1196-1200).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["inpaint_nans_by_springs", "inpaint_nans_by_fda",
           "inpaint_nearest", "inpaint_nearest_device", "cg_solve",
           "springs_fill"]


def _neighbor_sum(X, mask):
    """Sum of in-bounds 4-neighbour values of X (masked by ``mask`` at
    the *source*), plus the in-bounds neighbour count."""
    H, W = X.shape
    z = jnp.zeros((1, W), dtype=X.dtype)
    zc = jnp.zeros((H, 1), dtype=X.dtype)
    mz = jnp.zeros((1, W), dtype=mask.dtype)
    mzc = jnp.zeros((H, 1), dtype=mask.dtype)
    Xm = X * mask
    up = jnp.concatenate([Xm[1:], z], axis=0)
    dn = jnp.concatenate([z, Xm[:-1]], axis=0)
    lf = jnp.concatenate([Xm[:, 1:], zc], axis=1)
    rt = jnp.concatenate([zc, Xm[:, :-1]], axis=1)
    s = up + dn + lf + rt
    mu = jnp.concatenate([mask[1:], mz], axis=0)
    md = jnp.concatenate([mz, mask[:-1]], axis=0)
    ml = jnp.concatenate([mask[:, 1:], mzc], axis=1)
    mr = jnp.concatenate([mzc, mask[:, :-1]], axis=1)
    return s, mu + md + ml + mr


def _degree(shape, dtype=jnp.float32):
    """Number of in-bounds 4-neighbours per cell (4 interior, 3 edge,
    2 corner)."""
    H, W = shape
    rows = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    deg = ((rows > 0).astype(dtype) + (rows < H - 1).astype(dtype)
           + (cols > 0).astype(dtype) + (cols < W - 1).astype(dtype))
    return deg


def cg_solve(apply_fn, b, x0, precond=None, tol=1e-7, maxiter=2000,
             flexible=False):
    """Conjugate gradients with optional preconditioner, expressed as a
    ``lax.while_loop`` so the whole solve stays on device.  ``apply_fn``
    must be linear, symmetric, positive definite on the masked
    subspace.  ``flexible=True`` uses the Polak–Ribière beta
    (Notay's flexible CG), which stays robust when the preconditioner
    is only approximately symmetric — e.g. a multigrid V-cycle."""
    b = jnp.asarray(b)
    if precond is None:
        precond = lambda r: r
    bnorm = jnp.sqrt(jnp.sum(b * b))
    atol2 = (tol * jnp.maximum(bnorm, 1e-30)) ** 2

    r0 = b - apply_fn(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(state):
        x, r, p, rz, it = state
        return (jnp.sum(r * r) > atol2) & (it < maxiter)

    def body(state):
        x, r, p, rz, it = state
        Ap = apply_fn(p)
        alpha = rz / jnp.sum(p * Ap)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z = precond(r_new)
        rz_new = jnp.sum(r_new * z)
        if flexible:
            beta = (rz_new - jnp.sum(r * z)) / rz
        else:
            beta = rz_new / rz
        p = z + beta * p
        return x, r_new, p, rz_new, it + 1

    x, r, _, _, it = lax.while_loop(cond, body,
                                    (x0, r0, p0, rz0, jnp.int32(0)))
    return x, it


def springs_fill(A, tol=1e-7, maxiter=4000, multiscale=True):
    """Traceable spring-graph fill (no jit wrapper): compose freely
    inside larger jitted pipelines (e.g. the fused SMRF raster stage).
    Returns the filled array only."""
    out, _ = _springs_core(A, tol, maxiter, multiscale)
    return out


def _blocksum2(X):
    """2x2 block sum (restriction = prolongationᵀ for the piecewise-
    constant interpolation used by the V-cycle)."""
    H, W = X.shape
    Hp, Wp = -(-H // 2) * 2, -(-W // 2) * 2
    P = jnp.zeros((Hp, Wp), dtype=X.dtype).at[:H, :W].set(X)
    return P.reshape(Hp // 2, 2, Wp // 2, 2).sum(axis=(1, 3))


def _prolong2(Xc, H, W):
    """Piecewise-constant 2x prolongation cropped to (H, W)."""
    return jnp.repeat(jnp.repeat(Xc, 2, axis=0), 2, axis=1)[:H, :W]


def _mg_levels(unknown, min_size=32):
    """Unknown-mask hierarchy for the V-cycle: a coarse cell is unknown
    if any of its 2x2 fine cells is.  Static shapes, traced values."""
    levels = [unknown]
    while min(levels[-1].shape) > min_size:
        u = levels[-1]
        levels.append((_blocksum2(u) > 0).astype(u.dtype))
    return levels


def _vcycle(r, levels, l, omega=0.8, nsmooth=2):
    """One V(2,2)-cycle of damped-Jacobi multigrid on the masked spring
    Laplacian, used as the (flexible-)CG preconditioner.  The geometric
    coarse operator is scaled by 2 per level to approximate the
    Galerkin product RAP of the piecewise-constant transfer pair.

    Smoothing chains run as ``lax.fori_loop``s: letting XLA:CPU fuse a
    chain of concatenate-based stencil applies makes it *recompute*
    fused producers per consumer (~17x per-smooth slowdown measured at
    1024^2); the loop boundary keeps each smooth a single pass.
    """
    unknown = levels[l]
    H, W = unknown.shape
    scale = jnp.asarray(2.0 ** l, dtype=r.dtype)
    deg = _degree((H, W), dtype=r.dtype) * scale

    def A(x):
        x = x * unknown
        s, _ = _neighbor_sum(x, unknown)
        return (deg * x - scale * s) * unknown

    invD = jnp.where(deg > 0, omega / deg, 0.0) * unknown

    def smooth(_, x):
        return x + invD * (r - A(x))

    zero = jnp.zeros_like(r)
    if l + 1 < len(levels):
        x = lax.fori_loop(0, nsmooth, smooth, zero)
        rc = _blocksum2(r - A(x)) * levels[l + 1]
        xc = _vcycle(rc, levels, l + 1, omega, nsmooth)
        x = x + _prolong2(xc, H, W) * unknown
        x = lax.fori_loop(0, nsmooth, smooth, x)
    else:
        x = lax.fori_loop(0, 8, smooth, zero)
    return x


def _springs_core(A, tol, maxiter, multiscale=True):
    A = jnp.asarray(A)
    if A.dtype not in (jnp.float32, jnp.float64):
        A = A.astype(jnp.float32)  # f64 preserved for the exact path
    nanmask = jnp.isnan(A)
    unknown = nanmask.astype(A.dtype)
    known_vals = jnp.where(nanmask, 0.0, A)
    known_mask = 1.0 - unknown

    deg = _degree(A.shape, dtype=A.dtype)

    def apply_fn(x):
        # x lives on the unknown cells (zero elsewhere)
        x = x * unknown
        s, _ = _neighbor_sum(x, unknown)
        return (deg * x - s) * unknown

    b, _ = _neighbor_sum(known_vals, known_mask)
    b = b * unknown

    # warm start: mean of known values (flat sheet)
    mean = jnp.nansum(known_vals) / jnp.maximum(jnp.sum(known_mask), 1.0)
    x0 = unknown * mean

    H, W = A.shape
    if multiscale and min(H, W) >= 64:
        # multigrid-preconditioned flexible CG: a symmetric V(2,2)
        # damped-Jacobi cycle bounds the preconditioned condition
        # number independent of the NaN-region diameter, so iteration
        # counts stay ~O(10) from 64^2 to mosaic scale (plain Jacobi-CG
        # needs O(diameter) iterations per residual decade).
        levels = _mg_levels(unknown)
        precond = lambda r: _vcycle(r, levels, 0)
        x, it = cg_solve(apply_fn, b, x0, precond=precond, tol=tol,
                         maxiter=maxiter, flexible=True)
    else:
        inv_deg = jnp.where(deg > 0, 1.0 / deg, 0.0)
        precond = lambda r: r * inv_deg * unknown
        x, it = cg_solve(apply_fn, b, x0, precond=precond, tol=tol,
                         maxiter=maxiter)
    return jnp.where(nanmask, x, A), it


def _warn_exhausted(it, maxiter, tol):
    if int(it) >= int(maxiter):
        import warnings
        warnings.warn(
            f"inpaint_nans_by_springs: CG exhausted maxiter={maxiter} "
            f"without reaching tol={tol}; result is the best iterate. "
            "Raise maxiter or loosen tol.", RuntimeWarning)


_CALLBACK_OK = {}


def _callbacks_supported(dev):
    """Host callbacks are UNIMPLEMENTED on some backends (the axon
    TPU tunnel rejects them at execution time); probe once PER
    PLATFORM with a trivial program run on ``dev`` — a process-global
    boolean would let a CPU-context probe bless a later TPU solve
    (and vice versa)."""
    key = getattr(dev, "platform", str(dev))
    if key not in _CALLBACK_OK:
        try:
            def _noop(x):
                pass

            @jax.jit
            def _probe(x):
                jax.debug.callback(_noop, x)
                return x + 1

            with jax.default_device(dev):
                jax.block_until_ready(_probe(jnp.float32(0)))
            _CALLBACK_OK[key] = True
        except Exception:
            _CALLBACK_OK[key] = False
    return _CALLBACK_OK[key]


@partial(jax.jit, static_argnames=("tol", "maxiter", "multiscale",
                                   "warn_cb"))
def _springs_solve(A, tol=1e-7, maxiter=4000, multiscale=True,
                   warn_cb=False):
    out, it = _springs_core(A, tol, maxiter, multiscale)
    if warn_cb:
        # async host callback: warns on exhaustion without forcing the
        # caller to block on the solve (an eager int(it) here would
        # serialize every pipeline that dispatches the fill
        # asynchronously)
        jax.debug.callback(partial(_warn_exhausted, maxiter=maxiter,
                                   tol=tol), it)
    return out, it


def inpaint_nans_by_springs(A, inplace=False, neighbors=4, tol=1e-7,
                            maxiter=4000, multiscale=True,
                            return_info=False):
    """Spring-graph inpainting (parity: neilpy.py:1227-1271).

    Matrix-free CG on the spring normal equations; equilibrium matches
    the reference's lsqr solution to solver tolerance.  ``multiscale``
    warm-starts from a recursively solved half-resolution problem
    (same equilibrium, far fewer iterations on large NaN regions).
    ``return_info=True`` additionally returns
    ``{"iterations", "converged", "maxiter"}``; a solve that exhausts
    ``maxiter`` warns either way.
    """
    if neighbors != 4:
        raise ValueError("At the moment, only 4 neighbors are supported.")
    del inplace  # functional API: always returns the filled array
    arr = jnp.asarray(A)
    devs = arr.devices() if hasattr(arr, "devices") else None
    dev = next(iter(devs)) if devs else jax.devices()[0]
    # warn_cb is independent of return_info so mixed call styles share
    # ONE compiled program per shape
    warn_cb = _callbacks_supported(dev)
    out, it = _springs_solve(arr, tol=tol, maxiter=maxiter,
                             multiscale=multiscale, warn_cb=warn_cb)
    if return_info:
        it = int(it)
        if it >= maxiter and not warn_cb:
            _warn_exhausted(it, maxiter, tol)
        return out, {"iterations": it, "converged": it < maxiter,
                     "maxiter": maxiter}
    if not warn_cb:
        # backend without host callbacks: the only way to warn is to
        # read the counter (costs a sync, as the pre-r2 code did)
        _warn_exhausted(int(it), maxiter, tol)
    # with the async callback active the returned fill stays
    # dispatchable: no host sync on this path
    return out


def _second_diff_apply(x, unknown):
    """Apply D^T D where D stacks all interior row/column second
    differences (the fda operator, neilpy.py:1180-1194)."""
    H, W = x.shape
    x = x * unknown

    # column-direction second differences: t[r] = x[r-1] - 2x[r] + x[r+1]
    tv = x[:-2, :] - 2.0 * x[1:-1, :] + x[2:, :]
    # D_v^T t scatters t with the same stencil
    yv = jnp.zeros_like(x)
    yv = yv.at[:-2, :].add(tv)
    yv = yv.at[1:-1, :].add(-2.0 * tv)
    yv = yv.at[2:, :].add(tv)

    th = x[:, :-2] - 2.0 * x[:, 1:-1] + x[:, 2:]
    yh = jnp.zeros_like(x)
    yh = yh.at[:, :-2].add(th)
    yh = yh.at[:, 1:-1].add(-2.0 * th)
    yh = yh.at[:, 2:].add(th)

    return (yv + yh) * unknown


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def _fda_solve(A, tol=1e-7, maxiter=8000):
    A = jnp.asarray(A, dtype=jnp.float32)
    nanmask = jnp.isnan(A)
    unknown = nanmask.astype(jnp.float32)
    known_vals = jnp.where(nanmask, 0.0, A)

    def apply_fn(x):
        return _second_diff_apply(x, unknown)

    # b = -D^T D applied to the known values, restricted to unknowns
    b = -_second_diff_apply_known(known_vals, unknown)

    mean = jnp.nansum(known_vals) / jnp.maximum(jnp.sum(1.0 - unknown), 1.0)
    x0 = unknown * mean
    x, it = cg_solve(apply_fn, b, x0, tol=tol, maxiter=maxiter)
    return jnp.where(nanmask, x, A), it


def _second_diff_apply_known(k, unknown):
    """(D^T D k)|unknown where k carries the known values (zeros at
    unknowns): the cross term of the normal equations."""
    tv = k[:-2, :] - 2.0 * k[1:-1, :] + k[2:, :]
    yv = jnp.zeros_like(k)
    yv = yv.at[:-2, :].add(tv)
    yv = yv.at[1:-1, :].add(-2.0 * tv)
    yv = yv.at[2:, :].add(tv)
    th = k[:, :-2] - 2.0 * k[:, 1:-1] + k[:, 2:]
    yh = jnp.zeros_like(k)
    yh = yh.at[:, :-2].add(th)
    yh = yh.at[:, 1:-1].add(-2.0 * th)
    yh = yh.at[:, 2:].add(th)
    return (yv + yh) * unknown


def inpaint_nans_by_fda(A, fast=True, inplace=False, tol=1e-7,
                        maxiter=8000):
    """Second-difference (biharmonic-flavoured) inpainting (parity:
    neilpy.py:1171-1216).  ``fast`` is accepted for API parity; the
    matrix-free formulation already drops constant rows, which is what
    fast=True's row restriction achieves."""
    del fast, inplace
    out, _ = _fda_solve(A, tol=tol, maxiter=maxiter)
    return out


def inpaint_nearest(X):
    """Nearest-finite-value fill (parity: neilpy.py:1277-1283).

    Host path via scipy's KD-tree interpolator — exact Euclidean
    nearest with the reference's index-order tie-breaking.  For
    device-resident pipelines use ``inpaint_nearest_device`` (a
    jump-flooding fill that jits and shards).
    """
    X = np.asarray(X, dtype=np.float64)
    from scipy import interpolate
    idx = np.isfinite(X)
    RI, CI = np.meshgrid(np.arange(X.shape[0]), np.arange(X.shape[1]))
    f_near = interpolate.NearestNDInterpolator(
        (RI.T[idx], CI.T[idx]), X[idx])
    miss = ~idx
    X[miss] = f_near(RI.T[miss], CI.T[miss])
    return X


@jax.jit
def inpaint_nearest_device(X):
    """Nearest-finite-value fill as a jump-flooding pass on device.

    Each cell carries (seed row, seed col, seed value); rounds of
    8-neighbour propagation at power-of-two offsets (N/2, N/4, ..., 1)
    keep the closest seed by squared Euclidean distance.  Runs fully
    under jit (log2(N) rounds of static shifts).  JFA can differ from
    the exact KD-tree fill on tie/near-tie cells (both are *a* nearest
    finite value); tested to agree with scipy on distance.
    """
    X = jnp.asarray(X, dtype=jnp.float32)
    H, W = X.shape
    finite = jnp.isfinite(X)
    rows = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    BIG = jnp.int32(2 ** 30)
    sr = jnp.where(finite, rows, BIG)
    sc = jnp.where(finite, cols, BIG)
    sv = jnp.where(finite, X, 0.0)

    def shift(a, dy, dx, fill):
        return jnp.roll(jnp.where(_inb(rows, cols, dy, dx, H, W),
                                  a, fill), (dy, dx), axis=(0, 1))

    def _d2(r, c):
        dr = (r - rows).astype(jnp.float32)
        dc = (c - cols).astype(jnp.float32)
        return dr * dr + dc * dc

    step = 1 << max(int(np.ceil(np.log2(max(H, W, 2)))) - 1, 0)
    state = (sr, sc, sv)
    while step >= 1:
        r0, c0, v0 = state
        best_d = _d2(r0, c0)
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                rn = shift(r0, dy, dx, BIG)
                cn = shift(c0, dy, dx, BIG)
                vn = shift(v0, dy, dx, 0.0)
                dn = _d2(rn, cn)
                take = dn < best_d
                r0 = jnp.where(take, rn, r0)
                c0 = jnp.where(take, cn, c0)
                v0 = jnp.where(take, vn, v0)
                best_d = jnp.where(take, dn, best_d)
        state = (r0, c0, v0)
        step //= 2
    r0, c0, v0 = state
    return jnp.where(finite, X, v0)


def _inb(rows, cols, dy, dx, H, W):
    """Mask of source cells whose roll destination stays in bounds
    (prevents wraparound seeds)."""
    # destination (r+dy, c+dx) in bounds <=> source read guard after roll
    return ((rows + dy >= 0) & (rows + dy < H)
            & (cols + dx >= 0) & (cols + dx < W))
