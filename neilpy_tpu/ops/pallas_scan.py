"""Pallas TPU kernel for the openness / geomorphon directional scan.

The XLA scan in ops/visibility.py re-reads the whole DEM from HBM for
every ladder step (lookup_pixels x 8 directions of roll traffic); this
kernel blocks the DEM into VMEM tiles with a ``lookup_pixels``-wide
halo and runs the entire ladder out of VMEM — HBM traffic drops to one
read + one write per pixel, and the inner loop is pure VPU
sub/mul/select/max on registers.

Layout: output tiles (TH, TW); for each tile the kernel DMAs the
(TH + 2R, TW + 2R) input window from HBM into VMEM scratch, then for
L = 1..R accumulates, per direction, the running max/min of
``(Z[p + d*L] - Z[p]) / (cellsize * |d| * L)`` using dynamically
offset static-size slices of the window.  Global boundary semantics
(out-of-range -> ratio 0) are enforced with iota masks in *global*
coordinates only for tiles whose window crosses the DEM edge — the
interior fast path skips the mask entirely (``@pl.when`` on scalar
tile coordinates would add control flow; instead the mask unit is
elided by construction: interior windows never index outside, and the
pad ring is NaN so the NaN-select already neutralises it... see
``_masked`` for why the mask is still needed at the true boundary).

Returns the per-direction extrema stacked as (8, H, W) x 2, sliced by
the callers exactly like the XLA path, so count_openness/geomorphons
produce bit-identical classes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from ..core.shift import OFFSETS, STEP_LENGTH

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

__all__ = ["openness_counts_pallas", "geomorphons_pallas", "HAS_PALLAS"]


def _counts_kernel(Z_hbm, np_ref, nn_ref, win, sem, *, TH, TW, R, RR, RC,
                   H, W, cellsize, threshold_deg):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # window DMA: slice extents/offsets are aligned to the (8, 128)
    # VMEM tiling by construction (RR = R rounded to 8, RC to 128)
    dma = pltpu.make_async_copy(
        Z_hbm.at[pl.ds(i * TH, TH + 2 * RR), pl.ds(j * TW, TW + 2 * RC)],
        win, sem)
    dma.start()
    dma.wait()

    core = win[RR:RR + TH, RC:RC + TW]
    neg_inf = jnp.float32(-jnp.inf)
    pos_inf = jnp.float32(jnp.inf)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0) + i * TH
    cols = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + j * TW

    inv_w = [jnp.float32(1.0 / (cellsize * STEP_LENGTH[d]))
             for d in range(8)]

    # Direction is the OUTER loop so only one rolled window and two
    # (TH, TW) accumulators are live at a time.  The ladder itself is a
    # fori_loop whose carry is the window rolled by one unit step per
    # iteration — all slices stay static (dynamic sublane offsets are
    # rejected by Mosaic), the graph stays small (compiles in seconds
    # instead of minutes for R=50 unrolls), and no wraparound ever
    # reaches the core read region because RR >= R and RC >= R.
    T = jnp.float32(math.tan(math.radians(threshold_deg)))
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    num_pos = jnp.zeros((TH, TW), dtype=jnp.float32)
    num_neg = jnp.zeros((TH, TW), dtype=jnp.float32)
    for d in range(8):
        dr, dc = OFFSETS[d]

        def ladder_step(L, carry, dr=dr, dc=dc, d=d):
            win_d, mx, mn = carry
            # new[r, c] = old[r + dr, c + dc]
            if dr:
                win_d = pltpu.roll(win_d, -dr % win_d.shape[0], axis=0)
            if dc:
                win_d = pltpu.roll(win_d, -dc % win_d.shape[1], axis=1)
            src = win_d[RR:RR + TH, RC:RC + TW]
            Lf = L.astype(jnp.float32)
            ratio = (src - core) * (inv_w[d] / Lf)
            sr = rows + dr * L
            sc = cols + dc * L
            valid = (sr >= 0) & (sr < H) & (sc >= 0) & (sc < W)
            ratio = jnp.where(valid, ratio, 0.0)
            ok = ratio == ratio  # not NaN
            mx = jnp.maximum(mx, jnp.where(ok, ratio, neg_inf))
            mn = jnp.minimum(mn, jnp.where(ok, ratio, pos_inf))
            return win_d, mx, mn

        _, mx, mn = lax.fori_loop(
            1, R + 1, ladder_step,
            (win[:, :], jnp.full((TH, TW), neg_inf),
             jnp.full((TH, TW), pos_inf)))

        # The openness difference is diff = atan(a) - atan(b) with
        # a = -mn, b = mx.  Pallas TPU has no atan primitive; compare
        # in tangent space instead — exactly, via the identity
        #   diff > t  <=>  (1+ab > 0) ? (a-b)/(1+ab) > tan(t) : a > b
        # (valid for 0 <= t < pi/2; |diff| > pi/2 iff 1+ab <= 0).
        a = -mn
        b = mx
        denom = 1.0 + a * b
        u = (a - b) / denom
        wide = denom <= 0.0
        narrow = denom > 0.0
        # select-of-booleans is unsupported by Mosaic ("unsupported
        # target bitwidth for truncation"); use i1 logic instead
        gt = (wide & (a > b)) | (narrow & (u > T))
        lt = (wide & (a < b)) | (narrow & (u < -T))
        seen = mx > neg_inf          # unseen -> a,b infinite -> NaN u,
        gt = gt & seen               # but keep the mask explicit
        lt = lt & seen
        num_pos = num_pos + jnp.where(gt, one, zero)
        num_neg = num_neg + jnp.where(lt, one, zero)
    np_ref[:, :] = num_pos
    nn_ref[:, :] = num_neg


@partial(jax.jit, static_argnames=("lookup_pixels", "tile", "interpret",
                                   "cellsize", "threshold_angle"))
def openness_counts_pallas(Z, cellsize=1.0, lookup_pixels=1,
                           threshold_angle=1.0, tile=(256, 256),
                           interpret=None):
    """(num_pos, num_neg) direction counts for geomorphons, computed by
    the blocked Pallas scan.  Equivalent to
    ``ops.visibility.count_openness`` (asserted in tests)."""
    Z = jnp.asarray(Z, dtype=jnp.float32)
    H, W = Z.shape
    R = int(lookup_pixels)
    TH, TW = tile
    RR = -(-R // 8) * 8        # sublane-aligned row halo
    RC = -(-R // 128) * 128    # lane-aligned column halo
    Hp = -(-H // TH) * TH
    Wp = -(-W // TW) * TW
    # pad: aligned halo on every side + tile alignment; NaN so halo
    # reads never fake terrain (masks make them ratio-0 out of range)
    Zp = jnp.pad(Z, ((RR, RR + (Hp - H)), (RC, RC + (Wp - W))),
                 constant_values=jnp.nan)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid = (Hp // TH, Wp // TW)
    kernel = partial(_counts_kernel, TH=TH, TW=TW, R=R, RR=RR, RC=RC,
                     H=H, W=W, cellsize=float(cellsize),
                     threshold_deg=float(threshold_angle))
    num_pos, num_neg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * RR, TW + 2 * RC), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(Zp)
    return (num_pos[:H, :W].astype(jnp.uint8),
            num_neg[:H, :W].astype(jnp.uint8))


def geomorphons_pallas(Z, cellsize=1, lookup_pixels=1, threshold_angle=1,
                       tile=(256, 256)):
    """Geomorphon classes from the Pallas scan (drop-in fast path for
    ``ops.visibility.geomorphons`` without enhance/fast modes)."""
    from ..core.codes import jasiewicz_stepinski_table
    num_pos, num_neg = openness_counts_pallas(
        Z, cellsize=float(cellsize), lookup_pixels=int(lookup_pixels),
        threshold_angle=float(threshold_angle), tile=tile)
    lut = jnp.asarray(jasiewicz_stepinski_table())
    return lut[num_pos.astype(jnp.int32), num_neg.astype(jnp.int32)]
