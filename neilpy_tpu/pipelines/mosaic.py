"""Out-of-core terrain analysis for continent-scale mosaics
(BASELINE config 5: sharded SMRF + geomorphons + Moran's-I
autocorrelation over a synthetic 100k x 100k DEM mosaic).

A 100k x 100k float32 mosaic is 40 GB — beyond single-chip HBM — so
this pipeline streams overlapping tiles through ONE fused device
program producing every requested product per pass (geomorphon
classes, local Moran's I, SMRF object cells), with tile-granular
checkpoint/resume (SURVEY.md §5: "tile-granular restart for the
100k x 100k mosaic config is the one real need").

The overlap is chosen for exactness, not vibes:

* geomorphons at lookup L need an L-px halo;
* a progressive opening ladder over windows w_1..w_k contaminates a
  band of 2 * sum(w_i) px at a tile edge (each opening widens the
  wrong band by erosion + dilation radii);
* local Moran's I with a radius-r footprint needs r + 1 px (its
  z-normalization is global and is computed in a first streaming
  pass over the raw tiles).

so ``overlap = max(lookup, 2*sum(windows), gi_radius + 1)`` makes the
tiled result equal the untiled one everywhere except within
``overlap`` pixels of the *global* mosaic boundary, where tile edge
padding approximates each kernel's own boundary convention (asserted
in tests, same contract the reference accepted from apply_parallel).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..dist.tiling import tiled_apply
from ..ops.visibility import geomorphons
from ..ops.stats import local_morans_i

__all__ = ["mosaic_terrain_products", "required_overlap"]


def required_overlap(lookup_pixels=0, windows=(), gi_radius=0):
    """Exactness halo for the fused tile kernel (see module docstring)."""
    ladder = int(2 * np.sum(windows)) if np.size(windows) else 0
    gi = int(gi_radius) + 1 if gi_radius else 0
    return max(int(lookup_pixels), ladder, gi)


@lru_cache(maxsize=16)
def _make_tile_kernel(cellsize, lookup_pixels, threshold_angle, win,
                      gi_radius, use_pallas, fast, how_fast, compact,
                      tile_size, overlap, n_chunks, gi_star=False,
                      with_openness=False):
    """Build (and cache) the fused jitted tile WIRE kernel: products,
    overlap crop, byte-packing, and readback chunking all inside one
    program, so a tile costs ONE dispatch (the tunneled runtime pays
    up to ~1 s of latency per eager dispatch — an eager epilogue was
    90% of mosaic wall-clock).

    Caching by static parameters keeps the compiled program alive
    across ``mosaic_terrain_products`` calls — a fresh closure per call
    would recompile the (expensive, server-side for Pallas) program
    inside every mosaic run.  The global Moran moments and the ladder
    thresholds are traced arguments for the same reason.

    ``compact`` selects the wire encoding: geomorphon class and object
    bit share one uint8 (class 1-10 needs 7 bits; bit 7 carries the
    object flag — lossless) and Moran's I travels as bfloat16 (~3
    significant digits; the only lossy leg).  That is 3 B/px on the
    wire instead of 6 — the device->host link is the mosaic
    bottleneck, not the kernel.
    """
    from ..ops.morphology import _disk_morph
    from ..dist.tiling import _pack_device

    if use_pallas:
        from ..ops.pallas_scan import geomorphons_pallas as _geo
        geo = lambda b: _geo(b, cellsize=cellsize,
                             lookup_pixels=lookup_pixels,
                             threshold_angle=threshold_angle,
                             fast=fast, how_fast=how_fast)
    else:
        geo = lambda b: geomorphons(b, cellsize=cellsize,
                                    lookup_pixels=lookup_pixels,
                                    threshold_angle=threshold_angle,
                                    fast=fast, how_fast=how_fast,
                                    engine="xla")

    ts, ov = tile_size, overlap

    @jax.jit
    def tile_kernel(block, thresholds, mean, s2, n):
        g = geo(block)
        mi = local_morans_i(block, footprint=gi_radius, mean=mean,
                            s2=s2)
        last = block
        objects = jnp.zeros(block.shape, dtype=bool)
        for i, w in enumerate(win):
            opened = _disk_morph(_disk_morph(last, w, jnp.minimum), w,
                                 jnp.maximum)
            objects = objects | ((last - opened) > thresholds[i])
            last = opened
        if gi_star:
            from ..ops.stats import rasterGi
            _, _, gi = rasterGi(block, footprint=gi_radius, star=True,
                                global_mean=mean, global_var=s2,
                                global_n=n)
        if with_openness:
            from ..ops.visibility import openness
            eng = "pallas" if use_pallas else "xla"
            op = openness(block, cellsize=cellsize,
                          lookup_pixels=lookup_pixels, fast=fast,
                          how_fast=how_fast, engine=eng)
            on = openness(-block, cellsize=cellsize,
                          lookup_pixels=lookup_pixels, fast=fast,
                          how_fast=how_fast, engine=eng)
        if compact:
            res = ((g.astype(jnp.uint8)
                    | (objects.astype(jnp.uint8) << 7)),
                   mi.astype(jnp.bfloat16))
            if gi_star:
                # the ±3 significance bins (and NaN) are exact in bf16
                res = res + (gi.astype(jnp.bfloat16),)
            if with_openness:
                res = res + (op.astype(jnp.bfloat16),
                             on.astype(jnp.bfloat16))
        else:
            res = (g.astype(jnp.uint8), objects, mi)
            if gi_star:
                res = res + (gi,)
            if with_openness:
                res = res + (op, on)
        res = tuple(a[ov:ov + ts, ov:ov + ts] for a in res)
        packed, _ = _pack_device(res)
        step = -(-ts // n_chunks)
        return tuple(packed[i:i + step] for i in range(0, ts, step))

    return tile_kernel


def _wire_specs(compact, gi_star=False, with_openness=False):
    n_extra = int(gi_star) + 2 * int(with_openness)
    if compact:
        specs = [(np.dtype(np.uint8), 1), (np.dtype(jnp.bfloat16), 2)]
        specs += [(np.dtype(jnp.bfloat16), 2)] * n_extra
        return specs
    specs = [(np.dtype(np.uint8), 1), (np.dtype(bool), 1),
             (np.dtype(np.float32), 4)]
    specs += [(np.dtype(np.float32), 4)] * n_extra
    return specs


def _decode_compact(res):
    combo, mi = res[0], res[1]
    out = (combo & 0x7F, combo >= 128,
           np.asarray(mi).astype(np.float32))
    for extra in res[2:]:
        out = out + (np.asarray(extra).astype(np.float32),)
    return out


def mosaic_terrain_products(Z, cellsize=1, lookup_pixels=25,
                            threshold_angle=1, windows=5,
                            slope_threshold=.15, gi_radius=3,
                            tile_size=2048, checkpoint=None,
                            out=None, progress=False, use_pallas=None,
                            fast=False, how_fast=20, wire="auto",
                            pipeline_depth=3, wire_chunks=None,
                            gi_star=False, openness=False):
    """Stream a (possibly memory-mapped) mosaic through one fused tile
    kernel computing geomorphon classes, SMRF object cells, and local
    Moran's I; resumable at tile granularity via ``checkpoint``.

    Returns ``(geomorphons uint8, object_cells bool, morans_i f32)``;
    with ``gi_star=True`` a fourth product is appended — the Getis-Ord
    Gi* ArcGIS-style significance bins (float32 in {0, ±1, ±2, ±3},
    NaN over NaN cells) with the same ``gi_radius`` square
    neighbourhood, z-scored against the GLOBAL mosaic moments (bins
    are small integers, so they stay exact even on the compact wire).
    With ``openness=True``, positive and negative Yokoyama openness
    (same ``lookup_pixels`` scan ladder as the geomorphons, so the
    overlap is already exact) are appended as two float32 products —
    two extra ladder passes per tile, and on the compact wire they
    round to bfloat16 like Moran's I.  Products are returned in the
    fixed order geomorphons, objects, moran [, gi] [, pos, neg].
    ``out`` may be a tuple of matching preallocated (memory-mapped)
    arrays for mosaics that do not fit in RAM.

    ``wire`` controls the device->host encoding of each tile:
    ``'exact'`` sends uint8 + bool + float32 products; ``'compact'``
    halves the wire (class+object share a byte, Moran's I as bfloat16
    — classes and object cells stay EXACT, Moran values round to ~3
    significant digits).  ``'auto'`` picks compact on the TPU backend,
    where the tunnel/PCIe link — not the kernel — bounds mosaic
    throughput, and exact elsewhere.
    """
    if np.isscalar(windows):
        windows = np.arange(windows) + 1
    windows = np.atleast_1d(np.asarray(windows))
    ov = required_overlap(lookup_pixels, windows, gi_radius)

    # Global Moran's z-normalization: one cheap streaming pass for the
    # global mean/variance (the tile kernel must not normalize locally
    # or tiled != untiled).  Lazy 2-D sources (io.geotiff.GeoTiffSource,
    # np.memmap) pass through un-materialized: both this pass and
    # tiled_apply read them window-by-window.
    if not (hasattr(Z, "shape") and hasattr(Z, "dtype")
            and hasattr(Z, "__getitem__")):
        Z = np.asarray(Z)
    gsum = 0.0
    gsq = 0.0
    n_finite = 0
    for r0 in range(0, Z.shape[0], 4096):
        blk = np.asarray(Z[r0:r0 + 4096], dtype=np.float64)
        m = np.isfinite(blk)
        gsum += blk[m].sum()
        gsq += (blk[m] ** 2).sum()
        n_finite += int(m.sum())
    mean = gsum / max(n_finite, 1)
    s2 = gsq / max(n_finite, 1) - mean * mean

    thresholds = jnp.asarray(slope_threshold * (windows * cellsize),
                             dtype=jnp.float32)
    win = tuple(int(w) for w in windows)

    # On TPU the Pallas VMEM-ladder kernel classifies ~10x faster than
    # the XLA scan and treats tile edges with the same edge-replication
    # convention, so the overlap crop keeps tiled == untiled either way.
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if wire == "auto":
        wire = "compact" if jax.default_backend() == "tpu" else "exact"
    compact = wire == "compact"

    # chunk the wire buffer into ~12 MB pieces: several in-flight
    # async host copies measured 2-5x faster than one monolithic
    # transfer through the tunnel, but too many chunks re-serialize
    # on per-transfer latency (16k^2 sweep: 4 chunks at tile 4096
    # beat 8 and 1; see BENCH notes)
    n_extra = int(gi_star) + 2 * int(openness)
    px_bytes = (3 + 2 * n_extra) if compact else (6 + 4 * n_extra)
    n_chunks = (int(wire_chunks) if wire_chunks
                else max(1, min(16, round(tile_size ** 2 * px_bytes
                                          / (12 << 20)))))
    kernel = _make_tile_kernel(
        float(cellsize), int(lookup_pixels), float(threshold_angle),
        win, int(gi_radius), bool(use_pallas), bool(fast),
        int(how_fast), compact, int(tile_size), int(ov), n_chunks,
        bool(gi_star), bool(openness))
    wire_fn = lambda b: kernel(b, thresholds, jnp.float32(mean),
                               jnp.float32(s2), jnp.float32(n_finite))

    out_dtype = ((np.uint8, bool, np.float32)
                 + (np.float32,) * n_extra)
    return tiled_apply(None, Z, tile_size=tile_size, overlap=ov,
                       out=out, out_dtype=out_dtype,
                       checkpoint=checkpoint, progress=progress,
                       pipeline_depth=pipeline_depth, wire_fn=wire_fn,
                       wire_specs=_wire_specs(compact, gi_star,
                                              openness),
                       decode=_decode_compact if compact else None)
