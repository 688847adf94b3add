"""Host-orchestrated tiling for rasters bigger than device memory,
with tile-granular checkpoint/resume.

This is the single-chip complement to the mesh sharding in
``dist.api``: the reference used ``apply_parallel(func, Z, tile,
overlap)`` (test_neilpy.py:45) both for parallelism *and* for memory;
on TPU the mesh handles parallelism, and this module handles the
out-of-core case — stream overlapping tiles through the device,
writing results into a (memory-mapped) output with optional completed-
tile tracking so a 100k x 100k mosaic job can resume after
interruption (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["tiled_apply", "apply_parallel", "TileCheckpoint"]


class TileCheckpoint:
    """Tracks completed tiles in a sidecar JSON so an interrupted tiled
    run resumes where it left off."""

    def __init__(self, path):
        self.path = path
        self.done = set()
        if path and os.path.exists(path):
            self.done = set(map(tuple, json.load(open(path))))

    def is_done(self, key):
        return tuple(key) in self.done

    def mark(self, key):
        self.done.add(tuple(key))
        if self.path:
            tmp = self.path + ".tmp"
            json.dump(sorted(self.done), open(tmp, "w"))
            os.replace(tmp, self.path)


def tiled_apply(fn, Z, tile_size, overlap, out=None, out_dtype=None,
                checkpoint=None, progress=False):
    """Apply ``fn`` (array -> array, same HxW) to overlapping tiles of
    ``Z``, cropping the overlap — semantics of
    ``skimage.util.apply_parallel(fn, Z, tile_size, overlap)``
    as used by the reference (test_neilpy.py:35-47).

    ``out`` may be a preallocated (memory-mapped) array; ``checkpoint``
    a path for tile-granular resume.  ``fn`` typically wraps a jitted
    kernel; tiles have uniform shape (edge tiles are padded, then
    cropped) so one compilation serves every tile.

    ``fn`` may return a tuple of same-shaped rasters (a fused
    multi-product tile kernel); the return value is then a tuple of
    output arrays (and ``out``/``out_dtype``, if given, tuples too).
    """
    Z = np.asarray(Z)
    H, W = Z.shape
    ts = int(tile_size)
    ov = int(overlap)
    ckpt = TileCheckpoint(checkpoint) if checkpoint else None
    multi = None
    if out is not None:
        if isinstance(out, (tuple, list)):
            out = tuple(out)
            multi = True
        else:
            out = (out,)
            multi = False

    n_ty = -(-H // ts)
    n_tx = -(-W // ts)
    for ty in range(n_ty):
        for tx in range(n_tx):
            key = (ty, tx)
            if ckpt and ckpt.is_done(key):
                continue
            r0, c0 = ty * ts, tx * ts
            r1, c1 = min(r0 + ts, H), min(c0 + ts, W)
            # overlapped read window, clipped to the raster
            rr0, cc0 = max(r0 - ov, 0), max(c0 - ov, 0)
            rr1, cc1 = min(r1 + ov, H), min(c1 + ov, W)
            block = Z[rr0:rr1, cc0:cc1]
            # pad to the uniform (ts + 2 ov) shape so jit reuses one
            # compilation; edge replication preserves local stencils
            ph = (ov - (r0 - rr0), ov - (rr1 - r1))
            pw = (ov - (c0 - cc0), ov - (cc1 - c1))
            fh = ts - (r1 - r0)
            fw = ts - (c1 - c0)
            block = np.pad(block, ((ph[0], ph[1] + fh),
                                   (pw[0], pw[1] + fw)), mode="edge")
            res = fn(block)
            if multi is None:
                multi = isinstance(res, (tuple, list))
            res = res if isinstance(res, (tuple, list)) else (res,)
            res = tuple(np.asarray(a)[ov:ov + (r1 - r0),
                                      ov:ov + (c1 - c0)] for a in res)
            if out is None:
                dts = (out_dtype if isinstance(out_dtype, (tuple, list))
                       else (out_dtype,) * len(res))
                out = tuple(np.empty((H, W), dtype=dt or a.dtype)
                            for dt, a in zip(dts, res))
            for o, a in zip(out, res):
                o[r0:r1, c0:c1] = a
            if ckpt:
                ckpt.mark(key)
            if progress:
                print(f"tile {key} / ({n_ty},{n_tx})", flush=True)
    if out is None:
        raise ValueError(
            "checkpoint marks every tile done but no `out` arrays were "
            "given to resume into — pass the previous outputs via "
            "`out=` or delete the checkpoint file to recompute")
    return out if multi else out[0]


def apply_parallel(function, array, chunks=None, depth=0,
                   extra_arguments=(), extra_keywords=None):
    """Drop-in for ``skimage.util.apply_parallel(function, array,
    chunks, depth)`` as the reference notebooks use it
    (test_neilpy.py:45, 92): overlapping-tile map with the overlap
    cropped.  Backed by ``tiled_apply``, so every tile runs the same
    compiled kernel on the accelerator; pass ``chunks=None`` to run
    the function on the whole array.

    Exactness contract (same CLASS as skimage's): with ``depth`` >=
    the stencil radius, every pixel farther than ``depth`` from the
    GLOBAL raster edge equals the untiled result; inside that border
    band the tile kernel sees padding instead of the true edge
    (edge-replicate here; skimage's default depth padding is reflect,
    so the two disagree only inside that band).  For bit-exact
    boundaries use ``dist.sharded_apply`` / the sharded kernels, which
    carry the global origin."""
    if extra_keywords is None:
        extra_keywords = {}
    fn = lambda Z: function(Z, *extra_arguments, **extra_keywords)
    if chunks is None:
        return np.asarray(fn(np.asarray(array)))
    if isinstance(chunks, (tuple, list)):
        if len(set(int(c) for c in chunks)) != 1:
            raise ValueError(
                "apply_parallel here supports square tiles only; got "
                f"chunks={chunks} (pass a scalar or equal per-dim "
                "chunks)")
        chunks = int(chunks[0])
    return tiled_apply(fn, array, int(chunks), int(depth))
