"""ctypes binding for the native (C++) LAS point decoder.

The native path mmaps the file and decodes records across hardware
threads straight into flat numpy arrays, with optional bbox filtering
and stride decimation — the framework's native data loader for large
clouds.  Falls back transparently to the pure-Python reader
(io/las.py) when the shared library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["native_available", "read_las_arrays"]

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native",
                         "liblas_decoder.so")


_LOAD_FAILED = False


def _load():
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    from ..ops.binning_native import _buildinfo_fresh, _try_build
    stale = os.path.exists(_LIB_PATH) and not _buildinfo_fresh()
    if (stale or not os.path.exists(_LIB_PATH)) and not _try_build():
        # missing and unbuildable, or stale (possibly foreign-arch
        # vector code) and unrebuildable: python fallback
        _LOAD_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.las_open_header.restype = ctypes.c_int
        lib.las_open_header.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_double)]
        arrays = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.las_decode.restype = ctypes.c_long
        lib.las_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double)] + arrays
        lib.las_decode_range.restype = ctypes.c_long
        lib.las_decode_range.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_double)] + arrays
    except (OSError, AttributeError):
        # unloadable .so (foreign arch, missing deps) or a binary that
        # predates a symbol this code needs: python fallback
        _LOAD_FAILED = True
        return None
    _LIB = lib
    return _LIB


def native_available():
    return _load() is not None


def read_header(filename):
    lib = _load()
    out = (ctypes.c_double * 18)()
    rc = lib.las_open_header(str(filename).encode(), out)
    if rc == -2:
        raise ValueError("LAZ not yet supported.")
    if rc != 0:
        raise ValueError(f"native LAS header parse failed (code {rc})")
    v = list(out)
    return {"scale": tuple(v[0:3]), "offset": tuple(v[3:6]),
            "minmax": tuple(v[6:12]), "num_point_records": int(v[13]),
            "point_data_offset": int(v[14]),
            "point_data_record_length": int(v[15]),
            "point_data_format_id": int(v[16]),
            "version": v[17] / 10.0}


def _decode(filename, first, count, stride, bbox, n_threads, hdr,
            n_records):
    """Shared native-decode call: records [first, first+count) with
    stride, returned as a dict of compacted flat arrays."""
    lib = _load()
    n_out = (n_records + stride - 1) // stride
    xs = np.empty(n_out, dtype=np.float64)
    ys = np.empty(n_out, dtype=np.float64)
    zs = np.empty(n_out, dtype=np.float64)
    inten = np.empty(n_out, dtype=np.uint16)
    klass = np.empty(n_out, dtype=np.uint8)
    rn = np.empty(n_out, dtype=np.uint8)
    rm = np.empty(n_out, dtype=np.uint8)

    bb = None
    if bbox is not None:
        bb = (ctypes.c_double * 4)(*[float(b) for b in bbox])

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    wrote = lib.las_decode_range(
        str(filename).encode(), int(first), int(count), int(stride), bb,
        p(xs, ctypes.c_double), p(ys, ctypes.c_double),
        p(zs, ctypes.c_double), p(inten, ctypes.c_uint16),
        p(klass, ctypes.c_uint8), p(rn, ctypes.c_uint8),
        p(rm, ctypes.c_uint8), int(n_out), int(n_threads))
    if wrote < 0:
        raise ValueError(f"native LAS decode failed (code {wrote})")
    sl = slice(0, wrote)
    return {"header": hdr, "x": xs[sl], "y": ys[sl], "z": zs[sl],
            "intensity": inten[sl], "class": klass[sl],
            "return_number": rn[sl], "return_max": rm[sl]}


def read_las_arrays(filename, stride=1, bbox=None, n_threads=0):
    """Decode a LAS file natively into a dict of flat arrays
    (x, y, z float64; intensity uint16; class/return_number/return_max
    uint8).  ``bbox`` = (xmin, xmax, ymin, ymax) filters on the fly;
    ``stride`` keeps every stride-th point."""
    if _load() is None:
        raise RuntimeError("native LAS decoder not built; run "
                           "`make -C native` or use io.las.read_las")
    hdr = read_header(filename)
    n = hdr["num_point_records"]
    return _decode(filename, 0, -1, stride, bbox, n_threads, hdr, n)


def read_las_chunks(filename, chunk_points=4_000_000, stride=1,
                    bbox=None, n_threads=0):
    """Iterate a LAS file in fixed-memory chunks of at most
    ``chunk_points`` records (before ``stride``/``bbox`` filtering),
    yielding the same dict shape as ``read_las_arrays`` per chunk.
    The file is mmapped per chunk, so peak memory is one chunk's
    arrays regardless of file size — the streaming half of
    ``ops.pointgrid.create_dem_from_las``."""
    if _load() is None:
        raise RuntimeError("native LAS decoder not built; run "
                           "`make -C native` or use io.las.read_las")
    if chunk_points < 1:
        raise ValueError("chunk_points must be >= 1")
    hdr = read_header(filename)
    n = hdr["num_point_records"]
    # the decoder restarts its stride phase at `first`, so chunk
    # boundaries must sit on stride multiples — otherwise the streamed
    # decimation would select a different subset than the one-shot
    # read_las_arrays(stride=) path
    stride = max(1, int(stride))
    step = max(stride, (int(chunk_points) // stride) * stride)
    for first in range(0, n, step):
        count = min(step, n - first)
        yield _decode(filename, first, count, stride, bbox, n_threads,
                      hdr, count)
