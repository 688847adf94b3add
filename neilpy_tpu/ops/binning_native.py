"""ctypes binding for the native (C++) point-binning kernel.

The exact gridding path computes f64 bin indices on host
(ops/pointgrid.py); numpy needs ~10 full-array temporaries for it.
The native kernel (native/binning.cpp) does the inverse-affine floor
binning in one multithreaded pass — the framework's native fast path
for the host leg of create_dem.  Falls back transparently to numpy
when the shared library hasn't been built (``make -C native``).

Results are identical to the numpy path up to f64 associativity (the
affine inverse is applied as ``(x - x0) / cs`` instead of the
algebraically equal ``ia*x + ic``); points landing bit-exactly on a
cell edge are the only cells that could differ.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["native_available", "bin_points_native"]

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native",
                         "libbinning.so")


_LOAD_FAILED = False


_BUILDINFO_PATH = os.path.join(os.path.dirname(_LIB_PATH),
                               "buildinfo.json")


def _cpu_signature():
    """Machine + ISA-extension fingerprint of the current host.  The
    Makefile tunes for the build host (-march=native), so a .so that
    migrated with a repo checkout to a different CPU must be rebuilt,
    not executed (AVX-512 code on a non-AVX host is a SIGILL, which
    ctypes cannot catch)."""
    import hashlib
    import platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        # no /proc/cpuinfo (non-Linux): the flags hash is of "" and the
        # freshness check degrades to machine-arch only
        pass
    return {"machine": platform.machine(),
            "cpu_flags_md5": hashlib.md5(flags.encode()).hexdigest()}


def _buildinfo_fresh():
    import json
    try:
        with open(_BUILDINFO_PATH) as f:
            return json.load(f) == _cpu_signature()
    except Exception:
        return False


def _try_build():
    """Attempt a one-time local build of the library.

    The .so is not shipped with the repo (it would be arch-specific);
    it is built on first use when a toolchain is present, tuned for
    the build host, and stamped with the host's CPU signature so a
    checkout moved to a different machine rebuilds instead of
    executing foreign vector code.
    """
    import json
    import subprocess
    makefile_dir = os.path.join(os.path.dirname(__file__), "..", "..",
                                "native")
    if not os.path.exists(os.path.join(makefile_dir, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", makefile_dir, "clean"],
                       capture_output=True, timeout=60)
        subprocess.run(["make", "-C", makefile_dir], check=True,
                       capture_output=True, timeout=120)
        if not os.path.exists(_LIB_PATH):
            return False
        with open(_BUILDINFO_PATH, "w") as f:
            json.dump(_cpu_signature(), f)
        return True
    except Exception:
        return False


def _load():
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    stale = os.path.exists(_LIB_PATH) and not _buildinfo_fresh()
    if (stale or not os.path.exists(_LIB_PATH)) and not _try_build():
        if not os.path.exists(_LIB_PATH):
            _LOAD_FAILED = True
            return None
        # build failed but a (possibly foreign) .so exists: refuse the
        # arch-tuned binary rather than risk SIGILL
        if stale:
            _LOAD_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bin_points_f64.restype = ctypes.c_long
        lib.bin_points_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        if hasattr(lib, "origin_shift_f64"):
            lib.origin_shift_f64.restype = None
            lib.origin_shift_f64.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
    except OSError:
        # unloadable .so (foreign arch, missing deps): numpy fallback
        _LOAD_FAILED = True
        return None
    _LIB = lib
    return _LIB


def origin_shift_native(x, y, x0, y0):
    """Multithreaded (x - x0, y0 - y) -> f32 for the device binning
    fast path; returns None when the library (or symbol) is missing."""
    lib = _load()
    if lib is None or not hasattr(lib, "origin_shift_f64"):
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    xr = np.empty(x.size, dtype=np.float32)
    yr = np.empty(y.size, dtype=np.float32)
    lib.origin_shift_f64(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.size, float(x0), float(y0),
        xr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        yr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return xr, yr


def native_available():
    return _load() is not None


def bin_points_native(x, y, cellsize=1, edges=None):
    """Native drop-in for ``ops.pointgrid.bin_points``: returns
    (flat int32, valid bool, (ny, nx), t)."""
    from .pointgrid import _grid_frame
    lib = _load()
    if lib is None:
        raise RuntimeError("native binning library not built; run "
                           "`make -C native`")
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    ny, nx, t, cellsize, _ = _grid_frame(x, y, cellsize, edges)
    if ny * nx >= 2 ** 31:
        raise ValueError("grid too large for int32 bin indices; use "
                         "bin_points(..., native=False) or tile first")
    n = x.size
    flat = np.empty(n, dtype=np.int32)
    valid = np.empty(n, dtype=np.uint8)
    lib.bin_points_f64(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, float(t.c), float(t.f), float(cellsize), ny, nx,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return flat, valid.astype(bool), (ny, nx), t
