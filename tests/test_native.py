"""Native (C++) LAS decoder tests — built on demand via make."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native():
    from neilpy_tpu.io import las_native
    if not las_native.native_available():
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-300:]}")
    assert las_native.native_available()
    return las_native


def test_native_matches_python(native, tmp_path):
    from .test_io import _write_synthetic_las
    from neilpy_tpu.io.las import read_las
    fn = str(tmp_path / "t.las")
    xi, yi, zi, scale, offset = _write_synthetic_las(fn, pdrf=3, n=5000)
    out = native.read_las_arrays(fn)
    hdr, df = read_las(fn)
    np.testing.assert_allclose(out["x"], df.x.values)
    np.testing.assert_allclose(out["y"], df.y.values)
    np.testing.assert_allclose(out["z"], df.z.values)
    np.testing.assert_array_equal(out["class"], df["class"].values)
    np.testing.assert_array_equal(out["return_number"],
                                  df.return_number.values)
    np.testing.assert_array_equal(out["intensity"], df.intensity.values)


def test_native_extended_pdrf(native, tmp_path):
    from .test_io import _write_synthetic_las
    from neilpy_tpu.io.las import read_las
    fn = str(tmp_path / "t6.las")
    _write_synthetic_las(fn, pdrf=6, n=2000)
    out = native.read_las_arrays(fn)
    hdr, df = read_las(fn)
    np.testing.assert_array_equal(out["class"], df["class"].values)
    assert (out["return_number"] == 2).all()
    assert (out["return_max"] == 3).all()


def test_native_bbox_and_stride(native, tmp_path):
    from .test_io import _write_synthetic_las
    fn = str(tmp_path / "t.las")
    _write_synthetic_las(fn, pdrf=1, n=10000)
    full = native.read_las_arrays(fn)
    xm = float(np.median(full["x"]))
    filt = native.read_las_arrays(fn, bbox=(full["x"].min(), xm,
                                            full["y"].min(),
                                            full["y"].max()))
    assert 0 < len(filt["x"]) < 10000
    assert (filt["x"] <= xm).all()
    dec = native.read_las_arrays(fn, stride=7)
    assert len(dec["x"]) == -(-10000 // 7)
    np.testing.assert_allclose(dec["x"], full["x"][::7])


def test_native_laz_rejected(native, tmp_path):
    from .test_io import _write_synthetic_las
    fn = str(tmp_path / "t.las")
    _write_synthetic_las(fn, pdrf=3)
    data = bytearray(open(fn, "rb").read())
    data[104] = 131
    open(fn, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="LAZ"):
        native.read_header(fn)


class TestNativeBinning:
    def test_matches_numpy_binning(self, rng):
        from neilpy_tpu.ops.binning_native import (native_available,
                                                   bin_points_native)
        from neilpy_tpu.ops.pointgrid import bin_points
        if not native_available():
            pytest.skip("libbinning.so not built")
        n = 300000
        x = rng.uniform(500000, 500400, n)
        y = rng.uniform(4200000, 4200300, n)
        f1, v1, s1, t1 = bin_points(x, y, cellsize=1, native=False)
        f2, v2, s2, t2 = bin_points_native(x, y, cellsize=1)
        assert s1 == s2 and list(t1) == list(t2)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(f1[v1], f2[v2].astype(np.int64))

    def test_explicit_edges(self, rng):
        from neilpy_tpu.ops.binning_native import (native_available,
                                                   bin_points_native)
        from neilpy_tpu.ops.pointgrid import bin_points
        if not native_available():
            pytest.skip("libbinning.so not built")
        x = np.array([0.6, 5.5, 99.0])
        y = np.array([0.6, 5.5, 99.0])
        edges = (np.arange(0, 11.0), np.arange(10.0, -1, -1))
        f1, v1, s1, _ = bin_points(x, y, edges=edges, native=False)
        f2, v2, s2, _ = bin_points_native(x, y, edges=edges)
        assert s1 == s2
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(f1[v1], f2[v2].astype(np.int64))

    def test_origin_shift(self, rng):
        from neilpy_tpu.ops.binning_native import origin_shift_native
        if origin_shift_native(np.zeros(1), np.zeros(1), 0, 0) is None:
            pytest.skip("libbinning.so without origin_shift_f64")
        x = rng.uniform(500000, 500100, 50000)
        y = rng.uniform(4200000, 4200100, 50000)
        xr, yr = origin_shift_native(x, y, 499999.5, 4200100.5)
        np.testing.assert_array_equal(xr, (x - 499999.5).astype(np.float32))
        np.testing.assert_array_equal(yr, (4200100.5 - y).astype(np.float32))


def test_invalid_points_same_flat_as_numpy(rng):
    """Out-of-grid points: both backends emit the same clipped flat
    index (always in-bounds), per the bin_points contract."""
    from neilpy_tpu.ops.binning_native import (native_available,
                                               bin_points_native)
    from neilpy_tpu.ops.pointgrid import bin_points
    if not native_available():
        pytest.skip("libbinning.so not built")
    x = rng.uniform(-5, 35, 5000)
    y = rng.uniform(-5, 25, 5000)
    edges = (np.arange(0, 31.0), np.arange(20.0, -1, -1))
    f1, v1, s1, _ = bin_points(x, y, edges=edges, native=False)
    f2, v2, s2, _ = bin_points_native(x, y, edges=edges)
    assert s1 == s2 and (~v1).sum() > 0
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2.astype(np.int64))
    assert f2.min() >= 0 and f2.max() < s2[0] * s2[1]


def test_unloadable_library_falls_back(tmp_path, monkeypatch):
    """A corrupt/foreign-arch .so must yield native_available()=False
    (numpy fallback), not an OSError out of the default path."""
    from neilpy_tpu.ops import binning_native as bn
    bad = tmp_path / "libbad.so"
    bad.write_bytes(b"\x7fELF garbage that cannot be dlopened")
    monkeypatch.setattr(bn, "_LIB", None)
    monkeypatch.setattr(bn, "_LOAD_FAILED", False)
    monkeypatch.setattr(bn, "_LIB_PATH", str(bad))
    assert bn._load() is None
    assert not bn.native_available()
    # and the high-level entry point still works via numpy
    from neilpy_tpu.ops.pointgrid import bin_points
    f, v, s, _ = bin_points(np.array([0.5]), np.array([0.5]), cellsize=1)
    assert v.all()
