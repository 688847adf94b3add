import numpy as np
import pytest
import scipy.ndimage as ndi

from neilpy_tpu.ops.pointgrid import create_dem, bin_points
from neilpy_tpu.ops.inpaint import (inpaint_nans_by_springs,
                                    inpaint_nans_by_fda, inpaint_nearest)
from neilpy_tpu.ops.morphology import (grey_erosion_disk, grey_dilation_disk,
                                       opening_disk, opening)
from neilpy_tpu.core.codes import disk
from .reference_impls import np_spring_inpaint


class TestCreateDem:
    def test_binning_matches_pandas_groupby(self, rng):
        import pandas as pd
        n = 20000
        x = rng.uniform(512000, 512100, n)
        y = rng.uniform(5403000, 5403080, n)
        z = rng.normal(300, 10, n)
        I, t = create_dem(x, y, z, cellsize=1, bin_type="min")
        I = np.asarray(I)
        # reference-style oracle: pandas groupby min on the same indices
        flat, valid, (ny, nx), t2 = bin_points(x, y, cellsize=1)
        assert list(t) == list(t2)
        ref = np.full(ny * nx, np.nan)
        g = pd.DataFrame({"i": flat, "z": z}).groupby("i").min()
        ref[g.index.values] = g.values[:, 0]
        ref = ref.reshape(ny, nx)
        m = np.isfinite(ref)
        assert (np.isfinite(I) == m).all()
        np.testing.assert_allclose(I[m], ref[m].astype(np.float32), rtol=0,
                                   atol=0)

    def test_max_bin(self, rng):
        x = rng.uniform(0, 50, 5000)
        y = rng.uniform(0, 40, 5000)
        z = rng.normal(size=5000)
        Imax, _ = create_dem(x, y, z, cellsize=2, bin_type="max")
        Imin, _ = create_dem(x, y, z, cellsize=2, bin_type="min")
        m = np.isfinite(np.asarray(Imax))
        assert (np.asarray(Imax)[m] >= np.asarray(Imin)[m]).all()

    def test_explicit_edges_drop_out_of_range(self, rng):
        x = np.array([0.5, 5.5, 99.0])
        y = np.array([0.5, 5.5, 99.0])
        z = np.array([1.0, 2.0, 3.0])
        edges = (np.arange(0, 11.0), np.arange(10.0, -1, -1))
        I, t = create_dem(x, y, z, bin_type="max", edges=edges)
        I = np.asarray(I)
        assert I.shape == (10, 10)
        assert np.nansum(I) == 3.0  # out-of-range point dropped

    @pytest.mark.parametrize("bin_type", ["min", "max"])
    def test_sort_and_scatter_methods_agree(self, bin_type, rng):
        x = rng.uniform(1000, 1200, 30000)
        y = rng.uniform(5000, 5150, 30000)
        z = rng.normal(size=30000)
        a = np.asarray(create_dem(x, y, z, cellsize=1, bin_type=bin_type,
                                  method="sort")[0])
        b = np.asarray(create_dem(x, y, z, cellsize=1, bin_type=bin_type,
                                  method="scatter")[0])
        np.testing.assert_array_equal(np.nan_to_num(a, nan=9e9),
                                      np.nan_to_num(b, nan=9e9))

    def test_device_bin_fast_path(self, rng):
        # fused on-device binning matches host-f64 binning except for
        # points within one f32 ulp of a cell edge (none here: the
        # coordinates are generated away from edges)
        n = 50000
        x = rng.uniform(500000, 500200, n)
        y = rng.uniform(4200000, 4200150, n)
        # keep every coordinate >1e-3 away from the cell edges (which
        # sit at half-integers: the origin is snapped to -0.5*cellsize)
        def nudge(v):
            frac = v - 0.5 - np.round(v - 0.5)
            return np.where(np.abs(frac) < 1e-3, v + 0.01, v)
        x = nudge(x)
        y = nudge(y)
        z = rng.normal(300, 10, n)
        a, ta = create_dem(x, y, z, cellsize=1, bin_type="min")
        b, tb = create_dem(x, y, z, cellsize=1, bin_type="min",
                           device_bin=True)
        assert list(ta) == list(tb)
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(a), nan=9e9),
            np.nan_to_num(np.asarray(b), nan=9e9))

    @pytest.mark.parametrize("bin_type,chunks", [("min", 3), ("max", 4),
                                                 ("min", 7)])
    def test_device_bin_chunked_stream_bit_identical(self, bin_type,
                                                     chunks, rng):
        # streamed gridding (host shift overlapped with device scatter)
        # must be BIT-identical to the fused single-program path:
        # min/max scatter is order-independent, and chunk 7 exercises
        # the padded tail (50000 % 7 != 0)
        n = 50000
        x = rng.uniform(500000, 500200, n)
        y = rng.uniform(4200000, 4200150, n)
        z = rng.normal(300, 10, n)
        a, ta = create_dem(x, y, z, cellsize=1, bin_type=bin_type,
                           device_bin=True)
        b, tb = create_dem(x, y, z, cellsize=1, bin_type=bin_type,
                           device_bin=True, chunks=chunks)
        assert list(ta) == list(tb)
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(a), nan=9e9),
            np.nan_to_num(np.asarray(b), nan=9e9))

    def test_chunked_stream_rejects_sort_method(self, rng):
        x = rng.uniform(0, 10, 100)
        y = rng.uniform(0, 10, 100)
        z = rng.normal(size=100)
        with pytest.raises(ValueError, match="order-independent"):
            create_dem(x, y, z, device_bin=True, method="sort",
                       chunks=2)

    def test_points_exactly_on_cell_edges(self):
        """Points landing EXACTLY on interior cell edges are
        lower-edge-inclusive, like the reference's
        ``floor(~affine * (x, y))`` (neilpy.py:1142-1144).  With
        cellsize=1 the grid edges sit on half-integers, so half-integer
        coordinates are exact edge hits in both f64 and f32 — the host
        and device binning paths must agree bit-for-bit here
        (verify-skill 'worth probing' item)."""
        x = np.array([0.0, 0.5, 1.0, 1.5])
        y = np.array([0.0, 0.5, 1.0, 1.5])
        z = np.array([10.0, 20.0, 30.0, 40.0])
        # edges: x [-0.5, 0.5, 1.5, 2.5], y [2.5, 1.5, 0.5, -0.5]
        # cols = floor(x + 0.5) -> 0, 1, 1, 2
        # rows = floor(2.5 - y) -> 2, 2, 1, 1
        expect = {(2, 0): 10.0, (2, 1): 20.0, (1, 1): 30.0, (1, 2): 40.0}
        for device_bin in (False, True):
            I, t = create_dem(x, y, z, cellsize=1, bin_type="max",
                              device_bin=device_bin)
            I = np.asarray(I)
            assert I.shape == (3, 3)
            assert np.isfinite(I).sum() == 4
            for (r, c), v in expect.items():
                assert I[r, c] == v, (device_bin, r, c, I)

    def test_scatter_reduce_rejects_int32_overflow(self):
        """Grids beyond 2**31 cells must RAISE from the flat-index
        kernel, never wrap silently (VERDICT r3 #3; the reference's
        groupby is int64 throughout, neilpy.py:1142-1151).  The check
        fires at trace time, before any grid allocation."""
        from neilpy_tpu.ops.pointgrid import scatter_reduce
        n_cells = 50000 * 50000  # 2.5e9 > 2**31-1
        idx = np.zeros(4, dtype=np.int64)
        z = np.ones(4, dtype=np.float32)
        valid = np.ones(4, dtype=bool)
        with pytest.raises(ValueError, match="int32"):
            scatter_reduce(idx, z, valid, n_cells, bin_type="max")

    def test_create_dem_huge_grid_sort_method_raises(self):
        """The host path must refuse method='sort' for >int32 grids
        (flat sort keys) with a clear error — before allocating."""
        x = np.array([0.0, 49999.0])
        y = np.array([0.0, 49999.0])
        z = np.array([1.0, 2.0])
        with pytest.raises(ValueError, match="scatter"):
            create_dem(x, y, z, cellsize=1, method="sort")

    def test_scatter_reduce_rc_matches_flat(self, rng):
        """The 2-D (row, col) overflow-safe kernel must produce the
        same grid as the flat-index kernel on int32-safe shapes."""
        from neilpy_tpu.ops.pointgrid import (scatter_reduce,
                                              _scatter_reduce_rc)
        ny, nx = 37, 53
        n = 5000
        r = rng.integers(0, ny, n)
        c = rng.integers(0, nx, n)
        z = rng.normal(size=n).astype(np.float32)
        valid = rng.random(n) > 0.1
        for bin_type in ("max", "min"):
            flat = scatter_reduce((r * nx + c).astype(np.int64), z,
                                  valid, ny * nx, bin_type=bin_type)
            rc = _scatter_reduce_rc(r.astype(np.int32),
                                    c.astype(np.int32), z, valid,
                                    ny, nx, bin_type)
            np.testing.assert_array_equal(
                np.nan_to_num(np.asarray(flat).reshape(ny, nx), nan=9e9),
                np.nan_to_num(np.asarray(rc), nan=9e9))

    def test_chunked_inf_values_match_fused(self):
        """A legitimate z=+inf point must survive bin_type='max'
        gridding identically on the fused and chunked paths: only the
        reduction identity maps to NaN (ADVICE r3)."""
        x = np.array([0.2, 1.2, 2.2, 0.2, 1.2, 2.2])
        y = np.array([0.2, 0.2, 0.2, 1.2, 1.2, 1.2])
        z = np.array([np.inf, 1.0, 2.0, -np.inf, 3.0, np.inf],
                     dtype=np.float32)
        a, _ = create_dem(x, y, z, cellsize=1, bin_type="max",
                          device_bin=True)
        b, _ = create_dem(x, y, z, cellsize=1, bin_type="max",
                          device_bin=True, chunks=3)
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(np.nan_to_num(a, nan=9e9),
                                      np.nan_to_num(b, nan=9e9))
        assert np.isposinf(a).sum() == 2  # both +inf cells preserved
        # the -inf-only cell equals the max identity -> empty (NaN),
        # same convention as the fused scatter_reduce: of the 6
        # occupied cells, exactly that one reads back as NaN
        assert np.isnan(a).sum() == a.size - 5

    def test_north_up_orientation(self):
        # a single point at high y must land in a low row index
        x = np.array([5.0, 5.0])
        y = np.array([1.0, 9.0])
        z = np.array([1.0, 2.0])
        I, t = create_dem(x, y, z, cellsize=1, bin_type="max")
        I = np.asarray(I)
        rows = np.where(np.isfinite(I))[0]
        assert I[rows.min()].max() == 2.0  # northern point in top row


class TestInpaint:
    def test_springs_matches_lsqr(self, rng):
        A = rng.normal(size=(40, 50)).cumsum(axis=0).cumsum(axis=1)
        A[10:18, 12:22] = np.nan
        A[30, 40] = np.nan
        A[0, :5] = np.nan
        ours = np.asarray(inpaint_nans_by_springs(A))
        ref = np_spring_inpaint(A)
        assert np.abs(ours - ref).max() < 5e-3

    def test_springs_preserves_known(self, rng):
        A = rng.normal(size=(20, 20))
        A[5:8, 5:8] = np.nan
        out = np.asarray(inpaint_nans_by_springs(A))
        m = np.isfinite(A)
        np.testing.assert_array_equal(out[m], A[m].astype(np.float32))
        assert np.isfinite(out).all()

    def test_springs_flat_region(self):
        A = np.full((10, 10), 7.0)
        A[4:6, 4:6] = np.nan
        out = np.asarray(inpaint_nans_by_springs(A))
        np.testing.assert_allclose(out, 7.0, atol=1e-5)

    def test_springs_return_info_and_convergence(self, rng):
        A = rng.normal(size=(40, 50)).cumsum(axis=0)
        A[10:20, 10:25] = np.nan
        out, info = inpaint_nans_by_springs(A, return_info=True)
        assert info["converged"] and 0 < info["iterations"] < info["maxiter"]
        assert np.isfinite(np.asarray(out)).all()

    def test_springs_maxiter_warns(self, rng):
        import warnings as w
        A = rng.normal(size=(40, 50)).cumsum(axis=0)
        A[5:35, 5:45] = np.nan
        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            _, info = inpaint_nans_by_springs(A, maxiter=3,
                                              return_info=True)
        assert not info["converged"]
        assert any("maxiter" in str(r.message) for r in rec)

    @pytest.mark.heavy
    def test_springs_multiscale_same_equilibrium(self, rng):
        """The multigrid-preconditioned solve must converge to the same
        equilibrium as the unpreconditioned one (the preconditioner
        only changes the search directions, not the fixed point)."""
        A = rng.normal(size=(96, 128)).cumsum(axis=0).cumsum(axis=1)
        A[20:60, 30:90] = np.nan
        a = np.asarray(inpaint_nans_by_springs(A, multiscale=True,
                                               tol=1e-7))
        b = np.asarray(inpaint_nans_by_springs(A, multiscale=False,
                                               tol=1e-7, maxiter=20000))
        ref = np_spring_inpaint(A.astype(np.float64))
        assert np.abs(a - ref).max() < 5e-3
        assert np.abs(a - b).max() < 1e-2

    @pytest.mark.heavy
    def test_springs_multiscale_fewer_iterations(self, rng):
        """On a large contiguous NaN region the pyramid start must cut
        the CG iteration count substantially."""
        A = rng.normal(size=(256, 256)).cumsum(axis=0)
        A[40:200, 40:200] = np.nan
        _, flat = inpaint_nans_by_springs(A, multiscale=False,
                                          maxiter=50000, return_info=True)
        _, pyr = inpaint_nans_by_springs(A, multiscale=True,
                                         maxiter=50000, return_info=True)
        assert pyr["iterations"] < flat["iterations"] / 2

    def test_fda_smooth(self, rng):
        # fda reproduces a smooth (harmonic-ish) surface closely
        yy, xx = np.mgrid[0:30, 0:30]
        A = (0.1 * xx + 0.2 * yy).astype(float)
        hole = A.copy()
        hole[10:20, 10:20] = np.nan
        out = np.asarray(inpaint_nans_by_fda(hole))
        assert np.abs(out - A).max() < 1e-2

    def test_inpaint_nearest(self, rng):
        A = rng.normal(size=(15, 17))
        A[5:9, 5:9] = np.nan
        out = inpaint_nearest(A.copy())
        assert np.isfinite(out).all()
        # filled values come from the finite set
        finite_vals = set(np.round(A[np.isfinite(A)], 6).ravel())
        assert set(np.round(out[5:9, 5:9], 6).ravel()) <= finite_vals


class TestMorphology:
    @pytest.mark.parametrize("radius", [1, 2, 5, 11, 18])
    def test_disk_erosion_exact(self, radius, rng):
        Z = rng.normal(size=(60, 73)).cumsum(axis=0).astype(np.float32)
        ours = np.asarray(grey_erosion_disk(Z, radius))
        ref = ndi.grey_erosion(Z, footprint=disk(radius))
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("radius", [1, 3, 10])
    def test_disk_opening_exact(self, radius, rng):
        Z = rng.normal(size=(40, 55)).cumsum(axis=1).astype(np.float32)
        ours = np.asarray(opening_disk(Z, radius))
        e = ndi.grey_erosion(Z, footprint=disk(radius))
        ref = ndi.grey_dilation(e, footprint=disk(radius))
        np.testing.assert_array_equal(ours, ref)

    def test_generic_footprint(self, rng):
        Z = rng.normal(size=(30, 30)).astype(np.float32)
        fp = np.ones((3, 3), dtype=np.uint8)
        ours = np.asarray(opening(Z, fp))
        e = ndi.grey_erosion(Z, footprint=fp)
        ref = ndi.grey_dilation(e, footprint=fp)
        np.testing.assert_array_equal(ours, ref)

    def test_opening_leq_input(self, rng):
        Z = rng.normal(size=(30, 30)).astype(np.float32)
        assert (np.asarray(opening_disk(Z, 4)) <= Z + 1e-6).all()


@pytest.mark.heavy
def test_inpaint_nearest_device_jfa(rng):
    """Device jump-flooding fill: everywhere-filled, values from the
    finite set, >=99.9% of cells take the exactly-nearest seed."""
    from scipy.spatial import cKDTree
    from neilpy_tpu.ops.inpaint import inpaint_nearest_device
    A = np.full((48, 64), np.nan, dtype=np.float32)
    idx = rng.random((48, 64)) < 0.04
    A[idx] = rng.normal(size=int(idx.sum())).astype(np.float32)
    out = np.asarray(inpaint_nearest_device(A))
    assert np.isfinite(out).all()
    finite_vals = set(A[idx].tolist())
    assert set(out[~idx].ravel().tolist()) <= finite_vals
    seeds = np.argwhere(idx)
    tree = cKDTree(seeds)
    miss = np.argwhere(~idx)
    d_exact, _ = tree.query(miss)
    seedpos = {v: tuple(p) for v, p in zip(A[idx], seeds)}
    chosen = np.array([seedpos[out[tuple(p)]] for p in miss])
    d_jfa = np.sqrt(((chosen - miss) ** 2).sum(1))
    assert np.mean(np.isclose(d_jfa, d_exact)) > 0.999
