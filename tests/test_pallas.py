"""Pallas kernel parity vs the XLA reference path (interpret mode on
the CPU backend; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

from neilpy_tpu.ops.pallas_scan import (openness_counts_pallas,
                                        geomorphons_pallas)
from neilpy_tpu.ops.visibility import count_openness, geomorphons


@pytest.fixture(scope="module")
def Z(rng=None):
    r = np.random.default_rng(7)
    return r.normal(size=(100, 140)).cumsum(axis=0).cumsum(axis=1).astype(
        np.float32)


@pytest.mark.parametrize("threshold", [0.0, 1.0, 5.0])
def test_counts_match_xla(Z, threshold):
    np_p, nn_p = openness_counts_pallas(Z, cellsize=2.0, lookup_pixels=7,
                                        threshold_angle=threshold,
                                        tile=(64, 64))
    np_x, nn_x = count_openness(Z, 2.0, 7, threshold)
    np.testing.assert_array_equal(np.asarray(np_p), np.asarray(np_x))
    np.testing.assert_array_equal(np.asarray(nn_p), np.asarray(nn_x))


@pytest.mark.parametrize("lookup", [1, 5, 13])
def test_classes_match_xla(Z, lookup):
    G_p = np.asarray(geomorphons_pallas(Z, cellsize=2.0,
                                        lookup_pixels=lookup,
                                        tile=(64, 64)))
    G_x = np.asarray(geomorphons(Z, cellsize=2.0, lookup_pixels=lookup))
    np.testing.assert_array_equal(G_p, G_x)


def test_nan_terrain(Z):
    Zn = Z.copy()
    Zn[30:40, 50:70] = np.nan
    G_p = np.asarray(geomorphons_pallas(Zn, lookup_pixels=5,
                                        tile=(64, 64)))
    G_x = np.asarray(geomorphons(Zn, lookup_pixels=5))
    np.testing.assert_array_equal(G_p, G_x)


@pytest.mark.parametrize("lookup", [7, 23])
def test_fast_ladder_matches_xla(Z, lookup):
    """'fast' progressive ladder (unrolled static slices in Pallas)
    visits the same L levels as the XLA scan -> identical classes."""
    G_p = np.asarray(geomorphons_pallas(Z, cellsize=2.0,
                                        lookup_pixels=lookup, fast=True,
                                        tile=(64, 64)))
    G_x = np.asarray(geomorphons(Z, cellsize=2.0, lookup_pixels=lookup,
                                 fast=True, engine="xla"))
    np.testing.assert_array_equal(G_p, G_x)


@pytest.mark.heavy
def test_fast_ladder_nan_and_boundary():
    rng = np.random.default_rng(9)
    Z = rng.normal(size=(640, 640)).cumsum(axis=0).astype(np.float32)
    Z[200:210, 300:320] = np.nan
    G_p = np.asarray(geomorphons_pallas(Z, cellsize=2, lookup_pixels=23,
                                        fast=True, tile=(64, 128)))
    G_x = np.asarray(geomorphons(Z, cellsize=2, lookup_pixels=23,
                                 fast=True, engine="xla"))
    np.testing.assert_array_equal(G_p, G_x)


def test_nan_hole_in_safe_tile():
    """A nodata hole deep in the raster interior, where the tile's read
    window is geometrically clean: the maskless interior fast path must
    still be bypassed (via the per-tile NaN grid) or every pixel whose
    ray crosses the hole is misclassified.  Regression: the r2 interior
    fast path shipped without the NaN grid and failed exactly here
    (54 wrong pixels on this fixture)."""
    rng = np.random.default_rng(5)
    Z = rng.normal(size=(640, 640)).cumsum(axis=0).astype(np.float32)
    Z[200:210, 300:320] = np.nan
    G_p = np.asarray(geomorphons_pallas(Z, cellsize=2, lookup_pixels=2,
                                        tile=(64, 128)))
    G_x = np.asarray(geomorphons(Z, cellsize=2, lookup_pixels=2,
                                 engine="xla"))
    np.testing.assert_array_equal(G_p, G_x)


@pytest.mark.parametrize("fast", [False, True])
def test_9patch_specialization_matches_dynamic(fast):
    """The static 9-patch boundary specialization must be bit-identical
    to the dynamic (runtime-cond) kernel — same per-direction routing
    predicate, folded at compile time — including across a NaN hole in
    a geometrically-safe tile and non-tile-aligned padding rows."""
    rng = np.random.default_rng(11)
    Z = rng.normal(size=(130, 260)).cumsum(axis=1).astype(np.float32)
    Z[60:64, 120:130] = np.nan
    kw = dict(cellsize=3.0, lookup_pixels=12, threshold_angle=1.0,
              tile=(40, 128), fast=fast)
    np_d, nn_d = openness_counts_pallas(Z, **kw)
    np_s, nn_s = openness_counts_pallas(Z, specialize=True, **kw)
    np.testing.assert_array_equal(np.asarray(np_d), np.asarray(np_s))
    np.testing.assert_array_equal(np.asarray(nn_d), np.asarray(nn_s))


def test_9patch_fused_reductions_match_dynamic():
    """specialize=True parity for the fused in-kernel reductions
    (openness / skyview / ternary share ``_reduced_kernel``)."""
    from neilpy_tpu.ops.pallas_scan import (openness_pallas,
                                            skyview_pallas,
                                            ternary_pallas)
    rng = np.random.default_rng(13)
    Z = (rng.random((96, 260)) * 100).astype(np.float32)
    Z[40:44, 100:110] = np.nan
    kw = dict(cellsize=2.0, lookup_pixels=10, tile=(32, 128))
    for fn, extra in [(openness_pallas, {}),
                      (skyview_pallas, {}),
                      (ternary_pallas, {"threshold_angle": 1.0})]:
        a = fn(Z, **kw, **extra)
        b = fn(Z, **kw, **extra, specialize=True)
        if not isinstance(a, tuple):
            a, b = (a,), (b,)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_specialize_default_resolution():
    """``specialize=None`` resolves to the measured-best default: ON
    only for compiled (non-interpret) EXACT ladders; interpret mode
    and the unrolled fast ladder stay dynamic (see
    ``_resolve_specialize``).  Explicit values pass through."""
    from neilpy_tpu.ops.pallas_scan import _resolve_specialize
    assert _resolve_specialize(None, interpret=False, fast=False) is True
    assert _resolve_specialize(None, interpret=True, fast=False) is False
    assert _resolve_specialize(None, interpret=False, fast=True) is False
    assert _resolve_specialize(None, interpret=True, fast=True) is False
    assert _resolve_specialize(True, interpret=True, fast=True) is True
    assert _resolve_specialize(False, interpret=False, fast=False) is False


def test_9patch_single_region_degenerate():
    """A raster smaller than one ladder reach in every direction: the
    9-patch partition collapses to a single all-masked region."""
    rng = np.random.default_rng(12)
    Z = rng.normal(size=(24, 40)).cumsum(axis=0).astype(np.float32)
    kw = dict(cellsize=1.0, lookup_pixels=30, tile=(24, 128))
    np_d, nn_d = openness_counts_pallas(Z, **kw)
    np_s, nn_s = openness_counts_pallas(Z, specialize=True, **kw)
    np.testing.assert_array_equal(np.asarray(np_d), np.asarray(np_s))
    np.testing.assert_array_equal(np.asarray(nn_d), np.asarray(nn_s))


def test_non_tile_aligned_shape():
    r = np.random.default_rng(3)
    Z = r.normal(size=(70, 90)).cumsum(axis=0).astype(np.float32)
    G_p = np.asarray(geomorphons_pallas(Z, lookup_pixels=4,
                                        tile=(64, 64)))
    G_x = np.asarray(geomorphons(Z, lookup_pixels=4))
    np.testing.assert_array_equal(G_p, G_x)


@pytest.mark.heavy
def test_lookup_larger_than_tile(Z):
    # halo (R=40) far exceeds the 32-px tile: windows span many tiles
    G_p = np.asarray(geomorphons_pallas(Z[:64, :96], lookup_pixels=40,
                                        tile=(32, 32)))
    G_x = np.asarray(geomorphons(Z[:64, :96], lookup_pixels=40))
    np.testing.assert_array_equal(G_p, G_x)


@pytest.mark.heavy
def test_geomorphons_engine_param(rng):
    from neilpy_tpu.ops.visibility import geomorphons
    Z = rng.normal(size=(40, 60)).cumsum(axis=0).astype(np.float32)
    a = np.asarray(geomorphons(Z, cellsize=2, lookup_pixels=5,
                               threshold_angle=1, engine="xla"))
    b = np.asarray(geomorphons(Z, cellsize=2, lookup_pixels=5,
                               threshold_angle=1, engine="pallas"))
    np.testing.assert_array_equal(a, b)
    # enhance path through the pallas engine
    Zb = rng.normal(size=(64, 64)).cumsum(axis=1).astype(np.float32)
    a = np.asarray(geomorphons(Zb, cellsize=1, lookup_pixels=18,
                               enhance=True, engine="xla"))
    b = np.asarray(geomorphons(Zb, cellsize=1, lookup_pixels=18,
                               enhance=True, engine="pallas"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.heavy
def test_openness_engine_param(rng):
    from neilpy_tpu.ops.visibility import openness
    Z = rng.normal(size=(48, 70)).cumsum(axis=0).astype(np.float32)
    Z[10:13, 20:25] = np.nan  # NaN terrain handled identically
    a = np.asarray(openness(Z, cellsize=2, lookup_pixels=6, engine="xla"))
    b = np.asarray(openness(Z, cellsize=2, lookup_pixels=6,
                            engine="pallas"))
    np.testing.assert_allclose(a, b, atol=1e-4, equal_nan=True)
    # direction subset
    a = np.asarray(openness(Z, lookup_pixels=4, neighbors=[1, 5],
                            engine="xla"))
    b = np.asarray(openness(Z, lookup_pixels=4, neighbors=[1, 5],
                            engine="pallas"))
    np.testing.assert_allclose(a, b, atol=1e-4, equal_nan=True)


def test_directional_extrema_pallas_matches_xla(rng):
    from neilpy_tpu.ops.pallas_scan import directional_extrema_pallas
    from neilpy_tpu.ops.visibility import directional_ratio_extrema
    Z = rng.normal(size=(40, 60)).cumsum(axis=1).astype(np.float32)
    mx_p, mn_p = directional_extrema_pallas(Z, cellsize=1.5,
                                            lookup_pixels=7)
    mx_x, mn_x, seen = directional_ratio_extrema(Z, cellsize=1.5,
                                                 lookup_pixels=7)
    np.testing.assert_allclose(np.asarray(mx_p), np.asarray(mx_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mn_p), np.asarray(mn_x),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mx_p) > -np.inf,
                                  np.asarray(seen))


def test_ternary_pattern_engine(rng):
    from neilpy_tpu.ops.visibility import ternary_pattern_from_openness
    Z = rng.normal(size=(40, 50)).cumsum(axis=0).astype(np.float32)
    a = np.asarray(ternary_pattern_from_openness(Z, lookup_pixels=5,
                                                 engine="xla"))
    b = np.asarray(ternary_pattern_from_openness(Z, lookup_pixels=5,
                                                 engine="pallas"))
    np.testing.assert_array_equal(a, b)


class TestFusedReduction:
    """The fused in-kernel reduction kernels (VERDICT r3 #4): openness
    / skyview / ternary reduce the 8 directional extrema inside the
    Pallas kernel (2/1/1 HBM plane writes instead of 16).  Interpret
    mode on CPU; the hardware check runs the same kernels via Mosaic."""

    def test_atan_f32_accuracy(self):
        """In-kernel atan (Mosaic has no atan primitive): Cephes-style
        f32 range reduction + odd minimax polynomial must stay within
        ~2e-7 rad of the f64 oracle across 12 decades and the special
        values."""
        from neilpy_tpu.ops.pallas_scan import _atan_f32
        x = np.concatenate([
            np.linspace(-100, 100, 40001),
            np.logspace(-8, 8, 4001), -np.logspace(-8, 8, 4001),
            [0.0, -0.0, np.inf, -np.inf, 1.0, -1.0,
             0.4142135623730950, 2.414213562373095]]).astype(np.float32)
        got = np.asarray(_atan_f32(x))
        want = np.arctan(x.astype(np.float64))
        assert np.max(np.abs(got - want)) < 2e-7
        assert got[np.where(x == np.inf)[0][0]] == np.float32(np.pi / 2)
        assert np.isnan(np.asarray(_atan_f32(np.float32(np.nan))))

    def test_openness_pair_engines(self, rng):
        """openness_pair: one ladder pass, both planes, both engines;
        the XLA pair is bit-identical to the two-pass openness(Z) /
        openness(-Z); the Pallas pair is within the in-kernel atan
        tolerance."""
        from neilpy_tpu.ops.visibility import openness, openness_pair
        Z = rng.normal(size=(90, 110)).cumsum(axis=0).astype(np.float32)
        Z[20:24, 30:36] = np.nan
        p2 = np.asarray(openness(Z, cellsize=2, lookup_pixels=8,
                                 engine="xla"))
        n2 = np.asarray(openness(-Z, cellsize=2, lookup_pixels=8,
                                 engine="xla"))
        p1, n1 = openness_pair(Z, cellsize=2, lookup_pixels=8,
                               engine="xla")
        np.testing.assert_array_equal(np.asarray(p1), p2)
        np.testing.assert_array_equal(np.asarray(n1), n2)
        pp, nn = openness_pair(Z, cellsize=2, lookup_pixels=8,
                               engine="pallas")
        np.testing.assert_allclose(np.asarray(pp), p2, atol=1e-4,
                                   equal_nan=True)
        np.testing.assert_allclose(np.asarray(nn), n2, atol=1e-4,
                                   equal_nan=True)

    def test_openness_unseen_is_inf(self):
        """A pixel whose every ladder step hits NaN must stay +inf in
        the fused kernel exactly like _angles_from_extrema."""
        from neilpy_tpu.ops.pallas_scan import openness_pallas
        Z = np.full((32, 140), np.nan, dtype=np.float32)
        Z[16, 70] = 5.0  # isolated pixel: all 8 rays see only NaN
        p, n = openness_pallas(Z, lookup_pixels=3)
        assert np.isposinf(np.asarray(p)[16, 70])
        assert np.isposinf(np.asarray(n)[16, 70])

    def test_skyview_engines(self, rng):
        from neilpy_tpu.ops.visibility import skyview_factor
        Z = rng.normal(size=(80, 100)).cumsum(axis=1).astype(np.float32)
        a = np.asarray(skyview_factor(Z, cellsize=1.5, lookup_pixels=9,
                                      engine="xla"))
        b = np.asarray(skyview_factor(Z, cellsize=1.5, lookup_pixels=9,
                                      engine="pallas"))
        np.testing.assert_allclose(a, b, atol=1e-6)

    @pytest.mark.heavy
    def test_ternary_modes_and_thresholds(self, rng):
        from neilpy_tpu.ops.visibility import ternary_pattern_from_openness
        Z = rng.normal(size=(70, 90)).cumsum(axis=0).astype(np.float32)
        Z[10:12, 20:23] = np.nan
        for neg in (True, False):
            for t in (0.0, 2.0):
                a = np.asarray(ternary_pattern_from_openness(
                    Z, lookup_pixels=6, threshold_angle=t,
                    use_negative_openness=neg, engine="xla"))
                b = np.asarray(ternary_pattern_from_openness(
                    Z, lookup_pixels=6, threshold_angle=t,
                    use_negative_openness=neg, engine="pallas"))
                assert (a == b).mean() == 1.0, (neg, t)
        # lowest-equivalent LUT composes with the fused kernel
        a = np.asarray(ternary_pattern_from_openness(
            Z, lookup_pixels=6, lowest=True, engine="xla"))
        b = np.asarray(ternary_pattern_from_openness(
            Z, lookup_pixels=6, lowest=True, engine="pallas"))
        np.testing.assert_array_equal(a, b)

    @pytest.mark.heavy
    def test_fused_fast_ladder_and_odd_shapes(self, rng):
        """Fast progressive ladder + non-tile-aligned shape + lookup
        exceeding the tile through the fused openness kernel."""
        from neilpy_tpu.ops.pallas_scan import openness_pallas
        from neilpy_tpu.ops.visibility import openness
        Z = rng.normal(size=(70, 90)).cumsum(axis=0).astype(np.float32)
        p, _ = openness_pallas(Z, cellsize=2, lookup_pixels=23,
                               fast=True, tile=(32, 128))
        w = np.asarray(openness(Z, cellsize=2, lookup_pixels=23,
                                fast=True, engine="xla"))
        np.testing.assert_allclose(np.asarray(p), w, atol=1e-4)
        p2, _ = openness_pallas(Z[:64, :], lookup_pixels=40,
                                tile=(32, 128))
        w2 = np.asarray(openness(Z[:64, :], lookup_pixels=40,
                                 engine="xla"))
        np.testing.assert_allclose(np.asarray(p2), w2, atol=1e-4)
