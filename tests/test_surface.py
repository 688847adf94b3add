import os

import numpy as np
import pytest
import scipy.ndimage as ndi

from neilpy_tpu.ops import surface as sf
from .reference_impls import np_gradient_slope, np_hillshade, np_ashift


def test_slope_matches_numpy(terrain):
    for kind in ("degrees", "radians", "percent"):
        ours = np.asarray(sf.slope(terrain, cellsize=2.0, return_as=kind))
        ref = np_gradient_slope(terrain, cellsize=2.0, return_as=kind)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_esri_slope_matches_generic_filter(terrain):
    def slope_filter(n):
        n = n.reshape((3, 3))
        dz_dx = (np.sum(n[:, -1] * (1, 2, 1)) - np.sum(n[:, 0] * (1, 2, 1))) / 8
        dz_dy = (np.sum(n[-1, :] * (1, 2, 1)) - np.sum(n[0, :] * (1, 2, 1))) / 8
        return np.sqrt(dz_dx ** 2 + dz_dy ** 2)
    ref = np.rad2deg(np.arctan(
        ndi.generic_filter(terrain, slope_filter, size=3, mode="reflect") / 2.0))
    ours = np.asarray(sf.esri_slope(terrain, cellsize=2.0))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_aspect_compass_convention(terrain):
    ours = np.asarray(sf.aspect(terrain))
    gy, gx = np.gradient(terrain)
    A = np.pi / 2 - np.arctan2(gy, -gx)
    A[A < 0] += 2 * np.pi
    A = np.rad2deg(A)
    A[(gx == 0) & (gy == 0)] = np.nan
    m = np.isfinite(A)
    np.testing.assert_allclose(ours[m], A[m], atol=1e-3)


def test_hillshade(terrain):
    ours = np.asarray(sf.hillshade(terrain, cellsize=2.0))
    ref = np_hillshade(terrain, cellsize=2.0)
    # uint8 rounding at f32: allow off-by-one on a tiny fraction
    assert (np.abs(ours.astype(int) - ref.astype(int)) <= 1).all()
    assert (ours != ref).mean() < 0.02


def test_multiple_illumination(terrain):
    H = np.asarray(sf.multiple_illumination(terrain, zeniths=np.array([30, 60]),
                                            azimuths=4))
    H0 = np.asarray(sf.hillshade(terrain, zenith=30, azimuth=0))
    assert H.dtype == np.uint8
    assert (H.astype(int) >= H0.astype(int) - 1).all()


def test_pssm_uint8(terrain):
    P = np.asarray(sf.pssm(terrain, cellsize=1.0, apply_colormap=False))
    assert P.dtype == np.uint8
    rgba = sf.pssm(terrain, cellsize=1.0, apply_colormap=True)
    assert rgba.shape == terrain.shape + (4,)


def test_curvature_laplacian(terrain):
    ours = np.asarray(sf.curvature(terrain, cellsize=2.0))
    ref = -100 * ndi.laplace(terrain / 2.0)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=1e-3)


def test_curvature_smoke_value():
    # reference dev-scratch oracle (curvature.py:219-223): K_tan ~ .86
    # at the center of this 3x3 grid
    X = np.array([[2.0, 4, 6], [3, 6, 9], [1, 2, 4]])
    K_tan = np.asarray(sf.zevenbergen_and_thorne_curvature(X)[3])
    assert np.isclose(K_tan[1, 1], 0.86, atol=0.005), K_tan[1, 1]


def _np_zt_neighbors(X):
    return (np_ashift(X, 0), np_ashift(X, 1), np_ashift(X, 2),
            np_ashift(X, 7), np_ashift(X, 3), np_ashift(X, 6),
            np_ashift(X, 5), np_ashift(X, 4))


def test_esri_curvature_algebra(terrain):
    L = 2.0
    X = terrain
    Z1, Z2, Z3, Z4, Z6, Z7, Z8, Z9 = _np_zt_neighbors(X)
    D = ((Z4 + Z6) / 2 - X) / L ** 2
    E = ((Z2 + Z8) / 2 - X) / L ** 2
    K = -200 * (D + E)
    ours = np.asarray(sf.esri_curvature(X, cellsize=L)[0])
    np.testing.assert_allclose(ours, K, atol=1e-2)


def test_zt_curvature_finite(terrain):
    outs = sf.zevenbergen_and_thorne_curvature(terrain, cellsize=2.0)
    assert len(outs) == 6
    for o in outs[:1]:
        assert np.isfinite(np.asarray(o)).all()


def test_evans_curvature_nan_fill(terrain):
    Z = terrain.copy()
    Z[5, 5] = np.nan
    outs = sf.evans_curvature(Z, cellsize=1.0)
    K_profile = np.asarray(outs[1])
    # non-NaN pixels should have finite curvature (NaN scheme fills)
    finite_in = np.isfinite(Z)
    # direct neighbours of the NaN get reflected fills, stay finite
    assert np.isfinite(K_profile[4, 4])
    assert np.isnan(K_profile[5, 5]) or np.isfinite(K_profile[5, 5])


def test_wilson_gallant_runs(terrain):
    K, Kp, Kc, Kt = sf.wilson_gallant_curvature(terrain)
    assert np.asarray(K).shape == terrain.shape


def test_scaled_morphometry_keys(terrain):
    SM = sf.scaled_morphometry(terrain, cellsize=1, lookup_pixels=3)
    assert set(SM) == {"A", "S", "K", "K_profile", "K_cross", "K_long",
                       "K_tan", "K_plan"}
    S1 = np.asarray(sf.scaled_morphometry(terrain, lookup_pixels=1)["S"])
    assert np.nanmax(S1) <= 90


def test_vip_score(terrain):
    V = np.asarray(sf.vip_score(terrain, cellsize=1))
    assert V.shape == terrain.shape
    # flat terrain: no triangle heights
    flat = np.ones((8, 8))
    np.testing.assert_allclose(np.asarray(sf.vip_score(flat)), 0, atol=1e-6)


def test_std_matches_convolution(terrain):
    strel = np.ones((5, 5))
    ours = np.asarray(sf.std(terrain, strel))
    Xsum = ndi.convolve(terrain, strel, mode="nearest")
    Xss = ndi.convolve(terrain ** 2, strel, mode="nearest")
    Xm = Xsum / strel.sum()
    V = (Xss - 2 * Xm * Xsum + strel.sum() * Xm ** 2) / strel.sum()
    V[V < 0] = 0
    np.testing.assert_allclose(ours, np.sqrt(V), atol=1e-2)


def test_std2_matches_corrected_reference_body(terrain):
    # reference neilpy.py:2051-2053 is dead code (undefined Z, no
    # return); this checks our resurrected version against what that
    # body computes with the Z->X fix applied
    strel = np.ones((5, 5))
    ours = np.asarray(sf.std2(terrain, strel))
    M = ndi.convolve(terrain, strel / strel.sum(), mode="nearest")
    exp = ndi.convolve((M - terrain) ** 2, strel / strel.sum(),
                       mode="nearest") ** 0.5
    np.testing.assert_allclose(ours, exp, atol=1e-2)


def test_neilpy_dir_compat_global():
    import neilpy_tpu
    assert os.path.isdir(neilpy_tpu.neilpy_dir)
    assert os.path.isfile(os.path.join(neilpy_tpu.neilpy_dir,
                                       "__init__.py"))


def test_tpi(terrain):
    t = np.asarray(sf.topographic_position_index(terrain, radius=3,
                                                 standardize=False))
    from neilpy_tpu.core.codes import disk
    strel = disk(3).astype(float)
    strel[3, 3] = 0
    strel /= strel.sum()
    ref = terrain - ndi.convolve(terrain, strel, mode="nearest")
    np.testing.assert_allclose(t, ref, atol=1e-3)


def test_reduce_peaks_smooths(terrain):
    out = np.asarray(sf.reduce_peaks(terrain, radius=4))
    assert out.shape == terrain.shape
    assert np.isfinite(out).all()


def test_z_factor():
    z = np.asarray(sf.z_factor(np.array([0.0, 45.0])))
    # ~1/111320 m per degree at the equator
    assert np.isclose(z[0], 1 / 111319.49, rtol=1e-3)
