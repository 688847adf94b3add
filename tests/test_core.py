import numpy as np
import pytest

from neilpy_tpu.core.affine import Affine, from_origin
from neilpy_tpu.core.shift import ashift, gradient2d
from neilpy_tpu.core.grid import cutter, normalize, unique_rows, edges_from_IT
from neilpy_tpu.core.codes import (int2base, get_lowest_equivalent,
                                   lowest_equivalent_table, disk,
                                   disk_run_halfwidths, progressive_window,
                                   terrain_code_to_geomorphon)
from .reference_impls import np_ashift


class TestAffine:
    def test_from_origin_roundtrip(self):
        t = from_origin(500000.0, 4.2e6, 2.5, 2.5)
        x, y = t * (10, 20)
        assert x == 500000.0 + 25.0 and y == 4.2e6 - 50.0
        c, r = (~t) * (x, y)
        assert np.isclose(c, 10) and np.isclose(r, 20)

    def test_vectorized(self):
        t = from_origin(100.0, 200.0, 1.0, 1.0)
        xs = np.array([100.2, 105.7])
        ys = np.array([199.5, 190.1])
        c, r = t.world_to_pixel(xs, ys)
        assert c.tolist() == [0, 5]
        assert r.tolist() == [0, 9]

    def test_indexing_matches_rasterio_order(self):
        t = from_origin(7.0, 11.0, 2.0, 3.0)
        assert list(t) == [2.0, 0.0, 7.0, 0.0, -3.0, 11.0]


class TestAshift:
    @pytest.mark.parametrize("direction", range(8))
    @pytest.mark.parametrize("n", [1, 2, 5])
    def test_matches_reference_semantics(self, direction, n, terrain):
        Z = terrain.astype(np.float32)  # jnp default precision
        got = np.asarray(ashift(Z, direction, n))
        exp = np_ashift(Z, direction, n)
        np.testing.assert_array_equal(got, exp)

    def test_notebook_oracle(self):
        x = np.arange(25).reshape(5, 5)
        exp = np.array([[0, 1, 2, 3, 4], [5, 0, 1, 2, 3], [10, 5, 6, 7, 8],
                        [15, 10, 11, 12, 13], [20, 15, 16, 17, 18]])
        assert (np.asarray(ashift(x, 0, 1)) == exp).all()

    def test_invalid_direction_passthrough(self, terrain):
        # wilson_gallant relies on directions 8/9 returning a copy
        Z = terrain.astype(np.float32)
        assert (np.asarray(ashift(Z, 8)) == Z).all()
        assert (np.asarray(ashift(Z, 9)) == Z).all()


def test_gradient2d_matches_numpy(terrain):
    gy, gx = gradient2d(terrain, 2.5)
    ngy, ngx = np.gradient(terrain, 2.5)
    np.testing.assert_allclose(np.asarray(gy), ngy, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), ngx, atol=1e-4)


class TestCodes:
    def test_int2base(self):
        assert int2base(5, 2) == "00000101"
        assert int2base(2240, 3) == "10001222"

    def test_lowest_equivalent_oracle(self):
        # notebook cell 18: code 2240 -> 160
        assert get_lowest_equivalent(2240) == 160
        # docstring example in reference: 241 -> 161
        assert get_lowest_equivalent(241) == 161

    def test_lowest_equivalent_idempotent(self):
        lut = lowest_equivalent_table()
        assert (lut[lut] == lut).all()

    def test_terrain_code_classes(self):
        tc = np.array([3280, 0, 82, 121, 26, 160, 242, 3293, 4346, 6560])
        got = terrain_code_to_geomorphon(tc, method="strict")
        assert got.tolist() == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
        # loose table maps the canonical slope code to slope as well
        assert terrain_code_to_geomorphon(np.array([160]))[0] == 6

    def test_disk_row_decomposition(self):
        for r in (1, 2, 5, 11, 18):
            d = disk(r)
            dys, kxs = disk_run_halfwidths(r)
            rebuilt = np.zeros_like(d)
            for dy, kx in zip(dys, kxs):
                rebuilt[dy + r, r - kx:r + kx + 1] = 1
            assert (rebuilt == d).all()

    def test_progressive_window(self):
        w = progressive_window(1, 50, 20)
        assert w[0] == 1 and w[-1] <= 50
        assert (np.diff(w) > 0).all()


def test_cutter_and_normalize(terrain):
    tiles = cutter(terrain, 4, 7)
    assert len(tiles) == 4 and len(tiles[0]) == 7
    assert tiles[0][0].shape == (terrain.shape[0] // 4, terrain.shape[1] // 7)
    n = np.asarray(normalize(terrain))
    assert np.isclose(n.min(), 0, atol=1e-6) and np.isclose(n.max(), 1, atol=1e-6)


def test_unique_rows():
    a = np.array([[1, 2], [3, 4], [1, 2]])
    assert unique_rows(a).shape == (2, 2)


def test_edges_from_it():
    t = from_origin(10.0, 20.0, 1.0, 1.0)
    img = np.zeros((4, 6))
    xe, ye = edges_from_IT(img, t)
    assert xe[0] == 10.0 and xe[-1] == 16.0
    assert ye[0] == 20.0 and ye[-1] == 16.0


@pytest.mark.heavy
def test_remaining_public_exports_smoke(tmp_path):
    """Every public export exercised at least once: the aliases,
    convenience wrappers, and submodule utilities not covered by the
    focused suites."""
    import pandas as pd
    from scipy import ndimage as ndi
    import neilpy_tpu as nt

    rng = np.random.default_rng(0)
    Z = rng.normal(size=(32, 40)).cumsum(axis=0).astype(np.float32)

    # Raster pytree carries data + static georeferencing through jit
    import jax
    R = nt.Raster(Z, transform=nt.from_origin(0, 32, 1, 1), crs=32617)
    R2 = jax.jit(lambda r: r)(R)
    np.testing.assert_array_equal(np.asarray(R2.data), Z)
    assert R2.crs == 32617

    # morphology aliases == scipy grey ops
    fp = np.ones((3, 3), dtype=bool)
    np.testing.assert_allclose(np.asarray(nt.erosion(Z, fp)),
                               ndi.grey_erosion(Z, footprint=fp))
    np.testing.assert_allclose(np.asarray(nt.dilation(Z, fp)),
                               ndi.grey_dilation(Z, footprint=fp))

    # geomorphon aliases used by the reference notebooks
    assert nt.get_geomorphons is nt.geomorphons
    assert nt.get_geomorphon_from_openness is nt.geomorphons

    # keep_xyz bbox filter
    df = pd.DataFrame({"x": [0, 5, 9.0], "y": [0, 5, 9.0],
                       "z": [1, 2, 3.0]})
    assert list(nt.keep_xyz(df, x=(1, 8)).x) == [5]

    # read_xyz generic loader
    fn = str(tmp_path / "p.xyz")
    open(fn, "w").write("1 2 3\n4 5 6\n")
    d = nt.read_xyz(fn)
    assert list(d.columns) == ["x", "y", "z"] and len(d) == 2

    # lut_shade: 256x256x3 LUT gather
    lut = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
    rgb = np.asarray(nt.lut_shade(Z, lut, cellsize=2))
    assert rgb.shape == (32, 40, 3) and rgb.dtype == np.uint8

    # utm forward/inverse roundtrip (geo submodule surface)
    from neilpy_tpu.geo.proj import utm_forward, utm_inverse
    x, y = utm_forward(-71.3, 44.27, 19)
    lon, lat = utm_inverse(x, y, 19)
    assert abs(lon - -71.3) < 1e-9 and abs(lat - 44.27) < 1e-9

    # trace context manager produces a trace directory
    from neilpy_tpu.profiling import trace
    tdir = str(tmp_path / "tr")
    with trace(tdir):
        np.asarray(nt.hillshade(Z, cellsize=2))
    import os
    assert os.path.isdir(tdir) and os.listdir(tdir)


def test_api_docs_current():
    """docs/API.md must match what tools/gen_api_docs.py generates —
    regenerate after changing any public name or docstring."""
    import importlib.util
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", root / "tools" / "gen_api_docs.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    committed = (root / "docs" / "API.md").read_text()
    assert committed == mod.generate(), (
        "docs/API.md is stale: run `python tools/gen_api_docs.py`")
