"""Sharded == single-device equivalence on a virtual 8-device CPU mesh
— the property the reference trusted apply_parallel to preserve
(SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from neilpy_tpu.dist.api import (make_mesh, sharded_geomorphons,
                                 sharded_openness, sharded_hillshade,
                                 sharded_apply, pad_to_mesh)
from neilpy_tpu.ops.visibility import geomorphons, openness
from neilpy_tpu.ops.surface import hillshade, curvature


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    return make_mesh()  # 2 x 4


@pytest.fixture(scope="module")
def big_terrain():
    rng = np.random.default_rng(3)
    return rng.normal(size=(96, 128)).cumsum(axis=0).cumsum(axis=1).astype(
        np.float32)


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (2, 4)


class TestShardedEqualsSingle:
    @pytest.mark.parametrize("lookup", [1, 5, 11])
    def test_geomorphons(self, mesh, big_terrain, lookup):
        single = np.asarray(geomorphons(big_terrain, cellsize=2,
                                        lookup_pixels=lookup))
        tiled = np.asarray(sharded_geomorphons(big_terrain, mesh,
                                               cellsize=2,
                                               lookup_pixels=lookup))
        assert tiled.shape == single.shape
        mismatch = (tiled != single).mean()
        assert mismatch == 0.0, f"lookup={lookup}: {mismatch:.4%} differ"

    def test_openness(self, mesh, big_terrain):
        single = np.asarray(openness(big_terrain, cellsize=1.5,
                                     lookup_pixels=7))
        tiled = np.asarray(sharded_openness(big_terrain, mesh,
                                            cellsize=1.5,
                                            lookup_pixels=7))
        np.testing.assert_allclose(tiled, single, atol=1e-4)

    def test_hillshade(self, mesh, big_terrain):
        single = np.asarray(hillshade(big_terrain, cellsize=2))
        tiled = np.asarray(sharded_hillshade(big_terrain, mesh,
                                             cellsize=2))
        # uint8 rounding: allow off-by-one on a tiny fraction of pixels
        assert (np.abs(tiled.astype(int) - single.astype(int)) <= 1).all()
        assert (tiled != single).mean() < 0.001

    def test_curvature_via_sharded_apply(self, mesh, big_terrain):
        single = np.asarray(curvature(big_terrain, cellsize=2))
        tiled = np.asarray(sharded_apply(
            lambda b: curvature(b, cellsize=2), big_terrain, mesh,
            radius=1, mode="symmetric"))
        np.testing.assert_allclose(tiled, single, atol=1e-3)

    def test_nan_terrain_geomorphons(self, mesh, big_terrain):
        Z = big_terrain.copy()
        Z[40:50, 60:80] = np.nan
        single = np.asarray(geomorphons(Z, lookup_pixels=4))
        tiled = np.asarray(sharded_geomorphons(Z, mesh, lookup_pixels=4))
        assert (tiled == single).all()


def test_pad_to_mesh(mesh):
    Z = np.zeros((50, 70), dtype=np.float32)
    Zp, orig = pad_to_mesh(Z, mesh)
    assert orig == (50, 70)
    assert Zp.shape[0] % 2 == 0 and Zp.shape[1] % 4 == 0


def test_non_divisible_shape(mesh):
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(45, 53)).cumsum(axis=0).astype(np.float32)
    single = np.asarray(geomorphons(Z, lookup_pixels=3))
    tiled = np.asarray(sharded_geomorphons(Z, mesh, lookup_pixels=3))
    assert tiled.shape == single.shape
    # padding is NaN -> only cells near the padded seam may feel it;
    # interior must match exactly
    assert (tiled == single).all()


def test_halo_wider_than_block(mesh):
    """lookup larger than the per-device block dimension is rejected
    cleanly (halo cannot exceed block size in one exchange hop)."""
    Z = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
    # block is 8x8 on the 2x4 mesh; lookup 12 > 8
    with pytest.raises(Exception):
        np.asarray(sharded_geomorphons(Z, mesh, lookup_pixels=12))
