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


# full-pipeline integration tests: excluded from the default <5-min
# dev loop (pytest.ini), still in -m "not slow" and certification runs
pytestmark = pytest.mark.heavy

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


class TestShardedSmrf:
    """Multi-chip SMRF raster phase == single-device (SURVEY.md §2.5:
    the tiled==untiled property, now for the flagship pipeline)."""

    def test_springs_fill(self, mesh):
        from neilpy_tpu.dist.smrf import sharded_springs_fill
        from neilpy_tpu.ops.inpaint import inpaint_nans_by_springs
        rng = np.random.default_rng(3)
        A = rng.normal(size=(70, 90)).astype(np.float32).cumsum(axis=0)
        A[10:20, 30:50] = np.nan
        A[40:42, 5:80] = np.nan
        single = np.asarray(inpaint_nans_by_springs(A))
        sharded = np.asarray(sharded_springs_fill(A, mesh))
        np.testing.assert_allclose(sharded, single, atol=1e-4)

    def test_springs_fill_sharded_mg_levels(self, mesh):
        """Force the multigrid hierarchy to keep several SHARDED levels
        (mg_min_block small, mesh-divisible power-of-two extents) so
        the halo-exchanged coarse applies and the handoff gather are
        exercised, not just the replicated path."""
        from neilpy_tpu.dist.smrf import sharded_springs_fill
        from neilpy_tpu.ops.inpaint import inpaint_nans_by_springs
        rng = np.random.default_rng(9)
        A = rng.normal(size=(128, 128)).astype(np.float32).cumsum(axis=0)
        A[20:90, 35:100] = np.nan  # one large contiguous hole
        A[5, 5] = np.nan
        single = np.asarray(inpaint_nans_by_springs(A))
        sharded = np.asarray(sharded_springs_fill(A, mesh,
                                                  mg_min_block=8))
        np.testing.assert_allclose(sharded, single, atol=1e-4)

    def test_progressive_filter(self, mesh):
        from neilpy_tpu.dist.smrf import sharded_progressive_filter
        from neilpy_tpu.pipelines.smrf import progressive_filter
        rng = np.random.default_rng(4)
        Z = rng.normal(size=(96, 112)).astype(np.float32).cumsum(axis=1)
        w = np.arange(1, 8)
        single = np.asarray(progressive_filter(Z, w, 1, .15))
        sharded = np.asarray(sharded_progressive_filter(Z, w, mesh, 1,
                                                        .15))
        assert (single == sharded).all()

    def test_full_smrf_samp11(self, mesh):
        import os
        import pandas as pd
        from neilpy_tpu.dist.smrf import sharded_smrf
        from neilpy_tpu.pipelines.smrf import smrf
        fn = "/root/reference/sample_data/samp11.txt"
        if not os.path.exists(fn):
            pytest.skip("ISPRS data not mounted")
        df = pd.read_csv(fn, header=None, names=["x", "y", "z", "g"],
                         delimiter="\t")
        # modest windows to keep the CPU-mesh test quick
        _, _, oc1, pts1 = smrf(df.x, df.y, df.z, 1, 6, .15, .5, 1.25)
        _, _, oc2, pts2 = sharded_smrf(df.x, df.y, df.z, 1, 6, .15, .5,
                                       1.25, mesh=mesh)
        assert (np.asarray(oc1) == np.asarray(oc2)).mean() > 0.999
        assert (np.asarray(pts1) == np.asarray(pts2)).mean() > 0.999


def test_halo_wider_than_block(mesh):
    """lookup larger than the per-device block dimension runs the
    multi-hop exchange and still matches single-device exactly."""
    Z = np.random.default_rng(0).normal(size=(16, 32)).astype(
        np.float32).cumsum(axis=0)
    # block is 8x8 on the 2x4 mesh; lookup 12 > 8 -> 2 hops
    single = np.asarray(geomorphons(Z, lookup_pixels=12))
    tiled = np.asarray(sharded_geomorphons(Z, mesh, lookup_pixels=12))
    np.testing.assert_array_equal(tiled, single)
    # scan distance spanning the whole mesh (3+ hops)
    single = np.asarray(geomorphons(Z, lookup_pixels=30))
    tiled = np.asarray(sharded_geomorphons(Z, mesh, lookup_pixels=30))
    np.testing.assert_array_equal(tiled, single)
    # reflect-family modes cannot be reconstructed multi-hop
    from neilpy_tpu.dist.api import sharded_apply
    from neilpy_tpu.ops.surface import curvature
    with pytest.raises(Exception, match="multi-hop|fewer shards"):
        np.asarray(sharded_apply(lambda b: curvature(b), Z, mesh,
                                 radius=12, mode="symmetric"))


def test_sharded_geomorphons_pallas_engine(mesh, big_terrain):
    """The per-shard Pallas kernel (interpret mode on CPU) matches the
    single-device classifier through the halo-exchange path."""
    Z = big_terrain
    single = np.asarray(geomorphons(Z, cellsize=2, lookup_pixels=4,
                                    threshold_angle=1))
    tiled = np.asarray(sharded_geomorphons(Z, mesh, cellsize=2,
                                           lookup_pixels=4,
                                           engine="pallas"))
    np.testing.assert_array_equal(tiled, single)


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_sharded_geomorphons_fast_ladder(mesh, big_terrain, engine):
    """'fast' progressive ladder through the sharded path (both
    engines) == the single-device fast classifier."""
    Z = big_terrain
    single = np.asarray(geomorphons(Z, cellsize=2, lookup_pixels=9,
                                    threshold_angle=1, fast=True,
                                    engine="xla"))
    tiled = np.asarray(sharded_geomorphons(Z, mesh, cellsize=2,
                                           lookup_pixels=9, fast=True,
                                           engine=engine))
    np.testing.assert_array_equal(tiled, single)


def test_sharded_geomorphons_pallas_non_divisible(mesh):
    rng = np.random.default_rng(7)
    Z = rng.normal(size=(45, 53)).cumsum(axis=0).astype(np.float32)
    single = np.asarray(geomorphons(Z, lookup_pixels=3))
    tiled = np.asarray(sharded_geomorphons(Z, mesh, lookup_pixels=3,
                                           engine="pallas"))
    np.testing.assert_array_equal(tiled, single)


@pytest.mark.parametrize("shape", [(1, 8), (8, 1), (4, 2)])
def test_mesh_shapes_geomorphons(shape):
    """Asymmetric meshes (pure row / pure column sharding) preserve
    the sharded == single-device property."""
    from neilpy_tpu.dist.api import make_mesh
    rng = np.random.default_rng(11)
    Z = rng.normal(size=(64, 96)).cumsum(axis=0).astype(np.float32)
    m = make_mesh(shape=shape)
    single = np.asarray(geomorphons(Z, cellsize=2, lookup_pixels=3))
    tiled = np.asarray(sharded_geomorphons(Z, m, cellsize=2,
                                           lookup_pixels=3))
    np.testing.assert_array_equal(tiled, single)


def test_halo_multihop_pallas_engine(mesh):
    Z = np.random.default_rng(0).normal(size=(16, 32)).astype(
        np.float32).cumsum(axis=0)
    single = np.asarray(geomorphons(Z, lookup_pixels=12))
    tiled = np.asarray(sharded_geomorphons(Z, mesh, lookup_pixels=12,
                                           engine="pallas"))
    np.testing.assert_array_equal(tiled, single)


def test_multihop_one_shard_axis():
    """1xN mesh where the halo exceeds both the unsharded axis extent
    (zero-pad, not a block slice) and the sharded block extent."""
    from neilpy_tpu.dist.api import make_mesh
    Z = np.random.default_rng(0).normal(size=(16, 64)).astype(
        np.float32).cumsum(axis=0)
    m = make_mesh(shape=(1, 8))
    single = np.asarray(geomorphons(Z, lookup_pixels=20))
    tiled = np.asarray(sharded_geomorphons(Z, m, lookup_pixels=20))
    np.testing.assert_array_equal(tiled, single)


def test_sharded_skyview_matches_single(mesh):
    """Sharded SVF == single-device skyview_factor, including a
    non-divisible shape (NaN mesh padding) and a lookup spanning
    shards."""
    from neilpy_tpu.dist.api import sharded_skyview
    from neilpy_tpu.ops.visibility import skyview_factor
    rng = np.random.default_rng(11)
    Z = rng.normal(size=(45, 67)).cumsum(axis=0).astype(np.float32)
    for R in (3, 14):
        single = np.asarray(skyview_factor(Z, cellsize=2.0,
                                           lookup_pixels=R, engine="xla"))
        tiled = np.asarray(sharded_skyview(Z, mesh, cellsize=2.0,
                                           lookup_pixels=R))
        np.testing.assert_allclose(tiled, single, atol=1e-6)


def test_sharded_rastergi_matches_single(mesh):
    """Sharded Gi/Gi* == single-device rasterGi: psum'd global
    moments, halo-exchanged footprint sums, NaN cells, non-divisible
    shape, star and non-star, with and without the ArcGIS
    correction."""
    from neilpy_tpu.dist.api import sharded_rastergi
    from neilpy_tpu.ops.stats import rasterGi
    rng = np.random.default_rng(4)
    Z = rng.normal(size=(45, 67)).cumsum(axis=1).astype(np.float32)
    Z[10:13, 20:25] = np.nan
    for star in (False, True):
        for corr in (False, True):
            zs, ps, ss = rasterGi(Z, footprint=3, star=star,
                                  apply_correction=corr)
            zd, pd, sd = sharded_rastergi(Z, footprint=3, mesh=mesh,
                                          star=star,
                                          apply_correction=corr)
            np.testing.assert_allclose(np.asarray(zd), np.asarray(zs),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(pd), np.asarray(ps),
                                       atol=2e-4)
            eq = np.asarray(sd) == np.asarray(ss)
            both_nan = np.isnan(np.asarray(sd)) & np.isnan(np.asarray(ss))
            assert np.mean(eq | both_nan) > 0.999
    # explicit footprint ARRAY: mask semantics, star overridden by the
    # centre bit (here: on -> Gi*)
    fp = np.ones((5, 5))
    zs, _, _ = rasterGi(Z, footprint=fp)
    zd, _, _ = sharded_rastergi(Z, footprint=fp, mesh=mesh)
    np.testing.assert_allclose(np.asarray(zd), np.asarray(zs),
                               rtol=2e-4, atol=2e-4)


def test_sharded_global_morans_matches_single(mesh):
    """Replicated (I, E_I, z) triple == single-device morans_i,
    including NaN cells and a non-divisible shape."""
    from neilpy_tpu.dist.api import sharded_morans_i
    from neilpy_tpu.ops.stats import morans_i
    rng = np.random.default_rng(6)
    Z = rng.normal(size=(45, 67)).cumsum(axis=1).astype(np.float32)
    Z[12:15, 30:36] = np.nan
    single = [float(v) for v in morans_i(Z, footprint=2)]
    tiled = [float(v) for v in sharded_morans_i(Z, footprint=2,
                                                mesh=mesh)]
    np.testing.assert_allclose(tiled, single, rtol=5e-4, atol=1e-6)


def test_sharded_local_morans_matches_single(mesh):
    from neilpy_tpu.dist.api import sharded_local_morans_i
    from neilpy_tpu.ops.stats import local_morans_i
    rng = np.random.default_rng(5)
    Z = rng.normal(size=(45, 67)).cumsum(axis=0).astype(np.float32)
    Z[5:8, 5:9] = np.nan
    single = np.asarray(local_morans_i(Z, footprint=2))
    tiled = np.asarray(sharded_local_morans_i(Z, footprint=2,
                                              mesh=mesh))
    mask = np.isfinite(single)
    assert (np.isfinite(tiled) == mask).all()
    np.testing.assert_allclose(tiled[mask], single[mask], rtol=2e-4,
                               atol=2e-4)
