"""Property-based fuzzing of the owned I/O codecs (hypothesis).

The reference delegates raster/point I/O to rasterio/laspy C code;
this framework owns those codecs, so they get adversarial inputs:
random shapes/dtypes/compressions through the GeoTIFF writer/reader,
random windows through the lazy source, random clouds through the LAS
writer/reader, and raw byte blobs through the LZW/PackBits kernels.
"""

import numpy as np
import pytest

try:
    from hypothesis import given, settings, HealthCheck, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

_SETTINGS = dict(max_examples=25, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture,
                                        HealthCheck.too_slow])

_DTYPES = [np.uint8, np.uint16, np.uint32, np.int16, np.int32,
           np.float32, np.float64]


def _array(draw, h, w, bands, dtype):
    rng = np.random.default_rng(draw(st.integers(0, 2 ** 31)))
    shape = (h, w) if bands == 1 else (h, w, bands)
    if np.issubdtype(dtype, np.floating):
        a = rng.normal(size=shape).astype(dtype)
        # include non-finite values: codecs must pass them through
        a.ravel()[:: max(1, a.size // 7)] = np.nan
        if a.size > 3:
            a.ravel()[1] = np.inf
    else:
        info = np.iinfo(dtype)
        a = rng.integers(info.min, info.max, size=shape,
                         endpoint=True).astype(dtype)
    return a


class TestGeoTiffFuzz:
    @settings(**_SETTINGS)
    @given(st.data())
    def test_roundtrip_any_shape_dtype_compression(self, tmp_path, data):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        from neilpy_tpu.io.tiff_codec import zstd_available
        h = data.draw(st.integers(1, 65), label="h")
        w = data.draw(st.integers(1, 65), label="w")
        bands = data.draw(st.sampled_from([1, 3]), label="bands")
        dtype = np.dtype(data.draw(st.sampled_from(_DTYPES),
                                   label="dtype"))
        comps = ["none", "lzw", "deflate"]
        if zstd_available():
            comps.append("zstd")
        comp = data.draw(st.sampled_from(comps), label="compress")
        tiled = data.draw(st.booleans(), label="tiled")
        ovs = data.draw(st.sampled_from([(), (2,), (2, 4)]),
                        label="overviews")
        a = _array(data.draw, h, w, bands, dtype)
        fn = str(tmp_path / f"f_{h}_{w}_{bands}_{dtype.name}_{comp}.tif")
        write_geotiff(fn, a, compress=comp, tiled=tiled, tile_size=16,
                      overviews=ovs)
        back, meta = read_geotiff(fn)
        np.testing.assert_array_equal(back, a)
        assert back.dtype == a.dtype
        for li, k in enumerate(ovs, start=1):
            o, _ = read_geotiff(fn, level=li)
            assert o.shape[:2] == (-(-h // k), -(-w // k))

    @settings(**_SETTINGS)
    @given(st.data())
    def test_window_equals_slice(self, tmp_path, data):
        from neilpy_tpu.io.geotiff import write_geotiff, GeoTiffSource
        h = data.draw(st.integers(2, 200), label="h")
        w = data.draw(st.integers(2, 80), label="w")
        a = _array(data.draw, h, w, 1, np.float32)
        fn = str(tmp_path / f"w_{h}_{w}.tif")
        write_geotiff(fn, a, compress=data.draw(
            st.sampled_from(["none", "deflate"]), label="compress"))
        src = GeoTiffSource(fn, cache_bytes=data.draw(
            st.sampled_from([1, 1 << 20]), label="cache"))
        r0 = data.draw(st.integers(0, h - 1), label="r0")
        r1 = data.draw(st.integers(r0, h), label="r1")
        c0 = data.draw(st.integers(0, w - 1), label="c0")
        c1 = data.draw(st.integers(c0, w), label="c1")
        got = src.read(window=((r0, r1), (c0, c1)),
                       return_metadata=False)
        np.testing.assert_array_equal(got, a[r0:r1, c0:c1])


class TestLasFuzz:
    @settings(**_SETTINGS)
    @given(st.data())
    def test_roundtrip_any_pdrf(self, tmp_path, data):
        from neilpy_tpu.io.las import write_las, read_las
        n = data.draw(st.integers(1, 400), label="n")
        pdrf = data.draw(st.sampled_from([0, 1, 2, 3, 6, 7, 8]),
                         label="pdrf")
        rng = np.random.default_rng(data.draw(st.integers(0, 2 ** 31)))
        # coordinates snapped to the 1 mm scale grid -> exact roundtrip
        x = np.round(rng.uniform(-1e4, 1e4, n), 3)
        y = np.round(rng.uniform(-1e4, 1e4, n), 3)
        z = np.round(rng.uniform(-500, 9000, n), 3)
        kw = {}
        if data.draw(st.booleans(), label="intensity"):
            kw["intensity"] = rng.integers(0, 2 ** 16, n).astype(np.uint16)
        if data.draw(st.booleans(), label="classification"):
            kw["classification"] = rng.integers(0, 32, n).astype(np.uint8)
        if pdrf in (1, 3, 6, 7, 8):
            kw["gpstime"] = np.sort(rng.random(n) * 1e6)
        if pdrf in (2, 3, 7, 8):
            kw["rgb"] = tuple(rng.integers(0, 2 ** 16, n).astype(np.uint16)
                              for _ in range(3))
        fn = str(tmp_path / f"l_{n}_{pdrf}.las")
        write_las(fn, x, y, z, pdrf=pdrf, **kw)
        hdr, df = read_las(fn)
        assert len(df) == n
        np.testing.assert_allclose(df.x, x, atol=5e-4)
        np.testing.assert_allclose(df.y, y, atol=5e-4)
        np.testing.assert_allclose(df.z, z, atol=5e-4)
        if "intensity" in kw:
            np.testing.assert_array_equal(df.intensity, kw["intensity"])
        if "classification" in kw:
            np.testing.assert_array_equal(df["class"],
                                          kw["classification"])
        if "gpstime" in kw:
            np.testing.assert_allclose(df.gpstime, kw["gpstime"],
                                       rtol=0, atol=0)
        if "rgb" in kw:
            np.testing.assert_array_equal(df.red, kw["rgb"][0])
            np.testing.assert_array_equal(df.blue, kw["rgb"][2])


class TestCodecFuzz:
    @settings(**_SETTINGS)
    @given(st.binary(min_size=0, max_size=4096))
    def test_lzw_roundtrip(self, payload):
        from neilpy_tpu.io.tiff_codec import lzw_encode, lzw_decode
        assert lzw_decode(lzw_encode(payload), len(payload)) == payload

    @settings(**_SETTINGS)
    @given(st.data())
    @pytest.mark.heavy
    def test_lzw_repetitive_and_rollover(self, data):
        """Highly repetitive streams exercise table growth; long ones
        the 12-bit rollover/Clear handling."""
        from neilpy_tpu.io.tiff_codec import lzw_encode, lzw_decode
        rng = np.random.default_rng(data.draw(st.integers(0, 2 ** 31)))
        n = data.draw(st.integers(1, 200_000), label="n")
        alphabet = data.draw(st.integers(1, 8), label="alphabet")
        payload = rng.integers(0, alphabet, n).astype(np.uint8).tobytes()
        assert lzw_decode(lzw_encode(payload), n) == payload

    @settings(**_SETTINGS)
    @given(st.binary(min_size=0, max_size=2048))
    def test_lzw_python_and_native_agree(self, payload):
        from neilpy_tpu.io.tiff_codec import (lzw_encode, _lzw_decode_py,
                                              codec_native_available,
                                              lzw_decode)
        enc = lzw_encode(payload)
        assert _lzw_decode_py(enc, len(payload)) == payload
        if codec_native_available():
            assert lzw_decode(enc, len(payload)) == payload

    @settings(**_SETTINGS)
    @given(st.data())
    def test_packbits_matches_pil_encoder(self, data):
        """Decode PIL's own PackBits encoding of random rows."""
        from io import BytesIO
        from PIL import Image
        from neilpy_tpu.io.tiff_codec import packbits_decode
        rng = np.random.default_rng(data.draw(st.integers(0, 2 ** 31)))
        h = data.draw(st.integers(1, 16), label="h")
        w = data.draw(st.integers(1, 64), label="w")
        # runs + noise: PackBits' two regimes
        a = np.where(rng.random((h, w)) < .5,
                     rng.integers(0, 255, (h, w)),
                     7).astype(np.uint8)
        buf = BytesIO()
        Image.fromarray(a).save(buf, format="TIFF", compression="packbits")
        buf.seek(0)
        im = Image.open(buf)
        def _tup(v):
            return v if isinstance(v, (tuple, list)) else (v,)
        strips = _tup(im.tag_v2[273])
        counts = _tup(im.tag_v2[279])
        raw = buf.getvalue()
        rows_per_strip = _tup(im.tag_v2[278])[0]
        got = b""
        row = 0
        for off, cnt in zip(strips, counts):
            nrows = min(rows_per_strip, h - row)
            got += packbits_decode(raw[off:off + cnt], nrows * w)
            row += nrows
        assert got == a.tobytes()
