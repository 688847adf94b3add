import os
import struct

import numpy as np
import pytest

from neilpy_tpu.io.geotiff import imread, imwrite, read_geotiff, write_geotiff
from neilpy_tpu.io.las import read_las, las_point_dtype
from neilpy_tpu.io.worldfile import write_worldfile
from neilpy_tpu.io.png import write_paletted_png
from neilpy_tpu.io.text import read_isprs
from neilpy_tpu.core.affine import from_origin

GOLDEN_GEOMORPHONS = "/root/reference/sample_data/sample_dem_geomorphons.tif"
GOLDEN_DK22 = "/root/reference/examples/dk22_smrfed.tif"


class TestGeoTIFF:
    @pytest.mark.skipif(not os.path.exists(GOLDEN_GEOMORPHONS),
                        reason="golden raster not mounted")
    def test_read_golden_geomorphons(self):
        X, meta = imread(GOLDEN_GEOMORPHONS)
        assert X.shape == (847, 1540)
        assert X.dtype == np.uint8
        # exact histogram (verified byte-identical with PIL's reader;
        # the .aux.xml histogram is GDAL-approximate). 255 = nodata rim.
        counts = np.bincount(X.ravel(), minlength=256)
        assert counts[6] == 629371
        assert counts[1] == 13464
        assert counts[10] == 4863
        assert counts[255] == 4770

    @pytest.mark.skipif(not os.path.exists(GOLDEN_DK22),
                        reason="golden raster not mounted")
    def test_read_golden_dk22(self):
        X, meta = imread(GOLDEN_DK22)
        assert X.shape == (497, 716)
        assert X.dtype == np.float32
        assert np.isfinite(X).all()

    def test_roundtrip_float32(self, tmp_path, rng):
        Z = rng.normal(size=(37, 53)).astype(np.float32)
        t = from_origin(5.0e5, 4.3e6, 2.0, 2.0)
        fn = str(tmp_path / "z.tif")
        write_geotiff(fn, Z, transform=t, crs=32617, nodata=-9999.0)
        X, meta = read_geotiff(fn)
        np.testing.assert_array_equal(X, Z)
        assert list(meta["transform"]) == list(t)
        assert meta["crs"] == 32617
        assert meta["nodata"] == -9999.0
        assert meta["cellsize"] == 2.0

    def test_roundtrip_uint8_palette(self, tmp_path):
        classes = np.arange(100, dtype=np.uint8).reshape(10, 10) % 10 + 1
        fn = str(tmp_path / "c.tif")
        from neilpy_tpu.core.codes import geomorphon_cmap
        write_geotiff(fn, classes, colormap=geomorphon_cmap())
        X, meta = read_geotiff(fn)
        np.testing.assert_array_equal(X, classes)

    def test_roundtrip_multiband(self, tmp_path, rng):
        rgb = (rng.uniform(0, 255, (20, 30, 3))).astype(np.uint8)
        fn = str(tmp_path / "rgb.tif")
        write_geotiff(fn, rgb)
        X, meta = read_geotiff(fn)
        np.testing.assert_array_equal(X, rgb)
        assert meta["count"] == 3

    def test_roundtrip_large_multistrip(self, tmp_path, rng):
        Z = rng.normal(size=(600, 700)).astype(np.float64)
        fn = str(tmp_path / "big.tif")
        write_geotiff(fn, Z)
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, Z)

    def test_imread_fix_nodata(self, tmp_path):
        Z = np.array([[1.0, -9999.0], [3.0, 4.0]], dtype=np.float32)
        fn = str(tmp_path / "nd.tif")
        write_geotiff(fn, Z, nodata=-9999.0)
        X, meta = imread(fn, fix_nodata=True)
        assert np.isnan(X[0, 1])
        assert X[0, 0] == 1.0

    def test_imwrite_metadata_path(self, tmp_path, rng):
        Z = rng.normal(size=(10, 12)).astype(np.float32)
        meta = {"transform": from_origin(0, 10, 1, 1), "crs": 4326,
                "nodata": None}
        fn = str(tmp_path / "m.tif")
        imwrite(fn, Z, metadata=meta)
        X, m2 = imread(fn)
        np.testing.assert_array_equal(X, Z)
        assert m2["crs"] == 4326

    def test_imwrite_non_tiff_fallback(self, tmp_path):
        """Non-TIFF extensions take the reference's plain-image path
        (neilpy.py:188-190): image written, georeferencing dropped
        with a warning."""
        import warnings
        from PIL import Image
        from neilpy_tpu.core.codes import geomorphon_cmap
        G = ((np.arange(120, dtype=np.uint8).reshape(10, 12) % 10) + 1)
        fn = str(tmp_path / "g.png")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            imwrite(fn, G, metadata={"transform": None},
                    colormap=geomorphon_cmap())
        assert any("metadata" in str(x.message) for x in w)
        im = Image.open(fn)
        assert im.mode == "P"
        np.testing.assert_array_equal(np.asarray(im), G)
        fn2 = str(tmp_path / "plain.png")
        imwrite(fn2, (G * 20).astype(np.uint8))
        np.testing.assert_array_equal(np.asarray(Image.open(fn2)), G * 20)


def _write_synthetic_las(fn, pdrf=3, n=100, seed=0):
    """Build a spec-conformant little LAS 1.2 file by hand."""
    rng = np.random.default_rng(seed)
    scale = (0.01, 0.01, 0.001)
    offset = (500000.0, 4200000.0, 100.0)
    dt = las_point_dtype(pdrf)
    pts = np.zeros(n, dtype=dt)
    xi = rng.integers(0, 10000, n)
    yi = rng.integers(0, 10000, n)
    zi = rng.integers(0, 50000, n)
    pts["x"], pts["y"], pts["z"] = xi, yi, zi
    pts["intensity"] = rng.integers(0, 65535, n)
    # return 2 of 3; legacy PDRFs also pack scan_direction into this byte
    if pdrf < 6:
        pts["return_byte"] = 2 | (3 << 3) | (1 << 6)
    else:
        pts["return_byte"] = 2 | (3 << 4)
    pts["class"] = rng.integers(0, 10, n)
    if "gpstime" in dt.names:
        pts["gpstime"] = rng.uniform(0, 1e6, n)
    if "red" in dt.names:
        pts["red"] = rng.integers(0, 65535, n)

    header = bytearray(227)
    header[0:4] = b"LASF"
    struct.pack_into("<B", header, 24, 1)   # version major
    struct.pack_into("<B", header, 25, 2)   # version minor
    struct.pack_into("<H", header, 94, 227)  # header size
    struct.pack_into("<L", header, 96, 227)  # point data offset
    struct.pack_into("<B", header, 104, pdrf)
    struct.pack_into("<H", header, 105, dt.itemsize)
    struct.pack_into("<L", header, 107, n)
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)
    with open(fn, "wb") as f:
        f.write(bytes(header) + pts.tobytes())
    return xi, yi, zi, scale, offset


class TestLAS:
    @pytest.mark.parametrize("pdrf", [0, 1, 2, 3, 6, 7, 8])
    def test_roundtrip_synthetic(self, tmp_path, pdrf):
        fn = str(tmp_path / f"t{pdrf}.las")
        xi, yi, zi, scale, offset = _write_synthetic_las(fn, pdrf=pdrf)
        header, df = read_las(fn)
        assert header["point_data_format_id"] == pdrf
        assert len(df) == 100
        np.testing.assert_allclose(df.x, xi * scale[0] + offset[0])
        np.testing.assert_allclose(df.z, zi * scale[2] + offset[2])
        assert (df.return_number == 2).all()
        assert (df.return_max == 3).all()
        if pdrf < 6:
            assert df.scan_direction.all()

    def test_laz_rejected(self, tmp_path):
        fn = str(tmp_path / "t.las")
        _write_synthetic_las(fn, pdrf=3)
        data = bytearray(open(fn, "rb").read())
        data[104] = 3 + 128  # LAZ marker
        open(fn, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="LAZ"):
            read_las(fn)

    def test_record_lengths_match_spec(self):
        # minimum PDRF sizes from the LAS 1.4 spec (reference key at
        # neilpy.py:925)
        expected = {0: 20, 1: 28, 2: 26, 3: 34, 4: 57, 5: 63, 6: 30,
                    7: 36, 8: 38, 9: 59, 10: 67}
        for pdrf, size in expected.items():
            assert las_point_dtype(pdrf).itemsize == size, pdrf


def test_worldfile(tmp_path):
    t = from_origin(100.0, 200.0, 2.0, 2.0)
    fn = str(tmp_path / "t.pgw")
    write_worldfile(t, fn)
    vals = [float(v) for v in open(fn).read().split()]
    assert vals == [2.0, 0.0, 0.0, -2.0, 101.0, 199.0]


def test_paletted_png(tmp_path):
    from neilpy_tpu.core.codes import geomorphon_cmap
    from PIL import Image
    classes = (np.arange(100).reshape(10, 10) % 10 + 1).astype(np.uint8)
    fn = str(tmp_path / "g.png")
    write_paletted_png(fn, classes, geomorphon_cmap())
    im = Image.open(fn)
    assert im.mode == "P"
    np.testing.assert_array_equal(np.asarray(im), classes)


def test_read_isprs():
    fn = "/root/reference/sample_data/samp11.txt"
    if not os.path.exists(fn):
        pytest.skip("not mounted")
    df = read_isprs(fn)
    assert list(df.columns) == ["x", "y", "z", "g"]
    assert len(df) == 38010
    assert set(df.g.unique()) <= {0, 1}


class TestWriteLas:
    @pytest.mark.parametrize("pdrf", [0, 1, 2, 3])
    def test_roundtrip(self, tmp_path, rng, pdrf):
        from neilpy_tpu.io.las import write_las, read_las
        n = 500
        x = rng.uniform(500000, 500100, n)
        y = rng.uniform(4200000, 4200100, n)
        z = rng.uniform(200, 300, n)
        cls = rng.integers(0, 10, n).astype(np.uint8)
        kw = {}
        if pdrf in (1, 3):
            kw["gpstime"] = rng.uniform(1e5, 2e5, n)
        if pdrf in (2, 3):
            kw["rgb"] = (rng.integers(0, 65535, n),
                         rng.integers(0, 65535, n),
                         rng.integers(0, 65535, n))
        fn = str(tmp_path / f"t{pdrf}.las")
        write_las(fn, x, y, z, classification=cls, pdrf=pdrf, **kw)
        hdr, df = read_las(fn)
        assert hdr["point_data_format_id"] == pdrf
        assert len(df) == n
        np.testing.assert_allclose(df.x, x, atol=5.1e-4)
        np.testing.assert_allclose(df.y, y, atol=5.1e-4)
        np.testing.assert_allclose(df.z, z, atol=5.1e-4)
        np.testing.assert_array_equal(df["class"], cls)
        if "gpstime" in kw:
            np.testing.assert_allclose(df.gpstime, kw["gpstime"])
        if "rgb" in kw:
            np.testing.assert_array_equal(df.red, kw["rgb"][0])

    def test_native_decoder_reads_written(self, tmp_path, rng):
        from neilpy_tpu.io.las import write_las
        from neilpy_tpu.io.las_native import (native_available,
                                              read_las_arrays)
        if not native_available():
            pytest.skip("native decoder not built")
        n = 1000
        x = rng.uniform(0, 100, n)
        y = rng.uniform(0, 100, n)
        z = rng.uniform(0, 50, n)
        fn = str(tmp_path / "nat.las")
        write_las(fn, x, y, z)
        out = read_las_arrays(fn)
        np.testing.assert_allclose(out["x"], x, atol=5.1e-4)
        np.testing.assert_allclose(out["z"], z, atol=5.1e-4)


class TestBigTiff:
    def test_roundtrip_forced_bigtiff(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        from neilpy_tpu.core.affine import Affine
        im = rng.normal(size=(60, 90)).astype(np.float32)
        t = Affine.from_origin(500000, 4200000, 2, 2)
        fn = str(tmp_path / "big.tif")
        write_geotiff(fn, im, transform=t, nodata=-9999.0, bigtiff=True)
        raw = open(fn, "rb").read()
        assert raw[:4] == b"II\x2b\x00"  # version 43
        X, meta = read_geotiff(fn)
        np.testing.assert_array_equal(X, im)
        assert abs(meta["transform"][0] - 2) < 1e-9
        assert meta["nodata"] == -9999.0

    def test_roundtrip_classic_unchanged(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        im = (rng.random((40, 50)) * 250).astype(np.uint8)
        fn = str(tmp_path / "classic.tif")
        write_geotiff(fn, im)
        assert open(fn, "rb").read(4) == b"II\x2a\x00"
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, im)

    def test_bigtiff_multiband_palette_paths(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        rgb = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
        fn = str(tmp_path / "rgb_big.tif")
        write_geotiff(fn, rgb, bigtiff=True)
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, rgb)


class TestCompressedTiff:
    @pytest.mark.parametrize("comp", ["tiff_adobe_deflate", "packbits",
                                      "tiff_lzw"])
    def test_read_pil_compressed(self, tmp_path, rng, comp):
        from PIL import Image
        from neilpy_tpu.io.geotiff import read_geotiff
        a = (rng.random((45, 62)) * 250).astype(np.uint8)
        fn = str(tmp_path / f"{comp}.tif")
        Image.fromarray(a).save(fn, compression=comp)
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)

    def test_read_deflate_float_predictor_none(self, tmp_path, rng):
        from PIL import Image
        from neilpy_tpu.io.geotiff import read_geotiff
        a = rng.normal(size=(30, 40)).astype(np.float32)
        fn = str(tmp_path / "f32.tif")
        Image.fromarray(a).save(fn, compression="tiff_adobe_deflate")
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)

    def test_read_pil_lzw_float_multistrip(self, tmp_path, rng):
        """PIL-written LZW float32 with several strips (LZW state must
        reset per strip)."""
        from PIL import Image, TiffImagePlugin
        from neilpy_tpu.io.geotiff import read_geotiff
        a = rng.normal(size=(200, 120)).astype(np.float32).cumsum(0)
        fn = str(tmp_path / "lzw_f32.tif")
        TiffImagePlugin.STRIP_SIZE = 8192  # force multiple strips
        try:
            Image.fromarray(a).save(fn, compression="tiff_lzw")
        finally:
            TiffImagePlugin.STRIP_SIZE = 65536
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)


class TestLZWCodec:
    """Both decoder backends (native C++ and the python fallback) vs
    the in-repo TIFF-flavour encoder, plus hand-built tile/predictor
    fixtures PIL cannot write."""

    @pytest.mark.parametrize("kind", ["random", "runs", "text"])
    def test_roundtrip_both_backends(self, rng, kind):
        from neilpy_tpu.io.tiff_codec import (
            lzw_encode, lzw_decode, _lzw_decode_py,
            codec_native_available)
        if kind == "random":
            # incompressible: ~1 table entry per emit -> crosses every
            # width bump AND the 12-bit Clear/reset path
            data = rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()
        elif kind == "runs":
            data = np.repeat(rng.integers(0, 256, 4000, dtype=np.uint8),
                             rng.integers(1, 30, 4000)).tobytes()
        else:
            data = b"to be or not to be, that is the question " * 500
        enc = lzw_encode(data)
        assert _lzw_decode_py(enc, len(data)) == data
        if codec_native_available():
            assert lzw_decode(enc, len(data)) == data

    def test_lzw_tiled_fixture(self, tmp_path, rng):
        """Hand-built tile-organised LZW TIFF (compression=5) — the
        layout GDAL most commonly emits for DEM mosaics."""
        import struct
        from neilpy_tpu.io.tiff_codec import lzw_encode
        from neilpy_tpu.io.geotiff import read_geotiff
        H, W, TS = 48, 48, 16
        a = (rng.random((H, W)) * 250).astype(np.uint8)
        tiles = [lzw_encode(a[ty*TS:(ty+1)*TS, tx*TS:(tx+1)*TS].tobytes())
                 for ty in range(H // TS) for tx in range(W // TS)]
        fn = str(tmp_path / "tiled_lzw.tif")
        open(fn, "wb").write(_build_tiled_tiff(a, tiles, TS, comp=5))
        from PIL import Image
        np.testing.assert_array_equal(np.asarray(Image.open(fn)), a)
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)

    def test_lzw_predictor2_strips(self, tmp_path, rng):
        """LZW + horizontal-differencing predictor (tag 317=2), the
        GDAL default for integer DEMs; uint8, multi-strip."""
        import struct
        from neilpy_tpu.io.tiff_codec import lzw_encode
        from neilpy_tpu.io.geotiff import read_geotiff
        H, W, RPS = 40, 56, 16
        a = (rng.random((H, W)) * 250).astype(np.uint8)
        strips = []
        for r0 in range(0, H, RPS):
            block = a[r0:r0 + RPS].astype(np.uint8)
            diff = block.copy()
            diff[:, 1:] = block[:, 1:] - block[:, :-1]  # wraps mod 256
            strips.append(lzw_encode(diff.tobytes()))
        fn = str(tmp_path / "lzw_pred2.tif")
        open(fn, "wb").write(
            _build_strip_tiff(a, strips, RPS, comp=5, predictor=2))
        from PIL import Image
        np.testing.assert_array_equal(np.asarray(Image.open(fn)), a)
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)


class TestCompressedWrite:
    @pytest.mark.parametrize("compress", ["lzw", "deflate"])
    @pytest.mark.parametrize("dtype", [np.uint8, np.float32])
    def test_roundtrip_and_pil(self, tmp_path, rng, compress, dtype):
        from PIL import Image
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        a = (rng.random((90, 70)) * 200).astype(dtype)
        fn = str(tmp_path / f"w_{compress}_{np.dtype(dtype).name}.tif")
        write_geotiff(fn, a, compress=compress)
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)
        np.testing.assert_array_equal(np.asarray(Image.open(fn)), a)


class TestPackBitsVectorized:
    def test_py_fallback_matches_pil(self, tmp_path, rng):
        from PIL import Image
        from neilpy_tpu.io import geotiff
        from neilpy_tpu.io import tiff_codec
        a = np.repeat(rng.integers(0, 250, (33, 17), dtype=np.uint8),
                      3, axis=1)[:, :50]
        fn = str(tmp_path / "pb.tif")
        Image.fromarray(a).save(fn, compression="packbits")
        # force the python fallback for this read
        orig = tiff_codec._native_call
        tiff_codec._native_call = lambda *args: None
        try:
            X, _ = geotiff.read_geotiff(fn)
        finally:
            tiff_codec._native_call = orig
        np.testing.assert_array_equal(X, a)

    def test_py_vs_native_random_runs(self, rng):
        from neilpy_tpu.io.tiff_codec import (
            packbits_decode, _packbits_decode_py, codec_native_available)
        # build a valid packbits stream: mix of literal + replicate runs
        chunks, expect = [], []
        for _ in range(200):
            if rng.random() < 0.5:
                n = int(rng.integers(1, 120))
                lit = rng.integers(0, 256, n, dtype=np.uint8)
                chunks.append(bytes([n - 1]) + lit.tobytes())
                expect.append(lit.tobytes())
            else:
                n = int(rng.integers(2, 120))
                v = int(rng.integers(0, 256))
                chunks.append(bytes([257 - n, v]))
                expect.append(bytes([v]) * n)
        raw = b"".join(chunks)
        want = b"".join(expect)
        assert _packbits_decode_py(raw, len(want)) == want
        if codec_native_available():
            assert packbits_decode(raw, len(want)) == want


def _build_strip_tiff(a, strips, rps, comp=1, predictor=1):
    """Minimal little-endian strip TIFF around pre-compressed strips."""
    import struct
    H, W = a.shape

    def entry(tid, typ, n, val):
        return struct.pack("<HHL", tid, typ, n) + val

    tags = [
        (256, 4, 1, struct.pack("<L", W)),
        (257, 4, 1, struct.pack("<L", H)),
        (258, 3, 1, struct.pack("<HH", a.itemsize * 8, 0)),
        (259, 3, 1, struct.pack("<HH", comp, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),
        (278, 4, 1, struct.pack("<L", rps)),
    ]
    if predictor != 1:
        tags.append((317, 3, 1, struct.pack("<HH", predictor, 0)))
    noff = len(strips)
    ntags = len(tags) + 2
    ifd_off = 8
    ifd_size = 2 + ntags * 12 + 4
    offsets_blob_off = ifd_off + ifd_size
    counts_blob_off = offsets_blob_off + 4 * noff
    data_off = counts_blob_off + 4 * noff
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    tags.append((273, 4, noff, struct.pack("<L", offsets_blob_off)))
    tags.append((279, 4, noff, struct.pack("<L", counts_blob_off)))
    tags.sort(key=lambda t: t[0])
    out = bytearray()
    out += b"II" + struct.pack("<HL", 42, ifd_off)
    out += struct.pack("<H", ntags)
    for t in tags:
        out += entry(*t)
    out += struct.pack("<L", 0)
    out += b"".join(struct.pack("<L", o) for o in offs)
    out += b"".join(struct.pack("<L", len(s)) for s in strips)
    assert len(out) == data_off
    for s in strips:
        out += s
    return bytes(out)


def _build_tiled_tiff(a, tiles, ts, comp=1):
    """Minimal little-endian tiled TIFF around pre-compressed tiles."""
    import struct
    H, W = a.shape

    def entry(tid, typ, n, val):
        return struct.pack("<HHL", tid, typ, n) + val

    noff = len(tiles)
    ntags = 9
    ifd_off = 8
    ifd_size = 2 + ntags * 12 + 4
    offsets_blob_off = ifd_off + ifd_size
    counts_blob_off = offsets_blob_off + 4 * noff
    data_off = counts_blob_off + 4 * noff
    offs, pos = [], data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    out = bytearray()
    out += b"II" + struct.pack("<HL", 42, ifd_off)
    out += struct.pack("<H", ntags)
    out += entry(256, 4, 1, struct.pack("<L", W))
    out += entry(257, 4, 1, struct.pack("<L", H))
    out += entry(258, 3, 1, struct.pack("<HH", a.itemsize * 8, 0))
    out += entry(259, 3, 1, struct.pack("<HH", comp, 0))
    out += entry(262, 3, 1, struct.pack("<HH", 1, 0))
    out += entry(322, 4, 1, struct.pack("<L", ts))
    out += entry(323, 4, 1, struct.pack("<L", ts))
    out += entry(324, 4, noff, struct.pack("<L", offsets_blob_off))
    out += entry(325, 4, noff, struct.pack("<L", counts_blob_off))
    out += struct.pack("<L", 0)
    out += b"".join(struct.pack("<L", o) for o in offs)
    out += b"".join(struct.pack("<L", len(t)) for t in tiles)
    assert len(out) == data_off
    for t in tiles:
        out += t
    return bytes(out)


def test_read_tiled_tiff(tmp_path, rng):
    """Tile-organised TIFF read path (the goldens are all strips):
    hand-built 48x48 uint8 with 16x16 tiles, partial none."""
    import struct
    from neilpy_tpu.io.geotiff import read_geotiff
    H = W = 48
    TS = 16
    a = (rng.random((H, W)) * 250).astype(np.uint8)
    tiles = []
    for ty in range(H // TS):
        for tx in range(W // TS):
            tiles.append(a[ty*TS:(ty+1)*TS, tx*TS:(tx+1)*TS].tobytes())

    def entry(tid, typ, n, val):
        return struct.pack("<HHL", tid, typ, n) + val

    ntags = 9
    ifd_off = 8
    ifd_size = 2 + ntags * 12 + 4
    noff = len(tiles)
    ext_off = ifd_off + ifd_size
    offsets_blob_off = ext_off
    counts_blob_off = offsets_blob_off + 4 * noff
    data_off = counts_blob_off + 4 * noff
    offs, pos = [], data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    out = bytearray()
    out += b"II" + struct.pack("<HL", 42, ifd_off)
    out += struct.pack("<H", ntags)
    out += entry(256, 4, 1, struct.pack("<L", W))           # width
    out += entry(257, 4, 1, struct.pack("<L", H))           # height
    out += entry(258, 3, 1, struct.pack("<HH", 8, 0))       # bits
    out += entry(259, 3, 1, struct.pack("<HH", 1, 0))       # compression
    out += entry(262, 3, 1, struct.pack("<HH", 1, 0))       # photometric
    out += entry(322, 4, 1, struct.pack("<L", TS))          # TileWidth
    out += entry(323, 4, 1, struct.pack("<L", TS))          # TileLength
    out += entry(324, 4, noff, struct.pack("<L", offsets_blob_off))
    out += entry(325, 4, noff, struct.pack("<L", counts_blob_off))
    out += struct.pack("<L", 0)
    out += b"".join(struct.pack("<L", o) for o in offs)
    out += b"".join(struct.pack("<L", len(t)) for t in tiles)
    assert len(out) == data_off
    for t in tiles:
        out += t
    fn = str(tmp_path / "tiled.tif")
    open(fn, "wb").write(bytes(out))

    from PIL import Image
    np.testing.assert_array_equal(np.asarray(Image.open(fn)), a)  # sanity
    X, _ = read_geotiff(fn)
    np.testing.assert_array_equal(X, a)


def test_write_las_points_by_return_histogram(tmp_path):
    """Header 'number of points by return' must histogram the
    return_number field (not num_returns) — LAS 1.4 spec §2.3."""
    import struct
    from neilpy_tpu.io.las import write_las
    fn = str(tmp_path / "rn.las")
    x = np.arange(6, dtype=float)
    write_las(fn, x, x, x,
              return_number=np.array([1, 1, 2, 2, 2, 3], np.uint8),
              num_returns=np.array([3, 3, 3, 3, 3, 3], np.uint8))
    with open(fn, "rb") as f:
        hdr = f.read(227)
    counts = struct.unpack_from("<5L", hdr, 111)
    assert counts == (2, 3, 1, 0, 0)


class TestJpegTiff:
    """New-style JPEG (compression 7) read path: our container parsing
    + JPEGTables splice, PIL as the entropy decoder.  Outputs must be
    byte-identical to PIL's own decode of the same file."""

    def test_rgb_single_strip(self, tmp_path, rng):
        from PIL import Image
        a = rng.integers(0, 255, (96, 120, 3)).astype(np.uint8)
        fn = str(tmp_path / "j.tif")
        Image.fromarray(a).save(fn, compression="jpeg", quality=95)
        X, meta = read_geotiff(fn)
        np.testing.assert_array_equal(X, np.asarray(Image.open(fn)))
        assert X.shape == (96, 120, 3)

    def test_gray_multi_strip(self, tmp_path, rng):
        from PIL import Image
        g = rng.integers(0, 255, (200, 310)).astype(np.uint8)
        fn = str(tmp_path / "jg.tif")
        Image.fromarray(g).save(fn, compression="jpeg", quality=90,
                                tiffinfo={278: 64})
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, np.asarray(Image.open(fn)))


class TestLzwBoundary:
    """Regression: the encoder must apply the TIFF early-change width
    bump before writing EOI — the decoder registers one more table
    entry for the final data code and widens BEFORE reading the next
    code, so an EOI written at the old width is misread whenever the
    final table count lands exactly on a width boundary (~1/512
    random strips)."""

    # seeds found by simulating the encoder to land nxt == 2**width - 1
    BOUNDARY_SEEDS = [742, 882, 1813, 2137, 2687]

    @pytest.mark.parametrize("seed", BOUNDARY_SEEDS)
    def test_eoi_at_width_boundary(self, seed):
        from neilpy_tpu.io.tiff_codec import (lzw_encode, _lzw_decode_py,
                                              _native_call)
        r = np.random.default_rng(seed)
        n = int(r.integers(500, 1100))
        data = r.integers(0, 256, n).astype(np.uint8).tobytes()
        enc = lzw_encode(data)
        assert _lzw_decode_py(enc, n) == data
        native = _native_call("lzw_decode", enc, n)
        if native is not None:
            assert native == data

    @pytest.mark.parametrize("seed", BOUNDARY_SEEDS[:2])
    def test_boundary_strip_roundtrip_pil(self, tmp_path, seed):
        from PIL import Image
        r = np.random.default_rng(seed)
        n = int(r.integers(500, 1100))
        Z = r.integers(0, 256, n).astype(np.uint8).reshape(1, n)
        fn = str(tmp_path / "b.tif")
        write_geotiff(fn, Z, compress="lzw")
        np.testing.assert_array_equal(np.asarray(Image.open(fn)), Z)
        np.testing.assert_array_equal(read_geotiff(fn)[0], Z)

    def test_native_tolerates_trailing_garbage(self):
        """Once the output is full the native decoder must stop (like
        the Python fallback and libtiff), not reject the stream."""
        from neilpy_tpu.io.tiff_codec import (lzw_encode, _native_call,
                                              _lzw_decode_py)
        data = bytes(range(256)) * 3
        enc = lzw_encode(data) + b"\x55\xaa\x55\xaa"
        assert _lzw_decode_py(enc, len(data)) == data
        native = _native_call("lzw_decode", enc, len(data))
        if native is not None:
            assert native == data


def test_read_tiled_jpeg_tiff(tmp_path, rng):
    """JPEG compression through the TILE branch: hand-built container
    whose tile payloads are standalone JPEG streams (no JPEGTables
    tag).  Lossy, so the oracle is PIL's decode of each tile stream."""
    import io as _io
    import struct
    from PIL import Image
    from neilpy_tpu.io.geotiff import read_geotiff
    H = W = 64
    TS = 32
    a = (rng.random((H, W)) * 250).astype(np.uint8)
    tiles, decoded = [], []
    for ty in range(H // TS):
        for tx in range(W // TS):
            block = a[ty*TS:(ty+1)*TS, tx*TS:(tx+1)*TS]
            buf = _io.BytesIO()
            Image.fromarray(block).save(buf, format="JPEG", quality=92)
            tiles.append(buf.getvalue())
            decoded.append(np.asarray(Image.open(_io.BytesIO(
                tiles[-1]))))

    def entry(tid, typ, n, val):
        return struct.pack("<HHL", tid, typ, n) + val

    ntags = 9
    ifd_off = 8
    ifd_size = 2 + ntags * 12 + 4
    noff = len(tiles)
    offsets_blob_off = ifd_off + ifd_size
    counts_blob_off = offsets_blob_off + 4 * noff
    data_off = counts_blob_off + 4 * noff
    offs, pos = [], data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    out = bytearray()
    out += b"II" + struct.pack("<HL", 42, ifd_off)
    out += struct.pack("<H", ntags)
    out += entry(256, 4, 1, struct.pack("<L", W))
    out += entry(257, 4, 1, struct.pack("<L", H))
    out += entry(258, 3, 1, struct.pack("<HH", 8, 0))
    out += entry(259, 3, 1, struct.pack("<HH", 7, 0))   # JPEG
    out += entry(262, 3, 1, struct.pack("<HH", 1, 0))
    out += entry(322, 4, 1, struct.pack("<L", TS))
    out += entry(323, 4, 1, struct.pack("<L", TS))
    out += entry(324, 4, noff, struct.pack("<L", offsets_blob_off))
    out += entry(325, 4, noff, struct.pack("<L", counts_blob_off))
    out += struct.pack("<L", 0)
    out += b"".join(struct.pack("<L", o) for o in offs)
    out += b"".join(struct.pack("<L", len(t)) for t in tiles)
    assert len(out) == data_off
    for t in tiles:
        out += t
    fn = str(tmp_path / "jtiled.tif")
    open(fn, "wb").write(bytes(out))

    X, _ = read_geotiff(fn)
    i = 0
    for ty in range(H // TS):
        for tx in range(W // TS):
            np.testing.assert_array_equal(
                X[ty*TS:(ty+1)*TS, tx*TS:(tx+1)*TS], decoded[i])
            i += 1


class TestLas14Writer:
    """write_las with pdrf 6-8 emits a LAS 1.4 file (375-byte header,
    64-bit counts at offset 247, zeroed legacy count fields per spec
    §2.2, 4+4-bit return packing) that both readers consume."""

    @pytest.mark.parametrize("pdrf", [6, 7, 8])
    def test_roundtrip(self, tmp_path, rng, pdrf):
        from neilpy_tpu.io.las import write_las
        n = 300
        x = rng.uniform(5e5, 5e5 + 100, n)
        y = rng.uniform(4.2e6, 4.2e6 + 100, n)
        z = rng.uniform(100, 150, n)
        rn = rng.integers(1, 10, n)          # needs the 4-bit field
        kw = {}
        if pdrf >= 7:
            kw["rgb"] = (rng.integers(0, 65535, n),
                         rng.integers(0, 65535, n),
                         rng.integers(0, 65535, n))
        fn = str(tmp_path / f"v14_{pdrf}.las")
        write_las(fn, x, y, z, gpstime=rng.uniform(0, 1e6, n),
                  classification=rng.integers(0, 20, n),
                  return_number=rn, num_returns=np.full(n, 10),
                  pdrf=pdrf)
        header, df = read_las(fn)
        assert header["point_data_format_id"] == pdrf
        assert header["version_minor"] == 4
        assert len(df) == n
        np.testing.assert_allclose(df.x, x, atol=0.001)
        np.testing.assert_allclose(df.z, z, atol=0.001)
        np.testing.assert_array_equal(df.return_number, rn)
        np.testing.assert_array_equal(df.return_max, 10)
        # legacy 32-bit count must be zero (spec) yet reading works
        raw = open(fn, "rb").read()
        import struct as _s
        assert _s.unpack_from("<L", raw, 107)[0] == 0
        assert _s.unpack_from("<Q", raw, 247)[0] == n

    def test_native_reads_14(self, tmp_path, rng):
        from neilpy_tpu.io.las import write_las
        from neilpy_tpu.io.las_native import (native_available,
                                              read_las_arrays)
        if not native_available():
            pytest.skip("native decoder unavailable")
        n = 200
        x = rng.uniform(0, 100, n)
        y = rng.uniform(0, 100, n)
        z = rng.uniform(0, 50, n)
        fn = str(tmp_path / "v14.las")
        write_las(fn, x, y, z, gpstime=rng.uniform(0, 1e6, n), pdrf=6)
        arr = read_las_arrays(fn)
        np.testing.assert_allclose(arr["x"], x, atol=0.001)
        np.testing.assert_allclose(arr["z"], z, atol=0.001)


def test_write_las_validation_and_legacy_histogram(tmp_path, rng):
    """rgb/gpstime vs pdrf combinations fail fast with clear errors;
    the legacy by-return histogram clips returns > 5 into bucket 5 so
    counts still sum to the point count; 1.4 files set the WKT bit."""
    import struct as _s
    from neilpy_tpu.io.las import write_las
    n = 10
    x = rng.uniform(0, 10, n)
    y = rng.uniform(0, 10, n)
    z = rng.uniform(0, 5, n)
    with pytest.raises(ValueError, match="rgb requires"):
        write_las(str(tmp_path / "a.las"), x, y, z,
                  rgb=(x, y, z), pdrf=6)
    with pytest.raises(ValueError, match="gpstime requires"):
        write_las(str(tmp_path / "b.las"), x, y, z, gpstime=x, pdrf=0)
    fn = str(tmp_path / "c.las")
    write_las(fn, x, y, z,
              return_number=np.array([1, 2, 3, 4, 5, 6, 7, 7, 7, 7]),
              num_returns=np.full(n, 7), pdrf=0)
    raw = open(fn, "rb").read()
    counts = _s.unpack_from("<5L", raw, 111)
    assert sum(counts) == n and counts == (1, 1, 1, 1, 6)
    fn14 = str(tmp_path / "d.las")
    write_las(fn14, x, y, z, pdrf=6,
              wkt='GEOGCS["WGS 84"]')
    raw = open(fn14, "rb").read()
    assert _s.unpack_from("<H", raw, 6)[0] & 0x10  # WKT bit
    # ... and the matching OGC WKT CRS VLR (LAS 1.4 requires it for
    # PDRF >= 6; num_variable_records=1, record id 2112)
    assert _s.unpack_from("<L", raw, 100)[0] == 1
    vlr_off = 375
    reserved, user_id, rec_id, rec_len = _s.unpack_from("<H16sHH", raw,
                                                        vlr_off)
    assert user_id.rstrip(b"\x00") == b"LASF_Projection"
    assert rec_id == 2112
    payload = raw[vlr_off + 54: vlr_off + 54 + rec_len]
    assert payload == b'GEOGCS["WGS 84"]\x00'
    # point data offset accounts for the VLR
    assert _s.unpack_from("<L", raw, 96)[0] == 375 + 54 + rec_len
    # round-trips through the reader
    from neilpy_tpu.io.las import read_las
    _, df = read_las(fn14)
    assert len(df) == n


@pytest.mark.heavy
def test_lzw_table_rollover_large_strip(tmp_path, rng):
    """Strips large enough to fill the 12-bit LZW table and emit
    mid-stream Clear codes (the short-strip tests never reach the
    rollover); both decoders + PIL cross-checks."""
    from PIL import Image
    from neilpy_tpu.io.tiff_codec import (lzw_encode, _lzw_decode_py,
                                          _native_call)
    data = rng.integers(0, 256, 60_000).astype(np.uint8).tobytes()
    enc = lzw_encode(data)
    assert _lzw_decode_py(enc, len(data)) == data
    native = _native_call("lzw_decode", enc, len(data))
    if native is not None:
        assert native == data
    Z = rng.integers(0, 256, (64, 2048)).astype(np.uint8)
    fn = str(tmp_path / "big.tif")
    write_geotiff(fn, Z, compress="lzw")
    np.testing.assert_array_equal(np.asarray(Image.open(fn)), Z)
    fn2 = str(tmp_path / "pilbig.tif")
    Image.fromarray(Z).save(fn2, compression="tiff_lzw")
    np.testing.assert_array_equal(read_geotiff(fn2)[0], Z)


class TestZstdLzmaTiff:
    """ZSTD (COG extension code 50000, libzstd via ctypes) and LZMA
    TIFF reads, plus the floating-point predictor (3).  Oracles: PIL's
    libtiff build (compiled with zstd+lzma) and a hand-built
    predictor-3 fixture with an independent forward transform."""

    def _skip_if_no_zstd(self):
        from neilpy_tpu.io.tiff_codec import zstd_available
        if not zstd_available():
            pytest.skip("libzstd not available")

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
    def test_zstd_roundtrip_and_pil_oracle(self, tmp_path, rng, dtype):
        self._skip_if_no_zstd()
        from PIL import Image
        a = (rng.random((67, 83)) * 200).astype(dtype)
        fn = str(tmp_path / "z.tif")
        write_geotiff(fn, a, compress="zstd")
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)
        # byte-identical to what libtiff decodes from the same file
        np.testing.assert_array_equal(np.asarray(Image.open(fn)), a)

    def test_zstd_read_pil_written(self, tmp_path, rng):
        self._skip_if_no_zstd()
        from PIL import Image
        a = rng.integers(0, 65535, (91, 133)).astype(np.uint16)
        fn = str(tmp_path / "pz.tif")
        try:
            Image.fromarray(a).save(fn, compression="tiff_zstd")
        except OSError:
            pytest.skip("PIL build lacks zstd writer")
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)

    def test_lzma_read_pil_written(self, tmp_path, rng):
        from PIL import Image
        a = rng.normal(size=(58, 41)).astype(np.float32)
        fn = str(tmp_path / "pl.tif")
        try:
            Image.fromarray(a).save(fn, compression="tiff_lzma")
        except OSError:
            pytest.skip("PIL build lacks lzma writer")
        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a)

    def test_float_predictor3_hand_built(self, tmp_path, rng):
        """Deflate + predictor 3 multi-strip fixture; the forward
        transform (MSB-first byte-plane split + horizontal byte diff,
        TIFF TechNote 3) is re-implemented here independently of the
        reader.  PIL cross-checks the fixture is well-formed."""
        import struct
        import zlib
        from PIL import Image

        h, w, rps = 37, 53, 8
        a = (rng.normal(size=(h, w)) * 100).astype("<f4")

        def fp_row(row):
            b = row.astype(">f4").tobytes()
            planes = np.frombuffer(b, np.uint8).reshape(w, 4).T.reshape(-1)
            return np.diff(planes.astype(np.int16),
                           prepend=np.int16(0)).astype(np.uint8).tobytes()

        strips = [zlib.compress(b"".join(fp_row(r)
                                         for r in a[r0:r0 + rps]))
                  for r0 in range(0, h, rps)]
        n = len(strips)

        entries = []
        extra = b""
        ifd_size = 2 + 12 * 12 + 4
        data_start = 8 + ifd_size

        def mk(tid, typ, vals):
            nonlocal extra
            fmt = {3: "H", 4: "L"}[typ]
            payload = struct.pack("<" + fmt * len(vals), *vals)
            if len(payload) <= 4:
                return struct.pack("<HHL", tid, typ,
                                   len(vals)) + payload.ljust(4, b"\0")
            off = data_start + len(extra)
            extra += payload
            return struct.pack("<HHLL", tid, typ, len(vals), off)

        entries += [mk(256, 4, [w]), mk(257, 4, [h]), mk(258, 3, [32]),
                    mk(259, 3, [8]), mk(262, 3, [1])]
        so_idx = len(entries)
        entries.append(mk(273, 4, [0] * n))
        entries += [mk(277, 3, [1]), mk(278, 4, [rps]),
                    mk(279, 4, [len(s) for s in strips]),
                    mk(284, 3, [1]), mk(317, 3, [3]), mk(339, 3, [3])]
        strip_start = data_start + len(extra)
        offs, o = [], strip_start
        for s in strips:
            offs.append(o)
            o += len(s)
        payload = struct.pack("<" + "L" * n, *offs)
        if len(payload) <= 4:
            entries[so_idx] = struct.pack(
                "<HHL", 273, 4, n) + payload.ljust(4, b"\0")
        else:
            zero = struct.pack("<" + "L" * n, *([0] * n))
            i = extra.find(zero)
            extra = extra[:i] + payload + extra[i + len(payload):]
        ifd = (struct.pack("<H", 12) + b"".join(entries)
               + struct.pack("<L", 0))
        fn = str(tmp_path / "p3.tif")
        with open(fn, "wb") as f:
            f.write(b"II*\0" + struct.pack("<L", 8) + ifd + extra
                    + b"".join(strips))

        X, _ = read_geotiff(fn)
        np.testing.assert_array_equal(X, a.astype(np.float32))
        np.testing.assert_array_equal(np.asarray(Image.open(fn)),
                                      a.astype(np.float32))

    def test_zstd_predictor3_combination(self, tmp_path, rng):
        """ZSTD entropy stage under the float predictor — the common
        cloud-optimized-GeoTIFF flavour (GDAL COMPRESS=ZSTD
        PREDICTOR=3)."""
        self._skip_if_no_zstd()
        from neilpy_tpu.io.geotiff import _decompress
        from neilpy_tpu.io.tiff_codec import zstd_encode
        w = 29
        a = (rng.normal(size=(6, w)) * 10).astype("<f4")
        rows = []
        for r in a:
            b = r.astype(">f4").tobytes()
            planes = np.frombuffer(b, np.uint8).reshape(w, 4).T.reshape(-1)
            rows.append(np.diff(planes.astype(np.int16),
                                prepend=np.int16(0)).astype(np.uint8)
                        .tobytes())
        raw = zstd_encode(b"".join(rows))
        out = _decompress(raw, 50000, a.nbytes, 3, w, np.dtype("<f4"), 1)
        np.testing.assert_array_equal(
            np.frombuffer(out, "<f4").reshape(a.shape), a)

    def test_unavailable_zstd_clear_error(self, monkeypatch, tmp_path,
                                          rng):
        """When libzstd can't load the reader must fail with an
        actionable message, not a ctypes traceback."""
        from neilpy_tpu.io import tiff_codec
        a = rng.integers(0, 200, (10, 12)).astype(np.uint8)
        fn = str(tmp_path / "z.tif")
        write_geotiff(fn, a, compress="zstd")
        monkeypatch.setattr(tiff_codec, "_ZSTD", None)
        monkeypatch.setattr(tiff_codec, "_ZSTD_FAILED", True)
        with pytest.raises(ValueError, match="libzstd"):
            read_geotiff(fn)


class TestLasStreaming:
    """Chunked native decode + fixed-memory LAS->DEM gridding."""

    def _write_cloud(self, tmp_path, n=30000, seed=5):
        from neilpy_tpu.io.las import write_las
        rng = np.random.default_rng(seed)
        x = rng.uniform(500000, 500200, n)
        y = rng.uniform(4200000, 4200150, n)
        z = rng.normal(300, 10, n)
        cls = rng.integers(1, 7, n).astype(np.uint8)
        fn = str(tmp_path / "cloud.las")
        write_las(fn, x, y, z, classification=cls)
        return fn, x, y, z, cls

    def test_read_las_chunks_concatenates_to_whole(self, tmp_path):
        from neilpy_tpu.io.las_native import (native_available,
                                              read_las_arrays,
                                              read_las_chunks)
        if not native_available():
            pytest.skip("native decoder not built")
        fn, *_ = self._write_cloud(tmp_path)
        whole = read_las_arrays(fn)
        parts = list(read_las_chunks(fn, chunk_points=7001))
        assert len(parts) == 5  # 30000 records in 7001-chunks
        for key in ("x", "y", "z", "intensity", "class",
                    "return_number"):
            np.testing.assert_array_equal(
                np.concatenate([p[key] for p in parts]), whole[key])

    def test_read_las_chunks_stride_and_bbox(self, tmp_path):
        from neilpy_tpu.io.las_native import (native_available,
                                              read_las_arrays,
                                              read_las_chunks)
        if not native_available():
            pytest.skip("native decoder not built")
        fn, x, y, *_ = self._write_cloud(tmp_path)
        bbox = (500050.0, 500150.0, 4200040.0, 4200100.0)
        whole = read_las_arrays(fn, bbox=bbox)
        parts = list(read_las_chunks(fn, chunk_points=4096, bbox=bbox))
        np.testing.assert_array_equal(
            np.concatenate([p["x"] for p in parts]), whole["x"])
        # stride within chunks visits every stride-th record of each
        # chunk -- with chunk_points a multiple of stride that equals
        # the whole-file stride pattern
        whole_s = read_las_arrays(fn, stride=3)
        parts_s = list(read_las_chunks(fn, chunk_points=3 * 2048,
                                       stride=3))
        np.testing.assert_array_equal(
            np.concatenate([p["z"] for p in parts_s]), whole_s["z"])

    def test_read_las_chunks_stride_non_multiple_chunk(self, tmp_path):
        """chunk_points NOT a multiple of stride must still select the
        whole-file stride subset: the iterator rounds chunk boundaries
        down to stride multiples so the phase never resets mid-stream
        (ADVICE r3)."""
        from neilpy_tpu.io.las_native import (native_available,
                                              read_las_arrays,
                                              read_las_chunks)
        if not native_available():
            pytest.skip("native decoder not built")
        fn, *_ = self._write_cloud(tmp_path)
        for stride, chunk in ((3, 7001), (7, 1000), (5, 6)):
            whole_s = read_las_arrays(fn, stride=stride)
            parts_s = list(read_las_chunks(fn, chunk_points=chunk,
                                           stride=stride))
            np.testing.assert_array_equal(
                np.concatenate([p["z"] for p in parts_s]),
                whole_s["z"])
        # degenerate: chunk_points smaller than stride still works
        whole_s = read_las_arrays(fn, stride=1000)
        parts_s = list(read_las_chunks(fn, chunk_points=17,
                                       stride=1000))
        np.testing.assert_array_equal(
            np.concatenate([p["z"] for p in parts_s]), whole_s["z"])

    def test_create_dem_from_las_matches_in_memory(self, tmp_path):
        from neilpy_tpu.io.las_native import native_available
        from neilpy_tpu.ops.pointgrid import (create_dem,
                                              create_dem_from_las)
        if not native_available():
            pytest.skip("native decoder not built")
        fn, x, y, z, cls = self._write_cloud(tmp_path)
        # LAS quantizes to the scale (1 mm): compare against gridding
        # the decoded coordinates, not the pre-write ones
        from neilpy_tpu.io.las_native import read_las_arrays
        d = read_las_arrays(fn)
        a, ta = create_dem(d["x"], d["y"], d["z"], cellsize=1,
                           bin_type="min", device_bin=True)
        b, tb = create_dem_from_las(fn, cellsize=1, bin_type="min",
                                    chunk_points=9000)
        assert list(ta) == list(tb)
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(a), nan=9e9),
            np.nan_to_num(np.asarray(b), nan=9e9))

    def test_create_dem_from_las_class_filter(self, tmp_path):
        from neilpy_tpu.io.las_native import (native_available,
                                              read_las_arrays)
        from neilpy_tpu.ops.pointgrid import (create_dem,
                                              create_dem_from_las)
        if not native_available():
            pytest.skip("native decoder not built")
        fn, *_ = self._write_cloud(tmp_path)
        d = read_las_arrays(fn)
        keep = np.isin(d["class"], [2, 3])
        a, _ = create_dem(d["x"][keep], d["y"][keep], d["z"][keep],
                          cellsize=1, bin_type="max", device_bin=True,
                          edges=None)
        b, _ = create_dem_from_las(fn, cellsize=1, bin_type="max",
                                   chunk_points=8000, classes=(2, 3))
        # frames may differ (header minmax vs filtered-point minmax):
        # compare on the intersection via NaN-padded equality of the
        # filtered-point frame region
        A = np.asarray(a)
        B = np.asarray(b)
        # locate A's frame inside B's (both share cell alignment)
        assert B.shape[0] >= A.shape[0] and B.shape[1] >= A.shape[1]
        found = False
        for r0 in range(B.shape[0] - A.shape[0] + 1):
            for c0 in range(B.shape[1] - A.shape[1] + 1):
                sub = B[r0:r0 + A.shape[0], c0:c0 + A.shape[1]]
                if np.array_equal(np.nan_to_num(sub, nan=9e9),
                                  np.nan_to_num(A, nan=9e9)):
                    found = True
                    break
            if found:
                break
        assert found


class TestGeoTiffSource:
    """Windowed reads: decode only the strips/tiles a pixel rectangle
    touches.  The reference gets this from rasterio's window= reads;
    its own imread (neilpy.py:114-158) is full-raster only."""

    def _write(self, tmp_path, rng, shape=(500, 300), compress="none",
               dtype=np.float32):
        a = rng.normal(size=shape).astype(dtype)
        if np.issubdtype(dtype, np.integer):
            a = (rng.random(shape) * 200).astype(dtype)
        fn = str(tmp_path / f"src_{compress}.tif")
        write_geotiff(fn, a, transform=from_origin(500000, 4200000, 10, 10),
                      crs=32618, nodata=-9999.0, compress=compress)
        return fn, a

    @pytest.mark.parametrize("compress", ["none", "lzw", "deflate"])
    def test_window_matches_full(self, tmp_path, rng, compress):
        from neilpy_tpu.io.geotiff import GeoTiffSource
        fn, a = self._write(tmp_path, rng, compress=compress)
        src = GeoTiffSource(fn)
        assert src.shape == a.shape and src.dtype == a.dtype
        # windows crossing strip boundaries (writer strips are 1 MB
        # ~= 873 rows at 300 f32 cols; use several spans)
        for (r0, r1, c0, c1) in [(0, 10, 0, 300), (100, 400, 50, 200),
                                 (499, 500, 299, 300), (0, 500, 0, 300)]:
            w, meta = src.read(window=((r0, r1), (c0, c1)))
            np.testing.assert_array_equal(w, a[r0:r1, c0:c1])
            assert meta["width"] == c1 - c0 and meta["height"] == r1 - r0
            # window origin georeferenced correctly
            full = src.transform
            assert meta["transform"] * (0, 0) == full * (c0, r0)

    def test_multistrip_partial_decode(self, tmp_path, rng):
        """A small window of a multi-strip file must not decode every
        strip (the out-of-core point)."""
        from neilpy_tpu.io.geotiff import GeoTiffSource
        fn, a = self._write(tmp_path, rng, shape=(4000, 512))
        src = GeoTiffSource(fn)
        assert src._by > 3  # really multi-strip
        w = src.read(window=((0, 16), (0, 512)), return_metadata=False)
        np.testing.assert_array_equal(w, a[:16])
        assert len(src._cache) == 1  # decoded exactly one strip

    def test_getitem_ducktype(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import GeoTiffSource
        fn, a = self._write(tmp_path, rng)
        src = GeoTiffSource(fn)
        np.testing.assert_array_equal(src[10:20, 30:40], a[10:20, 30:40])
        np.testing.assert_array_equal(src[42], a[42])
        np.testing.assert_array_equal(src[-5:], a[-5:])
        np.testing.assert_array_equal(src[:, -7], a[:, -7])
        np.testing.assert_array_equal(np.asarray(src), a)
        assert src.nbytes == a.nbytes and len(src) == a.shape[0]
        with pytest.raises(IndexError):
            src[::2]
        with pytest.raises(IndexError):
            src[0, 0, 0]

    def test_window_tiled_partial_tiles(self, tmp_path, rng):
        """Tile-organised file whose edge tiles are partial: window
        reads clamp the padded tile region."""
        fn = str(tmp_path / "tiled40.tif")
        H = W = 40
        TS = 16
        a = (rng.random((H, W)) * 250).astype(np.uint8)
        ntx = -(-W // TS)
        tiles = []
        for ty in range(-(-H // TS)):
            for tx in range(ntx):
                t = np.zeros((TS, TS), np.uint8)
                blk = a[ty*TS:min((ty+1)*TS, H), tx*TS:min((tx+1)*TS, W)]
                t[:blk.shape[0], :blk.shape[1]] = blk
                tiles.append(t.tobytes())

        def entry(tid, typ, n, val):
            return struct.pack("<HHL", tid, typ, n) + val

        ntags = 9
        ifd_off = 8
        ifd_size = 2 + ntags * 12 + 4
        noff = len(tiles)
        offsets_blob_off = ifd_off + ifd_size
        counts_blob_off = offsets_blob_off + 4 * noff
        data_off = counts_blob_off + 4 * noff
        offs, pos = [], data_off
        for t in tiles:
            offs.append(pos)
            pos += len(t)
        out = bytearray()
        out += b"II" + struct.pack("<HL", 42, ifd_off)
        out += struct.pack("<H", ntags)
        out += entry(256, 4, 1, struct.pack("<L", W))
        out += entry(257, 4, 1, struct.pack("<L", H))
        out += entry(258, 3, 1, struct.pack("<HH", 8, 0))
        out += entry(259, 3, 1, struct.pack("<HH", 1, 0))
        out += entry(262, 3, 1, struct.pack("<HH", 1, 0))
        out += entry(322, 4, 1, struct.pack("<L", TS))
        out += entry(323, 4, 1, struct.pack("<L", TS))
        out += entry(324, 4, noff, struct.pack("<L", offsets_blob_off))
        out += entry(325, 4, noff, struct.pack("<L", counts_blob_off))
        out += struct.pack("<L", 0)
        out += b"".join(struct.pack("<L", o) for o in offs)
        out += b"".join(struct.pack("<L", len(t)) for t in tiles)
        for t in tiles:
            out += t
        open(fn, "wb").write(bytes(out))

        from neilpy_tpu.io.geotiff import GeoTiffSource
        src = GeoTiffSource(fn)
        for (r0, r1, c0, c1) in [(0, 40, 0, 40), (30, 40, 30, 40),
                                 (10, 35, 5, 39), (39, 40, 0, 40)]:
            np.testing.assert_array_equal(
                src.read(window=((r0, r1), (c0, c1)),
                         return_metadata=False), a[r0:r1, c0:c1])

    def test_window_multiband(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import GeoTiffSource
        a = (rng.random((60, 50, 3)) * 255).astype(np.uint8)
        fn = str(tmp_path / "mb.tif")
        write_geotiff(fn, a)
        src = GeoTiffSource(fn)
        assert src.shape == a.shape and src.ndim == 3
        w = src.read(window=((10, 30), (5, 45)), return_metadata=False)
        np.testing.assert_array_equal(w, a[10:30, 5:45])
        np.testing.assert_array_equal(src[3:9, 4:11, 1], a[3:9, 4:11, 1])

    def test_imread_window(self, tmp_path, rng):
        fn, a = self._write(tmp_path, rng)
        X, meta = imread(fn, window=((100, 200), (40, 120)))
        np.testing.assert_array_equal(X, a[100:200, 40:120])
        assert meta["crs"] == 32618 and meta["nodata"] == -9999.0
        # bounds are the window's own
        assert meta["bounds"][3] == 4200000 - 100 * 10
        with pytest.raises(ValueError):
            imread(str(tmp_path / "x.png"), window=((0, 1), (0, 1)))

    def test_window_bigtiff(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import GeoTiffSource
        a = rng.normal(size=(700, 256)).astype(np.float32)
        fn = str(tmp_path / "big.tif")
        write_geotiff(fn, a, bigtiff=True)
        src = GeoTiffSource(fn)
        np.testing.assert_array_equal(
            src.read(window=((650, 700), (0, 256)),
                     return_metadata=False), a[650:])

    def test_cache_eviction(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import GeoTiffSource
        fn, a = self._write(tmp_path, rng, shape=(4000, 512))
        src = GeoTiffSource(fn, cache_bytes=1 << 20)  # < one strip
        np.testing.assert_array_equal(np.asarray(src), a)
        assert len(src._cache) == 1  # evicted down to the cap floor


class TestTiffPyramids:
    """Multi-IFD (overview/pyramid) reads, incl. GDAL .ovr sidecars."""

    def _two_ifd(self, tmp_path, rng, geo=True):
        """Hand-built classic TIFF: IFD0 8x8 f32 (+geo tags), IFD1 4x4
        reduced image with no geo tags."""
        full = rng.normal(size=(8, 8)).astype("<f4")
        ov = full.reshape(4, 2, 4, 2).mean(axis=(1, 3)).astype("<f4")

        def entry(tid, typ, n, val):
            return struct.pack("<HHL", tid, typ, n) + val

        out = bytearray(b"II" + struct.pack("<HL", 42, 8))

        def ifd(a, nxt_ptr_pos_out, geo_tags):
            h, w = a.shape
            tags = [
                (254, 4, 1, struct.pack("<L", 0 if a is full else 1)),
                (256, 4, 1, struct.pack("<L", w)),
                (257, 4, 1, struct.pack("<L", h)),
                (258, 3, 1, struct.pack("<HH", 32, 0)),
                (259, 3, 1, struct.pack("<HH", 1, 0)),
                (262, 3, 1, struct.pack("<HH", 1, 0)),
                (278, 4, 1, struct.pack("<L", h)),
                (339, 3, 1, struct.pack("<HH", 3, 0)),
            ]
            ext = b""
            ifd_off = len(out)
            # geo tags (ModelPixelScale 33550 d[3], Tiepoint 33922 d[6])
            ngeo = 2 if geo_tags else 0
            ntags = len(tags) + 2 + ngeo  # + strip offset/count tags
            ifd_size = 2 + ntags * 12 + 4
            data_off = ifd_off + ifd_size
            if geo_tags:
                scale = struct.pack("<3d", 10.0, 10.0, 0.0)
                tie = struct.pack("<6d", 0, 0, 0, 500000.0, 4200000.0, 0)
                tags.append((33550, 12, 3, struct.pack("<L", data_off)))
                tags.append((33922, 12, 6,
                             struct.pack("<L", data_off + len(scale))))
                ext = scale + tie
            strip_off = data_off + len(ext)
            tags.append((273, 4, 1, struct.pack("<L", strip_off)))
            tags.append((279, 4, 1, struct.pack("<L", a.nbytes)))
            tags.sort()
            out.extend(struct.pack("<H", ntags))
            for t in tags:
                out.extend(entry(*t))
            nxt_pos = len(out)
            out.extend(struct.pack("<L", 0))
            out.extend(ext)
            out.extend(a.tobytes())
            return ifd_off, nxt_pos

        off0, nxt0 = ifd(full, None, geo)
        off1, _ = ifd(ov, None, False)
        struct.pack_into("<L", out, 4, off0)
        struct.pack_into("<L", out, nxt0, off1)
        fn = str(tmp_path / "pyramid.tif")
        open(fn, "wb").write(bytes(out))
        return fn, full, ov

    def test_levels(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import GeoTiffSource, read_geotiff
        fn, full, ov = self._two_ifd(tmp_path, rng)
        src = GeoTiffSource(fn)
        assert src.levels == [(8, 8), (4, 4)] and src.level == 0
        np.testing.assert_array_equal(np.asarray(src), full)
        a1, m1 = read_geotiff(fn, level=1)
        np.testing.assert_array_equal(a1, ov)
        # overview transform: level-0 georef scaled by the size ratio
        a0, m0 = read_geotiff(fn)
        assert m0["transform"][0] == 10.0
        assert m1["transform"][0] == 20.0
        assert m1["transform"] * (0, 0) == m0["transform"] * (0, 0)
        assert m1["bounds"] == m0["bounds"]
        np.testing.assert_array_equal(
            read_geotiff(fn, level=-1)[0], ov)
        with pytest.raises(ValueError):
            GeoTiffSource(fn, level=2)

    def test_real_ovr_sidecar(self):
        """The reference mount's sample_dem.tif is absent, but its GDAL
        .ovr sidecar carries the REAL Mt. Washington terrain at 2x/4x
        reduction — readable as a bare TIFF pyramid, stats matching
        the aux.xml record of the missing full-res file."""
        fn = "/root/reference/sample_data/sample_dem.tif.ovr"
        if not os.path.exists(fn):
            pytest.skip("reference .ovr sidecar not mounted")
        from neilpy_tpu.io.geotiff import GeoTiffSource
        src = GeoTiffSource(fn)
        assert src.levels == [(424, 770), (212, 385)]
        Z = np.asarray(src)
        # aux.xml: min 243.43 max 1899.94 mean 726.88 sd 291.80 — a
        # resampled overview tracks the moments closely (cubic
        # resampling overshoots the extrema slightly)
        assert abs(np.nanmean(Z) - 726.88) < 10
        assert abs(np.nanstd(Z) - 291.80) < 10
        assert abs(np.nanmin(Z) - 243.43) < 20
        assert abs(np.nanmax(Z) - 1899.94) < 40
        Z1 = src.read(window=None, return_metadata=False)
        np.testing.assert_array_equal(Z1, Z)
        assert GeoTiffSource(fn, level=1).shape == (212, 385)


class TestTiledWriterAndOverviews:
    """write_geotiff(tiled=, overviews=): COG-style outputs."""

    @pytest.mark.parametrize("compress", ["none", "deflate", "lzw"])
    def test_tiled_roundtrip_and_pil(self, tmp_path, rng, compress):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        from PIL import Image
        a = rng.normal(size=(90, 140)).astype(np.float32)
        fn = str(tmp_path / f"t_{compress}.tif")
        write_geotiff(fn, a, tiled=True, tile_size=64, compress=compress)
        back, _ = read_geotiff(fn)
        np.testing.assert_array_equal(back, a)
        np.testing.assert_array_equal(np.asarray(Image.open(fn)), a)

    def test_overviews_average_oracle(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        a = rng.normal(size=(100, 130)).astype(np.float32)
        fn = str(tmp_path / "ov.tif")
        write_geotiff(fn, a, transform=from_origin(0, 1000, 10, 10),
                      overviews=(2, 4))
        o2, m2 = read_geotiff(fn, level=1)
        exp = a.reshape(50, 2, 65, 2).mean(axis=(1, 3),
                                           dtype=np.float64)
        np.testing.assert_allclose(o2, exp.astype(np.float32), atol=1e-6)
        assert m2["transform"][0] == 20.0  # derived from level 0
        o4, m4 = read_geotiff(fn, level=2)
        # shared-extent convention (as GDAL): 130 cols * 10 m / 33 cols
        assert o4.shape == (25, 33)
        np.testing.assert_allclose(m4["transform"][0], 1300 / 33)

    def test_overviews_nan_aware(self, tmp_path):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        # local rng: the session fixture's state depends on test order,
        # and this check is ulp-sensitive — keep it reproducible alone
        a = np.random.default_rng(7).normal(size=(8, 8)).astype(np.float32)
        a[0, 0] = np.nan      # hole: block mean of the finite 3
        a[4:6, 4:6] = np.nan  # fully-NaN block stays NaN
        fn = str(tmp_path / "nan.tif")
        write_geotiff(fn, a, overviews=(2,))
        o, _ = read_geotiff(fn, level=1)
        exp = np.nanmean([a[0, 1], a[1, 0], a[1, 1]]).astype(np.float32)
        # writer reduces blockwise (different f64 summation order than
        # the 3-element nanmean here): allow the 1-ulp f32 difference
        np.testing.assert_allclose(o[0, 0], exp, rtol=3e-7)
        assert np.isnan(o[2, 2])

    def test_overviews_numeric_nodata_masked(self, tmp_path):
        """A numeric nodata (e.g. -9999) must be excluded from overview
        averages like NaN, and all-nodata blocks must stay nodata —
        the ADVICE r3 repro: {-9999,10,10,10} block -> 10, not -2492.25."""
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        a = np.full((8, 8), 10.0, dtype=np.float32)
        a[0, 0] = -9999.0          # partial block: mean of finite 3
        a[4:6, 4:6] = -9999.0      # fully-nodata block stays nodata
        fn = str(tmp_path / "nd.tif")
        write_geotiff(fn, a, nodata=-9999.0, overviews=(2,))
        o, meta = read_geotiff(fn, level=1)
        assert meta["nodata"] == -9999.0
        assert o[0, 0] == np.float32(10.0)
        assert o[2, 2] == np.float32(-9999.0)
        assert np.all(o[o != -9999.0] == np.float32(10.0))

    def test_overviews_nodata_not_f64_representable(self, tmp_path):
        """nodata values that change under the f32 -> f64 round trip
        (e.g. -99999.9) must still be masked out of overview averages:
        the comparison has to happen in the RASTER's dtype, not against
        the f64 literal (r4 advisory)."""
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        nd = -99999.9              # float32(nd) != float64(nd)
        a = np.full((8, 8), 10.0, dtype=np.float32)
        a[0, 0] = np.float32(nd)
        fn = str(tmp_path / "ndf.tif")
        write_geotiff(fn, a, nodata=nd, overviews=(2,))
        o, meta = read_geotiff(fn, level=1)
        assert o[0, 0] == np.float32(10.0)
        assert np.all(o == np.float32(10.0))

    def test_overview_level_inherits_nodata_and_crs(self, tmp_path):
        """Overview IFDs carry no GDAL_NODATA/GeoKey tags; level>0
        reads must inherit both from level 0 like the georeferencing
        does (ADVICE r3)."""
        from neilpy_tpu.io.geotiff import write_geotiff, GeoTiffSource
        a = np.full((16, 16), 7.0, dtype=np.float32)
        fn = str(tmp_path / "lvl.tif")
        write_geotiff(fn, a, transform=from_origin(0, 160, 10, 10),
                      crs=32633, nodata=-1.0, overviews=(2,))
        src = GeoTiffSource(fn, level=1)
        assert src.nodata == -1.0
        assert src.crs == 32633

    def test_overviews_nearest_for_classes(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        g = (rng.random((61, 47)) * 9 + 1).astype(np.uint8)
        fn = str(tmp_path / "cls.tif")
        write_geotiff(fn, g, colormap={i: (i, i, i) for i in range(11)},
                      tiled=True, tile_size=32, overviews=(2,))
        o, _ = read_geotiff(fn, level=1)
        np.testing.assert_array_equal(o, g[::2, ::2])
        assert o.dtype == np.uint8

    def test_bigtiff_tiled_overviews(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import write_geotiff, GeoTiffSource
        a = rng.normal(size=(130, 90)).astype(np.float32)
        fn = str(tmp_path / "big.tif")
        write_geotiff(fn, a, bigtiff=True, tiled=True, tile_size=64,
                      overviews=(2,), compress="deflate")
        src = GeoTiffSource(fn)
        assert src.levels == [(130, 90), (65, 45)]
        np.testing.assert_array_equal(np.asarray(src), a)
        np.testing.assert_array_equal(
            GeoTiffSource(fn, level=1).read(return_metadata=False),
            a.reshape(65, 2, 45, 2).mean(axis=(1, 3),
                                         dtype=np.float64
                                         ).astype(np.float32))

    def test_validation(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import write_geotiff
        a = rng.normal(size=(8, 8)).astype(np.float32)
        with pytest.raises(ValueError):
            write_geotiff(str(tmp_path / "x.tif"), a, tiled=True,
                          tile_size=20)
        with pytest.raises(ValueError):
            write_geotiff(str(tmp_path / "x.tif"), a, overviews=(1,))
        with pytest.raises(ValueError):
            write_geotiff(str(tmp_path / "x.tif"), a,
                          overviews=(2,), overview_resampling="cubic")

    def test_multiband_tiled(self, tmp_path, rng):
        from neilpy_tpu.io.geotiff import write_geotiff, read_geotiff
        a = (rng.random((70, 90, 3)) * 255).astype(np.uint8)
        fn = str(tmp_path / "rgb.tif")
        write_geotiff(fn, a, tiled=True, tile_size=32, overviews=(2,))
        back, _ = read_geotiff(fn)
        np.testing.assert_array_equal(back, a)
        o, _ = read_geotiff(fn, level=1)
        np.testing.assert_array_equal(o, a[::2, ::2])


# ---------------------------------------------------------------------
# r4 continuation review fixes
# ---------------------------------------------------------------------
class TestIoReviewFixes:
    def test_scan_angle_is_signed(self, tmp_path):
        """LAS spec: Scan Angle Rank is i1 (legacy) / i2 (extended).
        The reference reads both unsigned (neilpy.py:987/1021), so
        -15 came back as 241 — a documented deviation here."""
        from neilpy_tpu.io.las import read_las, write_las
        x = np.array([1.0, 2.0])
        for pdrf, off, fmt, val in ((0, 16, "<b", -15),
                                    (6, 18, "<h", -2500)):
            fn = str(tmp_path / f"sa{pdrf}.las")
            write_las(fn, x, x, x, pdrf=pdrf)
            hdr, _ = read_las(fn)
            raw = bytearray(open(fn, "rb").read())
            rl = hdr["point_data_record_length"]
            p0 = hdr["point_data_offset"]
            import struct as st
            for i in range(2):
                raw[p0 + i * rl + off:p0 + i * rl + off
                    + st.calcsize(fmt)] = st.pack(fmt, val)
            open(fn, "wb").write(bytes(raw))
            _, df = read_las(fn)
            assert (df["scan_angle"] == val).all(), pdrf

    def test_las14_empty_with_evlr_reads_empty(self, tmp_path):
        """A valid empty LAS 1.4 file carrying an EVLR (e.g. OGC WKT)
        must return 0 points, not garbage decoded from the EVLR."""
        import struct as st
        from neilpy_tpu.io.las import read_las, write_las
        fn = str(tmp_path / "empty14.las")
        x = np.array([1.0, 2.0, 3.0])
        write_las(fn, x, x, x, pdrf=6)
        raw = bytearray(open(fn, "rb").read())
        evlr_start = len(raw)
        # 60-byte fake EVLR payload that would "decode" as points
        raw += b"\xab" * 60
        raw[235:243] = st.pack("<Q", evlr_start)   # start_of_first_evlr
        raw[243:247] = st.pack("<L", 1)            # num EVLRs
        raw[107:111] = st.pack("<L", 0)            # legacy count = 0
        raw[247:255] = st.pack("<Q", 0)            # 1.4 count = 0
        open(fn, "wb").write(bytes(raw))
        hdr, df = read_las(fn)
        assert len(df) == 0
        # and a populated 1.4 file with a trailing EVLR still reads
        # exactly its n points
        fn2 = str(tmp_path / "tail14.las")
        write_las(fn2, x, x, x, pdrf=6)
        raw = bytearray(open(fn2, "rb").read())
        evlr_start = len(raw)
        raw += b"\xcd" * 60
        raw[235:243] = st.pack("<Q", evlr_start)
        raw[243:247] = st.pack("<L", 1)
        open(fn2, "wb").write(bytes(raw))
        _, df2 = read_las(fn2)
        assert len(df2) == 3

    def test_read_xyz_explicit_delimiter(self, tmp_path):
        from neilpy_tpu.io.text import read_xyz
        fn = str(tmp_path / "pts.csv")
        open(fn, "w").write("1.0,2.0,3.0\n4.0,5.0,6.0\n")
        df = read_xyz(fn, delimiter=",")
        assert list(df.columns) == ["x", "y", "z"]
        np.testing.assert_allclose(df.x, [1.0, 4.0])
        # whitespace default still works
        fn2 = str(tmp_path / "pts.txt")
        open(fn2, "w").write("1 2 3\n4 5 6\n")
        np.testing.assert_allclose(read_xyz(fn2).z, [3.0, 6.0])

    def test_anisotropic_cellsize_both_orders(self, tmp_path):
        """xres > yres used to slip past the signed square-pixel test
        and take the scalar-mean cellsize (5.5 for a 10x1 raster)."""
        from neilpy_tpu.io.geotiff import (Affine, GeoTiffSource,
                                           write_geotiff)
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        for sx, sy in ((10.0, 1.0), (1.0, 10.0)):
            fn = str(tmp_path / f"aniso{int(sx)}.tif")
            write_geotiff(fn, a, transform=Affine(sx, 0, 0, 0, -sy, 30))
            cs = GeoTiffSource(fn).meta["cellsize"]
            np.testing.assert_allclose(np.asarray(cs), [sx, sy])

    def test_windowed_read_rejects_strided_slice(self, tmp_path):
        from neilpy_tpu.io.geotiff import GeoTiffSource, write_geotiff
        fn = str(tmp_path / "w.tif")
        write_geotiff(fn, np.zeros((10, 10), np.float32))
        src = GeoTiffSource(fn)
        with pytest.raises(ValueError, match="strided"):
            src.read(window=(slice(0, 10, 2), slice(0, 10)))
        with pytest.raises(ValueError, match="strided"):
            src.read(window=(slice(0, 10), slice(0, 10, 3)))

    def test_south_up_and_rotated_transform_roundtrip(self, tmp_path):
        """South-up (e > 0) and rotated transforms round-trip through
        ModelTransformationTag; the old writer silently flipped e and
        dropped rotation terms."""
        from neilpy_tpu.io.geotiff import (Affine, GeoTiffSource,
                                           write_geotiff)
        a = np.arange(20, dtype=np.float32).reshape(4, 5)
        cases = [Affine(1, 0, 100, 0, 2, 200),        # south-up
                 Affine(0.866, -0.5, 10, 0.5, 0.866, 20),  # rotated
                 Affine(-1, 0, 50, 0, -1, 60)]        # mirrored x
        for i, t in enumerate(cases):
            fn = str(tmp_path / f"rot{i}.tif")
            write_geotiff(fn, a, transform=t)
            back = GeoTiffSource(fn).transform
            np.testing.assert_allclose([back[j] for j in range(6)],
                                       [t[j] for j in range(6)])
        # north-up still writes classic PixelScale+Tiepoint (readable
        # by the pre-fix reader): check the tag is absent
        fn = str(tmp_path / "north.tif")
        write_geotiff(fn, a, transform=Affine(2, 0, 5, 0, -2, 9))
        raw = open(fn, "rb").read()
        back = GeoTiffSource(fn).transform
        np.testing.assert_allclose([back[j] for j in range(6)],
                                   [2, 0, 5, 0, -2, 9])

    def test_paletted_overviews_carry_colormap(self, tmp_path):
        """photometric=3 without a ColorMap is invalid TIFF; overview
        IFDs must carry the palette too."""
        import struct as st
        from neilpy_tpu.io.geotiff import (write_geotiff,
                                           _read_ifd_entries)
        fn = str(tmp_path / "pal.tif")
        classes = (np.arange(64 * 64, dtype=np.uint8) % 7) \
            .reshape(64, 64)
        cmap = {i: (10 * i, 20 * i, 30 * i) for i in range(7)}
        write_geotiff(fn, classes, colormap=cmap, overviews=(2, 4))
        data = open(fn, "rb").read()
        (off,) = st.unpack("<L", data[4:8])
        ifds = []
        while off:
            tags, off = _read_ifd_entries(data, off, "<", False)
            ifds.append(tags)
        assert len(ifds) == 3
        for tags in ifds:
            assert 320 in tags, "ColorMap missing on an IFD"

    def test_overview_cascade_memory_and_values(self, tmp_path):
        """Factor 4 cascades from factor 2 (gdaladdo semantics: mean of
        means) and the chunked reducer matches the one-shot result."""
        from neilpy_tpu.io.geotiff import (GeoTiffSource,
                                           _overview_downsample,
                                           write_geotiff)
        rng = np.random.default_rng(3)
        a = rng.normal(size=(100, 130)).astype(np.float32)
        fn = str(tmp_path / "c.tif")
        write_geotiff(fn, a, overviews=(2, 4))
        lv2 = GeoTiffSource(fn, level=1).read(return_metadata=False)
        lv4 = GeoTiffSource(fn, level=2).read(return_metadata=False)
        exp2 = _overview_downsample(a[..., None], 2, "average")[..., 0]
        np.testing.assert_array_equal(lv2, exp2)
        exp4 = _overview_downsample(exp2[..., None], 2,
                                    "average")[..., 0]
        np.testing.assert_array_equal(lv4, exp4)

    def test_subbyte_bits_clear_error(self):
        from neilpy_tpu.io.geotiff import _dtype_from
        with pytest.raises(ValueError, match="BitsPerSample"):
            _dtype_from(1, 1, "<")
        with pytest.raises(ValueError, match="BitsPerSample"):
            _dtype_from(4, 1, "<")
