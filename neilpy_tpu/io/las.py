"""Pure-Python LAS 1.0-1.4 point-cloud reader (no laspy).

Parity surface: ``read_las`` (reference neilpy/neilpy.py:903-1087) —
returns (header dict, DataFrame) with scaled x/y/z, unpacked return
numbers and classification flag bits.  LAZ is rejected.

Design: the LAS point record formats are compositional — a legacy core
(PDRF 0-5) or extended core (PDRF 6-10) followed by optional GPS-time
/ RGB / NIR / waveform blocks.  The dtype for any PDRF is assembled
from those blocks (ASPRS LAS 1.4 R15 spec), the raw buffer is viewed
once with ``np.frombuffer`` (zero-copy), and bit fields are unpacked
vectorised.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

__all__ = ["read_las", "write_las", "las_point_dtype"]

# scan_angle is SIGNED per the LAS spec (i1 "Scan Angle Rank"
# -90..+90 legacy; <i2 extended, 0.006-degree units) — the reference
# reader declares it unsigned (neilpy.py:987/1021) so every point
# scanned left of nadir comes back corrupted there (-15 -> 241); this
# is a deliberate, documented deviation, not a parity miss.
_LEGACY_CORE = [("x", "<i4"), ("y", "<i4"), ("z", "<i4"),
                ("intensity", "<u2"), ("return_byte", "u1"),
                ("class", "u1"), ("scan_angle", "i1"), ("user_data", "u1"),
                ("point_source_id", "<u2")]
_EXT_CORE = [("x", "<i4"), ("y", "<i4"), ("z", "<i4"),
             ("intensity", "<u2"), ("return_byte", "u1"),
             ("mixed_byte", "u1"), ("class", "u1"), ("user_data", "u1"),
             ("scan_angle", "<i2"), ("point_source_id", "<u2"),
             ("gpstime", "<f8")]
_GPS = [("gpstime", "<f8")]
_RGB = [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
_NIR = [("near_infrared", "<u2")]
_WAVE = [("wave_packet_descriptor_index", "u1"), ("byte_offset", "<u8"),
         ("wave_packet_size", "<u4"),
         ("return_point_waveform_location", "<f4"),
         ("xt", "<f4"), ("yt", "<f4"), ("zt", "<f4")]

# PDRF -> optional blocks appended to the core
_PDRF_BLOCKS = {
    0: [], 1: [_GPS], 2: [_RGB], 3: [_GPS, _RGB], 4: [_GPS, _WAVE],
    5: [_GPS, _RGB, _WAVE],
    6: [], 7: [_RGB], 8: [_RGB, _NIR], 9: [_WAVE],
    10: [_RGB, _NIR, _WAVE],
}


def las_point_dtype(pdrf):
    """numpy dtype for a LAS point data record format 0-10."""
    if pdrf not in _PDRF_BLOCKS:
        raise ValueError("Point Data Record Format", pdrf,
                         "not yet supported.")
    fields = list(_LEGACY_CORE if pdrf < 6 else _EXT_CORE)
    for block in _PDRF_BLOCKS[pdrf]:
        fields.extend(block)
    return np.dtype(fields)


def _bit(arr, i):
    return (arr & (1 << i)) != 0


def read_las(filename):
    """Read a LAS file into (header dict, pandas DataFrame).

    Keys and unpacked columns mirror the reference reader
    (neilpy.py:903-1087): scaled ``x/y/z``, ``return_number``,
    ``return_max``, scan/edge flags, and for PDRF>=6 the
    classification flag bits and scanner channel.

    Parity notes: for PDRF 0-5 ``df['class']`` is the RAW
    classification byte exactly as the reference returns it — bits 5-7
    carry the synthetic/keypoint/withheld flags, so a flagged ground
    point reads as 130, not 2; mask with ``& 0x1F`` for the class code
    (the SMRF pipeline does).  ``scan_angle`` deviates from the
    reference: it is decoded SIGNED per the LAS spec (see the core
    dtype note above).
    """
    with open(filename, "rb") as f:
        data = f.read()

    hdr = {}
    u = lambda fmt, a, b: struct.unpack("<" + fmt, data[a:b])
    hdr["file_signature"] = u("4s", 0, 4)[0].decode("utf-8")
    if hdr["file_signature"] != "LASF":
        raise ValueError("Not a LAS file (missing LASF signature).")
    hdr["file_source_id"] = u("H", 4, 6)[0]
    hdr["global_encoding"] = u("H", 6, 8)[0]
    hdr["project_id"] = [u("L", 8, 12)[0], u("H", 12, 14)[0],
                         u("H", 14, 16)[0]]
    hdr["version_major"] = u("B", 24, 25)[0]
    hdr["version_minor"] = u("B", 25, 26)[0]
    hdr["version"] = hdr["version_major"] + hdr["version_minor"] / 10
    hdr["system_id"] = u("32s", 26, 58)[0].decode("utf-8",
                                                  "replace").rstrip("\x00")
    hdr["generating_software"] = u("32s", 58, 90)[0].decode(
        "utf-8", "replace").rstrip("\x00")
    hdr["file_creation_day"] = u("H", 90, 92)[0]
    hdr["file_creation_year"] = u("H", 92, 94)[0]
    hdr["header_size"] = u("H", 94, 96)[0]
    hdr["point_data_offset"] = u("L", 96, 100)[0]
    hdr["num_variable_records"] = u("L", 100, 104)[0]
    pdrf = u("B", 104, 105)[0]
    if 128 <= pdrf <= 133:
        raise ValueError("LAZ not yet supported.")
    hdr["point_data_format_id"] = pdrf
    hdr["point_data_record_length"] = u("H", 105, 107)[0]
    hdr["num_point_records"] = u("L", 107, 111)[0]
    hdr["num_points_by_return"] = u("5L", 111, 131)
    hdr["scale"] = u("3d", 131, 155)
    hdr["offset"] = u("3d", 155, 179)
    hdr["minmax"] = u("6d", 179, 227)

    end_point_data = len(data)
    if hdr["version"] == 1.3 and len(data) >= 235:
        hdr["begin_wave_form"] = u("q", 227, 235)[0]
        if hdr["begin_wave_form"] != 0:
            end_point_data = hdr["begin_wave_form"]
    trust_zero_count = False
    if hdr["version"] >= 1.4 and hdr["header_size"] >= 375:
        hdr["start_of_first_evlr"] = u("Q", 235, 243)[0]
        hdr["num_evlrs"] = u("L", 243, 247)[0]
        hdr["num_point_records_14"] = u("Q", 247, 255)[0]
        if hdr["num_point_records"] == 0:
            hdr["num_point_records"] = hdr["num_point_records_14"]
        # EVLRs live AFTER the point records: clamp so trailing EVLR
        # bytes (e.g. an OGC WKT CRS) are never misread as points
        if hdr["num_evlrs"] and hdr["start_of_first_evlr"]:
            end_point_data = min(end_point_data,
                                 hdr["start_of_first_evlr"])
        # a 1.4 writer must fill the 64-bit count, so 0 means an
        # EMPTY file, not a broken legacy writer — no to-EOF fallback
        trust_zero_count = True

    dt = las_point_dtype(pdrf)
    record_len = hdr["point_data_record_length"]
    n = hdr["num_point_records"]
    raw = data[hdr["point_data_offset"]:end_point_data]
    if record_len != dt.itemsize:
        # extra bytes per point (user extensions): view with a padded dtype
        dt = np.dtype({"names": list(dt.names),
                       "formats": [dt.fields[k][0] for k in dt.names],
                       "offsets": [dt.fields[k][1] for k in dt.names],
                       "itemsize": record_len})
    if n or trust_zero_count:
        count = min(n, len(raw) // record_len)
    else:
        # legacy (<=1.3) files from broken writers may leave the count
        # 0: fall back to decoding to EOF, like the reference does
        count = len(raw) // record_len
    pts = np.frombuffer(raw, dtype=dt, count=count)

    df = pd.DataFrame({name: pts[name] for name in pts.dtype.names})
    for axis, col in enumerate("xyz"):
        df[col] = df[col] * hdr["scale"][axis] + hdr["offset"][axis]

    rb = df["return_byte"].to_numpy()
    if pdrf < 6:
        df["return_number"] = (rb & 0b111).astype(np.uint8)
        df["return_max"] = ((rb >> 3) & 0b111).astype(np.uint8)
        df["scan_direction"] = _bit(rb, 6)
        df["edge_of_flight_line"] = _bit(rb, 7)
    else:
        df["return_number"] = (rb & 0b1111).astype(np.uint8)
        df["return_max"] = ((rb >> 4) & 0b1111).astype(np.uint8)
        mb = df["mixed_byte"].to_numpy()
        df["classification_bit_synthetic"] = _bit(mb, 0)
        df["classification_bit_keypoint"] = _bit(mb, 1)
        df["classification_bit_withheld"] = _bit(mb, 2)
        df["classification_bit_overlap"] = _bit(mb, 3)
        df["scanner_channel"] = ((mb >> 4) & 0b11).astype(np.uint8)
        df["scan_direction"] = _bit(mb, 6)
        df["edge_of_flight_line"] = _bit(mb, 7)
        del df["mixed_byte"]
    del df["return_byte"]

    return hdr, df


def write_las(filename, x, y, z, intensity=None, classification=None,
              gpstime=None, rgb=None, return_number=None,
              num_returns=None, point_source_id=None, pdrf=None,
              scale=(0.001, 0.001, 0.001), offset=None, wkt=""):
    """Write a LAS file: 1.2 for legacy PDRF 0-3, 1.4 for PDRF 6-8.

    Beyond the reference's surface (it only reads LAS); the writer
    makes lidar pipelines round-trippable and produces files the
    reader (and the native decoder) consume bit-exactly.

    ``pdrf`` defaults to the smallest legacy format holding the
    supplied optional columns (gpstime -> +1, rgb -> +2); pass
    ``pdrf=6/7/8`` explicitly for a LAS 1.4 file (gpstime always
    stored; 7 adds rgb, 8 adds rgb+nir slots).  ``offset`` defaults
    to the floor of the coordinate minima.

    LAS 1.4 files carry an OGC WKT CRS VLR (record 2112) as the spec
    requires for PDRF >= 6; ``wkt`` supplies the CRS text (empty by
    default — strict validators accept the record either way).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    n = x.size
    if pdrf is None:
        pdrf = (1 if gpstime is not None else 0) | \
               (2 if rgb is not None else 0)
    if pdrf not in (0, 1, 2, 3, 6, 7, 8):
        raise ValueError("write_las supports PDRF 0-3 (LAS 1.2) and "
                         "6-8 (LAS 1.4).")
    if rgb is not None and pdrf not in (2, 3, 7, 8):
        raise ValueError(f"rgb requires PDRF 2/3/7/8, got {pdrf}")
    if gpstime is not None and pdrf in (0, 2):
        raise ValueError(f"gpstime requires PDRF 1/3/6-8, got {pdrf}")
    if offset is None:
        offset = (np.floor(x.min()), np.floor(y.min()), np.floor(z.min()))
    scale = tuple(float(s) for s in scale)
    offset = tuple(float(o) for o in offset)

    dt = las_point_dtype(pdrf)
    rec = np.zeros(n, dtype=dt)
    rec["x"] = np.round((x - offset[0]) / scale[0]).astype(np.int64)
    rec["y"] = np.round((y - offset[1]) / scale[1]).astype(np.int64)
    rec["z"] = np.round((z - offset[2]) / scale[2]).astype(np.int64)
    if intensity is not None:
        rec["intensity"] = np.asarray(intensity, dtype=np.uint16)
    if classification is not None:
        rec["class"] = np.asarray(classification, dtype=np.uint8)
    rn = (np.ones(n, dtype=np.uint8) if return_number is None
          else np.asarray(return_number, dtype=np.uint8))
    nr = (np.ones(n, dtype=np.uint8) if num_returns is None
          else np.asarray(num_returns, dtype=np.uint8))
    if pdrf >= 6:
        # LAS 1.4 packs return/count in 4+4 bits
        rec["return_byte"] = (rn & 0b1111) | ((nr & 0b1111) << 4)
    else:
        rec["return_byte"] = (rn & 0b111) | ((nr & 0b111) << 3)
    if point_source_id is not None:
        rec["point_source_id"] = np.asarray(point_source_id,
                                            dtype=np.uint16)
    if gpstime is not None:
        rec["gpstime"] = np.asarray(gpstime, dtype=np.float64)
    if rgb is not None:
        r, g, b = rgb
        rec["red"] = np.asarray(r, dtype=np.uint16)
        rec["green"] = np.asarray(g, dtype=np.uint16)
        rec["blue"] = np.asarray(b, dtype=np.uint16)

    las14 = pdrf >= 6
    hsize = 375 if las14 else 227
    hdr = bytearray(hsize)
    struct.pack_into("<4s", hdr, 0, b"LASF")
    if las14:
        # the WKT global-encoding bit is mandatory for PDRF >= 6
        # (LAS 1.4 R15 table 4)
        struct.pack_into("<H", hdr, 6, 0x10)
    struct.pack_into("<BB", hdr, 24, 1, 4 if las14 else 2)
    struct.pack_into("<32s", hdr, 26, b"neilpy_tpu")
    struct.pack_into("<32s", hdr, 58, b"neilpy_tpu write_las")
    struct.pack_into("<H", hdr, 94, hsize)            # header size
    struct.pack_into("<L", hdr, 96, hsize)            # point data offset
    struct.pack_into("<B", hdr, 104, pdrf)
    struct.pack_into("<H", hdr, 105, dt.itemsize)
    if las14:
        # legacy count fields MUST be zero for PDRF >= 6 (spec 1.4
        # §2.2); the real counts live in the 1.4 block at offset 247
        by_return = np.bincount(np.minimum(rn, 15), minlength=16)
        struct.pack_into("<Q", hdr, 247, n)
        struct.pack_into("<15Q", hdr, 255,
                         *by_return[1:16].astype(np.uint64))
    else:
        # legacy histogram clips returns > 5 into bucket 5 so the
        # counts still sum to the point count
        by_return = np.bincount(np.minimum(rn, 5), minlength=6)
        struct.pack_into("<L", hdr, 107, n)
        struct.pack_into("<5L", hdr, 111,
                         *by_return[1:6].astype(np.uint32))
    vlrs = b""
    if las14:
        # OGC Coordinate System WKT VLR (LAS 1.4 R15 §4; mandatory
        # companion of the WKT global-encoding bit for PDRF >= 6)
        payload = (wkt or "").encode("utf-8") + b"\x00"
        vlrs = struct.pack("<H16sHH32s", 0, b"LASF_Projection", 2112,
                           len(payload), b"OGC WKT Coordinate System") \
            + payload
        struct.pack_into("<L", hdr, 96, hsize + len(vlrs))
        struct.pack_into("<L", hdr, 100, 1)
    struct.pack_into("<3d", hdr, 131, *scale)
    struct.pack_into("<3d", hdr, 155, *offset)
    struct.pack_into("<6d", hdr, 179, x.max(), x.min(), y.max(),
                     y.min(), z.max(), z.min())
    with open(filename, "wb") as f:
        f.write(bytes(hdr))
        f.write(vlrs)
        f.write(rec.tobytes())
