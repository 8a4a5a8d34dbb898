#!/usr/bin/env python3
"""Foreign-fixture writer for the EXIF metadata scan (q_exif_meta /
q_exif_gps) — image-side PII curation: crawled JPEGs carry camera
metadata in an APP1 "Exif" segment (a TIFF IFD tree), and GPS
coordinates in its GPS sub-IFD are exactly the kind of personal data
a corpus pipeline must surface and strip. Files are assembled by a
from-scratch APP1/TIFF writer against the public specs (JPEG marker
segments; TIFF 6.0 IFDs: little- and big-endian, inline vs offset
values, BYTE/ASCII/SHORT/LONG/RATIONAL/UNDEFINED/SRATIONAL types;
EXIF 2.3 sub-IFD pointers 0x8769/0x8825), NOT by any imaging
library; the golden parquet is computed from the tag tables used to
WRITE.

Layout written under tools/fixtures/q_exif_meta/:
  exif-ii-00.jpg  little-endian TIFF: IFD0 (Make/Model/Orientation/
                  DateTime/XResolution), Exif sub-IFD (FNumber, ISO,
                  DateTimeOriginal, ExifVersion UNDEFINED, pixel
                  dims), GPS sub-IFD (Dakar: 14°40'N 17°26'W + altitude)
  exif-mm-01.jpg  big-endian TIFF: different tags, a negative
                  SRATIONAL exposure bias, southern/eastern GPS refs
                  (sign flip), no altitude
  exif-none-02.jpg a JPEG with only APP0 — zero metadata rows
  exif-bad-03.jpg  APP1 Exif whose IFD runs past the segment ->
                  whole-file refusal
exif-bad-03's ABSENCE from the golden is itself graded.
"""
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_exif_meta")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, ifd, tag, ttype, idx, num, den, sval)

TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def tiff_block(end, ifd0, exif, gps):
    """Assemble a TIFF block: IFD0 at offset 8 (+ pointer tags to the
    exif/gps sub-IFDs), value area after the last IFD. Entries are
    (tag, type, values): values = list of ints, (num, den) tuples,
    a str (ASCII), or bytes (UNDEFINED)."""
    e = "<" if end == b"II" else ">"

    def count_of(ttype, values):
        if ttype == 2:
            return len(values) + 1  # ASCII includes the NUL
        if ttype == 7:
            return len(values)
        return len(values)

    def payload(ttype, values):
        if ttype == 2:
            return values.encode("ascii") + b"\x00"
        if ttype == 7:
            return bytes(values)
        out = b""
        for v in values:
            if ttype == 1:
                out += struct.pack(e + "B", v)
            elif ttype == 3:
                out += struct.pack(e + "H", v)
            elif ttype == 4:
                out += struct.pack(e + "I", v)
            elif ttype == 5:
                out += struct.pack(e + "II", v[0], v[1])
            elif ttype == 9:
                out += struct.pack(e + "i", v)
            elif ttype == 10:
                out += struct.pack(e + "ii", v[0], v[1])
        return out

    ifds = [("ifd0", sorted(ifd0))]
    if exif:
        ifds.append(("exif", sorted(exif)))
    if gps:
        ifds.append(("gps", sorted(gps)))
    # sizes: ifd0 gains one pointer entry per sub-IFD
    sizes = {}
    extra0 = (1 if exif else 0) + (1 if gps else 0)
    for name, entries in ifds:
        n = len(entries) + (extra0 if name == "ifd0" else 0)
        sizes[name] = 2 + n * 12 + 4
    offs = {}
    pos = 8
    for name, _ in ifds:
        offs[name] = pos
        pos += sizes[name]
    data_at = pos

    data = b""

    def encode_ifd(name, entries):
        nonlocal data
        full = list(entries)
        if name == "ifd0":
            if exif:
                full.append((0x8769, 4, [offs["exif"]]))
            if gps:
                full.append((0x8825, 4, [offs["gps"]]))
            full.sort()
        out = struct.pack(e + "H", len(full))
        for tag, ttype, values in full:
            cnt = count_of(ttype, values)
            pl = payload(ttype, values)
            out += struct.pack(e + "HHI", tag, ttype, cnt)
            if len(pl) <= 4:
                out += pl + b"\x00" * (4 - len(pl))
            else:
                out += struct.pack(e + "I", data_at + len(data))
                data += pl
        out += struct.pack(e + "I", 0)  # no next IFD
        assert len(out) == sizes[name]
        return out

    block = end + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
    for name, entries in ifds:
        block += encode_ifd(name, entries)
    return block + data


def jpeg_with(app1_tiff, fname, extra_app0=True):
    out = b"\xFF\xD8"  # SOI
    if extra_app0:
        app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xFF\xE0" + struct.pack(">H", 2 + len(app0)) + app0
    if app1_tiff is not None:
        seg = b"Exif\x00\x00" + app1_tiff
        out += b"\xFF\xE1" + struct.pack(">H", 2 + len(seg)) + seg
    com = b"graft exif golden"
    out += b"\xFF\xFE" + struct.pack(">H", 2 + len(com)) + com
    out += b"\xFF\xD9"  # EOI (no scan: the walker stops before SOS)
    with open(os.path.join(D, fname), "wb") as fh:
        fh.write(out)


def emit(fname, ifd, entries):
    for tag, ttype, values in entries:
        if ttype == 2:
            ROWS.append((fname, ifd, tag, ttype, 0, 0, 0, values))
        elif ttype == 7:
            ROWS.append((fname, ifd, tag, ttype, 0, 0, 0,
                         bytes(values).hex()))
        else:
            for i, v in enumerate(values):
                if ttype in (5, 10):
                    ROWS.append((fname, ifd, tag, ttype, i,
                                 v[0], v[1], None))
                else:
                    ROWS.append((fname, ifd, tag, ttype, i, v, 1, None))


# ---- exif-ii-00.jpg: the full little-endian set, Dakar GPS
ifd0_a = [
    (0x010F, 2, "GraftCam"),                 # Make
    (0x0110, 2, "Model X100"),               # Model
    (0x0112, 3, [6]),                        # Orientation: rotate 90 CW
    (0x011A, 5, [(72, 1)]),                  # XResolution
    (0x0132, 2, "2023:07:14 10:31:08"),      # DateTime
]
exif_a = [
    (0x829D, 5, [(28, 10)]),                 # FNumber f/2.8
    (0x8827, 3, [200]),                      # ISO
    (0x9000, 7, b"0230"),                    # ExifVersion (UNDEFINED)
    (0x9003, 2, "2023:07:14 10:31:08"),      # DateTimeOriginal
    (0xA002, 4, [4032]),                     # PixelXDimension
    (0xA003, 4, [3024]),                     # PixelYDimension
]
gps_a = [
    (0x0001, 2, "N"),                        # GPSLatitudeRef
    (0x0002, 5, [(14, 1), (40, 1), (1230, 100)]),   # 14°40'12.30"
    (0x0003, 2, "W"),                        # GPSLongitudeRef
    (0x0004, 5, [(17, 1), (26, 1), (360, 100)]),    # 17°26'03.60"
    (0x0005, 1, [0]),                        # altitude ref: above sea
    (0x0006, 5, [(2150, 100)]),              # 21.50 m
]
jpeg_with(tiff_block(b"II", ifd0_a, exif_a, gps_a), "exif-ii-00.jpg")
emit("exif-ii-00.jpg", "ifd0", ifd0_a)
emit("exif-ii-00.jpg", "exif", exif_a)
emit("exif-ii-00.jpg", "gps", gps_a)

# ---- exif-mm-01.jpg: big-endian, SRATIONAL bias, S/E refs, no altitude
ifd0_b = [
    (0x010F, 2, "BigEndian Co"),
    (0x0112, 3, [1]),
    (0x0131, 2, "graft 15.0"),               # Software
]
exif_b = [
    (0x9201, 10, [(-1, 3)]),                 # ShutterSpeed SRATIONAL
    (0x9204, 10, [(-2, 3)]),                 # ExposureBias -2/3 EV
    (0x8827, 3, [800]),
]
gps_b = [
    (0x0001, 2, "S"),
    (0x0002, 5, [(33, 1), (51, 1), (0, 1)]), # 33°51'S (Sydney-ish)
    (0x0003, 2, "E"),
    (0x0004, 5, [(151, 1), (12, 1), (3000, 100)]),
]
jpeg_with(tiff_block(b"MM", ifd0_b, exif_b, gps_b), "exif-mm-01.jpg")
emit("exif-mm-01.jpg", "ifd0", ifd0_b)
emit("exif-mm-01.jpg", "exif", exif_b)
emit("exif-mm-01.jpg", "gps", gps_b)

# ---- exif-none-02.jpg: APP0 only — present, zero rows
jpeg_with(None, "exif-none-02.jpg")

# ---- exif-bad-03.jpg: IFD entry count claims 200 entries in a tiny block
bad = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8) + \
    struct.pack("<H", 200) + b"\x00" * 20
jpeg_with(bad, "exif-bad-03.jpg")

schema = pa.schema([
    ("file", pa.string()), ("ifd", pa.string()), ("tag", pa.int32()),
    ("ttype", pa.int32()), ("idx", pa.int32()),
    ("num", pa.int64()), ("den", pa.int64()), ("sval", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden tag rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
