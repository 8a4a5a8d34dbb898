#!/usr/bin/env python3
"""Foreign-fixture writer for the WebP container scan (q_webp_meta) —
WebP is the dominant image format of the modern web (often ahead of
JPEG on large sites), and a crawl pipeline's first pass needs its
canvas dimensions, alpha/animation flags, frame table and embedded
EXIF WITHOUT a VP8 decoder. Files are assembled against the public
container spec (RIFF framing with even-padding; the VP8 lossy frame
tag + 0x9D012A sync and 14-bit dimensions; the VP8L lossless 0x2F
header's 14+14+1+3 LE bitfields; VP8X extended flags + u24
canvas; ANIM/ANMF animation frames with u24 geometry; a raw-TIFF
EXIF chunk), NOT by any imaging library; the golden parquet is
computed from the tables used to WRITE. Pixel decode stays at the
stub boundary — the same split as Mp4Codec.

Layout under tools/fixtures/q_webp_meta/:
  lossy-00.webp    bare VP8 file, 160x120
  lossless-01.webp bare VP8L file, 31x17 with alpha
  anim-02.webp     VP8X (anim+alpha+exif flags) + ANIM + two ANMF
                   frames (offsets/sizes/durations/dispose) + an
                   EXIF chunk whose GPS IFD carries real coordinates,
                   + an odd-sized chunk exercising RIFF padding
  trunc-03.webp    chunk size past EOF -> whole-file refusal
  badsync-04.webp  VP8 sync bytes wrong -> whole-file refusal
"""
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_webp_meta")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, kind, key, idx, num, sval)


def chunk(fourcc, payload):
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"
    return out


def riff(chunks):
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def vp8_payload(w, h, extra):
    # frame tag: key frame (P=0), version 0, show 1, first-partition
    # size arbitrary
    tag = 0 | (0 << 1) | (1 << 4) | (100 << 5)
    return (struct.pack("<I", tag)[:3] + b"\x9d\x01\x2a" +
            struct.pack("<HH", w, h) + bytes(extra))


def vp8l_payload(w, h, alpha, extra):
    bits = (w - 1) | ((h - 1) << 14) | (alpha << 28) | (0 << 29)
    return b"\x2f" + struct.pack("<I", bits) + bytes(extra)


# ---- lossy-00.webp
with open(os.path.join(D, "lossy-00.webp"), "wb") as fh:
    fh.write(riff([chunk(b"VP8 ", vp8_payload(160, 120, 40))]))
ROWS += [
    ("lossy-00.webp", "canvas", "width", 0, 160, None),
    ("lossy-00.webp", "canvas", "height", 0, 120, None),
    ("lossy-00.webp", "canvas", "alpha", 0, 0, None),
    ("lossy-00.webp", "canvas", "anim", 0, 0, None),
    ("lossy-00.webp", "canvas", "format", 0, 0, "VP8"),
    ("lossy-00.webp", "chunk", "VP8 ", 0, 50, None),
]

# ---- lossless-01.webp
with open(os.path.join(D, "lossless-01.webp"), "wb") as fh:
    fh.write(riff([chunk(b"VP8L", vp8l_payload(31, 17, 1, 20))]))
ROWS += [
    ("lossless-01.webp", "canvas", "width", 0, 31, None),
    ("lossless-01.webp", "canvas", "height", 0, 17, None),
    ("lossless-01.webp", "canvas", "alpha", 0, 1, None),
    ("lossless-01.webp", "canvas", "anim", 0, 0, None),
    ("lossless-01.webp", "canvas", "format", 0, 0, "VP8L"),
    ("lossless-01.webp", "chunk", "VP8L", 0, 25, None),
]

# ---- anim-02.webp
def u24(v):
    return struct.pack("<I", v)[:3]


vp8x = bytes([0x10 | 0x02 | 0x08]) + bytes(3) + u24(320 - 1) + u24(240 - 1)
anim = struct.pack("<I", 0xFF112233) + struct.pack("<H", 3)
frames = [
    # (x/2, y/2, w, h, dur_ms, dispose)
    (0, 0, 320, 240, 80, 0),
    (16, 8, 64, 48, 120, 1),
]
anmf_chunks = []
for i, (fx, fy, fw, fh_, dur, disp) in enumerate(frames):
    sub = chunk(b"VP8 ", vp8_payload(fw, fh_, 10 + i))  # odd payload pads
    payload = (u24(fx // 2) + u24(fy // 2) + u24(fw - 1) + u24(fh_ - 1) +
               u24(dur) + bytes([disp]) + sub)
    anmf_chunks.append(chunk(b"ANMF", payload))
    ROWS += [
        ("anim-02.webp", "frame", "x", i, fx, None),
        ("anim-02.webp", "frame", "y", i, fy, None),
        ("anim-02.webp", "frame", "width", i, fw, None),
        ("anim-02.webp", "frame", "height", i, fh_, None),
        ("anim-02.webp", "frame", "duration_ms", i, dur, None),
        ("anim-02.webp", "frame", "dispose", i, disp, None),
    ]

# a real TIFF block as the EXIF chunk: GPS only (image-PII surface)
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exif_golden import tiff_block  # noqa: E402  (same protocol writer)

gps = [
    (0x0001, 2, "N"),
    (0x0002, 5, [(48, 1), (51, 1), (2400, 100)]),
    (0x0003, 2, "E"),
    (0x0004, 5, [(2, 1), (21, 1), (300, 100)]),
]
exif_tiff = tiff_block(b"II", [(0x0110, 2, "WebP Cam")], [], gps)
anim_file = riff([chunk(b"VP8X", vp8x), chunk(b"ANIM", anim)] +
                 anmf_chunks + [chunk(b"EXIF", exif_tiff)])
with open(os.path.join(D, "anim-02.webp"), "wb") as fh:
    fh.write(anim_file)
ROWS += [
    ("anim-02.webp", "canvas", "width", 0, 320, None),
    ("anim-02.webp", "canvas", "height", 0, 240, None),
    ("anim-02.webp", "canvas", "alpha", 0, 1, None),
    ("anim-02.webp", "canvas", "anim", 0, 1, None),
    ("anim-02.webp", "canvas", "format", 0, 0, "VP8X"),
    ("anim-02.webp", "anim", "loop_count", 0, 3, None),
    ("anim-02.webp", "chunk", "VP8X", 0, 10, None),
    ("anim-02.webp", "chunk", "ANIM", 1, 6, None),
    ("anim-02.webp", "chunk", "ANMF", 2, len(anmf_chunks[0]) - 8 -
     (1 if (len(anmf_chunks[0]) - 8) % 2 else 0), None),
    ("anim-02.webp", "chunk", "ANMF", 3, len(anmf_chunks[1]) - 8 -
     (1 if (len(anmf_chunks[1]) - 8) % 2 else 0), None),
    ("anim-02.webp", "chunk", "EXIF", 4, len(exif_tiff), None),
    # the embedded EXIF GPS decodes through the same TIFF walk
    ("anim-02.webp", "exif_gps", "lat_deg", 0, 48, None),
    ("anim-02.webp", "exif_gps", "lat_ref", 0, 0, "N"),
    ("anim-02.webp", "exif_gps", "lon_deg", 0, 2, None),
    ("anim-02.webp", "exif_gps", "lon_ref", 0, 0, "E"),
]

# ---- refusals
good = open(os.path.join(D, "lossy-00.webp"), "rb").read()
trunc = bytearray(good)
trunc[16:20] = struct.pack("<I", 4000)  # VP8 chunk claims 4000 bytes
with open(os.path.join(D, "trunc-03.webp"), "wb") as fh:
    fh.write(bytes(trunc))
bad = bytearray(good)
bad[23] = 0x00  # break the 0x9D012A sync
with open(os.path.join(D, "badsync-04.webp"), "wb") as fh:
    fh.write(bytes(bad))

schema = pa.schema([
    ("file", pa.string()), ("kind", pa.string()), ("key", pa.string()),
    ("idx", pa.int32()), ("num", pa.int64()), ("sval", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
