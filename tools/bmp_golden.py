#!/usr/bin/env python3
"""Foreign-fixture writer for the BMP scan (q_bmp_decode) — files are
hand-assembled here against the public DIB format (BITMAPFILEHEADER +
BITMAPINFOHEADER, BGRA palettes, 4-byte row padding, bottom-up and
top-down rows, RLE8 runs/absolute/delta), NOT by any imaging library
and never by the engine under test; the golden parquet is computed
from the pixels used to ENCODE.

Layout written under tools/fixtures/q_bmp_decode/:
  rgb24-00.bmp    24-bit BGR, w=5 (stride padding), bottom-up
  pal8-01.bmp     8-bit indexed, 16-color palette
  mono-02.bmp     1-bit indexed, partial trailing byte per row
  rgb32-03.bmp    32-bit BGRX, top-down (negative height)
  rle8-04.bmp     RLE8: runs, absolute mode (odd count -> pad byte),
                  a delta skip (background entry 0), early EOL
  trunc-05.bmp    pixel data cut short -> refusal
  bitfields-06.bmp BI_BITFIELDS compression -> refusal
The two bad files' ABSENCE from the golden is itself graded.
"""
import os, struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_bmp_decode")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, y, x, r, g, b)


def headers(w, h, bpp, compression=0, palette_n=0, data_size=0):
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
                       data_size, 2835, 2835, palette_n, 0)
    off = 14 + 40 + 4 * palette_n
    filehdr = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    return filehdr + info


def emit(fname, w, h, px):
    """px: row-major TOP-DOWN (r,g,b) tuples."""
    for y in range(h):
        for x in range(w):
            r, g, b = px[y * w + x]
            ROWS.append((fname, y, x, r, g, b))


# ---- rgb24-00: bottom-up with stride padding
w, h = 5, 4
px = [((x * 40 + y) % 256, (y * 60 + x) % 256, (x * x + y * y) % 256)
      for y in range(h) for x in range(w)]
stride = (w * 3 + 3) & ~3
data = b""
for y in reversed(range(h)):  # bottom-up storage
    row = b"".join(bytes([px[y * w + x][2], px[y * w + x][1],
                          px[y * w + x][0]]) for x in range(w))
    data += row + b"\x00" * (stride - len(row))
with open(os.path.join(D, "rgb24-00.bmp"), "wb") as f:
    f.write(headers(w, h, 24, data_size=len(data)) + data)
emit("rgb24-00.bmp", w, h, px)

# ---- pal8-01: indexed
PAL = [((i * 17) % 256, (i * 29 + 3) % 256, (i * 47 + 11) % 256)
       for i in range(16)]
pal_quads = b"".join(bytes([b, g, r, 0]) for r, g, b in PAL)
w, h = 7, 3
idx = [(x * 3 + y * 5) % 16 for y in range(h) for x in range(w)]
stride = (w + 3) & ~3
data = b""
for y in reversed(range(h)):
    row = bytes(idx[y * w + x] for x in range(w))
    data += row + b"\x00" * (stride - len(row))
blob = headers(w, h, 8, palette_n=16, data_size=len(data)) + pal_quads + data
with open(os.path.join(D, "pal8-01.bmp"), "wb") as f:
    f.write(blob)
emit("pal8-01.bmp", w, h, [PAL[i] for i in idx])

# ---- mono-02: 1-bit
MONO = [(10, 20, 30), (240, 250, 255)]
mono_quads = b"".join(bytes([b, g, r, 0]) for r, g, b in MONO)
w, h = 11, 5
bits = [(x + y) % 2 for y in range(h) for x in range(w)]
stride = ((w + 31) // 32) * 4
data = b""
for y in reversed(range(h)):
    row = bytearray(stride)
    for x in range(w):
        if bits[y * w + x]:
            row[x // 8] |= 0x80 >> (x % 8)
    data += bytes(row)
with open(os.path.join(D, "mono-02.bmp"), "wb") as f:
    f.write(headers(w, h, 1, palette_n=2, data_size=len(data))
            + mono_quads + data)
emit("mono-02.bmp", w, h, [MONO[i] for i in bits])

# ---- pal4-07: 4-bit indexed, odd width (nibble packing + padding)
w, h = 5, 3
idx4 = [(x * 2 + y * 7) % 16 for y in range(h) for x in range(w)]
stride = ((w * 4 + 31) // 32) * 4
data = b""
for y in reversed(range(h)):
    row = bytearray(stride)
    for x in range(w):
        row[x // 2] |= idx4[y * w + x] << (4 if x % 2 == 0 else 0)
    data += bytes(row)
with open(os.path.join(D, "pal4-07.bmp"), "wb") as f:
    f.write(headers(w, h, 4, palette_n=16, data_size=len(data))
            + pal_quads + data)
emit("pal4-07.bmp", w, h, [PAL[i] for i in idx4])

# ---- rgb32-03: top-down BGRX
w, h = 4, 4
px = [((x * 63) % 256, (y * 77) % 256, (x * y * 13) % 256)
      for y in range(h) for x in range(w)]
data = b"".join(bytes([px[y * w + x][2], px[y * w + x][1],
                       px[y * w + x][0], 0xAA])
                for y in range(h) for x in range(w))
info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(data),
                   2835, 2835, 0, 0)
off = 14 + 40
with open(os.path.join(D, "rgb32-03.bmp"), "wb") as f:
    f.write(struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
            + info + data)
emit("rgb32-03.bmp", w, h, px)

# ---- rle8-04: runs + absolute + delta + early EOL; background = entry 0
w, h = 10, 4
grid = [[0] * w for _ in range(h)]
rle = b""
# stored row 0 (BOTTOM row, y=3 top-down): run of 6 x idx 5, abs [1,2,3], EOL
for x in range(6):
    grid[3][x] = 5
grid[3][6], grid[3][7], grid[3][8] = 1, 2, 3
rle += bytes([6, 5, 0, 3, 1, 2, 3, 0]) + bytes([0, 0])  # abs 3 + pad, EOL
# stored row 1 (y=2): delta skip (3,0) then run 4 x idx 7
grid[2][3:7] = [7, 7, 7, 7]
rle += bytes([0, 2, 3, 0, 4, 7, 0, 0])
# stored row 2 (y=1): run 10 x idx 15
for x in range(w):
    grid[1][x] = 15
rle += bytes([10, 15, 0, 0])
# stored row 3 (y=0): left as background via immediate EOL, then EOB
rle += bytes([0, 0, 0, 1])
with open(os.path.join(D, "rle8-04.bmp"), "wb") as f:
    f.write(headers(w, h, 8, compression=1, palette_n=16,
                    data_size=len(rle)) + pal_quads + rle)
emit("rle8-04.bmp", w, h, [PAL[grid[y][x]] for y in range(h)
                           for x in range(w)])

# ---- refusals
with open(os.path.join(D, "rgb24-00.bmp"), "rb") as f:
    good = f.read()
with open(os.path.join(D, "trunc-05.bmp"), "wb") as f:
    f.write(good[:-10])
bad = bytearray(good)
struct.pack_into("<I", bad, 14 + 16, 3)  # compression = BI_BITFIELDS
with open(os.path.join(D, "bitfields-06.bmp"), "wb") as f:
    f.write(bytes(bad))

schema = pa.schema([
    ("file", pa.string()), ("y", pa.int32()), ("x", pa.int32()),
    ("r", pa.int32()), ("g", pa.int32()), ("b", pa.int32()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
