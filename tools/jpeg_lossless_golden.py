#!/usr/bin/env python3
"""From-scratch lossless-JPEG (SOF3, ITU-T T.81 process 14) golden
generator for JpegCodec.decodeLossless.

Writes real lossless JPEG byte streams with an independent pure-Python
encoder (own predictor chain, own canonical-Huffman difference coder,
mod-2^16 difference arithmetic, byte stuffing, row-aligned restart
markers), then emits the EXPECTED reconstruction — which for a lossless
process is simply the point-transformed source samples,
(orig >> Pt) << Pt — as golden parquet.  The Scala decoder must invert
every prediction and Huffman decision exactly or the hash flips.

Shared spec (T.81 Annex H, both sides):
  * predictors 1..7 on Ra(left) / Rb(above) / Rc(above-left), with
    integer >>1 for the /2 cases;
  * first sample of a scan (and of each restart interval) predicts
    1 << (P - Pt - 1); the rest of that interval's FIRST row predicts
    Ra; the first sample of later rows predicts Rb;
  * restart intervals are row-aligned here (DRI = a whole number of
    MCU rows), the common DICOM layout; the decoder refuses
    mid-row restarts;
  * diff = (sample - Px) mod 2^16 mapped to [-32767, 32768]; SSSS is
    the magnitude category, SSSS=16 carries no extra bits and means
    diff = 32768; extra bits as for DC coefficients;
  * reconstruction Rx = (Px + diff) mod 2^16, output Rx << Pt.

Fixture matrix (covers every predictor 1..7, precisions 8/12/16,
point transform, 3-component interleave, restarts):
  gray8-p1.jpg     8-bit gray  11x8   psel=1
  gray8-p3.jpg     8-bit gray  10x6   psel=3
  gray8-p6.jpg     8-bit gray   9x9   psel=6
  gray12-p4.jpg   12-bit gray  13x9   psel=4   (the DICOM shape)
  gray12-p5-rst.jpg 12-bit gray 12x6  psel=5  DRI=12 (1 row/interval)
  gray16-p7-pt2.jpg 16-bit gray 10x10 psel=7  Pt=2
  rgb8-p2.jpg      8-bit RGB    9x7   psel=2  interleaved 1x1x1

Outputs:
  tools/fixtures/q_jpeg_lossless/*.jpg
  tools/fixtures/q_jpeg_lossless/golden/expected.parquet  (name,y,x,c,v)

Run from the repo root:  python3 tools/jpeg_lossless_golden.py
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "q_jpeg_lossless")

# One shared DC-class Huffman table: SSSS values 0..16, all 5-bit codes
# (17 * 2^-5 < 1: a valid, deliberately incomplete canonical tree).
HUFF_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
HUFF_VALS = list(range(17))


def huff_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes

CODES = huff_codes(HUFF_BITS, HUFF_VALS)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def category(v):
    s = 0
    a = abs(v)
    while a:
        a >>= 1
        s += 1
    return s


def put_diff(bw, d):
    # d in [-32767, 32768]; 32768 is SSSS=16 with no extra bits
    if d == 32768:
        c, ln = CODES[16]
        bw.put(c, ln)
        return
    s = category(d)
    c, ln = CODES[s]
    bw.put(c, ln)
    if s:
        bw.put(d if d > 0 else (d - 1) & ((1 << s) - 1), s)


def predict(plane, w, x, y, reset_row, psel):
    ra = plane[y * w + x - 1]
    if y == reset_row:
        return ra  # rest of the interval's first row
    rb = plane[(y - 1) * w + x]
    if x == 0:
        return rb  # first sample of later rows
    rc = plane[(y - 1) * w + x - 1]
    if psel == 1:
        return ra
    if psel == 2:
        return rb
    if psel == 3:
        return rc
    if psel == 4:
        return ra + rb - rc
    if psel == 5:
        return ra + ((rb - rc) >> 1)
    if psel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # psel == 7


def seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode(w, h, planes, precision, psel, pt=0, dri=0):
    """planes: list of per-component sample lists (row-major), values
    already < 2^precision.  Point transform and prediction happen on
    sample >> pt.  Returns the full JPEG byte stream."""
    nc = len(planes)
    shifted = [[v >> pt for v in p] for p in planes]
    out = bytearray(b"\xff\xd8")  # SOI
    # SOF3
    sof = bytearray([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # id, h=v=1, Tq=0 (unused)
    out += seg(0xC3, bytes(sof))
    # DHT: one DC-class table id 0
    out += seg(0xC4, bytes([0x00] + HUFF_BITS + HUFF_VALS))
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))
    # SOS: all components interleaved, table 0
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([psel, 0, pt])  # Ss=predictor, Se=0, Ah<<4|Al=pt
    out += seg(0xDA, bytes(sos))

    bw = BitWriter()
    reset_row = 0
    mcu = 0
    rst = 0
    default = 1 << (precision - pt - 1)
    first_of_interval = True
    for y in range(h):
        for x in range(w):
            if dri and mcu and mcu % dri == 0:
                assert x == 0, "restart must be row-aligned"
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                reset_row = y
                first_of_interval = True
            for p in shifted:
                px = default if first_of_interval else predict(
                    p, w, x, y, reset_row, psel)
                d = (p[y * w + x] - px) & 0xFFFF
                if d > 32768:
                    d -= 65536
                put_diff(bw, d)
            first_of_interval = False
            mcu += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def lcg_plane(w, h, seed, maxv):
    s = seed
    vals = []
    for _ in range(w * h):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        vals.append(s % (maxv + 1))
    return vals


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []  # (name, y, x, c, v)

    def emit(name, w, h, planes, precision, psel, pt=0, dri=0):
        data = encode(w, h, planes, precision, psel, pt, dri)
        with open(os.path.join(OUT, name + ".jpg"), "wb") as f:
            f.write(data)
        for y in range(h):
            for x in range(w):
                for c, p in enumerate(planes):
                    rows.append((name, y, x, c, (p[y * w + x] >> pt) << pt))

    emit("gray8-p1", 11, 8, [lcg_plane(11, 8, 7, 255)], 8, 1)
    emit("gray8-p3", 10, 6, [lcg_plane(10, 6, 11, 255)], 8, 3)
    emit("gray8-p6", 9, 9, [lcg_plane(9, 9, 13, 255)], 8, 6)
    emit("gray12-p4", 13, 9, [lcg_plane(13, 9, 17, 4095)], 12, 4)
    emit("gray12-p5-rst", 12, 6, [lcg_plane(12, 6, 19, 4095)], 12, 5,
         dri=12)
    emit("gray16-p7-pt2", 10, 10, [lcg_plane(10, 10, 23, 65535)], 16, 7,
         pt=2)
    emit("rgb8-p2", 9, 7, [lcg_plane(9, 7, 29, 255),
                           lcg_plane(9, 7, 31, 255),
                           lcg_plane(9, 7, 37, 255)], 8, 2)

    import pyarrow as pa
    import pyarrow.parquet as pq
    gdir = os.path.join(OUT, "golden")
    os.makedirs(gdir, exist_ok=True)
    t = pa.table({
        "name": pa.array([r[0] for r in rows], pa.string()),
        "y": pa.array([r[1] for r in rows], pa.int32()),
        "x": pa.array([r[2] for r in rows], pa.int32()),
        "c": pa.array([r[3] for r in rows], pa.int32()),
        "v": pa.array([r[4] for r in rows], pa.int32()),
    })
    pq.write_table(t, os.path.join(gdir, "expected.parquet"))
    print(f"wrote {len(rows)} golden samples over 7 fixtures to {OUT}")


if __name__ == "__main__":
    main()
