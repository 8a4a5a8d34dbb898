#!/usr/bin/env python3
"""From-scratch 12-bit extended-sequential JPEG (SOF1, ITU-T T.81
process 2) golden generator for JpegCodec.decode12.

Writes real 12-bit-precision DCT JPEG byte streams with an independent
pure-Python/numpy encoder (own FDCT at level shift 2048, own
canonical-Huffman coder with the wider 12-bit categories — DC SSSS
0..15, AC SSSS 1..14 — 16-bit DQT tables carried with Pq=1 as the
format requires), then decodes them back with an independent
pure-Python decoder that implements the SHARED 12-bit integer decode
spec (see JpegCodec.decode12):

  * dequantize: coef * q                           (exact int)
  * IDCT: the same 14-bit fixed-point basis as the 8-bit path;
    sample = clamp(0..4095, 2048 + ((acc + 2^27) >> 28))
  * chroma upsample: replicate (x/h_ratio, y/v_ratio)
  * YCbCr->RGB fixed point, chroma centered at 2048:
      R = clamp12(Y + ((91881*(Cr-2048) + 32768) >> 16))
      G = clamp12(Y - ((22554*(Cb-2048) + 46802*(Cr-2048) + 32768) >> 16))
      B = clamp12(Y + ((116130*(Cb-2048) + 32768) >> 16))

All decode arithmetic is integer, so the Scala decode must match these
expected samples EXACTLY.  This is the 12-bit DICOM / scientific-
imagery DCT shape the 8-bit entry refuses.  Outputs:

  tools/fixtures/q_jpeg12/*.jpg
  tools/fixtures/q_jpeg12/golden/expected.parquet   (name,y,x,c,v)

Run from the repo root:  python3 tools/jpeg12_golden.py
"""
import math
import os
import struct

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "q_jpeg12")

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

BASE_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
BASE_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
# 12-bit tables: the 8-bit Annex-K-style values x12 (up to 1452 —
# requires the 16-bit Pq=1 DQT form the decoder must parse)
QUANT12_LUMA = [q * 12 for q in BASE_LUMA]
QUANT12_CHROMA = [q * 12 for q in BASE_CHROMA]

# Huffman: fixed-length canonical tables wide enough for 12-bit
# categories. DC: SSSS 0..15, all 6-bit codes (16/64 < 1, valid
# incomplete tree). AC: EOB, ZRL and every (run<<4|size) with size
# 1..14, all 8-bit codes (226/256 < 1, valid).
DC12_BITS = [0, 0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC12_VALS = list(range(16))
AC12_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                            for s in range(1, 15)]
AC12_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


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


def idct_table():
    t = [[0] * 8 for _ in range(8)]
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        for x in range(8):
            t[u][x] = int(round(16384.0 * cu / 2.0 *
                                math.cos((2 * x + 1) * u * math.pi / 16.0)))
    return t


IDCT_T = idct_table()


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def align(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def category(v):
    a = abs(v)
    s = 0
    while a:
        a >>= 1
        s += 1
    return s


def fdct_quant(block, quant):
    m = np.zeros((8, 8))
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    f = m @ (block.astype(np.float64) - 2048.0) @ m.T
    q = np.array(quant, dtype=np.float64).reshape(8, 8)
    return np.rint(f / q).astype(np.int64)


def encode_block(bw, coefs, pred, dc_codes, ac_codes):
    zz = [int(coefs.flat[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    s = category(diff)
    assert s <= 15
    c, ln = dc_codes[s]
    bw.put(c, ln)
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)
            run -= 16
        s = category(zz[k])
        assert s <= 14
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1, s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        bw.put(c, ln)
    return zz[0]


def seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def rgb_to_ycbcr12(rgb):
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 2048.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 2048.0
    clip = lambda p: np.clip(np.floor(p + 0.5), 0, 4095).astype(np.int64)
    return clip(y), clip(cb), clip(cr)


def subsample2(plane):
    h, w = plane.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    avg = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    return np.floor(avg + 0.5).astype(np.int64)


def dqt16(tid, table):
    body = bytearray([0x10 | tid])  # Pq=1: 16-bit elements
    for i in range(64):
        body += struct.pack(">H", table[ZIGZAG[i]])
    return seg(0xDB, bytes(body))


def dht(cls, tid, bits, vals):
    return seg(0xC4, bytes([(cls << 4) | tid] + bits + vals))


def encode12(gray=None, rgb=None, subsampling="444", restart=0):
    dc = huff_codes(DC12_BITS, DC12_VALS)
    ac = huff_codes(AC12_BITS, AC12_VALS)
    out = bytearray(b"\xff\xd8")
    if gray is not None:
        h, w = gray.shape
        out += dqt16(0, QUANT12_LUMA)
        out += seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
        out += dht(0, 0, DC12_BITS, DC12_VALS)
        out += dht(1, 0, AC12_BITS, AC12_VALS)
        if restart:
            out += seg(0xDD, struct.pack(">H", restart))
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        bw = BitWriter()
        bh, bwid = (h + 7) // 8, (w + 7) // 8
        p = np.pad(gray, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge")
        pred = 0
        mcu = 0
        rst = 0
        for by in range(bh):
            for bx in range(bwid):
                if restart and mcu and mcu % restart == 0:
                    bw.align()
                    bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    pred = 0
                blk = p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                pred = encode_block(bw, fdct_quant(blk, QUANT12_LUMA),
                                    pred, dc, ac)
                mcu += 1
        bw.align()
        out += bw.out
    else:
        h, w = rgb.shape[:2]
        y, cb, cr = rgb_to_ycbcr12(rgb)
        if subsampling == "420":
            cb, cr = subsample2(cb), subsample2(cr)
            hs, vs = 2, 2
        else:
            hs, vs = 1, 1
        out += dqt16(0, QUANT12_LUMA)
        out += dqt16(1, QUANT12_CHROMA)
        comp = bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
        out += seg(0xC1, struct.pack(">BHHB", 12, h, w, 3) + comp)
        out += dht(0, 0, DC12_BITS, DC12_VALS)
        out += dht(1, 0, AC12_BITS, AC12_VALS)
        out += dht(0, 1, DC12_BITS, DC12_VALS)
        out += dht(1, 1, AC12_BITS, AC12_VALS)
        if restart:
            out += seg(0xDD, struct.pack(">H", restart))
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        mcux = (w + 8 * hs - 1) // (8 * hs)
        mcuy = (h + 8 * vs - 1) // (8 * vs)
        ypad = np.pad(y, ((0, mcuy * 8 * vs - h), (0, mcux * 8 * hs - w)),
                      mode="edge")
        ch, cw = cb.shape
        cbpad = np.pad(cb, ((0, mcuy * 8 - ch), (0, mcux * 8 - cw)),
                       mode="edge")
        crpad = np.pad(cr, ((0, mcuy * 8 - ch), (0, mcux * 8 - cw)),
                       mode="edge")
        bw = BitWriter()
        preds = [0, 0, 0]
        mcu = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu and mcu % restart == 0:
                    bw.align()
                    bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    preds = [0, 0, 0]
                for by in range(vs):
                    for bx in range(hs):
                        yy, xx = (my * vs + by) * 8, (mx * hs + bx) * 8
                        blk = ypad[yy:yy + 8, xx:xx + 8]
                        preds[0] = encode_block(
                            bw, fdct_quant(blk, QUANT12_LUMA), preds[0],
                            dc, ac)
                for ci, plane in ((1, cbpad), (2, crpad)):
                    blk = plane[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
                    preds[ci] = encode_block(
                        bw, fdct_quant(blk, QUANT12_CHROMA), preds[ci],
                        dc, ac)
                mcu += 1
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- decoder
class BitReader:
    def __init__(self, data, pos):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def byte_align(self):
        self.acc = 0
        self.n = 0

    def peek_rst(self):
        if self.p + 1 < len(self.d) and self.d[self.p] == 0xFF:
            b = self.d[self.p + 1]
            if 0xD0 <= b <= 0xD7:
                return b
        return None

    def skip_marker(self):
        self.p += 2
        self.byte_align()

    def bit(self):
        if self.n == 0:
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                nxt = self.d[self.p]
                if nxt == 0x00:
                    self.p += 1
                else:
                    raise EOFError
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def huff_decoder(bits, vals):
    t = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            t[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return t


def read_huff(br, t):
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if (ln, code) in t:
            return t[(ln, code)]
    raise EOFError


def extend(v, s):
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def idct12(zz):
    out = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            acc = 0
            for u in range(8):
                tu = IDCT_T[u][x]
                for v in range(8):
                    acc += zz[v * 8 + u] * tu * IDCT_T[v][y]
            s = 2048 + ((acc + (1 << 27)) >> 28)
            out[y][x] = 0 if s < 0 else 4095 if s > 4095 else s
    return out


def clamp12(v):
    return 0 if v < 0 else 4095 if v > 4095 else v


def decode12(data):
    """Independent Python decode of the encoder's output per the
    shared 12-bit integer spec; returns (h, w, nc, samples)."""
    dc = huff_decoder(DC12_BITS, DC12_VALS)
    ac = huff_decoder(AC12_BITS, AC12_VALS)
    quant = {}
    p = 2
    h = w = nc = 0
    comps = []
    restart = 0
    while True:
        m = data[p + 1]
        if m == 0xD9:
            raise EOFError
        ln = struct.unpack(">H", data[p + 2:p + 4])[0]
        bo = p + 4
        if m == 0xDB:
            q = bo
            while q < p + 2 + ln:
                pq = data[q] >> 4
                tid = data[q] & 0x0F
                n = 64 * (2 if pq else 1)
                tab = [0] * 64
                for i in range(64):
                    if pq:
                        tab[ZIGZAG[i]] = struct.unpack(
                            ">H", data[q + 1 + 2 * i:q + 3 + 2 * i])[0]
                    else:
                        tab[ZIGZAG[i]] = data[q + 1 + i]
                quant[tid] = tab
                q += 1 + n
        elif m == 0xC1:
            hh, ww = struct.unpack(">HH", data[bo + 1:bo + 5])
            h, w = hh, ww
            nc = data[bo + 5]
            for i in range(nc):
                cid = data[bo + 6 + 3 * i]
                hv = data[bo + 7 + 3 * i]
                tq = data[bo + 8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif m == 0xDD:
            restart = struct.unpack(">H", data[bo:bo + 2])[0]
        elif m == 0xDA:
            break
        p += 2 + ln
    scan_start = p + 2 + struct.unpack(">H", data[p + 2:p + 4])[0]
    if nc == 1:
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planeW = [mcux * 8 * c[1] for c in comps]
    planes = [[0] * (planeW[i] * mcuy * 8 * comps[i][2])
              for i in range(nc)]
    br = BitReader(data, scan_start)
    preds = [0] * nc
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu and mcu % restart == 0:
                br.byte_align()
                assert br.peek_rst() == 0xD0 + (rst & 7)
                br.skip_marker()
                rst += 1
                preds = [0] * nc
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                q = quant[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = [0] * 64
                        s = read_huff(br, dc)
                        diff = extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = read_huff(br, ac)
                            r, s2 = rs >> 4, rs & 0x0F
                            if s2 == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            zz[ZIGZAG[k]] = extend(br.bits(s2), s2) * q[ZIGZAG[k]]
                            k += 1
                        blk = idct12(zz)
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        for yy in range(8):
                            for xx in range(8):
                                planes[ci][(y0 + yy) * planeW[ci] + x0 + xx] \
                                    = blk[yy][xx]
            mcu += 1
    if nc == 1:
        samples = [planes[0][y * planeW[0] + x]
                   for y in range(h) for x in range(w)]
        return h, w, 1, samples
    samples = []
    for y in range(h):
        for x in range(w):
            yv = planes[0][(y // (vmax // comps[0][2])) * planeW[0]
                           + (x // (hmax // comps[0][1]))]
            cb = planes[1][(y // (vmax // comps[1][2])) * planeW[1]
                           + (x // (hmax // comps[1][1]))] - 2048
            cr = planes[2][(y // (vmax // comps[2][2])) * planeW[2]
                           + (x // (hmax // comps[2][1]))] - 2048
            samples.append(clamp12(yv + ((91881 * cr + 32768) >> 16)))
            samples.append(clamp12(
                yv - ((22554 * cb + 46802 * cr + 32768) >> 16)))
            samples.append(clamp12(yv + ((116130 * cb + 32768) >> 16)))
    return h, w, 3, samples


def lcg12(w, h, seed, maxv=4095):
    s = seed
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            out[y, x] = s % (maxv + 1)
    return out


def smooth12(w, h, seed):
    """Smooth-ish 12-bit field (gradient + low-freq ripple) — keeps AC
    categories realistic instead of max-entropy noise."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 1200.0 + 900.0 * np.sin(xx / 3.1 + seed) \
        + 700.0 * np.cos(yy / 2.7 - seed) + 40.0 * xx + 25.0 * yy
    return np.clip(np.floor(base + 0.5), 0, 4095).astype(np.int64)


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []

    def emit(name, data):
        with open(os.path.join(OUT, name + ".jpg"), "wb") as f:
            f.write(data)
        h, w, nc, samples = decode12(data)
        i = 0
        for y in range(h):
            for x in range(w):
                for c in range(nc):
                    rows.append((name, y, x, c, samples[i]))
                    i += 1

    emit("gray12_11x9", encode12(gray=smooth12(11, 9, 1)))
    emit("gray12_17x6_rst", encode12(gray=lcg12(17, 6, 5), restart=2))
    rgb1 = np.stack([smooth12(10, 8, 2), smooth12(10, 8, 3),
                     smooth12(10, 8, 4)], axis=-1)
    emit("rgb12_444_10x8", encode12(rgb=rgb1, subsampling="444"))
    # 37x21 at 4:2:0 -> 3x2 MCUs, so restart=2 really fires (a single-
    # MCU frame would never hit a restart boundary)
    rgb2 = np.stack([smooth12(37, 21, 6), smooth12(37, 21, 7),
                     smooth12(37, 21, 8)], axis=-1)
    emit("rgb12_420_37x21", encode12(rgb=rgb2, subsampling="420",
                                     restart=2))

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
    print(f"wrote {len(rows)} golden samples over 4 fixtures to {OUT}")


if __name__ == "__main__":
    main()
