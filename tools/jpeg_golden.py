#!/usr/bin/env python3
"""From-scratch baseline-JPEG golden generator for JpegCodec.

Writes real baseline (SOF0) JPEG byte streams with an independent
pure-Python/numpy encoder (own FDCT, own canonical-Huffman coder,
Annex-K-style tables carried in DQT/DHT as the format requires), then
decodes them back with an independent pure-Python decoder that
implements the SHARED integer decode spec (see JpegCodec.scala):

  * dequantize: coef * q                       (exact int)
  * IDCT: 14-bit fixed-point table IDCT_T[u][x] = round(16384 *
    c(u)/2 * cos((2x+1)u*pi/16)); acc = sum F[u][v]*T[u][x]*T[v][y];
    sample = clamp(128 + ((acc + 2^27) >> 28))
  * chroma upsample: replicate (x/h_ratio, y/v_ratio)
  * YCbCr->RGB fixed point (libjpeg-style 16-bit constants):
      R = clamp(Y + ((91881*Cr' + 32768) >> 16))
      G = clamp(Y - ((22554*Cb' + 46802*Cr' + 32768) >> 16))
      B = clamp(Y + ((116130*Cb' + 32768) >> 16))

All decode arithmetic is integer, so the Scala decoder must match these
expected pixels EXACTLY.  Outputs:

  tools/fixtures/q_jpeg_decode/*.jpg         the four fixture streams
  tools/fixtures/q_jpeg_decode/golden/*.parquet   expected (name,y,x,r,g,b)

Run from the repo root:  python3 tools/jpeg_golden.py
"""
import math
import os
import struct

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "q_jpeg_decode")

# ---------------------------------------------------------------- tables
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex-K-style Huffman specs (bits[1..16], values).  Correctness of the
# golden does NOT depend on these being the canonical constants: the
# decoder reads whatever DHT carries.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def idct_table():
    """The shared 14-bit fixed-point IDCT basis table (8x8 ints)."""
    t = [[0] * 8 for _ in range(8)]
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        for x in range(8):
            t[u][x] = int(round(16384.0 * cu / 2.0 *
                                math.cos((2 * x + 1) * u * math.pi / 16.0)))
    return t


IDCT_T = idct_table()


# ---------------------------------------------------------------- encoder
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
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def huff_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


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
    f = m @ (block.astype(np.float64) - 128.0) @ m.T
    q = np.array(quant, dtype=np.float64).reshape(8, 8)
    return np.rint(f / q).astype(np.int64)


def encode_block(bw, coefs, pred, dc_codes, ac_codes):
    zz = [int(coefs.flat[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    s = category(diff)
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


def rgb_to_ycbcr(rgb):
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    clip = lambda p: np.clip(np.floor(p + 0.5), 0, 255).astype(np.int64)
    return clip(y), clip(cb), clip(cr)


def subsample_h(plane):
    """4:2:2 horizontal-only chroma subsampling (box average of 1x2)."""
    h, w = plane.shape
    pw = (w + 1) // 2 * 2
    p = np.pad(plane, ((0, 0), (0, pw - w)), mode="edge").astype(np.float64)
    avg = (p[:, 0::2] + p[:, 1::2]) / 2.0
    return np.floor(avg + 0.5).astype(np.int64)


def subsample2(plane):
    h, w = plane.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    avg = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    return np.floor(avg + 0.5).astype(np.int64)


def blocks_of(plane, bh, bw_):
    """Pad plane (edge-replicate) to (bh*8, bw_*8) and yield 8x8 blocks row-major."""
    h, w = plane.shape
    p = np.pad(plane, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")
    for by in range(bh):
        for bx in range(bw_):
            yield p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]


def encode_jpeg(gray=None, rgb=None, subsampling="444", restart=0):
    """Returns baseline JPEG bytes for a grayscale (H,W) or RGB (H,W,3) array."""
    dc_l = huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = bytes([QUANT_LUMA[ZIGZAG[i]] for i in range(64)])
    zz_c = bytes([QUANT_CHROMA[ZIGZAG[i]] for i in range(64)])

    if gray is not None:
        h, w = gray.shape
        out += seg(0xDB, b"\x00" + zz_l)
        out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        out += seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        out += seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        if restart:
            out += seg(0xDD, struct.pack(">H", restart))
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        bw = BitWriter()
        bh, bwid = (h + 7) // 8, (w + 7) // 8
        pred = 0
        mcu = 0
        rst = 0
        for block in blocks_of(gray, bh, bwid):
            if restart and mcu and mcu % restart == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = 0
            pred = encode_block(bw, fdct_quant(block, QUANT_LUMA), pred, dc_l, ac_l)
            mcu += 1
        bw.align()
        out += bw.out
    else:
        h, w = rgb.shape[:2]
        y, cb, cr = rgb_to_ycbcr(rgb)
        if subsampling == "420":
            cb, cr = subsample2(cb), subsample2(cr)
            hs, vs = 2, 2
        elif subsampling == "422":
            cb, cr = subsample_h(cb), subsample_h(cr)
            hs, vs = 2, 1
        else:
            hs, vs = 1, 1
        out += seg(0xDB, b"\x00" + zz_l)
        out += seg(0xDB, b"\x01" + zz_c)
        comp = bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
        out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comp)
        out += seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        out += seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        out += seg(0xC4, bytes([0x01] + DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11] + AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
        if restart:
            out += seg(0xDD, struct.pack(">H", restart))
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

        mcux = (w + 8 * hs - 1) // (8 * hs)
        mcuy = (h + 8 * vs - 1) // (8 * vs)
        # pad planes to full-MCU multiples (edge replicate)
        ypad = np.pad(y, ((0, mcuy * 8 * vs - h), (0, mcux * 8 * hs - w)), mode="edge")
        ch, cw = cb.shape
        cbpad = np.pad(cb, ((0, mcuy * 8 - ch), (0, mcux * 8 - cw)), mode="edge")
        crpad = np.pad(cr, ((0, mcuy * 8 - ch), (0, mcux * 8 - cw)), mode="edge")
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
                            bw, fdct_quant(blk, QUANT_LUMA), preds[0], dc_l, ac_l)
                for ci, plane in ((1, cbpad), (2, crpad)):
                    blk = plane[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
                    preds[ci] = encode_block(
                        bw, fdct_quant(blk, QUANT_CHROMA), preds[ci], dc_c, ac_c)
                mcu += 1
        bw.align()
        out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder
class BitReader:
    def __init__(self, data, pos):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def byte_align(self):
        self.acc = 0
        self.n = 0

    def peek_marker(self):
        """Returns the restart marker low nibble if the next bytes are FFD0-7."""
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
            if self.p >= len(self.d):
                raise EOFError
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                if self.p >= len(self.d):
                    raise EOFError
                nxt = self.d[self.p]
                if nxt == 0x00:
                    self.p += 1
                else:
                    raise EOFError  # marker inside entropy data
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
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def read_huff(br, table):
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise EOFError


def extend(v, s):
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def idct_block(F):
    out = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            acc = 0
            for u in range(8):
                tu = IDCT_T[u][x]
                for v in range(8):
                    acc += F[v][u] * tu * IDCT_T[v][y]
            s = 128 + ((acc + (1 << 27)) >> 28)
            out[y][x] = 0 if s < 0 else (255 if s > 255 else s)
    return out


def decode_jpeg(data):
    """Independent decode of a baseline JPEG following the shared spec.

    Returns (h, w, ncomp, pixels) where pixels is (H,W,3) int array
    (grayscale replicated to r=g=b)."""
    assert data[:2] == b"\xff\xd8"
    p = 2
    quant = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart = 0
    while True:
        assert data[p] == 0xFF
        m = data[p + 1]
        if m == 0xD9:
            break
        ln = struct.unpack(">H", data[p + 2:p + 4])[0]
        body = data[p + 4:p + 2 + ln]
        if m == 0xDB:
            q = 0
            while q < len(body):
                tid = body[q] & 0x0F
                assert body[q] >> 4 == 0
                tab = [0] * 64
                for i in range(64):
                    tab[ZIGZAG[i]] = body[q + 1 + i]
                quant[tid] = tab
                q += 65
        elif m == 0xC4:
            q = 0
            while q < len(body):
                tc, th = body[q] >> 4, body[q] & 0x0F
                bits = list(body[q + 1:q + 17])
                nv = sum(bits)
                vals = list(body[q + 17:q + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = huff_decoder(bits, vals)
                q += 17 + nv
        elif m == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            assert prec == 8
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif m == 0xDD:
            restart = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:
            ns = body[0]
            scomp = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i:3 + 2 * i]
                scomp.append((cs, tt >> 4, tt & 0x0F))
            p = p + 2 + ln
            h, w, comps = frame
            # 10918-1: single-component scans are non-interleaved —
            # raster order of 8x8 units regardless of declared factors
            if len(comps) == 1:
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            planes = []
            for (_, ch, cv, _) in comps:
                planes.append(np.zeros((mcuy * 8 * cv, mcux * 8 * ch), dtype=np.int64))
            br = BitReader(data, p)
            preds = [0] * len(comps)
            mcu = 0
            rst = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and mcu and mcu % restart == 0:
                        br.byte_align()
                        mk = br.peek_marker()
                        assert mk == 0xD0 + (rst & 7)
                        br.skip_marker()
                        rst += 1
                        preds = [0] * len(comps)
                    for ci, (cid, ch, cv, tq) in enumerate(comps):
                        td = next(s[1] for s in scomp if s[0] == cid)
                        ta = next(s[2] for s in scomp if s[0] == cid)
                        for by in range(cv):
                            for bx in range(ch):
                                s = read_huff(br, huff_dc[td])
                                diff = extend(br.bits(s), s) if s else 0
                                preds[ci] += diff
                                zz = [0] * 64
                                zz[0] = preds[ci] * quant[tq][0]
                                k = 1
                                while k < 64:
                                    rs = read_huff(br, huff_ac[ta])
                                    r, s2 = rs >> 4, rs & 0x0F
                                    if s2 == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break
                                    k += r
                                    zz[ZIGZAG[k]] = extend(br.bits(s2), s2) * quant[tq][ZIGZAG[k]]
                                    k += 1
                                F = [[zz[r8 * 8 + c8] for c8 in range(8)] for r8 in range(8)]
                                blk = idct_block(F)
                                y0 = (my * cv + by) * 8
                                x0 = (mx * ch + bx) * 8
                                for yy in range(8):
                                    for xx in range(8):
                                        planes[ci][y0 + yy][x0 + xx] = blk[yy][xx]
                    mcu += 1
            # assemble pixels
            out = np.zeros((h, w, 3), dtype=np.int64)
            if len(comps) == 1:
                for y in range(h):
                    for x in range(w):
                        out[y, x, :] = planes[0][y][x]
            else:
                clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)
                for y in range(h):
                    for x in range(w):
                        yv = int(planes[0][y // (vmax // comps[0][2])][x // (hmax // comps[0][1])])
                        cbv = int(planes[1][y // (vmax // comps[1][2])][x // (hmax // comps[1][1])]) - 128
                        crv = int(planes[2][y // (vmax // comps[2][2])][x // (hmax // comps[2][1])]) - 128
                        out[y, x, 0] = clamp(yv + ((91881 * crv + 32768) >> 16))
                        out[y, x, 1] = clamp(yv - ((22554 * cbv + 46802 * crv + 32768) >> 16))
                        out[y, x, 2] = clamp(yv + ((116130 * cbv + 32768) >> 16))
            return h, w, len(comps), out
        else:
            pass  # APPn/COM: skip
        p = p + 2 + ln
    raise AssertionError("no SOS")


# ---------------------------------------------------------------- fixtures
def synth_gray(h, w):
    a = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            a[y, x] = (x * 13 + y * 29 + ((x * y) % 17) * 3) % 256
    return a


def synth_rgb(h, w, seed):
    a = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            a[y, x, 0] = (x * 7 + y * 11 + seed) % 256
            a[y, x, 1] = (x * 3 + y * 17 + seed * 5) % 256
            a[y, x, 2] = ((x + y) * 23 + seed * 9) % 256
    return a


# ------------------------------------------------- integer-spec encoder
# The SHARED ENCODE SPEC for JpegCodec.encode: all-integer, so Scala
# can reproduce it byte-for-byte.
#   RGB->YCbCr: 16-bit fixed point, arithmetic-shift floor:
#     Y  = (19595 R + 38470 G + 7471 B + 32768) >> 16
#     Cb = ((-11059 R - 21709 G + 32768 B + 32768) >> 16) + 128
#     Cr = ((32768 R - 27439 G - 5329 B + 32768) >> 16) + 128
#   FDCT: the same 14-bit table as the IDCT (T = IDCT_T):
#     F[u][v] = (sum_xy f[x][y] T[u][x] T[v][y] + 2^27) >> 28,
#     f = sample - 128
#   Quantize, round-half-away-from-zero:
#     sgn(F) * ((2|F| + q) // (2 q))
#   Entropy: Annex-K tables, 4:4:4 (no subsampling) or grayscale.


def int_rgb_to_ycbcr(r, g, b):
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128
    cr = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)
    return clamp(y), clamp(cb), clamp(cr)


def int_fdct_quant(block, quant):
    """block: 8x8 list of samples 0..255; returns 8x8 quantized coefs."""
    f = [[block[y][x] - 128 for x in range(8)] for y in range(8)]
    out = [[0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            acc = 0
            for x in range(8):
                tu = IDCT_T[u][x]
                for y in range(8):
                    acc += f[y][x] * tu * IDCT_T[v][y]
            F = (acc + (1 << 27)) >> 28
            q = quant[v * 8 + u]
            aq = (2 * abs(F) + q) // (2 * q)
            out[v][u] = aq if F >= 0 else -aq
    return out


def encode_jpeg_int(gray=None, rgb=None):
    """The integer-spec encoder (grayscale or RGB 4:4:4) — the byte
    stream JpegCodec.encode must reproduce exactly."""
    import numpy as np  # only for input handling
    dc_l = huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = bytes([QUANT_LUMA[ZIGZAG[i]] for i in range(64)])
    zz_c = bytes([QUANT_CHROMA[ZIGZAG[i]] for i in range(64)])

    def enc_block_int(bw, coefs2d, pred, dcc, acc_):
        class A:  # adapt 2d list to the .flat indexing encode_block uses
            flat = [coefs2d[i // 8][i % 8] for i in range(64)]
        return encode_block(bw, A, pred, dcc, acc_)

    def plane_blocks(plane, h, w):
        bh, bwid = (h + 7) // 8, (w + 7) // 8
        for by in range(bh):
            for bx in range(bwid):
                blk = [[int(plane[min(by * 8 + y, h - 1)][min(bx * 8 + x, w - 1)])
                        for x in range(8)] for y in range(8)]
                yield blk

    if gray is not None:
        h, w = len(gray), len(gray[0])
        out += seg(0xDB, b"\x00" + zz_l)
        out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        out += seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        out += seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        bw = BitWriter()
        pred = 0
        for blk in plane_blocks(gray, h, w):
            pred = enc_block_int(bw, int_fdct_quant(blk, QUANT_LUMA), pred, dc_l, ac_l)
        bw.align()
        out += bw.out
    else:
        h, w = len(rgb), len(rgb[0])
        yp = [[0] * w for _ in range(h)]
        cbp = [[0] * w for _ in range(h)]
        crp = [[0] * w for _ in range(h)]
        for yy in range(h):
            for xx in range(w):
                r, g, b = rgb[yy][xx]
                yv, cbv, crv = int_rgb_to_ycbcr(int(r), int(g), int(b))
                yp[yy][xx], cbp[yy][xx], crp[yy][xx] = yv, cbv, crv
        out += seg(0xDB, b"\x00" + zz_l)
        out += seg(0xDB, b"\x01" + zz_c)
        comp = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
        out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comp)
        out += seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        out += seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        out += seg(0xC4, bytes([0x01] + DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11] + AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        bw = BitWriter()
        preds = [0, 0, 0]
        bh, bwid = (h + 7) // 8, (w + 7) // 8
        gy = plane_blocks(yp, h, w)
        gcb = plane_blocks(cbp, h, w)
        gcr = plane_blocks(crp, h, w)
        for _ in range(bh * bwid):
            preds[0] = enc_block_int(bw, int_fdct_quant(next(gy), QUANT_LUMA),
                                     preds[0], dc_l, ac_l)
            preds[1] = enc_block_int(bw, int_fdct_quant(next(gcb), QUANT_CHROMA),
                                     preds[1], dc_c, ac_c)
            preds[2] = enc_block_int(bw, int_fdct_quant(next(gcr), QUANT_CHROMA),
                                     preds[2], dc_c, ac_c)
        bw.align()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    fixtures = [
        ("gray_16x12", encode_jpeg(gray=synth_gray(12, 16))),
        ("rgb444_12x10", encode_jpeg(rgb=synth_rgb(10, 12, 1), subsampling="444")),
        ("rgb420_21x13", encode_jpeg(rgb=synth_rgb(13, 21, 2), subsampling="420")),
        ("rgb422_19x11", encode_jpeg(rgb=synth_rgb(11, 19, 4), subsampling="422")),
        ("rgb420r_48x32", encode_jpeg(rgb=synth_rgb(32, 48, 3), subsampling="420",
                                      restart=1)),
    ]
    rows = {"name": [], "y": [], "x": [], "r": [], "g": [], "b": []}
    for name, data in fixtures:
        with open(os.path.join(OUT, name + ".jpg"), "wb") as f:
            f.write(data)
        h, w, nc, px = decode_jpeg(data)
        print(f"{name}: {w}x{h} comps={nc} bytes={len(data)}")
        for y in range(h):
            for x in range(w):
                rows["name"].append(name)
                rows["y"].append(y)
                rows["x"].append(x)
                rows["r"].append(int(px[y, x, 0]))
                rows["g"].append(int(px[y, x, 1]))
                rows["b"].append(int(px[y, x, 2]))

    import pyarrow as pa
    import pyarrow.parquet as pq
    gdir = os.path.join(OUT, "golden")
    os.makedirs(gdir, exist_ok=True)
    t = pa.table({
        "name": pa.array(rows["name"], pa.string()),
        "y": pa.array(rows["y"], pa.int32()),
        "x": pa.array(rows["x"], pa.int32()),
        "r": pa.array(rows["r"], pa.int32()),
        "g": pa.array(rows["g"], pa.int32()),
        "b": pa.array(rows["b"], pa.int32()),
    })
    pq.write_table(t, os.path.join(gdir, "expected.parquet"))
    print(f"golden rows: {t.num_rows}")

    # encoder goldens: the byte streams JpegCodec.encode must reproduce
    # EXACTLY (shared integer encode spec; odd dims exercise the
    # edge-replicate block padding). Same synth formulas as the Scala spec.
    encdir = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg_enc")
    os.makedirs(encdir, exist_ok=True)
    eg = [[(x * 13 + y * 29 + ((x * y) % 17) * 3) % 256 for x in range(13)]
          for y in range(7)]
    er = [[((x * 7 + y * 11 + 5) % 256, (x * 3 + y * 17 + 25) % 256,
            ((x + y) * 23 + 45) % 256) for x in range(11)] for y in range(9)]
    eb_g = encode_jpeg_int(gray=eg)
    eb_r = encode_jpeg_int(rgb=er)
    open(os.path.join(encdir, "gray_13x7.jpg"), "wb").write(eb_g)
    open(os.path.join(encdir, "rgb_11x9.jpg"), "wb").write(eb_r)
    print(f"encoder goldens: gray {len(eb_g)} bytes, rgb {len(eb_r)} bytes")
    # the integer-spec streams must themselves decode sanely
    for nm, bb in (("enc-gray", eb_g), ("enc-rgb", eb_r)):
        hh, ww, nc, _ = decode_jpeg(bb)
        print(f"  {nm}: decodes {ww}x{hh} comps={nc}")

    # print the Scala IDCT table for JpegCodec.scala
    print("IDCT_T (scale 2^14):")
    for u in range(8):
        print("    Array(" + ", ".join(str(v) for v in IDCT_T[u]) + "),")


if __name__ == "__main__":
    main()
