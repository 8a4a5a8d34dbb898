#!/usr/bin/env python3
"""Progressive-JPEG (SOF2) golden generator for JpegCodec.

Writes real progressive JPEG byte streams with an independent
pure-Python encoder — spectral selection + successive approximation
(the libjpeg standard progression script shape), per-scan two-pass
Huffman tables, real EOB-run accumulation, buffered refinement
correction bits, and restart markers — then self-checks every stream
with an independent pure-Python progressive scan DECODER: the
reconstructed coefficient grids must equal the encoder's input
bit-exactly (full successive-approximation coverage ends at Al=0, so
the progression restores every coefficient).

A progressive file carries exactly the same quantized coefficients as
its baseline (SOF0) sibling, so the expected PIXELS are the baseline
decode_jpeg() of the sibling stream built from the same source image
with the same quant/subsampling — the shared integer decode spec that
JpegCodec.scala implements. Any scan-assembly bug on either side
breaks pixel equality.

Outputs:
  tools/fixtures/q_jpeg_progressive/*.jpg
  tools/fixtures/q_jpeg_progressive/golden/expected.parquet

Run from the repo root: python3 tools/jpeg_progressive_golden.py
"""
import os
import struct

import numpy as np

from jpeg_golden import (
    ZIGZAG, QUANT_LUMA, QUANT_CHROMA, BitWriter,
    fdct_quant, seg, rgb_to_ycbcr, subsample_h, subsample2,
    synth_gray, synth_rgb, decode_jpeg, encode_jpeg,
)

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "q_jpeg_progressive")


# ------------------------------------------------------- coefficient grids
def plan_components(gray=None, rgb=None, subsampling="444"):
    """Returns (w, h, comps, mcux, mcuy, grids): comps is a list of
    dicts (id, hs, vs, tq); grids[i] is a (bh_pad, bw_pad, 64) int
    array of quantized natural-order coefficients over the MCU-padded
    block grid of component i."""
    if gray is not None:
        h, w = gray.shape
        comps = [dict(id=1, hs=1, vs=1, tq=0)]
        planes = [gray]
        quants = [QUANT_LUMA]
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
        comps = [dict(id=1, hs=hs, vs=vs, tq=0),
                 dict(id=2, hs=1, vs=1, tq=1),
                 dict(id=3, hs=1, vs=1, tq=1)]
        planes = [y, cb, cr]
        quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for c, plane, quant in zip(comps, planes, quants):
        bw_pad = mcux * c["hs"]
        bh_pad = mcuy * c["vs"]
        ph, pw = plane.shape
        p = np.pad(plane, ((0, bh_pad * 8 - ph), (0, bw_pad * 8 - pw)),
                   mode="edge")
        g = np.zeros((bh_pad, bw_pad, 64), dtype=np.int64)
        for by in range(bh_pad):
            for bx in range(bw_pad):
                blk = p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                g[by, bx] = fdct_quant(blk, quant).flatten()
        grids.append(g)
    return w, h, comps, mcux, mcuy, grids


def comp_blocks(w, h, c, hmax, vmax):
    """Non-interleaved scan geometry: ceil block dims of a component
    (T.81 A.2.2 — ceil(comp_samples / 8), NOT the MCU-padded grid)."""
    cw = (w * c["hs"] + hmax - 1) // hmax
    ch = (h * c["vs"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


# ------------------------------------------------------------ scan coders
class SymbolCounter:
    """Pass-1 sink: tallies Huffman symbols per table id."""
    def __init__(self):
        self.freq = {}

    def symbol(self, tid, sym):
        self.freq.setdefault(tid, {}).setdefault(sym, 0)
        self.freq[tid][sym] = self.freq[tid][sym] + 1

    def bits(self, v, n):
        pass

    def restart(self, n):
        pass


class BitSink:
    """Pass-2 sink: writes real entropy-coded bytes through the shared
    BitWriter, with byte-stuffing and RSTn emission."""
    def __init__(self, tables):
        self.bw = BitWriter()
        self.tables = tables  # tid -> {sym: (code, len)}

    def symbol(self, tid, sym):
        code, ln = self.tables[tid][sym]
        self.bw.put(code, ln)

    def bits(self, v, n):
        if n:
            self.bw.put(v & ((1 << n) - 1), n)

    def restart(self, n):
        self.bw.align()
        self.bw.out += bytes([0xFF, 0xD0 + (n & 7)])


def flat_table(symbols):
    """Canonical Huffman table with every symbol at one fixed length
    (k symbols need len L with k < 2^L so the all-ones code stays
    reserved, per T.81 C.2). Returns (bits[16], vals)."""
    vals = sorted(symbols)
    L = 1
    while (1 << L) <= len(vals):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(vals)
    return bits, vals


class AcState:
    """Per-scan AC encoder state: EOB run + buffered refinement bits."""
    def __init__(self, sink, tid):
        self.sink = sink
        self.tid = tid
        self.eobrun = 0
        self.be = []  # correction bits owed after the pending EOBRUN

    def flush_eob(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sink.symbol(self.tid, nbits << 4)
            if nbits:
                self.sink.bits(self.eobrun, nbits)
            self.eobrun = 0
        for b in self.be:
            self.sink.bits(b, 1)
        self.be = []


def enc_dc_first(sink, tid, coef, pred, al):
    v = int(coef[0]) >> al  # arithmetic shift: floor, like C
    diff = v - pred
    s = abs(diff).bit_length()
    sink.symbol(tid, s)
    if s:
        sink.bits(diff if diff > 0 else diff + (1 << s) - 1, s)
    return v


def enc_dc_refine(sink, coef, al):
    sink.bits((int(coef[0]) >> al) & 1, 1)


def enc_ac_first(st, coef, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        t = int(coef[ZIGZAG[k]])
        if t < 0:
            t = (-t) >> al
            if t == 0:
                r += 1
                continue
            t2 = ~t
        else:
            t >>= al
            if t == 0:
                r += 1
                continue
            t2 = t
        st.flush_eob()
        while r > 15:
            st.sink.symbol(st.tid, 0xF0)
            r -= 16
        s = t.bit_length()
        st.sink.symbol(st.tid, (r << 4) | s)
        st.sink.bits(t2, s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def enc_ac_refine(st, coef, ss, se, al):
    absv = [0] * 64
    eob = ss - 1
    for k in range(ss, se + 1):
        t = abs(int(coef[ZIGZAG[k]])) >> al
        absv[k] = t
        if t == 1:
            eob = k
    r = 0
    br = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.flush_eob()
            st.sink.symbol(st.tid, 0xF0)
            r -= 16
            for b in br:
                st.sink.bits(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        st.flush_eob()
        st.sink.symbol(st.tid, (r << 4) | 1)
        st.sink.bits(1 if int(coef[ZIGZAG[k]]) > 0 else 0, 1)
        for b in br:
            st.sink.bits(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.be.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eob()


def run_scan(sink, w, h, comps, mcux, mcuy, grids, scan, restart,
             dc_tids, ac_tids):
    """Drives one scan (either pass) through the given sink."""
    cis, ss, se, ah, al = scan
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if len(cis) > 1:
        # interleaved DC scan, MCU order
        assert ss == 0 and se == 0
        preds = {ci: 0 for ci in cis}
        mcu = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu and mcu % restart == 0:
                    sink.restart(rst)
                    rst += 1
                    preds = {ci: 0 for ci in cis}
                for ci in cis:
                    c = comps[ci]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            coef = grids[ci][my * c["vs"] + by, mx * c["hs"] + bx]
                            if ah == 0:
                                preds[ci] = enc_dc_first(
                                    sink, dc_tids[ci], coef, preds[ci], al)
                            else:
                                enc_dc_refine(sink, coef, al)
                mcu += 1
    else:
        ci = cis[0]
        c = comps[ci]
        bh, bw_ = comp_blocks(w, h, c, hmax, vmax)
        if ss == 0 and se == 0:
            pred = 0
            n = 0
            rst = 0
            for by in range(bh):
                for bx in range(bw_):
                    if restart and n and n % restart == 0:
                        sink.restart(rst)
                        rst += 1
                        pred = 0
                    coef = grids[ci][by, bx]
                    if ah == 0:
                        pred = enc_dc_first(sink, dc_tids[ci], coef, pred, al)
                    else:
                        enc_dc_refine(sink, coef, al)
                    n += 1
        else:
            st = AcState(sink, ac_tids[ci])
            n = 0
            rst = 0
            for by in range(bh):
                for bx in range(bw_):
                    if restart and n and n % restart == 0:
                        st.flush_eob()
                        sink.restart(rst)
                        rst += 1
                    coef = grids[ci][by, bx]
                    if ah == 0:
                        enc_ac_first(st, coef, ss, se, al)
                    else:
                        enc_ac_refine(st, coef, ss, se, al)
                    n += 1
            st.flush_eob()


# ------------------------------------------------------------- file writer
def encode_progressive(gray=None, rgb=None, subsampling="444", script=None,
                       restart=0):
    w, h, comps, mcux, mcuy, grids = plan_components(gray, rgb, subsampling)
    nc = len(comps)
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = bytes([QUANT_LUMA[ZIGZAG[i]] for i in range(64)])
    out += seg(0xDB, b"\x00" + zz_l)
    if nc == 3:
        zz_c = bytes([QUANT_CHROMA[ZIGZAG[i]] for i in range(64)])
        out += seg(0xDB, b"\x01" + zz_c)
    body = struct.pack(">BHHB", 8, h, w, nc)
    for c in comps:
        body += bytes([c["id"], (c["hs"] << 4) | c["vs"], c["tq"]])
    out += seg(0xC2, body)  # SOF2: progressive, Huffman
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    # table-slot assignment: luma 0, chroma 1 (rebuilt before every scan)
    dc_tids = [0] + [1] * (nc - 1)
    ac_tids = [0] + [1] * (nc - 1)
    for scan in script:
        cis, ss, se, ah, al = scan
        # pass 1: count symbols; pass 2: emit with per-scan flat tables
        cnt = SymbolCounter()
        run_scan(cnt, w, h, comps, mcux, mcuy, grids, scan, restart,
                 dc_tids, ac_tids)
        tables = {}
        is_dc = ss == 0 and se == 0
        for tid, freq in sorted(cnt.freq.items()):
            bits, vals = flat_table(freq.keys())
            cls = 0 if is_dc else 1
            out += seg(0xC4, bytes([(cls << 4) | tid] + bits) + bytes(vals))
            from jpeg_golden import huff_codes
            tables[tid] = huff_codes(bits, vals)
        if is_dc and ah == 0 and not cnt.freq:
            raise AssertionError("DC first scan emitted no symbols")
        sink = BitSink(tables)
        sos = bytes([len(cis)])
        for ci in cis:
            tt = (dc_tids[ci] << 4) | (0 if is_dc else ac_tids[ci])
            # refinement DC scans carry no Huffman table references that
            # matter, but the slots must still be in-range
            sos += bytes([comps[ci]["id"], tt])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        run_scan(sink, w, h, comps, mcux, mcuy, grids, scan, restart,
                 dc_tids, ac_tids)
        sink.bw.align()
        out += sink.bw.out
    out += b"\xff\xd9"
    return bytes(out), (w, h, comps, mcux, mcuy, grids)


# ----------------------------------------------- independent scan decoder
class PBitReader:
    """Entropy bit reader with FF00 unstuffing and RST awareness."""
    def __init__(self, d, p):
        self.d = d
        self.p = p
        self.acc = 0
        self.n = 0

    def align(self):
        self.acc = 0
        self.n = 0

    def expect_rst(self, idx):
        assert self.d[self.p] == 0xFF
        assert self.d[self.p + 1] == 0xD0 + (idx & 7), "restart marker"
        self.p += 2
        self.align()

    def bit(self):
        if self.n == 0:
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                assert self.d[self.p] == 0x00, "marker inside entropy data"
                self.p += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def dec_extend(v, s):
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_progressive_coeffs(data):
    """Independent progressive decoder: returns (w, h, comps, grids) of
    reconstructed quantized coefficients (natural order)."""
    from jpeg_golden import huff_decoder, read_huff
    assert data[:2] == b"\xff\xd8"
    p = 2
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart = 0
    grids = None
    comps = None
    w = h = mcux = mcuy = hmax = vmax = 0
    while True:
        assert data[p] == 0xFF
        m = data[p + 1]
        if m == 0xD9:
            break
        ln = struct.unpack(">H", data[p + 2:p + 4])[0]
        body = data[p + 4:p + 2 + ln]
        if m == 0xC4:
            q = 0
            while q < len(body):
                tc, th = body[q] >> 4, body[q] & 0x0F
                bits = list(body[q + 1:q + 17])
                nv = sum(bits)
                vals = list(body[q + 17:q + 17 + nv])
                t = huff_decoder(bits, vals)
                if tc == 0:
                    huff_dc[th] = t
                else:
                    huff_ac[th] = t
                q += 17 + nv
        elif m == 0xC2:
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append(dict(id=cid, hs=hv >> 4, vs=hv & 15, tq=tq))
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            grids = [np.zeros((mcuy * c["vs"], mcux * c["hs"], 64),
                              dtype=np.int64) for c in comps]
        elif m == 0xDD:
            restart = struct.unpack(">H", body)[0]
        elif m == 0xDA:
            ns = body[0]
            cis = []
            tids = {}
            for i in range(ns):
                cid, tt = body[1 + 2 * i:3 + 2 * i]
                ci = next(i2 for i2, c in enumerate(comps) if c["id"] == cid)
                cis.append(ci)
                tids[ci] = (tt >> 4, tt & 15)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            br = PBitReader(data, p + 2 + ln)
            decode_scan(br, w, h, comps, mcux, mcuy, grids, cis, tids,
                        ss, se, ah, al, restart, huff_dc, huff_ac)
            # resume at the next marker after the entropy segment
            q = br.p
            while not (data[q] == 0xFF and data[q + 1] != 0x00):
                q += 1
            p = q
            continue
        p = p + 2 + ln
    return w, h, comps, grids


def decode_scan(br, w, h, comps, mcux, mcuy, grids, cis, tids,
                ss, se, ah, al, restart, huff_dc, huff_ac):
    from jpeg_golden import read_huff
    if len(cis) > 1:
        assert ss == 0 and se == 0
        preds = {ci: 0 for ci in cis}
        mcu = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu and mcu % restart == 0:
                    br.align()
                    br.expect_rst(rst)
                    rst += 1
                    preds = {ci: 0 for ci in cis}
                for ci in cis:
                    c = comps[ci]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            coef = grids[ci][my * c["vs"] + by, mx * c["hs"] + bx]
                            if ah == 0:
                                s = read_huff(br, huff_dc[tids[ci][0]])
                                diff = dec_extend(br.bits(s), s) if s else 0
                                preds[ci] += diff
                                coef[0] = preds[ci] << al
                            else:
                                if br.bit():
                                    coef[0] |= 1 << al
                mcu += 1
        return
    ci = cis[0]
    c = comps[ci]
    hmax = max(cc["hs"] for cc in comps)
    vmax = max(cc["vs"] for cc in comps)
    bh, bw_ = comp_blocks(w, h, c, hmax, vmax)
    if ss == 0 and se == 0:
        pred = 0
        n = 0
        rst = 0
        for by in range(bh):
            for bx in range(bw_):
                if restart and n and n % restart == 0:
                    br.align()
                    br.expect_rst(rst)
                    rst += 1
                    pred = 0
                coef = grids[ci][by, bx]
                if ah == 0:
                    s = read_huff(br, huff_dc[tids[ci][0]])
                    diff = dec_extend(br.bits(s), s) if s else 0
                    pred += diff
                    coef[0] = pred << al
                else:
                    if br.bit():
                        coef[0] |= 1 << al
                n += 1
        return
    # AC scan
    act = huff_ac[tids[ci][1]]
    eobrun = 0
    n = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart and n and n % restart == 0:
                br.align()
                br.expect_rst(rst)
                rst += 1
                eobrun = 0
            coef = grids[ci][by, bx]
            if ah == 0:
                eobrun = dec_ac_first(br, act, coef, ss, se, al, eobrun)
            else:
                eobrun = dec_ac_refine(br, act, coef, ss, se, al, eobrun)
            n += 1
    assert eobrun == 0, "EOB run spilling past the last block"


def dec_ac_first(br, act, coef, ss, se, al, eobrun):
    from jpeg_golden import read_huff
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = read_huff(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                run = 1 << r
                if r:
                    run += br.bits(r)
                return run - 1
            k += 16
        else:
            k += r
            assert k <= se, "AC run past band end"
            coef[ZIGZAG[k]] = dec_extend(br.bits(s), s) << al
            k += 1
    return 0


def dec_ac_refine(br, act, coef, ss, se, al, eobrun):
    from jpeg_golden import read_huff
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = read_huff(br, act)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
            else:
                assert s == 1, "refinement magnitude must be 1"
                newval = p1 if br.bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    if br.bit():
                        if (coef[z] & p1) == 0:
                            coef[z] += p1 if coef[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                assert k <= se, "new coefficient past band end"
                coef[ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if coef[z] != 0:
                if br.bit():
                    if (coef[z] & p1) == 0:
                        coef[z] += p1 if coef[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------- scripts
# libjpeg's standard progression shape (jcparam.c): DC first with one
# held bit, luma AC split into two bands with two held bits, chroma AC
# with one held bit, then refinement scans down to Al=0.
SCRIPT_RGB = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
SCRIPT_GRAY = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]


def check_roundtrip(name, data, enc_state):
    """The independent decoder must reconstruct the encoder's grids
    exactly (covered blocks fully; MCU-pad blocks DC-only)."""
    w, h, comps_enc, mcux, mcuy, grids_enc = enc_state
    w2, h2, comps_dec, grids_dec = decode_progressive_coeffs(data)
    assert (w, h) == (w2, h2)
    hmax = max(c["hs"] for c in comps_enc)
    vmax = max(c["vs"] for c in comps_enc)
    for ci, c in enumerate(comps_enc):
        bh, bw_ = comp_blocks(w, h, c, hmax, vmax)
        ge, gd = grids_enc[ci], grids_dec[ci]
        for by in range(gd.shape[0]):
            for bx in range(gd.shape[1]):
                if by < bh and bx < bw_:
                    assert np.array_equal(ge[by, bx], gd[by, bx]), \
                        f"{name} comp{ci} block({by},{bx}) mismatch"
                else:
                    assert ge[by, bx][0] == gd[by, bx][0], \
                        f"{name} comp{ci} pad block({by},{bx}) DC mismatch"
                    assert not gd[by, bx][1:].any(), \
                        f"{name} comp{ci} pad block({by},{bx}) has AC"
    print(f"  {name}: coefficient roundtrip exact "
          f"({sum(g.size for g in grids_dec)} coefs)")


def main():
    os.makedirs(OUT, exist_ok=True)
    fixtures = [
        ("prog_gray_16x12",
         dict(gray=synth_gray(12, 16), script=SCRIPT_GRAY),
         dict(gray=synth_gray(12, 16))),
        ("prog_rgb444_12x10",
         dict(rgb=synth_rgb(10, 12, 1), subsampling="444", script=SCRIPT_RGB),
         dict(rgb=synth_rgb(10, 12, 1), subsampling="444")),
        ("prog_rgb420_21x13",
         dict(rgb=synth_rgb(13, 21, 2), subsampling="420", script=SCRIPT_RGB),
         dict(rgb=synth_rgb(13, 21, 2), subsampling="420")),
        ("prog_rgb422_19x11",
         dict(rgb=synth_rgb(11, 19, 4), subsampling="422", script=SCRIPT_RGB),
         dict(rgb=synth_rgb(11, 19, 4), subsampling="422")),
        ("prog_rgb420r_48x32",
         dict(rgb=synth_rgb(32, 48, 3), subsampling="420", script=SCRIPT_RGB,
              restart=2),
         dict(rgb=synth_rgb(32, 48, 3), subsampling="420", restart=1)),
    ]
    rows = {"name": [], "y": [], "x": [], "r": [], "g": [], "b": []}
    for name, penc, pbase in fixtures:
        data, enc_state = encode_progressive(**penc)
        with open(os.path.join(OUT, name + ".jpg"), "wb") as f:
            f.write(data)
        check_roundtrip(name, data, enc_state)
        # golden pixels: the baseline sibling carries the same
        # coefficients, decoded through the shared integer spec
        base = encode_jpeg(**pbase)
        h, w, nc, px = decode_jpeg(base)
        print(f"{name}: {w}x{h} comps={nc} progressive={len(data)}B "
              f"baseline={len(base)}B")
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


if __name__ == "__main__":
    main()
