#!/usr/bin/env python3
"""Arithmetic-JPEG (SOF9/SOF10) golden generator for JpegCodec.

Unlike the other JPEG goldens (whose encoders are from-scratch Python),
the arithmetic fixtures are encoded by libjpeg-turbo ITSELF through the
tools/jpeg_arith_ref.c harness — libjpeg is the de-facto reference
implementation of ITU-T T.81 arithmetic coding, and virtually every
arithmetic JPEG in a real crawl was produced by it. The expected
pixels are computed from the exact quantized DCT coefficients that
libjpeg's OWN entropy decoder reports for each fixture
(jpeg_read_coefficients via the harness `coef` mode), pushed through
the repo's shared integer decode spec (dequantize, 14-bit fixed-point
IDCT, replicate upsample, fixed-point YCbCr->RGB — imported from
jpeg_golden.py). Nothing in this pipeline shares a line of code with
the Scala QM decoder, so q_jpeg_arith grades JpegCodec's SOF9/SOF10
paths end-to-end against an independent implementation: every
arithmetic decision — Qe state transitions, conditional exchange,
byte-unstuffing, DAC conditioning, restart re-init, progressive
refinement — must invert libjpeg's encoder exactly or the hash flips.

Coverage: sequential gray / 4:4:4 / 4:2:0 / 4:2:2, odd dimensions,
DRI/RSTn restart re-init, non-default DAC conditioning (L/U/Kx), and
progressive (the libjpeg simple-progression script: interleaved DC
first with Al=1, per-band AC first scans, DC and AC refinement scans),
progressive with restarts.

Outputs:
  tools/fixtures/q_jpeg_arith/*.jpg
  tools/fixtures/q_jpeg_arith/golden/expected.parquet

Requires gcc + libjpeg-dev (compiles the harness into a temp dir).
Run from the repo root: python3 tools/jpeg_arith_golden.py
"""
import os
import struct
import subprocess
import tempfile

import numpy as np

from jpeg_golden import ZIGZAG, IDCT_T, idct_block, synth_gray, synth_rgb

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures", "q_jpeg_arith")


# ------------------------------------------------------------- harness
def build_harness(tmp):
    exe = os.path.join(tmp, "jpeg_arith_ref")
    subprocess.run(
        ["gcc", "-O2", "-o", exe, os.path.join(HERE, "jpeg_arith_ref.c"),
         "-ljpeg"], check=True)
    return exe


def write_pnm(path, img):
    if img.ndim == 2:
        h, w = img.shape
        with open(path, "wb") as f:
            f.write(b"P5\n%d %d\n255\n" % (w, h))
            f.write(bytes(int(v) for v in img.reshape(-1)))
    else:
        h, w, _ = img.shape
        with open(path, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (w, h))
            f.write(bytes(int(v) for v in img.reshape(-1)))


def coef_dump(exe, jpg):
    """Parse the harness coef mode: list of components with sampling
    factors, block-grid dims and natural-order coefficient blocks."""
    out = subprocess.run([exe, "coef", jpg], check=True,
                         capture_output=True, text=True).stdout
    comps = []
    cur = None
    for line in out.splitlines():
        p = line.split()
        if p[0] == "comp":
            cur = dict(h=int(p[2]), v=int(p[3]), wb=int(p[4]), hb=int(p[5]),
                       blocks={})
            comps.append(cur)
        elif p[0] == "block":
            cur["blocks"][(int(p[1]), int(p[2]))] = [int(x) for x in p[3:]]
    return comps


def parse_tables(jpg):
    """DQT tables (natural order) and per-component tq from the file."""
    d = open(jpg, "rb").read()
    assert d[0] == 0xFF and d[1] == 0xD8
    p = 2
    quant = {}
    tqs = None
    w = h = None
    while p + 3 < len(d):
        assert d[p] == 0xFF
        m = d[p + 1]
        if m == 0xD9:
            break
        ln = struct.unpack(">H", d[p + 2:p + 4])[0]
        body = d[p + 4:p + 2 + ln]
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
        elif m in (0xC9, 0xCA):
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            nc = body[5]
            tqs = [body[6 + 3 * i + 2] for i in range(nc)]
        elif m == 0xDA:
            break
        p += 2 + ln
    return quant, tqs, w, h


def expected_pixels(exe, jpg):
    """Shared-integer-spec pixels from libjpeg's own coefficient decode."""
    comps = coef_dump(exe, jpg)
    quant, tqs, w, h = parse_tables(jpg)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        q = quant[tqs[ci]]
        plane = np.zeros((c["hb"] * 8, c["wb"] * 8), dtype=np.int64)
        for (by, bx), coefs in c["blocks"].items():
            F = [[coefs[v * 8 + u] * q[v * 8 + u] for u in range(8)]
                 for v in range(8)]
            blk = idct_block(F)
            for yy in range(8):
                for xx in range(8):
                    plane[by * 8 + yy][bx * 8 + xx] = blk[yy][xx]
        planes.append(plane)
    out = np.zeros((h, w, 3), dtype=np.int64)
    if len(comps) == 1:
        for y in range(h):
            for x in range(w):
                out[y, x, :] = planes[0][y][x]
    else:
        clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)
        for y in range(h):
            for x in range(w):
                yv = int(planes[0][y // (vmax // comps[0]["v"])]
                         [x // (hmax // comps[0]["h"])])
                cb = int(planes[1][y // (vmax // comps[1]["v"])]
                         [x // (hmax // comps[1]["h"])]) - 128
                cr = int(planes[2][y // (vmax // comps[2]["v"])]
                         [x // (hmax // comps[2]["h"])]) - 128
                out[y, x, 0] = clamp(yv + ((91881 * cr + 32768) >> 16))
                out[y, x, 1] = clamp(yv - ((22554 * cb + 46802 * cr + 32768)
                                           >> 16))
                out[y, x, 2] = clamp(yv + ((116130 * cb + 32768) >> 16))
    return out


# ------------------------------------------------------------- fixtures
# name, (gray|rgb, h, w, seed), quality, subsampling, restart,
# progressive, conditioning (dcL, dcU, acKx) or None
FIXTURES = [
    ("arith-seq-gray-01", ("gray", 17, 23, 0), 75, "gray", 0, 0, None),
    ("arith-seq-444-02", ("rgb", 14, 20, 3), 90, "444", 0, 0, None),
    ("arith-seq-420-03", ("rgb", 29, 35, 7), 80, "420", 0, 0, None),
    ("arith-seq-420-rst-04", ("rgb", 29, 35, 11), 75, "420", 2, 0, None),
    ("arith-seq-cond-05", ("gray", 18, 24, 0), 60, "gray", 0, 0, (0, 3, 12)),
    ("arith-seq-422-06", ("rgb", 13, 21, 19), 85, "422", 0, 0, None),
    ("arith-prog-gray-07", ("gray", 16, 24, 0), 75, "gray", 0, 1, None),
    ("arith-prog-420-08", ("rgb", 25, 33, 23), 85, "420", 0, 1, None),
    ("arith-prog-444-rst-09", ("rgb", 16, 16, 29), 90, "444", 2, 1, None),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    gdir = os.path.join(OUT, "golden")
    os.makedirs(gdir, exist_ok=True)
    rows = dict(name=[], y=[], x=[], r=[], g=[], b=[])
    with tempfile.TemporaryDirectory() as tmp:
        exe = build_harness(tmp)
        for (name, spec, q, sub, rst, prog, cond) in FIXTURES:
            kind, h, w = spec[0], spec[1], spec[2]
            if kind == "gray":
                img = synth_gray(h, w)
            else:
                img = synth_rgb(h, w, spec[3])
            pnm = os.path.join(tmp, name + (".pgm" if kind == "gray"
                                            else ".ppm"))
            write_pnm(pnm, img)
            jpg = os.path.join(OUT, name + ".jpg")
            args = [exe, "encode", pnm, jpg, str(q), sub, str(rst),
                    str(prog)]
            if cond is not None:
                args += [str(cond[0]), str(cond[1]), str(cond[2])]
            subprocess.run(args, check=True)
            px = expected_pixels(exe, jpg)
            for y in range(px.shape[0]):
                for x in range(px.shape[1]):
                    rows["name"].append(name)
                    rows["y"].append(y)
                    rows["x"].append(x)
                    rows["r"].append(int(px[y, x, 0]))
                    rows["g"].append(int(px[y, x, 1]))
                    rows["b"].append(int(px[y, x, 2]))
            print("%-24s %dx%d  %6d bytes  %5d px" %
                  (name, w, h, os.path.getsize(jpg), px.shape[0] * px.shape[1]))
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "name": pa.array(rows["name"], pa.string()),
        "y": pa.array(rows["y"], pa.int32()),
        "x": pa.array(rows["x"], pa.int32()),
        "r": pa.array(rows["r"], pa.int32()),
        "g": pa.array(rows["g"], pa.int32()),
        "b": pa.array(rows["b"], pa.int32()),
    })
    pq.write_table(t, os.path.join(gdir, "expected.parquet"))
    print("golden rows:", t.num_rows)


if __name__ == "__main__":
    main()
