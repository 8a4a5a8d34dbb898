#!/usr/bin/env python3
"""Golden-fixture generator for the LZW/multi-band/typed TIFF decoder.

Independent Python implementation of the PUBLIC TIFF 6.0 spec (Adobe,
1992): baseline IFD writer + LZW compressor (section 13: 9->12 bit
MSB-first codes, ClearCode=256, EOI=257, EARLY code-width change) +
horizontal-differencing predictor (section 14). Written from the spec
text, sharing no code with the Scala decoder it cross-checks — the
same role numpy's np.save plays for NpyCodecSpec.

Prints Scala Array[Int] literals to paste into MultimodalSpec.
"""
import struct
import zlib


def lzw_compress(data: bytes) -> bytes:
    # TIFF-variant LZW: emit Clear first, early change at 511/1023/2047
    out_bits = []  # list of (code, width)
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((CLEAR, width))
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w = w + c
            continue
        out_bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        # early change: writer bumps width when next_code reaches
        # (1<<width)-1, i.e. 511, 1023, 2047
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table full: emit Clear, reset
            out_bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        out_bits.append((table[w], width))
        # the decoder adds a table entry when it processes this final
        # code, so count that phantom add before choosing EOI's width
        # (otherwise a stream ending exactly on the 510/1022/2046
        # boundary desyncs on the EOI read)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    out_bits.append((EOI, width))
    # pack MSB-first
    acc = 0
    nbits = 0
    out = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def predict2(row_samples, spp):
    # horizontal differencing per channel, in sample space
    out = list(row_samples)
    for i in range(len(out) - 1, spp - 1, -1):
        out[i] = (out[i] - out[i - spp])
    return out


def pack_samples(samples, bits, fmt, le=True):
    e = "<" if le else ">"
    if bits == 8:
        code = "B" if fmt == 1 else "b"
        mask = 0xFF
    elif bits == 16:
        code = "H" if fmt == 1 else "h"
        mask = 0xFFFF
    elif bits == 32 and fmt == 3:
        return b"".join(struct.pack(e + "f", s) for s in samples)
    else:
        code = "I" if fmt == 1 else "i"
        mask = 0xFFFFFFFF
    out = bytearray()
    for s in samples:
        if fmt == 1:
            s &= mask
        else:  # wrap differences into signed range
            half = 1 << (bits - 1)
            s = ((s + half) & mask) - half
        out += struct.pack(e + code, s)
    return bytes(out)


def write_tiff(w, h, spp, bits, fmt, samples, compress_lzw, predictor,
               rows_per_strip, le=True):
    """samples: row-major interleaved, len == w*h*spp.
    compress_lzw: False (none) / True or 'lzw' / 'deflate' (zlib,
    TIFF Compression=8 — what GDAL's COMPRESS=DEFLATE writes)."""
    e = "<" if le else ">"
    strips = []
    r = 0
    while r < h:
        rows = min(rows_per_strip, h - r)
        strip_samples = samples[r * w * spp:(r + rows) * w * spp]
        if predictor == 2:
            rows_out = []
            for rr in range(rows):
                rows_out += predict2(strip_samples[rr * w * spp:(rr + 1) * w * spp], spp)
            strip_samples = rows_out
        raw = pack_samples(strip_samples, bits, fmt, le)
        if compress_lzw == 'deflate':
            strips.append(zlib.compress(raw))
        elif compress_lzw:
            strips.append(lzw_compress(raw))
        else:
            strips.append(raw)
        r += rows
    n_strips = len(strips)

    tags = []  # (tag, type, count, value_or_bytes)
    def short_arr(vals):
        return struct.pack(e + f"{len(vals)}H", *vals)
    def long_arr(vals):
        return struct.pack(e + f"{len(vals)}I", *vals)

    # layout: header(8) + IFD + external value arrays + strip data
    entries = [
        (256, 3, 1, w), (257, 3, 1, h),
        (258, 3, spp, None),                 # BitsPerSample
        (259, 3, 1, 8 if compress_lzw == 'deflate' else (5 if compress_lzw else 1)),
        (262, 3, 1, 1),                      # photometric (BlackIsZero)
        (273, 4, n_strips, None),            # StripOffsets
        (277, 3, 1, spp),
        (278, 3, 1, rows_per_strip),
        (279, 4, n_strips, None),            # StripByteCounts
        (284, 3, 1, 1),                      # chunky
        (317, 3, 1, predictor),
        (339, 3, spp, None),                 # SampleFormat
    ]
    n = len(entries)
    ifd_off = 8
    ext_off = ifd_off + 2 + n * 12 + 4
    ext = bytearray()

    def place(data_bytes):
        nonlocal ext
        off = ext_off + len(ext)
        ext += data_bytes
        if len(ext) % 2:
            ext += b"\0"
        return off

    bits_arr = [bits] * spp
    fmt_arr = [fmt] * spp
    pre = {}
    if spp * 2 > 4:
        pre[258] = place(short_arr(bits_arr))
        pre[339] = place(short_arr(fmt_arr))
    strip_data_off = ext_off + len(ext) \
        + (0 if spp * 2 > 4 else 0)
    # strip offset/count arrays may themselves live in ext when n>1
    counts = [len(s) for s in strips]
    # reserve arrays first (sizes known), then strip payloads
    if n_strips > 1:
        pre[273] = place(long_arr([0] * n_strips))  # patch later
        pre[279] = place(long_arr(counts))
    data_start = ext_off + len(ext)
    offsets = []
    pos = data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s) + (len(s) % 2)
    if n_strips > 1:
        # patch offsets array
        rel = pre[273] - ext_off
        ext[rel:rel + 4 * n_strips] = long_arr(offsets)

    out = bytearray()
    out += (b"II" + struct.pack("<H", 42) + struct.pack("<I", ifd_off)) if le \
        else (b"MM" + struct.pack(">H", 42) + struct.pack(">I", ifd_off))
    out += struct.pack(e + "H", n)
    for (tag, typ, cnt, val) in sorted(entries):
        out += struct.pack(e + "HHI", tag, typ, cnt)
        if val is None:
            if cnt * (2 if typ == 3 else 4) <= 4:
                if tag == 258:
                    packed = short_arr(bits_arr)
                elif tag == 339:
                    packed = short_arr(fmt_arr)
                elif tag == 273:
                    packed = long_arr(offsets)
                else:
                    packed = long_arr(counts)
                out += packed + b"\0" * (4 - len(packed))
            else:
                out += struct.pack(e + "I", pre[tag])
        elif typ == 3:
            out += struct.pack(e + "HH", val, 0)
        else:
            out += struct.pack(e + "I", val)
    out += struct.pack(e + "I", 0)  # next IFD
    out += ext
    for s in strips:
        out += s + (b"\0" if len(s) % 2 else b"")
    return bytes(out)


def scala_lit(name, b):
    ints = ", ".join(str(x if x < 128 else x - 256) for x in b)
    print(f"  // {len(b)} bytes")
    print(f"  private val {name}: Array[Byte] = Array[Int](\n    {ints}).map(_.toByte)\n")


if __name__ == "__main__":
    # Fixture 1: 4x3, 2-band int16, LZW + predictor 2, little-endian,
    # 2 rows per strip (multi-strip). Values chosen to exercise
    # negatives and per-channel differencing.
    w, h, spp = 4, 3, 2
    f1 = []
    for y in range(h):
        for x in range(w):
            f1 += [x * 100 - 150 + y, -(x + y) * 37]
    t1 = write_tiff(w, h, spp, 16, 2, f1, True, 2, 2, le=True)
    scala_lit("goldenLzwI16", t1)
    print("  // expected:", f1)

    # Fixture 2: 5x2 single-band float32, LZW, no predictor, BIG-endian
    f2 = [1.5, -2.25, 0.0, 3e5, -0.125, 7.0, 42.5, -1e3, 0.5, 9.75]
    t2 = write_tiff(5, 2, 1, 32, 3, f2, True, 1, 2, le=False)
    scala_lit("goldenLzwF32be", t2)
    print("  // expected:", f2)

    # Fixture 3: 6x4 single-band uint8 LZW predictor 2 with a highly
    # repetitive payload (LZW actually builds multi-byte table entries)
    f3 = [(x * 3 + y) % 11 for y in range(4) for x in range(6)]
    t3 = write_tiff(6, 4, 1, 8, 1, f3, True, 2, 4, le=True)
    scala_lit("goldenLzwU8", t3)
    print("  // expected:", f3)

    # Fixture 4: 30x20 u8 LCG noise, LZW no predictor — incompressible,
    # so the code stream CROSSES the 9->10-bit early-change boundary
    # (the classic desync point; smaller fixtures never reach it)
    seed = 12345
    f4 = []
    for _ in range(600):
        seed = (seed * 1103515245 + 12345) & 0x7FFFFFFF
        f4.append((seed >> 16) & 0xFF)
    t4 = write_tiff(30, 20, 1, 8, 1, f4, True, 1, 20, le=True)
    scala_lit("goldenLzwWide", t4)
    print("  // expected: LCG(12345) >> 16 & 0xFF x600; sum =", sum(f4))

    # Fixture 5: 5x4 3-band uint16 DEFLATE + predictor 2 — compressed by
    # Python zlib (an EXTERNAL compressor, real ground truth), external
    # BitsPerSample/SampleFormat arrays (3 shorts > 4 inline bytes)
    f5 = [((x + 1) * (y + 2) * (b + 3) * 997) % 60001
          for y in range(4) for x in range(5) for b in range(3)]
    t5 = write_tiff(5, 4, 3, 16, 1, f5, 'deflate', 2, 2, le=True)
    scala_lit("goldenDeflateU16", t5)
    print("  // expected:", f5)

    # self-check: decode every LZW strip with the validated decoder rule
    # (decoder bumps width at next_code == (1<<w)-2) and compare
    def lzw_decode(data):
        pos = 0; acc = 0; nbits = 0
        def read(width):
            nonlocal pos, acc, nbits
            while nbits < width:
                if pos >= len(data): return -1
                acc = (acc << 8) | data[pos]; pos += 1; nbits += 8
            v = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            return v
        table = {i: bytes([i]) for i in range(256)}
        next_code = 258; width = 9
        out = bytearray(); prev = None
        while True:
            c = read(width)
            if c < 0: return None
            if c == 257: break
            if c == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258; width = 9; prev = None
                continue
            if prev is None:
                out += table[c]; prev = c; continue
            s = table[c] if c in table else table[prev] + table[prev][:1]
            out += s
            table[next_code] = table[prev] + s[:1]
            next_code += 1
            if next_code == (1 << width) - 2 and width < 12:
                width += 1
            prev = c
        return bytes(out)
    for name, payload in (("f4-raw", bytes(f4)),):
        rt = lzw_decode(lzw_compress(payload))
        assert rt == payload, f"self-check failed for {name}"
    print("  // self-check: LZW round-trip across the 9->10 boundary OK")
