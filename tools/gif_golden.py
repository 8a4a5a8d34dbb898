#!/usr/bin/env python3
"""Foreign-fixture writer for the GIF scan (q_gif_decode) — files are
assembled by a from-scratch GIF89a/87a ENCODER written here against
the public spec (variable-width LSB-first LZW with the standard
early-grow rule, 255-byte sub-blocks, interlace passes, local color
tables, extension blocks), NOT by any imaging library and never by the
engine under test; the golden parquet is computed from the palette
indices used to ENCODE. GIF is still everywhere in web crawls — a
LAION-style pipeline skips-or-decodes it daily.

Layout written under tools/fixtures/q_gif_decode/:
  anim-00.gif      GIF89a, global 8-color palette, TWO frames: full
                   10x8, then an offset 5x4 rect with a graphics-
                   control extension before it
  interlace-01.gif GIF87a, one 16x16 INTERLACED frame, 4-color palette
  local-02.gif     frame with a LOCAL color table overriding the
                   global one; comment + application extensions to
                   skip on the way
  stress-03.gif    128x96 pseudo-random 8-color frame — the LZW
                   dictionary fills to 4096 and the encoder emits a
                   mid-stream CLEAR (the deferred-reset path)
  corrupt-04.gif   truncated mid-sub-block -> file refused
  badcode-05.gif   LZW code beyond the dictionary -> file refused
The two bad files' ABSENCE from the golden is itself graded.
"""
import os, struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_gif_decode")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, frame, y, x, r, g, b)


def lzw_encode(indices, min_code_size):
    """Standard GIF LZW: emits (code, width) pairs -> LSB-first bytes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    cs = min_code_size + 1
    put(clear, cs)
    w = b""
    for c in indices:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        put(table[w], cs)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << cs) + 1 and cs < 12:
                cs += 1
        else:
            # dictionary full: reset mid-stream (the deferred-clear path)
            put(clear, cs)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            cs = min_code_size + 1
        w = bytes([c])
    if w:
        put(table[w], cs)
        # the decoder adds an entry after this final code and may grow
        # the width before reading END -- mirror it (same fix as the
        # Scala encoder; streams ending on the 2^cs boundary need it)
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << cs) + 1 and cs < 12:
                cs += 1
    put(end, cs)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def sub_blocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def interlace_order(h):
    rows = []
    for start, step in INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def frame_block(left, top, w, h, indices, min_code, interlaced=False,
                local_palette=None):
    packed = 0
    if local_palette is not None:
        bits = max(1, (len(local_palette) - 1).bit_length())
        packed |= 0x80 | (bits - 1)
    if interlaced:
        packed |= 0x40
    out = bytearray(struct.pack("<BHHHHB", 0x2C, left, top, w, h, packed))
    if local_palette is not None:
        n = 1 << max(1, (len(local_palette) - 1).bit_length())
        for i in range(n):
            out += bytes(local_palette[i] if i < len(local_palette) else (0, 0, 0))
    order = interlace_order(h) if interlaced else range(h)
    stream = []
    for y in order:
        stream.extend(indices[y * w:(y + 1) * w])
    out.append(min_code)
    out += sub_blocks(lzw_encode(bytes(stream), min_code))
    return bytes(out)


def gif(version, width, height, palette, blocks):
    bits = max(1, (len(palette) - 1).bit_length())
    n = 1 << bits
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    for i in range(n):
        out += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    for b in blocks:
        out += b
    out.append(0x3B)
    return bytes(out)


def emit(fname, frame, left, top, w, h, indices, palette):
    for y in range(h):
        for x in range(w):
            r, g, b = palette[indices[y * w + x]]
            ROWS.append((fname, frame, top + y, left + x, r, g, b))


PAL8 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255),
        (255, 255, 0), (0, 255, 255), (255, 0, 255), (255, 255, 255)]
PAL4 = [(10, 20, 30), (200, 100, 50), (0, 128, 255), (255, 255, 255)]

# ---- anim-00.gif
f0 = bytes((x * 3 + y * 5) % 8 for y in range(8) for x in range(10))
f1 = bytes((x + y) % 8 for y in range(4) for x in range(5))
gce = bytes([0x21, 0xF9, 0x04, 0x04, 0x0A, 0x00, 0x00, 0x00])  # delay 10cs
with open(os.path.join(D, "anim-00.gif"), "wb") as fh:
    fh.write(gif(b"89a", 10, 8, PAL8, [
        frame_block(0, 0, 10, 8, f0, 3),
        gce,
        frame_block(2, 1, 5, 4, f1, 3),
    ]))
emit("anim-00.gif", 0, 0, 0, 10, 8, f0, PAL8)
emit("anim-00.gif", 1, 2, 1, 5, 4, f1, PAL8)

# ---- interlace-01.gif
fi = bytes((x * x + 7 * y) % 4 for y in range(16) for x in range(16))
with open(os.path.join(D, "interlace-01.gif"), "wb") as fh:
    fh.write(gif(b"87a", 16, 16, PAL4,
                 [frame_block(0, 0, 16, 16, fi, 2, interlaced=True)]))
emit("interlace-01.gif", 0, 0, 0, 16, 16, fi, PAL4)

# ---- local-02.gif: local palette wins; extensions skipped
LOCAL = [(1, 2, 3), (250, 240, 230), (9, 99, 199), (77, 66, 55),
         (128, 0, 128), (0, 0, 1)]
fl = bytes((x * y + x + y) % 6 for y in range(6) for x in range(7))
comment = bytes([0x21, 0xFE]) + sub_blocks(b"made by gif_golden.py")
app = bytes([0x21, 0xFF]) + sub_blocks(b"NETSCAPE2.0\x01\x00\x00")
with open(os.path.join(D, "local-02.gif"), "wb") as fh:
    fh.write(gif(b"89a", 7, 6, PAL4, [
        comment, app,
        frame_block(0, 0, 7, 6, fl, 3, local_palette=LOCAL),
    ]))
emit("local-02.gif", 0, 0, 0, 7, 6, fl, LOCAL)

# ---- stress-03.gif: fills the dictionary, forces a mid-stream clear
state = 12345
pix = bytearray()
for _ in range(128 * 96):
    state = (state * 1103515245 + 12345) & 0x7FFFFFFF
    pix.append((state >> 16) % 8)
fs = bytes(pix)
with open(os.path.join(D, "stress-03.gif"), "wb") as fh:
    fh.write(gif(b"89a", 128, 96, PAL8, [frame_block(0, 0, 128, 96, fs, 3)]))
emit("stress-03.gif", 0, 0, 0, 128, 96, fs, PAL8)

# ---- refusal fixtures
with open(os.path.join(D, "anim-00.gif"), "rb") as fh:
    good = fh.read()
with open(os.path.join(D, "corrupt-04.gif"), "wb") as fh:
    fh.write(good[:len(good) // 2])

# a structurally valid frame whose FIRST code after clear is out of range
bad_payload = sub_blocks(bytes([0b11111000, 0b1]))  # clear(8) then code 15>9
bad = bytearray(gif(b"89a", 3, 2, PAL8, []))
bad = bad[:-1]  # drop trailer
bad += struct.pack("<BHHHHB", 0x2C, 0, 0, 3, 2, 0)
bad.append(3)
bad += bad_payload
bad.append(0x3B)
with open(os.path.join(D, "badcode-05.gif"), "wb") as fh:
    fh.write(bytes(bad))

schema = pa.schema([
    ("file", pa.string()), ("frame", pa.int32()), ("y", pa.int32()),
    ("x", pa.int32()), ("r", pa.int32()), ("g", pa.int32()),
    ("b", pa.int32()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")

# ===== q_gif_frames: composited animation canvases =====
# Web-corpus GIFs are predominantly ANIMATED, and per-frame rects are
# deltas, not images: what a vision pipeline samples is the full
# canvas after the graphic-control extension's disposal state machine
# (none / do-not-dispose / restore-to-background / restore-to-
# previous) and transparency. The golden is computed by the
# INDEPENDENT compositor below over the palette indices used to
# encode — never by the engine under test. Restore-to-background
# restores to TRANSPARENT (the universal web-decoder consensus; the
# 89a background-COLOR wording predates transparency).
DF = os.path.join(BASE, "q_gif_frames")
os.makedirs(os.path.join(DF, "golden"), exist_ok=True)
FROWS = []  # (file, frame, y, x, r, g, b, a)


def gce(disposal, transp=None):
    packed = (disposal << 2) | (1 if transp is not None else 0)
    return bytes([0x21, 0xF9, 0x04, packed, 0x0A, 0x00,
                  transp if transp is not None else 0, 0x00])


def composite_golden(fname, sw, sh, frames):
    """frames: (left, top, w, h, indices, palette, disposal, transp)"""
    canvas = [[None] * sw for _ in range(sh)]  # None = transparent
    for fi, (left, top, w, h, idx, pal, disposal, transp) in \
            enumerate(frames):
        before = [row[:] for row in canvas] if disposal == 3 else None
        for y in range(h):
            for x in range(w):
                ci = idx[y * w + x]
                if ci != transp:
                    canvas[top + y][left + x] = pal[ci]
        for y in range(sh):
            for x in range(sw):
                px = canvas[y][x]
                if px is None:
                    FROWS.append((fname, fi, y, x, 0, 0, 0, 0))
                else:
                    FROWS.append((fname, fi, y, x,
                                  px[0], px[1], px[2], 255))
        if disposal == 2:
            for y in range(h):
                for x in range(w):
                    canvas[top + y][left + x] = None
        elif disposal == 3:
            canvas = before


# dispose-00: none + transparency-over-base + restore-to-background.
# frame0 full canvas (no GCE); frame1 do-not-dispose rect whose
# index-3 pixels are TRANSPARENT (base shows through); frame2
# restore-to-BACKGROUND rect (visible in its own snapshot, the rect
# transparent afterwards); frame3 paints elsewhere over the hole.
d0f0 = bytes((x * 5 + y * 3) % 8 for y in range(8) for x in range(10))
d0f1 = bytes((x + 2 * y) % 5 for y in range(4) for x in range(5))
d0f2 = bytes((x * y + 6) % 8 for y in range(3) for x in range(3))
d0f3 = bytes((x * 7 + 1) % 8 for y in range(2) for x in range(4))
with open(os.path.join(DF, "dispose-00.gif"), "wb") as fh:
    fh.write(gif(b"89a", 10, 8, PAL8, [
        frame_block(0, 0, 10, 8, d0f0, 3),
        gce(1, transp=3), frame_block(2, 1, 5, 4, d0f1, 3),
        gce(2), frame_block(6, 4, 3, 3, d0f2, 3),
        frame_block(0, 6, 4, 2, d0f3, 3),
    ]))
composite_golden("dispose-00.gif", 10, 8, [
    (0, 0, 10, 8, d0f0, PAL8, 0, None),
    (2, 1, 5, 4, d0f1, PAL8, 1, 3),
    (6, 4, 3, 3, d0f2, PAL8, 2, None),
    (0, 6, 4, 2, d0f3, PAL8, 0, None),
])

# dispose-01: restore-to-PREVIOUS — frame1's rect must vanish from
# frame2's base; frame1 also carries transparency (index 0).
d1f0 = bytes((x * 2 + y) % 8 for y in range(6) for x in range(8))
d1f1 = bytes((x * 3 + y * 5) % 4 for y in range(4) for x in range(4))
d1f2 = bytes((x + y + 2) % 8 for y in range(2) for x in range(2))
with open(os.path.join(DF, "dispose-01.gif"), "wb") as fh:
    fh.write(gif(b"89a", 8, 6, PAL8, [
        frame_block(0, 0, 8, 6, d1f0, 3),
        gce(3, transp=0), frame_block(3, 2, 4, 4, d1f1, 3),
        gce(1), frame_block(0, 0, 2, 2, d1f2, 3),
    ]))
composite_golden("dispose-01.gif", 8, 6, [
    (0, 0, 8, 6, d1f0, PAL8, 0, None),
    (3, 2, 4, 4, d1f1, PAL8, 3, 0),
    (0, 0, 2, 2, d1f2, PAL8, 1, None),
])

# dispose-02: partial FIRST frame (alpha-0 border survives into every
# snapshot) + an INTERLACED local-palette second frame.
d2f0 = bytes((x * x + y) % 4 for y in range(5) for x in range(6))
d2f1 = bytes((x * 7 + y * y) % 6 for y in range(8) for x in range(8))
with open(os.path.join(DF, "dispose-02.gif"), "wb") as fh:
    fh.write(gif(b"89a", 12, 9, PAL4, [
        gce(1), frame_block(3, 2, 6, 5, d2f0, 2),
        gce(1), frame_block(2, 0, 8, 8, d2f1, 3, interlaced=True,
                            local_palette=LOCAL),
    ]))
composite_golden("dispose-02.gif", 12, 9, [
    (3, 2, 6, 5, d2f0, PAL4, 1, None),
    (2, 0, 8, 8, d2f1, LOCAL, 1, None),
])

# offscreen-03: a frame rect past the logical screen — the composite
# path refuses the WHOLE file; its absence from the golden is graded.
with open(os.path.join(DF, "offscreen-03.gif"), "wb") as fh:
    fh.write(gif(b"89a", 6, 4, PAL8, [
        frame_block(4, 2, 5, 3, bytes((x + y) % 8
                                      for y in range(3)
                                      for x in range(5)), 3),
    ]))

fschema = pa.schema([
    ("file", pa.string()), ("frame", pa.int32()), ("y", pa.int32()),
    ("x", pa.int32()), ("r", pa.int32()), ("g", pa.int32()),
    ("b", pa.int32()), ("a", pa.int32()),
])
ftbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in fschema], r)) for r in FROWS],
    schema=fschema)
pq.write_table(ftbl, os.path.join(DF, "golden", "expected.parquet"))
print(f"wrote {len(FROWS)} composited golden rows across "
      f"{len(set(r[0] for r in FROWS))} graded files")
