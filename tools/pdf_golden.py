#!/usr/bin/env python3
"""Foreign-fixture writer for the PDF text scan (q_pdf_text) — PDF is
the dominant document format in crawled document corpora, and "extract
the text runs" is the first operator every document pipeline runs.
Files are assembled by a from-scratch PDF 1.4 writer against the
public spec (ISO 32000: classic cross-reference tables, indirect
objects, the page tree, content streams with BT/ET text blocks,
literal strings with escapes and octal, hex strings, TJ kerning
arrays, FlateDecode via zlib), NOT by any PDF library; the golden
parquet is computed from the text runs used to WRITE.

The graded contract is deliberately layout-free: one row per shown
STRING RUN (Tj / ' / " / each string element of TJ) in content-stream
order — deterministic, honest about what a corpus pipeline consumes,
and independent of font metrics.

Layout written under tools/fixtures/q_pdf_text/:
  doc-00.pdf  two pages, uncompressed content: Tj with escape
              sequences (parens, backslash, octal), a TJ kerning
              array, the ' (move-and-show) operator
  doc-01.pdf  FlateDecode content stream, hex strings (odd-length
              final nibble), an INDIRECT /Length, comments in the
              body, a /Contents ARRAY split mid-stream
  doc-02.pdf  an incremental-update chain: a second xref section
              with /Prev pointing at the first (the shape every
              edited PDF has); page 0's content is REPLACED by the
              update and only the new text is truth
  bad-03.pdf  startxref pointing past EOF -> whole-file refusal
  bad-04.pdf  xref-STREAM PDF (out of the documented envelope) ->
              whole-file refusal
  (xrefstm-05 .. encmodern-14: xref streams, ObjStm, hybrid files,
   RC4/AES empty-password encryption, ToUnicode CMaps — see each
   section)
  diff-15.pdf simple-font /Encoding: WinAnsi/MacRoman/Standard base
              tables + /Differences glyph-name remaps (AGL names and
              uniXXXX/uXXXXXX forms), ToUnicode precedence
  macexp-16.pdf the fourth Annex D base encoding, /MacExpertEncoding:
              oldstyle figures, small caps, superiors/inferiors,
              fractions, f-ligatures, undefined-code FFFD gaps,
              whitespace passthrough, dict form + Differences overlay
The two bad files' ABSENCE from the golden is itself graded.
"""
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_pdf_text")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, page, run, text)


class PdfBuilder:
    def __init__(self):
        self.objs = {}  # num -> bytes (body, without "n 0 obj")

    def add(self, num, body):
        self.objs[num] = body.encode("latin-1") if isinstance(body, str) \
            else body

    def build(self, extra_tail=None, trailer_extra=""):
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = {}
        for num in sorted(self.objs):
            offsets[num] = len(out)
            out += b"%d 0 obj\n" % num
            out += self.objs[num]
            out += b"\nendobj\n"
        xref_at = len(out)
        maxn = max(self.objs)
        out += b"xref\n0 %d\n" % (maxn + 1)
        out += b"0000000000 65535 f \n"
        for n in range(1, maxn + 1):
            if n in offsets:
                out += b"%010d 00000 n \n" % offsets[n]
            else:
                out += b"0000000000 65535 f \n"
        out += b"trailer\n<< /Size %d /Root 1 0 R%s >>\n" % (
            maxn + 1, trailer_extra.encode("latin-1"))
        out += b"startxref\n%d\n%%%%EOF\n" % xref_at
        return bytes(out)


def page_obj(parent, contents):
    return "<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] " \
           "/Contents %s >>" % (parent, contents)


def stream_obj(data, filt=None, length=None):
    d = "<< "
    if filt:
        d += "/Filter /%s " % filt
    d += "/Length %s >>" % (length if length is not None else len(data))
    body = d.encode("latin-1") + b"\nstream\n" + data + b"\nendstream"
    return body


# ---- doc-00.pdf: two pages, escapes, TJ, '
b0 = PdfBuilder()
b0.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
b0.add(2, "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>")
b0.add(3, page_obj(2, "4 0 R"))
c0 = (b"BT /F1 12 Tf 72 720 Td "
      b"(Hello \\(escaped\\) world \\\\ slash \\101BC) Tj "
      b"0 -14 Td "
      b"[(Ker) -120 (ned) 40 ( array.)] TJ "
      b"ET")
b0.add(4, stream_obj(c0))
b0.add(5, page_obj(2, "6 0 R"))
c1 = (b"BT /F1 10 Tf 72 720 Td "
      b"(Second page line one.) Tj "
      b"(and a moved line) ' "
      b"ET")
b0.add(6, stream_obj(c1))
with open(os.path.join(D, "doc-00.pdf"), "wb") as fh:
    fh.write(b0.build())
emit00 = [
    (0, "Hello (escaped) world \\ slash ABC"),
    (0, "Ker"), (0, "ned"), (0, " array."),
    (1, "Second page line one."),
    (1, "and a moved line"),
]
run_by_page = {}
for pg, t in emit00:
    run_by_page.setdefault(pg, 0)
    ROWS.append(("doc-00.pdf", pg, run_by_page[pg], t))
    run_by_page[pg] += 1

# ---- doc-01.pdf: Flate, hex strings, indirect Length, comments,
#      a Contents array
b1 = PdfBuilder()
b1.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
b1.add(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
b1.add(3, page_obj(2, "[4 0 R 6 0 R]"))
raw = (b"% a comment the tokenizer must skip\n"
       b"BT <48656C6C6F2066726F6D20686578> Tj "     # "Hello from hex"
       b"<576F726C6421> Tj ET % trailing comment")  # "World!"
fl = zlib.compress(raw, 9)
b1.add(4, stream_obj(fl, filt="FlateDecode", length="5 0 R"))
b1.add(5, "%d" % len(fl))
# second content part: the text op split across parts is NOT graded;
# this part stands alone (odd-nibble hex: <5041442> -> "PAD " with
# the final nibble zero-padded -> 0x50 0x41 0x44 0x20)
b1.add(6, stream_obj(b"BT <5041442> Tj ET"))
with open(os.path.join(D, "doc-01.pdf"), "wb") as fh:
    fh.write(b1.build())
for i, t in enumerate(["Hello from hex", "World!", "PAD "]):
    ROWS.append(("doc-01.pdf", 0, i, t))

# ---- doc-02.pdf: incremental update replaces page 0's content
b2 = PdfBuilder()
b2.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
b2.add(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
b2.add(3, page_obj(2, "4 0 R"))
b2.add(4, stream_obj(b"BT (the ORIGINAL text, superseded) Tj ET"))
base = b2.build()
# incremental section: new object 4, new xref with /Prev
upd = bytearray(base)
new4_at = len(upd)
new4 = stream_obj(b"BT (the UPDATED text wins) Tj ET")
upd += b"4 0 obj\n" + new4 + b"\nendobj\n"
xref2_at = len(upd)
prev_xref = base.find(b"\nxref\n0 ") + 1  # NOT rfind("xref"): that
# would land inside "startxref"
upd += b"xref\n4 1\n%010d 00000 n \n" % new4_at
upd += b"trailer\n<< /Size 5 /Root 1 0 R /Prev %d >>\n" % prev_xref
upd += b"startxref\n%d\n%%%%EOF\n" % xref2_at
with open(os.path.join(D, "doc-02.pdf"), "wb") as fh:
    fh.write(bytes(upd))
ROWS.append(("doc-02.pdf", 0, 0, "the UPDATED text wins"))

# ---- bad-03.pdf: startxref past EOF
bad = base[:base.rfind(b"startxref")] + b"startxref\n99999999\n%%EOF\n"
with open(os.path.join(D, "bad-03.pdf"), "wb") as fh:
    fh.write(bad)

# ---- bad-04.pdf: an xref STREAM carrying no /Root -> refusal (the
# stream itself parses; the missing catalog is the fault)
b4 = bytearray(b"%PDF-1.5\n")
o1 = len(b4)
xrefrows = zlib.compress(b"\x00\x00\x00\x00" + b"\x01" +
                         o1.to_bytes(2, "big") + b"\x00", 9)
b4 += (b"1 0 obj\n<< /Type /XRef /Size 2 /W [1 2 1] "
       b"/Filter /FlateDecode /Length %d >>\nstream\n" % len(xrefrows) +
       xrefrows + b"\nendstream\nendobj\n")
b4 += b"startxref\n%d\n%%%%EOF\n" % o1
with open(os.path.join(D, "bad-04.pdf"), "wb") as fh:
    fh.write(bytes(b4))


# ---- xrefstm-05.pdf: PDF 1.5 cross-reference STREAM (the modern
# default shape) with a PNG Up predictor (/Predictor 12) over the
# W=[1 4 2] rows; ordinary objects, uncompressed content
def xref_stream_pdf(fname, use_predictor, use_objstm, text):
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def add(num, body):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body if isinstance(body, bytes)
                   else body.encode("latin-1"))
        out.extend(b"\nendobj\n")

    content = b"BT /F1 12 Tf 72 720 Td (" + text + b") Tj ET"
    if use_objstm:
        # catalog(2), pages(3), page(4) live INSIDE object stream 1
        inner = [
            (2, b"<< /Type /Catalog /Pages 3 0 R >>"),
            (3, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
            (4, b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792]"
                b" /Contents 5 0 R >>"),
        ]
        hdr = b""
        body = b""
        for num, ob in inner:
            hdr += b"%d %d " % (num, len(body))
            body += ob + b" "
        first = len(hdr)
        payload = zlib.compress(hdr + body, 9)
        add(1, b"<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode"
               b" /Length %d >>\nstream\n" % (first, len(payload)) +
            payload + b"\nendstream")
        add(5, b"<< /Length %d >>\nstream\n" % len(content) + content +
            b"\nendstream")
        root, size = 2, 7
        # rows: 0 free; 1 type1; 2,3,4 type2 (objstm 1, idx); 5 type1; 6=xref
        def row(t, f2, f3):
            return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        xref_at = len(out)
        rows = (row(0, 0, 0xffff) + row(1, offsets[1], 0) +
                row(2, 1, 0) + row(2, 1, 1) + row(2, 1, 2) +
                row(1, offsets[5], 0) + row(1, xref_at, 0))
    else:
        add(1, "<< /Type /Catalog /Pages 2 0 R >>")
        add(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
               b" /Contents 4 0 R >>")
        add(4, b"<< /Length %d >>\nstream\n" % len(content) + content +
            b"\nendstream")
        root, size = 1, 6
        def row(t, f2, f3):
            return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        xref_at = len(out)
        rows = (row(0, 0, 0xffff) + row(1, offsets[1], 0) +
                row(1, offsets[2], 0) + row(1, offsets[3], 0) +
                row(1, offsets[4], 0) + row(1, xref_at, 0))
    if use_predictor:
        # PNG Up (filter 2) rows over Columns=7
        cols = 7
        plain = [rows[i:i + cols] for i in range(0, len(rows), cols)]
        prev = bytes(cols)
        enc = b""
        for r in plain:
            enc += b"\x02" + bytes((r[i] - prev[i]) & 0xFF
                                   for i in range(cols))
            prev = r
        payload = zlib.compress(enc, 9)
        parms = b" /DecodeParms << /Predictor 12 /Columns 7 >>"
    else:
        payload = zlib.compress(rows, 9)
        parms = b""
    xdict = (b"<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R"
             b" /Filter /FlateDecode%s /Length %d >>" %
             (size, root, parms, len(payload)))
    xnum = size - 1
    offsets[xnum] = len(out)
    assert offsets[xnum] == xref_at
    out.extend(b"%d 0 obj\n" % xnum)
    out.extend(xdict + b"\nstream\n" + payload + b"\nendstream\nendobj\n")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_at)
    with open(os.path.join(D, fname), "wb") as fh:
        fh.write(bytes(out))


xref_stream_pdf("xrefstm-05.pdf", use_predictor=True, use_objstm=False,
                text=b"modern xref stream, Up predictor")
ROWS.append(("xrefstm-05.pdf", 0, 0, "modern xref stream, Up predictor"))
xref_stream_pdf("objstm-06.pdf", use_predictor=False, use_objstm=True,
                text=b"objects inside an ObjStm")
ROWS.append(("objstm-06.pdf", 0, 0, "objects inside an ObjStm"))

# ---- hybrid-07.pdf: the Acrobat compatibility shape — a CLASSIC
# trailer whose /XRefStm points at an xref STREAM carrying the
# type-2 entries for ObjStm-compressed objects; the classic table
# marks those objects free (old readers see an empty page tree and
# fail politely, updated readers follow /XRefStm)
hy = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
hy_off = {}


def hy_add(num, body):
    hy_off[num] = len(hy)
    hy.extend(b"%d 0 obj\n" % num)
    hy.extend(body if isinstance(body, bytes) else body.encode("latin-1"))
    hy.extend(b"\nendobj\n")


inner = [
    (2, b"<< /Type /Catalog /Pages 3 0 R >>"),
    (3, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
    (4, b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792]"
        b" /Contents 5 0 R >>"),
]
hdr = b""
body = b""
for num, ob in inner:
    hdr += b"%d %d " % (num, len(body))
    body += ob + b" "
payload = zlib.compress(hdr + body, 9)
hy_add(1, b"<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode"
          b" /Length %d >>\nstream\n" % (len(hdr), len(payload)) +
       payload + b"\nendstream")
hc = b"BT /F1 12 Tf 72 720 Td (hybrid: classic trailer + XRefStm) Tj ET"
hy_add(5, b"<< /Length %d >>\nstream\n" % len(hc) + hc + b"\nendstream")
# the xref STREAM object (6): type-2 rows for 2..4, type-1 for 1, 5, 6
xstm_at = len(hy)


def hrow(t, f2, f3):
    return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")


hrows = (hrow(0, 0, 0xffff) + hrow(1, hy_off[1], 0) +
         hrow(2, 1, 0) + hrow(2, 1, 1) + hrow(2, 1, 2) +
         hrow(1, hy_off[5], 0) + hrow(1, xstm_at, 0))
hpay = zlib.compress(hrows, 9)
hy.extend(b"6 0 obj\n<< /Type /XRef /Size 7 /W [1 4 2] /Root 2 0 R"
          b" /Filter /FlateDecode /Length %d >>\nstream\n" % len(hpay) +
          hpay + b"\nendstream\nendobj\n")
# CLASSIC table: objects 1,5 real; 2,3,4 FREE (old-reader view)
cx_at = len(hy)
hy.extend(b"xref\n0 7\n")
hy.extend(b"0000000000 65535 f \n")
hy.extend(b"%010d 00000 n \n" % hy_off[1])
hy.extend(b"0000000000 65535 f \n" * 3)
hy.extend(b"%010d 00000 n \n" % hy_off[5])
hy.extend(b"%010d 00000 n \n" % xstm_at)
hy.extend(b"trailer\n<< /Size 7 /Root 2 0 R /XRefStm %d >>\n" % xstm_at)
hy.extend(b"startxref\n%d\n%%%%EOF\n" % cx_at)
with open(os.path.join(D, "hybrid-07.pdf"), "wb") as fh:
    fh.write(bytes(hy))
ROWS.append(("hybrid-07.pdf", 0, 0, "hybrid: classic trailer + XRefStm"))

# ---- encrypted documents (standard security handler, ISO 32000-1
# §7.6.3) — empty-USER-password files are readable by design and
# common in crawls; the engine must unwrap them. All crypto here is
# implemented from the public spec in stdlib python (hashlib.md5 +
# hand-rolled RC4 and AES-128) so the fixture stays independent of
# both the engine and any crypto library.

import hashlib

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def rc4(key, data):
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for c in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(c ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


# AES-128 from FIPS-197 (S-box via GF(2^8) inverse + affine transform)
def _gmul(a, b):
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


_INV = [0] * 256
for _a in range(1, 256):
    for _x in range(1, 256):
        if _gmul(_a, _x) == 1:
            _INV[_a] = _x
            break
SBOX = []
for _a in range(256):
    _v = _INV[_a]
    _s = _v
    for _ in range(4):
        _v = ((_v << 1) | (_v >> 7)) & 0xFF
        _s ^= _v
    SBOX.append(_s ^ 0x63)


def _aes_expand(key):
    nk = len(key) // 4  # 4 (AES-128) or 8 (AES-256)
    nr = nk + 6
    rcon = 1
    w = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [SBOX[t[1]], SBOX[t[2]], SBOX[t[3]], SBOX[t[0]]]
            t[0] ^= rcon
            rcon = _gmul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [SBOX[x] for x in t]
        w.append([w[i - nk][k] ^ t[k] for k in range(4)])
    return w


def _aes_block(w, block):
    # column-major state per FIPS-197; round count from the schedule
    nr = len(w) // 4 - 1
    st = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_rk(rnd):
        for c in range(4):
            for r in range(4):
                st[r][c] ^= w[4 * rnd + c][r]

    def sub_shift():
        for r in range(4):
            for c in range(4):
                st[r][c] = SBOX[st[r][c]]
        for r in range(1, 4):
            st[r] = st[r][r:] + st[r][:r]

    def mix():
        for c in range(4):
            a = [st[r][c] for r in range(4)]
            st[0][c] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
            st[1][c] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
            st[2][c] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
            st[3][c] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)

    add_rk(0)
    for rnd in range(1, nr):
        sub_shift()
        mix()
        add_rk(rnd)
    sub_shift()
    add_rk(nr)
    return bytes(st[r][c] for c in range(4) for r in range(4))


# FIPS-197 appendix C.1/C.3 vectors: the from-scratch core must
# reproduce both key sizes
assert _aes_block(
    _aes_expand(bytes(range(16))),
    bytes.fromhex("00112233445566778899aabbccddeeff")
).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
assert _aes_block(
    _aes_expand(bytes(range(32))),
    bytes.fromhex("00112233445566778899aabbccddeeff")
).hex() == "8ea2b7ca516745bfeafc49904b496089"


def aes_cbc_encrypt(key, iv, data):
    pad_n = 16 - (len(data) % 16)
    data = data + bytes([pad_n]) * pad_n
    w = _aes_expand(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = _aes_block(w, blk)
        out += prev
    return iv + bytes(out)


def file_key(o, p, id0, r, n, user_pw=b""):
    pw = (user_pw + PAD)[:32]
    h = hashlib.md5(pw + o + struct.pack("<i", p) + id0).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def owner_o(r, n, owner_pw=b"", user_pw=b""):
    h = hashlib.md5((owner_pw + PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    o = rc4(key, (user_pw + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def user_u(key, id0, r):
    if r == 2:
        return rc4(key, PAD)
    e = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        e = rc4(bytes(b ^ i for b in key), e)
    return e + b"\x00" * 16  # 32 bytes on disk; only 16 are checked


def obj_key(key, num, aes):
    tail = struct.pack("<I", num)[:3] + b"\x00\x00"
    if aes:
        tail += b"sAlT"
    return hashlib.md5(key + tail).digest()[:min(len(key) + 5, 16)]


def hexstr(b):
    return "<%s>" % b.hex().upper()


def encrypted_pdf(fname, texts, aes, user_pw=b"", perm=-4):
    id0 = hashlib.md5(fname.encode()).digest()  # deterministic 16 bytes
    r, v, nbytes = (4, 4, 16) if aes else (3, 2, 16)
    o = owner_o(r, nbytes, b"", user_pw)
    key = file_key(o, perm, id0, r, nbytes, user_pw)
    u = user_u(key, id0, r)
    content = ("BT /F1 12 Tf 72 720 Td " +
               " ".join("(%s) Tj 0 -14 Td" % t for t in texts) +
               " ET").encode("latin-1")
    ck = obj_key(key, 4, aes)  # the content stream is object 4
    if aes:
        iv = hashlib.md5(b"iv" + fname.encode()).digest()[:16]
        enc = aes_cbc_encrypt(ck, iv, content)
    else:
        enc = rc4(ck, content)
    b = PdfBuilder()
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, page_obj(2, "4 0 R"))
    b.add(4, stream_obj(enc))
    if aes:
        b.add(5, "<< /Filter /Standard /V 4 /R 4 /Length 128 "
                 "/CF << /StdCF << /CFM /AESV2 /Length 16 "
                 "/AuthEvent /DocOpen >> >> /StmF /StdCF /StrF /StdCF "
                 "/O %s /U %s /P %d >>" % (hexstr(o), hexstr(u), perm))
    else:
        b.add(5, "<< /Filter /Standard /V 2 /R 3 /Length 128 "
                 "/O %s /U %s /P %d >>" % (hexstr(o), hexstr(u), perm))
    data = b.build(trailer_extra=" /Encrypt 5 0 R /ID [%s %s]" % (
        hexstr(id0), hexstr(id0)))
    with open(os.path.join(D, fname), "wb") as fh:
        fh.write(data)
    return texts


def aes_cbc_raw(key, iv, data):
    """CBC encrypt with NO padding (data length must be a multiple of
    16) — the /UE//OE wrap and 2.B both need the raw form."""
    w = _aes_expand(key)
    prev = iv
    out = b""
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        prev = _aes_block(w, blk)
        out += prev
    return out


def hash_2b(pw, salt, udata=b""):
    """ISO 32000-2 Algorithm 2.B (V5/R6 hardened hash)."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_raw(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def encrypted_pdf_v5(fname, texts, user_pw=b"", perm=-4):
    """V5/R6 AES-256 (the Acrobat-X+ default)."""
    h = hashlib.sha512(fname.encode()).digest()
    file_key = h[:32]  # deterministic random-stand-in file key
    u_vsalt, u_ksalt = h[32:40], h[40:48]
    o_vsalt, o_ksalt = h[48:56], h[56:64]
    u = hash_2b(user_pw, u_vsalt) + u_vsalt + u_ksalt
    # /UE //OE: the file key AES-256-CBC-wrapped (zero IV, no padding)
    # under the key-salt intermediates
    ue = aes_cbc_raw(hash_2b(user_pw, u_ksalt), b"\x00" * 16, file_key)
    o = hash_2b(b"", o_vsalt, u) + o_vsalt + o_ksalt
    oe = aes_cbc_raw(hash_2b(b"", o_ksalt, u), b"\x00" * 16, file_key)
    content = ("BT /F1 12 Tf 72 720 Td " +
               " ".join("(%s) Tj 0 -14 Td" % t for t in texts) +
               " ET").encode("latin-1")
    iv = hashlib.md5(b"iv5" + fname.encode()).digest()[:16]
    enc = aes_cbc_encrypt(file_key, iv, content)  # V5: file key direct
    b = PdfBuilder()
    b.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, page_obj(2, "4 0 R"))
    b.add(4, stream_obj(enc))
    b.add(5, "<< /Filter /Standard /V 5 /R 6 /Length 256 "
             "/CF << /StdCF << /CFM /AESV3 /Length 32 "
             "/AuthEvent /DocOpen >> >> /StmF /StdCF /StrF /StdCF "
             "/O %s /U %s /OE %s /UE %s /P %d >>" % (
                 hexstr(o), hexstr(u), hexstr(oe), hexstr(ue), perm))
    id0 = hashlib.md5(fname.encode()).digest()
    data = b.build(trailer_extra=" /Encrypt 5 0 R /ID [%s %s]" % (
        hexstr(id0), hexstr(id0)))
    with open(os.path.join(D, fname), "wb") as fh:
        fh.write(data)
    return texts


def encrypted_modern_pdf(fname, text):
    """The modern crawled encrypted-PDF shape: V5/R6 AES-256 + xref
    STREAM + ObjStm. The ObjStm and content streams are encrypted
    with the file key (encryption applies BEFORE filters read: disk
    bytes = AES(zlib(data))); the xref stream itself is NEVER
    encrypted per spec, and its dict doubles as the trailer carrying
    /Encrypt + /ID."""
    h = hashlib.sha512(fname.encode()).digest()
    file_key = h[:32]
    u_vsalt, u_ksalt = h[32:40], h[40:48]
    o_vsalt, o_ksalt = h[48:56], h[56:64]
    u = hash_2b(b"", u_vsalt) + u_vsalt + u_ksalt
    ue = aes_cbc_raw(hash_2b(b"", u_ksalt), b"\x00" * 16, file_key)
    o = hash_2b(b"", o_vsalt, u) + o_vsalt + o_ksalt
    oe = aes_cbc_raw(hash_2b(b"", o_ksalt, u), b"\x00" * 16, file_key)

    def enc(data, tag):
        iv = hashlib.md5(tag + fname.encode()).digest()[:16]
        return aes_cbc_encrypt(file_key, iv, data)

    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def add(num, body):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    content = b"BT /F1 12 Tf 72 720 Td (" + text + b") Tj ET"
    inner = [
        (2, b"<< /Type /Catalog /Pages 3 0 R >>"),
        (3, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (4, b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792]"
            b" /Contents 5 0 R >>"),
    ]
    hdr = b""
    body = b""
    for num, ob in inner:
        hdr += b"%d %d " % (num, len(body))
        body += ob + b" "
    first = len(hdr)
    spay = enc(zlib.compress(hdr + body, 9), b"objstm")
    add(1, b"<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode"
           b" /Length %d >>\nstream\n" % (first, len(spay)) +
        spay + b"\nendstream")
    cpay = enc(content, b"content")
    add(5, b"<< /Length %d >>\nstream\n" % len(cpay) + cpay +
        b"\nendstream")
    add(6, (b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/O %s /U %s /OE %s /UE %s /P -4 >>" % (
                hexstr(o).encode(), hexstr(u).encode(),
                hexstr(oe).encode(), hexstr(ue).encode())))

    def row(t, f2, f3):
        return bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

    xref_at = len(out)
    rows = (row(0, 0, 0xffff) + row(1, offsets[1], 0) +
            row(2, 1, 0) + row(2, 1, 1) + row(2, 1, 2) +
            row(1, offsets[5], 0) + row(1, offsets[6], 0) +
            row(1, xref_at, 0))
    xpay = zlib.compress(rows, 9)
    id0 = hashlib.md5(fname.encode()).digest()
    xdict = (b"<< /Type /XRef /Size 8 /W [1 4 2] /Root 2 0 R"
             b" /Encrypt 6 0 R /ID [%s %s]"
             b" /Filter /FlateDecode /Length %d >>" % (
                 hexstr(id0).encode(), hexstr(id0).encode(), len(xpay)))
    out.extend(b"7 0 obj\n" + xdict + b"\nstream\n" + xpay +
               b"\nendstream\nendobj\n")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_at)
    with open(os.path.join(D, fname), "wb") as fh:
        fh.write(bytes(out))


# enc-rc4-08.pdf: V2/R3 RC4-128, empty user password -> decrypts
for i, t in enumerate(encrypted_pdf(
        "enc-rc4-08.pdf",
        ["unwrapped by the empty password", "rc4 second line"],
        aes=False)):
    ROWS.append(("enc-rc4-08.pdf", 0, i, t))
# enc-aes-09.pdf: V4/R4 AESV2 (AES-128-CBC) -> decrypts
for i, t in enumerate(encrypted_pdf(
        "enc-aes-09.pdf",
        ["aes body over cbc", "with a second run"],
        aes=True)):
    ROWS.append(("enc-aes-09.pdf", 0, i, t))
# encpw-10.pdf: a REAL user password ("secret") -> the empty-password
# /U check fails and the whole file refuses; graded by ABSENCE
encrypted_pdf("encpw-10.pdf", ["you should never see this"],
              aes=False, user_pw=b"secret")
# enc-aes256-12.pdf: V5/R6 AES-256 (the Acrobat-X+ default), empty
# user password -> 2.B hash validates against /U, file key unwraps
# from /UE, bodies decrypt with it directly
for i, t in enumerate(encrypted_pdf_v5(
        "enc-aes256-12.pdf",
        ["modern aes-256 body", "second run under v5"])):
    ROWS.append(("enc-aes256-12.pdf", 0, i, t))
# encpw256-13.pdf: V5/R6 with a REAL password -> refusal by ABSENCE
encrypted_pdf_v5("encpw256-13.pdf", ["still hidden"], user_pw=b"secret")
# encmodern-14.pdf: xref STREAM + ObjStm + AES-256 together — the
# actual shape a modern crawled encrypted PDF has
encrypted_modern_pdf("encmodern-14.pdf",
                     b"modern encrypted: objstm under aes-256")
ROWS.append(("encmodern-14.pdf", 0, 0,
             "modern encrypted: objstm under aes-256"))

# ---- cmap-11.pdf: composed-font text via /ToUnicode CMaps — the
# text-fidelity layer for CJK/ligature PDFs: a Type0/Identity-H font
# shows 2-BYTE character codes that mean nothing without the CMap
# (bfchar incl. multi-unit expansions, incrementing bfrange, array
# bfrange), plus a 1-byte simple font with its own CMap, plus a font
# with NO CMap mid-page proving the Tf state machine switches back to
# Latin-1. Golden text comes from the tables used to WRITE.
CMAP2 = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /graft-uni def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
4 beginbfchar
<0001> <0048>
<0002> <0065>
<0003> <FB03>
<0004> <00660066>
endbfchar
2 beginbfrange
<0010> <0019> <0030>
<0020> <0022> [<0041> <00E9> <4F60>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
CMAP1 = b"""begincmap
1 begincodespacerange
<00> <FF>
endcodespacerange
2 beginbfchar
<41> <0391>
<42> <D83DDE00>
endbfchar
endcmap"""

bc = PdfBuilder()
bc.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
bc.add(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
bc.add(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          "/Resources << /Font << /F9 5 0 R /F8 7 0 R /F0 9 0 R >> >> "
          "/Contents 4 0 R >>")
ccm = (b"BT /F9 12 Tf 72 720 Td "
       b"<000100020003> Tj "            # H e ffi-ligature
       b"<0004001000190020> Tj "        # ff 0 9 A
       b"[<00210022> 40 <0001>] TJ "    # e-acute nihao | H
       b"/F8 12 Tf (AB) Tj "            # 1-byte map: Alpha, emoji
       b"/F0 12 Tf (plain latin1) Tj "  # no CMap: bytes as Latin-1
       b"ET")
bc.add(4, stream_obj(ccm))
bc.add(5, "<< /Type /Font /Subtype /Type0 /BaseFont /Graft "
          "/Encoding /Identity-H /ToUnicode 6 0 R >>")
bc.add(6, stream_obj(zlib.compress(CMAP2, 9), filt="FlateDecode"))
bc.add(7, "<< /Type /Font /Subtype /TrueType /BaseFont /GraftSimple "
          "/ToUnicode 8 0 R >>")
bc.add(8, stream_obj(CMAP1))
bc.add(9, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
with open(os.path.join(D, "cmap-11.pdf"), "wb") as fh:
    fh.write(bc.build())
emit_cmap = [
    "Heﬃ",
    "ff09A",
    "é你",
    "H",
    "Α\U0001F600",
    "plain latin1",
]
for i, t in enumerate(emit_cmap):
    ROWS.append(("cmap-11.pdf", 0, i, t))

# ---- diff-15.pdf: simple-font /Encoding with /Differences — the
# other common non-CMap shape in crawled PDFs: a base encoding
# (named, or defaulted to Standard inside an /Encoding dict) with a
# /Differences array remapping individual codes to AGL glyph names
# (or uniXXXX / uXXXXXX algorithmic names). Four fonts on one page:
#   F1 TrueType, WinAnsi base + Differences at 65/66 and 128..131
#      (incl. an unknown glyph name -> U+FFFD, and an override of a
#      cp1252 HOLE at 0x81)
#   F2 Type1, /Encoding /MacRomanEncoding by NAME (no dict) — incl.
#      the Annex D 0xDB currency-vs-euro override
#   F3 Type1, /Encoding dict with NO BaseEncoding -> StandardEncoding
#      base, Differences remapping 0x27
#   F4 TrueType with BOTH /ToUnicode and /Encoding -> the CMap wins
# Expected text is computed with Python's OWN tables (cp1252 /
# mac_roman codecs + an independent Annex D Standard transcription),
# so the two implementations meet over the wire.
WIN_HOLES = (0x81, 0x8D, 0x8F, 0x90, 0x9D)


def winansi_dec(b):
    if b < 0x20 or b in WIN_HOLES:
        return "�"
    return bytes([b]).decode("cp1252")


def macroman_dec(b):
    if b < 0x20:
        return "�"
    if b == 0xDB:  # PDF Annex D keeps pre-8.5 CURRENCY SIGN here
        return "¤"
    return bytes([b]).decode("mac_roman")


STD = {c: chr(c) for c in range(0x20, 0x7F)}
STD[0x27] = "’"
STD[0x60] = "‘"
STD.update({k: chr(v) for k, v in {
    0xA1: 0xA1, 0xA2: 0xA2, 0xA3: 0xA3, 0xA4: 0x2044, 0xA5: 0xA5,
    0xA6: 0x192, 0xA7: 0xA7, 0xA8: 0xA4, 0xA9: 0x27, 0xAA: 0x201C,
    0xAB: 0xAB, 0xAC: 0x2039, 0xAD: 0x203A, 0xAE: 0xFB01, 0xAF: 0xFB02,
    0xB1: 0x2013, 0xB2: 0x2020, 0xB3: 0x2021, 0xB4: 0xB7, 0xB6: 0xB6,
    0xB7: 0x2022, 0xB8: 0x201A, 0xB9: 0x201E, 0xBA: 0x201D, 0xBB: 0xBB,
    0xBC: 0x2026, 0xBD: 0x2030, 0xBF: 0xBF,
    0xC1: 0x60, 0xC2: 0xB4, 0xC3: 0x2C6, 0xC4: 0x2DC, 0xC5: 0xAF,
    0xC6: 0x2D8, 0xC7: 0x2D9, 0xC8: 0xA8, 0xCA: 0x2DA, 0xCB: 0xB8,
    0xCD: 0x2DD, 0xCE: 0x2DB, 0xCF: 0x2C7, 0xD0: 0x2014,
    0xE1: 0xC6, 0xE3: 0xAA, 0xE8: 0x141, 0xE9: 0xD8, 0xEA: 0x152,
    0xEB: 0xBA, 0xF1: 0xE6, 0xF5: 0x131, 0xF8: 0x142, 0xF9: 0xF8,
    0xFA: 0x153, 0xFB: 0xDF,
}.items()})


def standard_dec(b):
    return STD.get(b, "�")


GLYPHS = {"Euro": "€", "bullet": "•", "adieresis": "ä",
          "uni0394": "Δ", "u1F600": "\U0001F600",
          "questiondown": "¿"}
F1_DIFF = {65: "Euro", 66: "bullet", 128: "adieresis", 129: "uni0394",
           130: "u1F600", 131: None}  # None = unknown name -> U+FFFD


def f1_dec(b):
    if b in F1_DIFF:
        g = F1_DIFF[b]
        return GLYPHS[g] if g else "�"
    return winansi_dec(b)


def f3_dec(b):
    if b == 0x27:
        return GLYPHS["questiondown"]
    return standard_dec(b)


CMAP_F4 = b"""begincmap
1 begincodespacerange
<00> <FF>
endcodespacerange
1 beginbfchar
<41> <03A9>
endbfchar
endcmap"""

bd = PdfBuilder()
bd.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
bd.add(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
bd.add(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          "/Resources << /Font << /F1 5 0 R /F2 6 0 R /F3 7 0 R "
          "/F4 8 0 R >> >> /Contents 4 0 R >>")
cdiff = (b"BT /F1 12 Tf 72 720 Td "
         b"(AB normal) Tj "       # Differences at 65/66, WinAnsi rest
         b"<80818283> Tj "        # Differences 128..131 (incl. unknown)
         b"<938D7A> Tj "          # untouched cp1252 high + HOLE + ascii
         b"/F2 12 Tf <4D61638A20D0DB> Tj "  # MacRoman by name
         b"/F3 12 Tf <27602041A8AE> Tj "    # Standard base + diff @0x27
         b"/F4 12 Tf (A) Tj "               # ToUnicode beats /Encoding
         b"ET")
bd.add(4, stream_obj(cdiff))
bd.add(5, "<< /Type /Font /Subtype /TrueType /BaseFont /GraftW "
          "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
          "/Differences [65 /Euro /bullet 128 /adieresis /uni0394 "
          "/u1F600 /noSuchGlyph] >> >>")
bd.add(6, "<< /Type /Font /Subtype /Type1 /BaseFont /GraftM "
          "/Encoding /MacRomanEncoding >>")
bd.add(7, "<< /Type /Font /Subtype /Type1 /BaseFont /GraftS "
          "/Encoding << /Differences [39 /questiondown] >> >>")
bd.add(8, "<< /Type /Font /Subtype /TrueType /BaseFont /GraftU "
          "/Encoding << /BaseEncoding /WinAnsiEncoding >> "
          "/ToUnicode 9 0 R >>")
bd.add(9, stream_obj(CMAP_F4))
with open(os.path.join(D, "diff-15.pdf"), "wb") as fh:
    fh.write(bd.build())
emit_diff = [
    "".join(f1_dec(b) for b in b"AB normal"),
    "".join(f1_dec(b) for b in bytes([0x80, 0x81, 0x82, 0x83])),
    "".join(f1_dec(b) for b in bytes([0x93, 0x8D, 0x7A])),
    "".join(macroman_dec(b) for b in bytes(
        [0x4D, 0x61, 0x63, 0x8A, 0x20, 0xD0, 0xDB])),
    "".join(f3_dec(b) for b in bytes([0x27, 0x60, 0x20, 0x41, 0xA8, 0xAE])),
    "Ω",
]
for i, t in enumerate(emit_diff):
    ROWS.append(("diff-15.pdf", 0, i, t))

# ---- macexp-16.pdf: the FOURTH Annex D base encoding —
# /MacExpertEncoding (expert sets: oldstyle figures, small capitals,
# superiors/inferiors, nut fractions, f-ligatures). Expected text is
# composed INDEPENDENTLY here from two separately-transcribed public
# tables — the Annex D.4 code->glyph-NAME column and the Adobe Glyph
# List name->Unicode mapping — so the composition meets the Scala
# code->codepoint table over the wire; a slip in either transcription
# breaks the grade.
MACEXPERT_NAMES = {
    0x20: "space", 0x21: "exclamsmall", 0x22: "Hungarumlautsmall",
    0x23: "centoldstyle", 0x24: "dollaroldstyle", 0x25: "dollarsuperior",
    0x26: "ampersandsmall", 0x27: "Acutesmall", 0x28: "parenleftsuperior",
    0x29: "parenrightsuperior", 0x2A: "twodotenleader",
    0x2B: "onedotenleader", 0x2C: "comma", 0x2D: "hyphen", 0x2E: "period",
    0x2F: "fraction", 0x30: "zerooldstyle", 0x31: "oneoldstyle",
    0x32: "twooldstyle", 0x33: "threeoldstyle", 0x34: "fouroldstyle",
    0x35: "fiveoldstyle", 0x36: "sixoldstyle", 0x37: "sevenoldstyle",
    0x38: "eightoldstyle", 0x39: "nineoldstyle", 0x3A: "colon",
    0x3B: "semicolon", 0x3D: "threequartersemdash", 0x3F: "questionsmall",
    0x44: "Ethsmall", 0x47: "onequarter", 0x48: "onehalf",
    0x49: "threequarters", 0x4A: "oneeighth", 0x4B: "threeeighths",
    0x4C: "fiveeighths", 0x4D: "seveneighths", 0x4E: "onethird",
    0x4F: "twothirds", 0x56: "ff", 0x57: "fi", 0x58: "fl", 0x59: "ffi",
    0x5A: "ffl", 0x5B: "parenleftinferior", 0x5D: "parenrightinferior",
    0x5E: "Circumflexsmall", 0x5F: "hypheninferior", 0x60: "Gravesmall",
    **{c: chr(c - 0x20) + "small" for c in range(0x61, 0x7B)},
    0x7B: "colonmonetary", 0x7C: "onefitted", 0x7D: "rupiah",
    0x7E: "Tildesmall", 0x81: "asuperior", 0x82: "centsuperior",
    0x87: "Aacutesmall", 0x88: "Agravesmall", 0x89: "Acircumflexsmall",
    0x8A: "Adieresissmall", 0x8B: "Atildesmall", 0x8C: "Aringsmall",
    0x8D: "Ccedillasmall", 0x8E: "Eacutesmall", 0x8F: "Egravesmall",
    0x90: "Ecircumflexsmall", 0x91: "Edieresissmall", 0x92: "Iacutesmall",
    0x93: "Igravesmall", 0x94: "Icircumflexsmall", 0x95: "Idieresissmall",
    0x96: "Ntildesmall", 0x97: "Oacutesmall", 0x98: "Ogravesmall",
    0x99: "Ocircumflexsmall", 0x9A: "Odieresissmall", 0x9B: "Otildesmall",
    0x9C: "Uacutesmall", 0x9D: "Ugravesmall", 0x9E: "Ucircumflexsmall",
    0x9F: "Udieresissmall", 0xA1: "eightsuperior", 0xA2: "fourinferior",
    0xA3: "threeinferior", 0xA4: "sixinferior", 0xA5: "eightinferior",
    0xA6: "seveninferior", 0xA7: "Scaronsmall", 0xA9: "centinferior",
    0xAA: "twoinferior", 0xAC: "Dieresissmall", 0xAE: "Caronsmall",
    0xAF: "osuperior", 0xB0: "fiveinferior", 0xB2: "commainferior",
    0xB3: "periodinferior", 0xB4: "Yacutesmall", 0xB6: "dollarinferior",
    0xB9: "Thornsmall", 0xBB: "nineinferior", 0xBC: "zeroinferior",
    0xBD: "Zcaronsmall", 0xBE: "AEsmall", 0xBF: "Oslashsmall",
    0xC0: "questiondownsmall", 0xC1: "oneinferior", 0xC2: "Lslashsmall",
    0xC9: "Cedillasmall", 0xCF: "OEsmall", 0xD0: "figuredash",
    0xD1: "hyphensuperior", 0xD6: "exclamdownsmall", 0xD8: "Ydieresissmall",
    0xDA: "onesuperior", 0xDB: "twosuperior", 0xDC: "threesuperior",
    0xDD: "foursuperior", 0xDE: "fivesuperior", 0xDF: "sixsuperior",
    0xE0: "sevensuperior", 0xE1: "ninesuperior", 0xE2: "zerosuperior",
    0xE4: "esuperior", 0xE5: "rsuperior", 0xE6: "tsuperior",
    0xE9: "isuperior", 0xEA: "ssuperior", 0xEB: "dsuperior",
    0xF1: "lsuperior", 0xF2: "Ogoneksmall", 0xF3: "Brevesmall",
    0xF4: "Macronsmall", 0xF5: "bsuperior", 0xF7: "msuperior",
    0xF8: "commasuperior", 0xF9: "periodsuperior", 0xFA: "Dotaccentsmall",
    0xFB: "Ringsmall",
}
# Adobe Glyph List values for the expert set: small caps mirror
# F7 + the Latin-1/ASCII code of the lowercase form; oldstyle figures
# F730-F739; superior/inferior letter forms and small diacritics sit
# in the F6DC-F6FF corporate block; ligatures/fractions/digit
# superiors-inferiors use their standard codepoints.
AGL_EXPERT = {
    "space": 0x0020, "comma": 0x002C, "hyphen": 0x002D, "period": 0x002E,
    "colon": 0x003A, "semicolon": 0x003B, "fraction": 0x2044,
    "exclamsmall": 0xF721, "questionsmall": 0xF73F,
    "exclamdownsmall": 0xF7A1, "questiondownsmall": 0xF7BF,
    "ampersandsmall": 0xF726, "centoldstyle": 0xF7A2,
    "dollaroldstyle": 0xF724,
    "onedotenleader": 0x2024, "twodotenleader": 0x2025,
    "parenleftsuperior": 0x207D, "parenrightsuperior": 0x207E,
    "parenleftinferior": 0x208D, "parenrightinferior": 0x208E,
    "onequarter": 0x00BC, "onehalf": 0x00BD, "threequarters": 0x00BE,
    "oneeighth": 0x215B, "threeeighths": 0x215C, "fiveeighths": 0x215D,
    "seveneighths": 0x215E, "onethird": 0x2153, "twothirds": 0x2154,
    "ff": 0xFB00, "fi": 0xFB01, "fl": 0xFB02, "ffi": 0xFB03,
    "ffl": 0xFB04, "colonmonetary": 0x20A1, "figuredash": 0x2012,
    "onefitted": 0xF6DC, "rupiah": 0xF6DD, "threequartersemdash": 0xF6DE,
    "centinferior": 0xF6DF, "centsuperior": 0xF6E0,
    "commainferior": 0xF6E1, "commasuperior": 0xF6E2,
    "dollarinferior": 0xF6E3, "dollarsuperior": 0xF6E4,
    "hypheninferior": 0xF6E5, "hyphensuperior": 0xF6E6,
    "periodinferior": 0xF6E7, "periodsuperior": 0xF6E8,
    "asuperior": 0xF6E9, "bsuperior": 0xF6EA, "dsuperior": 0xF6EB,
    "esuperior": 0xF6EC, "isuperior": 0xF6ED, "lsuperior": 0xF6EE,
    "msuperior": 0xF6EF, "osuperior": 0xF6F0, "rsuperior": 0xF6F1,
    "ssuperior": 0xF6F2, "tsuperior": 0xF6F3,
    "Brevesmall": 0xF6F4, "Caronsmall": 0xF6F5, "Circumflexsmall": 0xF6F6,
    "Dotaccentsmall": 0xF6F7, "Hungarumlautsmall": 0xF6F8,
    "Lslashsmall": 0xF6F9, "OEsmall": 0xF6FA, "Ogoneksmall": 0xF6FB,
    "Ringsmall": 0xF6FC, "Scaronsmall": 0xF6FD, "Tildesmall": 0xF6FE,
    "Zcaronsmall": 0xF6FF,
    "Gravesmall": 0xF760, "Acutesmall": 0xF7B4, "Dieresissmall": 0xF7A8,
    "Macronsmall": 0xF7AF, "Cedillasmall": 0xF7B8,
    **{chr(c) + "small": 0xF700 + c + 0x20 for c in range(0x41, 0x5B)},
    "AEsmall": 0xF7E6, "Aacutesmall": 0xF7E1, "Acircumflexsmall": 0xF7E2,
    "Adieresissmall": 0xF7E4, "Agravesmall": 0xF7E0, "Aringsmall": 0xF7E5,
    "Atildesmall": 0xF7E3, "Ccedillasmall": 0xF7E7, "Eacutesmall": 0xF7E9,
    "Ecircumflexsmall": 0xF7EA, "Edieresissmall": 0xF7EB,
    "Egravesmall": 0xF7E8, "Ethsmall": 0xF7F0, "Iacutesmall": 0xF7ED,
    "Icircumflexsmall": 0xF7EE, "Idieresissmall": 0xF7EF,
    "Igravesmall": 0xF7EC, "Ntildesmall": 0xF7F1, "Oacutesmall": 0xF7F3,
    "Ocircumflexsmall": 0xF7F4, "Odieresissmall": 0xF7F6,
    "Ogravesmall": 0xF7F2, "Oslashsmall": 0xF7F8, "Otildesmall": 0xF7F5,
    "Thornsmall": 0xF7FE, "Uacutesmall": 0xF7FA, "Ucircumflexsmall": 0xF7FB,
    "Udieresissmall": 0xF7FC, "Ugravesmall": 0xF7F9, "Yacutesmall": 0xF7FD,
    "Ydieresissmall": 0xF7FF,
    **{str(d): 0x30 + d for d in range(10)},  # plain digits (unused)
    "zerooldstyle": 0xF730, "oneoldstyle": 0xF731, "twooldstyle": 0xF732,
    "threeoldstyle": 0xF733, "fouroldstyle": 0xF734,
    "fiveoldstyle": 0xF735, "sixoldstyle": 0xF736,
    "sevenoldstyle": 0xF737, "eightoldstyle": 0xF738,
    "nineoldstyle": 0xF739,
    "zerosuperior": 0x2070, "onesuperior": 0x00B9, "twosuperior": 0x00B2,
    "threesuperior": 0x00B3, "foursuperior": 0x2074,
    "fivesuperior": 0x2075, "sixsuperior": 0x2076,
    "sevensuperior": 0x2077, "eightsuperior": 0x2078,
    "ninesuperior": 0x2079,
    "zeroinferior": 0x2080, "oneinferior": 0x2081, "twoinferior": 0x2082,
    "threeinferior": 0x2083, "fourinferior": 0x2084,
    "fiveinferior": 0x2085, "sixinferior": 0x2086,
    "seveninferior": 0x2087, "eightinferior": 0x2088,
    "nineinferior": 0x2089,
}


def macexpert_dec(b):
    if b in (0x09, 0x0A, 0x0D):  # layout whitespace passes through
        return chr(b)
    n = MACEXPERT_NAMES.get(b)
    return chr(AGL_EXPERT[n]) if n else "�"


bme = PdfBuilder()
bme.add(1, "<< /Type /Catalog /Pages 2 0 R >>")
bme.add(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
bme.add(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           "/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> "
           "/Contents 4 0 R >>")
cme = (b"BT /F1 12 Tf 72 720 Td "
       b"(0123456789) Tj "            # oldstyle figures
       b"<56575859 5A2C20 67726166 74> Tj "  # ligatures + "graft" smallcaps
       b"<474849 4A4E4F 2F DADBDD E2 BCC1AA> Tj "  # fractions, sup/inf
       b"<2227 5E60 7EAC AEC9 F3F4 FAFB F2A7 BDC2 CF> Tj "  # diacritic smalls
       b"<4487 8A96 9FB4 B9BE BFC0 D6D8> Tj "  # accented smalls + punct
       b"<8182 AFB2 B3B6 E4E9 F1F8> Tj "       # superiors/inferiors
       b"<40505C FF 09 3D7C7D 7B> Tj "  # undefined -> FFFD; tab passes
       b"/F2 12 Tf <3132 57> Tj "  # dict form + Differences overlay @0x31
       b"ET")
bme.add(4, stream_obj(cme))
bme.add(5, "<< /Type /Font /Subtype /Type1 /BaseFont /GraftE "
           "/Encoding /MacExpertEncoding >>")
bme.add(6, "<< /Type /Font /Subtype /TrueType /BaseFont /GraftE2 "
           "/Encoding << /BaseEncoding /MacExpertEncoding "
           "/Differences [49 /Euro] >> >>")
with open(os.path.join(D, "macexp-16.pdf"), "wb") as fh:
    fh.write(bme.build())


def me_runs():
    import re as _re
    runs = []
    for m in _re.finditer(rb"\(([^)]*)\) Tj|<([0-9A-Fa-f ]+)> Tj", cme):
        if m.group(1) is not None:
            runs.append(m.group(1))
        else:
            hx = m.group(2).replace(b" ", b"")
            runs.append(bytes.fromhex(hx.decode()))
    return runs


_me = me_runs()
for i, raw in enumerate(_me):
    if i == len(_me) - 1:  # the F2 dict-form run: Differences @0x31
        txt = "".join("€" if b == 0x31 else macexpert_dec(b) for b in raw)
    else:
        txt = "".join(macexpert_dec(b) for b in raw)
    ROWS.append(("macexp-16.pdf", 0, i, txt))

schema = pa.schema([
    ("file", pa.string()), ("page", pa.int32()),
    ("run", pa.int32()), ("text", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden text runs across "
      f"{len(set(r[0] for r in ROWS))} graded files")
