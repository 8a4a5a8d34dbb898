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

    def build(self, extra_tail=None):
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
        out += b"trailer\n<< /Size %d /Root 1 0 R >>\n" % (maxn + 1)
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

schema = pa.schema([
    ("file", pa.string()), ("page", pa.int32()),
    ("run", pa.int32()), ("text", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden text runs across "
      f"{len(set(r[0] for r in ROWS))} graded files")
