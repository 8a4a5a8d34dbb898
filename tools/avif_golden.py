#!/usr/bin/env python3
"""Foreign-fixture writer for the AVIF/HEIF metadata scan
(q_avif_meta) — AVIF is the fastest-growing image format on the web
and iPhones ship HEIC; both are ISO-BMFF `meta` files whose first
pass (dimensions, item table, byte extents, embedded EXIF) needs no
AV1/HEVC decoder. Files are assembled against the public specs
(ISO/IEC 14496-12 boxes; 23008-12 meta/pitm/iinf/infe/iloc/iprp:
ispe properties, ipma associations, iloc extents across versions),
NOT by any media library; the golden parquet is computed from the
tables used to WRITE. Pixel decode stays at the stub boundary — the
Mp4Codec split.

Layout under tools/fixtures/q_avif_meta/:
  photo-00.avif  primary av01 item whose payload spans TWO iloc
                 extents (md5 graded over the concatenation — the
                 ranged-fetch proof), an ispe 1280x720 associated to
                 the primary item via ipma, an Exif item with GPS
                 (image PII through the shared TIFF walk), iloc v0
  alpha-01.avif  iloc v1 with base_offset, 4-byte lengths, a second
                 (alpha) av01 item, ispe 64x64, ipma v0 with 2 props
  trunc-02.avif  an iloc extent past EOF -> whole-file refusal
"""
import hashlib
import os
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exif_golden import tiff_block  # noqa: E402

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_avif_meta")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, kind, key, idx, num, sval)


def box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full(typ, version, flags, payload):
    return box(typ, bytes([version]) + flags.to_bytes(3, "big") + payload)


def infe(item_id, item_type, name=b"", version=2):
    # v2: u16 item_ID; v3+: u32 item_ID (ISO 14496-12 section 8.11.6)
    if version >= 3:
        head = struct.pack(">IH", item_id, 0)
    else:
        head = struct.pack(">HH", item_id, 0)
    return full(b"infe", version, 0, head + item_type + name + b"\x00")


def ispe(w, h):
    return full(b"ispe", 0, 0, struct.pack(">II", w, h))


def build(fname, items, primary, props, assocs, iloc_version,
          base_offset=0, infe_version=2):
    """items: [(item_id, type4cc, [payload bytes per extent])]
    props: list of property boxes (1-based index order)
    assocs: [(item_id, [prop_index, ...])]"""
    hdlr = full(b"hdlr", 0, 0, struct.pack(">I4s12x", 0, b"pict") +
                b"graft avif\x00")
    pitm = full(b"pitm", 0, 0, struct.pack(">H", primary))
    iinf = full(b"iinf", 0, 0, struct.pack(">H", len(items)) +
                b"".join(infe(i, t, version=infe_version)
                         for i, t, _ in items))
    ipco = box(b"ipco", b"".join(props))
    ipma_body = struct.pack(">I", len(assocs))
    for item_id, pidx in assocs:
        ipma_body += struct.pack(">H", item_id) + bytes([len(pidx)])
        for pi in pidx:
            ipma_body += bytes([pi & 0x7F])
    ipma = full(b"ipma", 0, 0, ipma_body)
    iprp = box(b"iprp", ipco + ipma)

    # two-pass: compute mdat payload offsets after the meta box
    def iloc_box(offsets):
        # offset_size=4, length_size=4, base_offset_size=4 (v1) or 0
        bos = 4 if iloc_version == 1 else 0
        body = bytes([0x44, bos << 4])
        body += struct.pack(">H", len(items))
        for (item_id, _t, extents) in items:
            body += struct.pack(">H", item_id)
            if iloc_version == 1:
                body += struct.pack(">H", 0)  # construction_method 0
            body += struct.pack(">H", 0)      # data_reference_index
            if bos:
                body += struct.pack(">I", base_offset)
            body += struct.pack(">H", len(extents))
            for (off, ln) in offsets[item_id]:
                body += struct.pack(">II", off - base_offset, ln)
        return full(b"iloc", iloc_version, 0, body)

    zero = {i: [(base_offset, len(p)) for p in ext]
            for i, _t, ext in items}
    meta_len = len(full(b"meta", 0, 0, hdlr + pitm + iinf +
                        iloc_box(zero) + iprp))
    ftyp = box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1")
    mdat_payload = b""
    offsets = {}
    pos = len(ftyp) + meta_len + 8
    for item_id, _t, extents in items:
        offsets[item_id] = []
        for p in extents:
            offsets[item_id].append((pos, len(p)))
            mdat_payload += p
            pos += len(p)
    meta = full(b"meta", 0, 0, hdlr + pitm + iinf + iloc_box(offsets) +
                iprp)
    assert len(meta) == meta_len
    data = ftyp + meta + box(b"mdat", mdat_payload)
    with open(os.path.join(D, fname), "wb") as fh:
        fh.write(data)
    return data


def lcg(n, seed):
    s = seed
    out = bytearray()
    for _ in range(n):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((s >> 16) & 0xFF)
    return bytes(out)


# ---- photo-00.avif
gps = [
    (0x0001, 2, "N"),
    (0x0002, 5, [(35, 1), (39, 1), (1050, 100)]),
    (0x0003, 2, "E"),
    (0x0004, 5, [(139, 1), (44, 1), (2500, 100)]),
]
exif_payload = (struct.pack(">I", 6) + b"Exif\x00\x00" +
                tiff_block(b"MM", [(0x0110, 2, "AVIF Cam")], [], gps))
av01_ext = [lcg(300, 11), lcg(144, 77)]  # TWO extents
items0 = [(1, b"av01", av01_ext), (2, b"Exif", [exif_payload])]
build("photo-00.avif", items0, primary=1,
      props=[ispe(1280, 720)], assocs=[(1, [1])], iloc_version=0)
ROWS += [
    ("photo-00.avif", "primary", "item_id", 0, 1, None),
    ("photo-00.avif", "canvas", "width", 0, 1280, None),
    ("photo-00.avif", "canvas", "height", 0, 720, None),
    ("photo-00.avif", "item", "av01", 1, 444, None),
    ("photo-00.avif", "item", "Exif", 2, len(exif_payload), None),
    ("photo-00.avif", "extent_md5", "av01", 1, 0,
     hashlib.md5(b"".join(av01_ext)).hexdigest()),
    ("photo-00.avif", "extent_md5", "Exif", 2, 0,
     hashlib.md5(exif_payload).hexdigest()),
    ("photo-00.avif", "exif_gps", "lat_deg", 0, 35, None),
    ("photo-00.avif", "exif_gps", "lat_ref", 0, 0, "N"),
    ("photo-00.avif", "exif_gps", "lon_deg", 0, 139, None),
    ("photo-00.avif", "exif_gps", "lon_ref", 0, 0, "E"),
]

# ---- alpha-01.avif: iloc v1 + base_offset, two av01 items
main_p = [lcg(200, 5)]
alpha_p = [lcg(90, 9)]
items1 = [(1, b"av01", main_p), (2, b"av01", alpha_p)]
build("alpha-01.avif", items1, primary=1,
      props=[ispe(64, 64), ispe(64, 64)], assocs=[(1, [1]), (2, [2])],
      iloc_version=1, base_offset=16)
ROWS += [
    ("alpha-01.avif", "primary", "item_id", 0, 1, None),
    ("alpha-01.avif", "canvas", "width", 0, 64, None),
    ("alpha-01.avif", "canvas", "height", 0, 64, None),
    ("alpha-01.avif", "item", "av01", 1, 200, None),
    ("alpha-01.avif", "item", "av01", 2, 90, None),
    ("alpha-01.avif", "extent_md5", "av01", 1, 0,
     hashlib.md5(main_p[0]).hexdigest()),
    ("alpha-01.avif", "extent_md5", "av01", 2, 0,
     hashlib.md5(alpha_p[0]).hexdigest()),
]

# ---- v3ids-03.avif: infe VERSION 3 (u32 item id field, item_type
# shifted by 2) — HEIF writers emit v3 alongside u32-capable boxes; a
# v2-only reader misreads the id/type and refuses or mislabels the
# whole file. The id itself stays small so the v0 pitm/ipma and v1
# iloc carry it unchanged — the v3 LAYOUT is what's under test.
big_p = [lcg(150, 21)]
items3 = [(41, b"av01", big_p)]
build("v3ids-03.avif", items3, primary=41,
      props=[ispe(32, 32)], assocs=[(41, [1])],
      iloc_version=1, base_offset=0, infe_version=3)
ROWS += [
    ("v3ids-03.avif", "primary", "item_id", 0, 41, None),
    ("v3ids-03.avif", "canvas", "width", 0, 32, None),
    ("v3ids-03.avif", "canvas", "height", 0, 32, None),
    ("v3ids-03.avif", "item", "av01", 41, 150, None),
    ("v3ids-03.avif", "extent_md5", "av01", 41, 0,
     hashlib.md5(big_p[0]).hexdigest()),
]

# ---- trunc-02.avif: photo-00 with its mdat cut short
good = open(os.path.join(D, "photo-00.avif"), "rb").read()
with open(os.path.join(D, "trunc-02.avif"), "wb") as fh:
    fh.write(good[:len(good) - 100])

schema = pa.schema([
    ("file", pa.string()), ("kind", pa.string()), ("key", pa.string()),
    ("idx", pa.int32()), ("num", pa.int64()), ("sval", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
