#!/usr/bin/env python3
"""Foreign-fixture writer for the Ogg/Opus metadata scan
(q_opus_meta) — podcast and speech corpora ship as Ogg/Opus, and
curation needs channels/duration/tags without an Opus decoder. Files
are assembled against the public specs (RFC 3533 Ogg pages: capture
pattern, lacing-value packet segmentation with 255-continuation,
page CRC32 with the 0x04c11db7 forward polynomial; RFC 7845 OpusHead
and OpusTags — the latter the same comment grammar as FLAC's
Vorbis block), NOT by any media library; the golden parquet is
computed from the tables used to WRITE.

Layout under tools/fixtures/q_opus_meta/:
  talk-00.opus   OpusHead (stereo, preskip 312, 48 kHz input), an
                 OpusTags packet that SPANS TWO PAGES (the lacing
                 continuation case), three audio pages, EOS granule
                 96312 -> exactly 2.000 s after preskip
  mono-01.opus   mono, no comments beyond vendor, one audio page
  badcrc-02.opus a flipped CRC -> whole-file refusal
  multi-03.opus  two interleaved serials -> refusal (multiplexed
                 streams are out of envelope)
"""
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_opus_meta")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, kind, key, idx, num, sval)

CRC_TABLE = []
for i in range(256):
    r = i << 24
    for _ in range(8):
        r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if (r & 0x80000000) \
            else (r << 1) & 0xFFFFFFFF
    CRC_TABLE.append(r)


def ogg_crc(data):
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def page(htype, granule, serial, seq, segments):
    """segments: list of byte chunks, each <= 255 (pre-laced)."""
    lacing = bytes(len(s) for s in segments)
    body = b"".join(segments)
    hdr = (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule) +
           struct.pack("<II", serial, seq) + b"\x00\x00\x00\x00" +
           bytes([len(segments)]) + lacing)
    crc = ogg_crc(hdr[:22] + b"\x00\x00\x00\x00" + hdr[26:] + body)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body


def lace(packet, close=True):
    """Split one packet into lacing segments; a final 255 segment means
    'continues' — append a 0 only when closing an exact multiple."""
    segs = []
    i = 0
    while len(packet) - i >= 255:
        segs.append(packet[i:i + 255])
        i += 255
    if close:
        segs.append(packet[i:])  # may be b'' (the 0-lacing terminator)
    else:
        assert i == len(packet)
    return segs


def opus_head(ch, preskip, rate):
    return (b"OpusHead" + bytes([1, ch]) + struct.pack("<H", preskip) +
            struct.pack("<I", rate) + struct.pack("<h", 0) + bytes([0]))


def opus_tags(vendor, comments):
    out = b"OpusTags" + struct.pack("<I", len(vendor)) + vendor.encode()
    out += struct.pack("<I", len(comments))
    for k, v in comments:
        kv = ("%s=%s" % (k, v)).encode("utf-8")
        out += struct.pack("<I", len(kv)) + kv
    return out


# ---- talk-00.opus
serial = 0x4753
head = opus_head(2, 312, 48000)
tags = opus_tags("graft opus 1.0",
                 [("TITLE", "Interview, part 1"),
                  ("LANGUAGE", "fr"),
                  ("ENCODER", "graft=golden")])
# pad the tags packet past 255 bytes so it spans two pages
tags += b"\x00" * (300 - len(tags)) if len(tags) < 300 else b""
p0 = page(2, 0, serial, 0, lace(head))                   # BOS
t_segs = lace(tags)
assert len(t_segs) >= 2 and len(t_segs[0]) == 255
# granule -1: no packet ends on this page (it continues into p2)
p1 = page(0, -1, serial, 1, t_segs[:1])
p2 = page(1, 0, serial, 2, t_segs[1:])                   # continuation
audio1 = page(0, 48312 - 960, serial, 3, lace(b"\x11" * 100))
audio2 = page(0, 48312, serial, 4, lace(b"\x22" * 80))
audio3 = page(4, 96312, serial, 5, lace(b"\x33" * 60))   # EOS
with open(os.path.join(D, "talk-00.opus"), "wb") as fh:
    fh.write(p0 + p1 + p2 + audio1 + audio2 + audio3)
ROWS += [
    ("talk-00.opus", "stream", "channels", 0, 2, None),
    ("talk-00.opus", "stream", "preskip", 0, 312, None),
    ("talk-00.opus", "stream", "input_rate", 0, 48000, None),
    ("talk-00.opus", "stream", "duration_ms", 0,
     (96312 - 312) * 1000 // 48000, None),
    ("talk-00.opus", "stream", "pages", 0, 6, None),
    ("talk-00.opus", "vendor", "vendor", 0, 0, "graft opus 1.0"),
    ("talk-00.opus", "comment", "TITLE", 0, 0, "Interview, part 1"),
    ("talk-00.opus", "comment", "LANGUAGE", 1, 0, "fr"),
    ("talk-00.opus", "comment", "ENCODER", 2, 0, "graft=golden"),
]

# ---- mono-01.opus
s1 = 0x1111
h1 = opus_head(1, 0, 16000)
t1 = opus_tags("v", [])
q0 = page(2, 0, s1, 0, lace(h1))
q1 = page(0, 0, s1, 1, lace(t1))
q2 = page(4, 24000, s1, 2, lace(b"\x44" * 30))
with open(os.path.join(D, "mono-01.opus"), "wb") as fh:
    fh.write(q0 + q1 + q2)
ROWS += [
    ("mono-01.opus", "stream", "channels", 0, 1, None),
    ("mono-01.opus", "stream", "preskip", 0, 0, None),
    ("mono-01.opus", "stream", "input_rate", 0, 16000, None),
    ("mono-01.opus", "stream", "duration_ms", 0, 24000 * 1000 // 48000,
     None),
    ("mono-01.opus", "stream", "pages", 0, 3, None),
    ("mono-01.opus", "vendor", "vendor", 0, 0, "v"),
]

# ---- badcrc-02.opus: flip a CRC byte
good = open(os.path.join(D, "mono-01.opus"), "rb").read()
bad = bytearray(good)
bad[22] ^= 0xFF
with open(os.path.join(D, "badcrc-02.opus"), "wb") as fh:
    fh.write(bytes(bad))

# ---- multi-03.opus: a second serial interleaved -> refusal
other = page(2, 0, 0x9999, 0, lace(opus_head(1, 0, 8000)))
with open(os.path.join(D, "multi-03.opus"), "wb") as fh:
    fh.write(q0 + other + q1 + q2)

schema = pa.schema([
    ("file", pa.string()), ("kind", pa.string()), ("key", pa.string()),
    ("idx", pa.int32()), ("num", pa.int64()), ("sval", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
