#!/usr/bin/env python3
"""Foreign-fixture writer for the audio-metadata scans (q_flac_meta /
q_id3_tags) — the audio half of a multimodal corpus ships as FLAC and
MP3, and curation runs on their METADATA (sample rate, channels,
duration, title/artist/language comments) long before any sample is
decoded. Files are assembled against the public specs (FLAC metadata
blocks: STREAMINFO's packed bitfields and the little-endian
VORBIS_COMMENT block inside a big-endian container; ID3v2.3/2.4
headers with syncsafe sizes, text frames in Latin-1/UTF-8/UTF-16, and
the MPEG-1 Layer III frame header), NOT by any audio library; the
golden parquet is computed from the tables used to WRITE.

Layout written under tools/fixtures/q_flac_meta/:
  tone-00.flac   STREAMINFO + VORBIS_COMMENT (vendor + 4 fields,
                 one with a '=' in the value) + a skipped SEEKTABLE
                 and PADDING; fake audio frames after the last block
  nocomment-01.flac STREAMINFO only (last-flag set on first block)
  bad-02.flac    STREAMINFO shorter than 34 bytes -> refusal
and under tools/fixtures/q_id3_tags/:
  song-00.mp3    ID3v2.3 (plain-size frames): TIT2/TPE1 Latin-1,
                 TALB UTF-16LE+BOM, COMM skipped, then 3 MPEG-1
                 Layer III frames at 128 kbps / 44100 Hz
  song-01.mp3    ID3v2.4 (syncsafe frames): TIT2 UTF-8, TLAN;
                 2 frames at 192 kbps / 48000 Hz
  bare-02.mp3    NO ID3 tag, straight MPEG frames (metadata rows
                 still report the stream shape)
  bad-03.mp3     ID3 header whose size runs past EOF -> refusal
bad files' ABSENCE from the goldens is itself graded.
"""
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
DF = os.path.join(BASE, "q_flac_meta")
DI = os.path.join(BASE, "q_id3_tags")
os.makedirs(os.path.join(DF, "golden"), exist_ok=True)
os.makedirs(os.path.join(DI, "golden"), exist_ok=True)

FROWS = []  # (file, kind, key, sval, num)
IROWS = []  # (file, kind, key, sval, num)


# ---------------- FLAC ----------------
def streaminfo(min_bs, max_bs, min_fs, max_fs, rate, ch, bps, total):
    out = struct.pack(">HH", min_bs, max_bs)
    out += min_fs.to_bytes(3, "big") + max_fs.to_bytes(3, "big")
    packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    out += packed.to_bytes(8, "big")
    out += bytes(16)  # md5 of raw samples: zeros (unset)
    assert len(out) == 34
    return out


def block(btype, data, last=False):
    return bytes([(0x80 if last else 0) | btype]) + \
        len(data).to_bytes(3, "big") + data


def vorbis_comment(vendor, fields):
    out = struct.pack("<I", len(vendor)) + vendor.encode()
    out += struct.pack("<I", len(fields))
    for k, v in fields:
        kv = ("%s=%s" % (k, v)).encode("utf-8")
        out += struct.pack("<I", len(kv)) + kv
    return out


si0 = dict(min_bs=4096, max_bs=4096, min_fs=1200, max_fs=5800,
           rate=44100, ch=2, bps=16, total=441000)
vc0 = [("TITLE", "Graft Tone"), ("ARTIST", "The Walkers"),
       ("LANGUAGE", "wo"), ("NOTES", "a=b=c nested equals")]
flac0 = b"fLaC"
flac0 += block(0, streaminfo(**si0))
flac0 += block(3, bytes(18 * 2))  # seektable: 2 placeholder points
flac0 += block(4, vorbis_comment("graft golden 1.0", vc0))
flac0 += block(1, bytes(64), last=True)  # padding
flac0 += b"\xff\xf8" + bytes(62)  # fake audio frames: never parsed
with open(os.path.join(DF, "tone-00.flac"), "wb") as fh:
    fh.write(flac0)
for k, v in [("sample_rate", 44100), ("channels", 2), ("bits", 16),
             ("total_samples", 441000)]:
    FROWS.append(("tone-00.flac", "streaminfo", k, None, v))
FROWS.append(("tone-00.flac", "streaminfo", "duration_ms", None,
              441000 * 1000 // 44100))
FROWS.append(("tone-00.flac", "vendor", "vendor", "graft golden 1.0", 0))
for k, v in vc0:
    FROWS.append(("tone-00.flac", "comment", k.upper(), v, 0))

si1 = dict(min_bs=1024, max_bs=1024, min_fs=0, max_fs=0,
           rate=96000, ch=1, bps=24, total=0)  # total unknown: 0
flac1 = b"fLaC" + block(0, streaminfo(**si1), last=True) + b"\xff\xf8"
with open(os.path.join(DF, "nocomment-01.flac"), "wb") as fh:
    fh.write(flac1)
for k, v in [("sample_rate", 96000), ("channels", 1), ("bits", 24),
             ("total_samples", 0)]:
    FROWS.append(("nocomment-01.flac", "streaminfo", k, None, v))
# total==0 means unknown: no duration row

with open(os.path.join(DF, "bad-02.flac"), "wb") as fh:
    fh.write(b"fLaC" + block(0, bytes(20), last=True))

# ---------------- MP3 / ID3v2 ----------------
def syncsafe(n):
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def id3(ver, frames):
    body = b""
    for fid, data in frames:
        size = syncsafe(len(data)) if ver == 4 else \
            struct.pack(">I", len(data))
        body += fid.encode() + size + b"\x00\x00" + data
    return b"ID3" + bytes([ver, 0, 0]) + syncsafe(len(body)) + body


def mpeg_frame(bitrate_kbps, rate, count):
    # MPEG-1 Layer III: frame len = 144*bitrate/rate (+padding 0)
    bt = {128: 0b1001, 192: 0b1011}[bitrate_kbps]
    rt = {44100: 0b00, 48000: 0b01}[rate]
    hdr = bytes([0xFF, 0xFB, (bt << 4) | (rt << 2), 0x00])
    flen = 144 * bitrate_kbps * 1000 // rate
    return (hdr + bytes(flen - 4)) * count


t16 = "Album Wolof".encode("utf-16-le")
song0 = id3(3, [
    ("TIT2", b"\x00Dakar Nights"),                 # Latin-1
    ("TPE1", b"\x00Orchestra Graft"),
    ("TALB", b"\x01\xff\xfe" + t16),               # UTF-16 with BOM
    ("COMM", b"\x00engA comment frame: skipped"),
]) + mpeg_frame(128, 44100, 3)
with open(os.path.join(DI, "song-00.mp3"), "wb") as fh:
    fh.write(song0)
for k, v in [("TIT2", "Dakar Nights"), ("TPE1", "Orchestra Graft"),
             ("TALB", "Album Wolof")]:
    IROWS.append(("song-00.mp3", "tag", k, v, 0))
for k, v in [("mpeg_version", 1), ("layer", 3), ("bitrate_kbps", 128),
             ("sample_rate", 44100), ("frame_bytes",
                                      144 * 128000 // 44100)]:
    IROWS.append(("song-00.mp3", "stream", k, None, v))

song1 = id3(4, [
    ("TIT2", b"\x03Syncsafe \xc3\xa9tude"),        # UTF-8
    ("TLAN", b"\x00fra"),
]) + mpeg_frame(192, 48000, 2)
with open(os.path.join(DI, "song-01.mp3"), "wb") as fh:
    fh.write(song1)
for k, v in [("TIT2", "Syncsafe étude"), ("TLAN", "fra")]:
    IROWS.append(("song-01.mp3", "tag", k, v, 0))
for k, v in [("mpeg_version", 1), ("layer", 3), ("bitrate_kbps", 192),
             ("sample_rate", 48000), ("frame_bytes",
                                      144 * 192000 // 48000)]:
    IROWS.append(("song-01.mp3", "stream", k, None, v))

bare = mpeg_frame(128, 44100, 2)
with open(os.path.join(DI, "bare-02.mp3"), "wb") as fh:
    fh.write(bare)
for k, v in [("mpeg_version", 1), ("layer", 3), ("bitrate_kbps", 128),
             ("sample_rate", 44100), ("frame_bytes",
                                      144 * 128000 // 44100)]:
    IROWS.append(("bare-02.mp3", "stream", k, None, v))

bad = b"ID3" + bytes([3, 0, 0]) + syncsafe(10_000_000) + b"\x00" * 16
with open(os.path.join(DI, "bad-03.mp3"), "wb") as fh:
    fh.write(bad)

schema = pa.schema([
    ("file", pa.string()), ("kind", pa.string()), ("key", pa.string()),
    ("sval", pa.string()), ("num", pa.int64()),
])
for rows, d in ((FROWS, DF), (IROWS, DI)):
    tbl = pa.Table.from_pylist(
        [dict(zip([f.name for f in schema], r)) for r in rows],
        schema=schema)
    pq.write_table(tbl, os.path.join(d, "golden", "expected.parquet"))
    print(f"{os.path.basename(d)}: {len(rows)} golden rows, "
          f"{len(set(r[0] for r in rows))} graded files")
