#!/usr/bin/env python3
"""Foreign-fixture writer for the subtitle-cue scan (q_vtt_cues) —
WebVTT and SRT files are the caption layer of every video corpus
(YouTube-style ASR output ships as VTT; movie/TV corpora as SRT), and
caption-to-frame alignment is how video-text training pairs are
built. Files are written here by hand against the public formats
(W3C WebVTT: header line, NOTE/STYLE/REGION blocks, optional cue
identifiers, `HH:MM:SS.mmm --> HH:MM:SS.mmm` with optional settings,
multi-line payloads; SRT: numeric counters and comma decimals); the
golden parquet is computed from the cue tables used to WRITE, by
independent expansion — never by the engine under test.

Layout written under tools/fixtures/q_vtt_cues/:
  talk-00.vtt   WEBVTT with a NOTE block, a STYLE block, cue ids,
                cue settings after the arrow, multi-line payloads,
                and a short MM:SS.mmm timestamp
  talk-01.srt   SRT flavor: numeric counters, comma decimals, CRLF
  cap-06.vtt    the caption-alignment subject: cues over the 3-second
                cap-06.mp4 timeline (q_caption_align joins the two)
  empty-02.vtt  a valid header with zero cues (parses to no rows)
  bad-03.vtt    no WEBVTT header -> whole-file refusal
bad-03's ABSENCE from the golden is itself graded.
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_vtt_cues")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, cue, start_ms, end_ms, text)


def emit(fname, cues):
    for i, (start, end, text) in enumerate(cues):
        ROWS.append((fname, i, start, end, text))


def ts_vtt(ms, short=False):
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    if short and h == 0:
        return "%02d:%02d.%03d" % (m, s, milli)
    return "%02d:%02d:%02d.%03d" % (h, m, s, milli)


def ts_srt(ms):
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    return "%02d:%02d:%02d,%03d" % (h, m, s, milli)


# ---- talk-00.vtt
talk = [
    (0, 2500, "Welcome back, everyone."),
    (2500, 5000, "Today we cover container formats\nand why they matter."),
    (61000, 63750, "One minute in: a short-form timestamp."),
    (3599000, 3601500, "An hour boundary crossing cue."),
]
vtt = "WEBVTT - graft golden\n\n"
vtt += "NOTE\nthis block must be skipped\nentirely\n\n"
vtt += "STYLE\n::cue { color: lime }\n\n"
vtt += "intro\n%s --> %s\n%s\n\n" % (ts_vtt(talk[0][0]), ts_vtt(talk[0][1]),
                                     talk[0][2])
vtt += "%s --> %s align:start position:10%%\n%s\n\n" % (
    ts_vtt(talk[1][0]), ts_vtt(talk[1][1]), talk[1][2])
vtt += "%s --> %s\n%s\n\n" % (ts_vtt(talk[2][0], short=True),
                              ts_vtt(talk[2][1], short=True), talk[2][2])
vtt += "outro\n%s --> %s\n%s\n" % (ts_vtt(talk[3][0]), ts_vtt(talk[3][1]),
                                   talk[3][2])
with open(os.path.join(D, "talk-00.vtt"), "w") as fh:
    fh.write(vtt)
emit("talk-00.vtt", talk)

# ---- talk-01.srt (CRLF, comma decimals)
srt_cues = [
    (100, 1900, "Premier sous-titre."),
    (2000, 4250, "Deux lignes de texte\nsur un seul cue."),
    (4300, 7000, "Dernier."),
]
srt = ""
for i, (start, end, text) in enumerate(srt_cues):
    srt += "%d\r\n%s --> %s\r\n%s\r\n\r\n" % (
        i + 1, ts_srt(start), ts_srt(end), text.replace("\n", "\r\n"))
with open(os.path.join(D, "talk-01.srt"), "wb") as fh:
    fh.write(srt.encode("utf-8"))
emit("talk-01.srt", srt_cues)

# ---- cap-06.vtt: cues over cap-06.mp4's 3-second, 250 ms/frame
# timeline; gaps and overlaps on purpose (frames 5 and 6 fall in the
# gap; the last cue runs past the video)
cap_cues = [
    (0, 600, "a red square appears"),
    (600, 1250, "it moves to the left"),
    (1600, 2400, "a dog runs through"),
    (2400, 3400, "fade to black"),
]
cv = "WEBVTT\n\n"
for start, end, text in cap_cues:
    cv += "%s --> %s\n%s\n\n" % (ts_vtt(start), ts_vtt(end), text)
with open(os.path.join(D, "cap-06.vtt"), "w") as fh:
    fh.write(cv)
emit("cap-06.vtt", cap_cues)

# ---- cap-07.vtt: cues for the SECOND caption-alignment video
# (cap-07.mp4, 2 s at 250 ms/frame) — windows deliberately overlap
# cap-06's [0, 3400] range so q_caption_align's stem key is what keeps
# the two videos' timelines apart
cap2_cues = [
    (0, 500, "a blue circle appears"),
    (500, 1200, "it spins faster"),
    (1300, 2000, "credits roll"),
]
cv2 = "WEBVTT\n\n"
for start, end, text in cap2_cues:
    cv2 += "%s --> %s\n%s\n\n" % (ts_vtt(start), ts_vtt(end), text)
with open(os.path.join(D, "cap-07.vtt"), "w") as fh:
    fh.write(cv2)
emit("cap-07.vtt", cap2_cues)

# ---- cap-08.vtt: cues for the THIRD caption-alignment video
# (cap-08.mp4, which bears an EDIT LIST shifting its pts by -500 ms);
# windows again overlap the other caps' ranges so the stem key stays
# load-bearing. Frames presented before the edit start (negative pts)
# and in the 1500-1800 gap drop out of the alignment.
cap3_cues = [
    (0, 700, "a green triangle appears"),
    (700, 1500, "it rotates slowly"),
    (1800, 2300, "the scene darkens"),
]
cv3 = "WEBVTT\n\n"
for start, end, text in cap3_cues:
    cv3 += "%s --> %s\n%s\n\n" % (ts_vtt(start), ts_vtt(end), text)
with open(os.path.join(D, "cap-08.vtt"), "w") as fh:
    fh.write(cv3)
emit("cap-08.vtt", cap3_cues)

# ---- asr-04.vtt: YouTube-style ASR output — metadata lines attached
# directly under WEBVTT with NO separating blank line (spec-valid; the
# whole header BLOCK must be skipped, not just line 0)
asr_cues = [
    (0, 1500, "so today we're going to"),
    (1500, 3200, "talk about parsers"),
]
asr = "WEBVTT\nKind: captions\nLanguage: en\n\n"
for start, end, text in asr_cues:
    asr += "%s --> %s align:start position:0%%\n%s\n\n" % (
        ts_vtt(start), ts_vtt(end), text)
with open(os.path.join(D, "asr-04.vtt"), "w") as fh:
    fh.write(asr)
emit("asr-04.vtt", asr_cues)

# ---- empty-02.vtt: header only
with open(os.path.join(D, "empty-02.vtt"), "w") as fh:
    fh.write("WEBVTT\n")

# ---- bad-03.vtt: missing header -> refusal
with open(os.path.join(D, "bad-03.vtt"), "w") as fh:
    fh.write("00:00.000 --> 00:01.000\nno header\n")

schema = pa.schema([
    ("file", pa.string()), ("cue", pa.int32()),
    ("start_ms", pa.int64()), ("end_ms", pa.int64()),
    ("text", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden cue rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
