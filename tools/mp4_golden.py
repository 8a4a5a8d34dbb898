#!/usr/bin/env python3
"""Foreign-fixture writer for the MP4/ISO-BMFF sample-table scan
(q_mp4_samples) — files are assembled by a from-scratch ISO base
media file format WRITER against the public spec (ISO/IEC 14496-12:
nested length-prefixed boxes, ftyp/moov/trak/mdia/minf/stbl, the
sample-table quartet stts/stsc/stsz/stco (+co64/stss/ctts), version-0
and version-1 full boxes), NOT by any media library and never by the
engine under test; the golden parquet is computed from the tables
used to WRITE. A video pipeline's first job over a crawled MP4 is
exactly this walk: recover per-sample (offset, size, dts, sync) so
frames can be ranged-fetched and sampled without decoding — decode
itself needs codec libraries and stays out of engine scope.

Layout written under tools/fixtures/q_mp4_samples/:
  vid-00.mp4    one video track: 10 samples over 3 chunks (stsc with
                two runs), varied sizes (stsz sample_size=0 + table),
                two stts runs, sync samples {1,5,9} (stss), ctts
                composition offsets (B-frame shape), 32-bit stco
  av-01.mp4     video + audio tracks: audio has CONSTANT sample size
                (stsz sample_size != 0, no table) and no stss (all
                sync per spec); free/udta boxes to skip on the way
  co64-02.mp4   64-bit chunk offsets (co64) + version-1 mvhd/tkhd/
                mdhd (64-bit durations/times)
  frag-03.mp4   a moof carrying NO traf after a trak-less moov: parses
                under the fragment walk to zero samples (absent from
                the golden either way)
  fmp4-07.mp4   a REAL fragmented file: init segment (empty stbl +
                mvex/trex), three moof+mdat pairs exercising
                default-base-is-moof, explicit base-data-offset,
                implicit trun chaining, tfdt rebase, trex/tfhd/trun
                default precedence, first-sample-flags, signed v1
                composition offsets
  trunc-04.mp4  mdat shorter than the sample table claims -> refusal
  badbox-05.mp4 box size < 8 -> refusal
  cap-08.mp4    third caption subject, EDIT LIST (empty edit + media
                time): pts shift -500 ms, frames clipped before zero
  elst-09.mp4   version-1 (64-bit) elst, media_time only, tsc 90000
  badelst-10.mp4 two normal edit entries whose media ranges OVERLAP
                (media re-presented, two pts per sample) -> refusal
  elst2-11.mp4  multi-segment elst that CLEANLY CONCATENATES (empty
                edit + two contiguous rate-1 segments): collapses to
                the one flat shift and decodes
  baddwell-12.mp4 dwell edit (media_rate 0) -> refusal
  elstgap-13.mp4 GAPPED multi-segment edit list: per-segment pts
                mapping, samples outside every segment dropped (GRADED)
The bad files' ABSENCE from the golden is itself graded.
"""
import hashlib
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_mp4_samples")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, track, handler, codec, tsc, smp, chunk, off, size,
#             dts, dur, pts, sync, md5)


def box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full(typ, version, flags, payload):
    return box(typ, struct.pack(">B3s", version,
                                flags.to_bytes(3, "big")) + payload)


def ftyp():
    return box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")


def mvhd(timescale, duration, v=0):
    if v:
        body = struct.pack(">QQIQ", 3, 4, timescale, duration)
    else:
        body = struct.pack(">IIII", 3, 4, timescale, duration)
    body += struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
    body += b"\x00" * 10
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += b"\x00" * 24
    body += struct.pack(">I", 99)  # next track id
    return full(b"mvhd", v, 0, body)


def tkhd(track_id, duration, v=0):
    if v:
        body = struct.pack(">QQIIQ", 3, 4, track_id, 0, duration)
    else:
        body = struct.pack(">IIIII", 3, 4, track_id, 0, duration)
    body += b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0x0100, 0)
    body += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    body += struct.pack(">II", 640 << 16, 480 << 16)
    return full(b"tkhd", v, 3, body)


def mdhd(timescale, duration, v=0):
    if v:
        body = struct.pack(">QQIQ", 3, 4, timescale, duration)
    else:
        body = struct.pack(">IIII", 3, 4, timescale, duration)
    body += struct.pack(">HH", 0x55C4, 0)  # language 'und'
    return full(b"mdhd", v, 0, body)


def hdlr(handler, name):
    return full(b"hdlr", 0, 0,
                struct.pack(">I4s12x", 0, handler) + name + b"\x00")


def dinf():
    url = full(b"url ", 0, 1, b"")
    return box(b"dinf", full(b"dref", 0, 0, struct.pack(">I", 1) + url))


def stsd(codec):
    # a minimal sample entry: 6 reserved + data_reference_index, then
    # opaque codec-specific bytes the walker must NOT need to parse
    entry = box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\xAA" * 16)
    return full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)


def stts(runs):
    body = struct.pack(">I", len(runs))
    for count, delta in runs:
        body += struct.pack(">II", count, delta)
    return full(b"stts", 0, 0, body)


def ctts(entries, v=0):
    body = struct.pack(">I", len(entries))
    for count, off in entries:
        body += struct.pack(">Ii" if v else ">II", count, off)
    return full(b"ctts", v, 0, body)


def stsc(entries):
    body = struct.pack(">I", len(entries))
    for first_chunk, spc, sdi in entries:
        body += struct.pack(">III", first_chunk, spc, sdi)
    return full(b"stsc", 0, 0, body)


def stsz(sizes, const=0):
    body = struct.pack(">II", const, len(sizes))
    if not const:
        for s in sizes:
            body += struct.pack(">I", s)
    return full(b"stsz", 0, 0, body)


def stco(offsets):
    body = struct.pack(">I", len(offsets))
    for o in offsets:
        body += struct.pack(">I", o)
    return full(b"stco", 0, 0, body)


def co64(offsets):
    body = struct.pack(">I", len(offsets))
    for o in offsets:
        body += struct.pack(">Q", o)
    return full(b"co64", 0, 0, body)


def stss(samples):
    body = struct.pack(">I", len(samples))
    for s in samples:
        body += struct.pack(">I", s)
    return full(b"stss", 0, 0, body)


def elst(entries, v=0):
    """Edit list (§8.6.6). entries: (segment_duration, media_time,
    media_rate_integer); media_time -1 = empty edit."""
    body = struct.pack(">I", len(entries))
    for seg, mt, rate in entries:
        if v:
            body += struct.pack(">Qq", seg, mt)
        else:
            body += struct.pack(">Ii", seg, mt)
        body += struct.pack(">hh", rate, 0)
    return full(b"elst", v, 0, body)


def pts_offset(track, movie_timescale):
    """The flat pts shift an encoder-typical edit list induces:
    leading empty edits delay by segment_duration MOVIE ticks; the
    normal entry's media_time starts presentation there."""
    if not track.edits:
        return 0
    delay = 0
    media = 0
    for seg, mt, _rate in track.edits:
        if mt == -1:
            delay += seg
        else:
            media = mt
            break
    return delay * track.timescale // movie_timescale - media


def edit_segments(track, movie_timescale):
    """Per-segment presentation mapping for GAPPED rate-1 edit lists
    (§8.6.6 player semantics, computed independently from the spec
    text): each normal entry j presents media [M_j, M_j + D_j·tsc/
    movieTsc) at the running presentation cursor; returns
    (media_start, media_end, pts_shift) triples."""
    delay = 0
    norm = []
    for seg, mt, _rate in track.edits:
        if mt == -1:
            assert not norm, "empty edits only lead"
            delay += seg
        else:
            norm.append((seg, mt))
    pres = delay * track.timescale // movie_timescale
    segs = []
    for d, m in norm:
        dm = d * track.timescale // movie_timescale
        assert d * track.timescale % movie_timescale == 0
        segs.append((m, m + dm, pres - m))
        pres += dm
    return segs


def edited_pts(segs, cts):
    """pts for a sample composed at cts, or None if it falls outside
    every segment (dropped, not presented)."""
    for s, e, sh in segs:
        if s <= cts < e:
            return cts + sh
    return None


class Track:
    def __init__(self, track_id, handler, codec, timescale, sizes,
                 stts_runs, stsc_entries, chunks, sync=None,
                 ctts_entries=None, const_size=0, use_co64=False, v=0,
                 edits=None):
        self.track_id = track_id
        self.handler = handler          # b"vide" / b"soun"
        self.codec = codec              # b"avc1" / b"mp4a"
        self.timescale = timescale
        self.sizes = sizes              # per-sample byte sizes
        self.stts_runs = stts_runs      # [(count, delta)]
        self.stsc_entries = stsc_entries  # [(first_chunk, spc, sdi)]
        self.chunks = chunks            # number of chunks
        self.sync = sync                # 1-based sync sample list or None
        self.ctts_entries = ctts_entries
        self.const_size = const_size
        self.use_co64 = use_co64
        self.v = v
        self.edits = edits  # [(segment_duration, media_time, rate)]

    def samples_per_chunk(self):
        """Expand stsc to a per-chunk sample count (spec run-length)."""
        out = []
        for i, (first, spc, _) in enumerate(self.stsc_entries):
            last = (self.stsc_entries[i + 1][0]
                    if i + 1 < len(self.stsc_entries) else self.chunks + 1)
            out.extend([spc] * (last - first))
        assert len(out) == self.chunks and sum(out) == len(self.sizes)
        return out

    def durations(self):
        out = []
        for count, delta in self.stts_runs:
            out.extend([delta] * count)
        assert len(out) == len(self.sizes)
        return out

    def cts_offsets(self):
        if not self.ctts_entries:
            return [0] * len(self.sizes)
        out = []
        for count, off in self.ctts_entries:
            out.extend([off] * count)
        assert len(out) == len(self.sizes)
        return out


def lcg_bytes(n, seed):
    state = seed
    out = bytearray()
    for _ in range(n):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((state >> 16) & 0xFF)
    return bytes(out)


def build(fname, tracks, movie_timescale=1000, extra_moov=b"",
          mdat_pad=0, v=0, golden=True):
    """Assemble ftyp+moov+mdat; chunk payloads interleave by track
    round-robin (the real muxer shape). Returns file bytes and emits
    golden rows."""
    # lay out chunk payloads: round-robin over tracks' chunks
    order = []
    for ci in range(max(t.chunks for t in tracks)):
        for t in tracks:
            if ci < t.chunks:
                order.append((t, ci))
    payloads = {}
    seed = 7
    for t in tracks:
        spc = t.samples_per_chunk()
        si = 0
        for ci in range(t.chunks):
            chunk = []
            for _ in range(spc[ci]):
                chunk.append(lcg_bytes(t.sizes[si], seed))
                seed += 11
                si += 1
            payloads[(t.track_id, ci)] = chunk
    # moov size must be known before chunk offsets; build moov with
    # placeholder offsets first to measure, then rebuild with truth
    def moov_bytes(chunk_offsets):
        traks = b""
        for t in tracks:
            total_dur = sum(t.durations())
            stbl = stsd(t.codec) + stts(t.stts_runs)
            if t.ctts_entries:
                stbl += ctts(t.ctts_entries)
            stbl += stsc(t.stsc_entries)
            stbl += stsz(t.sizes, t.const_size)
            offs = chunk_offsets[t.track_id]
            stbl += co64(offs) if t.use_co64 else stco(offs)
            if t.sync is not None:
                stbl += stss(t.sync)
            mhd = (full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
                   if t.handler == b"vide"
                   else full(b"smhd", 0, 0, struct.pack(">HH", 0, 0)))
            minf = box(b"minf", mhd + dinf() + box(b"stbl", stbl))
            mdia = box(b"mdia", mdhd(t.timescale, total_dur, t.v) +
                       hdlr(t.handler, b"graft golden") + minf)
            edts = (box(b"edts", elst(t.edits, t.v)) if t.edits else b"")
            traks += box(b"trak",
                         tkhd(t.track_id, total_dur, t.v) + edts + mdia)
        return box(b"moov", mvhd(movie_timescale, 4000, v) + traks +
                   extra_moov)
    zero_offs = {t.track_id: [0] * t.chunks for t in tracks}
    head_len = len(ftyp()) + len(moov_bytes(zero_offs))
    mdat_payload = b"\xEE" * mdat_pad  # leading pad inside mdat
    chunk_offsets = {t.track_id: [] for t in tracks}
    pos = head_len + 8 + len(mdat_payload)
    blob = bytearray(mdat_payload)
    for (t, ci) in order:
        chunk_offsets[t.track_id].append(pos)
        for s in payloads[(t.track_id, ci)]:
            blob += s
            pos += len(s)
    data = ftyp() + moov_bytes(chunk_offsets) + box(b"mdat", bytes(blob))
    with open(os.path.join(D, fname), "wb") as fh:
        fh.write(data)
    # golden rows (the INDEPENDENT expansion of the tables);
    # golden="segmented" uses the per-segment gapped-edit-list mapping
    # and DROPS samples outside every segment (the player semantics)
    if not golden:
        return
    for t in tracks:
        spc = t.samples_per_chunk()
        durs = t.durations()
        ctss = t.cts_offsets()
        segs = (edit_segments(t, movie_timescale)
                if golden == "segmented" else None)
        poff = pts_offset(t, movie_timescale)
        si = 0
        dts = 0
        for ci in range(t.chunks):
            off = chunk_offsets[t.track_id][ci]
            for _ in range(spc[ci]):
                size = t.sizes[si]
                payload = data[off:off + size]
                assert len(payload) == size
                sync = (1 if t.sync is None or (si + 1) in t.sync else 0)
                pts = (edited_pts(segs, dts + ctss[si]) if segs is not None
                       else dts + ctss[si] + poff)
                if pts is not None:
                    ROWS.append((fname, t.track_id,
                                 t.handler.decode(), t.codec.decode(),
                                 t.timescale, si, ci, off, size, dts,
                                 durs[si], pts, sync,
                                 hashlib.md5(payload).hexdigest()))
                dts += durs[si]
                off += size
                si += 1


# ---- vid-00.mp4: one video track, rich sample table
vid = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=600,
    sizes=[900, 120, 80, 150, 700, 95, 130, 110, 650, 60],
    stts_runs=[(6, 20), (4, 25)],
    stsc_entries=[(1, 4, 1), (3, 2, 1)],  # chunks 1-2: 4 samples, 3: 2
    chunks=3,
    sync=[1, 5, 9],
    ctts_entries=[(1, 0), (2, 40), (3, 0), (2, 40), (2, 0)],
)
build("vid-00.mp4", [vid])

# ---- av-01.mp4: video + constant-size audio, skip-boxes in the way
vid2 = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=600,
    sizes=[400, 90, 85, 380, 75],
    stts_runs=[(5, 24)],
    stsc_entries=[(1, 3, 1), (2, 2, 1)],
    chunks=2,
    sync=[1, 4],
)
aud = Track(
    track_id=2, handler=b"soun", codec=b"mp4a", timescale=44100,
    sizes=[64] * 8,
    stts_runs=[(8, 1024)],
    stsc_entries=[(1, 4, 1)],
    chunks=2,
    sync=None,  # no stss: every sample is sync per spec
    const_size=64,
)
build("av-01.mp4", [vid2, aud],
      extra_moov=box(b"udta", box(b"free", b"skip me")))

# ---- co64-02.mp4: 64-bit offsets + version-1 time boxes
v1 = Track(
    track_id=1, handler=b"vide", codec=b"hvc1", timescale=90000,
    sizes=[300, 70, 320, 55],
    stts_runs=[(4, 3000)],
    stsc_entries=[(1, 2, 1)],
    chunks=2,
    sync=[1, 3],
    use_co64=True, v=1,
)
build("co64-02.mp4", [v1], mdat_pad=5, v=1)

# ---- cap-06.mp4: the caption-alignment subject (q_caption_align) —
# timescale 1000 (ticks = milliseconds), 12 samples of 250 ms over 3
# chunks; cues live in q_vtt_cues/cap-06.vtt (tools/vtt_golden.py)
cap = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=1000,
    sizes=[220, 60, 75, 210, 65, 80, 205, 55, 70, 215, 50, 85],
    stts_runs=[(12, 250)],
    stsc_entries=[(1, 4, 1)],
    chunks=3,
    sync=[1, 4, 7, 10],
)
build("cap-06.mp4", [cap])

# ---- cap-07.mp4: SECOND caption-alignment subject — its samples and
# cues (q_vtt_cues/cap-07.vtt) overlap cap-06's time RANGE, so the
# q_caption_align stem key is load-bearing: a keyless range join would
# cross-match the two videos' timelines. timescale 600 (ticks are NOT
# milliseconds, exercising the tsc conversion), 8 samples of 150 ticks
# (250 ms) over 2 chunks.
cap2 = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=600,
    sizes=[190, 45, 60, 180, 40, 65, 185, 50],
    stts_runs=[(8, 150)],
    stsc_entries=[(1, 4, 1)],
    chunks=2,
    sync=[1, 5],
)
build("cap-07.mp4", [cap2])

# ---- cap-08.mp4: THIRD caption-alignment subject, bearing an EDIT
# LIST (the encoder-typical shape most real muxers write): one empty
# edit of 500 movie-ms delaying the track, then a normal entry with
# media_time=1000 — net pts shift of 500 - 1000 = -500 ms. Samples 0-1
# present BEFORE the edit start (negative pts: players clip them; the
# caption join drops them since no cue window is negative).
cap3 = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=1000,
    sizes=[240, 55, 70, 225, 45, 85, 230, 60, 75, 220, 40, 90],
    stts_runs=[(12, 250)],
    stsc_entries=[(1, 6, 1)],
    chunks=2,
    sync=[1, 5, 9],
    edits=[(500, -1, 1), (2500, 1000, 1)],
)
build("cap-08.mp4", [cap3])

# ---- elst-09.mp4: VERSION-1 edit list (64-bit entries) with only the
# media_time entry (the B-frame-reorder shape: pts of the first
# presented frame), track timescale 90000 against movie timescale 1000
el9 = Track(
    track_id=1, handler=b"vide", codec=b"hvc1", timescale=90000,
    sizes=[410, 95, 380, 85, 400],
    stts_runs=[(5, 3000)],
    stsc_entries=[(1, 5, 1)],
    chunks=1,
    sync=[1, 4],
    ctts_entries=[(1, 6000), (3, 3000), (1, 0)],
    v=1,
    edits=[(15000, 3000, 1)],
)
build("elst-09.mp4", [el9])

# ---- badelst-10.mp4: TWO normal edit entries whose media ranges
# OVERLAP (segment 2 rewinds into segment 1's range — the media would
# be re-presented, so a sample has TWO pts) — the walker refuses
# whole-file rather than pick one; absence from the golden is the
# grade. (The r18 shape of this fixture was a media GAP, which the
# per-segment mapping now decodes — see elstgap-13.)
bad10 = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=1000,
    sizes=[100, 100],
    stts_runs=[(2, 500)],
    stsc_entries=[(1, 2, 1)],
    chunks=1,
    edits=[(400, 0, 1), (600, 300, 1)],
)
build("badelst-10.mp4", [bad10], golden=False)

# ---- elst2-11.mp4: MULTI-SEGMENT edit list that CLEANLY CONCATENATES
# (the split-at-keyframe shape editor exports write): a leading empty
# edit, then two normal rate-1 segments whose media_times are exactly
# contiguous (M1 = M0 + D0*tsc/movieTsc = 2000 + 400 = 2400). The list
# replays the media continuously, so the walker collapses it to the
# one-segment flat shift (delay 300 - M0 2000 = -1700 ms); pts_offset
# below computes the same thing from the FIRST normal entry.
el11 = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=1000,
    # sizes unique across ALL fixtures: payload bytes are (size, sample
    # index)-keyed LCG output and the ingest spec counts distinct md5s
    sizes=[131, 132, 133, 134, 135, 136, 137, 138],
    stts_runs=[(8, 250)],
    stsc_entries=[(1, 4, 1)],
    chunks=2,
    sync=[1, 5],
    edits=[(300, -1, 1), (400, 2000, 1), (600, 2400, 1)],
)
build("elst2-11.mp4", [el11])

# ---- baddwell-12.mp4: a DWELL edit (media_rate 0 — freeze-frame) —
# no single pts shift exists; the walker refuses whole-file rather
# than drift; absence from the golden is the grade
bad12 = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=1000,
    sizes=[100, 100],
    stts_runs=[(2, 500)],
    stsc_entries=[(1, 2, 1)],
    chunks=1,
    edits=[(500, 0, 0)],
)
build("baddwell-12.mp4", [bad12], golden=False)

# ---- elstgap-13.mp4 (GRADED): a GAPPED multi-segment edit list — a
# leading empty edit (delay 300 movie ticks), then two rate-1 normal
# segments whose media ranges do NOT touch: [1000,1400) presented at
# [300,700) and [2000,2500) presented at [700,1200). The walker maps
# pts PER SEGMENT (the player semantics) and DROPS the 8 of 12
# samples composed before segment 1, in the gap, or after segment 2 —
# the golden carries only the 4 presented samples, computed by the
# independent edit_segments/edited_pts implementation above.
gap13 = Track(
    track_id=1, handler=b"vide", codec=b"avc1", timescale=1000,
    # sizes unique across ALL fixtures (distinct-md5 ingest count)
    sizes=[161, 162, 163, 164, 165, 166, 167, 168, 169, 170, 171, 172],
    stts_runs=[(12, 250)],
    stsc_entries=[(1, 4, 1)],
    chunks=3,
    sync=[1, 5, 9],
    edits=[(300, -1, 1), (400, 1000, 1), (500, 2000, 1)],
)
build("elstgap-13.mp4", [gap13], golden="segmented")

# ---- fmp4-07.mp4: a FRAGMENTED file (the DASH/HLS/CMAF segment
# shape) written by this independent fragment muxer — init segment
# (moov with an EMPTY stbl + mvex/trex defaults), then three moof+mdat
# pairs exercising: default-base-is-moof anchoring with trex-default
# durations and tfhd-default sizes + first-sample-flags (frag 1),
# per-sample size/flags/SIGNED-cts overrides in a v1 trun (frag 2),
# explicit base-data-offset with TWO truns, the second continuing
# after the first run's data (frag 3, tfdt rebase). Golden rows come
# from the tables used to WRITE, never from the walker under test.

def _empty_stbl():
    return (stsd(b"avc1") + stts([]) + stsc([]) + stsz([]) + stco([]))


def _fmp4_moov(track_id, timescale, trex_dur, trex_size, trex_flags):
    mhd = full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = box(b"minf", mhd + dinf() + box(b"stbl", _empty_stbl()))
    mdia = box(b"mdia", mdhd(timescale, 0) + hdlr(b"vide", b"graft fmp4") +
               minf)
    trak = box(b"trak", tkhd(track_id, 0) + mdia)
    trex = full(b"trex", 0, 0,
                struct.pack(">IIIII", track_id, 1, trex_dur, trex_size,
                            trex_flags))
    return box(b"moov", mvhd(1000, 0) + trak + box(b"mvex", trex))


def _tfhd(track_id, flags, fields):
    return full(b"tfhd", 0, flags,
                struct.pack(">I", track_id) + fields)


def _tfdt(t, v=1):
    return full(b"tfdt", v, 0,
                struct.pack(">Q", t) if v else struct.pack(">I", t))


def _trun(version, flags, n, data_off, first_flags, rows):
    """rows: list of per-sample tuples in flag order
    (dur?, size?, flags?, cts?) — include only the fields the flags
    declare."""
    body = struct.pack(">I", n)
    if flags & 0x01:
        body += struct.pack(">i", data_off)
    if flags & 0x04:
        body += struct.pack(">I", first_flags)
    for r in rows:
        for val in r:
            if val < 0:
                body += struct.pack(">i", val)  # signed cts (v1)
            else:
                body += struct.pack(">I", val)
    return full(b"trun", version, flags, body)


FMP4 = "fmp4-07.mp4"
TSC7 = 1000
NONSYNC = 0x10000
payload7 = []  # (bytes, golden sample row fields)


def _frag_rows(samples, frag_chunk, si0):
    """samples: (size, dur, dts, cts, sync, payload)."""
    for i, (size, dur, dts, cts, sync, data) in enumerate(samples):
        ROWS.append((FMP4, 1, "vide", "avc1", TSC7, si0 + i, frag_chunk,
                     None, size, dts, dur, dts + cts, 1 if sync else 0,
                     hashlib.md5(data).hexdigest()))


moov7 = _fmp4_moov(1, TSC7, trex_dur=100, trex_size=0, trex_flags=NONSYNC)
head7 = ftyp() + moov7
segs = []

# frag 1: default-base-is-moof | default-sample-size; trun has
# data-offset + first-sample-flags; durations from trex
f1_data = [lcg_bytes(50, 31 + i) for i in range(4)]
f1_moof_inner = (full(b"mfhd", 0, 0, struct.pack(">I", 1)) +
                 box(b"traf",
                     _tfhd(1, 0x20000 | 0x10, struct.pack(">I", 50)) +
                     _tfdt(0) +
                     _trun(0, 0x01 | 0x04, 4, 0, 0, [])))
# data_offset (relative to moof start) = len(moof) + 8 (mdat header);
# moof size is independent of the offset VALUE, so compute then rebuild
f1_moof_sz = len(box(b"moof", f1_moof_inner))
f1_moof = box(b"moof", (full(b"mfhd", 0, 0, struct.pack(">I", 1)) +
                        box(b"traf",
                            _tfhd(1, 0x20000 | 0x10,
                                  struct.pack(">I", 50)) +
                            _tfdt(0) +
                            _trun(0, 0x01 | 0x04, 4, f1_moof_sz + 8, 0,
                                  []))))
assert len(f1_moof) == f1_moof_sz
segs.append((f1_moof, b"".join(f1_data)))
_frag_rows([(50, 100, i * 100, 0, i == 0, f1_data[i]) for i in range(4)],
           frag_chunk=0, si0=0)

# frag 2: per-sample size/flags/cts (v1 trun, one NEGATIVE cts);
# durations from a tfhd default override (200); dts continues at 400
f2_sz = [70, 30, 45]
f2_fl = [0, NONSYNC, NONSYNC]
f2_cts = [0, 40, -20]
f2_data = [lcg_bytes(s, 91 + i) for i, s in enumerate(f2_sz)]
f2_rows = [(0, f2_sz[i], f2_fl[i], f2_cts[i]) for i in range(3)]
f2_rows = [r[1:] for r in f2_rows]  # only size/flags/cts fields
f2_inner = (full(b"mfhd", 0, 0, struct.pack(">I", 2)) +
            box(b"traf",
                _tfhd(1, 0x20000 | 0x08, struct.pack(">I", 200)) +
                _trun(1, 0x01 | 0x200 | 0x400 | 0x800, 3, 0, 0, f2_rows)))
f2_sz_moof = len(box(b"moof", f2_inner))
f2_moof = box(b"moof", (full(b"mfhd", 0, 0, struct.pack(">I", 2)) +
                        box(b"traf",
                            _tfhd(1, 0x20000 | 0x08,
                                  struct.pack(">I", 200)) +
                            _trun(1, 0x01 | 0x200 | 0x400 | 0x800, 3,
                                  f2_sz_moof + 8, 0, f2_rows))))
assert len(f2_moof) == f2_sz_moof
segs.append((f2_moof, b"".join(f2_data)))
_frag_rows([(f2_sz[i], 200, 400 + 200 * i, f2_cts[i],
             (f2_fl[i] & NONSYNC) == 0, f2_data[i]) for i in range(3)],
           frag_chunk=1, si0=4)

# frag 3: EXPLICIT base-data-offset; two truns — the first with no
# data-offset (starts at base), the second continuing after it;
# per-sample durations, sizes from tfhd default; tfdt rebases to 5000
f3_dur = [150, 250]
f3_data = [lcg_bytes(40, 171), lcg_bytes(40, 182)]


def _frag3(base_off):
    return box(b"moof",
               full(b"mfhd", 0, 0, struct.pack(">I", 3)) +
               box(b"traf",
                   _tfhd(1, 0x01 | 0x10,
                         struct.pack(">QI", base_off, 40)) +
                   _tfdt(5000) +
                   _trun(0, 0x100, 1, 0, 0, [(f3_dur[0],)]) +
                   _trun(0, 0x100, 1, 0, 0, [(f3_dur[1],)])))


f3_sz_moof = len(_frag3(0))
segs.append((None, b"".join(f3_data)))  # placeholder, patched below
# no flags at trun/tfhd level -> trex default (non-sync) applies
_frag_rows([(40, f3_dur[0], 5000, 0, False, f3_data[0]),
            (40, f3_dur[1], 5000 + f3_dur[0], 0, False, f3_data[1])],
           frag_chunk=2, si0=7)

# assemble: compute absolute positions, then write
pos = len(head7)
blob7 = bytearray(head7)
for i, (moof, data) in enumerate(segs):
    if moof is None:  # frag 3: explicit ABSOLUTE base offset
        base = pos + f3_sz_moof + 8
        moof = _frag3(base)
        assert len(moof) == f3_sz_moof
    blob7 += moof
    pos += len(moof)
    blob7 += box(b"mdat", data)
    pos += 8 + len(data)
with open(os.path.join(D, FMP4), "wb") as fh:
    fh.write(bytes(blob7))
# fix golden offsets now that layout is known: recompute each sample's
# absolute offset by replaying the same layout
_off_rows = [r for r in ROWS if r[0] == FMP4]
_data_pos = []
pos = len(head7)
for (moof, data), nsmp in zip(
        [(m, d) for m, d in segs], [4, 3, 2]):
    msz = f3_sz_moof if moof is None else len(moof)
    pos += msz
    _data_pos.append(pos + 8)
    pos += 8 + len(data)
_sizes_per_frag = [[50] * 4, f2_sz, [40, 40]]
_fixed = []
fi = 0
for r in ROWS:
    if r[0] != FMP4:
        _fixed.append(r)
        continue
    frag = r[6]
    within = r[5] - [0, 4, 7][frag]
    off = _data_pos[frag] + sum(_sizes_per_frag[frag][:within])
    _fixed.append(r[:7] + (off,) + r[8:])
    fi += 1
ROWS[:] = _fixed

# ---- frag-03.mp4: moof present -> refuse whole file
frag = (ftyp() +
        box(b"moov", mvhd(1000, 0) ) +
        box(b"moof", full(b"mfhd", 0, 0, struct.pack(">I", 1))) +
        box(b"mdat", b"\x11" * 32))
with open(os.path.join(D, "frag-03.mp4"), "wb") as fh:
    fh.write(frag)

# ---- trunc-04.mp4: vid-00 cut inside its mdat payload
with open(os.path.join(D, "vid-00.mp4"), "rb") as fh:
    good = fh.read()
with open(os.path.join(D, "trunc-04.mp4"), "wb") as fh:
    fh.write(good[:len(good) - 700])

# ---- badbox-05.mp4: a box that claims size 4 (< header)
with open(os.path.join(D, "badbox-05.mp4"), "wb") as fh:
    fh.write(ftyp() + struct.pack(">I", 4) + b"junk" + b"\x00" * 8)

schema = pa.schema([
    ("file", pa.string()), ("track", pa.int32()),
    ("handler", pa.string()), ("codec", pa.string()),
    ("tsc", pa.int64()),
    ("smp", pa.int32()), ("chunk", pa.int32()),
    ("off", pa.int64()), ("size", pa.int64()),
    ("dts", pa.int64()), ("dur", pa.int64()), ("pts", pa.int64()),
    ("sync", pa.int32()), ("md5", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden sample rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
