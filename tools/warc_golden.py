#!/usr/bin/env python3
"""Foreign-fixture writer for the WARC + zstd ingest surface
(q_warc_extract, q_jsonl_zst) — same independent-writer practice as
the TIFF/gzip/PNG/HDF5 fixtures: the bytes are produced by Python's
gzip module (zlib) and pyarrow's zstd codec (real libzstd), NOT by the
Scala codecs under test, and the golden parquet is computed here with
hashlib, never by Spark.

Layout written under tools/fixtures/:
  q_warc_extract/
    crawl-00.warc.gz   warcinfo + request/response pairs (identity,
                       chunked, gzip, chunked+gzip bodies), 204, metadata
    crawl-01.warc.gz   responses incl. an undecodable Content-Encoding
                       (br) -> row kept with NULL http_status, raw block
                       hashed; and a revisit record
    crawl-02.warc      same record grammar, uncompressed
    corrupt-03.warc.gz valid gzip, Content-Length overruns -> file skipped
    corrupt-04.warc.gz flipped CRC byte -> file skipped
    golden/golden.parquet
  q_jsonl_zst/
    docs-00.jsonl.zst  one frame
    docs-01.jsonl.zst  two concatenated frames with a skippable frame
                       between (zstd `cat a.zst b.zst` / frame-per-block)
    docs-02.jsonl.zst  leading skippable frame
    corrupt-03.jsonl.zst truncated final frame -> file skipped
    golden/golden.parquet
"""
import gzip, hashlib, io, json, os, struct, sys

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def crlf_join(lines):
    return ("\r\n".join(lines) + "\r\n").encode("latin-1")


def warc_record(wtype, rid, block, target=None, ctype=None, date="2026-08-14T00:00:00Z"):
    hdrs = ["WARC/1.0",
            "WARC-Type: " + wtype,
            "WARC-Record-ID: <urn:uuid:%s>" % rid,
            "WARC-Date: " + date]
    if target:
        hdrs.append("WARC-Target-URI: " + target)
    if ctype:
        hdrs.append("Content-Type: " + ctype)
    hdrs.append("Content-Length: %d" % len(block))
    hdrs.append("")
    return crlf_join(hdrs) + block + b"\r\n\r\n"


def http_response(status, reason, payload, ctype="text/html", extra=()):
    hdrs = ["HTTP/1.1 %d %s" % (status, reason),
            "Content-Type: " + ctype,
            "Server: test/1.0"]
    hdrs.extend(extra)
    hdrs.append("")
    return crlf_join(hdrs) + payload


def chunk_encode(payload, sizes):
    out = b""
    pos = 0
    for s in sizes:
        part = payload[pos:pos + s]
        if not part:
            break
        out += ("%x" % len(part)).encode() + b"\r\n" + part + b"\r\n"
        pos += len(part)
    assert pos >= len(payload)
    out += b"0\r\n\r\n"
    return out


def gzip_member(data):
    # one gzip member per record, mtime pinned (Common Crawl layout)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def make_warc():
    d = os.path.join(BASE, "q_warc_extract")
    os.makedirs(os.path.join(d, "golden"), exist_ok=True)
    rows = []  # (file, rec_idx, warc_type, target_uri, http_status, mime, payload_len, payload_md5)

    def add(file, idx, wtype, target, status, mime, payload):
        rows.append((file, idx, wtype, target or "", status, mime,
                     len(payload), hashlib.md5(payload).hexdigest()))

    # ---- crawl-00.warc.gz
    f0 = "crawl-00.warc.gz"
    recs = []
    info = b'software: graft-test-crawler/1.0\r\nformat: WARC File Format 1.0\r\n'
    recs.append(warc_record("warcinfo", "0000", info,
                            ctype="application/warc-fields"))
    add(f0, 0, "warcinfo", None, None, "application/warc-fields", info)

    req = crlf_join(["GET /page HTTP/1.1", "Host: a.example", "Accept: */*", ""])
    recs.append(warc_record("request", "0001", req, target="https://a.example/page",
                            ctype="application/http;msgtype=request"))
    add(f0, 1, "request", "https://a.example/page", None,
        "application/http;msgtype=request", req)

    body_a = (b"<html><head><title>Sahel millet yields</title></head><body>" +
              b"Millet and sorghum dominate smallholder plots in the Sahel; " +
              b"NDVI composites separate cropland from savanna by month nine. " * 4 +
              b"</body></html>")
    blk = http_response(200, "OK", body_a, "text/html; charset=UTF-8")
    recs.append(warc_record("response", "0002", blk, target="https://a.example/page",
                            ctype="application/http;msgtype=response"))
    add(f0, 2, "response", "https://a.example/page", 200,
        "text/html; charset=UTF-8", body_a)

    body_b = (b'{"station":"dakar-01","vv":-11.25,"vh":-17.5,"month":9,' +
              b'"note":"backscatter dips after the first rains"}\n' * 7)
    blk = http_response(200, "OK", chunk_encode(body_b, [64, 100, 3, 500, 9999]),
                        "application/json",
                        extra=["Transfer-Encoding: chunked"])
    recs.append(warc_record("response", "0003", blk, target="https://b.example/api/obs",
                            ctype="application/http;msgtype=response"))
    add(f0, 3, "response", "https://b.example/api/obs", 200,
        "application/json", body_b)

    body_c = (b"Cloud-free Sentinel-2 scenes are rare in August; the QA60 " +
              b"bitmask drops cirrus before the median composite. " * 6)
    blk = http_response(200, "OK", gzip_member(body_c), "text/plain",
                        extra=["Content-Encoding: gzip"])
    recs.append(warc_record("response", "0004", blk, target="https://c.example/notes.txt",
                            ctype="application/http;msgtype=response"))
    add(f0, 4, "response", "https://c.example/notes.txt", 200, "text/plain", body_c)

    body_d = (b"GEDI L2A returns ground elevation and rh98 canopy height; " +
              b"shots intersect the plot polygons within 25 m footprints. " * 5)
    blk = http_response(200, "OK", chunk_encode(gzip_member(body_d), [128, 77, 9999]),
                        "text/plain",
                        extra=["Content-Encoding: gzip", "Transfer-Encoding: chunked"])
    recs.append(warc_record("response", "0005", blk, target="https://c.example/gedi.txt",
                            ctype="application/http;msgtype=response"))
    add(f0, 5, "response", "https://c.example/gedi.txt", 200, "text/plain", body_d)

    blk = http_response(204, "No Content", b"", "text/plain")
    recs.append(warc_record("response", "0006", blk, target="https://a.example/empty",
                            ctype="application/http;msgtype=response"))
    add(f0, 6, "response", "https://a.example/empty", 204, "text/plain", b"")

    meta = b"fetchTimeMs: 312\r\ncharset-detected: utf-8\r\n"
    recs.append(warc_record("metadata", "0007", meta, target="https://a.example/page",
                            ctype="application/warc-fields"))
    add(f0, 7, "metadata", "https://a.example/page", None,
        "application/warc-fields", meta)

    with open(os.path.join(d, f0), "wb") as f:
        for r in recs:
            f.write(gzip_member(r))

    # ---- crawl-01.warc.gz
    f1 = "crawl-01.warc.gz"
    recs = []
    body_e = (b"<html><body><p>Rice paddies along the Senegal river flood in " +
              b"July; SAR VH separates flooded fields from dry fallow.</p>" * 3 +
              b"</body></html>")
    blk = http_response(200, "OK", body_e, "text/html")
    recs.append(warc_record("response", "0100", blk, target="https://d.example/rice",
                            ctype="application/http;msgtype=response"))
    add(f1, 0, "response", "https://d.example/rice", 200, "text/html", body_e)

    # brotli content-encoding: codec refuses the PAYLOAD, keeps the record
    blk_br = http_response(200, "OK", b"\x1b\x3f\x00\x00\x00\x00\x00\x00\x00",
                           "text/html", extra=["Content-Encoding: br"])
    recs.append(warc_record("response", "0101", blk_br, target="https://d.example/br",
                            ctype="application/http;msgtype=response"))
    add(f1, 1, "response", "https://d.example/br", None,
        "application/http;msgtype=response", blk_br)

    blk = http_response(404, "Not Found", b"<html><body>missing</body></html>",
                        "text/html")
    recs.append(warc_record("response", "0102", blk, target="https://d.example/gone",
                            ctype="application/http;msgtype=response"))
    add(f1, 2, "response", "https://d.example/gone", 404, "text/html",
        b"<html><body>missing</body></html>")

    recs.append(warc_record("revisit", "0103", b"", target="https://a.example/page",
                            ctype="message/http"))
    add(f1, 3, "revisit", "https://a.example/page", None, "message/http", b"")

    with open(os.path.join(d, f1), "wb") as f:
        for r in recs:
            f.write(gzip_member(r))

    # ---- crawl-02.warc (uncompressed)
    f2 = "crawl-02.warc"
    body_f = (b"Groundnut basin soils are sandy; potassium limits yields more " +
              b"than nitrogen on the long-cultivated plots. " * 4)
    recs = [
        warc_record("warcinfo", "0200", b"software: graft-test-crawler/1.0\r\n",
                    ctype="application/warc-fields"),
        warc_record("response", "0201",
                    http_response(200, "OK", body_f, "text/plain"),
                    target="https://e.example/soils",
                    ctype="application/http;msgtype=response"),
    ]
    add(f2, 0, "warcinfo", None, None, "application/warc-fields",
        b"software: graft-test-crawler/1.0\r\n")
    add(f2, 1, "response", "https://e.example/soils", 200, "text/plain", body_f)
    with open(os.path.join(d, f2), "wb") as f:
        for r in recs:
            f.write(r)

    # ---- corrupt files: must be skipped whole (no golden rows)
    bad = warc_record("response", "0300",
                      http_response(200, "OK", b"x" * 40, "text/plain"),
                      target="https://bad.example/",
                      ctype="application/http;msgtype=response")
    # overrun Content-Length: declare more than the block that follows
    bad = bad.replace(b"Content-Length: ", b"Content-Length: 9", 1)
    with open(os.path.join(d, "corrupt-03.warc.gz"), "wb") as f:
        f.write(gzip_member(bad))
    good = gzip_member(warc_record("response", "0301",
                       http_response(200, "OK", b"y" * 40, "text/plain"),
                       target="https://bad.example/2",
                       ctype="application/http;msgtype=response"))
    flipped = bytearray(good)
    flipped[-6] ^= 0xFF  # CRC byte
    with open(os.path.join(d, "corrupt-04.warc.gz"), "wb") as f:
        f.write(bytes(flipped))

    table = pa.table({
        "file": pa.array([r[0] for r in rows], pa.string()),
        "rec_idx": pa.array([r[1] for r in rows], pa.int32()),
        "warc_type": pa.array([r[2] for r in rows], pa.string()),
        "target_uri": pa.array([r[3] for r in rows], pa.string()),
        "http_status": pa.array([r[4] for r in rows], pa.int32()),
        "mime": pa.array([r[5] for r in rows], pa.string()),
        "payload_len": pa.array([r[6] for r in rows], pa.int32()),
        "payload_md5": pa.array([r[7] for r in rows], pa.string()),
    })
    pq.write_table(table, os.path.join(d, "golden", "golden.parquet"))
    print("q_warc_extract: %d files, %d golden rows" % (5, len(rows)))


def zstd_frame(data, level=3):
    c = pa.Codec("zstd", compression_level=level)
    buf = c.compress(data, asbytes=True)
    assert buf[:4] == b"\x28\xb5\x2f\xfd", "not a zstd frame"
    return buf


def skippable_frame(payload=b"\x00" * 8, nibble=0):
    return struct.pack("<II", 0x184D2A50 + nibble, len(payload)) + payload


def make_zst():
    d = os.path.join(BASE, "q_jsonl_zst")
    os.makedirs(os.path.join(d, "golden"), exist_ok=True)
    rows = []  # (shard, line_idx, doc_id, lang, text_len, text_md5)

    langs = ["fr", "en", "wo", "pt"]
    topics = [
        "monthly median composite over the rainy season",
        "VV and VH backscatter drop after harvest",
        "NDVI peaks two months after planting in the groundnut basin",
        "cloud masked scenes keep only QA60 clear pixels",
        "canopy height from GEDI rh98 calibrates the regressor",
        "smallholder plots average half a hectare along the river",
    ]

    def shard_lines(shard_no, n, start):
        lines = []
        for i in range(n):
            doc_id = start + i
            lang = langs[(doc_id * 7 + shard_no) % len(langs)]
            text = "doc %d: %s (rev %d)" % (doc_id, topics[doc_id % len(topics)],
                                            (doc_id * 13) % 97)
            lines.append(json.dumps({"doc_id": doc_id, "lang": lang, "text": text},
                                    separators=(",", ":")))
        return lines

    def record(shard, lines):
        for i, l in enumerate(lines):
            o = json.loads(l)
            rows.append((shard, i, o["doc_id"], o["lang"], len(o["text"]),
                         hashlib.md5(o["text"].encode()).hexdigest()))

    s0 = "docs-00.jsonl.zst"
    lines0 = shard_lines(0, 12, 1000)
    with open(os.path.join(d, s0), "wb") as f:
        f.write(zstd_frame(("\n".join(lines0) + "\n").encode()))
    record(s0, lines0)

    s1 = "docs-01.jsonl.zst"
    lines1 = shard_lines(1, 15, 2000)
    half = 8
    with open(os.path.join(d, s1), "wb") as f:
        f.write(zstd_frame(("\n".join(lines1[:half]) + "\n").encode(), level=1))
        f.write(skippable_frame(b"shard-meta\x00\x00", nibble=3))
        f.write(zstd_frame(("\n".join(lines1[half:]) + "\n").encode(), level=19))
    record(s1, lines1)

    s2 = "docs-02.jsonl.zst"
    lines2 = shard_lines(2, 9, 3000)
    with open(os.path.join(d, s2), "wb") as f:
        f.write(skippable_frame(b"leading", nibble=0))
        f.write(zstd_frame(("\n".join(lines2) + "\n").encode()))
    record(s2, lines2)

    whole = zstd_frame(("\n".join(shard_lines(3, 20, 4000)) + "\n").encode())
    with open(os.path.join(d, "corrupt-03.jsonl.zst"), "wb") as f:
        f.write(whole[:len(whole) - 7])

    # sink cross-validation: sink-04.jsonl.zst is produced by the
    # ENGINE's own writer (Sinks.writeJsonlZst via ZstdCodec.encode);
    # golden rows come from PYARROW's independent decompression, so the
    # scan grade pins writer and reader against real libzstd at once.
    sink_path = os.path.join(d, "sink-04.jsonl.zst")
    if not os.path.exists(sink_path):
        raise SystemExit("sink-04.jsonl.zst missing — regenerate it with "
                         "the writeJsonlZst fixture writer first")
    with open(sink_path, "rb") as f:
        blob = f.read()
    assert blob[:4] == b"\x28\xb5\x2f\xfd", "not a zstd frame"
    # frame-header content size (RFC 8878): descriptor byte -> FCS field
    fhd = blob[4]
    fcs_flag, single_seg = fhd >> 6, (fhd >> 5) & 1
    p = 5 + (0 if single_seg else 1) + (0, 1, 2, 4)[fhd & 3]
    if fcs_flag == 0:
        size = blob[p] if single_seg else None
    elif fcs_flag == 1:
        size = int.from_bytes(blob[p:p + 2], "little") + 256
    elif fcs_flag == 2:
        size = int.from_bytes(blob[p:p + 4], "little")
    else:
        size = int.from_bytes(blob[p:p + 8], "little")
    assert size is not None, "frame lacks a content size"
    text = pa.Codec("zstd").decompress(blob, size, asbytes=True).decode()
    sink_lines = [l for l in text.split("\n") if l]
    record("sink-04.jsonl.zst", sink_lines)
    print("sink-04.jsonl.zst verified via pyarrow/libzstd: %d lines"
          % len(sink_lines))

    table = pa.table({
        "shard": pa.array([r[0] for r in rows], pa.string()),
        "line_idx": pa.array([r[1] for r in rows], pa.int64()),
        "doc_id": pa.array([r[2] for r in rows], pa.int64()),
        "lang": pa.array([r[3] for r in rows], pa.string()),
        "text_len": pa.array([r[4] for r in rows], pa.int32()),
        "text_md5": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(table, os.path.join(d, "golden", "golden.parquet"))
    print("q_jsonl_zst: 4 shards, %d golden rows" % len(rows))


def make_wet():
    """WET (extracted-text) deliverable — Common Crawl's *.warc.wet.gz:
    a warcinfo record then one `conversion` record per page whose block
    IS the extracted plain text (no HTTP framing). Golden rows computed
    here with hashlib/len, never by Spark."""
    d = os.path.join(BASE, "q_wet_extract")
    os.makedirs(os.path.join(d, "golden"), exist_ok=True)
    rows = []  # (file, rec_idx, target_uri, mime, text_chars, n_lines, text_md5)

    def add(file, idx, target, text):
        rows.append((file, idx, target, "text/plain", len(text),
                     text.count("\n"),
                     hashlib.md5(text.encode("utf-8")).hexdigest()))

    def conversion(rid, target, text, date="2026-08-14T00:00:00Z"):
        # real WET conversion records carry WARC-Refers-To; the codec
        # passes unknown headers through — include it for realism
        block = text.encode("utf-8")
        hdrs = ["WARC/1.0",
                "WARC-Type: conversion",
                "WARC-Record-ID: <urn:uuid:%s>" % rid,
                "WARC-Refers-To: <urn:uuid:%s-src>" % rid,
                "WARC-Date: " + date,
                "WARC-Target-URI: " + target,
                "Content-Type: text/plain",
                "Content-Length: %d" % len(block),
                ""]
        return crlf_join(hdrs) + block + b"\r\n\r\n"

    texts0 = [
        ("https://a.example/page",
         "Sahel millet yields\nMillet and sorghum dominate smallholder "
         "plots in the Sahel; NDVI composites separate cropland from "
         "savanna by month nine.\n"),
        ("https://b.example/api/obs",
         "station dakar-01\nbackscatter dips after the first rains\n"
         "vv -11.25 vh -17.5 month 9\n"),
        ("https://c.example/notes.txt",
         "Cloud-free Sentinel-2 scenes are rare in August; the QA60 "
         "bitmask drops cirrus before the median composite.\n" * 3),
    ]
    f0 = "crawl-00.warc.wet.gz"
    recs = [warc_record("warcinfo", "w000",
                        b"software: graft-test-wet/1.0\r\n",
                        ctype="application/warc-fields")]
    idx = 1
    for target, text in texts0:
        recs.append(conversion("w%03d" % idx, target, text))
        add(f0, idx, target, text)
        idx += 1
    with open(os.path.join(d, f0), "wb") as f:
        for r in recs:
            f.write(gzip_member(r))

    # unicode text (BMP-only so char counting agrees across engines),
    # an EMPTY extraction, and an uncompressed .wet sibling
    texts1 = [
        ("https://d.example/riz",
         "Les rizières le long du fleuve Sénégal sont "
         "inondées en juillet.\n水稲は七月に"
         "浸水する。\n"),
        ("https://d.example/empty", ""),
        ("https://d.example/soils",
         "Groundnut basin soils are sandy; potassium limits yields "
         "more than nitrogen.\n"),
    ]
    f1 = "crawl-01.warc.wet.gz"
    recs = [warc_record("warcinfo", "w100",
                        b"software: graft-test-wet/1.0\r\n",
                        ctype="application/warc-fields")]
    idx = 1
    for target, text in texts1:
        recs.append(conversion("w1%02d" % idx, target, text))
        add(f1, idx, target, text)
        idx += 1
    with open(os.path.join(d, f1), "wb") as f:
        for r in recs:
            f.write(gzip_member(r))

    f2 = "crawl-02.warc.wet"  # uncompressed sibling
    text2 = "GEDI rh98 canopy height calibrates the regressor.\n"
    recs = [conversion("w200", "https://e.example/gedi", text2)]
    add(f2, 0, "https://e.example/gedi", text2)
    with open(os.path.join(d, f2), "wb") as f:
        for r in recs:
            f.write(r)

    # corrupt: conversion record with an overrun Content-Length -> the
    # whole file must be skipped (no golden rows)
    bad = conversion("w300", "https://bad.example/", "x" * 40)
    bad = bad.replace(b"Content-Length: ", b"Content-Length: 9", 1)
    with open(os.path.join(d, "corrupt-03.warc.wet.gz"), "wb") as f:
        f.write(gzip_member(bad))

    table = pa.table({
        "file": pa.array([r[0] for r in rows], pa.string()),
        "rec_idx": pa.array([r[1] for r in rows], pa.int32()),
        "target_uri": pa.array([r[2] for r in rows], pa.string()),
        "mime": pa.array([r[3] for r in rows], pa.string()),
        "text_chars": pa.array([r[4] for r in rows], pa.int32()),
        "n_lines": pa.array([r[5] for r in rows], pa.int32()),
        "text_md5": pa.array([r[6] for r in rows], pa.string()),
    })
    pq.write_table(table, os.path.join(d, "golden", "golden.parquet"))
    print("q_wet_extract: 4 files, %d golden rows" % len(rows))


def make_wat():
    """WAT (metadata) deliverable — Common Crawl's *.warc.wat.gz: a
    warcinfo record then one `metadata` record per crawled record whose
    block is a JSON envelope (WARC-Header-Metadata + Payload-Metadata
    with HTTP-Response-Metadata/HTML-Metadata). Golden rows computed
    here with the json module, never by Spark."""
    d = os.path.join(BASE, "q_wat_extract")
    os.makedirs(os.path.join(d, "golden"), exist_ok=True)
    rows = []  # (file, rec_idx, target_uri, src_type, http_status,
               #  content_type, title, n_links)

    def envelope(src_type, target, status=None, ctype=None, title=None,
                 links=None):
        whm = {"WARC-Type": src_type,
               "WARC-Date": "2026-08-14T00:00:00Z",
               "WARC-Record-ID": "<urn:uuid:src>"}
        if target:
            whm["WARC-Target-URI"] = target
        pm = {"Actual-Content-Length": "0"}
        if status is not None:
            hrm = {"Response-Message": {"Version": "HTTP/1.1",
                                        "Status": status,
                                        "Reason": "OK" if status == 200 else "X"},
                   "Headers": {"Server": "test/1.0"}}
            if ctype:
                hrm["Headers"]["Content-Type"] = ctype
            if title is not None or links is not None:
                hm = {}
                if title is not None:
                    hm["Head"] = {"Title": title}
                if links is not None:
                    hm["Links"] = [{"path": "A@/href", "url": u}
                                   for u in links]
                hrm["HTML-Metadata"] = hm
            pm["HTTP-Response-Metadata"] = hrm
        return json.dumps({"Envelope": {"Format": "WARC",
                                        "WARC-Header-Metadata": whm,
                                        "Payload-Metadata": pm},
                           "Container": {"Filename": "crawl-00.warc.gz"}},
                          separators=(",", ":"))

    def metadata_rec(rid, target, env):
        block = env.encode("utf-8")
        hdrs = ["WARC/1.0",
                "WARC-Type: metadata",
                "WARC-Record-ID: <urn:uuid:%s>" % rid,
                "WARC-Refers-To: <urn:uuid:%s-src>" % rid,
                "WARC-Date: 2026-08-14T00:00:00Z"]
        if target:
            hdrs.append("WARC-Target-URI: " + target)
        hdrs += ["Content-Type: application/json",
                 "Content-Length: %d" % len(block),
                 ""]
        return crlf_join(hdrs) + block + b"\r\n\r\n"

    def add(file, idx, target, src_type, status, ctype, title, n_links):
        rows.append((file, idx, target or "", src_type, status, ctype,
                     title, n_links))

    f0 = "crawl-00.warc.wat.gz"
    recs = [warc_record("warcinfo", "m000",
                        b"software: graft-test-wat/1.0\r\n",
                        ctype="application/warc-fields")]
    # an HTML response with title + links
    env = envelope("response", "https://a.example/page", 200,
                   "text/html; charset=UTF-8", "Sahel millet yields",
                   ["https://a.example/about", "https://b.example/api/obs",
                    "https://c.example/notes.txt"])
    recs.append(metadata_rec("m001", "https://a.example/page", env))
    add(f0, 1, "https://a.example/page", "response", 200,
        "text/html; charset=UTF-8", "Sahel millet yields", 3)
    # a non-HTML response: no HTML-Metadata at all
    env = envelope("response", "https://b.example/api/obs", 200,
                   "application/json")
    recs.append(metadata_rec("m002", "https://b.example/api/obs", env))
    add(f0, 2, "https://b.example/api/obs", "response", 200,
        "application/json", None, None)
    # a request record's WAT envelope: no HTTP-Response-Metadata
    env = envelope("request", "https://a.example/page")
    recs.append(metadata_rec("m003", "https://a.example/page", env))
    add(f0, 3, "https://a.example/page", "request", None, None, None, None)
    with open(os.path.join(d, f0), "wb") as f:
        for r in recs:
            f.write(gzip_member(r))

    f1 = "crawl-01.warc.wat.gz"
    recs = [warc_record("warcinfo", "m100",
                        b"software: graft-test-wat/1.0\r\n",
                        ctype="application/warc-fields")]
    # unicode title, empty link list (present but []), 404 status
    env = envelope("response", "https://d.example/riz", 200, "text/html",
                   "Rizières du Sénégal 水稲", [])
    recs.append(metadata_rec("m101", "https://d.example/riz", env))
    add(f1, 1, "https://d.example/riz", "response", 200, "text/html",
        "Rizières du Sénégal 水稲", 0)
    env = envelope("response", "https://d.example/gone", 404, "text/html",
                   None, ["https://d.example/"])
    recs.append(metadata_rec("m102", "https://d.example/gone", env))
    add(f1, 2, "https://d.example/gone", "response", 404, "text/html",
        None, 1)
    with open(os.path.join(d, f1), "wb") as f:
        for r in recs:
            f.write(gzip_member(r))

    # corrupt: flipped gzip CRC byte -> file skipped whole
    good = gzip_member(metadata_rec(
        "m300", "https://bad.example/",
        envelope("response", "https://bad.example/", 200, "text/html")))
    flipped = bytearray(good)
    flipped[-6] ^= 0xFF
    with open(os.path.join(d, "corrupt-02.warc.wat.gz"), "wb") as f:
        f.write(bytes(flipped))

    table = pa.table({
        "file": pa.array([r[0] for r in rows], pa.string()),
        "rec_idx": pa.array([r[1] for r in rows], pa.int32()),
        "target_uri": pa.array([r[2] for r in rows], pa.string()),
        "src_type": pa.array([r[3] for r in rows], pa.string()),
        "http_status": pa.array([r[4] for r in rows], pa.int32()),
        "content_type": pa.array([r[5] for r in rows], pa.string()),
        "title": pa.array([r[6] for r in rows], pa.string()),
        "n_links": pa.array([r[7] for r in rows], pa.int32()),
    })
    pq.write_table(table, os.path.join(d, "golden", "golden.parquet"))
    print("q_wat_extract: 3 files, %d golden rows" % len(rows))


if __name__ == "__main__":
    make_warc()
    make_zst()
    make_wet()
    make_wat()
