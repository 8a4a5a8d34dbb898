#!/usr/bin/env python3
"""Foreign-fixture writer for the ZIP archive scan (q_zip_scan) —
bytes produced by Python's zipfile module (real zlib deflate, real
central directories), never by the Scala codec under test; golden
parquet computed here with hashlib from the member payloads.

Layout written under tools/fixtures/q_zip_scan/:
  shards-00.zip   stored + deflated members, nested paths, a directory
                  entry (not emitted), an empty member
  shards-01.zip   archive comment (EOCD backward scan), a unicode
                  name, a bzip2 member that must SKIP per-member while
                  its siblings survive
  shards-02.zip   written through a non-seekable stream -> data
                  descriptors (GP bit 3): local headers carry zero
                  sizes, the central directory carries truth
  corrupt-03.zip  truncated central directory -> file skipped
  zip64-04.zip    hand-assembled ZIP64 archive (APPNOTE 4.5): saturated
                  EOCD sentinels -> zip64 locator -> zip64 EOCD record;
                  one entry saturates usize/csize/locOff (full 24-byte
                  0x0001 extra), one saturates locOff only (8-byte
                  extra). Cross-validated by Python zipfile's own
                  reader before the golden rows are emitted.
"""
import hashlib, io, os, struct, zipfile, zlib

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_zip_scan")

rows = []  # (file, member, method, size, md5)


def add(f, name, method, payload):
    rows.append((f, name, method, len(payload),
                 hashlib.md5(payload).hexdigest()))


class NoSeek(io.RawIOBase):
    """Forces zipfile into its streaming path (data descriptors)."""
    def __init__(self):
        self.buf = io.BytesIO()

    def write(self, b):
        return self.buf.write(b)

    def writable(self):
        return True

    def seekable(self):
        return False


def main():
    os.makedirs(os.path.join(D, "golden"), exist_ok=True)

    f0 = "shards-00.zip"
    docs = [("docs/0001.txt", b"the rainy season composite holds"),
            ("docs/0002.txt", b"harvest backscatter drop " * 40),
            ("img/0001.ppm", bytes(range(256)) * 3),
            ("empty.bin", b"")]
    with zipfile.ZipFile(os.path.join(D, f0), "w") as z:
        z.writestr("docs/", b"")  # directory entry: structural, not emitted
        z.writestr(docs[0][0], docs[0][1], zipfile.ZIP_STORED)
        z.writestr(docs[1][0], docs[1][1], zipfile.ZIP_DEFLATED)
        z.writestr(docs[2][0], docs[2][1], zipfile.ZIP_DEFLATED)
        z.writestr(docs[3][0], docs[3][1], zipfile.ZIP_STORED)
    add(f0, docs[0][0], 0, docs[0][1])
    add(f0, docs[1][0], 8, docs[1][1])
    add(f0, docs[2][0], 8, docs[2][1])
    add(f0, docs[3][0], 0, docs[3][1])

    f1 = "shards-01.zip"
    keep = ("caption-été.txt", "groundnut basin ndvi peak".encode())
    bz = ("skipme.bz2.txt", b"unsupported method member " * 20)
    tail = ("tail.txt", b"after the bad member")
    with zipfile.ZipFile(os.path.join(D, f1), "w") as z:
        z.writestr(keep[0], keep[1], zipfile.ZIP_DEFLATED)
        z.writestr(bz[0], bz[1], zipfile.ZIP_BZIP2)
        z.writestr(tail[0], tail[1], zipfile.ZIP_STORED)
        z.comment = b"fixture archive comment " * 16
    add(f1, keep[0], 8, keep[1])
    add(f1, tail[0], 0, tail[1])  # bz member absent: per-member skip

    f2 = "shards-02.zip"
    stream = NoSeek()
    with zipfile.ZipFile(stream, "w") as z:
        for i in range(3):
            payload = ("streamed record %d " % i).encode() * (i + 1)
            z.writestr("rec-%02d.txt" % i, payload, zipfile.ZIP_DEFLATED)
            add(f2, "rec-%02d.txt" % i, 8, payload)
    with open(os.path.join(D, f2), "wb") as f:
        f.write(stream.buf.getvalue())

    whole = open(os.path.join(D, f0), "rb").read()
    with open(os.path.join(D, "corrupt-03.zip"), "wb") as f:
        f.write(whole[: len(whole) - 30])  # cuts into EOCD/central dir

    f4 = "zip64-04.zip"
    p0 = b"zip64 stored member payload " * 8
    p1 = b"zip64 deflated member, the >4GiB delivery shape in miniature " * 6
    c1 = zlib.compress(p1, 9)[2:-4]  # raw deflate
    buf = io.BytesIO()

    def lochdr(name, method, crc, csize, usize):
        nb = name.encode()
        return (struct.pack("<IHHHHHIIIHH", 0x04034B50, 45, 0, method, 0, 0,
                            crc, csize, usize, len(nb), 0) + nb)

    def cenhdr(name, method, crc, csize, usize, locoff, extra):
        nb = name.encode()
        return (struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 45, 45, 0,
                            method, 0, 0, crc, csize, usize, len(nb),
                            len(extra), 0, 0, 0, 0, locoff) + nb + extra)

    n0, n1 = "big/part-000.txt", "big/part-001.txt"
    crc0, crc1 = zlib.crc32(p0), zlib.crc32(p1)
    off0 = buf.tell()
    buf.write(lochdr(n0, 0, crc0, len(p0), len(p0)) + p0)
    off1 = buf.tell()
    buf.write(lochdr(n1, 8, crc1, len(c1), len(p1)) + c1)
    cdoff = buf.tell()
    # entry 0: usize/csize/locOff ALL saturated -> full 24-byte extra
    x0 = struct.pack("<HHQQQ", 0x0001, 24, len(p0), len(p0), off0)
    buf.write(cenhdr(n0, 0, crc0, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, x0))
    # entry 1: only locOff saturated -> 8-byte extra
    x1 = struct.pack("<HHQ", 0x0001, 8, off1)
    buf.write(cenhdr(n1, 8, crc1, len(c1), len(p1), 0xFFFFFFFF, x1))
    cdsize = buf.tell() - cdoff
    e64 = buf.tell()
    buf.write(struct.pack("<IQHHIIQQQQ", 0x06064B50, 44, 45, 45, 0, 0,
                          2, 2, cdsize, cdoff))
    buf.write(struct.pack("<IIQI", 0x07064B50, 0, e64, 1))  # locator
    buf.write(struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, 0xFFFF, 0xFFFF,
                          0xFFFFFFFF, 0xFFFFFFFF, 0))
    with open(os.path.join(D, f4), "wb") as f:
        f.write(buf.getvalue())
    # cross-validate with Python's own zip64 reader before grading
    with zipfile.ZipFile(os.path.join(D, f4)) as z:
        assert z.read(n0) == p0 and z.read(n1) == p1, "zip64 self-check"
    add(f4, n0, 0, p0)
    add(f4, n1, 8, p1)

    table = pa.table({
        "file": pa.array([r[0] for r in rows], pa.string()),
        "member": pa.array([r[1] for r in rows], pa.string()),
        "method": pa.array([r[2] for r in rows], pa.int32()),
        "size": pa.array([r[3] for r in rows], pa.int32()),
        "md5": pa.array([r[4] for r in rows], pa.string()),
    })
    pq.write_table(table, os.path.join(D, "golden", "golden.parquet"))
    print("q_zip_scan: 5 archives, %d golden rows" % len(rows))


if __name__ == "__main__":
    main()
