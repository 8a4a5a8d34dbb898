#!/usr/bin/env python3
"""Foreign-fixture writer for the Avro object-container scan
(q_avro_read) — the container and datum encodings are hand-built here
from the public Avro 1.11 spec (zigzag varints, length-prefixed
strings/bytes, union branch indexes, array blocks, the Obj\\x01 header
with metadata map + 16-byte sync), NOT produced by any Avro library
and never by the engine under test; the golden parquet is computed
from the rows used to ENCODE.

Layout written under tools/fixtures/q_avro_read/:
  users-00.avro      null codec; long/string/float/double/boolean/
                     bytes fields, union(null,string), array<long>
  users-01.avro      deflate codec, TWO data blocks
  corrupt-02.avro    sync marker flipped between blocks -> file refused
  badcodec-03.avro   avro.codec: lz77 (unknown) -> file refused
"""
import hashlib, os, struct, zlib

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_avro_read")

SCHEMA = (
    '{"type":"record","name":"User","fields":['
    '{"name":"id","type":"long"},'
    '{"name":"name","type":"string"},'
    '{"name":"score","type":"float"},'
    '{"name":"ratio","type":"double"},'
    '{"name":"flag","type":"boolean"},'
    '{"name":"raw","type":"bytes"},'
    '{"name":"tag","type":["null","string"]},'
    '{"name":"vals","type":{"type":"array","items":"long"}}]}'
)

SYNC = bytes(range(16))


def vlong(n):
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    return bytes(out)


def vstr(s):
    b = s.encode() if isinstance(s, str) else s
    return vlong(len(b)) + b


def datum(row):
    rid, name, score, ratio, flag, raw, tag, vals = row
    out = bytearray()
    out += vlong(rid)
    out += vstr(name)
    out += struct.pack("<f", score)
    out += struct.pack("<d", ratio)
    out += b"\x01" if flag else b"\x00"
    out += vstr(raw)
    if tag is None:
        out += vlong(0)
    else:
        out += vlong(1) + vstr(tag)
    if vals:
        out += vlong(len(vals))
        for v in vals:
            out += vlong(v)
    out += vlong(0)  # array terminator block
    return bytes(out)


def header(codec):
    meta = (vlong(2)
            + vstr("avro.schema") + vstr(SCHEMA)
            + vstr("avro.codec") + vstr(codec)
            + vlong(0))
    return b"Obj\x01" + meta + SYNC


def block(rows_bytes, codec):
    payload = b"".join(rows_bytes)
    if codec == "deflate":
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = c.compress(payload) + c.flush()
    return vlong(len(rows_bytes)) + vlong(len(payload)) + payload + SYNC


def fbits(x):
    b = struct.unpack("<i", struct.pack("<f", x))[0]
    return b


def dbits(x):
    return struct.unpack("<q", struct.pack("<d", x))[0]


rows_out = []  # file, rec_idx, field, elem_idx, vtype, long_val,
               # float_bits, double_bits, str_val, bytes_len, bytes_md5


def grade(f, idx, row):
    rid, name, score, ratio, flag, raw, tag, vals = row
    a = rows_out.append
    a((f, idx, "id", None, "long", rid, None, None, None, None, None))
    a((f, idx, "name", None, "string", None, None, None, name, None, None))
    a((f, idx, "score", None, "float", None, fbits(score), None, None, None, None))
    a((f, idx, "ratio", None, "double", None, None, dbits(ratio), None, None, None))
    a((f, idx, "flag", None, "boolean", 1 if flag else 0, None, None, None, None, None))
    a((f, idx, "raw", None, "bytes", None, None, None, None, len(raw),
       hashlib.md5(raw).hexdigest()))
    if tag is None:
        a((f, idx, "tag", None, "null", None, None, None, None, None, None))
    else:
        a((f, idx, "tag", None, "string", None, None, None, tag, None, None))
    for i, v in enumerate(vals):
        a((f, idx, "vals", i, "long", v, None, None, None, None, None))


def make_rows(n, start):
    out = []
    for i in range(n):
        rid = start + i
        out.append((
            rid,
            "user-%03d é%d" % (rid, rid % 7),
            0.5 * (i + 1) if i % 3 else float("nan"),
            3.141592653589793 * rid,
            rid % 2 == 0,
            bytes((rid + j) % 256 for j in range(5 + i % 4)),
            None if i % 4 == 0 else "t%d" % (rid % 5),
            list(range(rid, rid + i % 3)),
        ))
    return out


def main():
    os.makedirs(os.path.join(D, "golden"), exist_ok=True)

    f0 = "users-00.avro"
    r0 = make_rows(6, 100)
    with open(os.path.join(D, f0), "wb") as f:
        f.write(header("null"))
        f.write(block([datum(r) for r in r0], "null"))
    for i, r in enumerate(r0):
        grade(f0, i, r)

    f1 = "users-01.avro"
    r1 = make_rows(9, 500)
    with open(os.path.join(D, f1), "wb") as f:
        f.write(header("deflate"))
        f.write(block([datum(r) for r in r1[:5]], "deflate"))
        f.write(block([datum(r) for r in r1[5:]], "deflate"))
    for i, r in enumerate(r1):
        grade(f1, i, r)

    # corrupt: flip a byte of the INTER-block sync -> refuse whole file
    body = header("null") + block([datum(r) for r in r0], "null") \
        + block([datum(r) for r in r0], "null")
    bad = bytearray(body)
    first_block_end = len(header("null")) + len(block([datum(r) for r in r0], "null"))
    bad[first_block_end - 3] ^= 0xFF
    with open(os.path.join(D, "corrupt-02.avro"), "wb") as f:
        f.write(bytes(bad))

    with open(os.path.join(D, "badcodec-03.avro"), "wb") as f:
        f.write(b"Obj\x01"
                + vlong(2) + vstr("avro.schema") + vstr(SCHEMA)
                + vstr("avro.codec") + vstr("lz77") + vlong(0) + SYNC)
        f.write(block([datum(r) for r in r0], "null"))

    table = pa.table({
        "file": pa.array([r[0] for r in rows_out], pa.string()),
        "rec_idx": pa.array([r[1] for r in rows_out], pa.int32()),
        "field": pa.array([r[2] for r in rows_out], pa.string()),
        "elem_idx": pa.array([r[3] for r in rows_out], pa.int32()),
        "vtype": pa.array([r[4] for r in rows_out], pa.string()),
        "long_val": pa.array([r[5] for r in rows_out], pa.int64()),
        "float_bits": pa.array([r[6] for r in rows_out], pa.int32()),
        "double_bits": pa.array([r[7] for r in rows_out], pa.int64()),
        "str_val": pa.array([r[8] for r in rows_out], pa.string()),
        "bytes_len": pa.array([r[9] for r in rows_out], pa.int32()),
        "bytes_md5": pa.array([r[10] for r in rows_out], pa.string()),
    })
    pq.write_table(table, os.path.join(D, "golden", "golden.parquet"))
    print("q_avro_read: 4 files, %d golden rows" % len(rows_out))


if __name__ == "__main__":
    main()
