#!/usr/bin/env python3
"""Foreign-fixture writer for the TFRecord + tf.train.Example ingest
surface (q_tfrecord_read) — same independent-writer practice as the
WARC/TIFF/HDF5 fixtures: framing, crc32c and protobuf bytes are
hand-built here from the public specs (TensorFlow record format; proto
wire format), NOT by the Scala codec under test, and the golden
parquet is computed from the feature dicts used to ENCODE, never by
re-parsing.

Layout written under tools/fixtures/q_tfrecord_read/:
  train-00.tfrecord     canonical Examples: bytes/packed-int64/
                        packed-float features (text + tokens +
                        embedding + label — the training-example
                        shape); negative int64; NaN-payload float bits
  train-01.tfrecord     wire-format edge cases: unpacked float (wire-5
                        each) and unpacked int64 (wire-0 each);
                        packed list split across two field chunks
                        (concatenate); unknown fields at every level
                        (skipped); duplicate map key (last wins);
                        oneof kind override (last kind wins); empty
                        Int64List; kind-less Feature; featureless
                        Example; a non-proto record (per-record
                        degrade -> kind 'unparsed')
  train-02.tfrecord.gz  whole-file gzip (tf.data GZIP compression_type)
  corrupt-03.tfrecord   flipped data-CRC byte -> file skipped
  corrupt-04.tfrecord   truncated final record -> file skipped
  golden/golden.parquet
"""
import gzip, hashlib, os, struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_tfrecord_read")

# ---- crc32c (Castagnoli, reflected poly 0x82F63B78) -----------------

_TBL = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _TBL.append(_c)


def crc32c(data):
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _TBL[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


assert crc32c(b"123456789") == 0xE3069283, "crc32c self-test failed"


def masked(data):
    c = crc32c(data)
    return ((((c >> 15) | (c << 17)) & 0xFFFFFFFF) + 0xA282EAD8) & 0xFFFFFFFF


def frame(rec):
    ln = struct.pack("<Q", len(rec))
    return (ln + struct.pack("<I", masked(ln)) + rec
            + struct.pack("<I", masked(rec)))


# ---- protobuf wire helpers ------------------------------------------

def varint(v):
    v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    return bytes(out)


def tag(field, wire):
    return varint((field << 3) | wire)


def ld(field, body):
    return tag(field, 2) + varint(len(body)) + body


def bytes_list(vals):
    return b"".join(ld(1, v) for v in vals)


def float_list_packed(bits):
    return ld(1, b"".join(struct.pack("<I", b) for b in bits))


def int64_list_packed(vals):
    return ld(1, b"".join(varint(v) for v in vals))


def feature(kind_field, body):
    return ld(kind_field, body)


def entry(key, feat_body):
    return ld(1, ld(1, key.encode()) + ld(2, feat_body))


def example(entries_bytes):
    return ld(1, b"".join(entries_bytes))


def fbits(x):
    return struct.unpack("<I", struct.pack("<f", x))[0]


def signed32(bits):
    return bits - (1 << 32) if bits >= (1 << 31) else bits


rows = []  # file, rec_idx, key, kind, elem_idx, int_val, float_bits,
           # bytes_len, bytes_md5


def add_bytes(f, r, k, vals):
    for i, v in enumerate(vals):
        rows.append((f, r, k, "bytes", i, None, None, len(v),
                     hashlib.md5(v).hexdigest()))


def add_ints(f, r, k, vals):
    for i, v in enumerate(vals):
        rows.append((f, r, k, "int64", i, v, None, None, None))


def add_floats(f, r, k, bits):
    for i, b in enumerate(bits):
        rows.append((f, r, k, "float", i, None, signed32(b), None, None))


def main():
    os.makedirs(os.path.join(D, "golden"), exist_ok=True)

    # ---- train-00: canonical training-example shards
    f0 = "train-00.tfrecord"
    texts = [b"the rainy season composite", b"harvest backscatter drop",
             b"groundnut basin ndvi peak"]
    nan_bits = 0x7FC00001  # NaN with payload: raw wire bits must survive
    with open(os.path.join(D, f0), "wb") as f:
        for r, t in enumerate(texts):
            toks = [r * 10 + 1, 7, -3, 2 ** 40 + r]
            emb = [fbits(0.5), fbits(-1.25), fbits(3.14159), nan_bits]
            ex = example([
                entry("text", feature(1, bytes_list([t]))),
                entry("tokens", feature(3, int64_list_packed(toks))),
                entry("embedding", feature(2, float_list_packed(emb))),
                entry("label", feature(3, int64_list_packed([r % 2]))),
            ])
            f.write(frame(ex))
            add_bytes(f0, r, "text", [t])
            add_ints(f0, r, "tokens", toks)
            add_floats(f0, r, "embedding", emb)
            add_ints(f0, r, "label", [r % 2])

    # ---- train-01: wire-format edge cases
    f1 = "train-01.tfrecord"
    with open(os.path.join(D, f1), "wb") as f:
        # rec 0: unpacked float (wire-5 each) + unpacked int64 (wire-0
        # each) + unknown fields at every level
        ubits = [fbits(2.0), fbits(-0.125)]
        uflt = b"".join(tag(1, 5) + struct.pack("<I", b) for b in ubits)
        uint = b"".join(tag(1, 0) + varint(v) for v in [11, -1])
        ex0 = (tag(7, 0) + varint(99)  # unknown varint field in Example
               + ld(1,
                    entry("vec", feature(2, uflt))
                    + entry("ids", feature(3, uint))
                    # unknown field inside a map entry:
                    + ld(1, ld(1, b"extra") + ld(2, feature(3, int64_list_packed([5])))
                         + tag(3, 0) + varint(1))
                    + tag(9, 2) + varint(3) + b"xyz")  # unknown ld field in Features
               + ld(8, b"trailing-unknown"))
        f.write(frame(ex0))
        add_floats(f1, 0, "vec", ubits)
        add_ints(f1, 0, "ids", [11, -1])
        add_ints(f1, 0, "extra", [5])

        # rec 1: packed float split across two chunks (concatenate);
        # duplicate map key (last wins); oneof override (bytes wins)
        sbits = [fbits(1.0), fbits(2.0), fbits(3.0)]
        split = (float_list_packed(sbits[:2]) + float_list_packed(sbits[2:]))
        ex1 = example([
            entry("emb", feature(2, split)),
            entry("dup", feature(3, int64_list_packed([1, 2]))),
            entry("dup", feature(3, int64_list_packed([42]))),
            entry("over", feature(3, int64_list_packed([9]))
                  + feature(1, bytes_list([b"won"]))),
        ])
        f.write(frame(ex1))
        add_floats(f1, 1, "emb", sbits)
        add_ints(f1, 1, "dup", [42])
        add_bytes(f1, 1, "over", [b"won"])

        # rec 2: empty Int64List / kind-less Feature / featureless Example
        ex2 = example([
            entry("hollow", feature(3, b"")),  # Int64List with no values
            entry("bare", b""),                # Feature with no kind
        ])
        f.write(frame(ex2))
        rows.append((f1, 2, "hollow", "int64", None, None, None, None, None))
        rows.append((f1, 2, "bare", "none", None, None, None, None, None))

        f.write(frame(example([])))  # rec 3: Example with zero entries
        rows.append((f1, 3, None, "empty", None, None, None, None, None))

        # rec 4: not a parseable proto -> per-record degrade
        junk = b"\xff\xff\xff"
        f.write(frame(junk))
        rows.append((f1, 4, None, "unparsed", None, None, None, len(junk),
                     hashlib.md5(junk).hexdigest()))

    # ---- train-02: whole-file gzip
    f2 = "train-02.tfrecord.gz"
    body = bytearray()
    for r in range(2):
        t = b"gz doc %d" % r
        ex = example([
            entry("text", feature(1, bytes_list([t]))),
            entry("n", feature(3, int64_list_packed([r]))),
        ])
        body += frame(ex)
        add_bytes(f2, r, "text", [t])
        add_ints(f2, r, "n", [r])
    with open(os.path.join(D, f2), "wb") as f:
        f.write(gzip.compress(bytes(body), 6))

    # ---- corrupt files: must be skipped whole (no golden rows)
    good = frame(example([entry("x", feature(3, int64_list_packed([1])))]))
    bad = bytearray(good + good)
    bad[-2] ^= 0xFF  # flip a byte of the last record's data CRC
    with open(os.path.join(D, "corrupt-03.tfrecord"), "wb") as f:
        f.write(bytes(bad))
    with open(os.path.join(D, "corrupt-04.tfrecord"), "wb") as f:
        f.write((good + good)[:-9])  # truncate inside the final record

    table = pa.table({
        "file": pa.array([r[0] for r in rows], pa.string()),
        "rec_idx": pa.array([r[1] for r in rows], pa.int32()),
        "key": pa.array([r[2] for r in rows], pa.string()),
        "kind": pa.array([r[3] for r in rows], pa.string()),
        "elem_idx": pa.array([r[4] for r in rows], pa.int32()),
        "int_val": pa.array([r[5] for r in rows], pa.int64()),
        "float_bits": pa.array([r[6] for r in rows], pa.int32()),
        "bytes_len": pa.array([r[7] for r in rows], pa.int32()),
        "bytes_md5": pa.array([r[8] for r in rows], pa.string()),
    })
    pq.write_table(table, os.path.join(D, "golden", "golden.parquet"))
    print("q_tfrecord_read: 5 files, %d golden rows" % len(rows))


if __name__ == "__main__":
    main()
