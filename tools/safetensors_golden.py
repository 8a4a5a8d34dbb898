#!/usr/bin/env python3
"""Foreign-fixture writer for the safetensors shard scan
(q_safetensors_read) — files are hand-assembled here from the public
format description (8-byte LE header length, JSON header mapping
tensor name -> dtype/shape/data_offsets, raw little-endian data), NOT
produced by the safetensors library and never by the engine under
test; the golden parquet is computed from the values used to ENCODE
(struct.pack on this side, the Scala bit-walk on the other — two
independent paths meeting over the wire).

Layout written under tools/fixtures/q_safetensors_read/:
  embed-00.safetensors    F32 2-D (incl. a NaN payload), F16, BF16,
                          I64 (negatives), U8, BOOL, 0-d F64 scalar,
                          zero-size F32 [0,3], __metadata__ block
  weights-01.safetensors  header space-padded to 8-byte alignment;
                          F64, I32, U16, I8, F8_E4M3, U64 (top bit
                          set), a unicode tensor name, an escaped
                          quote + \\u-escape in a name
  overlap-02.safetensors  data_offsets overlap -> whole-file refusal
  badtype-03.safetensors  unknown dtype "F4" -> refusal
  gap-04.safetensors      hole between spans -> refusal
  trunc-05.safetensors    data region cut short -> refusal
The three bad files' ABSENCE from the golden is itself graded.
"""
import json, os, struct

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_safetensors_read")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, tensor, dtype, shape, elem_idx, bits)


def signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def pack(dtype, values):
    """values -> (raw LE bytes, per-element bits-as-signed-64)."""
    if dtype == "F32":
        raw = b"".join(struct.pack("<f", v) if isinstance(v, float)
                       else struct.pack("<I", v) for v in values)
        step = 4
    elif dtype == "F64":
        raw = b"".join(struct.pack("<d", v) if isinstance(v, float)
                       else struct.pack("<Q", v) for v in values)
        step = 8
    elif dtype == "F16":
        raw = b"".join(struct.pack("<e", v) if isinstance(v, float)
                       else struct.pack("<H", v) for v in values)
        step = 2
    elif dtype in ("BF16", "U16", "I16"):
        raw = b"".join(struct.pack("<H", v & 0xFFFF) for v in values)
        step = 2
    elif dtype in ("I32", "U32"):
        raw = b"".join(struct.pack("<I", v & 0xFFFFFFFF) for v in values)
        step = 4
    elif dtype in ("I64", "U64"):
        raw = b"".join(struct.pack("<Q", v & (2**64 - 1)) for v in values)
        step = 8
    elif dtype in ("U8", "I8", "BOOL", "F8_E4M3", "F8_E5M2"):
        raw = bytes(v & 0xFF for v in values)
        step = 1
    else:
        raise ValueError(dtype)
    bits = [signed64(int.from_bytes(raw[i:i + step], "little"))
            for i in range(0, len(raw), step)]
    return raw, bits


def write_file(name, tensors, metadata=None, pad_align=False,
               golden=True, mutate=None):
    """tensors: list of (tname, dtype, shape, values). Assembles the
    file by the spec; optional `mutate(header_entries, data)` lets the
    corrupt fixtures break offsets AFTER golden bookkeeping."""
    entries = {}
    data = b""
    for tname, dtype, shape, values in tensors:
        raw, bits = pack(dtype, values)
        n = 1
        for d in shape:
            n *= d
        assert len(bits) == n, (tname, len(bits), n)
        entries[tname] = {"dtype": dtype, "shape": shape,
                          "data_offsets": [len(data), len(data) + len(raw)]}
        if golden:
            shp = "x".join(str(d) for d in shape)
            for i, b in enumerate(bits):
                ROWS.append((name, tname, dtype, shp, i, b))
        data += raw
    if mutate:
        data = mutate(entries, data)
    if metadata:
        entries = {"__metadata__": metadata, **entries}
    hdr = json.dumps(entries, separators=(",", ":")).encode()
    if pad_align:
        hdr += b" " * ((8 - (8 + len(hdr)) % 8) % 8)
    blob = struct.pack("<Q", len(hdr)) + hdr + data
    with open(os.path.join(D, name), "wb") as f:
        f.write(blob)


write_file("embed-00.safetensors", [
    ("doc_embed", "F32", [4, 3],
     [0.5, -1.25, 2.0, 3.5, 0x7FC00001, -0.0, 1e-8, 65504.0, -3.75,
      0.125, 9.0, -2.5]),
    ("half", "F16", [5], [1.5, -2.25, 0.0, 0x7E01, 0.0009765625]),
    ("brain", "BF16", [4], [0x3F80, 0xBFC0, 0x7F80, 0x0001]),
    ("ids", "I64", [3], [-1, 9007199254740993, 0]),
    ("mask", "U8", [6], [0, 255, 17, 3, 128, 64]),
    ("flags", "BOOL", [2], [1, 0]),
    ("scale", "F64", [], [2.718281828459045]),
    ("empty", "F32", [0, 3], []),
], metadata={"framework": "graft", "note": "fixture"})

write_file("weights-01.safetensors", [
    ("w/doubles", "F64", [2, 2], [1.0, -1e308, 5e-324, 0x7FF8000000000007]),
    ("w/ints", "I32", [3], [-2147483648, 2147483647, 42]),
    ("w/shorts", "U16", [2], [0xFFFF, 7]),
    ("w/signed", "I8", [4], [-128, 127, -1, 0]),
    ("w/fp8", "F8_E4M3", [3], [0x3C, 0xFF, 0x00]),
    ("w/big", "U64", [2], [2**64 - 1, 2**63]),
    ("poids_été", "F32", [1], [7.5]),
    ('esc"ape\tname', "F32", [1], [-7.5]),
], pad_align=True)


def break_overlap(entries, data):
    # size-correct span that OVERLAPS its sibling: [0,8] vs [4,12] —
    # only the tiling walk can catch this one
    entries["other"]["data_offsets"] = [4, 12]
    return data


write_file("overlap-02.safetensors", [
    ("doc_embed", "F32", [2], [1.0, 2.0]),
    ("other", "F32", [2], [3.0, 4.0]),
], golden=False, mutate=break_overlap)

# unknown dtype, assembled by hand
with open(os.path.join(D, "badtype-03.safetensors"), "wb") as f:
    hdr = b'{"t":{"dtype":"F4","shape":[4],"data_offsets":[0,2]}}'
    f.write(struct.pack("<Q", len(hdr)) + hdr + b"\x01\x02")


def make_gap(entries, data):
    # shift the second tensor's span forward, leaving a 4-byte hole
    entries["b"]["data_offsets"] = [12, 20]
    return data + b"\x00" * 8


write_file("gap-04.safetensors", [
    ("a", "F32", [2], [1.0, 2.0]),
    ("b", "F64", [1], [3.0]),
], golden=False, mutate=make_gap)

write_file("trunc-05.safetensors", [
    ("a", "F64", [4], [1.0, 2.0, 3.0, 4.0]),
], golden=False, mutate=lambda e, d: d[:-5])

# sink parity: the exact (embeddings F32 [n,dim] + ids I64 [n]) layout
# Sinks.writeSafetensorsShards emits, written INDEPENDENTLY here —
# SafetensorsCodecSpec pins the Scala encoder byte-for-byte against
# this file, and the scan grades it like any other shard
write_file("sinkparity-06.safetensors", [
    ("embeddings", "F32", [2, 3], [0.5, -1.25, 2.0, 3.5, -0.75, 0.0625]),
    ("ids", "I64", [2], [11, -42]),
])

schema = pa.schema([
    ("file", pa.string()), ("tensor", pa.string()), ("dtype", pa.string()),
    ("shape", pa.string()), ("elem_idx", pa.int64()), ("bits", pa.int64()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
