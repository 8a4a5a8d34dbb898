#!/usr/bin/env python3
"""Foreign-fixture writer for the Arrow IPC scan (q_arrow_read) —
fixtures are written by pyarrow itself (the format's reference
implementation), never by the engine under test; the golden parquet is
computed from the PYTHON values used to build the arrays (struct.pack
bits on this side, the Scala flatbuffers walk on the other — two
independent paths meeting over the wire).

Covers BOTH wire shapes: the IPC FILE format (Feather V2 — trailing
footer, the dataset-export shape) and the IPC STREAM format (the
HuggingFace-datasets cache shape — sequential encapsulated messages).

Layout written under tools/fixtures/q_arrow_read/:
  table-00.arrow    FILE format, TWO record batches: i64/i32/u8/f64/
                    f32/f16/bool/utf8/binary, nulls in several columns,
                    unicode + empty strings, NaN-payload floats
  embed-01.arrow    FILE format: fixed_size_list<f32,3> embeddings,
                    list<i64> (null list, empty list, null element),
                    i64 ids
  stream-02.arrow   STREAM format: i64 + utf8, two batches + EOS
  zstdipc-03.arrow  FILE format, ZSTD-compressed bodies (GRADED)
  dict-04.arrow     dictionary-encoded utf8 column (GRADED)
  trunc-05.arrow    table-00 cut mid-footer -> refusal
  lz4-08.arrow      FILE format, LZ4_FRAME-compressed bodies, 2 batches
  feather-09.arrow  STOCK pyarrow.feather.write_feather output: default
                    LZ4 compression + a dictionary (categorical) column
  streamdict-10.arrow STREAM framing, LZ4 bodies + int8-index dictionary
  garbage-11.arrow  stream-02 + trailing junk after EOS -> refusal
  nullcol-18.arrow  a Null-typed column next to real data (GRADED)
  ree-19.arrow      RunEndEncoded columns, STREAM framing (GRADED)
  nested3-20.arrow  depth-3 list<struct<... list<scalar> fields ...>>
                    (ragged sequences inside sequence-of-dict; GRADED)
  mapnested-21.arrow map<utf8, list<i64>> config-blob metadata (GRADED)
  interval-22.arrow MonthDayNano intervals as 16 hex bytes (GRADED)
  structstruct-23.arrow struct-in-struct nested metadata/config
                    structs to depth 2, incl. a list<scalar> kid
                    inside the depth-1 struct (GRADED)
  structdeep-24.arrow 4-level struct nesting -> refusal
  nested333-25.arrow triply-nested lists: list<list<list<i64>>> and
                    list<list<fsl2<f32>>> with nulls/empties at every
                    level; elem/elem_idx2/elem_idx3 index the three
                    levels (GRADED)
  liststructstruct-26.arrow list<struct<…, struct<scalars>, …>> —
                    records carrying a nested record (GRADED)
  mapstruct-27.arrow map<utf8, struct<scalars>> per-key records (GRADED)
  liststructdeep-28.arrow struct kid under list<struct> with a struct
                    inside it -> refusal
The bad files' ABSENCE from the golden is itself graded.
"""
import os, struct

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_arrow_read")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (file, batch, col, row, elem_idx, vtype, is_null, bits, str_val)


def signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def bits_of(vtype, v):
    if vtype == "date32" or vtype.startswith("time32"):
        return signed64(v & 0xFFFFFFFF)
    if (vtype == "date64" or vtype.startswith("ts_") or
            vtype.startswith("dur_") or vtype.startswith("time64")):
        return signed64(v & ((1 << 64) - 1))
    if vtype in ("f32",):
        raw = struct.pack("<f", v) if isinstance(v, float) else struct.pack("<I", v)
        return signed64(int.from_bytes(raw, "little"))
    if vtype == "f64":
        raw = struct.pack("<d", v) if isinstance(v, float) else struct.pack("<Q", v)
        return signed64(int.from_bytes(raw, "little"))
    if vtype == "f16":
        raw = struct.pack("<e", v) if isinstance(v, float) else struct.pack("<H", v)
        return int.from_bytes(raw, "little")
    if vtype == "bool":
        return 1 if v else 0
    if vtype.startswith("i") or vtype.startswith("u"):
        width = int(vtype[1:]) // 8
        return signed64(v & ((1 << (8 * width)) - 1))
    raise ValueError(vtype)


def emit(fname, batch, col, row, elem, vtype, value):
    if value is None:
        ROWS.append((fname, batch, col, row, elem, vtype, True, None, None))
    elif vtype in ("utf8", "lutf8") or vtype.startswith("dec"):
        ROWS.append((fname, batch, col, row, elem, vtype, False, None, value))
    elif vtype in ("bin", "lbin") or vtype.startswith("fsb"):
        ROWS.append((fname, batch, col, row, elem, vtype, False, None, value.hex()))
    elif vtype == "struct":
        # parent struct cell: value is the is-present flag
        ROWS.append((fname, batch, col, row, elem, vtype, not value, None, None))
    else:
        ROWS.append((fname, batch, col, row, elem, vtype, False,
                     bits_of(vtype, value), None))


def emit_batch(fname, bi, cols):
    """cols: list of (name, vtype, leaf_vtype_or_None, values)."""
    for name, vtype, leaf, values in cols:
        for ri, v in enumerate(values):
            if leaf is None:
                emit(fname, bi, name, ri, None, vtype, v)
            elif v is None:
                emit(fname, bi, name, ri, None, vtype, None)
            else:
                for ei, e in enumerate(v):
                    emit(fname, bi, name, ri, ei, leaf, e)


# ---- table-00.arrow: the primitive/utf8/binary surface, 2 batches
f16 = pa.float16()
import numpy as np  # noqa: E402  (pandas dependency; half literals)

b0 = [
    ("ids", "i64", None, [1, None, -3, 9007199254740993]),
    ("small", "i32", None, [-2147483648, 2147483647, 0, None]),
    ("tiny", "u8", None, [0, 255, 17, 128]),
    ("xs", "f64", None, [2.5, None, -1e308, float("nan")]),
    ("ys", "f32", None, [0.5, -0.0, 3.5, None]),
    ("hs", "f16", None, [1.5, -2.25, 0.0009765625, None]),
    ("ok", "bool", None, [True, None, False, True]),
    ("name", "utf8", None, ["café", "", None, "naïve £9"]),
    ("blob", "bin", None, [b"\x00\x01", b"", None, b"\xff\xfe\xfd"]),
]
b1 = [
    ("ids", "i64", None, [7, 8]),
    ("small", "i32", None, [5, None]),
    ("tiny", "u8", None, [9, 10]),
    ("xs", "f64", None, [1.0, 2.0]),
    ("ys", "f32", None, [None, None]),
    ("hs", "f16", None, [65504.0, -0.0]),
    ("ok", "bool", None, [False, False]),
    ("name", "utf8", None, ["r2", None]),
    ("blob", "bin", None, [None, b"z"]),
]


def arrow_array(vtype, values):
    t = {"i64": pa.int64(), "i32": pa.int32(), "u8": pa.uint8(),
         "f64": pa.float64(), "f32": pa.float32(), "f16": f16,
         "bool": pa.bool_(), "utf8": pa.string(), "bin": pa.binary()}[vtype]
    if vtype == "f16":
        vals = [None if v is None else np.float16(v) for v in values]
        return pa.array(vals, type=t)
    return pa.array(values, type=t)


def batch_of(cols):
    return pa.record_batch(
        [arrow_array(vt, vals) for _, vt, _, vals in cols],
        names=[n for n, *_ in cols])


with open(os.path.join(D, "table-00.arrow"), "wb") as fh:
    w = ipc.new_file(fh, batch_of(b0).schema)
    w.write_batch(batch_of(b0))
    w.write_batch(batch_of(b1))
    w.close()
emit_batch("table-00.arrow", 0, b0)
emit_batch("table-00.arrow", 1, b1)

# ---- embed-01.arrow: nested embedding shapes
eb = [
    ("id", "i64", None, [100, 101, 102, 103]),
    ("vec", "fsl3<f32>", "f32",
     [[0.5, -1.25, 2.0], None, [3.5, 0.0625, -0.75], [1.0, 2.0, 3.0]]),
    ("toks", "list<i64>", "i64",
     [[1, 2, 3], [], None, [42, None]]),
]
schema = pa.schema([
    ("id", pa.int64()),
    ("vec", pa.list_(pa.float32(), 3)),
    ("toks", pa.list_(pa.int64())),
])
eb_arrays = [
    pa.array(eb[0][3], type=pa.int64()),
    pa.array(eb[1][3], type=pa.list_(pa.float32(), 3)),
    pa.array(eb[2][3], type=pa.list_(pa.int64())),
]
with open(os.path.join(D, "embed-01.arrow"), "wb") as fh:
    w = ipc.new_file(fh, schema)
    w.write_batch(pa.record_batch(eb_arrays, schema=schema))
    w.close()
emit_batch("embed-01.arrow", 0, eb)

# ---- stream-02.arrow: the STREAM wire shape (HF datasets cache)
s0 = [("k", "i64", None, [10, 20]),
      ("t", "utf8", None, ["stream", None])]
s1 = [("k", "i64", None, [None]),
      ("t", "utf8", None, ["fin"])]
with open(os.path.join(D, "stream-02.arrow"), "wb") as fh:
    w = ipc.new_stream(fh, batch_of(s0).schema)
    w.write_batch(batch_of(s0))
    w.write_batch(batch_of(s1))
    w.close()
emit_batch("stream-02.arrow", 0, s0)
emit_batch("stream-02.arrow", 1, s1)

# ---- compressed bodies (GRADED): ZSTD file, LZ4_FRAME file — the
# pyarrow Feather V2 DEFAULT is LZ4, so this is what stock exports are
with open(os.path.join(D, "zstdipc-03.arrow"), "wb") as fh:
    w = ipc.new_file(fh, batch_of(b0).schema,
                     options=ipc.IpcWriteOptions(compression="zstd"))
    w.write_batch(batch_of(b0))
    w.close()
emit_batch("zstdipc-03.arrow", 0, b0)

with open(os.path.join(D, "lz4-08.arrow"), "wb") as fh:
    w = ipc.new_file(fh, batch_of(b0).schema,
                     options=ipc.IpcWriteOptions(compression="lz4"))
    w.write_batch(batch_of(b0))
    w.write_batch(batch_of(b1))
    w.close()
emit_batch("lz4-08.arrow", 0, b0)
emit_batch("lz4-08.arrow", 1, b1)

# ---- dictionary-encoded columns (GRADED): the pandas-categorical
# export shape — indices resolve through the DictionaryBatch message,
# golden rows carry the RESOLVED values as a plain utf8 column
dict_vals = ["a", "b", "a", "c"]
dict_arr = pa.array(dict_vals).dictionary_encode()
dict_batch = pa.record_batch([dict_arr], names=["d"])
with open(os.path.join(D, "dict-04.arrow"), "wb") as fh:
    w = ipc.new_file(fh, dict_batch.schema)
    w.write_batch(dict_batch)
    w.close()
emit_batch("dict-04.arrow", 0, [("d", "utf8", None, dict_vals)])

# feather-09: STOCK write_feather output (default LZ4 + categorical) —
# the exact first-file shape a real user hands the engine
import pyarrow.feather as feather  # noqa: E402
cat_vals = ["news", "web", None, "web", "code", "news", "web", "code"]
f9_ids = list(range(8))
f9_txt = ["d%d" % i for i in range(7)] + [None]
f9 = pa.table({
    "doc_id": pa.array(f9_ids, type=pa.int64()),
    "source": pa.array(cat_vals).dictionary_encode(),
    "txt": pa.array(f9_txt),
})
feather.write_feather(f9, os.path.join(D, "feather-09.arrow"))
emit_batch("feather-09.arrow", 0, [
    ("doc_id", "i64", None, f9_ids),
    ("source", "utf8", None, cat_vals),
    ("txt", "utf8", None, f9_txt),
])

# streamdict-10: STREAM framing with LZ4 bodies AND an int8-index
# dictionary — dictionary message order + narrow index widths
s10_vals = ["x", "yy", None, "zzz", "yy"]
s10_ids = [7, 8, 9, 10, 11]
d10 = pa.DictionaryArray.from_arrays(
    pa.array([0, 1, None, 2, 1], type=pa.int8()), pa.array(["x", "yy", "zzz"]))
t10 = pa.table({"k": pa.array(s10_ids, type=pa.int64()), "c": d10})
with open(os.path.join(D, "streamdict-10.arrow"), "wb") as fh:
    w = ipc.new_stream(fh, t10.schema,
                       options=ipc.IpcWriteOptions(compression="lz4"))
    w.write_table(t10)
    w.close()
emit_batch("streamdict-10.arrow", 0, [
    ("k", "i64", None, s10_ids),
    ("c", "utf8", None, s10_vals),
])

# ---- logical-12.arrow (GRADED): the temporal/decimal/struct surface
# HF-datasets caches and pandas exports routinely carry — timestamps
# (tz and naive, us/ns), date32/64, time32/64, duration, decimal128,
# fixed_size_binary, large_string/large_binary, and a struct column
# with a NULL SLOT (children must read as null there, whatever bytes
# the writer left in the child arrays)
import decimal  # noqa: E402

ts_us = [1700000000000000, None, -62135596800000000, 1]       # us, tz=UTC
ts_ns = [1700000000123456789, 0, None, -1]                    # ns, naive
d32 = [19700, 0, None, -719162]                               # days
d64 = [1700000000000, None, -86400000, 123]                   # ms
t32 = [0, 86399999, None, 1]                                  # ms of day
t64 = [86399999999, None, 0, 43200000000]                     # us of day
dur = [90061001, -5, None, 0]                                 # ms
dec_strs = ["12345.67", "-0.03", None, "0.00"]                # p=10 s=2
fsb = [b"\x00\x11\x22\x33", None, b"\xff\xff\xff\xff", b"abcd"]
lstr = ["large café", "", None, "x" * 40]
lbin = [b"\x01\x02", None, b"", b"\xfe"]
st_present = [True, False, True, True]
st_a = [1, None, None, 4]          # child values where parent present
st_s = ["x", None, "y", None]
struct_py = [
    {"a": 1, "s": "x"}, None, {"a": None, "s": "y"}, {"a": 4, "s": None},
]
logical_arrays = [
    ("ts_utc", pa.array(ts_us, type=pa.timestamp("us", tz="UTC")),
     "ts_us[UTC]"),
    ("ts_naive", pa.array(ts_ns, type=pa.timestamp("ns")), "ts_ns"),
    ("d32", pa.array(d32, type=pa.date32()), "date32"),
    ("d64", pa.array(d64, type=pa.date64()), "date64"),
    ("t32", pa.array(t32, type=pa.time32("ms")), "time32_ms"),
    ("t64", pa.array(t64, type=pa.time64("us")), "time64_us"),
    ("dur", pa.array(dur, type=pa.duration("ms")), "dur_ms"),
    ("price", pa.array([None if s is None else decimal.Decimal(s)
                        for s in dec_strs],
                       type=pa.decimal128(10, 2)), "dec128_10_2"),
    ("tag", pa.array(fsb, type=pa.binary(4)), "fsb4"),
    ("ltxt", pa.array(lstr, type=pa.large_string()), "lutf8"),
    ("lraw", pa.array(lbin, type=pa.large_binary()), "lbin"),
    ("st", pa.array(struct_py,
                    type=pa.struct([("a", pa.int64()),
                                    ("s", pa.string())])), "struct"),
]
logical_schema = pa.schema([(n, a.type) for n, a, _ in logical_arrays])
with open(os.path.join(D, "logical-12.arrow"), "wb") as fh:
    w = ipc.new_file(fh, logical_schema)
    w.write_batch(pa.record_batch([a for _, a, _ in logical_arrays],
                                  schema=logical_schema))
    w.close()
for name, vals, vt in [
    ("ts_utc", ts_us, "ts_us[UTC]"), ("ts_naive", ts_ns, "ts_ns"),
    ("d32", d32, "date32"), ("d64", d64, "date64"),
    ("t32", t32, "time32_ms"), ("t64", t64, "time64_us"),
    ("dur", dur, "dur_ms"), ("price", dec_strs, "dec128_10_2"),
    ("tag", fsb, "fsb4"), ("ltxt", lstr, "lutf8"),
    ("lraw", lbin, "lbin"),
]:
    for ri, v in enumerate(vals):
        emit("logical-12.arrow", 0, name, ri, None, vt, v)
for ri, present in enumerate(st_present):
    emit("logical-12.arrow", 0, "st", ri, None, "struct", present)
    # children gate on parent presence: undefined bytes read as null
    emit("logical-12.arrow", 0, "st.a", ri, None, "i64",
         st_a[ri] if present else None)
    emit("logical-12.arrow", 0, "st.s", ri, None, "utf8",
         st_s[ri] if present else None)

# ---- nested-13.arrow (GRADED): the two HF-datasets nested-feature
# shapes — list<utf8> (sequence-of-string, ubiquitous), a
# list<struct<scalars>> (sequence-of-dict: SQuAD-v2 answers, with a
# NULL STRUCT ELEMENT inside a list), a struct with list<scalar>
# children (SQuAD-v1 answers), and a fixed_size_list<utf8>.
toktxt = [["a", "bb", None], [], None, ["dd"]]
answers = [
    [{"text": "x", "start": 3}, {"text": None, "start": 7}],
    [],
    None,
    [None, {"text": "z", "start": 0}],
]
ans1 = [
    {"text": ["a", "b"], "answer_start": [1, 2]},
    None,
    {"text": [], "answer_start": []},
    {"text": None, "answer_start": [5]},
]
fsl2s = [["p", "q"], None, ["r", ""], ["s", "t"]]
nested_arrays = [
    ("toktxt", pa.array(toktxt, type=pa.list_(pa.string()))),
    ("answers", pa.array(answers, type=pa.list_(
        pa.struct([("text", pa.string()), ("start", pa.int64())])))),
    ("ans1", pa.array(ans1, type=pa.struct(
        [("text", pa.list_(pa.string())),
         ("answer_start", pa.list_(pa.int64()))]))),
    ("fsl2s", pa.array(fsl2s, type=pa.list_(pa.string(), 2))),
]
nested_schema = pa.schema([(n, a.type) for n, a in nested_arrays])
with open(os.path.join(D, "nested-13.arrow"), "wb") as fh:
    w = ipc.new_file(fh, nested_schema)
    w.write_batch(pa.record_batch([a for _, a in nested_arrays],
                                  schema=nested_schema))
    w.close()
F13 = "nested-13.arrow"


def row13(col, row, elem, vtype, is_null, bits=None, sval=None):
    ROWS.append((F13, 0, col, row, elem, vtype, is_null, bits, sval))


# list<utf8>: null list -> single elem-less cell with the COLUMN
# vtype; empty list -> NO cells; elements carry the leaf vtype
for ri, lst in enumerate(toktxt):
    if lst is None:
        row13("toktxt", ri, None, "list<utf8>", True)
    else:
        for ei, e in enumerate(lst):
            row13("toktxt", ri, ei, "utf8", e is None,
                  sval=e if e is not None else None)
# list<struct>: one struct cell per ELEMENT (nullity), then per-kid
# cells at that element index, gated on element validity
for ri, lst in enumerate(answers):
    if lst is None:
        row13("answers", ri, None, "list<struct>", True)
    else:
        for ei, e in enumerate(lst):
            row13("answers", ri, ei, "struct", e is None)
            if e is None:
                row13("answers.text", ri, ei, "utf8", True)
                row13("answers.start", ri, ei, "i64", True)
            else:
                row13("answers.text", ri, ei, "utf8", e["text"] is None,
                      sval=e["text"])
                row13("answers.start", ri, ei, "i64", False,
                      bits=e["start"])
# struct<list>: parent-nullity cell per row; a child list that is
# null OR whose parent is null -> single elem-less cell with the
# list vtype; empty -> no cells
for ri, st in enumerate(ans1):
    row13("ans1", ri, None, "struct", st is None)
    for kid, klabel, leaf in (("text", "list<utf8>", "utf8"),
                              ("answer_start", "list<i64>", "i64")):
        v = None if st is None else st[kid]
        if v is None:
            row13("ans1." + kid, ri, None, klabel, True)
        else:
            for ei, e in enumerate(v):
                if leaf == "utf8":
                    row13("ans1." + kid, ri, ei, leaf, e is None, sval=e)
                else:
                    row13("ans1." + kid, ri, ei, leaf, False, bits=e)
# fixed_size_list<utf8,2>: null list -> single cell; else exactly 2
for ri, lst in enumerate(fsl2s):
    if lst is None:
        row13("fsl2s", ri, None, "fsl2<utf8>", True)
    else:
        for ei, e in enumerate(lst):
            row13("fsl2s", ri, ei, "utf8", e is None, sval=e)

# ---- nested2-14.arrow (GRADED): doubly-nested lists — the tokenized-
# batch HF cache shape (list<list<i64>> input-id batches) and ragged
# embedding grids (list<fixed_size_list<f32,2>>). Cell convention:
# elem = outer index, elem_idx2 = inner index; a null INNER list is a
# single elem2-less cell carrying the inner list vtype.
batches = [[[1, 2], [3]], [], None, [[], [4, None]]]
grids = [[[1.0, 2.0], [3.5, 4.5]], None, [], [[5.5, 6.5]]]
n2_arrays = [
    ("batches", pa.array(batches, type=pa.list_(pa.list_(pa.int64())))),
    ("grids", pa.array(grids, type=pa.list_(pa.list_(pa.float32(), 2)))),
]
n2_schema = pa.schema([(n, a.type) for n, a in n2_arrays])
with open(os.path.join(D, "nested2-14.arrow"), "wb") as fh:
    w = ipc.new_file(fh, n2_schema)
    w.write_batch(pa.record_batch([a for _, a in n2_arrays],
                                  schema=n2_schema))
    w.close()
F14 = "nested2-14.arrow"
for ri, outer in enumerate(batches):
    if outer is None:
        ROWS.append((F14, 0, "batches", ri, None, "list<list<i64>>",
                     True, None, None, None))
    else:
        for ki, inner in enumerate(outer):
            if inner is None:
                ROWS.append((F14, 0, "batches", ri, ki, "list<i64>",
                             True, None, None, None))
            else:
                for ji, e in enumerate(inner):
                    ROWS.append((F14, 0, "batches", ri, ki, "i64",
                                 e is None,
                                 None if e is None else e, None, ji))
for ri, outer in enumerate(grids):
    if outer is None:
        ROWS.append((F14, 0, "grids", ri, None, "list<fsl2<f32>>",
                     True, None, None, None))
    else:
        for ki, inner in enumerate(outer):
            for ji, e in enumerate(inner):
                ROWS.append((F14, 0, "grids", ri, ki, "f32", False,
                             bits_of("f32", e), None, ji))

# ---- map-15.arrow (GRADED): the Map logical type — physically
# List<Struct<key,value>>, emitted exactly like list<struct> under
# the "map" column vtype
mapvals = [[("a", 1), ("b", 2)], [], None, [("c", None)]]
m15 = pa.array(mapvals, type=pa.map_(pa.string(), pa.int64()))
m15_schema = pa.schema([("m", m15.type)])
with open(os.path.join(D, "map-15.arrow"), "wb") as fh:
    w = ipc.new_file(fh, m15_schema)
    w.write_batch(pa.record_batch([m15], schema=m15_schema))
    w.close()
F15 = "map-15.arrow"
for ri, entries in enumerate(mapvals):
    if entries is None:
        ROWS.append((F15, 0, "m", ri, None, "map", True, None, None))
    else:
        for ki, (k, v) in enumerate(entries):
            ROWS.append((F15, 0, "m", ri, ki, "struct", False, None, None))
            ROWS.append((F15, 0, "m.key", ri, ki, "utf8", False, None, k))
            ROWS.append((F15, 0, "m.value", ri, ki, "i64", v is None,
                         v, None))

# ---- mapnested-21.arrow (GRADED): map<utf8, list<i64>> — the
# config-blob HF metadata shape (per-key integer lists). Emitted like
# list<struct> with a list kid: elem = entry index, elem2 = index
# into the value list; a null value list is one elem2-less cell.
mnvals = [
    [("ids", [1, 2]), ("empty", [])],
    None,
    [("nullv", None), ("mix", [3, None])],
    [],
]
mn21 = pa.array(mnvals, type=pa.map_(pa.string(), pa.list_(pa.int64())))
mn21_schema = pa.schema([("m", mn21.type)])
with open(os.path.join(D, "mapnested-21.arrow"), "wb") as fh:
    w = ipc.new_file(fh, mn21_schema)
    w.write_batch(pa.record_batch([mn21], schema=mn21_schema))
    w.close()
F21 = "mapnested-21.arrow"
for ri, entries in enumerate(mnvals):
    if entries is None:
        ROWS.append((F21, 0, "m", ri, None, "map", True, None, None))
        continue
    for ki, (k, v) in enumerate(entries):
        ROWS.append((F21, 0, "m", ri, ki, "struct", False, None, None))
        ROWS.append((F21, 0, "m.key", ri, ki, "utf8", False, None, k))
        if v is None:
            ROWS.append((F21, 0, "m.value", ri, ki, "list<i64>", True,
                         None, None))
        else:
            for ji, x in enumerate(v):
                ROWS.append((F21, 0, "m.value", ri, ki, "i64",
                             x is None, x, None, ji))

# ---- deltadict-16.arrow (GRADED): DELTA dictionary batches (stream
# framing, emit_dictionary_deltas) — batch 2's dictionary extends
# batch 1's, shipped as an append-only delta message
dd1 = pa.DictionaryArray.from_arrays(
    pa.array([0, 1, 0], type=pa.int32()), pa.array(["x", "y"]))
dd2 = pa.DictionaryArray.from_arrays(
    pa.array([2, 1, 3], type=pa.int32()),
    pa.array(["x", "y", "z", "w"]))
t16a = pa.record_batch([dd1], names=["c"])
t16b = pa.record_batch([dd2], names=["c"])
with open(os.path.join(D, "deltadict-16.arrow"), "wb") as fh:
    w = ipc.new_stream(
        fh, t16a.schema,
        options=ipc.IpcWriteOptions(emit_dictionary_deltas=True))
    w.write_batch(t16a)
    w.write_batch(t16b)
    w.close()
emit_batch("deltadict-16.arrow", 0, [("c", "utf8", None, ["x", "y", "x"])])
emit_batch("deltadict-16.arrow", 1, [("c", "utf8", None, ["z", "y", "w"])])

# ---- refusal fixtures
with open(os.path.join(D, "table-00.arrow"), "rb") as fh:
    whole = fh.read()
with open(os.path.join(D, "trunc-05.arrow"), "wb") as fh:
    fh.write(whole[:-60])

with open(os.path.join(D, "stream-02.arrow"), "rb") as fh:
    s2 = fh.read()
with open(os.path.join(D, "garbage-11.arrow"), "wb") as fh:
    fh.write(s2 + b"JUNKJUNK")  # bytes past the EOS marker: refuse

# ---- sink cross-validation: sink-06.arrow is produced by the ENGINE's
# own writer (ArrowWrite.encodeFile — from-scratch flatbuffers); golden
# rows for it come from PYARROW's independent read, so the scan grade
# pins writer and reader against the reference implementation at once.
sink_path = os.path.join(D, "sink-06.arrow")
if os.path.exists(sink_path):
    t = ipc.open_file(sink_path).read_all()
    ids = t.column("id").to_pylist()
    embs = t.column("embedding").to_pylist()
    assert t.schema.field("embedding").type == pa.list_(pa.float32(), 4)
    for ri, (i64v, vec) in enumerate(zip(ids, embs)):
        emit("sink-06.arrow", 0, "id", ri, None, "i64", i64v)
        for ei, e in enumerate(vec):
            emit("sink-06.arrow", 0, "embedding", ri, ei, "f32", e)
    print("sink-06.arrow verified via pyarrow: %d rows" % len(ids))
else:
    raise SystemExit("sink-06.arrow missing — regenerate it with the "
                     "ArrowWrite fixture writer before running this script")

# sinkstream-07.arrow: the engine writer's STREAM framing (HF cache
# shape), read back by pyarrow.ipc.open_stream — same cross-validation
# discipline as sink-06
stream_path = os.path.join(D, "sinkstream-07.arrow")
if os.path.exists(stream_path):
    t = ipc.open_stream(stream_path).read_all()
    ids = t.column("id").to_pylist()
    embs = t.column("embedding").to_pylist()
    assert t.schema.field("embedding").type == pa.list_(pa.float32(), 2)
    for ri, (i64v, vec) in enumerate(zip(ids, embs)):
        emit("sinkstream-07.arrow", 0, "id", ri, None, "i64", i64v)
        for ei, e in enumerate(vec):
            emit("sinkstream-07.arrow", 0, "embedding", ri, ei, "f32", e)
    print("sinkstream-07.arrow verified via pyarrow open_stream: %d rows"
          % len(ids))
else:
    raise SystemExit("sinkstream-07.arrow missing — regenerate it with the "
                     "ArrowWrite stream fixture writer first")

# sinktext-17.arrow: the engine writer's (id, text) HF-export shape,
# re-read by pyarrow — same cross-validation discipline as sink-06
text_path = os.path.join(D, "sinktext-17.arrow")
if os.path.exists(text_path):
    t = ipc.open_file(text_path).read_all()
    tids = t.column("id").to_pylist()
    ttxt = t.column("text").to_pylist()
    assert t.schema.field("text").type == pa.string()
    for ri, (i64v, s) in enumerate(zip(tids, ttxt)):
        emit("sinktext-17.arrow", 0, "id", ri, None, "i64", i64v)
        emit("sinktext-17.arrow", 0, "text", ri, None, "utf8", s)
    print("sinktext-17.arrow verified via pyarrow: %d rows" % len(tids))
else:
    raise SystemExit("sinktext-17.arrow missing — regenerate with "
                     "`sbt 'runMain graft.tools.FixtureGen arrow'` first")

# ---- nullcol-18.arrow (GRADED): a Null-typed column riding next to
# real data — the routine HF-datasets shard shape where a feature had
# no values in a shard and serialized as the Null type (zero buffers).
import pyarrow.compute as pc  # noqa: E402

n18_ids = [1, 2, 3, 4, 5, 6]
n18_txt = ["a", None, "c", "d", None, "f"]
n18 = pa.table({
    "id": pa.array(n18_ids, type=pa.int64()),
    "feat": pa.nulls(6),
    "txt": pa.array(n18_txt),
})
with open(os.path.join(D, "nullcol-18.arrow"), "wb") as fh:
    w = ipc.new_file(fh, n18.schema)
    # two batches: Null columns carry a node per batch, no buffers
    w.write_table(n18.slice(0, 4))
    w.write_table(n18.slice(4, 2))
    w.close()
for bi, (lo, n) in enumerate([(0, 4), (4, 2)]):
    for ri in range(n):
        emit("nullcol-18.arrow", bi, "id", ri, None, "i64", n18_ids[lo + ri])
        emit("nullcol-18.arrow", bi, "feat", ri, None, "null", None)
        emit("nullcol-18.arrow", bi, "txt", ri, None, "utf8", n18_txt[lo + ri])

# ---- ree-19.arrow (GRADED): RunEndEncoded columns (newer pyarrow
# emits these for low-cardinality columns) — a utf8 REE with a NULL
# run, an i64 REE, and an int16 run-ends variant; STREAM framing (the
# HF cache wire shape). Golden rows carry the EXPANDED logical values.
r19_src = ["news", "news", "news", None, None, "web", "web", "code",
           "code", "code"]
r19_num = [7, 7, 7, 7, -1, -1, 2, 2, 2, 2]
r19_lang = ["en"] * 10
r19 = pa.table({
    "id": pa.array(range(10), type=pa.int64()),
    "source": pc.run_end_encode(pa.array(r19_src)),
    "num": pc.run_end_encode(pa.array(r19_num, type=pa.int64())),
    "lang": pc.run_end_encode(
        pa.array(r19_lang),
        options=pc.RunEndEncodeOptions(run_end_type=pa.int16())),
})
with open(os.path.join(D, "ree-19.arrow"), "wb") as fh:
    w = ipc.new_stream(fh, r19.schema)
    w.write_table(r19)
    w.close()
for ri in range(10):
    emit("ree-19.arrow", 0, "id", ri, None, "i64", ri)
    emit("ree-19.arrow", 0, "source", ri, None, "utf8", r19_src[ri])
    emit("ree-19.arrow", 0, "num", ri, None, "i64", r19_num[ri])
    emit("ree-19.arrow", 0, "lang", ri, None, "utf8", r19_lang[ri])

# ---- nested3-20.arrow (GRADED): the depth-3 HF shape —
# list<struct<...>> whose struct carries ragged list<scalar> /
# fixed_size_list fields next to scalars (per-answer token spans,
# per-detection box coords). Cell convention: elem = struct element
# index, elem_idx2 = inner list index; a null struct ELEMENT still
# emits its scalar-kid cells as null (the list<struct> gate) and ONE
# null cell per list kid; a null INNER list is one elem2-less cell
# carrying the inner list vtype; an empty inner list emits nothing.
qa = [
    [("alpha", [1, 2, 3], 0.5), (None, [], 1.5)],
    [],
    None,
    [("beta", None, None), None, ("gamma", [4, None], -2.0)],
]
qa_type = pa.list_(pa.struct([
    ("text", pa.string()),
    ("spans", pa.list_(pa.int32())),
    ("score", pa.float32())]))
qa_arr = pa.array(
    [None if o is None else
     [None if e is None else
      {"text": e[0], "spans": e[1], "score": e[2]} for e in o]
     for o in qa], type=qa_type)
grid = [
    [([1.0, 2.0], "a")],
    None,
    [([3.5, 4.5], None), (None, "b")],
    [],
]
grid_type = pa.list_(pa.struct([
    ("w", pa.list_(pa.float32(), 2)),
    ("tag", pa.string())]))
grid_arr = pa.array(
    [None if o is None else [{"w": e[0], "tag": e[1]} for e in o]
     for o in grid], type=grid_type)
n20_schema = pa.schema([("qa", qa_type), ("grid", grid_type)])
with open(os.path.join(D, "nested3-20.arrow"), "wb") as fh:
    w = ipc.new_file(fh, n20_schema)
    w.write_batch(pa.record_batch([qa_arr, grid_arr], schema=n20_schema))
    w.close()
F20 = "nested3-20.arrow"
for ri, outer in enumerate(qa):
    if outer is None:
        ROWS.append((F20, 0, "qa", ri, None, "list<struct>", True,
                     None, None))
        continue
    for ki, e in enumerate(outer):
        present = e is not None
        ROWS.append((F20, 0, "qa", ri, ki, "struct", not present,
                     None, None))
        # scalar kids: gated on element presence (null cell when absent)
        text = e[0] if present else None
        ROWS.append((F20, 0, "qa.text", ri, ki, "utf8", text is None,
                     None, text))
        score = e[2] if present else None
        ROWS.append((F20, 0, "qa.score", ri, ki, "f32", score is None,
                     None if score is None else bits_of("f32", score),
                     None))
        # list kid: one elem2-less null cell when the element is null
        # or the inner list is; per-j cells otherwise
        spans = e[1] if present else None
        if spans is None:
            ROWS.append((F20, 0, "qa.spans", ri, ki, "list<i32>", True,
                         None, None))
        else:
            for ji, s in enumerate(spans):
                ROWS.append((F20, 0, "qa.spans", ri, ki, "i32",
                             s is None,
                             None if s is None else bits_of("i32", s),
                             None, ji))
for ri, outer in enumerate(grid):
    if outer is None:
        ROWS.append((F20, 0, "grid", ri, None, "list<struct>", True,
                     None, None))
        continue
    for ki, (wv, tag) in enumerate(outer):
        ROWS.append((F20, 0, "grid", ri, ki, "struct", False, None, None))
        if wv is None:
            ROWS.append((F20, 0, "grid.w", ri, ki, "fsl2<f32>", True,
                         None, None))
        else:
            for ji, x in enumerate(wv):
                ROWS.append((F20, 0, "grid.w", ri, ki, "f32", False,
                             bits_of("f32", x), None, ji))
        ROWS.append((F20, 0, "grid.tag", ri, ki, "utf8", tag is None,
                     None, tag))

# ---- interval-22.arrow (GRADED): MonthDayNano intervals — the one
# interval form modern pyarrow constructs/writes (duration-typed HF
# metadata). 16 LE bytes per element (months i32, days i32, nanos
# i64), emitted as hex like fixed binary; YEAR_MONTH/DAY_TIME stay
# refused (no pyarrow constructor, no corpus presence).
ivals = [(1, 2, 3), None, (0, 0, 0), (-1, -2, -3000000000)]
i22 = pa.array(ivals, type=pa.month_day_nano_interval())
i22_schema = pa.schema([("id", pa.int64()), ("iv", i22.type)])
with open(os.path.join(D, "interval-22.arrow"), "wb") as fh:
    w = ipc.new_file(fh, i22_schema)
    w.write_batch(pa.record_batch(
        [pa.array(range(4), type=pa.int64()), i22], schema=i22_schema))
    w.close()
F22 = "interval-22.arrow"
for ri, v in enumerate(ivals):
    ROWS.append((F22, 0, "id", ri, None, "i64", False, ri, None))
    if v is None:
        ROWS.append((F22, 0, "iv", ri, None, "interval_mdn", True,
                     None, None))
    else:
        ROWS.append((F22, 0, "iv", ri, None, "interval_mdn", False,
                     None, struct.pack("<iiq", *v).hex()))

# ---- structstruct-23.arrow (GRADED): struct-in-struct — the nested
# metadata/config structs HF shards carry. Cells are dotted paths per
# level; every struct level emits one nullity cell per row whose
# is_null is the CONJUNCTION of its own slot validity and all
# ancestors'; leaf cells gate the same way. Depth reaches 2
# (meta.cfg.opt.*), the deepest accepted shape, and a list<scalar>
# kid rides inside the depth-1 struct (cfg.tags).
metas = [
    {"id": 1, "cfg": {"name": "bert", "tags": ["a", None],
                      "opt": {"lr": 0.1, "warm": True}}, "dims": [2, 3]},
    None,
    {"id": 3, "cfg": None, "dims": []},
    {"id": None, "cfg": {"name": None, "tags": [],
                         "opt": {"lr": None, "warm": False}}, "dims": None},
    {"id": 5, "cfg": {"name": "gpt", "tags": None, "opt": None},
     "dims": [7]},
]
t23 = pa.struct([
    ("id", pa.int64()),
    ("cfg", pa.struct([
        ("name", pa.string()),
        ("tags", pa.list_(pa.string())),
        ("opt", pa.struct([("lr", pa.float64()), ("warm", pa.bool_())])),
    ])),
    ("dims", pa.list_(pa.int32())),
])
a23 = pa.array(metas, type=t23)
s23 = pa.schema([("meta", t23)])
with open(os.path.join(D, "structstruct-23.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s23)
    w.write_batch(pa.record_batch([a23], schema=s23))
    w.close()
F23 = "structstruct-23.arrow"
for ri, m in enumerate(metas):
    ROWS.append((F23, 0, "meta", ri, None, "struct", m is None, None, None))
    mid = None if m is None else m["id"]
    ROWS.append((F23, 0, "meta.id", ri, None, "i64", mid is None,
                 mid, None))
    cfg = None if m is None else m["cfg"]
    ROWS.append((F23, 0, "meta.cfg", ri, None, "struct", cfg is None,
                 None, None))
    name = None if cfg is None else cfg["name"]
    ROWS.append((F23, 0, "meta.cfg.name", ri, None, "utf8", name is None,
                 None, name))
    tags = None if cfg is None else cfg["tags"]
    if tags is None:
        ROWS.append((F23, 0, "meta.cfg.tags", ri, None, "list<utf8>", True,
                     None, None))
    else:
        for ei, e in enumerate(tags):
            ROWS.append((F23, 0, "meta.cfg.tags", ri, ei, "utf8",
                         e is None, None, e))
    opt = None if cfg is None else cfg["opt"]
    ROWS.append((F23, 0, "meta.cfg.opt", ri, None, "struct", opt is None,
                 None, None))
    lr = None if opt is None else opt["lr"]
    ROWS.append((F23, 0, "meta.cfg.opt.lr", ri, None, "f64", lr is None,
                 None if lr is None else bits_of("f64", lr), None))
    warm = None if opt is None else opt["warm"]
    ROWS.append((F23, 0, "meta.cfg.opt.warm", ri, None, "bool",
                 warm is None, None if warm is None else bits_of("bool", warm),
                 None))
    dims = None if m is None else m["dims"]
    if dims is None:
        ROWS.append((F23, 0, "meta.dims", ri, None, "list<i32>", True,
                     None, None))
    else:
        for ei, e in enumerate(dims):
            ROWS.append((F23, 0, "meta.dims", ri, ei, "i32", e is None,
                         None if e is None else bits_of("i32", e), None))

# ---- nested333-25.arrow (GRADED): triply-nested lists —
# list<list<list<i64>>> (batched token sequences with per-span
# sub-lists) and list<list<fixed_size_list<f32,2>>> (ragged grids of
# coordinate pairs). Cell convention extends the list<list> one with
# a THIRD index: elem = outer index, elem_idx2 = middle index,
# elem_idx3 = inner position; a null list at any level is a single
# cell with the indexes ABOVE it set, the rest null, carrying the
# vtype of the null thing; empty lists emit nothing at their level.
cube = [
    [[[1, 2], [3]], [[4]]],       # full shape
    None,                          # null OUTER -> one column-vtype cell
    [],                            # empty outer -> no cells
    [None, [[5, None]], [[]]],     # null MIDDLE; null LEAF; empty inner
    [[None, [6]]],                 # null INNER list inside a middle
]
cgrid = [
    [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0]]],
    [None],                        # null middle
    None,                          # null outer
    [[]],                          # empty middle -> no inner cells
    [[[7.0, None]]],               # null LEAF inside an fsl pair
]
n25_arrays = [
    ("cube", pa.array(cube, type=pa.list_(pa.list_(pa.list_(pa.int64()))))),
    ("cgrid", pa.array(cgrid, type=pa.list_(pa.list_(
        pa.list_(pa.float32(), 2))))),
]
n25_schema = pa.schema([(n, a.type) for n, a in n25_arrays])
with open(os.path.join(D, "nested333-25.arrow"), "wb") as fh:
    w = ipc.new_file(fh, n25_schema)
    w.write_batch(pa.record_batch([a for _, a in n25_arrays],
                                  schema=n25_schema))
    w.close()
F25 = "nested333-25.arrow"


def row25(col, row, vt, null, e=None, e2=None, e3=None, bits=None,
          sval=None):
    ROWS.append((F25, 0, col, row, e, vt, null, bits, sval, e2, e3))


for ri, outer in enumerate(cube):
    if outer is None:
        row25("cube", ri, "list<list<list<i64>>>", True)
        continue
    for ki, mid in enumerate(outer):
        if mid is None:
            row25("cube", ri, "list<list<i64>>", True, e=ki)
            continue
        for mi, inner in enumerate(mid):
            if inner is None:
                row25("cube", ri, "list<i64>", True, e=ki, e2=mi)
                continue
            for ji, x in enumerate(inner):
                row25("cube", ri, "i64", x is None, e=ki, e2=mi, e3=ji,
                      bits=x)
for ri, outer in enumerate(cgrid):
    if outer is None:
        row25("cgrid", ri, "list<list<fsl2<f32>>>", True)
        continue
    for ki, mid in enumerate(outer):
        if mid is None:
            row25("cgrid", ri, "list<fsl2<f32>>", True, e=ki)
            continue
        for mi, inner in enumerate(mid):
            if inner is None:
                row25("cgrid", ri, "fsl2<f32>", True, e=ki, e2=mi)
                continue
            for ji, x in enumerate(inner):
                row25("cgrid", ri, "f32", x is None, e=ki, e2=mi, e3=ji,
                      bits=None if x is None else bits_of("f32", x))

# ---- liststructstruct-26.arrow (GRADED): struct under list<struct> —
# a list of records each carrying a nested config/metadata record (the
# nested answer/metadata HF shape). The struct kid emits one
# ancestor-gated nullity cell per ELEMENT plus scalar grandkid leaves
# at deeper dotted paths, all on the conjunction gate; scalar and
# list<scalar> siblings keep their conventions.
lssvals = [
    [{"q": "what crop", "meta": {"score": 0.9, "ok": True}, "tags": [1, 2]},
     {"q": None, "meta": {"score": None, "ok": False}, "tags": []}],
    None,
    [],
    [None,
     {"q": "which month", "meta": None, "tags": None},
     {"q": "how many", "meta": {"score": 0.25, "ok": None},
      "tags": [None, 7]}],
]
t26 = pa.list_(pa.struct([
    ("q", pa.string()),
    ("meta", pa.struct([("score", pa.float64()), ("ok", pa.bool_())])),
    ("tags", pa.list_(pa.int32())),
]))
a26 = pa.array(lssvals, type=t26)
s26 = pa.schema([("qa", t26)])
with open(os.path.join(D, "liststructstruct-26.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s26)
    w.write_batch(pa.record_batch([a26], schema=s26))
    w.close()
F26 = "liststructstruct-26.arrow"
for ri, lst in enumerate(lssvals):
    if lst is None:
        ROWS.append((F26, 0, "qa", ri, None, "list<struct>", True,
                     None, None))
        continue
    for ki, el in enumerate(lst):
        elnull = el is None
        ROWS.append((F26, 0, "qa", ri, ki, "struct", elnull, None, None))
        q = None if elnull else el["q"]
        ROWS.append((F26, 0, "qa.q", ri, ki, "utf8", q is None, None, q))
        meta = None if elnull else el["meta"]
        ROWS.append((F26, 0, "qa.meta", ri, ki, "struct", meta is None,
                     None, None))
        score = None if meta is None else meta["score"]
        ROWS.append((F26, 0, "qa.meta.score", ri, ki, "f64",
                     score is None,
                     None if score is None else bits_of("f64", score), None))
        ok = None if meta is None else meta["ok"]
        ROWS.append((F26, 0, "qa.meta.ok", ri, ki, "bool", ok is None,
                     None if ok is None else bits_of("bool", ok), None))
        tags = None if elnull else el["tags"]
        if tags is None:
            ROWS.append((F26, 0, "qa.tags", ri, ki, "list<i32>", True,
                         None, None))
        else:
            for ji, x in enumerate(tags):
                ROWS.append((F26, 0, "qa.tags", ri, ki, "i32", x is None,
                             None if x is None else bits_of("i32", x),
                             None, ji))

# ---- mapstruct-27.arrow (GRADED): map<utf8, struct<scalars>> — the
# per-key record metadata shape (e.g. per-split stats). Rides the
# list<struct> path: the value struct emits its nullity cell + scalar
# grandkid leaves per ENTRY.
msvals = [
    [("train", {"n": 100, "frac": 0.8}), ("test", {"n": 25, "frac": None})],
    [],
    None,
    [("dev", None)],
]
t27 = pa.map_(pa.string(),
              pa.struct([("n", pa.int64()), ("frac", pa.float64())]))
a27 = pa.array(msvals, type=t27)
s27 = pa.schema([("m", t27)])
with open(os.path.join(D, "mapstruct-27.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s27)
    w.write_batch(pa.record_batch([a27], schema=s27))
    w.close()
F27 = "mapstruct-27.arrow"
for ri, entries in enumerate(msvals):
    if entries is None:
        ROWS.append((F27, 0, "m", ri, None, "map", True, None, None))
        continue
    for ki, (k, v) in enumerate(entries):
        ROWS.append((F27, 0, "m", ri, ki, "struct", False, None, None))
        ROWS.append((F27, 0, "m.key", ri, ki, "utf8", False, None, k))
        ROWS.append((F27, 0, "m.value", ri, ki, "struct", v is None,
                     None, None))
        n = None if v is None else v["n"]
        ROWS.append((F27, 0, "m.value.n", ri, ki, "i64", n is None,
                     n, None))
        frac = None if v is None else v["frac"]
        ROWS.append((F27, 0, "m.value.frac", ri, ki, "f64", frac is None,
                     None if frac is None else bits_of("f64", frac), None))

# ---- liststructdeep-28.arrow: a struct kid under list<struct> whose
# OWN children are not all scalar (a struct inside it) — out of
# envelope, whole-file refusal; absence graded.
t28 = pa.list_(pa.struct([
    ("meta", pa.struct([("inner", pa.struct([("x", pa.int64())]))])),
]))
s28 = pa.schema([("deep", t28)])
with open(os.path.join(D, "liststructdeep-28.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s28)
    w.write_batch(pa.record_batch(
        [pa.array([[{"meta": {"inner": {"x": 1}}}]], type=t28)], schema=s28))
    w.close()

# ---- structdeep-24.arrow: struct nesting PAST depth 2 (4 levels) —
# out of envelope, whole-file refusal; its absence from the golden is
# itself graded (the trunc-05/garbage-11 rule).
t24 = pa.struct([("a", pa.struct([("b", pa.struct([
    ("c", pa.struct([("d", pa.int64())]))]))]))])
s24 = pa.schema([("deep", t24)])
with open(os.path.join(D, "structdeep-24.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s24)
    w.write_batch(pa.record_batch(
        [pa.array([{"a": {"b": {"c": {"d": 1}}}}], type=t24)], schema=s24))
    w.close()

# ---- union-29.arrow (GRADED): top-level sparse AND dense unions of
# scalar branches — the mixed-type feature column shape (an
# int-or-string id, a number-or-text answer). The union array itself
# carries no validity (post-1.0 spec): each slot emits ONE cell from
# the child its type id selects, null iff that child slot is null.
u29_types = pa.array([0, 1, 0, 1, 0], pa.int8())
u29_ints = pa.array([11, None, 13, None, 15], pa.int64())
u29_strs = pa.array(["a", "b", None, None, "e"], pa.string())
a29s = pa.UnionArray.from_sparse(u29_types, [u29_ints, u29_strs])
u29d_types = pa.array([0, 2, 1, 0, 2], pa.int8())
u29d_offs = pa.array([0, 0, 0, 1, 1], pa.int32())
a29d = pa.UnionArray.from_dense(
    u29d_types, u29d_offs,
    [pa.array([100, None], pa.int64()),
     pa.array(["only"], pa.string()),
     pa.array([0.5, -2.25], pa.float64())])
s29 = pa.schema([("us", a29s.type), ("ud", a29d.type)])
with open(os.path.join(D, "union-29.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s29)
    w.write_batch(pa.record_batch([a29s, a29d], schema=s29))
    w.close()
F29 = "union-29.arrow"
# sparse: slot -> (vtype, value) via type id
for ri, (tid, iv, sv) in enumerate(zip(
        [0, 1, 0, 1, 0],
        [11, None, 13, None, 15],
        ["a", "b", None, None, "e"])):
    if tid == 0:
        ROWS.append((F29, 0, "us", ri, None, "i64", iv is None, iv, None))
    else:
        ROWS.append((F29, 0, "us", ri, None, "utf8", sv is None, None, sv))
# dense: slot -> child[offset]
d_children = {0: ("i64", [100, None]), 1: ("utf8", ["only"]),
              2: ("f64", [0.5, -2.25])}
for ri, (tid, off) in enumerate(zip([0, 2, 1, 0, 2], [0, 0, 0, 1, 1])):
    vt, vals = d_children[tid]
    v = vals[off]
    if vt == "utf8":
        ROWS.append((F29, 0, "ud", ri, None, vt, v is None, None, v))
    else:
        ROWS.append((F29, 0, "ud", ri, None, vt, v is None,
                     None if v is None else bits_of(vt, v), None))

# ---- unionnested-30.arrow: a union with a NESTED branch
# (list<int64>) — out of envelope, whole-file refusal; absence graded.
u30_types = pa.array([0, 1], pa.int8())
a30 = pa.UnionArray.from_sparse(
    u30_types,
    [pa.array([1, 2], pa.int64()),
     pa.array([[1], [2, 3]], pa.list_(pa.int64()))])
s30 = pa.schema([("u", a30.type)])
with open(os.path.join(D, "unionnested-30.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s30)
    w.write_batch(pa.record_batch([a30], schema=s30))
    w.close()

# ---- largelist-31.arrow (GRADED): top-level large_list<i64> —
# 64-bit offsets, the HF token-array shape for shards whose element
# total can pass 2^31. Same cell convention as list<i64>: null list ->
# one elem-less cell with the column vtype, empty list -> no cells,
# elements carry the leaf vtype gated on element validity.
ll_vals = [[7, None, 9], None, [], [42]]
t31 = pa.large_list(pa.int64())
s31 = pa.schema([("toks", t31)])
with open(os.path.join(D, "largelist-31.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s31)
    w.write_batch(pa.record_batch([pa.array(ll_vals, type=t31)],
                                  schema=s31))
    w.close()
F31 = "largelist-31.arrow"
for ri, lst in enumerate(ll_vals):
    if lst is None:
        ROWS.append((F31, 0, "toks", ri, None, "llist<i64>", True,
                     None, None))
        continue
    for ki, x in enumerate(lst):
        ROWS.append((F31, 0, "toks", ri, ki, "i64", x is None, x, None))

# ---- view-32.arrow (GRADED): Utf8View + BinaryView columns — the
# layout arrow-rs/polars write by default since the StringView
# migration (16-byte view structs: inline data at length <= 12, else
# prefix + variadic-buffer index/offset; RecordBatch carries
# variadicBufferCounts). Two batches, nulls, and values straddling
# the 12-byte inline line in both directions.
v_s1 = ["inline", "a" * 13 + "LONG-one", None, "", "exactly12byt"]
v_b1 = [b"\x00\x01", None, b"B" * 40 + b"tail", b"", b"\xff" * 12]
v_s2 = ["batch2-" + "y" * 30, "tiny", None]
v_b2 = [None, b"\x07" * 13, b"ok"]
s32 = pa.schema([("txt", pa.string_view()), ("blob", pa.binary_view())])
with open(os.path.join(D, "view-32.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s32)
    w.write_batch(pa.record_batch(
        [pa.array(v_s1, type=pa.string_view()),
         pa.array(v_b1, type=pa.binary_view())], schema=s32))
    w.write_batch(pa.record_batch(
        [pa.array(v_s2, type=pa.string_view()),
         pa.array(v_b2, type=pa.binary_view())], schema=s32))
    w.close()
F32 = "view-32.arrow"
for bi, (ss, bs) in enumerate([(v_s1, v_b1), (v_s2, v_b2)]):
    for ri, x in enumerate(ss):
        ROWS.append((F32, bi, "txt", ri, None, "utf8view", x is None,
                     None, x))
    for ri, x in enumerate(bs):
        ROWS.append((F32, bi, "blob", ri, None, "binview", x is None,
                     None, None if x is None else x.hex()))

# ---- viewnested-33.arrow: a view type NESTED under a list — decodes
# incrementally later; today the whole file refuses (no golden rows).
t33 = pa.list_(pa.string_view())
s33 = pa.schema([("seqs", t33)])
with open(os.path.join(D, "viewnested-33.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s33)
    w.write_batch(pa.record_batch(
        [pa.array([["abc", "d" * 20], None], type=t33)], schema=s33))
    w.close()

# ---- listview-34.arrow (GRADED): ListView<i64> + LargeListView<utf8>
# — the offsets+SIZES list layout (ranges independent per slot).
# Same cell convention as list<scalar>.
lv_vals = [[1, None, 3], None, [], [7, 8]]
llv_vals = [["alpha", None], ["b" * 20], None, []]
t34a = pa.list_view(pa.int64())
t34b = pa.large_list_view(pa.utf8())
s34 = pa.schema([("lv", t34a), ("llv", t34b)])
with open(os.path.join(D, "listview-34.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s34)
    w.write_batch(pa.record_batch(
        [pa.array(lv_vals, type=t34a), pa.array(llv_vals, type=t34b)],
        schema=s34))
    w.close()
F34 = "listview-34.arrow"
for ri, lst in enumerate(lv_vals):
    if lst is None:
        ROWS.append((F34, 0, "lv", ri, None, "lview<i64>", True, None, None))
        continue
    for ki, x in enumerate(lst):
        ROWS.append((F34, 0, "lv", ri, ki, "i64", x is None, x, None))
for ri, lst in enumerate(llv_vals):
    if lst is None:
        ROWS.append((F34, 0, "llv", ri, None, "llview<utf8>", True, None,
                     None))
        continue
    for ki, x in enumerate(lst):
        ROWS.append((F34, 0, "llv", ri, ki, "utf8", x is None, None, x))

# ---- listviewnested-35.arrow: a list-view with a NESTED child —
# refuses whole-file today (no golden rows).
t35 = pa.list_view(pa.list_(pa.int64()))
s35 = pa.schema([("g", t35)])
with open(os.path.join(D, "listviewnested-35.arrow"), "wb") as fh:
    w = ipc.new_file(fh, s35)
    w.write_batch(pa.record_batch(
        [pa.array([[[1, 2]], None], type=t35)], schema=s35))
    w.close()

schema_g = pa.schema([
    ("file", pa.string()), ("batch", pa.int32()), ("col", pa.string()),
    ("row", pa.int64()), ("elem_idx", pa.int64()), ("vtype", pa.string()),
    ("is_null", pa.bool_()), ("bits", pa.int64()), ("str_val", pa.string()),
    ("elem_idx2", pa.int64()),  # middle index for list<list<...>> cells
    ("elem_idx3", pa.int64()),  # inner index for list<list<list<...>>>
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema_g], r + (None,) * (11 - len(r))))
     for r in ROWS], schema=schema_g)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden rows across "
      f"{len(set(r[0] for r in ROWS))} graded files")
