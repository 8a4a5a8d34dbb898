#!/usr/bin/env python3
"""Independent pure-Python CDF-1 (NetCDF classic) writer.

Implements the public classic file format (magic 'CDF\\x01', big-endian
dim/attr/var lists, names padded to 4, vsize rounded to 4, 32-bit
begin offsets, numrecs=0) at the struct level — no netCDF4/scipy — and
emits the golden byte stream NetcdfCodecSpec pins the Scala encoder
against byte-for-byte. The fixture mirrors the reference's per-test
prediction dataset shape (cropharvest_eval.py:213-218): instance dim +
lat/lon/preds doubles + a char-typed variable and attributes.

Run from the repo root: python3 tools/netcdf_golden.py
Prints the fixture as a Scala Array[Int] literal.
"""
import struct

NC_DIMENSION = 0x0A
NC_VARIABLE = 0x0B
NC_ATTRIBUTE = 0x0C


def pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + pad4(b)


def attr(nm: str, val) -> bytes:
    if isinstance(val, str):
        b = val.encode()
        return name(nm) + struct.pack(">ii", 2, len(b)) + pad4(b)
    # list of doubles
    return (name(nm) + struct.pack(">ii", 6, len(val)) +
            b"".join(struct.pack(">d", v) for v in val))


def attr_list(attrs) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    return (struct.pack(">ii", NC_ATTRIBUTE, len(attrs)) +
            b"".join(attr(n, v) for n, v in attrs))


def var_data(typ: int, values) -> bytes:
    if typ == 2:
        return pad4(values.encode())
    fmt = {4: ">i", 5: ">f", 6: ">d"}[typ]
    return pad4(b"".join(struct.pack(fmt, v) for v in values))


def encode(dims, gatts, variables) -> bytes:
    """dims: [(name, len)]; gatts: [(name, val)];
    variables: [(name, [dimid], [(attr_name, val)], nc_type, values)]."""
    def vsize(typ, values):
        n = len(values) if not isinstance(values, str) else len(values.encode())
        size = {2: 1, 4: 4, 5: 4, 6: 8}[typ]
        return (n * size + 3) & ~3

    def header(begins):
        h = b"CDF\x01" + struct.pack(">i", 0)
        if dims:
            h += struct.pack(">ii", NC_DIMENSION, len(dims))
            for dn, dl in dims:
                h += name(dn) + struct.pack(">i", dl)
        else:
            h += struct.pack(">ii", 0, 0)
        h += attr_list(gatts)
        if variables:
            h += struct.pack(">ii", NC_VARIABLE, len(variables))
            for i, (vn, dimids, vatts, typ, values) in enumerate(variables):
                h += name(vn) + struct.pack(">i", len(dimids))
                h += b"".join(struct.pack(">i", d) for d in dimids)
                h += attr_list(vatts)
                h += struct.pack(">iii", typ, vsize(typ, values), begins[i])
        else:
            h += struct.pack(">ii", 0, 0)
        return h

    h0 = header([0] * len(variables))
    begins, off = [], len(h0)
    for (_, _, _, typ, values) in variables:
        begins.append(off)
        off += vsize(typ, values)
    return header(begins) + b"".join(
        var_data(t, v) for (_, _, _, t, v) in variables)


def fixture() -> bytes:
    """The reference prediction-dataset shape: instance dim, lat/lon
    coords, preds with attributes, char-typed id string."""
    lats = [14.5, 14.625, 14.75, 14.875, 15.0]
    lons = [-16.5, -16.375, -16.25, -16.125, -16.0]
    preds = [0.125, 0.25, 0.5, 0.8125, 0.96875]
    return encode(
        dims=[("instance", 5), ("idlen", 8)],
        gatts=[("title", "graft predictions"), ("version", [1.0])],
        variables=[
            ("lat", [0], [("units", "degrees_north")], 6, lats),
            ("lon", [0], [("units", "degrees_east")], 6, lons),
            ("preds", [0], [("valid_range", [0.0, 1.0])], 6, preds),
            ("test_id", [1], [], 2, "togo-001"),
        ])


def main():
    b = fixture()
    print(f"fixture bytes: {len(b)}")
    # Scala literal, 14 per row
    vals = [str(x) for x in b]
    print("  private val goldenNc: Array[Byte] = Array[Int](")
    for i in range(0, len(vals), 14):
        print("    " + ", ".join(f"0x{b[j]:02x}" for j in range(i, min(i + 14, len(b)))) + ("," if i + 14 < len(b) else ""))
    print("  ).map(_.toByte)")


if __name__ == "__main__":
    main()
