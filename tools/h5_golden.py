#!/usr/bin/env python3
"""From-scratch HDF5 writer (public format spec, no h5py) used to pin
Hdf5Codec goldens — the same independent-foreign-writer practice as the
TIFF/gzip/PNG fixtures. Emits the fixed layout h5py's default
(libver='earliest') produces for `create_dataset(key, data=ndarray)`:
superblock v0, root group with v1 B-tree + SNOD + local heap,
v1 object headers, contiguous storage, native little-endian types.
"""
import struct, sys

UNDEF = 0xFFFFFFFFFFFFFFFF

def align8(n):
    return (n + 7) & ~7

class Writer:
    def __init__(self):
        self.buf = bytearray()
    def tell(self):
        return len(self.buf)
    def w(self, b):
        self.buf += b
    def pad_to(self, n):
        self.buf += b"\x00" * (n - len(self.buf))

def dtype_message(dtype):
    # returns the datatype message body
    if dtype in ("f4", "f8"):
        size = 4 if dtype == "f4" else 8
        cls_ver = (1 << 4) | 1          # version 1, class 1 (float)
        # bit field: byte order LE(0), lo pad 0, hi pad 0, int pad 0,
        # mantissa norm 2 (msb set), sign location bit 8..15
        bits0 = 0x20                    # mantissa normalization = 2 -> bits 4-5 = 10
        sign_loc = 31 if size == 4 else 63
        bits1 = sign_loc & 0xFF
        bits2 = 0
        if size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        return struct.pack("<BBBBI", cls_ver, bits0, bits1, bits2, size) + props
    if dtype in ("i1", "i2", "i4", "i8", "u1", "u2", "u4", "u8"):
        size = int(dtype[1])
        signed = dtype[0] == "i"
        cls_ver = (1 << 4) | 0          # version 1, class 0 (fixed-point)
        bits0 = 0x08 if signed else 0x00  # bit 3 = signed (2's complement)
        props = struct.pack("<HH", 0, size * 8)
        return struct.pack("<BBBBI", cls_ver, bits0, 0, 0, size) + props
    raise ValueError(dtype)

def pack_values(dtype, values):
    fmt = {"f4": "f", "f8": "d", "i1": "b", "i2": "h", "i4": "i", "i8": "q",
           "u1": "B", "u2": "H", "u4": "I", "u8": "Q"}[dtype]
    return struct.pack("<%d%s" % (len(values), fmt), *values)

def object_header(messages):
    # v1 object header: prefix (12 bytes) + 4 pad, 8-aligned messages
    body = b""
    for typ, mbody in messages:
        mbody_p = mbody + b"\x00" * (align8(len(mbody)) - len(mbody))
        body += struct.pack("<HHBBBB", typ, len(mbody_p), 0, 0, 0, 0) + mbody_p
    return struct.pack("<BBHII", 1, 0, len(messages), 1, len(body)) + b"\x00" * 4 + body

def dataset_header(shape, dtype, data_addr, data_size, with_maxdims=True, extra_msgs=()):
    rank = len(shape)
    flags = 1 if with_maxdims else 0
    ds = struct.pack("<BBBBI", 1, rank, flags, 0, 0)
    ds += b"".join(struct.pack("<Q", d) for d in shape)
    if with_maxdims:
        ds += b"".join(struct.pack("<Q", d) for d in shape)
    dt = dtype_message(dtype)
    # layout v3 class 1 (contiguous): address + size
    lay = struct.pack("<BBQQ", 3, 1, data_addr, data_size)
    # fill value v2: alloc time 2 (late), write time 0, defined 0
    fill = struct.pack("<BBBB", 2, 2, 0, 0)
    msgs = [(0x0001, ds), (0x0005, fill), (0x0003, dt), (0x0008, lay)]
    msgs.extend(extra_msgs)
    return object_header(msgs)

def chunked_layout_msgs(shape, dtype, chunk_shape, btree_addr, level=6,
                        shuffle=False):
    """Layout v3 class 2 (chunked) + filter-pipeline v1: deflate, or
    shuffle then deflate (the h5py shuffle=True, compression="gzip"
    application order)."""
    rank = len(shape)
    size = {"f4": 4, "f8": 8, "i1": 1, "i2": 2, "i4": 4, "i8": 8,
            "u1": 1, "u2": 2, "u4": 4, "u8": 8}[dtype]
    lay = struct.pack("<BBB", 3, 2, rank + 1) + struct.pack("<Q", btree_addr)
    lay += b"".join(struct.pack("<I", d) for d in chunk_shape)
    lay += struct.pack("<I", size)
    nf = 2 if shuffle else 1
    pipe = struct.pack("<BB", 1, nf) + b"\x00" * 6
    if shuffle:
        # filter id 2 (shuffle), one client value = element size
        pipe += struct.pack("<HHHH", 2, 0, 0, 1) + struct.pack("<I", size)
        pipe += b"\x00" * 4  # odd client-value count pads to 8
    pipe += struct.pack("<HHHH", 1, 0, 0, 1) + struct.pack("<I", level)
    pipe += b"\x00" * 4  # odd client-value count pads to 8
    return lay, pipe


def shuffle_bytes(raw, size):
    """HDF5 byte-shuffle: group byte j of every element together."""
    n = len(raw) // size
    out = bytearray(len(raw))
    for i in range(n):
        for j in range(size):
            out[j * n + i] = raw[i * size + j]
    return bytes(out)


def chunk_blobs(shape, dtype, values, chunk_shape, level=6, shuffle=False):
    """Full-size (edge-padded with zeros) chunks, row-major grid order:
    [(grid_offsets, compressed_bytes)]; shuffle applies the byte
    transpose before deflate (pipeline application order)."""
    import zlib
    rank = len(shape)
    grid = [(shape[d] + chunk_shape[d] - 1) // chunk_shape[d] for d in range(rank)]
    def strides(dims):
        s = [1] * len(dims)
        for d in range(len(dims) - 2, -1, -1):
            s[d] = s[d + 1] * dims[d + 1]
        return s
    dstr = strides(shape)
    cstr = strides(chunk_shape)
    nchunk_elems = 1
    for d in chunk_shape:
        nchunk_elems *= d
    out = []
    def rec(d, off):
        if d == rank:
            vals = [0] * nchunk_elems
            for ci in range(nchunk_elems):
                coords = [(ci // cstr[k]) % chunk_shape[k] + off[k] for k in range(rank)]
                if all(coords[k] < shape[k] for k in range(rank)):
                    vals[ci] = values[sum(coords[k] * dstr[k] for k in range(rank))]
            raw = pack_values(dtype, vals)
            if shuffle:
                size = {"f4": 4, "f8": 8, "i1": 1, "i2": 2, "i4": 4,
                        "i8": 8, "u1": 1, "u2": 2, "u4": 4, "u8": 8}[dtype]
                raw = shuffle_bytes(raw, size)
            out.append((tuple(off), zlib.compress(raw, level)))
            return
        for g in range(grid[d]):
            rec(d + 1, off + [g * chunk_shape[d]])
    rec(0, [])
    return out


def write_h5(datasets, heap_pad=0):
    """datasets: list of (name, shape, dtype, flat_values). Returns bytes."""
    w = Writer()
    # ---- superblock v0 (96 bytes incl the root symbol-table entry)
    w.w(b"\x89HDF\r\n\x1a\n")
    w.w(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
    w.w(struct.pack("<HHI", 4, 16, 0))
    w.w(struct.pack("<QQQQ", 0, UNDEF, 0, UNDEF))  # eof patched later
    root_ste_at = w.tell()
    w.w(b"\x00" * 40)
    assert w.tell() == 96

    # ---- root group object header (symbol table message)
    root_oh_at = w.tell()
    stab_body_at_placeholder = b"\x00" * 16
    root_oh = object_header([(0x0011, stab_body_at_placeholder)])
    w.w(root_oh)

    # ---- local heap: names NUL-terminated, 8-aligned, offset 0 = ""
    names = [spec[0] for spec in datasets]
    heap_data = bytearray(b"\x00" * 8)      # offset 0: empty string slot
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        nb = n.encode() + b"\x00"
        heap_data += nb + b"\x00" * (align8(len(nb)) - len(nb))
    heap_data += b"\x00" * heap_pad
    heap_hdr_at = w.tell()
    heap_data_at = heap_hdr_at + 32
    w.w(b"HEAP" + struct.pack("<BBBB", 0, 0, 0, 0) +
        struct.pack("<QQQ", len(heap_data), UNDEF, heap_data_at))
    w.w(bytes(heap_data))

    # ---- SNOD with one entry per dataset (alphabetical, B-tree order)
    order = sorted(names)
    snod_at = w.tell()
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(order))
    ste_patch = []  # (buf offset of header addr, dataset name)
    for n in order:
        ste_patch.append((w.tell() + len(snod) + 8, n))
        snod += struct.pack("<QQI", name_off[n], 0, 0) + b"\x00" * 20
    w.w(snod)

    # ---- B-tree v1, one leaf with one child (the SNOD)
    btree_at = w.tell()
    w.w(b"TREE" + struct.pack("<BBH", 0, 0, 1) + struct.pack("<QQ", UNDEF, UNDEF))
    w.w(struct.pack("<Q", 0))                 # key 0: offset of "" (min)
    w.w(struct.pack("<Q", snod_at))           # child 0
    w.w(struct.pack("<Q", name_off[order[-1]]))  # key 1: last name

    # patch root stab message (btree addr, heap addr): the message body
    # starts 16 (prefix) + 8 (msg header) into the root object header
    stab_at = root_oh_at + 16 + 8
    w.buf[stab_at:stab_at + 16] = struct.pack("<QQ", btree_at, heap_hdr_at)
    # patch the superblock root STE: name offset 0, header addr, no cache
    w.buf[root_ste_at:root_ste_at + 16] = struct.pack("<QQ", 0, root_oh_at)

    # ---- dataset object headers + data
    for spec in datasets:
        name, shape, dtype, values = spec[:4]
        chunk_shape = spec[4] if len(spec) > 4 else None
        oh_at = w.tell()
        if chunk_shape is None:
            data = pack_values(dtype, values)
            hdr = dataset_header(shape, dtype, 0, len(data))
            data_at = oh_at + len(hdr)
            hdr = dataset_header(shape, dtype, data_at, len(data))
            assert len(hdr) == len(dataset_header(shape, dtype, 0, len(data)))
            w.w(hdr)
            w.w(data)
        else:
            # chunked: header(layout->btree, pipeline) then the v1 chunk
            # B-tree — one leaf, or (levels=2) an internal node over two
            # leaves — then the compressed chunks
            opts = spec[5] if len(spec) > 5 else {}
            shuffle = bool(opts.get("shuffle"))
            levels = int(opts.get("levels", 1))
            rank = len(shape)
            blobs = chunk_blobs(shape, dtype, values, chunk_shape,
                                shuffle=shuffle)
            def hdr_for(btree_at):
                lay, pipe = chunked_layout_msgs(shape, dtype, chunk_shape,
                                                btree_at, shuffle=shuffle)
                rank_ = len(shape)
                ds = struct.pack("<BBBBI", 1, rank_, 1, 0, 0)
                ds += b"".join(struct.pack("<Q", d) for d in shape)
                ds += b"".join(struct.pack("<Q", d) for d in shape)
                fill = struct.pack("<BBBB", 2, 2, 0, 0)
                return object_header([(0x0001, ds), (0x0005, fill),
                                      (0x000B, pipe), (0x0003, dtype_message(dtype)),
                                      (0x0008, lay)])
            h0 = hdr_for(0)
            btree_at = oh_at + len(h0)
            hdr = hdr_for(btree_at)
            assert len(hdr) == len(h0)
            keysize = 8 + 8 * (rank + 1)

            def chunk_key(off, blob):
                k = struct.pack("<II", len(blob), 0)
                k += b"".join(struct.pack("<Q", o) for o in off)
                k += struct.pack("<Q", 0)  # trailing element-dim offset
                return k

            def leaf_node(entries, addrs):
                node = b"TREE" + struct.pack("<BBH", 1, 0, len(entries))
                node += struct.pack("<QQ", UNDEF, UNDEF)
                for (off, blob), addr in zip(entries, addrs):
                    node += chunk_key(off, blob) + struct.pack("<Q", addr)
                node += struct.pack("<II", 0, 0) + b"\x00" * (8 * (rank + 1))
                return node

            if levels == 1:
                node_len = 24 + len(blobs) * (keysize + 8) + keysize
                chunk_at = btree_at + node_len
                addrs = []
                for off, blob in blobs:
                    addrs.append(chunk_at)
                    chunk_at += len(blob)
                nodes = leaf_node(blobs, addrs)
            else:
                assert levels == 2 and len(blobs) >= 2
                half = (len(blobs) + 1) // 2
                groups = [blobs[:half], blobs[half:]]
                int_len = 24 + 2 * (keysize + 8) + keysize
                leaf_lens = [24 + len(g) * (keysize + 8) + keysize
                             for g in groups]
                leaf_at = [btree_at + int_len,
                           btree_at + int_len + leaf_lens[0]]
                chunk_at = leaf_at[1] + leaf_lens[1]
                addrs = []
                for off, blob in blobs:
                    addrs.append(chunk_at)
                    chunk_at += len(blob)
                # internal node (level 1): key_i = first chunk key of
                # child i, child pointers to the leaf nodes
                inode = b"TREE" + struct.pack("<BBH", 1, 1, 2)
                inode += struct.pack("<QQ", UNDEF, UNDEF)
                inode += chunk_key(*groups[0][0]) + struct.pack("<Q", leaf_at[0])
                inode += chunk_key(*groups[1][0]) + struct.pack("<Q", leaf_at[1])
                inode += struct.pack("<II", 0, 0) + b"\x00" * (8 * (rank + 1))
                assert len(inode) == int_len
                nodes = inode
                nodes += leaf_node(groups[0], addrs[:half])
                nodes += leaf_node(groups[1], addrs[half:])
            w.w(hdr)
            w.w(nodes)
            for _, blob in blobs:
                w.w(blob)
        # patch the SNOD entry header address
        for patch_at, n in ste_patch:
            if n == name:
                w.buf[patch_at:patch_at + 8] = struct.pack("<Q", oh_at)

    # patch EOF address
    w.buf[40:48] = struct.pack("<Q", len(w.buf))
    return bytes(w.buf)


# ---------------------------------------------------------------- v2 world
def lookup3(data, initval=0):
    """Bob Jenkins lookup3 hashword/hashlittle — the checksum HDF5 v2
    metadata carries (public domain algorithm, from lookup3.c)."""
    M = 0xFFFFFFFF
    def rot(x, k):
        return ((x << k) | (x >> (32 - k))) & M
    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & M
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i:i+4], "little")) & M
        b = (b + int.from_bytes(data[i+4:i+8], "little")) & M
        c = (c + int.from_bytes(data[i+8:i+12], "little")) & M
        # mix
        a = (a - c) & M; a ^= rot(c, 4);  c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 6);  a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 8);  b = (b + a) & M
        a = (a - c) & M; a ^= rot(c, 16); c = (c + b) & M
        b = (b - a) & M; b ^= rot(a, 19); a = (a + c) & M
        c = (c - b) & M; c ^= rot(b, 4);  b = (b + a) & M
        i += 12
        length -= 12
    tail = data[i:] + b"\x00" * (12 - length)
    if length > 0:
        a = (a + int.from_bytes(tail[0:4], "little")) & M
        b = (b + int.from_bytes(tail[4:8], "little")) & M
        c = (c + int.from_bytes(tail[8:12], "little")) & M
        # final
        c ^= b; c = (c - rot(b, 14)) & M
        a ^= c; a = (a - rot(c, 11)) & M
        b ^= a; b = (b - rot(a, 25)) & M
        c ^= b; c = (c - rot(b, 16)) & M
        a ^= c; a = (a - rot(c, 4)) & M
        b ^= a; b = (b - rot(a, 14)) & M
        c ^= b; c = (c - rot(b, 24)) & M
    return c


def ohdr_v2(messages):
    """v2 object header: OHDR, version 2, flags (4-byte chunk0 size,
    nothing tracked), chunk-0 size, messages (type 1B, size 2B,
    flags 1B), lookup3 checksum."""
    body = b""
    for typ, mbody in messages:
        body += struct.pack("<BHB", typ, len(mbody), 0) + mbody
    hdr = b"OHDR" + struct.pack("<BB", 2, 0x02) + struct.pack("<I", len(body)) + body
    return hdr + struct.pack("<I", lookup3(hdr))


def link_msg(name, addr):
    """Hard-link message v1: 1-byte name length, no extras."""
    nb = name.encode()
    assert len(nb) < 256
    return struct.pack("<BBB", 1, 0, len(nb)) + nb + struct.pack("<Q", addr)


def dataspace_v2(shape):
    return (struct.pack("<BBBB", 2, len(shape), 0, 1) +
            b"".join(struct.pack("<Q", d) for d in shape))


def layout_v4(shape, dtype, chunk_shape, idx_type, info, addr):
    """Layout v4 class 2: flags 0, rank+1 dims (last = element size)
    as u64, index type byte + type info + address."""
    size = {"f4": 4, "f8": 8, "i1": 1, "i2": 2, "i4": 4, "i8": 8,
            "u1": 1, "u2": 2, "u4": 4, "u8": 8}[dtype]
    lay = struct.pack("<BBBBB", 4, 2, 0, len(shape) + 1, 8)
    lay += b"".join(struct.pack("<Q", d) for d in chunk_shape)
    lay += struct.pack("<Q", size)
    lay += struct.pack("<B", idx_type) + info + struct.pack("<Q", addr)
    return lay


def write_h5_dense(datasets, btree_depth=0):
    """v2-superblock file whose root group uses DENSE link storage:
    the link-info message points at a fractal heap (FRHP; managed
    objects are v1 link messages; checksummed direct blocks under a
    doubling table of width 4, start 256, max-direct 1024; root is a
    single direct block when everything fits, else an FHIB indirect
    block) and a name-index v2 B-tree (BTHD, type-5 records =
    lookup3(name) hash + 7-byte managed heap ID; depth 0 leaf root or
    depth 1 with a BTIN root). Datasets are contiguous."""
    W, S, MAXD, MAXBITS, MAXOBJ = 4, 256, 1024, 32, 512
    OFFB, LENB = 4, 2  # -> heap ID length 7
    w = Writer()
    w.w(b"\x89HDF\r\n\x1a\n")
    w.w(struct.pack("<BBBB", 2, 8, 8, 0))
    w.w(struct.pack("<QQQQ", 0, UNDEF, 0, 48))
    w.w(struct.pack("<I", 0))
    assert w.tell() == 48

    def root_hdr(fheap_at, bt_at):
        li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", fheap_at, bt_at)
        gi = struct.pack("<BB", 0, 0)
        return ohdr_v2([(0x0002, li), (0x000A, gi)])

    h0 = root_hdr(0, 0)
    at = 48 + len(h0)

    # contiguous datasets
    built = []
    addrs = []
    for name, shape, dtype, values in datasets:
        data = pack_values(dtype, values)
        addrs.append(at)

        def hdr_for(a, shape=shape, dtype=dtype, n=len(data)):
            lay = struct.pack("<BBQQ", 3, 1, a, n)
            return ohdr_v2([(0x0001, dataspace_v2(shape)),
                            (0x0003, dtype_message(dtype)),
                            (0x0008, lay)])
        hlen = len(hdr_for(0))
        hdr = hdr_for(at + hlen)
        assert len(hdr) == hlen
        built.append(hdr + data)
        at += len(hdr) + len(data)

    # ---- lay link messages into heap space (objects never span
    # blocks; each block starts with a 21-byte checksummed header)
    HDRB = 4 + 1 + 8 + OFFB + 4
    msgs = [link_msg(name, a) for (name, *_), a in zip(datasets, addrs)]

    def row_size(r):
        return S if r < 2 else S << (r - 1)

    def block_start(idx):
        r, c = idx // W, idx % W
        s = sum(W * row_size(i) for i in range(r))
        return s + c * row_size(r)

    ids = []  # (hash, off, ln) per link
    blocks = {}  # block idx -> bytearray payload after header
    bi, cursor = 0, HDRB
    for name_msg, (name, *_) in zip(msgs, datasets):
        r = bi // W
        if cursor + len(name_msg) > row_size(r):
            bi += 1
            cursor = HDRB
            r = bi // W
        off = block_start(bi) + cursor
        blocks.setdefault(bi, bytearray())
        blocks[bi] += name_msg
        ids.append((lookup3(name.encode()), off, len(name_msg)))
        cursor += len(name_msg)
    nblocks = bi + 1
    cur_rows = 0 if nblocks == 1 else -(-nblocks // W)

    fheap_at = at
    frhp_len = 146
    if cur_rows == 0:
        root_block_at = fheap_at + frhp_len
        heap_len = frhp_len + S
        root_addr = root_block_at
    else:
        fhib_len = 4 + 1 + 8 + OFFB + cur_rows * W * 8 + 4
        root_addr = fheap_at + frhp_len
        dblock0 = root_addr + fhib_len
        dblock_at = []
        a2 = dblock0
        for i in range(cur_rows * W):
            if i < nblocks:
                dblock_at.append(a2)
                a2 += row_size(i // W)
            else:
                dblock_at.append(UNDEF)
        heap_len = (a2 - fheap_at)

    bt_at = fheap_at + heap_len

    # ---- FRHP
    managed_space = block_start(nblocks - 1) + row_size((nblocks - 1) // W)
    frhp = b"FRHP" + struct.pack("<B", 0)
    frhp += struct.pack("<HHB", 1 + OFFB + LENB, 0, 2)  # id len, filters, flags
    frhp += struct.pack("<I", MAXOBJ)
    frhp += struct.pack("<QQ", 0, UNDEF)        # next huge id, huge bt2
    frhp += struct.pack("<QQ", 0, UNDEF)        # free space, fs mgr
    frhp += struct.pack("<QQ", managed_space, managed_space)
    frhp += struct.pack("<Q", 0)                # iterator offset
    frhp += struct.pack("<Q", len(msgs))        # managed count
    frhp += struct.pack("<QQQQ", 0, 0, 0, 0)    # huge/tiny sizes+counts
    frhp += struct.pack("<H", W)
    frhp += struct.pack("<QQ", S, MAXD)
    frhp += struct.pack("<HH", MAXBITS, 0)      # max heap bits, start rows
    frhp += struct.pack("<Q", root_addr)
    frhp += struct.pack("<H", cur_rows)
    frhp += struct.pack("<I", lookup3(frhp))
    assert len(frhp) == frhp_len

    def direct_block(idx):
        r = idx // W
        payload = blocks.get(idx, bytearray())
        b = bytearray()
        b += b"FHDB" + struct.pack("<B", 0) + struct.pack("<Q", fheap_at)
        b += struct.pack("<I", block_start(idx))[:OFFB]
        b += b"\x00" * 4  # checksum placeholder
        b += payload
        b += b"\x00" * (row_size(r) - len(b))
        ck = lookup3(bytes(b))
        b[HDRB - 4:HDRB] = struct.pack("<I", ck)
        return bytes(b)

    heap = bytearray(frhp)
    if cur_rows == 0:
        heap += direct_block(0)
    else:
        fhib = bytearray()
        fhib += b"FHIB" + struct.pack("<B", 0) + struct.pack("<Q", fheap_at)
        fhib += struct.pack("<I", 0)[:OFFB]
        for i in range(cur_rows * W):
            fhib += struct.pack("<Q", dblock_at[i])
        fhib += struct.pack("<I", lookup3(bytes(fhib)))
        assert len(fhib) == fhib_len
        heap += fhib
        for i in range(nblocks):
            heap += direct_block(i)
    assert len(heap) == heap_len

    # ---- name-index v2 B-tree (records sorted by hash, the tree order)
    recs = sorted(ids)
    RECSZ = 4 + 1 + OFFB + LENB
    NODESZ = 512

    def rec_bytes(h, off, ln):
        return (struct.pack("<I", h) + b"\x00"
                + struct.pack("<I", off)[:OFFB]
                + struct.pack("<H", ln)[:LENB])

    max_leaf = (NODESZ - 10) // RECSZ
    if btree_depth == 0:
        assert len(recs) <= max_leaf
        leaf = b"BTLF" + struct.pack("<BB", 0, 5)
        leaf += b"".join(rec_bytes(*r) for r in recs)
        leaf += struct.pack("<I", lookup3(leaf))
        root_n_addr = bt_at + 38
        nodes = leaf
        root_nrec = len(recs)
        depth = 0
    else:
        # depth 1: leaves of up to max_leaf records separated by real
        # records promoted into the BTIN root
        groups, seps = [], []
        i = 0
        per = max_leaf - 5
        while i < len(recs):
            groups.append(recs[i:i + per])
            i += per
            if i < len(recs):
                seps.append(recs[i])
                i += 1
        leaves = []
        for g in groups:
            leaf = b"BTLF" + struct.pack("<BB", 0, 5)
            leaf += b"".join(rec_bytes(*r) for r in g)
            leaf += struct.pack("<I", lookup3(leaf))
            leaves.append(leaf)
        nrec_sz = 1
        while (1 << (8 * nrec_sz)) <= max_leaf:
            nrec_sz += 1
        psz = 8 + nrec_sz  # child is a leaf: no cumulative field
        root_n_addr = bt_at + 38
        leaf_at = [root_n_addr]  # patched: root BTIN first, then leaves
        btin_len = 6 + len(seps) * RECSZ + (len(seps) + 1) * psz + 4
        a3 = root_n_addr + btin_len
        leaf_addr = []
        for leaf in leaves:
            leaf_addr.append(a3)
            a3 += len(leaf)
        btin = b"BTIN" + struct.pack("<BB", 0, 5)
        btin += b"".join(rec_bytes(*s) for s in seps)
        for la, g in zip(leaf_addr, groups):
            btin += struct.pack("<Q", la)
            btin += struct.pack("<I", len(g))[:nrec_sz]
        btin += struct.pack("<I", lookup3(btin))
        assert len(btin) == btin_len
        nodes = btin + b"".join(leaves)
        root_nrec = len(seps)
        depth = 1

    bthd = b"BTHD" + struct.pack("<BB", 0, 5)
    bthd += struct.pack("<IHH", NODESZ, RECSZ, depth)
    bthd += struct.pack("<BB", 100, 40)
    bthd += struct.pack("<Q", root_n_addr)
    bthd += struct.pack("<H", root_nrec)
    bthd += struct.pack("<Q", len(recs))
    bthd += struct.pack("<I", lookup3(bthd))
    assert len(bthd) == 38

    # ---- assemble
    w.w(root_hdr(fheap_at, bt_at))
    for b in built:
        w.w(b)
    assert w.tell() == fheap_at
    w.w(bytes(heap))
    assert w.tell() == bt_at
    w.w(bthd + nodes)

    w.buf[28:36] = struct.pack("<Q", len(w.buf))
    w.buf[44:48] = struct.pack("<I", lookup3(bytes(w.buf[0:44])))
    return bytes(w.buf)


def write_h5_v2(datasets):
    """v2-superblock file: OHDR root group with compact (inline) hard
    links, v2 dataset headers with v2 dataspaces; contiguous layout,
    or chunked (v1 chunk B-tree) when a chunk shape is given —
    the h5py libver='latest' world minus layout-v4 chunk indexes."""
    w = Writer()
    # superblock v2: sig, ver, offsets, lengths, flags, base, ext, eof, root, cksum
    w.w(b"\x89HDF\r\n\x1a\n")
    w.w(struct.pack("<BBBB", 2, 8, 8, 0))
    w.w(struct.pack("<QQQQ", 0, UNDEF, 0, 48))  # eof patched later; root at 48
    w.w(struct.pack("<I", 0))  # checksum patched after eof is known
    assert w.tell() == 48

    # root group header: link info (no dense storage), group info,
    # one hard link per dataset. Link messages carry PATCHED addresses,
    # so build once with zeros to size, then rebuild.
    def root_hdr(addrs):
        li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", UNDEF, UNDEF)
        gi = struct.pack("<BB", 0, 0)
        msgs = [(0x0002, li), (0x000A, gi)]
        for (name, *_), addr in zip(datasets, addrs):
            msgs.append((0x0006, link_msg(name, addr)))
        return ohdr_v2(msgs)

    h0 = root_hdr([0] * len(datasets))
    data_start = 48 + len(h0)

    # lay out the dataset headers/data serially from data_start
    chunks_out = []
    addrs = []
    at = data_start
    built = []
    for spec in datasets:
        name, shape, dtype, values = spec[:4]
        chunk_shape = spec[4] if len(spec) > 4 else None
        addrs.append(at)
        if chunk_shape is None:
            data = pack_values(dtype, values)
            def hdr_for(a, shape=shape, dtype=dtype, n=len(data)):
                lay = struct.pack("<BBQQ", 3, 1, a, n)
                return ohdr_v2([(0x0001, dataspace_v2(shape)),
                                (0x0003, dtype_message(dtype)),
                                (0x0008, lay)])
            hlen = len(hdr_for(0))
            hdr = hdr_for(at + hlen)
            assert len(hdr) == hlen
            built.append(hdr + data)
        else:
            opts = spec[5] if len(spec) > 5 else {}
            index = opts.get("index", "btree1")
            filtered = index != "implicit" and not opts.get("raw")
            rank = len(shape)
            size = {"f4": 4, "f8": 8, "i1": 1, "i2": 2, "i4": 4, "i8": 8,
                    "u1": 1, "u2": 2, "u4": 4, "u8": 8}[dtype]
            nchunk = 1
            for d, c in zip(shape, chunk_shape):
                nchunk *= (d + c - 1) // c
            if filtered:
                blobs = chunk_blobs(shape, dtype, values, chunk_shape)
            else:
                # implicit: raw full-size chunks, no compression
                zblobs = chunk_blobs(shape, dtype, values, chunk_shape)
                import zlib as _z
                blobs = [(off, _z.decompress(b)) for off, b in zblobs]

            def mk_hdr(lay_msgs):
                msgs = [(0x0001, dataspace_v2(shape))]
                if filtered:
                    _, pipe = chunked_layout_msgs(shape, dtype, chunk_shape, 0)
                    msgs.append((0x000B, pipe))
                msgs.append((0x0003, dtype_message(dtype)))
                msgs.append((0x0008, lay_msgs))
                return ohdr_v2(msgs)

            if index == "btree1":
                def hdr_for(btree_at):
                    lay, _ = chunked_layout_msgs(shape, dtype, chunk_shape, btree_at)
                    return mk_hdr(lay)
                hlen = len(hdr_for(0))
                btree_at = at + hlen
                hdr = hdr_for(btree_at)
                assert len(hdr) == hlen
                keysize = 8 + 8 * (rank + 1)
                node_len = 24 + len(blobs) * (keysize + 8) + keysize
                chunk_at = btree_at + node_len
                caddrs = []
                for off, blob in blobs:
                    caddrs.append(chunk_at)
                    chunk_at += len(blob)
                node = b"TREE" + struct.pack("<BBH", 1, 0, len(blobs))
                node += struct.pack("<QQ", UNDEF, UNDEF)
                for (off, blob), ca in zip(blobs, caddrs):
                    node += struct.pack("<II", len(blob), 0)
                    node += b"".join(struct.pack("<Q", o) for o in off)
                    node += struct.pack("<Q", 0) + struct.pack("<Q", ca)
                node += struct.pack("<II", 0, 0) + b"\x00" * (8 * (rank + 1))
                assert len(node) == node_len
                built.append(hdr + node + b"".join(b for _, b in blobs))
            elif index == "single":
                assert nchunk == 1 and filtered
                blob = blobs[0][1]
                info = struct.pack("<QI", len(blob), 0)  # size + filter mask
                def hdr_for(a):
                    return mk_hdr(layout_v4(shape, dtype, chunk_shape, 1, info, a))
                hlen = len(hdr_for(0))
                hdr = hdr_for(at + hlen)
                assert len(hdr) == hlen
                built.append(hdr + blob)
            elif index == "implicit":
                def hdr_for(a):
                    return mk_hdr(layout_v4(shape, dtype, chunk_shape, 2, b"", a))
                hlen = len(hdr_for(0))
                hdr = hdr_for(at + hlen)
                assert len(hdr) == hlen
                built.append(hdr + b"".join(b for _, b in blobs))
            elif index == "fixedarray":
                # Unpaged when nchunk fits one page (2^page_bits), else
                # PAGED: the FADB holds only a page bitmap (1 bit per
                # page, set = initialized) and its checksum; element
                # pages follow the block contiguously, each page being
                # up-to-2^page_bits elements + its own 4-byte checksum.
                client = 1 if filtered else 0
                entry = 16 if filtered else 8  # addr(8) [+ size(4) + mask(4)]
                PGB = 10
                psize = 1 << PGB
                paged = nchunk > psize
                if paged:
                    npages = -(-nchunk // psize)
                    bmlen = -(-npages // 8)
                    fadb_len = 14 + bmlen + 4
                    pages_len = nchunk * entry + 4 * npages
                else:
                    fadb_len = 14 + nchunk * entry + 4
                    pages_len = 0
                def fa_for(fahd_at):
                    fadb_at = fahd_at + 28
                    chunk_at = fadb_at + fadb_len + pages_len
                    caddrs = []
                    for off, blob in blobs:
                        caddrs.append(chunk_at)
                        chunk_at += len(blob)
                    fahd = (b"FAHD" + struct.pack("<BBBB", 0, client, entry, PGB) +
                            struct.pack("<QQ", nchunk, fadb_at))
                    fahd += struct.pack("<I", lookup3(fahd))
                    fadb = (b"FADB" + struct.pack("<BB", 0, client) +
                            struct.pack("<Q", fahd_at))
                    elems = b"".join(
                        (struct.pack("<QII", ca, len(blob), 0) if filtered
                         else struct.pack("<Q", ca))
                        for (off, blob), ca in zip(blobs, caddrs))
                    if paged:
                        fadb += b"\xff" * (npages // 8)
                        if npages % 8:
                            fadb += bytes([(1 << (npages % 8)) - 1])
                        fadb += struct.pack("<I", lookup3(fadb))
                        pages = b""
                        for p in range(npages):
                            pg = elems[p * psize * entry:(p + 1) * psize * entry]
                            pages += pg + struct.pack("<I", lookup3(pg))
                        assert len(fadb) == fadb_len and len(pages) == pages_len
                        return fahd + fadb + pages
                    fadb += elems
                    fadb += struct.pack("<I", lookup3(fadb))
                    assert len(fadb) == fadb_len
                    return fahd + fadb
                info = struct.pack("<B", PGB)  # page bits
                def hdr_for(fahd_at):
                    return mk_hdr(layout_v4(shape, dtype, chunk_shape, 3, info, fahd_at))
                hlen = len(hdr_for(0))
                fahd_at = at + hlen
                hdr = hdr_for(fahd_at)
                assert len(hdr) == hlen
                built.append(hdr + fa_for(fahd_at) + b"".join(b for _, b in blobs))
            elif index == "extarray":
                # Extensible Array chunk index (layout-v4 type 4) with
                # the H5D chunk-client creation parameters the HDF5
                # library hardwires (H5Dearray.c): max_nelmts_bits=32,
                # idx_blk_elmts=4, sup_blk_min_data_ptrs=4,
                # data_blk_min_elmts=16, max_dblk_page_nelmts_bits=10.
                # Super-block doubling per H5EAhdr.c: sblk u holds
                # 2^(u//2) data blocks of 16*2^((u+1)//2) elements; the
                # first 2*log2(4)=4 super blocks' data blocks are
                # addressed directly from the index block (6 slots),
                # later super blocks via EASB secondary blocks.
                # Creation knobs: mine/pgb overridable so a fixture can
                # FORCE paged data blocks at fixture scale (mine=4,
                # pgb=4 pages super blocks u>=5) — the same layout any
                # default-knob dataset gets past ~65k chunks. The
                # library invariant MINE*MINP <= 2^PGB must hold so
                # index-block-referenced data blocks stay unpaged.
                client = 1 if filtered else 0
                MAXB, IDXE, MINP = 32, 4, 4
                MINE = int(opts.get("mine", 16))
                PGB = int(opts.get("pgb", 10))
                # violating the invariant pages index-block-referenced
                # data blocks (no bitmap exists for those; the reader's
                # liveness rule is the grid bound) — allowed only when
                # a fixture forces it deliberately
                assert MINE * MINP <= (1 << PGB) or opts.get("iblkpaged")
                psize = 1 << PGB
                entry = 16 if filtered else 8  # addr(8) [+ size(4) + mask(4)]
                offsz = (MAXB + 7) // 8
                nsblks = 2 * (MAXB - (MINE.bit_length() - 1))
                iblk_sblks = 4                 # 2*log2(MINP)
                ndblk_addrs = 2 * (MINP - 1)
                nsblk_addrs = nsblks - iblk_sblks
                def sblk_info(u):
                    ndblks = 1 << (u // 2)
                    dnel = MINE << ((u + 1) // 2)
                    start_idx = sum((1 << (v // 2)) * (MINE << ((v + 1) // 2))
                                    for v in range(u))
                    start_dblk = sum(1 << (v // 2) for v in range(u))
                    return ndblks, dnel, start_idx, start_dblk
                def elmt(addr, blob):
                    if not filtered:
                        return struct.pack("<Q", UNDEF if addr is None else addr)
                    if addr is None:
                        return struct.pack("<QII", UNDEF, 0, 0)
                    return struct.pack("<QII", addr, len(blob), 0)
                def ea_for(eahd_at):
                    eahd_len = 12 + 6 * 8 + 8 + 4
                    eaib_len = (6 + 8 + IDXE * entry +
                                (ndblk_addrs + nsblk_addrs) * 8 + 4)
                    eaib_at = eahd_at + eahd_len
                    # which data blocks / secondary blocks exist for
                    # nchunk elements beyond the IDXE index-block ones
                    nrest = max(0, nchunk - IDXE)
                    dblks = []   # (sblk u, j within sblk, elmt start, nelmts)
                    u = 0
                    while True:
                        ndb, dnel, sidx, sdblk = sblk_info(u)
                        if sidx >= nrest:
                            break
                        for j in range(ndb):
                            if sidx + j * dnel >= nrest:
                                break
                            dblks.append((u, j, sidx + j * dnel, dnel))
                        u += 1
                    sblks = sorted(set(u for u, *_ in dblks
                                       if u >= iblk_sblks))
                    # lay out: EAHD, EAIB, EASBs, EADBs, then chunks
                    # paged data block: prefix + own checksum, then
                    # npages pages of psize elements + page checksum;
                    # the owning EASB carries one page-init bitmask
                    # PER data block, before the addresses
                    def bmlen_of(dn):
                        return -(-(dn // psize) // 8) if dn > psize else 0
                    easb_len = {u: 6 + 8 + offsz +
                                sblk_info(u)[0] * (8 + bmlen_of(sblk_info(u)[1]))
                                + 4
                                for u in sblks}
                    eadb_len = {(u, j): (6 + 8 + offsz + 4 +
                                         (dn // psize) * (psize * entry + 4))
                                if dn > psize
                                else 6 + 8 + offsz + dn * entry + 4
                                for (u, j, st, dn) in dblks}
                    pos = eaib_at + eaib_len
                    easb_at = {}
                    for u in sblks:
                        easb_at[u] = pos
                        pos += easb_len[u]
                    eadb_at = {}
                    for (u, j, st, dn) in dblks:
                        eadb_at[(u, j)] = pos
                        pos += eadb_len[(u, j)]
                    caddrs = []
                    for off, blob in blobs:
                        caddrs.append(pos)
                        pos += len(blob)
                    # EAHD: params, stats, index block address
                    eahd = (b"EAHD" + struct.pack("<BB", 0, client) +
                            struct.pack("<BBBBBB", entry, MAXB, IDXE,
                                        MINE, MINP, PGB) +
                            struct.pack("<QQQQQQ",
                                        len(sblks),
                                        max(easb_len.values()) if sblks else 0,
                                        len(dblks),
                                        max(eadb_len.values()) if dblks else 0,
                                        nchunk, nchunk) +
                            struct.pack("<Q", eaib_at))
                    eahd += struct.pack("<I", lookup3(eahd))
                    assert len(eahd) == eahd_len
                    # EAIB: direct elements, dblk addrs, sblk addrs
                    eaib = (b"EAIB" + struct.pack("<BB", 0, client) +
                            struct.pack("<Q", eahd_at))
                    for i in range(IDXE):
                        eaib += elmt(caddrs[i], blobs[i][1]) if i < nchunk \
                            else elmt(None, None)
                    slot = 0
                    for (u, j, st, dn) in dblks:
                        if u < iblk_sblks:
                            _, _, _, sdblk = sblk_info(u)
                            while slot < sdblk + j:
                                eaib += struct.pack("<Q", UNDEF); slot += 1
                            eaib += struct.pack("<Q", eadb_at[(u, j)])
                            slot += 1
                    while slot < ndblk_addrs:
                        eaib += struct.pack("<Q", UNDEF); slot += 1
                    for s in range(nsblk_addrs):
                        u = iblk_sblks + s
                        eaib += struct.pack("<Q", easb_at.get(u, UNDEF))
                    eaib += struct.pack("<I", lookup3(eaib))
                    assert len(eaib) == eaib_len
                    out = eahd + eaib
                    # EASBs: block offset + (if paged) per-data-block
                    # page-init bitmasks + data block addresses. A page
                    # is initialized iff it holds any element < nrest.
                    for u in sblks:
                        ndb, dnel, sidx, sdblk = sblk_info(u)
                        sb = (b"EASB" + struct.pack("<BB", 0, client) +
                              struct.pack("<Q", eahd_at) +
                              (IDXE + sidx).to_bytes(offsz, "little"))
                        bmlen = bmlen_of(dnel)
                        if bmlen:
                            npg = dnel // psize
                            for j in range(ndb):
                                bits = 0
                                if (u, j) in eadb_at:
                                    for p in range(npg):
                                        if sidx + j * dnel + p * psize < nrest:
                                            bits |= 1 << p
                                sb += bits.to_bytes(bmlen, "little")
                        for j in range(ndb):
                            sb += struct.pack("<Q",
                                              eadb_at.get((u, j), UNDEF))
                        sb += struct.pack("<I", lookup3(sb))
                        assert len(sb) == easb_len[u]
                        out += sb
                    # EADBs: block offset + elements (unset slots are
                    # the class fill value: undefined address). PAGED
                    # blocks hold only prefix + checksum; element pages
                    # (each with its own checksum) follow contiguously,
                    # and an UNINITIALIZED page's bytes are junk the
                    # reader must never touch.
                    for (u, j, st, dn) in dblks:
                        prefix = (b"EADB" + struct.pack("<BB", 0, client) +
                                  struct.pack("<Q", eahd_at) +
                                  (IDXE + st).to_bytes(offsz, "little"))
                        if dn > psize:
                            db = prefix + struct.pack("<I", lookup3(prefix))
                            for p in range(dn // psize):
                                if st + p * psize < nrest:
                                    pg = b""
                                    for t in range(psize):
                                        gi = IDXE + st + p * psize + t
                                        pg += elmt(caddrs[gi], blobs[gi][1]) \
                                            if gi < nchunk else elmt(None, None)
                                    db += pg + struct.pack("<I", lookup3(pg))
                                else:
                                    db += b"\xee" * (psize * entry + 4)
                        else:
                            db = prefix
                            for t in range(dn):
                                gi = IDXE + st + t
                                db += elmt(caddrs[gi], blobs[gi][1]) \
                                    if gi < nchunk else elmt(None, None)
                            db += struct.pack("<I", lookup3(db))
                        assert len(db) == eadb_len[(u, j)]
                        out += db
                    return out + b"".join(b for _, b in blobs)
                info = struct.pack("<BBBBB", MAXB, IDXE, MINP, MINE, PGB)
                def hdr_for(eahd_at):
                    return mk_hdr(layout_v4(shape, dtype, chunk_shape, 4,
                                            info, eahd_at))
                hlen = len(hdr_for(0))
                eahd_at = at + hlen
                hdr = hdr_for(eahd_at)
                assert len(hdr) == hlen
                built.append(hdr + ea_for(eahd_at))
            elif index == "btree2":
                # v2 B-tree chunk index (layout-v4 type 5): BTHD header,
                # BTLF leaf root at depth 0, or a BTIN internal root
                # whose separator records are real chunk records and
                # whose child pointers carry (address, nrec) with the
                # leaf-capacity-sized record-count field (H5B2 layout).
                # Node size 2048, split/merge 100/40 — the H5D defaults.
                NODE = 2048
                btype = 11 if filtered else 10
                rec_size = (8 + 4 + 4 + 8 * rank) if filtered else (8 + 8 * rank)
                max_leaf = (NODE - 10) // rec_size
                def enc_size(x):
                    n = 1
                    while x >= (1 << (8 * n)):
                        n += 1
                    return n
                nrec_sz = enc_size(max_leaf)
                grid = [(shape[d] + chunk_shape[d] - 1) // chunk_shape[d]
                        for d in range(rank)]
                def scaled(off):
                    return [off[d] // chunk_shape[d] for d in range(rank)]
                def record(off, blob, addr):
                    r = struct.pack("<Q", addr)
                    if filtered:
                        r += struct.pack("<II", len(blob), 0)
                    r += b"".join(struct.pack("<Q", s) for s in scaled(off))
                    assert len(r) == rec_size
                    return r
                def bt_for(bthd_at):
                    n = len(blobs)
                    # per-level capacities (H5B2hdr node_info): cum[d]
                    # is the max records a depth-d subtree holds;
                    # internal child pointers are addr + nrec
                    # (leaf-capacity-sized) + cumulative count (sized
                    # to the child level) when the child is internal
                    cum = [max_leaf]
                    cum_sz = [enc_size(max_leaf)]
                    max_int = [0]
                    while cum[-1] < n:
                        d = len(cum)
                        psz = 8 + nrec_sz + (cum_sz[d - 1] if d - 1 >= 1 else 0)
                        mi = (NODE - 10 - psz) // (rec_size + psz)
                        max_int.append(mi)
                        cum.append(mi + (mi + 1) * cum[d - 1])
                        cum_sz.append(enc_size(cum[-1]))
                    depth = len(cum) - 1

                    def split(idxs, d):
                        if d == 0:
                            assert len(idxs) <= max_leaf
                            return ("leaf", idxs)
                        k = max(2, -(-(len(idxs) + 1) // (cum[d - 1] + 1)))
                        assert k - 1 <= max_int[d]
                        body = len(idxs) - (k - 1)
                        base, extra = divmod(body, k)
                        seps, kids, pos = [], [], 0
                        for i in range(k):
                            take = base + (1 if i < extra else 0)
                            kids.append(split(idxs[pos:pos + take], d - 1))
                            pos += take
                            if i < k - 1:
                                seps.append(idxs[pos])
                                pos += 1
                        assert pos == len(idxs)
                        return ("int", d, seps, kids)
                    root = split(list(range(n)), depth)

                    def count(nd):
                        if nd[0] == "leaf":
                            return len(nd[1])
                        return len(nd[2]) + sum(count(k) for k in nd[3])

                    def nlen(nd):
                        if nd[0] == "leaf":
                            return 6 + len(nd[1]) * rec_size + 4
                        d = nd[1]
                        psz = 8 + nrec_sz + (cum_sz[d - 1] if d - 1 >= 1 else 0)
                        return 6 + len(nd[2]) * rec_size + len(nd[3]) * psz + 4

                    order = []
                    q = [root]
                    while q:
                        nd = q.pop(0)
                        order.append(nd)
                        if nd[0] == "int":
                            q.extend(nd[3])
                    addr = {}
                    pos2 = bthd_at + 38
                    for nd in order:
                        addr[id(nd)] = pos2
                        pos2 += nlen(nd)
                    chunk_at = pos2
                    caddrs = []
                    for off, blob in blobs:
                        caddrs.append(chunk_at)
                        chunk_at += len(blob)
                    root_nrec = len(root[1]) if root[0] == "leaf" else len(root[2])
                    bthd = (b"BTHD" + struct.pack("<BB", 0, btype) +
                            struct.pack("<IHH", NODE, rec_size, depth) +
                            struct.pack("<BB", 100, 40) +
                            struct.pack("<QH", addr[id(root)], root_nrec) +
                            struct.pack("<Q", n))
                    bthd += struct.pack("<I", lookup3(bthd))
                    assert len(bthd) == 38
                    out = bthd

                    def emit(nd):
                        if nd[0] == "leaf":
                            b = b"BTLF" + struct.pack("<BB", 0, btype)
                            for i in nd[1]:
                                b += record(blobs[i][0], blobs[i][1], caddrs[i])
                        else:
                            d = nd[1]
                            b = b"BTIN" + struct.pack("<BB", 0, btype)
                            for i in nd[2]:
                                b += record(blobs[i][0], blobs[i][1], caddrs[i])
                            for k in nd[3]:
                                kn = len(k[1]) if k[0] == "leaf" else len(k[2])
                                b += struct.pack("<Q", addr[id(k)])
                                b += kn.to_bytes(nrec_sz, "little")
                                if d - 1 >= 1:
                                    b += count(k).to_bytes(cum_sz[d - 1], "little")
                        b += struct.pack("<I", lookup3(b))
                        assert len(b) == nlen(nd)
                        return b
                    for nd in order:
                        out += emit(nd)
                    return out + b"".join(b for _, b in blobs)
                info = struct.pack("<IBB", NODE, 100, 40)
                def hdr_for(bthd_at):
                    return mk_hdr(layout_v4(shape, dtype, chunk_shape, 5,
                                            info, bthd_at))
                hlen = len(hdr_for(0))
                bthd_at = at + hlen
                hdr = hdr_for(bthd_at)
                assert len(hdr) == hlen
                built.append(hdr + bt_for(bthd_at))
            else:
                raise ValueError(index)
        at += len(built[-1])

    hdr = root_hdr(addrs)
    assert len(hdr) == len(h0)
    w.w(hdr)
    for b in built:
        w.w(b)
    # patch eof + superblock checksum (over bytes 0..43)
    w.buf[28:36] = struct.pack("<Q", len(w.buf))
    w.buf[44:48] = struct.pack("<I", lookup3(bytes(w.buf[0:44])))
    return bytes(w.buf)


if __name__ == "__main__":
    # CropHarvest-shaped test instance: x (n, t, bands) f8, y i8,
    # lats/lons f8 — eval/cropharvest_extensions.py:368-377
    n, t, b = 3, 4, 2
    x = [((i * 7 + 3) % 11) * 0.25 for i in range(n * t * b)]
    y = [1, 0, 1]
    lats = [14.5, -3.25, 48.0]
    lons = [-16.25, 36.5, 2.125]
    blob = write_h5([
        ("hours", (n, t, b), "f8", x),
        ("y", (n,), "i8", y),
        ("lats", (n,), "f8", lats),
        ("lons", (n,), "f8", lons),
    ])
    f32 = write_h5([("arr", (2, 3), "f4", [0.5, -1.25, 2.0, 3.5, -0.125, 7.0])])
    i4 = write_h5([("mask", (4,), "i4", [-2, 0, 5, 123456])])
    # chunked + deflate (the h5py compression="gzip" layout): 2x3
    # chunks over a 5x7 grid exercise edge clipping; a 1-d i4 vector
    # exercises a second chunk grid in the same file
    gvals = [((r * 7 + c) * 3 + 1) * 0.5 for r in range(5) for c in range(7)]
    cvals = [v * v - 7 for v in range(10)]
    chunked = write_h5([
        ("grid", (5, 7), "f8", gvals, (2, 3)),
        ("cvec", (10,), "i4", cvals, (4,)),
    ])
    # shuffle=True, compression="gzip" (filter pipeline of 2) plus a
    # 2-level chunk B-tree in the same file: the round-13 envelope
    svals = [((r * 5 + c) * 7 + 2) * 0.25 for r in range(6) for c in range(5)]
    dvals = [((r * 8 + c) * 13 + 5) % 1000 - 300 for r in range(9) for c in range(8)]
    shuffled = write_h5([
        ("sgrid", (6, 5), "f8", svals, (3, 2), {"shuffle": True}),
        ("deep", (9, 8), "i2", dvals, (2, 3), {"levels": 2}),
        ("both", (7, 4), "f4", [v * 0.5 - 3.0 for v in range(28)], (2, 2),
         {"shuffle": True, "levels": 2}),
    ])
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/h5_goldens"
    import os
    os.makedirs(out, exist_ok=True)
    open(out + "/instance.h5", "wb").write(blob)
    open(out + "/f32.h5", "wb").write(f32)
    open(out + "/i4.h5", "wb").write(i4)
    open(out + "/chunked.h5", "wb").write(chunked)
    open(out + "/shuffled.h5", "wb").write(shuffled)
    # v2 superblock / OHDR world (h5py libver='latest', contiguous +
    # v1-btree chunked): contiguous f8 + i2 and one gzip-chunked f4
    v2vals = [((i * 11 + 4) % 23) * 0.125 - 1.0 for i in range(12)]
    v2ints = [((i * 5 + 2) % 400) - 150 for i in range(9)]
    v2ch = [(i * 3 + 1) * 0.5 for i in range(20)]
    v2 = write_h5_v2([
        ("cont", (3, 4), "f8", v2vals),
        ("ints", (9,), "i2", v2ints),
        ("zch", (4, 5), "f4", v2ch, (2, 2)),
    ])
    open(out + "/v2latest.h5", "wb").write(v2)
    # layout-v4 chunk indexes (the libver='latest' CHUNKED world):
    # single-chunk gzip, implicit (contiguous raw chunks), fixed array
    scv = [((i * 17 + 3) % 31) * 0.5 for i in range(30)]
    impv = [((i * 9 + 1) % 250) - 100 for i in range(8)]
    fav = [(i * 7 + 2) * 0.25 for i in range(42)]
    v4 = write_h5_v2([
        ("fa", (6, 7), "f4", fav, (3, 4), {"index": "fixedarray"}),
        ("imp", (8,), "i4", impv, (4,), {"index": "implicit"}),
        ("sc", (5, 6), "f8", scv, (5, 6), {"index": "single"}),
    ])
    open(out + "/v4chunks.h5", "wb").write(v4)
    # extensible-array chunk indexes (what h5py writes for ANY
    # maxshape=... resizable dataset): ea1 exercises index-block
    # elements + a full sblk0 data block + a partially-filled sblk1
    # block (unset elements = undefined-address fill); ea2 a 2-D grid
    # with edge clipping; eadeep 500 chunks — deep enough that super
    # block 4's data blocks hang off an EASB secondary block
    eav1 = [((i * 13 + 5) % 101) * 0.25 - 8.0 for i in range(100)]
    eav2 = [((r * 10 + c) * 7 + 3) * 0.125 for r in range(9) for c in range(10)]
    eavd = [((i * 29 + 11) % 2001) - 1000 for i in range(2000)]
    eavr = [((i * 31 + 9) % 500) - 250 for i in range(48)]
    eac = write_h5_v2([
        ("ea1", (100,), "f4", eav1, (4,), {"index": "extarray"}),
        ("ea2", (9, 10), "f8", eav2, (2, 3), {"index": "extarray"}),
        ("eadeep", (2000,), "i2", eavd, (4,), {"index": "extarray"}),
        ("earaw", (48,), "i4", eavr, (6,), {"index": "extarray", "raw": True}),
    ])
    open(out + "/eachunks.h5", "wb").write(eac)
    # v2 B-tree chunk indexes (what h5py writes for >1 unlimited
    # dimension): bt1/bt2 depth-0 single-leaf roots (1-D and 2-D with
    # edge clipping), btdeep 500 chunks — a depth-1 tree whose BTIN
    # root holds real separator records and 6 leaf pointers, btraw an
    # unfiltered (record type 10) tree over raw chunks
    btv1 = [((i * 19 + 7) % 83) * 0.5 - 11.0 for i in range(60)]
    btv2 = [((r * 10 + c) * 11 + 1) * 0.0625 for r in range(9) for c in range(10)]
    btvd = [((i * 37 + 13) % 4001) - 2000 for i in range(2000)]
    btvr = [((i * 23 + 3) % 199) - 77 for i in range(40)]
    # 6000 chunks > the 5269-record depth-1 capacity at node size 2048
    # -> a depth-2 tree (internal root over internal children over
    # leaves, cumulative-count child-pointer fields)
    btv3 = [((i * 7 + 3) % 256) - 128 for i in range(24000)]
    btc = write_h5_v2([
        ("bt1", (60,), "f4", btv1, (4,), {"index": "btree2"}),
        ("bt2", (9, 10), "f8", btv2, (2, 3), {"index": "btree2"}),
        ("bt3deep", (24000,), "i1", btv3, (4,), {"index": "btree2"}),
        ("btdeep", (2000,), "i4", btvd, (4,), {"index": "btree2"}),
        ("btraw", (40,), "i2", btvr, (5,), {"index": "btree2", "raw": True}),
    ])
    open(out + "/btchunks.h5", "wb").write(btc)
    # PAGED fixed array: 1250 chunks > the 1024-element page, so the
    # FADB carries a page bitmap and two element pages (the second
    # partial) — the layout ANY dataset past 2^page_bits chunks gets
    fpv = [((i * 41 + 17) % 3001) - 1500 for i in range(5000)]
    frv = [(i * 13 + 5) * 0.25 - 20.0 for i in range(44)]
    fap = write_h5_v2([
        ("fap", (5000,), "i2", fpv, (4,), {"index": "fixedarray"}),
        ("faraw", (44,), "f8", frv, (4,), {"index": "fixedarray", "raw": True}),
    ])
    open(out + "/fapaged.h5", "wb").write(fap)
    # PAGED extensible-array data blocks: creation knobs mine=4,
    # pgb=4 force super blocks u>=5 into paged data blocks (2 pages
    # of 16 elements, each page with its own checksum, plus a
    # per-data-block page-init bitmask in the owning EASB) — the
    # layout ANY resizable dataset gets past ~65k chunks at default
    # creation params. eap (deflate-filtered, 168 chunks): super
    # block 5 holds one fully-paged block and one whose SECOND page
    # is uninitialized junk the reader must never touch; eapraw
    # (raw, 300 chunks) reaches super block 6 (8 dblk slots, the
    # tail UNDEF).
    epv = [((i * 43 + 7) % 1301) * 0.25 - 160.0 for i in range(670)]
    eprv = [((i * 53 + 19) % 4001) - 2000 for i in range(1200)]
    epc = write_h5_v2([
        ("eap", (670,), "f4", epv, (4,),
         {"index": "extarray", "mine": 4, "pgb": 4}),
        ("eapraw", (1200,), "i2", eprv, (4,),
         {"index": "extarray", "raw": True, "mine": 4, "pgb": 4}),
    ])
    open(out + "/eapaged.h5", "wb").write(epc)
    # PAGED data blocks referenced straight from the INDEX block:
    # knobs mine=8, pgb=4 violate the library's creation invariant
    # min_elmts*min_ptrs <= 2^page_bits, so the u=3 index-block data
    # blocks hold 32 elements = 2 pages of 16. NO page-init bitmap
    # exists on disk for these; liveness is the grid bound — each
    # dataset's LAST data block has an uninitialized trailing page of
    # junk the reader must never touch (eaip: page start 104 >= 100
    # chunks; eaipraw: page start 104 >= 100 chunks).
    eaiv = [((i * 37 + 23) % 1103) * 0.5 - 275.0 for i in range(416)]
    eairv = [((i * 61 + 31) % 3001) - 1500 for i in range(400)]
    eaip = write_h5_v2([
        ("eaip", (416,), "f4", eaiv, (4,),
         {"index": "extarray", "mine": 8, "pgb": 4, "iblkpaged": 1}),
        ("eaipraw", (400,), "i4", eairv, (4,),
         {"index": "extarray", "raw": True, "mine": 8, "pgb": 4,
          "iblkpaged": 1}),
    ])
    open(out + "/eaipaged.h5", "wb").write(eaip)
    # dense link storage (the layout any group past its compact
    # threshold gets): dense.h5 fits one root direct block + a leaf
    # B-tree root; densebig.h5 spans 3 doubling-table rows of direct
    # blocks under an FHIB root and a depth-1 name B-tree (BTIN root
    # whose separator records are real links)
    dnv = {
        "alpha": [0.5, -1.25, 7.0],
        "beta": [3.0, 9.5],
        "gamma": [-2.0, 0.25, 11.0, 4.5],
        "delta": [1.0],
        "epsilon": [6.25, -8.5],
        "zeta": [0.125, 2.5, -3.75],
    }
    dense = write_h5_dense(
        [(k, (len(v),), "f8", v) for k, v in sorted(dnv.items())])
    open(out + "/dense.h5", "wb").write(dense)
    dbv = {"d%03d" % i: [i * 0.5, -i * 0.25, i * 1.0 + 0.125]
           for i in range(120)}
    densebig = write_h5_dense(
        [(k, (3,), "f8", dbv[k]) for k in sorted(dbv)], btree_depth=1)
    open(out + "/densebig.h5", "wb").write(densebig)
    # an out-of-envelope file: the scan must SKIP it, not fail
    open(out + "/corrupt.h5", "wb").write(b"\x89HDF\r\n\x1a\nGARBAGE")

    # expected per-element rows for the q_hdf5_read oracle: values as
    # the DECODER widens them (f4 via float32 round-trip)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = {"file": [], "dataset": [], "idx": [], "value": []}
    expected = [
        ("instance", [("hours", x), ("y", [float(v) for v in y]),
                      ("lats", lats), ("lons", lons)]),
        ("f32", [("arr", [float(np.float32(v))
                          for v in [0.5, -1.25, 2.0, 3.5, -0.125, 7.0]])]),
        ("i4", [("mask", [float(v) for v in [-2, 0, 5, 123456]])]),
        ("chunked", [("cvec", [float(v) for v in cvals]),
                     ("grid", gvals)]),
        ("shuffled", [("both", [float(np.float32(v * 0.5 - 3.0))
                                for v in range(28)]),
                      ("deep", [float(v) for v in dvals]),
                      ("sgrid", svals)]),
        ("v2latest", [("cont", v2vals),
                      ("ints", [float(v) for v in v2ints]),
                      ("zch", [float(np.float32(v)) for v in v2ch])]),
        ("v4chunks", [("fa", [float(np.float32(v)) for v in fav]),
                      ("imp", [float(v) for v in impv]),
                      ("sc", scv)]),
        ("eachunks", [("ea1", [float(np.float32(v)) for v in eav1]),
                      ("ea2", eav2),
                      ("eadeep", [float(v) for v in eavd]),
                      ("earaw", [float(v) for v in eavr])]),
        ("btchunks", [("bt1", [float(np.float32(v)) for v in btv1]),
                      ("bt2", btv2),
                      ("bt3deep", [float(v) for v in btv3]),
                      ("btdeep", [float(v) for v in btvd]),
                      ("btraw", [float(v) for v in btvr])]),
        ("fapaged", [("fap", [float(v) for v in fpv]),
                     ("faraw", frv)]),
        ("eapaged", [("eap", [float(np.float32(v)) for v in epv]),
                     ("eapraw", [float(v) for v in eprv])]),
        ("eaipaged", [("eaip", [float(np.float32(v)) for v in eaiv]),
                      ("eaipraw", [float(v) for v in eairv])]),
        ("dense", [(k, dnv[k]) for k in sorted(dnv)]),
        ("densebig", [(k, dbv[k]) for k in sorted(dbv)]),
    ]
    for fname, dsets in expected:
        for ds, vals in dsets:
            for i, v in enumerate(vals):
                rows["file"].append(fname)
                rows["dataset"].append(ds)
                rows["idx"].append(i)
                rows["value"].append(float(v))
    gdir = out + "/golden"
    os.makedirs(gdir, exist_ok=True)
    pq.write_table(pa.table({
        "file": pa.array(rows["file"], pa.string()),
        "dataset": pa.array(rows["dataset"], pa.string()),
        "idx": pa.array(rows["idx"], pa.int32()),
        "value": pa.array(rows["value"], pa.float64()),
    }), gdir + "/expected.parquet")
    print("golden rows:", len(rows["file"]))
    def scala(nm, bb):
        rows = [", ".join("0x%02x" % x for x in bb[i:i+14]) for i in range(0, len(bb), 14)]
        return ("  private val %s: Array[Byte] = Array[Int](\n    " % nm
                + ",\n    ".join(rows) + ").map(_.toByte)")
    print(scala("goldenInstance", blob))
    print(scala("goldenF32", f32))
    print(scala("goldenI4", i4))
    print("// instance.h5 bytes:", len(blob))
