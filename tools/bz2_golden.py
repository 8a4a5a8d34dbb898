#!/usr/bin/env python3
"""Foreign-fixture writer for the `.jsonl.bz2` shard scan
(q_jsonl_bz2) — shards are written by Python's stdlib bz2 module (real
libbzip2), NOT by the engine under test; the golden parquet is
computed from the lines used to ENCODE. Same practice as the gzip/zstd
siblings (tools/warc_golden.py).

Layout written under tools/fixtures/q_jsonl_bz2/:
  docs-00.jsonl.bz2    one stream, default block size
  docs-01.jsonl.bz2    TWO concatenated streams (the pbzip2 /
                       `cat a.bz2 b.bz2` shape), levels 1 and 9
  docs-02.jsonl.bz2    level-1 single stream, unicode text
  corrupt-03.jsonl.bz2 truncated final stream -> file skipped
  garbage-04.jsonl.bz2 valid stream + trailing garbage -> file skipped
Both bad files' ABSENCE from the golden is itself graded.
"""
import bz2, hashlib, json, os

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_jsonl_bz2")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

rows = []  # (shard, line_idx, doc_id, lang, text_len, text_md5)
langs = ["fr", "en", "wo", "pt"]
topics = [
    "dry season composite keeps the cloud-free median",
    "backscatter ratio flags the flooded rice plots",
    "harvest date shifts NDVI senescence two dekads",
    "le bassin arachidier sème après la première pluie",
    "groundnut yield tracks cumulative rainfall by June",
]


def shard_lines(shard_no, n, start):
    lines = []
    for i in range(n):
        doc_id = start + i
        lang = langs[(doc_id * 5 + shard_no) % len(langs)]
        text = "doc %d: %s (rev %d)" % (
            doc_id, topics[doc_id % len(topics)], (doc_id * 11) % 89)
        lines.append(json.dumps(
            {"doc_id": doc_id, "lang": lang, "text": text},
            separators=(",", ":"), ensure_ascii=False))
    return lines


def record(shard, lines):
    for i, l in enumerate(lines):
        o = json.loads(l)
        rows.append((shard, i, o["doc_id"], o["lang"], len(o["text"]),
                     hashlib.md5(o["text"].encode()).hexdigest()))


def blob(lines, level=9):
    return bz2.compress(("\n".join(lines) + "\n").encode(), level)


s0, lines0 = "docs-00.jsonl.bz2", shard_lines(0, 12, 5000)
with open(os.path.join(D, s0), "wb") as f:
    f.write(blob(lines0))
record(s0, lines0)

s1, lines1 = "docs-01.jsonl.bz2", shard_lines(1, 14, 6000)
with open(os.path.join(D, s1), "wb") as f:
    f.write(blob(lines1[:7], level=1))
    f.write(blob(lines1[7:], level=9))
record(s1, lines1)

s2, lines2 = "docs-02.jsonl.bz2", shard_lines(2, 9, 7000)
with open(os.path.join(D, s2), "wb") as f:
    f.write(blob(lines2, level=1))
record(s2, lines2)

good = blob(shard_lines(3, 10, 8000))
with open(os.path.join(D, "corrupt-03.jsonl.bz2"), "wb") as f:
    f.write(good[:len(good) - 12])
with open(os.path.join(D, "garbage-04.jsonl.bz2"), "wb") as f:
    f.write(blob(shard_lines(4, 3, 9000)) + b"not a bzip2 stream")

table = pa.table({
    "shard": pa.array([r[0] for r in rows], pa.string()),
    "line_idx": pa.array([r[1] for r in rows], pa.int64()),
    "doc_id": pa.array([r[2] for r in rows], pa.int64()),
    "lang": pa.array([r[3] for r in rows], pa.string()),
    "text_len": pa.array([r[4] for r in rows], pa.int32()),
    "text_md5": pa.array([r[5] for r in rows], pa.string()),
})
pq.write_table(table, os.path.join(D, "golden", "expected.parquet"))
print("q_jsonl_bz2: %d golden rows across %d graded shards"
      % (len(rows), len(set(r[0] for r in rows))))
