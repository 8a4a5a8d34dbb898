#!/usr/bin/env python3
"""Foreign-fixture writer for the MediaWiki dump scan (q_wiki_pages) —
dump XML is assembled here by hand against the export format Wikipedia
actually publishes (pages-articles: <mediawiki> of <page> elements,
content XML-escaped, bzip2-compressed), NOT by the engine under test;
the golden parquet is computed from the RAW values used to build the
pages (this side escapes, the Scala side unescapes — the two must be
exact inverses over the fixture's entity zoo or the hash flips).

Layout written under tools/fixtures/q_wiki_pages/:
  wiki-00.xml.bz2   five pages: entity-laden title+text (&amp;#65;
                    must survive as literal &#65;), numeric entities
                    (decimal + hex), a redirect page, a ns=10
                    template, unicode, a self-closed <text/>
  wiki-01.xml.bz2   TWO concatenated bz2 streams (multistream dump
                    shape), three pages with multiline wikitext
  corrupt-02.xml.bz2 truncated stream -> shard skipped
  notwiki-03.xml.bz2 valid bz2, not a mediawiki doc -> shard skipped
Both bad shards' ABSENCE from the golden is itself graded.
"""
import bz2, hashlib, os

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_wiki_pages")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)

ROWS = []  # (shard, page_id, ns, title, redirect, text_len, text_md5)


def esc(s):
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;").replace('"', "&quot;"))


def page(pid, ns, title, text, redirect=None, raw_entities=None,
         self_closed=False):
    """Build a <page> element; `raw_entities` maps placeholder ->
    literal entity spelled directly into the XML (so the DECODED value
    differs from the escaped round-trip)."""
    body = esc(text)
    if raw_entities:
        for k, v in raw_entities.items():
            body = body.replace(esc(k), v)
    r = ('    <redirect title="%s" />\n' % esc(redirect)) if redirect else ""
    t = ("      <text bytes=\"0\" xml:space=\"preserve\" />"
         if self_closed else
         '      <text bytes="%d" xml:space="preserve">%s</text>'
         % (len(body), body))
    return ("  <page>\n"
            "    <title>%s</title>\n"
            "    <ns>%d</ns>\n"
            "    <id>%d</id>\n%s"
            "    <revision>\n"
            "      <id>%d</id>\n"
            "      <timestamp>2024-06-01T00:00:00Z</timestamp>\n"
            "%s\n"
            "    </revision>\n"
            "  </page>\n") % (esc(title), ns, pid, r, pid * 10 + 1, t)


def dump(pages):
    return ('<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/" '
            'version="0.11" xml:lang="fr">\n  <siteinfo>\n'
            '    <sitename>Wikipédia</sitename>\n  </siteinfo>\n'
            + "".join(pages) + "</mediawiki>\n").encode("utf-8")


def record(shard, pid, ns, title, redirect, text):
    # `text` rides along so the q_wiki_clean oracle can apply the
    # wikitext-clean chain to the RAW page text independently
    ROWS.append((shard, pid, ns, title, redirect, len(text),
                 hashlib.md5(text.encode()).hexdigest(), text))


# ---- wiki-00: the entity zoo
p0 = dict(pid=1, ns=0, title='A & B <test> "q"',
          text='Sum A&B holds when x<y and y>"z".\n'
               'Literal entity: &#65; stays text.\n'
               "Template call {{cite|a=1}} and [[Lien|aff]] survive raw.")
# é written as a NUMERIC entity (decimal), ü as hex — decoder must
# produce the characters while the ESCAPED text around them round-trips
p1 = dict(pid=2, ns=0, title="Café Touba",
          text="Café with über flavor & <sugar>.",
          raw_entities={"é": "&#233;", "ü": "&#xFC;"})
p2 = dict(pid=3, ns=0, title="Dakar (ville)", text="#REDIRECT [[Dakar]]",
          redirect="Dakar")
p3 = dict(pid=4, ns=10, title="Modèle:Infobox", text="{{{param|}}}")
p4 = dict(pid=5, ns=0, title="Empty stub", text="", self_closed=True)

s0 = "wiki-00.xml.bz2"
with open(os.path.join(D, s0), "wb") as f:
    f.write(bz2.compress(dump([page(**p) for p in [p0, p1, p2, p3, p4]])))
for p in [p0, p1, p2, p3, p4]:
    record(s0, p["pid"], p["ns"], p["title"], p.get("redirect"), p["text"])

# ---- wiki-01: multistream, multiline wikitext
q0 = dict(pid=100, ns=0, title="Arachide",
          text="== Culture ==\nL'arachide pousse {{citation needed}}\n"
               "dans le [[bassin arachidier|bassin]].\n\n"
               "{| class=\"wikitable\"\n|-\n| a || b\n|}\n")
q1 = dict(pid=101, ns=0, title="Hivernage",
          text="La saison des pluies s'étend de juin à octobre.")
q2 = dict(pid=102, ns=14, title="Catégorie:Agriculture",
          text="[[Catégorie:Sénégal]]")
s1 = "wiki-01.xml.bz2"
half_a = dump([page(**q0), page(**q1)])
# a multistream dump is literally concatenated bz2 members; the SECOND
# member begins mid-document (its own <page> stream) — model that with
# a split INSIDE the serialized document
blob = dump([page(**q) for q in [q0, q1, q2]])
cut = blob.index(b"  <page>\n    <title>Cat")
with open(os.path.join(D, s1), "wb") as f:
    f.write(bz2.compress(blob[:cut], 9))
    f.write(bz2.compress(blob[cut:], 1))
for q in [q0, q1, q2]:
    record(s1, q["pid"], q["ns"], q["title"], q.get("redirect"), q["text"])

good = bz2.compress(dump([page(**p0)]))
with open(os.path.join(D, "corrupt-02.xml.bz2"), "wb") as f:
    f.write(good[:len(good) - 9])
with open(os.path.join(D, "notwiki-03.xml.bz2"), "wb") as f:
    f.write(bz2.compress(b"<html><body>not a dump</body></html>"))

schema = pa.schema([
    ("shard", pa.string()), ("page_id", pa.int64()), ("ns", pa.int32()),
    ("title", pa.string()), ("redirect", pa.string()),
    ("text_len", pa.int32()), ("text_md5", pa.string()),
    ("text", pa.string()),
])
tbl = pa.Table.from_pylist(
    [dict(zip([f.name for f in schema], r)) for r in ROWS], schema=schema)
pq.write_table(tbl, os.path.join(D, "golden", "expected.parquet"))
print(f"wrote {len(ROWS)} golden rows across "
      f"{len(set(r[0] for r in ROWS))} graded shards")
