#!/usr/bin/env python3
"""Foreign-fixture writer for the robots.txt surface (q_robots_rules /
q_robots_filter) — crawl politeness is a first-class curation input:
corpora like C4/CC record per-URL robots decisions, and republishing
disallowed content is a compliance bug. Files are hand-written against
RFC 9309 (groups of user-agent lines, allow/disallow rules matched by
LONGEST pattern with allow winning ties, `*` wildcards and `$` end
anchors, crawl-delay and sitemap extensions, comments, case-
insensitive directives); the decision golden is computed by the
INDEPENDENT matcher below — not by the engine under test. The stdlib
urllib.robotparser is NOT used: it predates RFC 9309's longest-match
rule and ignores wildcards.

Layout under tools/fixtures/q_robots_rules/:
  shop.example.txt   * group (disallow /cart, /admin/*, allow
                     /admin/public, wildcard *.pdf$ and mid-pattern
                     wildcards) + a graftbot group (own rules) +
                     crawl-delay + sitemap + comments + mixed case
  news.example.txt   disallow-all for *, allow-all for graftbot
                     (empty disallow), stacked user-agent lines
  blank.example.txt  an empty file: everything allowed
  urls.txt           the URL paths the filter decides (one per line,
                     host<TAB>path)
Goldens: rules/expected.parquet (per parsed rule) and
filter/expected.parquet (per (host, path) decision for agent
'graftbot', with the matched pattern).
"""
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

BASE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
D = os.path.join(BASE, "q_robots_rules")
os.makedirs(os.path.join(D, "golden"), exist_ok=True)
FD = os.path.join(BASE, "q_robots_filter")
os.makedirs(os.path.join(FD, "golden"), exist_ok=True)

SHOP = """# robots for shop.example
User-agent: *
Disallow: /cart
Disallow: /admin/*
Allow: /admin/public
Disallow: /*.pdf$
Allow: /downloads/*.pdf$
Crawl-delay: 2

# the polite corpus crawler gets more
User-Agent: graftbot
Allow: /cart/shared
Disallow: /cart
disallow: /private

Sitemap: https://shop.example/sitemap.xml
"""

NEWS = """User-agent: *
Disallow: /

User-agent: graftbot
User-agent: otherbot
Disallow:
"""

with open(os.path.join(D, "shop.example.txt"), "w") as fh:
    fh.write(SHOP)
with open(os.path.join(D, "news.example.txt"), "w") as fh:
    fh.write(NEWS)
with open(os.path.join(D, "blank.example.txt"), "w") as fh:
    fh.write("")

URLS = [
    ("shop.example", "/cart"),
    ("shop.example", "/cart/item/9"),
    ("shop.example", "/cart/shared/list"),
    ("shop.example", "/admin/public/docs"),
    ("shop.example", "/admin/secret"),
    ("shop.example", "/catalog/page"),
    ("shop.example", "/paper.pdf"),
    ("shop.example", "/downloads/guide.pdf"),
    ("shop.example", "/private/x"),
    ("news.example", "/story/2026/a"),
    ("news.example", "/"),
    ("blank.example", "/anything/goes"),
]
with open(os.path.join(FD, "urls.txt"), "w") as fh:
    for h, p in URLS:
        fh.write("%s\t%s\n" % (h, p))


def parse(content):
    """-> (groups: [(agents, [(verb, value, seq)])], extras)"""
    groups = []
    agents, rules = [], []
    open_group = False  # user-agent lines still stackable
    extras = []
    seq = 0
    for line in content.split("\n"):
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        k, v = line.split(":", 1)
        k = k.strip().lower()
        v = v.strip()
        if k == "user-agent":
            if not open_group and agents:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(v.lower())
            open_group = True
        elif k in ("allow", "disallow"):
            open_group = False
            if agents:
                rules.append((k, v, seq))
                seq += 1
        elif k == "crawl-delay":
            open_group = False
            if agents:
                rules.append((k, v, seq))
                seq += 1
        elif k == "sitemap":
            extras.append((k, v, seq))
            seq += 1
    if agents:
        groups.append((agents, rules))
    return groups, extras


def pattern_regex(pat):
    out = "^"
    i = 0
    anchored = pat.endswith("$")
    body = pat[:-1] if anchored else pat
    for c in body:
        out += ".*" if c == "*" else re.escape(c)
    return out + ("$" if anchored else "")


def decide(groups, agent, path):
    """RFC 9309: pick the group with the most specific matching agent
    (exact beats *), then the longest matching pattern; allow wins
    ties; no match or no group -> allowed."""
    chosen = None
    for agents, rules in groups:
        if agent in agents:
            chosen = rules
            break
    if chosen is None:
        for agents, rules in groups:
            if "*" in agents:
                chosen = rules
                break
    if chosen is None:
        return 1, ""
    best = None  # (len, allow, pattern)
    for verb, val, _ in chosen:
        if verb not in ("allow", "disallow"):
            continue
        if val == "":
            continue  # empty pattern matches nothing (RFC 9309)
        if re.match(pattern_regex(val), path):
            cand = (len(val), 1 if verb == "allow" else 0, val)
            if best is None or cand > best:  # full tuple: deterministic
                best = cand
    if best is None:
        return 1, ""
    return best[1], best[2]


RROWS = []  # (host, agent, verb, value, seq)
FROWS = []  # (host, agent, path, allowed, rule)
parsed = {}
for fname in ("shop.example.txt", "news.example.txt", "blank.example.txt"):
    host = fname[:-4]
    content = open(os.path.join(D, fname)).read()
    groups, extras = parse(content)
    parsed[host] = groups
    for agents, rules in groups:
        for a in agents:
            for verb, val, seq in rules:
                RROWS.append((host, a, verb, val, seq))
    for verb, val, seq in extras:
        RROWS.append((host, "", verb, val, seq))

# graftbot hits its own groups; crawlzilla (unknown) falls to * —
# which is where the wildcard and $-anchor rules live
for agent in ("graftbot", "crawlzilla"):
    for host, path in URLS:
        allowed, rule = decide(parsed[host], agent, path)
        FROWS.append((host, agent, path, allowed, rule))

rschema = pa.schema([
    ("host", pa.string()), ("agent", pa.string()), ("verb", pa.string()),
    ("value", pa.string()), ("seq", pa.int32()),
])
pq.write_table(pa.Table.from_pylist(
    [dict(zip([f.name for f in rschema], r)) for r in RROWS],
    schema=rschema), os.path.join(D, "golden", "expected.parquet"))

fschema = pa.schema([
    ("host", pa.string()), ("agent", pa.string()), ("path", pa.string()),
    ("allowed", pa.int32()), ("rule", pa.string()),
])
pq.write_table(pa.Table.from_pylist(
    [dict(zip([f.name for f in fschema], r)) for r in FROWS],
    schema=fschema), os.path.join(FD, "golden", "expected.parquet"))
print(f"rules: {len(RROWS)} rows; decisions: {len(FROWS)} rows")
for r in FROWS:
    print(r)
