#!/usr/bin/env python
"""Static multi-derivation audit over PLANS.md (guide §2.4).

For every query section, count FileScan/Scan parquet occurrences per
source table. A table scanned >= 2x in one plan means the optimizer
planned the same source subtree more than once (CSE/ReuseExchange
defeated) — the round-14 offender signal. ReusedExchange nodes are
counted and reported so genuinely-shared subtrees don't flag.

Usage: python scripts/r14_scan_audit.py [PLANS.md path]
"""
from __future__ import annotations

import re
import sys
from collections import Counter

path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/PLANS.md"
text = open(path).read()

sections = re.split(r"^## ", text, flags=re.M)[1:]
rows = []
for sec in sections:
    name = sec.split(" ", 1)[0].split("\n", 1)[0].strip()
    # table name = first column-free token of the scan's location, best
    # effort: use the ReadSchema-less FileScan line's bracket columns to
    # fingerprint the source instead (cheap + stable): the first column
    # name before '#' identifies the table prefix reliably here.
    scans = re.findall(r"(?:FileScan|Scan) parquet ?\[?([A-Za-z0-9_,#LJ ]*)", sec)
    fp = Counter()
    for s in scans:
        first = s.split(",")[0].split("#")[0].strip() or "?"
        fp[first] += 1
    reused = len(re.findall(r"ReusedExchange", sec))
    multi = {k: v for k, v in fp.items() if v >= 2}
    if multi:
        rows.append((name, dict(fp), reused))

print(f"{len(sections)} query sections; {len(rows)} with a table scanned >=2x:")
for name, fp, reused in rows:
    print(f"  {name}: scans_by_first_col={fp} reused_exchange={reused}")
