#!/usr/bin/env python
"""Print the suggested next-round verification rotation.

The correctness driver hash-checks only the FIRST ~50 entries of
`__spark_entry__.queries()` per round, so `_PRIORITY` must rotate:
queries with no lifetime hash-green CORRECTNESS row come first (in
current priority order), then everything else. This tool diffs the
registry against every CORRECTNESS_r*.json on disk and prints the
backlog — paste its head into `_PRIORITY` at restage time, then put
any entries whose CODE changed since their green row right after
(their old rows describe old outputs; this tool cannot see that).

Usage: python tools/rotation.py [slots]   (default 50)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import __spark_entry__ as entry

    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, r in rows.items():
            if (r.get("rows_match") and r.get("schema_match")
                    and r.get("hash_match")):
                green.add(name)
    order = list(entry.queries())
    backlog = [n for n in order if n not in green]
    print(f"# registered: {len(order)}  lifetime-green: "
          f"{len(green & set(order))}  never-green backlog: {len(backlog)}")
    print(f"# next {slots} rotation slots:")
    for n in backlog[:slots]:
        print(n)
    if len(backlog) > slots:
        print(f"# ...and {len(backlog) - slots} more queued behind")


if __name__ == "__main__":
    main()
