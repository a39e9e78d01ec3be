#!/usr/bin/env python
"""Recompute the driver grading window (stalest-stamp-first) and rewrite
the ``_DRIVER_WINDOW_FIRST`` block in plans/catalog.py.

The driver grades only the first 50 ``queries()`` entries each round, so
the rotation policy is: queries with NO driver CORRECTNESS row ever come
first (new queries), then everything else ordered by the round of its
NEWEST row, oldest first — stamps stay fresh instead of decaying into a
backlog.  Usage::

    python scripts/rotate_window.py            # print the proposed 50
    python scripts/rotate_window.py --write    # rewrite catalog.py in place

After --write, re-run the gates (the import of catalog.py itself
validates that every window name is registered).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CATALOG = os.path.join(HERE, "duckdb_cluster_hash_spark", "plans", "catalog.py")
WINDOW = 50


def compute_window() -> tuple[list[str], dict[str, int]]:
    stamp: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", p).group(1))
        try:
            rows = json.load(open(p))
        except ValueError:
            continue
        if not isinstance(rows, dict):  # off-format artifact (e.g. a list)
            print(f"skipping off-format artifact {p}", file=sys.stderr)
            continue
        for name in rows:
            stamp[name] = max(stamp.get(name, 0), rnd)

    from duckdb_cluster_hash_spark.plans.catalog import QUERIES

    new = [n for n in QUERIES if n not in stamp]
    stale = sorted((n for n in QUERIES if n in stamp), key=lambda n: stamp[n])
    return (new + stale)[:WINDOW], stamp


def main() -> int:
    window, stamp = compute_window()
    if "--write" not in sys.argv:
        for n in window:
            print(f'    "{n}",' + (f"  # r{stamp[n]}" if n in stamp else "  # never stamped"))
        print(f"\n({len(window)} names; rerun with --write to rewrite catalog.py)")
        return 0

    src = open(CATALOG).read()
    m = re.search(r"_DRIVER_WINDOW_FIRST = \[\n(.*?)\n\]\n", src, re.DOTALL)
    if not m:
        print("could not locate _DRIVER_WINDOW_FIRST block", file=sys.stderr)
        return 1
    body = "".join(
        f'    "{n}",' + (f"  # newest stamp: r{stamp[n]}\n" if n in stamp else "  # never stamped\n")
        for n in window
    )
    src = src[: m.start()] + "_DRIVER_WINDOW_FIRST = [\n" + body + "]\n" + src[m.end() :]
    open(CATALOG, "w").write(src)
    print(f"rewrote {CATALOG} with {len(window)} names; re-run the gates")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
