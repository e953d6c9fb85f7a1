"""Driver-signal staleness report: for every registry id, the most
recent round whose CORRECTNESS_r*.json carries a green row, so each
round's `_WINDOW_PRIORITY` rotation (queries/__init__.py) can target
the stalest cohort mechanically instead of re-deriving it by hand.

Green = rows_match, no err, AND neither hash_match nor schema_match is
explicitly False.  rows_match does NOT imply hash_match — a row can
match on count but mismatch on values (CORRECTNESS_r08.json's
timeseries_rate / skew_key_histogram did exactly that), and such a row
must NOT advance the id's latest-green round.  Ids under the weaker
rows-only check simply have no hash/schema fields; absent fields stay
green.

Run: python -m tools.staleness [--repo /root/repo] [--top 60]
Prints a round histogram and the stalest ids, oldest first.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter


def latest_green(repo: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r0*(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            if (
                v.get("rows_match")
                and v.get("err") is None
                and v.get("hash_match") is not False
                and v.get("schema_match") is not False
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from logpump_spark.queries import all_queries

    registry = list(all_queries())
    latest = latest_green(args.repo)

    hist = Counter(latest.get(n, 0) for n in registry)
    print("latest-green round histogram (0 = never driver-green):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")

    stale = sorted(registry, key=lambda n: (latest.get(n, 0), n))[: args.top]
    print(f"\nstalest {len(stale)} ids (candidates for the next window):")
    for n in stale:
        print(f"  r{latest.get(n, 0):02d}  {n}")


if __name__ == "__main__":
    main()
