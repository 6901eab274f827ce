#!/usr/bin/env python
"""Merge per-case sweep results into REGRESSION.json without dropping
entries.

The snapshot must always record every case's latest-known outcome
(including failures); re-running a subset must update only those entries.
Each merged entry gets a `measured_round` tag naming the round that
produced the numbers, so stale records are visible.

Usage:
  python scripts/merge_regression.py RESULTS.json [--round r5]
                                     [--into REGRESSION.json]
"""

from __future__ import annotations

import argparse
import json


def merge(into_path: str, results_path: str, round_tag: str) -> int:
    base = json.load(open(into_path))
    fresh = json.load(open(results_path))
    by_name = {r["name"]: i for i, r in enumerate(base)}
    n = 0
    for r in fresh:
        r = dict(r)
        r["measured_round"] = round_tag
        if r["name"] in by_name:
            base[by_name[r["name"]]] = r
        else:
            base.append(r)
        n += 1
    with open(into_path, "w") as fh:
        json.dump(base, fh, indent=1)
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("results")
    ap.add_argument("--round", default="r5")
    ap.add_argument("--into", default="REGRESSION.json")
    args = ap.parse_args()
    n = merge(args.into, args.results, args.round)
    print(f"merged {n} case(s) into {args.into} (tag {args.round})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
