#!/usr/bin/env python
"""Merge per-case regression JSON snapshots into the main REGRESSION.json.

Usage: python scripts/merge_regression.py partial1.json [partial2.json ...]

Each partial file is a list of case summaries (the format
scripts/run_regression.py writes). Entries replace same-name entries in
REGRESSION.json (new cases are appended in the canonical CASES order).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from palace_tpu.testing.regression import CASES


def main() -> int:
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    main_path = os.path.join(root, "REGRESSION.json")
    by_name = {}
    if os.path.exists(main_path):
        for r in json.load(open(main_path)):
            by_name[r["name"]] = r
    for path in sys.argv[1:]:
        for r in json.load(open(path)):
            old = by_name.get(r["name"])
            by_name[r["name"]] = r
            print(f"{r['name']}: {old['status'] if old else '(new)'} -> "
                  f"{r['status']} (max_rel {r['max_rel']:.2e})")
    order = {n: i for i, n in enumerate(CASES)}
    merged = sorted(by_name.values(), key=lambda r: order.get(r["name"], 99))
    with open(main_path, "w") as fh:
        json.dump(merged, fh, indent=1)
    n_pass = sum(r["status"] == "pass" for r in merged)
    print(f"wrote {main_path}: {n_pass}/{len(merged)} pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
