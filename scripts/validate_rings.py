"""Magnetostatic analytic validation (VERDICT r2 item #8): solve the
concentric-square-ribbon-loop inductance problem on a self-generated graded
hex mesh and compare terminal-M against closed-form Neumann analytics
(palace_tpu/testing/rings.py).  Writes RINGS_VALIDATION.json at the repo
root.

Usage: python scripts/validate_rings.py [--order 1] [--h 0.5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--h", type=float, default=0.5)
    ap.add_argument("--a", type=float, default=6.0)
    ap.add_argument("--b", type=float, default=24.0)
    ap.add_argument("--L", type=float, default=140.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RINGS_VALIDATION.json"))
    args = ap.parse_args()

    from palace_tpu.testing.rings import run_validation

    rep = run_validation(a=args.a, b=args.b, h=args.h, L=args.L,
                         order=args.order)
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
