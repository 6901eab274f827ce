#!/usr/bin/env python
"""Run the reference regression corpus and print a per-case pass/tol table.

Usage:
  python scripts/run_regression.py [case ...] [--long] [--out DIR]
                                   [--json PATH]

With no case arguments, runs every non-[Long] case. `--long` includes the
transmon [Long] cases. Results go to REGRESSION.json (and stdout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from palace_tpu.testing.regression import CASES, format_results, run_case


def _run_subprocess(name: str, out_root: str, timeout: float):
    """Run one case in a fresh interpreter; recover the result via JSON."""
    import pickle
    import subprocess
    import tempfile

    from palace_tpu.testing.regression import CaseResult

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as tf:
        result_path = tf.name
    code = (
        "import pickle, sys\n"
        "from palace_tpu.testing.regression import CASES, run_case\n"
        f"res = run_case(CASES[{name!r}], {out_root!r})\n"
        f"pickle.dump(res, open({result_path!r}, 'wb'))\n"
    )
    env = dict(os.environ)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return CaseResult(name, status="error", seconds=timeout,
                          error=f"timeout after {timeout:.0f}s")
    try:
        with open(result_path, "rb") as fh:
            res = pickle.load(fh)
        os.unlink(result_path)
        return res
    except Exception:
        tail = (proc.stdout + proc.stderr)[-2000:]
        return CaseResult(name, status="error",
                          error=f"subprocess rc={proc.returncode}:\n{tail}")


def _result_from_summary(d):
    from palace_tpu.testing.regression import CaseResult

    r = CaseResult(d["name"], status=d["status"], error=d.get("error"))
    r.seconds = d.get("seconds", 0.0)
    r._summary_override = d
    return r


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cases", nargs="*", help="case names (default: all)")
    ap.add_argument("--long", action="store_true", help="include [Long] cases")
    ap.add_argument("--out", default="/tmp/palace_tpu_regression")
    ap.add_argument("--json", default="REGRESSION.json")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--in-process", action="store_true",
                    help="run cases in this process (default: subprocess "
                         "per case, isolating JAX state)")
    ap.add_argument("--timeout", type=float, default=3600.0,
                    help="per-case timeout in seconds (subprocess mode)")
    ap.add_argument("--resume", action="store_true",
                    help="skip cases already recorded in the --json file")
    args = ap.parse_args()

    if args.list:
        for name, spec in CASES.items():
            print(f"{name:42s} rtol={spec.rtol:g} atol={spec.atol:g}"
                  f"{' [Long]' if spec.long else ''}")
        return 0

    names = args.cases or [n for n, s in CASES.items()
                           if args.long or not s.long]
    unknown = [n for n in names if n not in CASES]
    if unknown:
        print(f"unknown cases: {unknown}", file=sys.stderr)
        return 2

    results = []
    done = {}
    if args.resume and args.json and os.path.exists(args.json):
        for r in json.load(open(args.json)):
            done[r["name"]] = r
    for name in names:
        if name in done and done[name]["status"] in ("pass", "fail",
                                                     "no-mesh"):
            print(f"=== {name} (resumed: {done[name]['status']})",
                  flush=True)
            results.append(_result_from_summary(done[name]))
            continue
        print(f"=== {name}", flush=True)
        if args.in_process:
            res = run_case(CASES[name], args.out)
        else:
            res = _run_subprocess(name, args.out, args.timeout)
        results.append(res)
        if args.json:
            # Incremental snapshot: a killed sweep still leaves results.
            with open(args.json, "w") as fh:
                json.dump([getattr(r, "_summary_override", None)
                           or r.summary() for r in results], fh, indent=1)
        print(f"    {res.status} ({res.seconds:.1f}s, max_rel "
              f"{res.max_rel:.2e}, {res.n_failures()} failures)", flush=True)
        if res.error:
            print("    " + res.error.strip().replace("\n", "\n    "))
        for f in res.files:
            if not f.ok:
                print(f"    {f.name}: {f.failures[0]}"
                      + (f" (+{len(f.failures) - 1} more)"
                         if len(f.failures) > 1 else ""))

    print()
    print(format_results(results))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump([getattr(r, "_summary_override", None) or r.summary()
                       for r in results], fh, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
