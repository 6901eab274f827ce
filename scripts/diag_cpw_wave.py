"""Diagnostic: run cpw_wave_uniform at a single frequency and compare
port-S + surface-F against the reference row (wave-port launch debugging).

Usage: python scripts/diag_cpw_wave.py [freq_ghz]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from palace_tpu.config import jsonio  # noqa: E402

INPUT = "/root/reference/test/data/regression/input/cpw/cpw_wave_uniform.json"
REF = "/root/reference/test/data/regression/ref/cpw/wave_uniform"


def main():
    freq = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    cfg = jsonio.load(INPUT)
    cfg["Model"]["Mesh"] = os.path.join(os.path.dirname(INPUT),
                                        cfg["Model"]["Mesh"])
    cfg["Solver"]["Driven"]["Samples"] = [
        {"Type": "Point", "Freq": [freq], "SaveStep": 0}]
    cfg["Solver"]["Driven"].pop("Save", None)
    tmp = tempfile.mkdtemp(prefix="cpw_wave_diag_")
    cpath = os.path.join(tmp, "config.json")
    with open(cpath, "w") as f:
        json.dump(cfg, f)

    from palace_tpu import api

    out = os.path.join(tmp, "out")
    api.run(cpath, output_dir=out)

    for fname in ("port-S.csv", "surface-F.csv", "domain-E.csv"):
        ours = os.path.join(out, fname)
        refp = os.path.join(REF, fname)
        if not os.path.exists(ours):
            print(f"== {fname}: MISSING in output")
            continue
        with open(ours) as f:
            lines = f.read().strip().splitlines()
        with open(refp) as f:
            rlines = f.read().strip().splitlines()
        hdr = [h.strip() for h in lines[0].split(",")]
        # find the ref row with matching frequency
        rrow = None
        for ln in rlines[1:]:
            vals = [float(x) for x in ln.split(",")]
            if abs(vals[0] - freq) < 1e-9:
                rrow = vals
                break
        orow = [float(x) for x in lines[1].split(",")]
        print(f"== {fname} @ {freq} GHz")
        rhdr = [h.strip() for h in rlines[0].split(",")]
        for h, o in zip(hdr, orow):
            try:
                ri = rhdr.index(h)
                r = rrow[ri] if rrow else float("nan")
            except ValueError:
                r = float("nan")
            rel = abs(o - r) / max(abs(r), 1e-12)
            flag = "  <-- " if rel > 2e-2 and abs(o - r) > 1e-11 else ""
            print(f"  {h:34s} ours {o:+.6e}  ref {r:+.6e}  rel {rel:.2e}{flag}")
    print("outdir:", out)


if __name__ == "__main__":
    main()
