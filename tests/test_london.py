"""London penetration depth (superconductor kinetic inductance).

The lambda_L^-2 mu^-1 value term added to the stiffness (reference:
palace/models/spaceoperator.cpp:948-961) shifts every cavity eigenfrequency
by the plasma dispersion omega'^2 = omega0^2 + c^2 / lambda_L^2 (for mu =
eps = 1), which is checked analytically on the PEC box cavity.
"""

import json
import math
import os

import numpy as np
import pytest

from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh import gmsh_write


def test_london_cavity_shift(tmp_path):
    import palace_tpu

    mesh = box_tet(3, 3, 3)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    lam = 0.3  # London depth in mesh units (L0 = 1 cm box of edge 1)

    def solve(london, target, n):
        mats = [{"Attributes": [1], "Permittivity": 1.0}]
        if london:
            mats[0]["LondonDepth"] = lam
        cfg = {
            "Problem": {"Type": "Eigenmode", "Verbose": 0, "Output": "out"},
            "Model": {"Mesh": "box.msh", "L0": 1.0e-2},
            "Domains": {"Materials": mats},
            "Boundaries": {"PEC": {"Attributes": [1, 2, 3, 4, 5, 6]}},
            "Solver": {"Order": 2,
                       "Eigenmode": {"N": n, "Target": target, "Tol": 1e-9},
                       "Linear": {"Tol": 1e-9}},
        }
        p = tmp_path / f"cfg{london}.json"
        p.write_text(json.dumps(cfg))
        r = palace_tpu.run(str(p), output_dir=str(tmp_path / f"o{london}"))
        return np.real(r["frequencies_ghz"])

    f0 = solve(False, 15.0, 3)[0]
    c0 = 299792458.0
    plasma = (c0 / (2 * math.pi * lam * 1.0e-2)) / 1e9  # GHz
    f_expect = math.sqrt(f0**2 + plasma**2)
    # With the London term the former zero-frequency gradient modes become
    # a plasma cluster at c/(2 pi lambda); target above it to find the
    # shifted 101 cavity mode.
    # (the plasma cluster is massively degenerate, so ask for enough modes
    # that the shifted cavity mode is retained after ascending sort)
    fl = solve(True, f_expect, 10)
    best = fl[np.argmin(np.abs(fl - f_expect))]
    assert best == pytest.approx(f_expect, rel=2e-3), (f0, fl, f_expect)
