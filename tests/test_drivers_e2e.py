"""End-to-end config-driven driver tests on generated meshes."""

import json
import os

import numpy as np
import pytest

import palace_tpu
from palace_tpu.mesh.generate import box_hex, box_tet
from palace_tpu.mesh.gmsh_write import write as write_msh


@pytest.fixture
def box_case(tmp_path):
    def make(mesh, config):
        write_msh(mesh, str(tmp_path / "box.msh"))
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(json.dumps(config))
        return str(cfg_path)

    return make


def test_electrostatic_parallel_plate_e2e(box_case, tmp_path):
    """Parallel-plate capacitor: C = eps0 A / d exactly (linear solution)."""
    mesh = box_hex(2, 2, 2, lx=2.0, ly=3.0, lz=0.5)
    cfg = {
        "Problem": {"Type": "Electrostatic", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 4.0}]},
        "Boundaries": {
            "Ground": {"Attributes": [5]},
            "Terminal": [{"Index": 1, "Attributes": [6]}],
        },
        "Solver": {
            "Order": 2,
            "Electrostatic": {"Save": 0},
            "Linear": {"Tol": 1e-12, "MaxIts": 500},
        },
    }
    r = palace_tpu.run(box_case(mesh, cfg), output_dir=str(tmp_path / "out"))
    eps0 = 8.8541878188e-12
    C_expect = 4.0 * eps0 * (2e-3 * 3e-3) / 0.5e-3
    assert np.isclose(r["C"][0, 0], C_expect, rtol=1e-9), (r["C"], C_expect)
    assert os.path.exists(tmp_path / "out" / "terminal-C.csv")


def test_magnetostatic_sheet_e2e(box_case, tmp_path):
    """Current sheet in a box (see test_magnetostatic): L = mu0 * 0.25 * Lc."""
    mesh = box_tet(2, 2, 2, sheet_j=1)
    cfg = {
        "Problem": {"Type": "Magnetostatic", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [{"Attributes": [1], "Permeability": 1.0}]},
        "Boundaries": {
            "PEC": {"Attributes": [1, 2, 3, 4]},
            "SurfaceCurrent": [
                {"Index": 1, "Attributes": [7], "Direction": [1.0, 0.0, 0.0]}
            ],
        },
        "Solver": {
            "Order": 1,
            "Magnetostatic": {"Save": 0},
            "Linear": {"Tol": 1e-12, "MaxIts": 2000},
        },
    }
    r = palace_tpu.run(box_case(mesh, cfg), output_dir=str(tmp_path / "out"))
    mu0 = 1.25663706127e-6
    # U = 1/2 |B|^2 V = 1/8 (nondim); L = 2U = 1/4 (nondim) -> L = mu0/4 * Lc
    L_expect = mu0 * 0.25 * 1.0e-3
    assert np.isclose(r["M"][0, 0], L_expect, rtol=1e-8), (r["M"], L_expect)
    assert os.path.exists(tmp_path / "out" / "terminal-M.csv")


def test_eigenmode_box_cavity_e2e(box_case, tmp_path):
    """PEC box cavity via config: f_101 = c0/(2) * sqrt(2) / L (analytic)."""
    mesh = box_tet(3, 3, 3)
    cfg = {
        "Problem": {"Type": "Eigenmode", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-2},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 1.0}]},
        "Boundaries": {"PEC": {"Attributes": [1, 2, 3, 4, 5, 6]}},
        "Solver": {
            "Order": 2,
            "Eigenmode": {"N": 3, "Target": 15.0, "Tol": 1e-9},
            "Linear": {"Tol": 1e-9},
        },
    }
    r = palace_tpu.run(box_case(mesh, cfg), output_dir=str(tmp_path / "out"))
    c0 = 299792458.0
    f_expect = c0 / 2.0 * np.sqrt(2.0) / 1.0e-2 / 1e9  # GHz
    f = r["frequencies_ghz"]
    # triple-degenerate lowest mode within discretization error
    for i in range(3):
        assert abs(f[i].real - f_expect) / f_expect < 5e-3, (f, f_expect)
    assert os.path.exists(tmp_path / "out" / "eig.csv")
