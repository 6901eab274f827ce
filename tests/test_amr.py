"""Adaptive mesh refinement: Dörfler marking + longest-edge bisection +
solve-estimate-mark-refine loop (reference: palace/drivers/basesolver.cpp
SolveEstimateMarkRefine, palace/utils/dorfler.cpp).
"""

import json
import os

import numpy as np
import pytest

from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet


def test_dorfler_marking():
    from palace_tpu.drivers.amr import dorfler_mark

    eta2 = np.array([9.0, 1.0, 4.0, 0.5, 0.25])
    marked = dorfler_mark(eta2, 0.7)
    # 9+4 = 13 >= 0.7*14.75 = 10.3; 9 alone is not enough.
    assert set(marked) == {0, 2}
    assert len(dorfler_mark(eta2, 1.0)) == 5


def test_refine_marked_conforming():
    from palace_tpu.drivers.amr import refine_marked
    from palace_tpu.mesh import geometry

    mesh = box_tet(3, 3, 3)
    v0 = sum(float(geometry.compute(mesh.nodes, b, 2).wdetJ.sum())
             for b in mesh.buckets)
    m2 = refine_marked(mesh, np.array([0, 5, 17]))
    assert m2.num_elements > mesh.num_elements
    v1 = sum(float(geometry.compute(m2.nodes, b, 2).wdetJ.sum())
             for b in m2.buckets)
    assert v1 == pytest.approx(v0, rel=1e-12)
    _, _, counts = m2.face_table()
    assert counts.max() <= 2


def test_electrostatic_amr_loop(tmp_path):
    """Parallel-plate capacitor with AMR enabled: the adaptation loop must
    run, add elements, and keep the capacitance at the analytic value."""
    import palace_tpu

    mesh = box_tet(3, 3, 3, lx=2.0, ly=3.0, lz=0.5)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Electrostatic", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3,
                  "Refinement": {"Tol": 1e-12, "MaxIts": 2,
                                 "UpdateFraction": 0.5}},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 4.0}]},
        "Boundaries": {
            "Terminal": [{"Index": 1, "Attributes": [5]}],
            "Ground": {"Attributes": [6]},
        },
        "Solver": {"Order": 2, "Electrostatic": {"Save": 0},
                   "Linear": {"Tol": 1e-12, "MaxIts": 2000}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    r = palace_tpu.run(str(p), output_dir=str(tmp_path / "out"))
    eps0 = 8.8541878188e-12
    C_expect = 4.0 * eps0 * (2e-3 * 3e-3) / 0.5e-3
    assert np.isclose(r["C"][0, 0], C_expect, rtol=1e-9)
    # error-indicators.csv written with finite values
    txt = (tmp_path / "out" / "error-indicators.csv").read_text()
    assert "Norm" in txt


def test_eigen_amr_converges(tmp_path):
    """Box cavity eigenvalue under AMR: the curl-flux estimator drives
    refinement and the eigenfrequency error decreases."""
    import palace_tpu

    def run(max_its):
        mesh = box_tet(3, 3, 3)
        gmsh_write.write(mesh, str(tmp_path / "box.msh"))
        cfg = {
            "Problem": {"Type": "Eigenmode", "Verbose": 0, "Output": "out"},
            "Model": {"Mesh": "box.msh", "L0": 1.0e-2,
                      "Refinement": {"Tol": 1e-12, "MaxIts": max_its,
                                     "UpdateFraction": 0.95}},
            "Domains": {"Materials": [{"Attributes": [1],
                                       "Permittivity": 1.0}]},
            "Boundaries": {"PEC": {"Attributes": [1, 2, 3, 4, 5, 6]}},
            "Solver": {"Order": 1,
                       "Eigenmode": {"N": 1, "Target": 15.0, "Tol": 1e-9},
                       "Linear": {"Tol": 1e-9}},
        }
        p = tmp_path / f"c{max_its}.json"
        p.write_text(json.dumps(cfg))
        r = palace_tpu.run(str(p), output_dir=str(tmp_path / f"o{max_its}"))
        return r["frequencies_ghz"][0].real

    c0 = 299792458.0
    f_exact = c0 / 2.0 * np.sqrt(2.0) / 1.0e-2 / 1e9
    e0 = abs(run(0) - f_exact)
    e2 = abs(run(3) - f_exact)
    assert e2 < 0.7 * e0


def test_driven_amr_loop(tmp_path):
    """Driven sweep under AMR (reference: basesolver.cpp wraps the driven
    solver in SolveEstimateMarkRefine): the loop runs, refines, archives
    the superseded iteration, and still writes the full table set."""
    import palace_tpu

    eta0 = 376.730313412
    mesh = box_tet(3, 3, 3, lx=10.0, ly=10.0, lz=10.0)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3,
                  "Refinement": {"Tol": 1e-12, "MaxIts": 1,
                                 "UpdateFraction": 0.4}},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 2.0,
                                   "LossTan": 0.01}]},
        "Boundaries": {
            "PEC": {"Attributes": [5, 6]},
            "LumpedPort": [
                {"Index": 1, "Attributes": [1], "R": eta0, "Direction": "+Z",
                 "Excitation": True},
                {"Index": 2, "Attributes": [2], "R": eta0,
                 "Direction": "+Z"}]},
        "Solver": {"Order": 1,
                   "Driven": {"MinFreq": 8.0, "MaxFreq": 8.0, "FreqStep": 1.0},
                   "Linear": {"Tol": 1e-10, "MaxIts": 500}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    r = palace_tpu.run(str(p), output_dir=str(tmp_path / "out"))
    out = tmp_path / "out"
    assert (out / "port-S.csv").exists()
    assert (out / "error-indicators.csv").exists()
    # Superseded iteration archived (SaveAdaptIterations default true).
    assert (out / "iteration1" / "port-S.csv").exists()


def test_magnetostatic_amr_loop(tmp_path):
    """Magnetostatic AMR wiring: loop runs and the inductance matrix stays
    finite and symmetric."""
    import palace_tpu

    mesh = box_tet(2, 2, 2, sheet_j=1)  # current sheet at y = 0.5 (attr 7)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Magnetostatic", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3,
                  "Refinement": {"Tol": 1e-12, "MaxIts": 1,
                                 "UpdateFraction": 0.4}},
        "Domains": {"Materials": [{"Attributes": [1], "Permeability": 1.0}]},
        "Boundaries": {
            "SurfaceCurrent": [{"Index": 1, "Attributes": [7],
                                "Direction": "+X"}],
            "PEC": {"Attributes": [1, 2, 3, 4]},
        },
        "Solver": {"Order": 1, "Magnetostatic": {"Save": 0},
                   "Linear": {"Tol": 1e-10, "MaxIts": 1000}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    r = palace_tpu.run(str(p), output_dir=str(tmp_path / "out"))
    M = r["M"]
    assert np.all(np.isfinite(M))
    assert (tmp_path / "out" / "terminal-M.csv").exists()
