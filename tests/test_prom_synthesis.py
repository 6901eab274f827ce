"""PROM circuit-synthesis export: lumped-port modes seeded into the
reduced basis and the normalized circuit matrices written to disk
(reference: romoperator.cpp:624-675 AddLumpedPortModesForSynthesis,
970-1094 CalculateNormalizedPROMMatrices / PrintPROMMatrices)."""

import json
import os

import numpy as np
import pytest

from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet

ETA0 = 376.730313412


def test_circuit_synthesis_export(tmp_path):
    from palace_tpu.api import run

    mesh = box_tet(5, 5, 5, lx=10.0, ly=10.0, lz=10.0)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": "postpro"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [
            {"Attributes": [1], "Permeability": 1.0, "Permittivity": 1.0}]},
        "Boundaries": {
            "PEC": {"Attributes": [5, 6]},
            "LumpedPort": [
                {"Index": 1, "Attributes": [1], "R": ETA0,
                 "Direction": "+Z", "Excitation": True},
                {"Index": 2, "Attributes": [2], "R": ETA0, "Direction": "+Z"},
            ],
        },
        "Solver": {"Order": 1, "Device": "CPU",
                   "Driven": {"Samples": [{"Type": "Linear", "MinFreq": 5.0,
                                           "MaxFreq": 20.0, "NSample": 6}],
                              "AdaptiveTol": 1e-6,
                              "AdaptiveCircuitSynthesis": True},
                   "Linear": {"Tol": 1e-10, "MaxIts": 300}},
    }
    path = tmp_path / "case.json"
    path.write_text(json.dumps(cfg))
    out = str(tmp_path / "out")
    run(str(path), output_dir=out)

    for name in ("rom-Linv-re.csv", "rom-C-re.csv", "rom-Rinv-re.csv",
                 "rom-orthogonalization-matrix-R.csv"):
        assert os.path.exists(os.path.join(out, name)), name

    # Port modes lead the basis, in port order.
    with open(os.path.join(out, "rom-Linv-re.csv")) as fh:
        header = [h.strip() for h in fh.readline().split(",")]
    assert header[0] == "port_1" and header[1] == "port_2"

    # The port-port block of R^-1 recovers the lumped resistor: the
    # unity-Z_R-normalized mode e_t satisfies e_t^T C e_t = 1/R with C the
    # port damping (Robin) term, so Rinv[j][j] = 1/R_j in 1/Ohm.
    rinv = np.loadtxt(os.path.join(out, "rom-Rinv-re.csv"),
                      skiprows=1, delimiter=",")
    assert rinv.shape[0] == rinv.shape[1] == len(header)
    assert rinv[0, 0] == pytest.approx(1.0 / ETA0, rel=1e-6)
    assert rinv[1, 1] == pytest.approx(1.0 / ETA0, rel=1e-6)
    assert abs(rinv[0, 1]) < 1e-10 / ETA0  # distinct ports: zero overlap

    # C/Linv are symmetric in the port block.
    cmat = np.loadtxt(os.path.join(out, "rom-C-re.csv"),
                      skiprows=1, delimiter=",")
    assert cmat[0, 1] == pytest.approx(cmat[1, 0], abs=1e-18)
