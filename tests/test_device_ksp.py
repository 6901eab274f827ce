"""Device FGMRES + p-multigrid driven solve path (linalg/device_ksp.py)
against the host sparse-direct path (reference: palace/linalg/ksp.cpp:30-229
GMRES + GMG as the production solver; iterative and direct paths must agree
to solver tolerance)."""

import json
import math
import os

import numpy as np
import pytest

from palace_tpu.config import IoData, ValueType
from palace_tpu.drivers.common import prepare_mesh
from palace_tpu.drivers.driven import (
    driven_samples_ghz, sweep_uniform_device, sweep_uniform_direct,
    use_device_ksp,
)
from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet
from palace_tpu.models.spaceoperator import SpaceOperator

ETA0 = 376.730313412


def _tem_case(tmp_path, order=2, nfreq=3, lossy=False):
    mesh = box_tet(4, 4, 4, lx=10.0, ly=10.0, lz=10.0)
    gmsh_write.write(mesh, os.path.join(str(tmp_path), "box.msh"))
    mat = {"Attributes": [1], "Permeability": 1.0, "Permittivity": 2.0}
    if lossy:
        mat["LossTan"] = 0.01
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": "postpro"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [mat]},
        "Boundaries": {
            "PEC": {"Attributes": [5, 6]},
            "LumpedPort": [
                {"Index": 1, "Attributes": [1], "R": ETA0, "Direction": "+Z",
                 "Excitation": True},
                {"Index": 2, "Attributes": [2], "R": ETA0, "Direction": "+Z"},
            ],
        },
        "Solver": {
            "Order": order, "Device": "CPU",
            "Driven": {"MinFreq": 8.0, "MaxFreq": 8.0 + nfreq - 1,
                       "FreqStep": 1.0},
            "Linear": {"Type": "GMG", "Tol": 1e-10, "MaxIts": 200},
        },
    }
    path = os.path.join(str(tmp_path), "case.json")
    json.dump(cfg, open(path, "w"))
    return IoData(path)


@pytest.mark.parametrize("lossy", [False, True])
def test_device_sweep_matches_direct(tmp_path, lossy):
    iodata = _tem_case(tmp_path, order=2, nfreq=3, lossy=lossy)
    mesh = prepare_mesh(iodata)
    sop = SpaceOperator(iodata, mesh)
    freqs = driven_samples_ghz(iodata)
    fscale = iodata.units.scale_factor(ValueType.FREQUENCY)
    omegas = [2 * math.pi * f / fscale for f in freqs]
    ex = sop.excitations()

    sols_direct = sweep_uniform_direct(iodata, sop, omegas, ex)
    sols_device = sweep_uniform_device(iodata, sop, omegas, ex)
    assert set(sols_direct) == set(sols_device)
    for key in sols_direct:
        a, b = sols_direct[key], sols_device[key]
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert rel < 1e-8, (key, rel)
    info = sweep_uniform_device._last_info
    assert info["total_its"] > 0 and info["solves"] == len(sols_device)


def test_config_routing(tmp_path):
    iodata = _tem_case(tmp_path)
    assert use_device_ksp(iodata, 100)  # explicit GMG -> device at any size
    iodata.solver.linear.type = "SuperLU"
    assert not use_device_ksp(iodata, 10 ** 7)
    iodata.solver.linear.type = "Default"
    assert not use_device_ksp(iodata, 100)
    assert use_device_ksp(iodata, 10 ** 6)
