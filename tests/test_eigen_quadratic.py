"""Quadratic (damped) eigenvalue path: uniformly conductive PEC box cavity.

With uniform sigma and epsilon, each undamped cavity mode omega0 maps to
the damped eigenvalue lam solving  lam^2 eps + lam sigma + eps omega0^2 = 0
(K x = omega0^2 M x scaled), i.e. omega = -i lam with
lam = (-s/2) + i sqrt(omega0^2 - s^2/4), s = sigma/eps."""

import json
import math

import numpy as np
import pytest

from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh import gmsh_write


def test_conductive_cavity(tmp_path):
    from palace_tpu.api import run

    L = 10.0  # mm cube
    mesh = box_tet(4, 4, 4, lx=L, ly=L, lz=L)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    sigma_si = 0.05  # S/m
    cfg = {
        "Problem": {"Type": "Eigenmode", "Verbose": 0, "Output": "postpro"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [{"Attributes": [1], "Permeability": 1.0,
                                   "Permittivity": 2.0,
                                   "Conductivity": sigma_si}]},
        "Boundaries": {"PEC": {"Attributes": [1, 2, 3, 4, 5, 6]}},
        "Solver": {"Order": 2, "Device": "CPU",
                   "Eigenmode": {"N": 3, "Target": 14.0, "Tol": 1e-10},
                   "Linear": {"Tol": 1e-10}},
    }
    path = tmp_path / "case.json"
    json.dump(cfg, open(path, "w"))
    res = run(str(path), output_dir=str(tmp_path / "out"))
    f = res["frequencies_ghz"][0]

    # Undamped lowest mode: omega0 = pi sqrt(2) c/(L sqrt(eps_r)).
    c0 = 299792458.0
    eps_r = 2.0
    omega0 = math.pi * math.sqrt(2) * c0 / (L * 1e-3) / math.sqrt(eps_r)
    # Damping rate s = sigma/(eps0 eps_r).
    s = sigma_si / (8.8541878188e-12 * eps_r)
    lam_im = math.sqrt(omega0 ** 2 - 0.25 * s ** 2)
    f_expect = complex(lam_im, 0.5 * s) / (2 * math.pi) / 1e9
    # Discretization error ~1e-3 at this resolution; damping must match well.
    assert f.real == pytest.approx(f_expect.real, rel=2e-3)
    assert f.imag == pytest.approx(f_expect.imag, rel=2e-3)
