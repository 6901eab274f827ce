"""Finite-conductivity (skin-depth) surface impedance boundary (reference:
palace/models/surfaceconductivityoperator.cpp:148-175).

Analytic check: a TEM parallel-plate line normally incident on a conductor
wall of surface impedance Z_s = (1+i)/(sigma delta) reflects with
Gamma = (Z_s - eta0)/(Z_s + eta0).  sigma is chosen so |Z_s| ~ eta0 and the
reflection magnitude is far from both 0 and 1.
"""

import cmath
import json
import math
import os

import pytest

from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet

ETA0 = 376.730313412
MU0 = 1.25663706127e-6


def test_conductive_wall_reflection(tmp_path):
    from palace_tpu.api import run

    f_ghz = 15.0
    omega = 2 * math.pi * f_ghz * 1e9
    # sqrt(omega mu0 / (2 sigma)) = eta0  =>  |Z_s| = sqrt(2) eta0
    sigma = omega * MU0 / (2.0 * ETA0**2)
    L = 10.0
    mesh = box_tet(6, 6, 6, lx=L, ly=L, lz=L)
    gmsh_write.write(mesh, os.path.join(str(tmp_path), "box.msh"))
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": "postpro"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [
            {"Attributes": [1], "Permeability": 1.0, "Permittivity": 1.0}]},
        "Boundaries": {
            "PEC": {"Attributes": [5, 6]},
            "LumpedPort": [{"Index": 1, "Attributes": [1], "R": ETA0,
                            "Direction": "+Z", "Excitation": True}],
            "Conductivity": [{"Attributes": [2], "Conductivity": sigma}],
        },
        "Solver": {"Order": 2, "Device": "CPU",
                   "Driven": {"Samples": [{"Type": "Point",
                                           "Freq": [f_ghz]}]},
                   "Linear": {"Tol": 1e-10, "MaxIts": 300}},
    }
    path = os.path.join(str(tmp_path), "case.json")
    json.dump(cfg, open(path, "w"))
    res = run(path, output_dir=str(tmp_path / "out"))
    S11 = res["measurements"][(1, 0)].ports[1].S

    delta = math.sqrt(2.0 / (MU0 * sigma * omega))
    Zs = complex(1.0, 1.0) / (sigma * delta)
    gamma = (Zs - ETA0) / (Zs + ETA0)
    # Propagation phase there and back: 2 k L.
    kL2 = 2 * omega / 299792458.0 * (L * 1e-3)
    expect = gamma * cmath.exp(-1j * kL2)
    assert abs(S11) == pytest.approx(abs(gamma), abs=0.02)
    assert abs(S11 - expect) < 0.05


def test_thickness_factors():
    """Finite-thickness correction limits: h >> delta recovers the
    semi-infinite Z_s; h << delta tends to the DC sheet resistance
    Re Z -> 1/(sigma h) with vanishing reactance ratio."""
    import numpy as np

    sigma, mu, omega = 3.0, 1.0, 5.0
    delta = math.sqrt(2.0 / (mu * sigma * omega))

    def Z(h):
        zre = zim = 1.0 / (sigma * delta)
        if h > 0:
            nu = h / delta
            den = math.cosh(nu) - math.cos(nu)
            zre *= (math.sinh(nu) + math.sin(nu)) / den
            zim *= (math.sinh(nu) - math.sin(nu)) / den
        return complex(zre, zim)

    thick = Z(50 * delta)
    assert thick.real == pytest.approx(1 / (sigma * delta), rel=1e-10)
    assert thick.imag == pytest.approx(1 / (sigma * delta), rel=1e-10)
    thin = Z(0.01 * delta)
    assert thin.real == pytest.approx(2.0 / (sigma * 0.01 * delta), rel=1e-3)
    assert thin.imag / thin.real < 0.01
