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


def test_impedance_nearpec_box(tmp_path):
    """Strongly damped pencil (near-PEC impedance walls, 1/Rs >> w eps):
    the JD fast path's PEC-seeded subspace union + RQI polish
    (drivers/eigenmode.py strong-damping seed, linalg/eig.py polish) must
    reproduce the dense companion solve of the same assembled pencil
    (reference analogue: SLEPc PEP/TOAR on cylinder/cavity_impedance.json,
    drivers/eigensolver.cpp:98-155)."""
    import scipy.linalg as sla

    from palace_tpu.api import run
    from palace_tpu.config import IoData
    from palace_tpu.drivers.common import prepare_mesh
    from palace_tpu.models.spaceoperator import SpaceOperator

    L = 10.0  # mm cube
    mesh = box_tet(3, 3, 3, lx=L, ly=L, lz=L)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Eigenmode", "Verbose": 0, "Output": "postpro"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [{"Attributes": [1], "Permeability": 1.0,
                                   "Permittivity": 1.0}]},
        # Near-PEC resistive walls on all six faces (Rs ~ Cu at GHz).
        "Boundaries": {"Impedance": [{"Attributes": [1, 2, 3, 4, 5, 6],
                                      "Rs": 0.02}]},
        "Solver": {"Order": 1, "Device": "CPU",
                   "Eigenmode": {"N": 2, "Target": 19.0, "Tol": 1e-9},
                   "Linear": {"Tol": 1e-10}},
    }
    path = tmp_path / "case.json"
    json.dump(cfg, open(path, "w"))

    # Ground truth: dense companion eigensolve of the same assembled pencil.
    iodata = IoData(str(path))
    m = prepare_mesh(iodata)
    sop = SpaceOperator(iodata, m)
    K = sop.stiffness_csr().toarray()
    C = sop.damping_csr().toarray()
    M = sop.mass_csr().toarray()
    ess = np.where(sop.ess_mask)[0]
    keep = np.setdiff1d(np.arange(K.shape[0]), ess)
    K, C, M = (A[np.ix_(keep, keep)].astype(complex) for A in (K, C, M))
    n = K.shape[0]
    A = np.block([[np.zeros((n, n)), np.eye(n)], [-K, -C]])
    B = np.block([[np.eye(n), np.zeros((n, n))],
                  [np.zeros((n, n)), M]])
    lam = sla.eig(A, B, right=False)
    om = -1j * lam  # lam = i omega
    om = om[np.isfinite(om) & (om.real > 1e-6)]
    from palace_tpu.config import ValueType
    units = iodata.units
    # scale_factor(FREQUENCY) maps nondimensional omega/(2 pi) directly
    # to GHz (units.py:61).
    f_ghz = np.sort_complex(om / (2 * np.pi)
                            * units.scale_factor(ValueType.FREQUENCY))
    target = 19.0
    f_ghz = f_ghz[np.argsort(np.abs(f_ghz.real - target))]

    res = run(str(path), output_dir=str(tmp_path / "out"))
    got = sorted(res["frequencies_ghz"], key=lambda f: f.real)[:2]
    want = sorted(f_ghz[:2], key=lambda f: f.real)
    for g, w in zip(got, want):
        assert g.real == pytest.approx(w.real, rel=1e-6)
        assert g.imag == pytest.approx(w.imag, rel=1e-4)
