"""Floquet (Bloch) quasi-periodic boundary conditions.

Analytic check: a unit box periodic in x with PEC on the other faces and a
Floquet wave vector k = (kx, 0, 0).  The x-invariant parallel-plate modes
E = z_hat sin(pi y), E = y_hat sin(pi z) of the plain-periodic case become
Bloch waves e^{i beta x} with beta = kx + 2 pi l, so the lowest pair sits at
omega^2 = pi^2 + kx^2 (c = 1 nondimensional), a direct probe of both the
(kx)^T mu^-1 kx mass term and the antisymmetric cross term (reference:
palace/models/spaceoperator.cpp:1038-1056, materialoperator.cpp:371-446).
"""

import json
import math

import numpy as np
import pytest

from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet

C0 = 299792458.0


def run_case(tmp_path, kx, n_modes=2, target=17.0, nref=3):
    import palace_tpu

    mesh = box_tet(nref, nref, nref)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Eigenmode", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-2},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 1.0}],
                    "Postprocessing": {"Energy": [
                        {"Index": 1, "Attributes": [1]}]}},
        "Boundaries": {
            "Periodic": {
                "FloquetWaveVector": [kx, 0.0, 0.0],
                "BoundaryPairs": [
                    {"DonorAttributes": [1], "ReceiverAttributes": [2],
                     "Translation": [1.0, 0.0, 0.0]}]},
            "PEC": {"Attributes": [3, 4, 5, 6]},
        },
        "Solver": {"Order": 2,
                   "Eigenmode": {"N": n_modes, "Target": target,
                                 "Tol": 1e-9},
                   "Linear": {"Tol": 1e-9}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    return palace_tpu.run(str(p), output_dir=str(tmp_path / "out"))


def test_floquet_box_modes(tmp_path):
    kx = 2.0  # 1/cm, inside the BZ (pi/L = pi per cm)
    r = run_case(tmp_path, kx)
    f_exact = C0 / (2 * math.pi * 1.0e-2) / 1e9 * math.sqrt(
        math.pi ** 2 + kx ** 2)
    f = np.asarray(r["frequencies_ghz"])
    # Lossless Floquet problem: real frequencies (Hermitian up to the
    # complex-symmetric formulation), degenerate polarization pair.
    assert np.abs(np.imag(f[:2])).max() < 1e-4 * f_exact, f
    fr = np.real(f[:2])
    assert abs(fr[0] - f_exact) / f_exact < 6e-3, (fr, f_exact)
    assert abs(fr[1] - f_exact) / f_exact < 6e-3, (fr, f_exact)


def test_floquet_backward_branch(tmp_path):
    """The backward Bloch branch beta = k - 2 pi must be in the spectrum:
    omega^2 = pi^2 + (2 pi - k)^2.  The complex-SYMMETRIC cross-term variant
    (B + B^T) collapses this branch entirely (cylinder_floquet initially
    missed the reference's 3.19/3.32/3.81 GHz modes) — this pins the
    Hermitian -i(B - B^T) form."""
    kx = 2.0
    r = run_case(tmp_path, kx, n_modes=1, target=24.5)
    f_exact = C0 / (2 * math.pi * 1.0e-2) / 1e9 * math.sqrt(
        math.pi ** 2 + (2 * math.pi - kx) ** 2)
    f = float(np.real(np.asarray(r["frequencies_ghz"])[0]))
    assert abs(f - f_exact) / f_exact < 2e-2, (f, f_exact)


def test_floquet_bz_wrap_invariance(tmp_path):
    """k and k + 2*pi/L give the same spectrum (BZ wrapping,
    materialoperator.cpp:406-420)."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    r1 = run_case(tmp_path / "a", 1.5, n_modes=1, target=16.0)
    r2 = run_case(tmp_path / "b", 1.5 + 2 * math.pi / 1.0, n_modes=1,
                  target=16.0)
    f1 = float(np.real(np.asarray(r1["frequencies_ghz"])[0]))
    f2 = float(np.real(np.asarray(r2["frequencies_ghz"])[0]))
    assert abs(f1 - f2) / f1 < 1e-9, (f1, f2)
