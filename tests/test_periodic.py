"""Periodic boundary conditions via node identification (reference:
palace/utils/geodata.cpp MakePeriodic; validated end-to-end against the
cylinder/waveguide regression case at ~1e-8).

Box cavity periodic in x with PEC elsewhere: the lowest modes are the
x-invariant parallel-plate pair E = z sin(pi y) / E = y sin(pi z) at
f = c / (2 L) — excluded by PEC x-walls, admitted by periodicity (the
discriminating mode for this BC).
"""

import json

import numpy as np
import pytest

from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet


def test_periodic_box_modes(tmp_path):
    import palace_tpu

    mesh = box_tet(3, 3, 3)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Eigenmode", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-2},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 1.0}]},
        "Boundaries": {
            "Periodic": {"BoundaryPairs": [
                {"DonorAttributes": [1], "ReceiverAttributes": [2],
                 "Translation": [1.0, 0.0, 0.0]}]},
            "PEC": {"Attributes": [3, 4, 5, 6]},
        },
        "Solver": {"Order": 2,
                   "Eigenmode": {"N": 2, "Target": 15.0, "Tol": 1e-9},
                   "Linear": {"Tol": 1e-9}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    r = palace_tpu.run(str(p), output_dir=str(tmp_path / "out"))
    c0 = 299792458.0
    f_exact = c0 / 2.0 / 1.0e-2 / 1e9
    f = np.real(r["frequencies_ghz"])
    # Degenerate pair, both at c/2L.
    assert abs(f[0] - f_exact) / f_exact < 5e-3, (f, f_exact)
    assert abs(f[1] - f_exact) / f_exact < 5e-3, (f, f_exact)


def test_periodic_dof_identification():
    """Paired-surface dofs coincide: the periodic ND space is smaller than
    the unconstrained one by exactly the receiver-surface dof count."""
    from palace_tpu.config.schema import PeriodicConfig
    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.mesh.mesh import canonicalize_simplices
    from palace_tpu.mesh.periodic import apply_periodic

    mesh = box_tet(3, 3, 3)
    canonicalize_simplices(mesh)
    s0 = NDSpace(mesh, 2)
    n_recv = len(s0.boundary_dofs([2]))

    mesh2 = box_tet(3, 3, 3)
    n = apply_periodic(mesh2, [PeriodicConfig(
        donor_attributes=[1], receiver_attributes=[2],
        translation=[1.0, 0.0, 0.0])], 1.0)
    assert n == 16  # 4x4 surface vertices
    canonicalize_simplices(mesh2)
    s1 = NDSpace(mesh2, 2)
    assert s0.num_dofs - s1.num_dofs == n_recv
