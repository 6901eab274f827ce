"""Nonconforming hex AMR: 1->8 refinement (mesh/refine_hex.py), hanging
H1 constraints (fem/hanging.py), and the electrostatic solve-estimate-
mark-refine loop on a hex mesh (reference:
palace/drivers/basesolver.cpp:247 GeneralRefinement on NC meshes,
palace/utils/geodata.cpp:237)."""

import json

import numpy as np
import pytest

from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_hex


def test_refine_hex_volume_and_records():
    from palace_tpu.mesh import geometry
    from palace_tpu.mesh.refine_hex import nc_quad_records, refine_hexes

    mesh = box_hex(2, 2, 2)
    v0 = sum(float(geometry.compute(mesh.nodes, b, 2).wdetJ.sum())
             for b in mesh.buckets)
    m2 = refine_hexes(mesh, np.array([0]))
    assert m2.num_elements == 7 + 8
    v1 = sum(float(geometry.compute(m2.nodes, b, 2).wdetJ.sum())
             for b in m2.buckets)
    assert v1 == pytest.approx(v0, rel=1e-12)
    recs = nc_quad_records(m2)
    # one refined corner hex of a 2x2x2 grid: 3 interior NC faces
    assert len(recs) == 3
    for r in recs:
        assert len(r["owners"]) == 4


def test_refine_hex_2to1_balance():
    from palace_tpu.mesh.refine_hex import refine_hexes

    mesh = box_hex(2, 2, 2)
    m1 = refine_hexes(mesh, np.array([0]))
    # refine a child adjacent to an unrefined neighbor: balance must also
    # refine the coarse master instead of creating a level-2 interface
    lv = np.concatenate(m1._amr_level)
    child = int(np.where(lv == 1)[0][0])
    m2 = refine_hexes(m1, np.array([child]))
    lv2 = np.concatenate(m2._amr_level)
    assert lv2.max() == 2
    from palace_tpu.mesh.refine_hex import nc_quad_records

    for r in nc_quad_records(m2):
        mbi, mei, _ = r["master"]
        mlv = m2._amr_level[mbi][mei]
        for (bi, ei, _) in r["owners"]:
            assert m2._amr_level[bi][ei] == mlv + 1


def test_hanging_interpolation_exact():
    """A linear (and order-p polynomial) field must be reproduced exactly
    through the hanging constraints: P x_t with x_t sampling the polynomial
    at true dofs equals the polynomial at every dof."""
    from palace_tpu.fem.h1 import H1Space
    from palace_tpu.fem.hanging import h1_hanging_matrix
    from palace_tpu.mesh.refine_hex import refine_hexes

    mesh = box_hex(2, 2, 2)
    m2 = refine_hexes(mesh, np.array([0, 3]))
    for p in (1, 2, 3):
        space = H1Space(m2, p)
        P, true_idx = h1_hanging_matrix(space, m2)
        assert P is not None
        X = space.dof_coordinates()

        def f(x):
            out = 1.0 + 2.0 * x[:, 0] - 0.7 * x[:, 1] + 0.3 * x[:, 2]
            for k in range(2, p + 1):
                out = out + 0.1 * x[:, 0] ** k - 0.2 * (x[:, 1] * x[:, 2])
            return out

        vals = f(X)
        recon = P @ vals[true_idx]
        assert np.abs(recon - vals).max() < 1e-10


def test_electrostatic_hex_amr_monotone(tmp_path):
    """Electrostatic AMR on a hex mesh with an edge singularity (terminal
    and ground on adjacent faces): the loop refines nonconformingly near
    the singular edge and the error indicator norm decreases
    monotonically."""
    import palace_tpu
    from palace_tpu.drivers import amr as amr_mod

    mesh = box_hex(3, 3, 3)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Electrostatic", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3,
                  "Refinement": {"Tol": 1e-12, "MaxIts": 2,
                                 "UpdateFraction": 0.5}},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 1.0}]},
        "Boundaries": {
            # adjacent faces -> singular shared edge drives refinement
            "Terminal": [{"Index": 1, "Attributes": [1]}],
            "Ground": {"Attributes": [5]},
        },
        "Solver": {"Order": 2, "Electrostatic": {"Save": 0},
                   "Linear": {"Tol": 1e-12, "MaxIts": 2000}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))

    norms = []
    orig = amr_mod.combine_indicators

    def spy(eta2_steps, energies):
        eta, nrm = orig(eta2_steps, energies)
        norms.append(nrm)
        return eta, nrm

    amr_mod.combine_indicators = spy
    try:
        r = palace_tpu.run(str(p), output_dir=str(tmp_path / "out"))
    finally:
        amr_mod.combine_indicators = orig
    assert np.isfinite(r["C"][0, 0]) and r["C"][0, 0] > 0
    assert len(norms) == 3, norms
    assert all(b < a for a, b in zip(norms, norms[1:])), norms
