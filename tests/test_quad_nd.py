"""2D quadrilateral Nedelec space and quad-facet wave ports.

Validated against: constant-field conformity, analytic PEC-rectangle
eigenvalues, and the analytic TE10 mode of a rectangular waveguide port on
a hex mesh (the path that matches cylinder/driven_wave to 5e-7 end-to-end).
"""

import json
import math
import os

import numpy as np
import pytest

from palace_tpu.fem.reference import Geom
from palace_tpu.mesh.mesh import ElemBucket, Mesh


def quad_rect_mesh(nx=4, ny=3, lx=2.0, ly=1.0, distort=0.05):
    xs, ys = np.meshgrid(np.linspace(0, lx, nx + 1),
                         np.linspace(0, ly, ny + 1), indexing="ij")
    nodes = np.stack([xs.ravel(), ys.ravel()], 1)
    rng = np.random.default_rng(5)
    inner = ((nodes[:, 0] > 1e-9) & (nodes[:, 0] < lx - 1e-9)
             & (nodes[:, 1] > 1e-9) & (nodes[:, 1] < ly - 1e-9))
    nodes[inner] += distort * rng.standard_normal((inner.sum(), 2))

    def nid(i, j):
        return i * (ny + 1) + j

    conn = np.array([[nid(i, j), nid(i + 1, j), nid(i + 1, j + 1),
                      nid(i, j + 1)] for i in range(nx) for j in range(ny)],
                    np.int32)
    edges = []
    for i in range(nx):
        edges += [[nid(i, 0), nid(i + 1, 0)], [nid(i, ny), nid(i + 1, ny)]]
    for j in range(ny):
        edges += [[nid(0, j), nid(0, j + 1)], [nid(nx, j), nid(nx, j + 1)]]
    return Mesh(nodes,
                [ElemBucket(3, Geom.QUAD, 1, conn,
                            np.ones(len(conn), np.int32))],
                [ElemBucket(1, Geom.LINE, 1, np.array(edges, np.int32),
                            np.ones(len(edges), np.int32))], {})


def test_quad_nd_conformity_and_eigs():
    import scipy.sparse.linalg as spla

    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.fem.nd_operators import nd_operator
    from palace_tpu.mesh import geometry

    mesh = quad_rect_mesh()
    for p in (1, 2):
        sp_ = NDSpace(mesh, p)
        K = nd_operator(sp_, curl_coef={1: np.eye(3)}).assemble_csr()
        M = nd_operator(sp_, mass_coef={1: np.eye(3)}).assemble_csr()
        # Constant-field projection has exactly zero weak curl.
        b = mesh.buckets[0]
        gf = geometry.compute(mesh.nodes, b, 2 * p + 2)
        V, _ = sp_.basis_tables(Geom.QUAD, gf.qpts)
        vph = np.einsum("eqrs,qnr->eqns", gf.Jinv, V)
        c = np.einsum("eqns,s,eq->en", vph, np.array([1.0, 0.5]), gf.wdetJ)
        if sp_.elem_signs[0] is not None:
            c *= sp_.elem_signs[0]
        b_ = np.zeros(sp_.num_dofs)
        np.add.at(b_, sp_.elem_dofs[0].ravel(), c.ravel())
        u = spla.spsolve(M.tocsc(), b_)
        assert np.abs(K @ u).max() < 1e-12
        # PEC rectangle 2x1 lowest resonance: pi^2 (1/4 + 0) NO -> lowest
        # nonzero is pi^2/4 * ... modes pi^2(m^2/4 + n^2), lowest 2.467.
        bd = sp_.boundary_dofs([1])
        keep = np.setdiff1d(np.arange(sp_.num_dofs), bd)
        Kr = K[keep][:, keep].tocsc()
        Mr = M[keep][:, keep].tocsc()
        w = spla.eigsh(Kr, k=4, M=Mr, sigma=2.0, which="LM")[0]
        w = np.sort(w[w > 1e-6])
        assert w[0] == pytest.approx(np.pi**2 / 4, rel=0.1 if p == 1
                                     else 2e-3)


def test_quad_waveport_te10(tmp_path):
    """Rectangular waveguide port on a hex mesh: quad-facet wave port mode
    matches the analytic TE10 (kn to discretization error, En = 0)."""
    from palace_tpu.config import IoData, ValueType
    from palace_tpu.drivers.common import prepare_mesh
    from palace_tpu.mesh import gmsh_write
    from palace_tpu.mesh.generate import box_hex
    from palace_tpu.models.spaceoperator import SpaceOperator

    mesh = box_hex(4, 3, 3, lx=20.0, ly=10.0, lz=6.0)
    gmsh_write.write(mesh, str(tmp_path / "w.msh"))
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": "o"},
        "Model": {"Mesh": "w.msh", "L0": 1e-3},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 1.0}]},
        "Boundaries": {
            "WavePort": [{"Index": 1, "Attributes": [1],
                          "Excitation": True}],
            "PEC": {"Attributes": [2, 3, 4, 5, 6]}},
        "Solver": {"Order": 2,
                   "Driven": {"Samples": [{"Type": "Point",
                                           "Freq": [25.0]}]},
                   "Linear": {"Tol": 1e-10}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    io = IoData(str(p))
    m = prepare_mesh(io)
    sop = SpaceOperator(io, m)
    wp = sop.wave_ports[1]
    # Quad-facet PEC rim must produce essential dofs (regression for the
    # triangle-edge-pairs bug in _facet_edge_set).
    assert len(wp.ess_nd) > 0 and len(wp.ess_h1) > 0
    om = 2 * math.pi * io.units.nondimensionalize(ValueType.FREQUENCY, 25.0)
    sol = wp.solve_mode(om)
    a = 0.010 / io.units.Lc_m
    kn_an = math.sqrt(om * om - (math.pi / a) ** 2)
    assert sol.kn.real == pytest.approx(kn_an, rel=2e-3)
    assert np.abs(sol.en).max() < 1e-10  # pure TE after gradient deflation
