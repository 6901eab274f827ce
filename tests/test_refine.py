"""Uniform refinement: volume conservation, validity, and h-convergence of
cavity eigenvalues (reference: geodata.cpp RefineMesh uniform path)."""

import math

import numpy as np
import pytest

from palace_tpu.mesh.generate import box_hex, box_tet
from palace_tpu.mesh.mesh import canonicalize_simplices, load_mesh
from palace_tpu.mesh.refine import refine_uniform
from palace_tpu.mesh import geometry


@pytest.mark.parametrize("maker", [box_tet, box_hex])
def test_refine_volume(maker):
    mesh = maker(2, 2, 2)
    v0 = sum(geometry.compute(mesh.nodes, b, 3).wdetJ.sum()
             for b in mesh.buckets)
    fine = refine_uniform(mesh, 1)
    v1 = sum(geometry.compute(fine.nodes, b, 3).wdetJ.sum()
             for b in fine.buckets)
    assert fine.num_elements == 8 * mesh.num_elements
    assert v1 == pytest.approx(v0, rel=1e-12)
    # all positive jacobians for tets (hex children too)
    for b in fine.buckets:
        gf = geometry.compute(fine.nodes, b, 2)
        assert (np.abs(gf.detJ) > 0).all()


def test_refine_curved_preserves_geometry():
    """Refining the curved (tet10) cylinder preserves the boundary: total
    volume approaches the analytic cylinder volume from the same side."""
    mesh = load_mesh("/root/reference/test/data/regression/input/cylinder/"
                     "mesh/cylinder_tet.msh")
    v0 = sum(geometry.compute(mesh.nodes, b, 6).wdetJ.sum()
             for b in mesh.buckets)
    fine = refine_uniform(mesh, 1)
    v1 = sum(geometry.compute(fine.nodes, b, 6).wdetJ.sum()
             for b in fine.buckets)
    assert v1 == pytest.approx(v0, rel=1e-6)


def test_refine_eigenvalue_convergence():
    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.fem.nd_operators import nd_operator
    from palace_tpu.linalg.eig import shift_invert_eigs

    lam_exact = 2 * math.pi ** 2
    errs = []
    for lv in (1, 2):
        mesh = refine_uniform(box_tet(2, 2, 2), lv)
        canonicalize_simplices(mesh)
        space = NDSpace(mesh, 1)
        K = nd_operator(space, curl_coef={1: np.eye(3)}).assemble_csr()
        M = nd_operator(space, mass_coef={1: np.eye(3)}).assemble_csr()
        ess = space.boundary_dofs([1, 2, 3, 4, 5, 6])
        res = shift_invert_eigs(K, M, ess, lam_exact, 4, tol=1e-10)
        lam = np.sort(np.real(res.eigenvalues[np.real(res.eigenvalues) > 1]))
        errs.append(abs(lam[0] - lam_exact) / lam_exact)
    # O(h^2) for lowest-order ND.
    assert errs[1] < 0.4 * errs[0]
