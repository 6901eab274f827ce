"""ND (first-kind Nedelec) wedge/prism elements: conformity across in-plane
permutations and layer flips, patch test, and cavity eigenvalues vs analytic
(reference FE collection: palace/fem/libceed/ceed.cpp:119-144; regression
case: cylinder/cavity_impedance on cylinder_prism.msh)."""

import math

import numpy as np
import pytest

from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.linalg.eig import shift_invert_eigs
from palace_tpu.mesh.generate import box_prism
from palace_tpu.mesh.mesh import Mesh, canonicalize_simplices


def _relabel(mesh, perm):
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    nodes = mesh.nodes[inv]
    for b in mesh.buckets + mesh.bdr_buckets:
        b.conn = perm[b.conn]
        if hasattr(b, "_corners"):
            del b._corners
    return Mesh(nodes, mesh.buckets, mesh.bdr_buckets, {})


def _shuffled_box(n, seed, flip_layers=False):
    """Layer-consistent node relabeling: a random permutation of the
    footprint ids, same in every layer (exercises all in-plane orientation
    classes); optional reversed layer numbering (exercises vertical-edge
    flip signs)."""
    mesh = box_prism(n, n, n)
    nf = (n + 1) * (n + 1)
    nlay = n + 1
    rng = np.random.default_rng(seed)
    foot = rng.permutation(nf)
    # node id (i, j, k) = (i*(n+1) + j)*(n+1) + k: k is the z index.
    perm = np.empty(mesh.num_nodes, np.int64)
    for v in range(nf):
        for k in range(nlay):
            kk = (nlay - 1 - k) if flip_layers else k
            perm[v * nlay + k] = kk * nf + foot[v]
    return _relabel(mesh, perm)


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("flip", [False, True])
def test_constant_field_exact(order, flip):
    """Patch test on a shuffled prism mesh: E = const reproduced pointwise
    (loud failure for any orientation/sign error)."""
    import scipy.sparse.linalg as spl

    from palace_tpu.fem.evaluation import PointLocator, eval_nd
    from palace_tpu.fem.operators import default_qorder
    from palace_tpu.mesh import geometry

    mesh = _shuffled_box(2, 4 if flip else 0, flip_layers=flip)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, order)
    M = nd_operator(space, mass_coef={1: np.eye(3)}).assemble_csr()
    c = np.array([1.0, -2.0, 0.5])
    b = mesh.buckets[0]
    gf = geometry.compute(mesh.nodes, b, default_qorder(order, 1, b.geom))
    V, _ = space.basis_tables(b.geom, gf.qpts)
    Ji = np.ascontiguousarray(np.moveaxis(gf.Jinvp, (2, 3), (0, 1)))
    vph = np.einsum("eqrs,qnr->eqns", Ji, V)
    contrib = np.einsum("eq,eqns,s->en", gf.wdetJ, vph, c)
    if space.elem_signs[0] is not None:
        contrib = contrib * space.elem_signs[0]
    rhs = np.zeros(space.num_dofs)
    np.add.at(rhs, space.elem_dofs[0].ravel(), contrib.ravel())
    x = spl.spsolve(M.tocsc(), rhs)
    locs = PointLocator(mesh).locate(np.array([[0.31, 0.57, 0.73],
                                               [0.11, 0.92, 0.48]]))
    vals = eval_nd(space, x, locs, which="value")
    np.testing.assert_allclose(vals, np.tile(c, (2, 1)), rtol=1e-9,
                               atol=1e-9)


def test_gradient_fields_in_kernel():
    """grad(H1_p) is in the ND_p wedge space: the curl-curl operator
    annihilates the discrete gradient (de Rham compatibility)."""
    from palace_tpu.fem.h1 import H1Space
    from palace_tpu.fem.nd_operators import nd_h1_gradient

    mesh = _shuffled_box(2, 1)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, 2)
    h1 = H1Space(mesh, 2)
    G = nd_h1_gradient(space, h1)
    K = nd_operator(space, curl_coef={1: np.eye(3)}).assemble_csr()
    rng = np.random.default_rng(0)
    v = rng.standard_normal(h1.num_dofs)
    r = K @ (G @ v)
    assert np.abs(r).max() < 1e-10 * np.abs(K @ np.ones(space.num_dofs)).max()


@pytest.mark.parametrize("flip", [False, True])
def test_prism_cavity_eigenvalues(flip):
    """PEC unit-cube cavity on a shuffled prism mesh: lowest Maxwell
    eigenvalues match pi^2 (m^2 + n^2 + l^2)."""
    mesh = _shuffled_box(3, 2, flip_layers=flip)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, 2)
    K = nd_operator(space, curl_coef={1: np.eye(3)}).assemble_csr()
    M = nd_operator(space, mass_coef={1: np.eye(3)}).assemble_csr()
    ess = space.boundary_dofs([1, 2, 3, 4, 5, 6])
    res = shift_invert_eigs(K, M, ess, 2 * math.pi ** 2, 10, tol=1e-10)
    lam = np.sort(np.real(res.eigenvalues[np.real(res.eigenvalues) > 1.0]))
    # Observed convergence ~h^4 (errors 4.3e-2 / 9.9e-3 / 3.3e-3 at
    # n = 2 / 3 / 4); n = 3 discretization error tops out at ~1e-2.
    np.testing.assert_allclose(lam[:3], 2 * math.pi ** 2 * np.ones(3),
                               rtol=1.2e-2)
    np.testing.assert_allclose(lam[3:5], 3 * math.pi ** 2 * np.ones(2),
                               rtol=1.2e-2)
