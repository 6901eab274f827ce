"""ND (Nedelec Q^-_p) hex elements: conformity across arbitrary orientations
and cavity eigenvalues vs analytic (the hex analog of the tet validation;
reference: cylinder_hex eigenmode regression case)."""

import math

import numpy as np
import pytest

from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.linalg.eig import shift_invert_eigs
from palace_tpu.mesh.generate import box_hex
from palace_tpu.mesh.mesh import Mesh


def _shuffled_box(n, seed):
    """box_hex with randomly relabeled global node ids — exercises every
    edge-direction and face-orientation combination."""
    mesh = box_hex(n, n, n)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(mesh.num_nodes)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    nodes = mesh.nodes[inv]
    buckets = mesh.buckets
    for b in buckets + mesh.bdr_buckets:
        b.conn = perm[b.conn]
        if hasattr(b, "_corners"):
            del b._corners
    return Mesh(nodes, buckets, mesh.bdr_buckets, {})


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("seed", [0, 3])
def test_constant_field_exact(order, seed):
    """Patch test: E = const is in the space; the (gauged) L2 projection
    reproduces it pointwise. Fails loudly if orientation signs are wrong."""
    from palace_tpu.fem.evaluation import PointLocator, eval_nd
    import scipy.sparse.linalg as spl

    mesh = _shuffled_box(2, seed)
    space = NDSpace(mesh, order)
    M = nd_operator(space, mass_coef={1: np.eye(3)}).assemble_csr()
    # rhs_n = int c . v_n
    c = np.array([1.0, -2.0, 0.5])
    from palace_tpu.mesh import geometry
    from palace_tpu.fem.operators import default_qorder

    b = mesh.buckets[0]
    gf = geometry.compute(mesh.nodes, b, default_qorder(order, 1, b.geom))
    V, _ = space.basis_tables(b.geom, gf.qpts)
    from palace_tpu.utils import smallmat

    J = np.moveaxis(gf.Jinvp, (0, 1), (3, 2))  # (E, nq ... planar -> (r,s))
    Ji = np.ascontiguousarray(np.moveaxis(gf.Jinvp, (2, 3), (0, 1)))  # (E,nq,r,s)
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
    np.testing.assert_allclose(vals, np.tile(c, (2, 1)), rtol=1e-9, atol=1e-9)


def test_hex_cavity_eigenvalues():
    """PEC unit-cube cavity on a shuffled hex mesh: lowest Maxwell
    eigenvalues match pi^2 (m^2+n^2+l^2) analytic values."""
    mesh = _shuffled_box(4, 1)
    space = NDSpace(mesh, 2)
    K = nd_operator(space, curl_coef={1: np.eye(3)}).assemble_csr()
    M = nd_operator(space, mass_coef={1: np.eye(3)}).assemble_csr()
    ess = space.boundary_dofs([1, 2, 3, 4, 5, 6])
    res = shift_invert_eigs(K, M, ess, 2 * math.pi ** 2, 10, tol=1e-10)
    lam = np.sort(np.real(res.eigenvalues[np.real(res.eigenvalues) > 1.0]))
    # 2 pi^2 is 3-fold degenerate (110, 101, 011); then 3 pi^2 (111) x 2.
    np.testing.assert_allclose(lam[:3], 2 * math.pi ** 2 * np.ones(3),
                               rtol=2e-3)
    np.testing.assert_allclose(lam[3:5], 3 * math.pi ** 2 * np.ones(2),
                               rtol=2e-3)
