"""Nedelec space tests: independence, conformity, discrete gradient,
and the definitive check — Maxwell eigenvalues of a PEC box cavity."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from palace_tpu.fem import reference as ref
from palace_tpu.fem.h1 import H1Space
from palace_tpu.fem.nd import NDSpace, eval_nd_basis, nd_basis_tet, nd_num_dofs_tet
from palace_tpu.fem.nd_operators import nd_h1_gradient, nd_operator
from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh.mesh import canonicalize_simplices

ONE = {1: np.eye(3)}


@pytest.mark.parametrize("p", [1, 2])
def test_local_dimension_and_independence(p):
    fns = nd_basis_tet(p)
    assert len(fns) == nd_num_dofs_tet(p)
    pts, w = ref.quadrature(ref.Geom.TET, 2 * p + 2)
    V, C = eval_nd_basis(fns, pts)
    # local mass matrix must be nonsingular
    M = np.einsum("qnd,qmd,q->nm", V, V, w)
    assert np.linalg.cond(M) < 1e8, np.linalg.cond(M)


@pytest.mark.parametrize("p", [1, 2])
def test_constant_fields_and_gradients_in_space(p):
    """Constants and grad(P_p) must lie in ND_p; verified by L2 projection
    residual on a canonicalized mesh (tests conformity across elements)."""
    mesh = box_tet(2, 2, 2)
    canonicalize_simplices(mesh)
    sp_nd = NDSpace(mesh, p)
    M = nd_operator(sp_nd, mass_coef=ONE)
    K = nd_operator(sp_nd, curl_coef=ONE)
    Mcsr = M.assemble_csr()
    # RHS for constant field c: (c, v) via quadrature per element
    from palace_tpu.mesh import geometry

    for c in [np.array([1.0, 0, 0]), np.array([0.3, -1.2, 2.0])]:
        rhs = np.zeros(sp_nd.num_dofs)
        for bi, b in enumerate(mesh.buckets):
            gf = geometry.compute(mesh.nodes, b, 2 * p + 2)
            V, _ = sp_nd.basis_tables(b.geom, gf.qpts)
            # (c, J^-T v_ref) w|detJ| => contract c with Jinv planar
            # cJ[r][e,q] = sum_s Jinv[r,s] c_s
            cJ = np.einsum("rseq,s->req", gf.Jinvp, c)
            contrib = np.einsum("req,qnr,eq->en", cJ, V, gf.wdetJ)
            np.add.at(rhs, sp_nd.elem_dofs[bi].ravel(), contrib.ravel())
        x = spla.spsolve(Mcsr, rhs)
        # residual of projection: x^T M x - 2 x^T rhs + |c|^2 vol = 0
        r2 = x @ (Mcsr @ x) - 2 * x @ rhs + np.dot(c, c) * 1.0
        assert abs(r2) < 1e-9, r2
        # constant fields are curl-free
        assert abs(x @ np.asarray(K(jnp.asarray(x)))) < 1e-9


@pytest.mark.parametrize("p", [1, 2])
def test_discrete_gradient_nullspace(p):
    mesh = box_tet(2, 2, 2)
    canonicalize_simplices(mesh)
    sp_nd = NDSpace(mesh, p)
    sp_h1 = H1Space(mesh, p)
    G = nd_h1_gradient(sp_nd, sp_h1)
    K = nd_operator(sp_nd, curl_coef=ONE)
    rng = np.random.default_rng(3)
    v = rng.normal(size=sp_h1.num_dofs)
    gv = G @ v
    kg = np.asarray(K(jnp.asarray(gv)))
    assert np.abs(kg).max() < 1e-9 * max(np.abs(gv).max(), 1)
    # Check it really is the gradient: energy identity
    # (grad v)^T M_nd (grad v) == v^T K_h1 v with same coefficient
    from palace_tpu.fem.operators import h1_operator

    M = nd_operator(sp_nd, mass_coef=ONE)
    Kh1 = h1_operator(sp_h1, diffusion_coef=ONE)
    e1 = gv @ np.asarray(M(jnp.asarray(gv)))
    e2 = v @ np.asarray(Kh1(jnp.asarray(v)))
    assert np.isclose(e1, e2, rtol=1e-10)


@pytest.mark.parametrize("p,n,tol", [(1, 3, 0.08), (2, 2, 0.02)])
def test_box_cavity_maxwell_eigenvalues(p, n, tol):
    """PEC box cavity [0,1]^3: curl curl E = omega^2 E with analytic
    eigenvalues pi^2 (k1^2+k2^2+k3^2); lowest nonzero = 2 pi^2 (x3)."""
    mesh = box_tet(n, n, n)
    canonicalize_simplices(mesh)
    sp_nd = NDSpace(mesh, p)
    K = nd_operator(sp_nd, curl_coef=ONE).assemble_csr()
    M = nd_operator(sp_nd, mass_coef=ONE).assemble_csr()
    ess = sp_nd.boundary_dofs([1, 2, 3, 4, 5, 6])
    keep = np.setdiff1d(np.arange(sp_nd.num_dofs), ess)
    K = K[keep][:, keep]
    M = M[keep][:, keep]
    # shift-invert around the first cavity resonance
    vals = spla.eigsh(
        K.tocsc(), k=12, M=M.tocsc(), sigma=10.0, which="LM",
        return_eigenvectors=False, maxiter=10000, tol=1e-9,
    )
    vals = np.sort(vals)
    vals = vals[vals > 1.0]  # drop gradient-nullspace zeros
    expect = 2 * np.pi**2
    # three-fold degenerate lowest mode
    assert len(vals) >= 3, vals
    for i in range(3):
        assert abs(vals[i] - expect) / expect < tol, (p, n, vals[:4])
