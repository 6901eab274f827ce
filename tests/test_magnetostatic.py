"""Magnetostatic model test: uniform current sheet in a box.

Sheet at y=1/2 carrying unit surface current in +x; PEC on x and y faces,
natural on z faces.  Exact solution: piecewise-constant B = -/+ (1/2) z_hat
(representable exactly in the ND curl space at any order)."""

import jax.numpy as jnp
import numpy as np
import pytest

from palace_tpu.fem import evaluation
from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.linalg.iterative import cg
from palace_tpu.linalg.smoothers import jacobi
from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh.mesh import canonicalize_simplices
from palace_tpu.models.curlcurl import uniform_element_geometry
from palace_tpu.ops.partial import EliminatedOperator, make_ess_mask

ONE = {1: np.eye(3)}


@pytest.mark.parametrize("p", [1, 2])
def test_current_sheet_uniform_field(p):
    n = 2
    mesh = box_tet(n, 2, n, sheet_j=1)  # sheet at y = 0.5
    canonicalize_simplices(mesh)
    sp = NDSpace(mesh, p)
    K = nd_operator(sp, curl_coef=ONE)
    ess = sp.boundary_dofs([1, 2, 3, 4])  # PEC on x- and y-faces
    mask = make_ess_mask(sp.num_dofs, ess)
    eop = EliminatedOperator(K, mask)

    # RHS: unit surface current in +x through the sheet (attr 7).
    d = np.array([1.0, 0.0, 0.0])
    l, w = uniform_element_geometry(mesh, [7], d)
    assert np.isclose(l, 1.0) and np.isclose(w, 1.0)
    tr = evaluation.boundary_trace(mesh, [7], 2 * p + 2)
    rhs = np.zeros(sp.num_dofs)
    from palace_tpu.fem import reference as refmod
    from palace_tpu.utils import smallmat

    for bi, b in enumerate(mesh.buckets):
        selb = np.where(tr.bucket == bi)[0]
        if len(selb) == 0:
            continue
        nq = tr.wdetJ.shape[1]
        xis = tr.xi[selb].reshape(-1, tr.xi.shape[-1])
        V, _ = sp.basis_tables(b.geom, xis)
        V = V.reshape(len(selb), nq, -1, V.shape[-1])
        gb = refmod.gmsh_geometry_basis(b.etype)
        Gg = gb.eval_grad(xis).reshape(len(selb), nq, -1, xis.shape[-1])
        X = mesh.nodes[b.conn[tr.elem[selb]]]
        J = np.einsum("ens,enqr->eqsr", X, Gg.transpose(0, 2, 1, 3))
        Jinv = smallmat.inv(J)
        Jd = np.einsum("eqrs,s->eqr", Jinv, d / w)
        contrib = np.einsum("eqr,eqnr,eq->en", Jd, V, tr.wdetJ[selb])
        np.add.at(rhs, sp.elem_dofs[bi][tr.elem[selb]].ravel(), contrib.ravel())
    b = jnp.where(jnp.asarray(mask), 0.0, jnp.asarray(rhs))

    res = cg(eop, b, M=jacobi(K.diagonal(), jnp.asarray(mask)), tol=1e-11,
             max_its=2000)
    assert bool(res.converged), float(res.relres)
    A = np.asarray(res.x)

    # B = curl A at interior points: +/- 0.5 z_hat on either side of the sheet
    locator = evaluation.PointLocator(mesh)
    pts = np.array([[0.52, 0.22, 0.55], [0.47, 0.81, 0.52]])
    locs = locator.locate(pts)
    B = evaluation.eval_nd(sp, A, locs, which="curl")
    assert np.allclose(B[0], [0, 0, -0.5], atol=1e-8), B[0]
    assert np.allclose(B[1], [0, 0, 0.5], atol=1e-8), B[1]

    # Energy = 0.5 * int |B|^2 = 0.5 * 0.25 = 0.125; inductance L = 2U = 0.25
    U = A @ np.asarray(K(jnp.asarray(A)))
    assert np.isclose(U, 0.25, rtol=1e-9), U

    # Magnetic flux through the z=0 natural face restricted... flux through
    # half the y<0.5 region x-z plane: int B.n over sheet region equals area
    # times 0.5 on each side; use surface trace on attr 5 (z=0 face):
    tr5 = evaluation.boundary_trace(mesh, [5], 2 * p + 2,
                                    center=np.array([0.5, 0.5, 5.0]))
    Bz = evaluation.trace_nd(sp, A, tr5, which="curl")
    flux = float(np.einsum("eq,eqs,eqs->", tr5.wdetJ, Bz, tr5.normal))
    # normals oriented toward center (z>0... away from center at z=5 -> -z):
    # total flux through z=0 plane = int Bz * (-1) = -(0.5*0.5 + (-0.5)*0.5) = 0
    assert abs(flux) < 1e-8, flux
