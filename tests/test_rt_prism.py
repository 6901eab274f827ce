"""Wedge RT spaces (fem/rt_prism.py): dims, conformity, projection,
estimator availability on prism meshes."""

import numpy as np
import pytest

import palace_tpu.fem.reference as ref
from palace_tpu.fem.reference import GEOM_FACES, Geom
from palace_tpu.fem.rt import RTSpace
from palace_tpu.fem.rt_prism import prism_rt_eval, prism_rt_num_dofs
from palace_tpu.mesh import geometry
from palace_tpu.mesh.generate import box_prism
from palace_tpu.mesh.mesh import canonicalize_simplices


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_prism_rt_dims(k):
    nd = prism_rt_eval(k, np.array([[0.3, 0.3, 0.4]])).shape[1]
    assert nd == prism_rt_num_dofs(k)
    # RT_0 wedge = 5 face dofs.
    if k == 0:
        assert nd == 5


def _prism_mesh(n=2):
    mesh = box_prism(n, n, n)
    canonicalize_simplices(mesh)
    return mesh


@pytest.mark.parametrize("k", [0, 1, 2])
def test_prism_rt_normal_conformity(k):
    """Physical normal flux continuous across every interior face (both the
    vertical quad faces and the horizontal tri faces of stacked wedges)."""
    mesh = _prism_mesh(2)
    sp = RTSpace(mesh, k)
    u = np.random.default_rng(1).standard_normal(sp.num_dofs)

    b = mesh.buckets[0]
    corners = mesh.topo_ids(b.corners)
    from collections import defaultdict

    facemap = defaultdict(list)
    for e in range(b.num_elem):
        for fi, fv in enumerate(GEOM_FACES[Geom.PRISM]):
            facemap[tuple(sorted(corners[e, list(fv)]))].append((e, fi))
    verts = ref.GEOM_VERTICES[Geom.PRISM]
    gb = ref.gmsh_geometry_basis(b.etype)
    worst, nshared = 0.0, 0
    rng = np.random.default_rng(2)
    for key, lst in facemap.items():
        if len(lst) != 2:
            continue
        nshared += 1
        ids = list(key)
        # A normal from the global face plane (same for both sides).
        n = np.cross(mesh.nodes[ids[1]] - mesh.nodes[ids[0]],
                     mesh.nodes[ids[2]] - mesh.nodes[ids[0]])
        # Physical points from the FIRST element's face parametrization;
        # invert into each element's reference frame (box_prism wedges are
        # straight-extruded, so the element map is affine).
        e0, fi0 = lst[0]
        fv0 = GEOM_FACES[Geom.PRISM][fi0]
        vA = verts[fv0[0]]
        t1 = verts[fv0[1]] - vA
        t2 = verts[fv0[-1]] - vA
        st = rng.random((4, 2))
        if len(fv0) == 3:
            st = 0.4 * st + 0.05  # stay inside the triangle
        X0 = vA + st[:, :1] * t1 + st[:, 1:2] * t2
        N0 = gb.eval(X0)
        pts_phys = np.einsum("ns,qn->qs", mesh.nodes[b.conn[e0]], N0)
        flux = []
        for (e, _) in lst:
            # Affine inversion: x = x(0) + J xi.
            Xc = np.zeros((1, 3))
            J = np.einsum("ns,qnr->qsr", mesh.nodes[b.conn[e]],
                          gb.eval_grad(Xc))[0]
            x0 = np.einsum("ns,qn->qs", mesh.nodes[b.conn[e]],
                           gb.eval(Xc))[0]
            X = (np.linalg.solve(J, (pts_phys - x0).T)).T
            V = prism_rt_eval(k, X)
            vref = np.einsum("qnd,n->qd", V, u[sp.elem_dofs[0][e]])
            G = gb.eval_grad(X)
            Jq = np.einsum("ns,qnr->qsr", mesh.nodes[b.conn[e]], G)
            vphys = np.einsum("qsr,qr->qs", Jq, vref) / np.linalg.det(Jq)[
                :, None]
            flux.append(vphys @ n)
        worst = max(worst, np.abs(flux[0] - flux[1]).max()
                    / max(1e-30, np.abs(flux[0]).max() + 1e-30))
    assert nshared > 0
    assert worst < 1e-9, worst


@pytest.mark.parametrize("k", [0, 1, 2])
def test_prism_rt_poly_projection_exact(k):
    """The L2 projection of a polynomial flux inside the wedge space is
    pointwise exact — a loud failure for any face-key/variant mismatch."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spl

    mesh = _prism_mesh(2)
    rt = RTSpace(mesh, k)
    b = mesh.buckets[0]
    gf = geometry.compute(mesh.nodes, b, 2 * k + 4)
    Vr = rt.basis_tables(Geom.PRISM, gf.qpts)
    rtphys = np.einsum("eqsr,qnr->eqns", gf.J, Vr) / gf.detJ[:, :, None, None]

    gb = ref.gmsh_geometry_basis(b.etype)
    N = gb.eval(gf.qpts)
    pts = np.einsum("ens,qn->eqs", mesh.nodes[b.conn], N)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    if k == 0:
        # RT_0(tri) x P_0(z) in-plane: (a, b) + c (x, y); z in P_0 x P_1.
        F = np.stack([1.0 + 2 * x, 2 * y - 3.0, 0.5 - z], axis=-1)
    else:
        # (P_1)^2(x,y) x P_1(z) in-plane; P_1(tri) x P_2(z) vertical.
        F = np.stack([x + y * z, y - x * z, x + y * z * z], axis=-1)

    dofs = rt.elem_dofs[0]
    A = np.einsum("eqns,eqms,eq->enm", rtphys, rtphys, gf.wdetJ)
    rhs = np.zeros(rt.num_dofs)
    rows = np.repeat(dofs, dofs.shape[1], axis=1).ravel()
    cols = np.tile(dofs, (1, dofs.shape[1])).ravel()
    M = sps.coo_matrix((A.ravel(), (rows, cols)),
                       shape=(rt.num_dofs, rt.num_dofs)).tocsc()
    np.add.at(rhs, dofs.ravel(),
              np.einsum("eqns,eqs,eq->en", rtphys, F, gf.wdetJ).ravel())
    c = spl.spsolve(M, rhs)
    Fh = np.einsum("eqns,en->eqs", rtphys, c[dofs])
    err = np.abs(Fh - F).max() / np.abs(F).max()
    assert err < 1e-9, err


def test_grad_flux_indicators_on_prisms():
    """The estimator's RT flux recovery runs on prism meshes and vanishes
    for a constant field (flux inside the RT space)."""
    from palace_tpu.fem.estimators import grad_flux_indicators
    from palace_tpu.fem.h1 import H1Space
    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.fem.nd_operators import nd_h1_gradient

    mesh = _prism_mesh(2)
    nd = NDSpace(mesh, 2)

    class _M:
        permittivity = {1: np.eye(3)}

        @staticmethod
        def attr_tensor(tensors, attrs):
            return np.broadcast_to(np.eye(3), (len(attrs), 3, 3)).copy()

    h1 = H1Space(mesh, 2)
    G = nd_h1_gradient(nd, h1)
    V = h1.dof_coordinates()[:, 0]
    E = G @ V
    eta2 = grad_flux_indicators(nd, _M, E)
    assert np.abs(eta2).max() < 1e-18, eta2.max()
