"""Raviart-Thomas spaces (fem/rt.py): dimensions, conformity, projection."""

import numpy as np
import pytest

import palace_tpu.fem.reference as ref
from palace_tpu.fem.reference import GEOM_FACES, Geom
from palace_tpu.fem.rt import RTSpace, rt_basis_simplex
from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh.mesh import canonicalize_simplices, load_mesh


@pytest.mark.parametrize("geom,k", [(Geom.TRI, 0), (Geom.TRI, 2),
                                    (Geom.TET, 0), (Geom.TET, 1),
                                    (Geom.TET, 3)])
def test_rt_dims(geom, k):
    b = rt_basis_simplex(geom, k)
    expect = ((k + 1) * (k + 3) if geom is Geom.TRI
              else (k + 1) * (k + 2) * (k + 4) // 2)
    assert b.num_dofs == expect


@pytest.mark.parametrize("k", [0, 1, 2])
def test_rt_normal_conformity(tmp_path, k):
    """Physical normal flux is continuous across every interior face
    for random global dof vectors (signed-Piola, no sign tables)."""
    gmsh_write.write(box_tet(2, 2, 2), str(tmp_path / "box.msh"))
    mesh = load_mesh(str(tmp_path / "box.msh"))
    canonicalize_simplices(mesh)
    sp = RTSpace(mesh, k)
    u = np.random.default_rng(1).standard_normal(sp.num_dofs)

    b = mesh.buckets[0]
    corners = mesh.topo_ids(b.corners)
    from collections import defaultdict

    facemap = defaultdict(list)
    for e in range(b.num_elem):
        for fi, fv in enumerate(GEOM_FACES[Geom.TET]):
            facemap[tuple(corners[e, list(fv)])].append((e, fi))
    verts = ref.GEOM_VERTICES[Geom.TET][:, :3]
    basis = sp._bases[Geom.TET]
    gb = ref.gmsh_geometry_basis(b.etype)
    sts = np.array([[0.25, 0.25], [0.5, 0.2], [0.1, 0.3]])
    worst = 0.0
    for key, lst in facemap.items():
        if len(lst) != 2:
            continue
        flux = []
        ids = list(key)
        n = np.cross(mesh.nodes[ids[1]] - mesh.nodes[ids[0]],
                     mesh.nodes[ids[2]] - mesh.nodes[ids[0]])
        for (e, fi) in lst:
            fv = GEOM_FACES[Geom.TET][fi]
            vA, vB, vC = verts[fv[0]], verts[fv[1]], verts[fv[2]]
            X = vA + sts[:, :1] * (vB - vA) + sts[:, 1:2] * (vC - vA)
            V = basis.eval(X)
            vref = np.einsum("qnd,n->qd", V, u[sp.elem_dofs[0][e]])
            G = gb.eval_grad(X)
            J = np.einsum("ns,qnr->qsr", mesh.nodes[b.conn[e]], G)
            vphys = np.einsum("qsr,qr->qs", J, vref) / np.linalg.det(J)[
                :, None]
            flux.append(vphys @ n)
        worst = max(worst, np.abs(flux[0] - flux[1]).max()
                    / max(1e-30, np.abs(flux[0]).max()))
    assert worst < 1e-10, worst


def test_grad_flux_exact_recovery(tmp_path):
    """For a field whose flux eps E is itself in RT (a constant field),
    the recovered flux matches and the indicators vanish."""
    from palace_tpu.fem.estimators import grad_flux_indicators
    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.models.materials import MaterialOperator

    gmsh_write.write(box_tet(2, 2, 2), str(tmp_path / "box.msh"))
    mesh = load_mesh(str(tmp_path / "box.msh"))
    canonicalize_simplices(mesh)
    nd = NDSpace(mesh, 2)

    class _M:
        permittivity = {1: np.eye(3)}

        @staticmethod
        def attr_tensor(tensors, attrs):
            return np.broadcast_to(np.eye(3),
                                   (len(attrs), 3, 3)).copy()

    # Constant field E = (1, 0, 0): interpolate via an H1 linear potential.
    from palace_tpu.fem.h1 import H1Space
    from palace_tpu.fem.nd_operators import nd_h1_gradient

    h1 = H1Space(mesh, 2)
    G = nd_h1_gradient(nd, h1)
    V = h1.dof_coordinates()[:, 0]
    E = G @ V
    eta2 = grad_flux_indicators(nd, _M, E)
    assert np.abs(eta2).max() < 1e-18, eta2.max()


@pytest.mark.parametrize("k", [0, 1, 2])
def test_rt_hex_poly_projection_exact(k):
    """Tensor RT_k on a shuffled hex mesh (fem/rt_hex.py): the L2 projection
    of a polynomial flux in the space is pointwise exact — a loud failure
    for any face-orientation variant or sign error."""
    import scipy.sparse as sp_
    import scipy.sparse.linalg as spl

    from palace_tpu.mesh import geometry
    from palace_tpu.mesh.generate import box_hex
    from palace_tpu.mesh.mesh import Mesh

    mesh = box_hex(2, 2, 2)
    rng = np.random.default_rng(5)
    perm = rng.permutation(mesh.num_nodes)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    nodes = mesh.nodes[inv]
    for b in mesh.buckets + mesh.bdr_buckets:
        b.conn = perm[b.conn]
        if hasattr(b, "_corners"):
            del b._corners
    mesh = Mesh(nodes, mesh.buckets, mesh.bdr_buckets, {})

    rt = RTSpace(mesh, k)
    b = mesh.buckets[0]
    gf = geometry.compute(mesh.nodes, b, 2 * k + 4)
    Vr = rt.basis_tables(Geom.HEX, gf.qpts)
    rtphys = np.einsum("eqsr,qnr->eqns", gf.J, Vr) / gf.detJ[:, :, None, None]
    rtphys = rtphys * rt.elem_signs[0][:, None, :, None]

    # Physical quadrature points.
    gb = ref.gmsh_geometry_basis(b.etype)
    N = gb.eval(gf.qpts)
    pts = np.einsum("ens,qn->eqs", mesh.nodes[b.conn], N)
    # A field inside RT_k(hex): per-component tensor degrees (k+1, k, k) etc.
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    if k == 0:
        F = np.stack([1.0 + 2 * x, y - 3.0, 0.5 - z], axis=-1)
    else:
        F = np.stack([x * x + y, y * y - x * z, z + x * y], axis=-1)

    A = np.einsum("eqns,eqms,eq->enm", rtphys, rtphys, gf.wdetJ)
    c = np.einsum("eqns,eqs,eq->en", rtphys, F, gf.wdetJ)
    rows, cols, vals, rhs = [], [], [], np.zeros(rt.num_dofs)
    g = rt.elem_dofs[0]
    E, nd = g.shape
    rows = np.repeat(g, nd, axis=1).ravel()
    cols = np.tile(g, (1, nd)).ravel()
    M = sp_.coo_matrix((A.ravel(), (rows, cols)),
                       shape=(rt.num_dofs,) * 2).tocsc()
    np.add.at(rhs, g.ravel(), c.ravel())
    u = spl.spsolve(M, rhs)
    Fh = np.einsum("eqns,en->eqs", rtphys, u[g])
    err = np.abs(Fh - F).max() / np.abs(F).max()
    assert err < 1e-10, err


@pytest.mark.parametrize("k", [0, 1, 2])
def test_rt_hex_axis_rotation_invariance(k):
    """H(div) conformity when a hex's LOCAL axes are rotated so an x-face
    glues to a y-face (the O-grid core/ring situation, e.g. the reference
    cylinder_hex mesh): the projection of a polynomial in RT_k must stay
    pointwise exact.  Pins the eps(face-axis) handedness factor in
    hex_rt_keys_signs — node-shuffle tests never exercise it because every
    element keeps axis-aligned local frames."""
    import scipy.sparse as sp_
    import scipy.sparse.linalg as spl

    from palace_tpu.mesh import geometry
    from palace_tpu.mesh.generate import box_hex
    from palace_tpu.mesh.mesh import Mesh

    mesh = box_hex(2, 1, 1)
    b = mesh.buckets[0]
    # Rotate element 1's local frame 90 degrees about z: gmsh hex corners
    # bottom (0,1,2,3) CCW + top (4,5,6,7) -> [3,0,1,2,7,4,5,6] (det > 0).
    rot = [3, 0, 1, 2, 7, 4, 5, 6]
    conn = b.conn.copy()
    conn[1] = conn[1][rot]
    b.conn = conn
    mesh = Mesh(mesh.nodes, [b], mesh.bdr_buckets, {})

    rt = RTSpace(mesh, k)
    gf = geometry.compute(mesh.nodes, b, 2 * k + 4)
    Vr = rt.basis_tables(Geom.HEX, gf.qpts)
    rtphys = np.einsum("eqsr,qnr->eqns", gf.J, Vr) / gf.detJ[:, :, None, None]
    rtphys = rtphys * rt.elem_signs[0][:, None, :, None]
    gb = ref.gmsh_geometry_basis(b.etype)
    N = gb.eval(gf.qpts)
    pts = np.einsum("ens,qn->eqs", mesh.nodes[b.conn], N)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    F = np.stack([1.0 + 2 * x, y - 3.0, 0.5 - z], axis=-1)

    d = rt.elem_dofs[0]
    n = d.shape[1]
    A = np.einsum("eqns,eqms,eq->enm", rtphys, rtphys, gf.wdetJ)
    M = sp_.coo_matrix(
        (A.ravel(), (np.repeat(d, n, axis=1).ravel(),
                     np.tile(d, (1, n)).ravel())),
        shape=(rt.num_dofs,) * 2).tocsc()
    rhs = np.zeros(rt.num_dofs)
    c = np.einsum("eqns,eqs,eq->en", rtphys, F, gf.wdetJ)
    np.add.at(rhs, d.ravel(), c.ravel())
    yv = spl.spsolve(M, rhs)
    Fq = np.einsum("eqns,en->eqs", rtphys, yv[d])
    assert np.abs(Fq - F).max() < 1e-9
