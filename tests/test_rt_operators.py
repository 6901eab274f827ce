"""H(div) DivDiv/mass forms and the discrete ND->RT curl
(fem/rt_operators.py) on tet, hex, and prism meshes."""

import numpy as np
import pytest

import palace_tpu.fem.reference as ref
from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.rt import RTSpace
from palace_tpu.fem.rt_operators import nd_rt_curl, rt_operator
from palace_tpu.mesh import geometry
from palace_tpu.mesh.generate import box_hex, box_prism, box_tet
from palace_tpu.mesh.mesh import canonicalize_simplices


def _mesh(kind):
    m = {"tet": box_tet, "hex": box_hex, "prism": box_prism}[kind](2, 2, 2)
    canonicalize_simplices(m)
    return m


@pytest.mark.parametrize("kind", ["tet", "hex", "prism"])
@pytest.mark.parametrize("p", [1, 2])
def test_discrete_curl_exact(kind, p):
    """curl(E_h) = C E_h pointwise for random ND fields."""
    mesh = _mesh(kind)
    nd = NDSpace(mesh, p)
    rt = RTSpace(mesh, p - 1)
    C = nd_rt_curl(nd, rt)
    rng = np.random.default_rng(3)
    E = rng.standard_normal(nd.num_dofs)
    c = C @ E

    b = mesh.buckets[0]
    gf = geometry.compute(mesh.nodes, b, 2 * p + 2)
    _, Cref = nd.basis_tables(b.geom, gf.qpts)
    Vr = rt.basis_tables(b.geom, gf.qpts)
    ue = E[nd.elem_dofs[0]]
    if nd.elem_signs[0] is not None:
        ue = ue * nd.elem_signs[0]
    curl_ref = np.einsum("qnc,en->eqc", Cref, ue)
    curl_phys = np.einsum("sreq,eqr->eqs", gf.Jp, curl_ref) / gf.detJ[
        ..., None]
    ce = c[rt.elem_dofs[0]]
    if rt.elem_signs[0] is not None:
        ce = ce * rt.elem_signs[0]
    rt_phys = np.einsum("eqsr,qnr,en->eqs", gf.J, Vr, ce) / gf.detJ[
        ..., None]
    err = np.abs(curl_phys - rt_phys).max() / max(np.abs(curl_phys).max(),
                                                  1e-30)
    assert err < 1e-9, err

    # div(curl) = 0: the divergence tables applied to C E vanish.
    D = rt.div_tables(b.geom, gf.qpts)
    div = np.einsum("qn,en->eq", D, ce) / gf.detJ
    assert np.abs(div).max() < 1e-8 * max(np.abs(c).max(), 1.0)


@pytest.mark.parametrize("kind", ["tet", "hex", "prism"])
def test_divdiv_quadratic_form(kind):
    """u^T A_divdiv u = int alpha (div F)^2 for a projected polynomial F
    with constant divergence (F = (1+2x, 2y-3, 0.5-z), div = 3)."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spl

    mesh = _mesh(kind)
    k = 1
    rt = RTSpace(mesh, k)
    b = mesh.buckets[0]
    gf = geometry.compute(mesh.nodes, b, 2 * k + 4)
    Vr = rt.basis_tables(b.geom, gf.qpts)
    rtphys = np.einsum("eqsr,qnr->eqns", gf.J, Vr) / gf.detJ[:, :, None,
                                                             None]
    if rt.elem_signs[0] is not None:
        rtphys = rtphys * rt.elem_signs[0][:, None, :, None]
    gb = ref.gmsh_geometry_basis(b.etype)
    N = gb.eval(gf.qpts)
    pts = np.einsum("ens,qn->eqs", mesh.nodes[b.conn], N)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    F = np.stack([1.0 + 2 * x, 2 * y - 3.0, 0.5 - z], axis=-1)

    dofs = rt.elem_dofs[0]
    A = np.einsum("eqns,eqms,eq->enm", rtphys, rtphys, gf.wdetJ)
    rows = np.repeat(dofs, dofs.shape[1], axis=1).ravel()
    cols = np.tile(dofs, (1, dofs.shape[1])).ravel()
    M = sps.coo_matrix((A.ravel(), (rows, cols)),
                       shape=(rt.num_dofs, rt.num_dofs)).tocsc()
    rhs = np.zeros(rt.num_dofs)
    np.add.at(rhs, dofs.ravel(),
              np.einsum("eqns,eqs,eq->en", rtphys, F, gf.wdetJ).ravel())
    c = spl.spsolve(M, rhs)

    alpha = 2.5
    Add = rt_operator(rt, divdiv_coef={1: alpha})
    q = float(np.asarray(c @ np.asarray(Add(c))))
    vol = float(gf.wdetJ.sum())
    assert q == pytest.approx(alpha * 9.0 * vol, rel=1e-9)

    # Mass form agrees with the dense element assembly above.
    Am = rt_operator(rt, mass_coef={1: np.eye(3)})
    qm = float(np.asarray(c @ np.asarray(Am(c))))
    qm_dense = float(c @ (M @ c))
    assert qm == pytest.approx(qm_dense, rel=1e-10)
