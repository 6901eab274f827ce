"""H(div) bilinear forms and the discrete ND -> RT curl interpolator.

The remaining members of the reference's integrator zoo for RT spaces
(reference: palace/fem/integrator.hpp DivDivIntegrator,
VectorFEMassIntegrator on H(div); palace/models/spaceoperator.hpp:269-280
discrete Curl matrix mapping the primal ND space to the RT B-field space).

Physical transforms under the signed Piola map v = J v_ref / det J:
values pick up J/detJ, divergences pick up 1/detJ.  The curl of an ND
field transforms the same way (curl E = J curl_ref(E) / det J), so the
discrete-curl coefficient relation is geometry-independent and one
reference-space least-squares per element geometry suffices, exactly like
the discrete gradient (fem/nd_operators.py nd_h1_gradient).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from palace_tpu.fem import reference as ref
from palace_tpu.fem.operators import default_qorder
from palace_tpu.fem.rt import RTSpace
from palace_tpu.mesh import geometry
from palace_tpu.ops.partial import BucketTables, PAOperator


def rt_operator(
    space: RTSpace,
    *,
    divdiv_coef: Optional[Dict[int, float]] = None,
    mass_coef: Optional[Dict[int, np.ndarray]] = None,
    dtype=jnp.float64,
    qorder: Optional[int] = None,
) -> PAOperator:
    """(alpha div u, div v) + (beta u, v) on an RT space (reference:
    integrator.hpp DivDivIntegrator + VectorFEMassIntegrator; alpha scalar
    per attribute, beta a 3x3 (or 2x2) tensor per attribute)."""
    mesh = space.mesh
    sdim = mesh.nodes.shape[1]
    tables = []
    for bi, b in enumerate(mesh.buckets):
        q = qorder or default_qorder(space.order, b.geo_order, b.geom)
        gf = geometry.compute(mesh.nodes, b, q)
        A = np.zeros((b.num_elem, space.elem_dofs[bi].shape[1],
                      space.elem_dofs[bi].shape[1]))
        if divdiv_coef is not None:
            D = space.div_tables(b.geom, gf.qpts)  # (nq, nd)
            alpha = np.array([divdiv_coef[int(a)] for a in b.attr])
            # physical div = D / detJ; wdetJ already carries |detJ|.
            w = alpha[:, None] * gf.wdetJ / gf.detJ ** 2
            A += np.einsum("eq,qn,qm->enm", w, D, D)
        if mass_coef is not None:
            V = space.basis_tables(b.geom, gf.qpts)  # (nq, nd, sdim)
            vphys = np.einsum("eqsr,qnr->eqns", gf.J, V) / gf.detJ[
                :, :, None, None]
            beta = np.stack([np.asarray(mass_coef[int(a)])[:sdim, :sdim]
                             for a in b.attr])
            bv = np.einsum("est,eqnt->eqns", beta, vphys)
            A += np.einsum("eqns,eqms,eq->enm", vphys, bv, gf.wdetJ,
                           optimize=True)
        if space.elem_signs[bi] is not None:
            s = space.elem_signs[bi]
            A = A * s[:, :, None] * s[:, None, :]
        tables.append(BucketTables(gidx=space.elem_dofs[bi],
                                   A=jnp.asarray(A, dtype)))
    return PAOperator(space.num_dofs, tables)


def nd_rt_curl(nd_space, rt_space: RTSpace):
    """Discrete curl matrix C: ND_p -> RT_{p-1} with curl(E_h) = C E_h
    exactly (reference: palace/models/spaceoperator.hpp:269-280 discrete
    Curl; used to form B = -i/omega C E on the B-field RT space).
    Returns a scipy CSR of shape (rt dofs, nd dofs)."""
    import scipy.sparse as sp

    mesh = nd_space.mesh
    rows, cols, vals = [], [], []
    seen = np.zeros(rt_space.num_dofs, bool)
    for bi, b in enumerate(mesh.buckets):
        geom = b.geom
        p = nd_space.order
        pts, _ = ref.quadrature(geom, 2 * p + 2)
        _, C = nd_space.basis_tables(geom, pts)  # (nq, nd_nd, 3) ref curls
        Vr = rt_space.basis_tables(geom, pts)  # (nq, nd_rt, 3)
        nq, ndn, dim = C.shape
        ndr = Vr.shape[1]
        Cm = C.transpose(0, 2, 1).reshape(nq * dim, ndn)
        Rm = Vr.transpose(0, 2, 1).reshape(nq * dim, ndr)
        # curl(ND) and RT values transform identically (J ./ detJ), so the
        # reference-space relation is the physical one.
        loc, *_ = np.linalg.lstsq(Rm, Cm, rcond=None)  # (ndr, ndn)
        resid = np.linalg.norm(Rm @ loc - Cm)
        if resid > 1e-8:
            raise RuntimeError(
                f"discrete curl: curl(ND_{p}) not contained in RT_{p - 1} "
                f"span on {geom} (residual {resid:.2e})")
        loc[np.abs(loc) < 1e-12] = 0.0
        rdofs = rt_space.elem_dofs[bi]
        ndofs = nd_space.elem_dofs[bi]
        sg_r = rt_space.elem_signs[bi]
        sg_n = getattr(nd_space, "elem_signs",
                       [None] * len(mesh.buckets))[bi]
        for n in range(ndr):
            nz = np.nonzero(loc[n])[0]
            if len(nz) == 0:
                continue
            r = rdofs[:, n]
            uniq_r, first = np.unique(r, return_index=True)
            keep = first[~seen[uniq_r]]
            if len(keep) == 0:
                continue
            seen[r[keep]] = True
            sk_r = sg_r[keep, n] if sg_r is not None else 1.0
            for m in nz:
                sk_n = sg_n[keep, m] if sg_n is not None else 1.0
                rows.append(r[keep])
                cols.append(ndofs[keep, m])
                vals.append(np.broadcast_to(loc[n, m] * sk_r * sk_n,
                                            len(keep)).astype(float))
    return sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(rt_space.num_dofs, nd_space.num_dofs)).tocsr()
