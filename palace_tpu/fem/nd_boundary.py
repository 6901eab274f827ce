"""H(curl) boundary-facet bilinear/linear forms.

The counterpart of the reference solver's boundary integrators on ND spaces
(reference: palace/fem/integrator.hpp:305-335 VectorFEBoundaryLFIntegrator,
and the boundary VectorFEMassIntegrator contributions assembled through
palace/models/spaceoperator.cpp:963-999): Robin-type port/impedance/absorbing
terms (c u_t, v_t)_dS and excitation RHS (f, v)_dS.

Instead of separate trace finite elements, the volume element's ND basis is
evaluated at surface quadrature points and projected tangentially
(P_t = I - n n^T); the tangential trace of the volume basis equals the face
trace element exactly, and normal components drop out under P_t.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from palace_tpu.fem import reference as ref
from palace_tpu.fem.evaluation import BoundaryTrace
from palace_tpu.ops.partial import BucketTables


@dataclass
class NDTraceBasis:
    """Physical-frame ND basis values at boundary-trace quadrature points."""

    tr: BoundaryTrace
    Vt: np.ndarray  # (n, nq, nd, sdim) tangentially projected basis values
    V: np.ndarray  # (n, nq, nd, sdim) unprojected values
    dofs: np.ndarray  # (n, nd) global dofs of the adjacent volume element
    Cn: Optional[np.ndarray] = None  # (n, nq, nd) n . curl(basis)


def nd_trace_basis(space, tr: BoundaryTrace, with_curl: bool = False
                   ) -> NDTraceBasis:
    mesh = space.mesh
    n, nq = tr.wdetJ.shape
    sdim = mesh.nodes.shape[1]
    nd = space.elem_dofs[0].shape[1]
    V = np.zeros((n, nq, nd, sdim))
    Cn = np.zeros((n, nq, nd)) if with_curl else None
    dofs = np.zeros((n, nd), np.int64)
    from palace_tpu.utils import smallmat

    for bi, b in enumerate(mesh.buckets):
        sel = np.where(tr.bucket == bi)[0]
        if len(sel) == 0:
            continue
        xis = tr.xi[sel].reshape(-1, tr.xi.shape[-1])
        Vr, Cr = space.basis_tables(b.geom, xis)  # (n_sel*nq, nd, rdim)
        Vr = Vr.reshape(len(sel), nq, -1, Vr.shape[-1])
        gb = ref.gmsh_geometry_basis(b.etype)
        Gg = gb.eval_grad(xis).reshape(len(sel), nq, -1, xis.shape[-1])
        X = mesh.nodes[b.conn[tr.elem[sel]]]
        J = np.einsum("ens,enqr->eqsr", X, Gg.transpose(0, 2, 1, 3))
        Jinv = smallmat.inv(J)
        # Covariant transform: u_phys = J^{-T} u_ref (orientation signs of
        # tensor-product elements folded directly into the tables).
        V[sel] = np.einsum("eqrs,eqnr->eqns", Jinv, Vr)
        sg = getattr(space, "elem_signs", None)
        sgsel = (sg[bi][tr.elem[sel]]
                 if sg is not None and sg[bi] is not None else None)
        if sgsel is not None:
            V[sel] *= sgsel[:, None, :, None]
        if with_curl and sdim == 3:
            Cr = Cr.reshape(len(sel), nq, -1, Cr.shape[-1])
            detJ = smallmat.det(J)
            cphys = np.einsum("eqsr,eqnr->eqns", J, Cr) / detJ[..., None, None]
            cn = np.einsum("eqns,eqs->eqn", cphys, tr.normal[sel])
            if sgsel is not None:
                cn = cn * sgsel[:, None, :]
            Cn[sel] = cn
        dofs[sel] = space.elem_dofs[bi][tr.elem[sel]]
    nrm = tr.normal  # (n, nq, sdim)
    Vt = V - np.einsum("fqs,fqn->fqns", nrm, np.einsum("fqns,fqs->fqn", V, nrm))
    return NDTraceBasis(tr, Vt, V, dofs, Cn)


def boundary_curl_bucket(tb: NDTraceBasis, coef: np.ndarray) -> BucketTables:
    """Facet matrices A_f[n,m] = sum_q w c_f (n.curl u)(n.curl v) — the
    surface-curl term of the 2nd-order absorbing BC (reference:
    palace/models/farfieldboundaryoperator.cpp AddExtraSystemBdrCoefficients)."""
    A = np.einsum("fq,f,fqn,fqm->fnm", tb.tr.wdetJ, coef, tb.Cn, tb.Cn,
                  optimize=True)
    return BucketTables(gidx=tb.dofs, A=A)


def boundary_mass_bucket(tb: NDTraceBasis, coef: np.ndarray) -> BucketTables:
    """Facet matrices A_f[n,m] = sum_q w c_f (u_t . v_t) as an extra operator
    bucket (gidx into the adjacent volume element's dofs).

    coef: per-facet scalar (n,) or tensor (n, sdim, sdim).
    """
    w = tb.tr.wdetJ
    if coef.ndim == 1:
        A = np.einsum("fq,f,fqns,fqms->fnm", w, coef, tb.Vt, tb.Vt, optimize=True)
    else:
        cu = np.einsum("fst,fqmt->fqms", coef, tb.Vt)
        A = np.einsum("fq,fqns,fqms->fnm", w, tb.Vt, cu, optimize=True)
    return BucketTables(gidx=tb.dofs, A=A)


def boundary_rhs(tb: NDTraceBasis, fvals: np.ndarray, num_dofs: int,
                 tangential: bool = False) -> np.ndarray:
    """Assemble rhs[n] = sum_f sum_q w f(x_q) . v_n over the trace facets.

    fvals: (n, nq, sdim) field values at the trace quadrature points.
    """
    V = tb.Vt if tangential else tb.V
    contrib = np.einsum("fq,fqs,fqns->fn", tb.tr.wdetJ, fvals, V, optimize=True)
    out = np.zeros(num_dofs, fvals.dtype if fvals.dtype.kind == "c" else float)
    np.add.at(out, tb.dofs.ravel(), contrib.ravel())
    return out


def boundary_dot(tb: NDTraceBasis, fvals: np.ndarray, u: np.ndarray) -> complex:
    """∫ f . u dS for the (possibly complex) ND coefficient vector u."""
    rhs = boundary_rhs(tb, fvals, u.shape[0])
    return np.dot(rhs, u)
