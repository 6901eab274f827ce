"""Bilinear form assembly into matrix-free bucket tables.

The counterpart of the reference solver's BilinearForm + integrator zoo
(reference: palace/fem/bilinearform.hpp:25-95, palace/fem/integrator.hpp:69-279)
for the H1 (scalar) integrators; H(curl) integrators live in fem/nd_operators.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from palace_tpu.fem.h1 import H1Space
from palace_tpu.mesh import geometry
from palace_tpu.ops.partial import BucketTables, PAOperator


class QuadraturePolicy:
    """Global default-integration-order policy, mirroring the reference's
    static fem::DefaultIntegrationOrder (palace/fem/integrator.hpp:20-34)
    initialized from config["Solver"] (iodata.cpp:599-602):

        q = 2 p + (jac ? order(|J|) : 0) + extra

    The reference's config DEFAULT is q_order_jac = FALSE
    (utils/configfile.hpp:1077) — every committed regression reference was
    generated with plain q = 2 p, which under-integrates curved
    (geo_order > 1) elements; matching those CSVs therefore requires the
    same rule.  Overridable per-run from config
    Solver/QuadratureOrder{Jacobian,Extra} (api.run) or the
    PALACE_TPU_QORDER_JAC / PALACE_TPU_QORDER_EXTRA env vars."""

    jac: bool = False
    extra: int = 0

    # With jac = False, simplices STILL get the exact-|J| degree dim (g-1)
    # added: on simplices detJ is a polynomial of exactly that degree, so
    # 2p + dim (g-1) integrates the mass integrand exactly, and measured
    # parity on the curved-tet corpus cases is 6e-8..4e-6 with it vs
    # 1.0e-4..1.5e-4 with plain 2p (MFEM's minimal simplex rules at
    # order 2p integrate these near-polynomial integrands to ~1e-6 —
    # closer to exact than to our order-2p Grundmann-Moller points, so
    # exactness reproduces the reference better than matching the nominal
    # order).  Tensor-product elements use plain 2p: Gauss tensor rules of
    # a given order are unique, so our points then coincide with MFEM's
    # and the curved-hex cases match the committed CSVs to 1e-7 (they were
    # 0.8-3.2% off with the |J|-augmented order).  Strict reference 2p
    # behavior on simplices: PALACE_TPU_SIMPLEX_EXACT_JAC=0.
    simplex_exact_jac: bool = True

    @classmethod
    def set(cls, jac: bool, extra: int) -> None:
        cls.jac = bool(jac)
        cls.extra = int(extra)


def _truthy(s: str) -> bool:
    return s.strip().lower() not in ("0", "false", "no", "off", "")


def _env_policy():
    """Apply the PALACE_TPU_QORDER_* env overrides.  Precedence: env beats
    config — api.run calls this again AFTER QuadraturePolicy.set(config)."""
    import os

    j = os.environ.get("PALACE_TPU_QORDER_JAC")
    e = os.environ.get("PALACE_TPU_QORDER_EXTRA")
    s = os.environ.get("PALACE_TPU_SIMPLEX_EXACT_JAC")
    if j is not None:
        QuadraturePolicy.jac = _truthy(j)
    if e is not None:
        QuadraturePolicy.extra = int(e)
    if s is not None:
        QuadraturePolicy.simplex_exact_jac = _truthy(s)


_env_policy()


def default_qorder(p: int, geo_order: int, geom, extra: int = 0) -> int:
    """Quadrature order exact for 2 p (+ order(|J|) when the policy asks,
    + extra) (reference: palace/fem/integrator.hpp:20-34, integrator.cpp
    DefaultIntegrationOrder: order(|J|) follows MFEM's
    IsoparametricTransformation::OrderW(): dim (g - 1) on simplices,
    dim g - 1 on tensor-product elements)."""
    from palace_tpu.fem.reference import GEOM_DIM, Geom

    ow = 0
    g = geo_order
    dim = GEOM_DIM[geom]
    simplex = geom in (Geom.LINE, Geom.TRI, Geom.TET)
    if QuadraturePolicy.jac:
        ow = dim * max(g - 1, 0) if simplex else dim * g - 1
    elif simplex and QuadraturePolicy.simplex_exact_jac:
        ow = dim * max(g - 1, 0)
    return 2 * p + ow + extra + QuadraturePolicy.extra


def h1_operator(
    space: H1Space,
    *,
    diffusion_coef: Optional[Dict[int, np.ndarray]] = None,
    mass_coef: Optional[Dict[int, np.ndarray]] = None,
    dtype=jnp.float64,
    qorder: Optional[int] = None,
    mode: str = "element",
) -> PAOperator:
    """(alpha grad u, grad v) + (beta u, v) on an H1 space.

    Coefficients are per-attribute 3x3 tensors (mass uses the scalar trace/3
    unless a scalar dict is given).
    """
    mesh = space.mesh
    buckets: List[BucketTables] = []
    for b, ed in zip(mesh.buckets, space.elem_dofs):
        p = space.order
        q = qorder or default_qorder(p, b.geo_order, b.geom)
        gf = geometry.compute(mesh.nodes, b, q)
        basis = space.basis(b.geom)
        qpts = gf.qpts
        B = basis.eval(qpts)
        G = basis.eval_grad(qpts)
        qd_diffp = qd_mass = None
        if diffusion_coef is not None:
            sdim = mesh.nodes.shape[1]
            C = _per_elem_tensor(diffusion_coef, b.attr, sdim)
            # Planar W[r, u][e, q] = wdetJ * (Jinv C Jinv^T)[r, u]: every term
            # is a fused contiguous multiply-add over (E, nq).
            Ji = gf.Jinvp  # (r, s, E, nq)
            r = Ji.shape[0]
            Wp = np.zeros((r, r) + gf.wdetJ.shape)
            for rr in range(r):
                for uu in range(r):
                    for s_ in range(sdim):
                        for t_ in range(sdim):
                            cst = C[:, s_, t_]
                            if not np.any(cst):
                                continue
                            Wp[rr, uu] += Ji[rr, s_] * cst[:, None] * Ji[uu, t_]
            Wp *= gf.wdetJ[None, None]
            qd_diffp = Wp
        if mass_coef is not None:
            c = _per_elem_scalar(mass_coef, b.attr)
            qd_mass = gf.wdetJ * c[:, None]
        buckets.append(
            BucketTables(gidx=ed, B=B, G=G, qd_diffp=qd_diffp, qd_mass=qd_mass)
        )
    op = PAOperator(space.num_dofs, buckets, dtype, mode=mode)
    op.space = space  # for locality partitioning (parallel/dofsharded.py)
    return op


def _small_abt(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """W[..., r, u] = sum_s A[..., r, s] B[..., u, s] via broadcast multiplies."""
    r, s = A.shape[-2], A.shape[-1]
    u = B.shape[-2]
    W = np.zeros(A.shape[:-2] + (r, u))
    for ss in range(s):
        W += A[..., :, ss, None] * B[..., None, :, ss]
    return W


def _per_elem_tensor(table: Dict[int, np.ndarray], attrs: np.ndarray, dim: int
                     ) -> np.ndarray:
    uniq = np.unique(attrs)
    amax = int(uniq.max())
    lut = np.zeros((amax + 1, dim, dim))
    for a in uniq:
        t = np.asarray(table[int(a)], float)
        if t.ndim == 0:
            t = np.eye(dim) * t
        lut[int(a)] = t[:dim, :dim]
    return lut[attrs]


def _per_elem_scalar(table: Dict[int, np.ndarray], attrs: np.ndarray) -> np.ndarray:
    uniq = np.unique(attrs)
    amax = int(uniq.max())
    lut = np.zeros(amax + 1)
    for a in uniq:
        t = np.asarray(table[int(a)], float)
        lut[int(a)] = float(t) if t.ndim == 0 else float(np.trace(t) / t.shape[0])
    return lut[attrs]
