"""Geometry factors at quadrature points.

The analog of the reference solver's quadrature-data assembly (reference:
palace/fem/libceed/integrator.cpp geometry factor assembly,
palace/fem/mesh.hpp:20-44): for each element bucket, evaluate the (possibly
curved, isoparametric) coordinate map's Jacobian at quadrature points.

All outputs are plain numpy arrays at setup time; the solver layers move
them to device as needed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from palace_tpu.fem import reference as ref
from palace_tpu.mesh.mesh import ElemBucket


@dataclass
class GeomFactors:
    """Per-bucket geometry data at quadrature points.

    For volume buckets (dim == space dim):
      J:    (E, nq, sdim, rdim) Jacobian dx/dxi
      detJ: (E, nq) determinant (> 0 for well-oriented elements)
      w:    (nq,) reference quadrature weights
      wdetJ: (E, nq) quadrature weight times detJ
      Jinv: (E, nq, rdim, sdim) inverse Jacobian (dxi/dx)

    For boundary buckets (dim == space dim - 1), detJ is the surface
    measure sqrt(det(J^T J)) and `normal` holds the unit normal.
    """

    qpts: np.ndarray
    w: np.ndarray
    J: np.ndarray
    detJ: np.ndarray
    wdetJ: np.ndarray
    Jinv: np.ndarray | None = None
    normal: np.ndarray | None = None
    xq: np.ndarray | None = None  # (E, nq, sdim) physical quadrature points


def compute(
    nodes: np.ndarray,
    bucket: ElemBucket,
    qorder: int,
    *,
    compute_xq: bool = False,
    sdim: int | None = None,
) -> GeomFactors:
    geom = bucket.geom
    rdim = ref.GEOM_DIM[geom]
    sdim = sdim if sdim is not None else nodes.shape[1]
    qpts, w = ref.quadrature(geom, qorder)
    basis = ref.gmsh_geometry_basis(bucket.etype)
    G = basis.eval_grad(qpts)  # (nq, nn, rdim)
    X = nodes[bucket.conn]  # (E, nn, sdim)
    # J[e, q, s, r] = sum_n X[e, n, s] G[q, n, r]
    J = np.einsum("ens,qnr->eqsr", X, G, optimize=True)

    xq = None
    if compute_xq:
        B = basis.eval(qpts)  # (nq, nn)
        xq = np.einsum("ens,qn->eqs", X, B, optimize=True)

    if rdim == sdim:
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)
        return GeomFactors(qpts, w, J, detJ, w[None, :] * detJ, Jinv, None, xq)

    # Surface (or line) element embedded in higher dimension.
    JtJ = np.einsum("eqsr,eqst->eqrt", J, J, optimize=True)
    detJ = np.sqrt(np.linalg.det(JtJ))
    normal = None
    if rdim == 2 and sdim == 3:
        n = np.cross(J[..., 0], J[..., 1])
        normal = n / np.linalg.norm(n, axis=-1, keepdims=True)
    elif rdim == 1 and sdim == 2:
        t = J[..., 0]
        n = np.stack([t[..., 1], -t[..., 0]], axis=-1)
        normal = n / np.linalg.norm(n, axis=-1, keepdims=True)
    return GeomFactors(qpts, w, J, detJ, w[None, :] * detJ, None, normal, xq)


def bucket_volume(nodes: np.ndarray, bucket: ElemBucket, qorder: int = 4) -> float:
    gf = compute(nodes, bucket, qorder)
    return float(gf.wdetJ.sum())
