"""Matrix-free operator core: batched element kernels + gather/scatter.

The equivalent of the reference solver's libCEED operator stack (reference:
palace/fem/libceed/operator.cpp:148-214, palace/fem/qfunctions/*): each
operator application is

    t-dofs -> gather -> batched per-element kernel (MXU matmuls over the
    element axis) -> sorted segment-sum scatter -> t-dofs

with DofTransformations folded into per-(element, dof) sign tables at setup.

Two element-kernel modes:

- "element" (default): precomputed dense element matrices A_e applied as one
  batched matmul.  Optimal for moderate orders / simplices (A_e is nd^2 per
  element, smaller and faster than quadrature-loop partial assembly there).
- "qdata": quadrature-point partial assembly B^T (qd) B with basis tables
  shared across the bucket.  Wins for high-order tensor elements where nd^2
  storage dominates; the sum-factorized Pallas path plugs in here.

All tables are explicit pytree arguments of the jitted apply (never closure
constants, which XLA would inline as giant literals).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Scatter:
    """Sorted segment-sum scatter-add from element-local to global dofs."""

    num_dofs: int
    perm: np.ndarray
    seg_ids: np.ndarray

    @staticmethod
    def build(elem_dofs: Sequence[np.ndarray], num_dofs: int) -> "Scatter":
        flat = np.concatenate([np.asarray(ed).reshape(-1) for ed in elem_dofs])
        perm = np.argsort(flat, kind="stable")
        return Scatter(num_dofs, perm.astype(np.int32), flat[perm].astype(np.int32))


def _scatter_apply(perm, seg_ids, num_dofs, local_vals):
    flat = jnp.concatenate([v.reshape(-1) for v in local_vals])
    return jax.ops.segment_sum(
        flat[perm], seg_ids, num_segments=num_dofs, indices_are_sorted=True
    )


def detect_dof_group(gidx_arrays: Sequence[np.ndarray], num_dofs: int) -> int:
    """Largest g in (4, 3, 2) such that every element dof list is a
    concatenation of aligned, consecutive g-blocks (and num_dofs % g == 0).

    The entity-block dof numbering gives each edge/face/interior entity a
    contiguous, aligned run of its p (or 2p(p-1), ...) dofs, so element dof
    lists decompose into g-groups.  Gathering/scattering at group
    granularity cuts the per-row dynamic-slice issue cost (the measured
    bottleneck of the unstructured apply on TPU, PERF_NOTES.md: ~10 ns/row
    independent of row width) by g while moving the same bytes.
    """
    for g in (4, 3, 2):
        if num_dofs % g:
            continue
        ok = True
        for gidx in gidx_arrays:
            gidx = np.asarray(gidx)
            nd = gidx.shape[1]
            if nd % g:
                ok = False
                break
            a = gidx.reshape(gidx.shape[0], nd // g, g)
            if (a[:, :, 0] % g).any():
                ok = False
                break
            base = a[:, :, 0]
            for k in range(1, g):
                if not np.array_equal(a[:, :, k], base + k):
                    ok = False
                    break
            if not ok:
                break
        if ok:
            return g
    return 1


# Pytree of per-bucket apply tables.
@dataclass
class BucketTables:
    gidx: np.ndarray  # (E, nd) gather indices
    A: Optional[jnp.ndarray] = None  # (E, nd, nd) element matrices
    B: Optional[jnp.ndarray] = None  # (nq, nd)
    G: Optional[jnp.ndarray] = None  # (nq, nd, d)
    signs: Optional[jnp.ndarray] = None  # (E, nd)
    qd_mass: Optional[jnp.ndarray] = None  # (E, nq)
    qd_diff: Optional[jnp.ndarray] = None  # (E, nq, d, d)
    qd_diffp: Optional[np.ndarray] = None  # (d, d, E, nq) planar layout
    G2: Optional[jnp.ndarray] = None  # (nq, nd, d2) second basis table
    qd_diff2: Optional[jnp.ndarray] = None  # (E, nq, d2, d2)


def _bucket_arrays(b: BucketTables) -> dict:
    out = {"gidx": jnp.asarray(b.gidx)}
    for name in ("A", "B", "G", "signs", "qd_mass", "qd_diff", "G2",
                 "qd_diff2"):
        v = getattr(b, name)
        if v is not None:
            out[name] = jnp.asarray(v)
    return out


@functools.partial(jax.jit, static_argnums=(3,))
def _apply_jit(tables, scatter, u, num_dofs):
    locals_ = []
    for t in tables:
        ul = u[t["gidx"]]
        if "signs" in t:
            ul = ul * t["signs"]
        E, nd = ul.shape
        if "A" in t:
            vl = jnp.einsum("enm,em->en", t["A"], ul)
        else:
            vl = jnp.zeros_like(ul)
            for gk, qk in (("G", "qd_diff"), ("G2", "qd_diff2")):
                if qk in t:
                    G = t[gk]
                    nq, _, d = G.shape
                    Gm = G.transpose(0, 2, 1).reshape(nq * d, nd)
                    du = (ul @ Gm.T).reshape(E, nq, d)
                    h = jnp.einsum("eqdk,eqk->eqd", t[qk], du)
                    vl = vl + (h.reshape(E, nq * d) @ Gm)
            if "qd_mass" in t:
                bu = ul @ t["B"].T
                vl = vl + (t["qd_mass"] * bu) @ t["B"]
        if "signs" in t:
            vl = vl * t["signs"]
        locals_.append(vl)
    return _scatter_apply(scatter["perm"], scatter["seg_ids"], num_dofs, locals_)


class PAOperator:
    """Symmetric bilinear-form operator over the buckets of one space."""

    def __init__(self, num_dofs: int, buckets: List[BucketTables],
                 dtype=jnp.float64, mode: str = "element"):
        self.num_dofs = num_dofs
        self.buckets = buckets
        self.dtype = dtype
        self.mode = mode
        if mode == "element":
            for b in buckets:
                if b.A is None:
                    b.A = _assemble_element_matrices(b)
                b.B = b.G = b.qd_mass = b.qd_diff = b.qd_diffp = None
                b.G2 = b.qd_diff2 = None
        sc = Scatter.build([b.gidx for b in buckets], num_dofs)
        self._scatter_tree = {
            "perm": jnp.asarray(sc.perm),
            "seg_ids": jnp.asarray(sc.seg_ids),
        }
        self._tables = [_bucket_arrays(b) for b in buckets]

    def __call__(self, u):
        return _apply_jit(self._tables, self._scatter_tree, u, self.num_dofs)

    def diagonal(self) -> jnp.ndarray:
        locals_ = []
        for b, t in zip(self.buckets, self._tables):
            if b.A is not None:
                dl = jnp.einsum("enn->en", t["A"])
            else:
                E, nd = b.gidx.shape
                dl = jnp.zeros((E, nd), self.dtype)
                if b.qd_diff is not None:
                    dl = dl + jnp.einsum(
                        "qnd,eqdk,qnk->en", t["G"], t["qd_diff"], t["G"],
                        optimize=True,
                    )
                if b.qd_diff2 is not None:
                    dl = dl + jnp.einsum(
                        "qnd,eqdk,qnk->en", t["G2"], t["qd_diff2"], t["G2"],
                        optimize=True,
                    )
                if b.qd_mass is not None:
                    dl = dl + jnp.einsum("qn,eq,qn->en", t["B"], t["qd_mass"], t["B"])
            if b.signs is not None:
                dl = dl * t["signs"] * t["signs"]
            locals_.append(dl)
        return _scatter_apply(
            self._scatter_tree["perm"], self._scatter_tree["seg_ids"],
            self.num_dofs, locals_,
        )

    def element_energy(self, u) -> List[jnp.ndarray]:
        """Per-bucket, per-element quadratic forms 0.5 u_e^T A_e u_e."""
        out = []
        u = jnp.asarray(u)
        for b, t in zip(self.buckets, self._tables):
            ul = u[t["gidx"]]
            if b.signs is not None:
                ul = ul * t["signs"]
            if b.A is not None:
                e = 0.5 * jnp.einsum("en,enm,em->e", jnp.conj(ul), t["A"], ul)
            else:
                raise NotImplementedError("element_energy requires element mode")
            out.append(e)
        return out

    def assemble_dense_local(self) -> List[np.ndarray]:
        out = []
        for b in self.buckets:
            A = np.asarray(b.A if b.A is not None else _assemble_element_matrices(b))
            if b.signs is not None:
                s = np.asarray(b.signs)
                A = A * s[:, :, None] * s[:, None, :]
            out.append(A)
        return out

    def assemble_csr(self):
        """Global sparse matrix (scipy CSR, host; for coarse direct solves)."""
        import scipy.sparse as sp

        rows, cols, vals = [], [], []
        for b, A in zip(self.buckets, self.assemble_dense_local()):
            gidx = np.asarray(b.gidx)
            E, nd = gidx.shape
            rows.append(np.repeat(gidx, nd, axis=1).ravel())
            cols.append(np.tile(gidx, (1, nd)).ravel())
            vals.append(A.reshape(E, -1).ravel())
        M = sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(self.num_dofs, self.num_dofs),
        )
        return M.tocsr()


def _assemble_element_matrices(b: BucketTables) -> np.ndarray:
    """A_e = sum_q G_q^T W_q G_q + B_q^T qm_q B_q.

    Formulated as ONE dgemm per term against a static assembly tensor:
      A[e, n*m] = sum_{q,d,k} W[e, q*d*k] * S[q*d*k, n*m],
      S[q,d,k,n,m] = G[q,n,d] G[q,m,k]
    so the per-element work is a single large matrix product (MXU/BLAS
    shaped) instead of millions of tiny batched products.
    """
    E, nd = np.asarray(b.gidx).shape
    A = np.zeros((E, nd * nd))
    if b.qd_diffp is not None:
        G = np.asarray(b.G)  # (nq, nd, d)
        nq, _, d = G.shape
        # Rows ordered (dd, k, q) to match the planar qdata layout:
        # S[(dd*d + k)*nq + q, n*m] = G[q, n, dd] * G[q, m, k]
        S = (
            G.transpose(2, 0, 1)[:, None, :, :, None]      # (dd, 1, q, n, 1)
            * G.transpose(2, 0, 1)[None, :, :, None, :]    # (1, k, q, 1, m)
        ).reshape(d * d * nq, nd * nd)
        # W rows: (E, dd*k*q) from planar (dd, k, E, q).
        W = np.ascontiguousarray(
            np.moveaxis(np.asarray(b.qd_diffp).reshape(d * d, E, nq), 1, 0)
        ).reshape(E, d * d * nq)
        A += W @ S
    elif b.qd_diff is not None:
        G = np.asarray(b.G)  # (nq, nd, d)
        nq, _, d = G.shape
        S = (
            G.transpose(0, 2, 1)[:, :, None, :, None]
            * G.transpose(0, 2, 1)[:, None, :, None, :]
        ).reshape(nq * d * d, nd * nd)
        W = np.asarray(b.qd_diff).reshape(E, nq * d * d)
        A += W @ S
    if b.qd_mass is not None:
        B = np.asarray(b.B)  # (nq, nd)
        nq = B.shape[0]
        SB = (B[:, :, None] * B[:, None, :]).reshape(nq, nd * nd)
        A += np.asarray(b.qd_mass) @ SB
    return A.reshape(E, nd, nd)


class EliminatedOperator:
    """Essential-BC elimination wrapper (reference: palace/linalg/rap.hpp:18-39,
    DiagonalPolicy::DIAG_ONE): y = A u on free dofs, y[ess] = u[ess]."""

    def __init__(self, op: Callable, ess_mask: np.ndarray):
        self.op = op
        self.ess_mask = jnp.asarray(ess_mask)

    def __call__(self, u):
        y = self.op(u * (~self.ess_mask))
        return jnp.where(self.ess_mask, u, y)

    def eliminate_rhs(self, b, x_bc):
        """b <- b - A x_bc on free dofs; b[ess] <- x_bc[ess]."""
        ax = self.op(x_bc * self.ess_mask)
        bb = b - ax
        return jnp.where(self.ess_mask, x_bc, bb)


def make_ess_mask(num_dofs: int, ess_dofs: np.ndarray) -> np.ndarray:
    m = np.zeros(num_dofs, bool)
    m[np.asarray(ess_dofs, np.int64)] = True
    return m
