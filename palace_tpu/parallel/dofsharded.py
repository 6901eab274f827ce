"""Dof-sharded SPMD operators: the production multi-chip layer.

The TPU-native equivalent of the reference solver's true-dof ownership +
halo exchange through the parallel prolongation P/P^T (reference:
palace/linalg/rap.hpp:18-39) over METIS element partitions (reference:
palace/utils/geodata.hpp:69-79).  Design:

* **Locality-aware partition.**  Elements (domain and boundary buckets
  alike) are ordered along a Morton space-filling curve of their centroids
  and split into ``S`` contiguous, count-balanced chunks — the SFC analog of
  the reference's METIS_PartGraphRecursive call.  Contiguity along the SFC
  keeps each shard's dof footprint compact, so the interface is a surface
  (O((N/S)^(2/3) * S) dofs), not a volume.

* **Dof ownership.**  A dof touched by exactly one shard's elements is
  *interior* to that shard and lives only in that shard's packed local
  block (per-device memory ~ N/S).  A dof touched by >= 2 shards is an
  *interface* dof; the (small) interface block is replicated on every
  device.  The single ``psum`` over the interface block after the local
  scatter-add IS the halo exchange — it rides ICI as one fused XLA
  collective instead of point-to-point MPI messages, and its payload is the
  interface surface only, never the full vector (contrast
  parallel/sharded.py, the round-1 full-vector-psum demo kept for the
  scaling benchmark).

* **Replicated-scalar Krylov.**  CG/dot-products need one scalar psum per
  reduction; interface contributions are computed redundantly (identical on
  every device), interior contributions are psum'd.  The whole PCG loop is
  a single ``lax.while_loop`` inside one ``shard_map``, compiled once.

Vectors live as the pair ``(x_int, x_ifc)`` with ``x_int`` of shape
``(S, max_int)`` sharded on the 1-D "cells" device axis and ``x_ifc`` of
shape ``(n_ifc,)`` replicated.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_cells_mesh(n_shards: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_shards is None:
        n_shards = len(devices)
    return Mesh(np.asarray(devices[:n_shards]), ("cells",))


# ---------------------------------------------------------------------------
# Morton (Z-order) element partition
# ---------------------------------------------------------------------------


def _spread_bits(v: np.ndarray, ndim: int) -> np.ndarray:
    """Interleave-ready bit spreading of 21-bit ints (ndim=2 or 3)."""
    v = v.astype(np.uint64)
    if ndim == 3:
        v &= np.uint64(0x1FFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    else:
        v &= np.uint64(0xFFFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_codes(centroids: np.ndarray) -> np.ndarray:
    """Z-order codes of points (n, d), d in {2, 3}."""
    d = centroids.shape[1]
    lo = centroids.min(axis=0)
    span = np.maximum(centroids.max(axis=0) - lo, 1e-300)
    bits = 21 if d == 3 else 31
    q = np.minimum(
        ((centroids - lo) / span * (2**bits - 1)).astype(np.uint64),
        np.uint64(2**bits - 1),
    )
    code = np.zeros(len(centroids), np.uint64)
    for k in range(d):
        code |= _spread_bits(q[:, k], d) << np.uint64(k)
    return code


# ---------------------------------------------------------------------------
# Partition
# ---------------------------------------------------------------------------


@dataclass
class TermBuckets:
    """Per-shard apply tables of one bilinear-form term (one bucket list)."""

    gidx: List[jnp.ndarray]  # per bucket: (S, E_max, nd) local indices
    A: List[jnp.ndarray]  # per bucket: (S, E_max, nd, nd)
    signs: List[Optional[jnp.ndarray]]  # per bucket: (S, E_max, nd) or None


@dataclass
class DofPartition:
    """SFC element partition + interior/interface dof split for S shards."""

    n_shards: int
    num_dofs: int
    max_int: int
    n_ifc: int
    int_global: np.ndarray  # (S, max_int) global dof ids, -1 padding
    int_valid: np.ndarray  # (S, max_int) bool
    ifc_global: np.ndarray  # (n_ifc,)
    local_maps: np.ndarray  # (S, num_dofs) global -> local (-1 if absent)
    shard_of: List[np.ndarray]  # per input bucket: (E_b,) shard id

    @staticmethod
    def build(num_dofs: int, gidx_list: Sequence[np.ndarray],
              centroid_list: Sequence[np.ndarray], n_shards: int
              ) -> "DofPartition":
        S = n_shards
        counts_b = [len(c) for c in centroid_list]
        cents = np.concatenate([np.asarray(c, float) for c in centroid_list])
        order = np.argsort(morton_codes(cents), kind="stable")
        E_tot = len(cents)
        # Balanced contiguous chunks along the SFC.
        bounds = (np.arange(1, S) * E_tot) // S
        shard_global = np.empty(E_tot, np.int32)
        shard_global[order] = np.searchsorted(bounds, np.arange(E_tot),
                                              side="right")
        shard_of, off = [], 0
        for nb in counts_b:
            shard_of.append(shard_global[off:off + nb])
            off += nb

        # dof -> set of touching shards via unique (dof, shard) keys.
        keys = np.concatenate([
            g.astype(np.int64).ravel() * S + np.repeat(s.astype(np.int64),
                                                       g.shape[1])
            for g, s in zip(gidx_list, shard_of)
        ])
        u = np.unique(keys)
        dofs_u, shards_u = u // S, (u % S).astype(np.int32)
        touch = np.bincount(dofs_u, minlength=num_dofs)
        single = np.full(num_dofs, -1, np.int32)
        m1 = touch[dofs_u] == 1
        single[dofs_u[m1]] = shards_u[m1]
        interface = touch >= 2
        # Unused dofs (essential-only or orphaned) go interior to shard 0.
        single[touch == 0] = 0

        int_ids = [np.where(~interface & (single == s))[0] for s in range(S)]
        max_int = max(len(i) for i in int_ids)
        int_global = np.full((S, max_int), -1, np.int64)
        int_valid = np.zeros((S, max_int), bool)
        for s, ids in enumerate(int_ids):
            int_global[s, : len(ids)] = ids
            int_valid[s, : len(ids)] = True
        ifc_global = np.where(interface)[0]
        n_ifc = len(ifc_global)

        local_maps = np.full((S, num_dofs), -1, np.int64)
        local_maps[:, ifc_global] = max_int + np.arange(n_ifc)
        for s, ids in enumerate(int_ids):
            local_maps[s, ids] = np.arange(len(ids))
        return DofPartition(S, num_dofs, max_int, n_ifc, int_global,
                            int_valid, ifc_global, local_maps, shard_of)

    # -- vector layout ------------------------------------------------------

    def scatter_vector(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Global (num_dofs,) -> ((S, max_int), (n_ifc,))."""
        x = np.asarray(x)
        xi = np.where(self.int_valid, x[np.clip(self.int_global, 0, None)],
                      np.zeros((), x.dtype))
        return xi, x[self.ifc_global]

    def gather_vector(self, x_int, x_ifc) -> np.ndarray:
        x_int, x_ifc = np.asarray(x_int), np.asarray(x_ifc)
        out = np.zeros(self.num_dofs, x_int.dtype)
        out[self.int_global[self.int_valid]] = x_int[self.int_valid]
        out[self.ifc_global] = x_ifc
        return out

    # -- table layout -------------------------------------------------------

    def shard_term(self, gidx_list, A_list, signs_list=None, dtype=None,
                   bucket_ids: Optional[Sequence[int]] = None) -> TermBuckets:
        """Pack one term's element tables into per-shard padded arrays.

        ``bucket_ids`` maps each entry to the partition bucket (defaults to
        positional).  Padded rows get zero element matrices and local index
        0, so they contribute nothing to the scatter-add.
        """
        S = self.n_shards
        g_out, A_out, s_out = [], [], []
        for k, (g, A) in enumerate(zip(gidx_list, A_list)):
            b = bucket_ids[k] if bucket_ids is not None else k
            sh = self.shard_of[b]
            g = np.asarray(g)
            A = np.asarray(A)
            sg = None if signs_list is None or signs_list[k] is None \
                else np.asarray(signs_list[k])
            if sg is not None and sg.dtype == object:
                sg = None  # np.asarray(None) from sign-free buckets
            if sg is not None and sg.ndim < 2:
                sg = np.broadcast_to(sg, g.shape)
            if dtype is not None:
                A = A.astype(dtype)
            E_max = int(np.bincount(sh, minlength=S).max())
            nd = g.shape[1]
            gi = np.zeros((S, E_max, nd), np.int64)
            Ai = np.zeros((S, E_max) + A.shape[1:], A.dtype)
            si = np.ones((S, E_max, nd), sg.dtype) if sg is not None else None
            for s in range(S):
                sel = np.where(sh == s)[0]
                gi[s, : len(sel)] = self.local_maps[s][g[sel]]
                Ai[s, : len(sel)] = A[sel]
                if si is not None:
                    si[s, : len(sel)] = sg[sel]
            g_out.append(jnp.asarray(gi))
            A_out.append(jnp.asarray(Ai))
            s_out.append(jnp.asarray(si) if si is not None else None)
        return TermBuckets(g_out, A_out, s_out)


# ---------------------------------------------------------------------------
# Sharded operator
# ---------------------------------------------------------------------------


def _term_pytree(terms: Sequence[TermBuckets]):
    out = []
    for t in terms:
        bl = []
        for g, A, s in zip(t.gidx, t.A, t.signs):
            d = {"gidx": g, "A": A}
            if s is not None:
                d["signs"] = s
            bl.append(d)
        out.append(bl)
    return out


class DofShardedOperator:
    """A(c) = sum_t c_t * X_t with dof-sharded apply over a "cells" mesh.

    Terms share the partition but may have distinct bucket sets (domain
    elements vs boundary facets).  ``coefs`` is a (T,) array (traced ok), so
    one compiled apply serves every frequency of a sweep.
    """

    def __init__(self, part: DofPartition, terms: Sequence[TermBuckets],
                 mesh: Mesh):
        self.part = part
        self.mesh = mesh
        self.tables = _term_pytree(terms)
        self._sharding_int = NamedSharding(mesh, P("cells"))
        self._sharding_rep = NamedSharding(mesh, P())

    def device_put_tables(self):
        """Place tables with the intended shardings (leading axis = shard)."""
        sh = self._sharding_int

        def put(x):
            return jax.device_put(x, sh)

        self.tables = jax.tree.map(put, self.tables)
        return self

    def put_vector(self, x_int, x_ifc):
        return (jax.device_put(jnp.asarray(x_int), self._sharding_int),
                jax.device_put(jnp.asarray(x_ifc), self._sharding_rep))

    def apply(self, coefs, x_int, x_ifc):
        return _sharded_term_apply(
            self.tables, coefs, x_int, x_ifc, mesh=self.mesh,
            max_int=self.part.max_int, n_ifc=self.part.n_ifc)


def _local_term_apply(tables, coefs, xi, xf, *, max_int, n_ifc):
    """Per-device apply; xi: (1, max_int), xf: (n_ifc,) replicated."""
    u = jnp.concatenate([xi[0], xf])
    y = jnp.zeros(max_int + n_ifc, u.dtype)
    for t_i, term in enumerate(tables):
        c = coefs[t_i]
        for t in term:
            g = t["gidx"][0]
            ul = u[g]
            if "signs" in t:
                ul = ul * t["signs"][0]
            vl = jnp.einsum("enm,em->en", t["A"][0], ul)
            if "signs" in t:
                vl = vl * t["signs"][0]
            y = y.at[g.reshape(-1)].add(c * vl.reshape(-1))
    y_ifc = jax.lax.psum(y[max_int:], "cells")
    return y[:max_int][None, :], y_ifc


@functools.partial(jax.jit, static_argnames=("mesh", "max_int", "n_ifc"))
def _sharded_term_apply(tables, coefs, x_int, x_ifc, *, mesh, max_int, n_ifc):
    specs = jax.tree.map(lambda _: P("cells"), tables)
    f = jax.shard_map(
        functools.partial(_local_term_apply, max_int=max_int, n_ifc=n_ifc),
        mesh=mesh, in_specs=(specs, P(), P("cells"), P()),
        out_specs=(P("cells"), P()),
    )
    return f(tables, coefs, x_int, x_ifc)


# ---------------------------------------------------------------------------
# Production PCG (Jacobi) on the sharded layout
# ---------------------------------------------------------------------------


def sharded_pcg(op: DofShardedOperator, coefs, b_int, b_ifc, diag_int,
                diag_ifc, ess_int, ess_ifc, *, tol: float = 1e-10,
                max_its: int = 1000):
    """Jacobi-preconditioned CG, entire loop on device, one compile.

    Essential dofs act as an identity block (ops.partial.EliminatedOperator
    convention): b carries the BC value there and the solution reproduces
    it.  Returns (x_int, x_ifc, relres, iterations).
    """
    part = op.part
    xi, xf, relres, it = _pcg_jit(
        op.tables, jnp.asarray(coefs), b_int, b_ifc, diag_int, diag_ifc,
        ess_int, ess_ifc, mesh=op.mesh, max_int=part.max_int,
        n_ifc=part.n_ifc, tol=float(tol), max_its=int(max_its))
    return xi, xf, float(relres[0, 0]), int(it[0, 0])


@functools.partial(jax.jit, static_argnames=("mesh", "max_int", "n_ifc",
                                             "tol", "max_its"))
def _pcg_jit(tables, coefs, b_int, b_ifc, diag_int, diag_ifc, ess_int,
             ess_ifc, *, mesh, max_int, n_ifc, tol, max_its):
    specs = jax.tree.map(lambda _: P("cells"), tables)

    def local(tables, coefs, bi, bf, di, df, ei, ef):
        ei = ei[0]

        def A(xi, xf):
            # EliminatedOperator convention: identity on essential dofs, so
            # inhomogeneous BC values ride in b (ops/partial.py).
            fi = jnp.where(ei, 0.0, xi)
            ff = jnp.where(ef, 0.0, xf)
            yi, yf = _local_term_apply(tables, coefs, fi[None], ff,
                                       max_int=max_int, n_ifc=n_ifc)
            return jnp.where(ei, xi, yi[0]), jnp.where(ef, xf, yf)

        def prec_inv(d, e):
            bad = d == 0
            d = jnp.where(bad, 1.0, d)
            return jnp.where(e, 1.0, jnp.where(bad, 0.0, 1.0 / d))

        dinv_i = prec_inv(di[0], ei)
        dinv_f = prec_inv(df, ef)

        def dot(ai, af, bi_, bf_):
            # Interior: psum over shards; interface: replicated, computed
            # redundantly (identical on all devices).
            return (jax.lax.psum(jnp.vdot(ai, bi_), "cells")
                    + jnp.vdot(af, bf_))

        bi0, bf0 = bi[0], bf
        bnorm = jnp.sqrt(jnp.real(dot(bi0, bf0, bi0, bf0)))
        bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
        zi, zf = dinv_i * bi0, dinv_f * bf0
        rz0 = dot(zi, zf, bi0, bf0)
        st = (jnp.zeros_like(bi0), jnp.zeros_like(bf0),  # x
              bi0, bf0,  # r
              zi, zf,  # p
              rz0, jnp.array(0, jnp.int32),
              jnp.sqrt(jnp.real(dot(bi0, bf0, bi0, bf0))))

        def cond(st):
            *_, it, rnorm = st
            return (rnorm > tol * bnorm) & (it < max_its)

        def body(st):
            xi, xf, ri, rf, pi, pf, rz, it, _ = st
            Api, Apf = A(pi, pf)
            alpha = rz / dot(pi, pf, Api, Apf)
            xi, xf = xi + alpha * pi, xf + alpha * pf
            ri, rf = ri - alpha * Api, rf - alpha * Apf
            zi, zf = dinv_i * ri, dinv_f * rf
            rz_new = dot(zi, zf, ri, rf)
            beta = rz_new / rz
            pi, pf = zi + beta * pi, zf + beta * pf
            rnorm = jnp.sqrt(jnp.real(dot(ri, rf, ri, rf)))
            return (xi, xf, ri, rf, pi, pf, rz_new, it + 1, rnorm)

        xi, xf, *_, it, rnorm = jax.lax.while_loop(cond, body, st)
        return (xi[None], xf, (rnorm / bnorm).reshape(1, 1),
                it.reshape(1, 1))

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(specs, P(), P("cells"), P(), P("cells"), P(), P("cells"),
                  P()),
        out_specs=(P("cells"), P(), P(None, None), P(None, None)),
    )
    return f(tables, coefs, b_int, b_ifc, diag_int, diag_ifc,
             ess_int, ess_ifc)


# ---------------------------------------------------------------------------
# Glue: build from PAOperator(s) + mesh geometry
# ---------------------------------------------------------------------------


def bucket_centroids(mesh_obj) -> List[np.ndarray]:
    return [mesh_obj.nodes[b.conn].mean(axis=1) for b in mesh_obj.buckets]


def partition_for_space(space, n_shards: int) -> DofPartition:
    """Partition a FE space's dofs using its mesh's domain buckets."""
    gidx = [np.asarray(g) for g in space.elem_dofs]
    cents = bucket_centroids(space.mesh)
    return DofPartition.build(space.num_dofs, gidx, cents, n_shards)


def shard_pa_operator(op, part: DofPartition, mesh: Mesh, dtype=None
                      ) -> DofShardedOperator:
    """DofShardedOperator (single term, coef [1.0]) from an element-mode
    PAOperator whose buckets align with the partition buckets."""
    gidx = [np.asarray(b.gidx) for b in op.buckets]
    A = [np.asarray(b.A) for b in op.buckets]
    signs = [None if b.signs is None else np.asarray(b.signs)
             for b in op.buckets]
    term = part.shard_term(gidx, A, signs, dtype=dtype)
    return DofShardedOperator(part, [term], mesh).device_put_tables()


def solve_spd_sharded(op, b, ess_mask, *, tol: float = 1e-10,
                      max_its: int = 1000, mesh: Optional[Mesh] = None,
                      part: Optional[DofPartition] = None,
                      sharded: Optional[DofShardedOperator] = None):
    """Drop-in multi-device CG solve of an element-mode PAOperator system.

    Used by drivers when more than one device is visible (the production
    multi-chip path; see drivers/common.solve_spd).  Returns
    (x_global, iterations, relres, sharded_op) — the sharded operator can be
    reused across right-hand sides (per-terminal electrostatic solves).
    """
    if mesh is None:
        mesh = make_cells_mesh()
    if sharded is None:
        if part is None:
            raise ValueError("pass part= or sharded=")
        sharded = shard_pa_operator(op, part, mesh)
    partn = sharded.part
    b_int, b_ifc = partn.scatter_vector(np.asarray(b))
    d_glob = np.asarray(op.diagonal())
    d_int, d_ifc = partn.scatter_vector(d_glob)
    e_int, e_ifc = partn.scatter_vector(np.asarray(ess_mask))
    e_int, e_ifc = e_int.astype(bool), e_ifc.astype(bool)
    coefs = jnp.ones((1,), jnp.asarray(b_int).dtype)
    b_int, b_ifc = sharded.put_vector(b_int, b_ifc)
    xi, xf, relres, its = sharded_pcg(
        sharded, coefs, b_int, b_ifc, *sharded.put_vector(d_int, d_ifc),
        jax.device_put(jnp.asarray(e_int), sharded._sharding_int),
        jax.device_put(jnp.asarray(e_ifc), sharded._sharding_rep),
        tol=tol, max_its=max_its)
    x = partn.gather_vector(np.asarray(xi), np.asarray(xf))
    return x, its, relres, sharded
