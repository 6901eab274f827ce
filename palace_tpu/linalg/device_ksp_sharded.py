"""Multi-chip (dof-sharded) variant of the blocked device FGMRES + p-MG
solver: the complex driven/eigen hot path over a ``("cells",)`` device mesh.

This extends the single-device ``linalg/device_ksp.BlockedDeviceSolver``
(same math, same term structure, same V-cycle) with the dof-sharded SPMD
layout of ``parallel/dofsharded.py`` (reference distributed analog:
palace/linalg/rap.hpp:124 ComplexParOperator over true-dof partitions with
parallel prolongation halo exchange, rap.cpp:594 hot path):

* **Fine-level vectors** live as the pair ``(x_int, x_ifc)``: ``x_int`` of
  shape ``(S, max_int, F)`` sharded on the 1-D "cells" mesh axis (per-device
  memory ~ N/S), ``x_ifc`` of shape ``(n_ifc, F)`` replicated.  The
  interface (dofs shared by >= 2 shards) is a mesh surface, O((N/S)^(2/3)).
* **Fine-level linear maps** (the term-structured system apply, the
  discrete gradient G/G^T for Hiptmair smoothing, and the inter-level
  transfers P/P^T) are split into per-shard ELL tables where every nonzero
  entry is assigned to exactly ONE shard whose local dof map contains both
  its row and column.  A local SpMV followed by a single ``psum`` over the
  interface (or over the whole replicated output, for fine->coarse maps) IS
  the halo exchange — one fused XLA collective on ICI per apply instead of
  point-to-point MPI messages.
* **Coarse p-MG levels are replicated.**  They are O((p_c/p_f)^3) smaller
  than the fine level, so replicating them costs little memory and turns
  every coarse operation into local (communication-free) compute; the
  coarsest complex solve stays a host sparse-direct factorization through
  ``jax.pure_callback`` exactly as in the single-device solver.

The FGMRES recurrence itself runs at jit level on the pair layout with
per-column reductions computed as (sharded interior contraction + replicated
interface contraction); XLA/GSPMD inserts the one all-reduce per reduction.

Numerically this produces the same iterates as the single-device solver up
to floating-point reassociation: shard-count invariance at ~1e-10 is
enforced by tests/test_sharded_driven.py.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from palace_tpu.linalg.device_ksp import (Term, _csr_to_ell, _ell_apply,
                                          _lmax_est, mg_orders)
from palace_tpu.parallel.dofsharded import DofPartition, make_cells_mesh


# ---------------------------------------------------------------------------
# Partitions and entry->shard assignment
# ---------------------------------------------------------------------------


def partition_from_space(space, n_shards: int) -> DofPartition:
    """Element-SFC dof partition of a FE space (domain buckets)."""
    from palace_tpu.parallel.dofsharded import bucket_centroids

    gidx = [np.asarray(g) for g in space.elem_dofs]
    cents = bucket_centroids(space.mesh)
    return DofPartition.build(space.num_dofs, gidx, cents, n_shards)


def _member(part: DofPartition) -> np.ndarray:
    """(S, N) bool: dof present in shard s's local map."""
    return part.local_maps >= 0


def _assign(rows: np.ndarray, cols: np.ndarray, mem_r: Optional[np.ndarray],
            mem_c: Optional[np.ndarray], S: int) -> np.ndarray:
    """Unique shard per entry: the lowest s whose local map contains both the
    row (if row-partitioned) and the column (if column-partitioned)."""
    n = len(rows)
    out = np.full(n, -1, np.int32)
    for s in range(S):
        ok = out < 0
        if mem_r is not None:
            ok &= mem_r[s][rows]
        if mem_c is not None:
            ok &= mem_c[s][cols]
        out[ok] = s
    if (out < 0).any():
        raise RuntimeError(
            "sharded map entry with no shard containing both endpoints "
            "(map does not respect the element partition)")
    return out


def _shard_ell(A: sp.spmatrix, row_part: Optional[DofPartition],
               col_part: Optional[DofPartition], S: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray, int, int]:
    """Per-shard ELL tables (S, R, k) for y = A x with the pair layout.

    Rows map to the shard-local concat layout [interior | interface] when
    ``row_part`` is given (R = max_int + n_ifc), else to global rows
    (replicated output, psum-all).  Columns likewise.  Every nonzero is
    assigned to exactly one shard (see _assign), so summing the per-shard
    partial results reproduces A x exactly.
    """
    A = A.tocoo()
    rows, cols, vals = A.row, A.col, A.data
    mem_r = _member(row_part) if row_part is not None else None
    mem_c = _member(col_part) if col_part is not None else None
    shard = _assign(rows, cols, mem_r, mem_c, S)
    R = (row_part.max_int + row_part.n_ifc) if row_part is not None \
        else A.shape[0]
    C = (col_part.max_int + col_part.n_ifc) if col_part is not None \
        else A.shape[1]
    lrow = (row_part.local_maps[shard, rows] if row_part is not None
            else rows.astype(np.int64))
    lcol = (col_part.local_maps[shard, cols] if col_part is not None
            else cols.astype(np.int64))
    # ELL width = max entries of one (shard, local row).
    order = np.lexsort((lrow, shard))
    sh_s, r_s, c_s, v_s = shard[order], lrow[order], lcol[order], vals[order]
    key = sh_s.astype(np.int64) * R + r_s
    uniq, start, cnt = np.unique(key, return_index=True, return_counts=True)
    k = max(1, int(cnt.max()) if len(cnt) else 1)
    pos = np.arange(len(key)) - np.repeat(start, cnt)
    ell_c = np.zeros((S, R, k), np.int32)
    ell_v = np.zeros((S, R, k), np.float64)
    ell_c[sh_s, r_s, pos] = c_s
    ell_v[sh_s, r_s, pos] = np.real(v_s)
    return jnp.asarray(ell_c), jnp.asarray(ell_v), R, C


# ---------------------------------------------------------------------------
# Pair-layout helpers (host side)
# ---------------------------------------------------------------------------


def scatter_cols(part: DofPartition, x: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Global (N, F) -> ((S, max_int, F), (n_ifc, F)); padded lanes zero."""
    x = np.asarray(x)
    xi = np.where(part.int_valid[:, :, None],
                  x[np.clip(part.int_global, 0, None)],
                  np.zeros((), x.dtype))
    return xi, x[part.ifc_global]


def gather_cols(part: DofPartition, xi, xf) -> np.ndarray:
    xi, xf = np.asarray(xi), np.asarray(xf)
    F = xi.shape[-1]
    out = np.zeros((part.num_dofs, F), xi.dtype)
    out[part.int_global[part.int_valid]] = xi[part.int_valid]
    out[part.ifc_global] = xf
    return out


# ---------------------------------------------------------------------------
# The sharded solver
# ---------------------------------------------------------------------------


class ShardedBlockedDeviceSolver:
    """FGMRES + p-MG over a ``("cells",)`` device mesh for term systems
    A(omega) x = b over a block of frequencies.  Drop-in for
    ``BlockedDeviceSolver`` (same constructor semantics + ``jmesh``)."""

    def __init__(self, space, materials_pec_attrs, terms: List[Term],
                 omegas: Sequence[float], ess_mask: np.ndarray, *,
                 jmesh: Optional[Mesh] = None,
                 tol: float = 1e-6, max_its: int = 200, restart: int = 30,
                 smooth_order: int = 4, smooth_its: int = 1,
                 use_aux: bool = True, coarsening: str = "Logarithmic",
                 max_levels: int = 100, max_block: int = 8,
                 log: Optional[Callable] = None):
        from palace_tpu.fem.h1 import H1Space
        from palace_tpu.fem.nd import NDSpace
        from palace_tpu.fem.nd_operators import nd_h1_gradient
        from palace_tpu.linalg.ndmg import nd_prolongation

        self.jmesh = jmesh if jmesh is not None else make_cells_mesh()
        S = self.jmesh.devices.size
        self.S = S
        self.omegas = list(omegas)
        self.tol = tol
        self.max_its = max_its
        self.restart = min(restart, max_its)
        self.max_block = max_block
        self.log = log or (lambda s: None)
        self.terms = terms
        mesh = space.mesh
        n = space.num_dofs
        pec = list(materials_pec_attrs)

        self.part = partition_from_space(space, S)
        part = self.part
        self._sh_cells = NamedSharding(self.jmesh, P("cells"))
        self._sh_rep = NamedSharding(self.jmesh, P())

        orders = mg_orders(space.order, coarsening, max_levels)
        spaces = [space] + [NDSpace(mesh, q) for q in orders[1:]]

        # Per-level term CSRs (Galerkin-coarsened) + essential masks, as in
        # the single-device solver.
        csrs = [[t.csr(n) for t in terms]]
        ess_masks = [np.asarray(ess_mask)]
        Ps: List[Optional[sp.csr_matrix]] = [None]
        for li in range(1, len(spaces)):
            ess = np.zeros(spaces[li].num_dofs, bool)
            if pec:
                ess[spaces[li].boundary_dofs(pec)] = True
            Pl = nd_prolongation(spaces[li], spaces[li - 1])
            ff = sp.diags((~ess_masks[li - 1]).astype(float))
            fc = sp.diags((~ess).astype(float))
            Pl = (ff @ Pl @ fc).tocsr()
            Ps.append(Pl)
            ess_masks.append(ess)
            csrs.append([(Pl.T @ X @ Pl).tocsr() for X in csrs[li - 1]])

        # ---- fine level: sharded tables ----------------------------------
        T = len(terms)
        fine: Dict = {"n": n}
        # Term apply: per-term sharded ELL of the assembled CSR.  (Element
        # tables would also work; the assembled CSR has strictly fewer
        # gathered rows and the entry->shard assignment is uniform.)
        fine["term_ell"] = [
            _shard_ell(csrs[0][t], part, part, S) for t in range(T)]
        fine["diags"] = [  # (T, S, max_int), (T, n_ifc)
            np.stack([scatter_cols(part, X.diagonal()[:, None])[0][..., 0]
                      for X in csrs[0]]),
            np.stack([X.diagonal()[part.ifc_global] for X in csrs[0]]),
        ]
        free_i, free_f = scatter_cols(
            part, (~ess_masks[0]).astype(np.float64)[:, None])
        # Padded interior lanes must act pinned (free = 0) so they never
        # contaminate dots; they hold zeros throughout.
        free_i = free_i[..., 0] * part.int_valid
        fine["free"] = (free_i, free_f[..., 0])
        self._aux = use_aux
        if use_aux:
            h1 = H1Space(mesh, space.order)
            self.part_h1 = partition_from_space(h1, S)
            G = nd_h1_gradient(space, h1)
            essg = np.zeros(h1.num_dofs, bool)
            if pec:
                essg[h1.boundary_dofs(pec)] = True
            Gf = (sp.diags((~ess_masks[0]).astype(float)) @ G
                  @ sp.diags((~essg).astype(float))).tocsr()
            aux0 = [(Gf.T @ X @ Gf).tocsr() for X in csrs[0]]
            fine["aux_ell"] = [
                _shard_ell(aux0[t], self.part_h1, self.part_h1, S)
                for t in range(T)]
            fine["aux_diags"] = [
                np.stack([scatter_cols(self.part_h1,
                                       X.diagonal()[:, None])[0][..., 0]
                          for X in aux0]),
                np.stack([X.diagonal()[self.part_h1.ifc_global]
                          for X in aux0]),
            ]
            afree_i, afree_f = scatter_cols(
                self.part_h1, (~essg).astype(np.float64)[:, None])
            afree_i = afree_i[..., 0] * self.part_h1.int_valid
            fine["aux_free"] = (afree_i, afree_f[..., 0])
            fine["G"] = _shard_ell(Gf, part, self.part_h1, S)
            fine["Gt"] = _shard_ell(Gf.T.tocsr(), self.part_h1, part, S)
            aux_for_lmax = aux0
            essg_mask = essg
        # Fine <-> level-1 transfers (level 1 replicated).
        if len(spaces) > 1:
            fine["P1"] = _shard_ell(Ps[1], part, None, S)
            fine["P1t"] = _shard_ell(Ps[1].T.tocsr(), None, part, S)
        self._fine = fine

        # ---- coarse levels (replicated), reusing device_ksp machinery ----
        from palace_tpu.linalg.device_ksp import EllTermOperator

        self._levels = []
        aux_csrs_all = [aux_for_lmax] if use_aux else [None]
        for li in range(1, len(spaces)):
            nl = spaces[li].num_dofs
            ess = ess_masks[li]
            lvl = {
                "n": nl,
                "apply": EllTermOperator(csrs[li]),
                "diags": jnp.asarray(np.stack([X.diagonal()
                                               for X in csrs[li]])),
                "free": jnp.asarray((~ess).astype(np.float64)),
            }
            if use_aux:
                h1l = H1Space(mesh, spaces[li].order)
                Gl = nd_h1_gradient(spaces[li], h1l)
                essgl = np.zeros(h1l.num_dofs, bool)
                if pec:
                    essgl[h1l.boundary_dofs(pec)] = True
                Glf = (sp.diags((~ess).astype(float)) @ Gl
                       @ sp.diags((~essgl).astype(float))).tocsr()
                aux = [(Glf.T @ X @ Glf).tocsr() for X in csrs[li]]
                aux_csrs_all.append(aux)
                lvl["aux_apply"] = EllTermOperator(aux)
                lvl["aux_diags"] = jnp.asarray(np.stack([X.diagonal()
                                                         for X in aux]))
                lvl["aux_free"] = jnp.asarray((~essgl).astype(np.float64))
                lvl["G"] = _csr_to_ell(Glf)
                lvl["Gt"] = _csr_to_ell(Glf.T)
            else:
                aux_csrs_all.append(None)
            if li > 1:
                lvl["P"] = _csr_to_ell(Ps[li])
                lvl["Pt"] = _csr_to_ell(Ps[li].T)
            self._levels.append(lvl)

        # ---- frequency tables --------------------------------------------
        F_all = len(self.omegas)
        self._coefs_all = np.array(
            [[t.coef(w) for w in self.omegas] for t in terms], complex)
        self._bcoefs_all = np.array(
            [[t.smoothing_coef(w) for w in self.omegas] for t in terms],
            complex)
        L = len(spaces)
        self._lmax_all = np.ones((L, F_all))
        self._aux_lmax_all = np.ones((L, F_all))
        for li in range(L):
            for fi in range(F_all):
                B = sum(self._bcoefs_all[t, fi] * csrs[li][t]
                        for t in range(T))
                self._lmax_all[li, fi] = _lmax_est(B, ess_masks[li])
                if use_aux:
                    Bg = sum(self._bcoefs_all[t, fi] * aux_csrs_all[li][t]
                             for t in range(T))
                    eg = essg_mask if li == 0 else (
                        np.asarray(self._levels[li - 1]["aux_free"]) == 0.0)
                    self._aux_lmax_all[li, fi] = _lmax_est(Bg, eg)

        # ---- coarse complex factorizations per frequency (host) ----------
        from scipy.sparse.linalg import splu

        Lc, essL = csrs[-1], ess_masks[-1]
        self._coarse_lus = []
        for fi in range(F_all):
            A = sum(self._coefs_all[t, fi] * Lc[t] for t in range(T))
            A = A + sp.diags(essL.astype(float))
            self._coarse_lus.append(splu(A.tocsc()))
        self._active_lus: List = []
        import threading

        self._coarse_lock = threading.Lock()
        self._smooth_order = smooth_order
        self._smooth_its = smooth_its
        self._solve_fn = None
        self._device_tables_put = False

    # ------------------------------------------------------------------
    # device placement
    # ------------------------------------------------------------------

    def _put_tables(self):
        if self._device_tables_put:
            return
        put_c = lambda x: jax.device_put(jnp.asarray(x), self._sh_cells)
        put_r = lambda x: jax.device_put(jnp.asarray(x), self._sh_rep)
        f = self._fine
        f["term_ell"] = [(put_c(c), put_c(v), R, C)
                         for (c, v, R, C) in f["term_ell"]]
        f["diags"] = (put_c(f["diags"][0].swapaxes(0, 1)),  # (S, T, max_int)
                      put_r(f["diags"][1]))  # (T, n_ifc)
        f["free"] = (put_c(f["free"][0]), put_r(f["free"][1]))
        if self._aux:
            f["aux_ell"] = [(put_c(c), put_c(v), R, C)
                            for (c, v, R, C) in f["aux_ell"]]
            f["aux_diags"] = (put_c(f["aux_diags"][0].swapaxes(0, 1)),
                              put_r(f["aux_diags"][1]))
            f["aux_free"] = (put_c(f["aux_free"][0]), put_r(f["aux_free"][1]))
            f["G"] = (put_c(f["G"][0]), put_c(f["G"][1]),) + f["G"][2:]
            f["Gt"] = (put_c(f["Gt"][0]), put_c(f["Gt"][1]),) + f["Gt"][2:]
        if "P1" in f:
            f["P1"] = (put_c(f["P1"][0]), put_c(f["P1"][1]),) + f["P1"][2:]
            f["P1t"] = (put_c(f["P1t"][0]), put_c(f["P1t"][1]),) + \
                f["P1t"][2:]
        self._device_tables_put = True

    # ------------------------------------------------------------------
    # sharded applies (shard_map wrappers)
    # ------------------------------------------------------------------

    def _pair_spmv(self, ell, xi, xf, *, n_ifc_out: int):
        """(xi, xf) -> (yi, yf) through one per-shard ELL + interface psum.
        ``ell`` rows are the OUT pair layout, cols the IN pair layout."""
        cols, vals, R, C = ell
        max_int_out = R - n_ifc_out
        mesh = self.jmesh

        def local(cols, vals, xi, xf):
            x = jnp.concatenate([xi[0], xf], axis=0)
            y = jnp.einsum("rk,rkf->rf", vals[0], x[cols[0]])
            return y[:max_int_out][None], jax.lax.psum(y[max_int_out:],
                                                       "cells")

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("cells"), P("cells"), P("cells"), P()),
            out_specs=(P("cells"), P()))(cols, vals, xi, xf)

    def _pair_to_rep(self, ell, xi, xf):
        """(xi, xf) -> replicated (n_out, F) (fine -> coarse restriction)."""
        cols, vals, _, _ = ell
        mesh = self.jmesh

        def local(cols, vals, xi, xf):
            x = jnp.concatenate([xi[0], xf], axis=0)
            y = jnp.einsum("rk,rkf->rf", vals[0], x[cols[0]])
            return jax.lax.psum(y, "cells")

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("cells"), P("cells"), P("cells"), P()),
            out_specs=P())(cols, vals, xi, xf)

    def _rep_to_pair(self, ell, xc, *, n_ifc_out: int):
        """Replicated (n_in, F) -> (yi, yf) (coarse -> fine prolongation)."""
        cols, vals, R, _ = ell
        max_int_out = R - n_ifc_out
        mesh = self.jmesh

        def local(cols, vals, xc):
            y = jnp.einsum("rk,rkf->rf", vals[0], xc[cols[0]])
            return y[:max_int_out][None], jax.lax.psum(y[max_int_out:],
                                                       "cells")

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("cells"), P("cells"), P()),
            out_specs=(P("cells"), P()))(cols, vals, xc)

    def _term_apply(self, which: str, coefs, xi, xf, n_ifc: int):
        """sum_t coefs[t] * X_t @ x on the pair layout."""
        yi = yf = None
        for t, ell in enumerate(self._fine[which]):
            ti, tf = self._pair_spmv(ell, xi, xf, n_ifc_out=n_ifc)
            ti = coefs[t][None, None, :] * ti
            tf = coefs[t][None, :] * tf
            yi = ti if yi is None else yi + ti
            yf = tf if yf is None else yf + tf
        return yi, yf

    # ------------------------------------------------------------------
    # smoothing / V-cycle
    # ------------------------------------------------------------------

    def _pair_dinv(self, diags, free, bcoefs):
        di, df = diags  # (S, T, max_int), (T, n_ifc)
        fi, ff = free
        dB_i = jnp.einsum("tf,stn->snf", bcoefs, di)
        dB_f = jnp.einsum("tf,tn->nf", bcoefs, df)
        dinv_i = jnp.where(jnp.abs(dB_i) > 0, 1.0 / dB_i, 0.0) \
            * fi[..., None]
        dinv_f = jnp.where(jnp.abs(dB_f) > 0, 1.0 / dB_f, 0.0) \
            * ff[..., None]
        return dinv_i, dinv_f

    def _smooth_fine(self, coefs, bcoefs, lmax, aux_lmax, r, z, post):
        f = self._fine
        fi, ff = f["free"]
        n_ifc = self.part.n_ifc

        def freeze(v):
            return (fi[..., None] * v[0], ff[..., None] * v[1])

        def applyc(cs, v):
            vi, vf = freeze(v)
            yi, yf = self._term_apply("term_ell", cs, vi, vf, n_ifc)
            return freeze((yi, yf))

        dinv = self._pair_dinv(f["diags"], f["free"], bcoefs)

        def cheb(applyB, dinv, lam, r):
            di, df = dinv
            d = ((4.0 / (3.0 * lam))[None, None, :] * (di * r[0]),
                 (4.0 / (3.0 * lam))[None, :] * (df * r[1]))
            y = d
            rk = r
            for k in range(1, self._smooth_order):
                Bd = applyB(d)
                rk = (rk[0] - Bd[0], rk[1] - Bd[1])
                sd = (2.0 * k - 1.0) / (2.0 * k + 3.0)
                sr = (8.0 * k + 4.0) / (2.0 * k + 3.0)
                d = (sd * d[0] + sr / lam[None, None, :] * (di * rk[0]),
                     sd * d[1] + sr / lam[None, :] * (df * rk[1]))
                y = (y[0] + d[0], y[1] + d[1])
            return y

        def primary(z):
            if z is None:
                res = r
            else:
                Az = applyc(coefs, z)
                res = (r[0] - Az[0], r[1] - Az[1])
            dz = cheb(lambda v: applyc(bcoefs, v), dinv, lmax, res)
            return dz if z is None else (z[0] + dz[0], z[1] + dz[1])

        def aux(z):
            if not self._aux:
                return z
            afi, aff = f["aux_free"]
            nifc_h1 = self.part_h1.n_ifc
            Az = applyc(coefs, z)
            res = (r[0] - Az[0], r[1] - Az[1])
            rg = self._pair_spmv(f["Gt"], res[0], res[1],
                                 n_ifc_out=nifc_h1)
            rg = (afi[..., None] * rg[0], aff[..., None] * rg[1])

            def applyBg(v):
                vi, vf = afi[..., None] * v[0], aff[..., None] * v[1]
                yi, yf = self._term_apply("aux_ell", bcoefs, vi, vf,
                                          nifc_h1)
                return (afi[..., None] * yi, aff[..., None] * yf)

            dinvg = self._pair_dinv(f["aux_diags"], f["aux_free"], bcoefs)
            zg = cheb(applyBg, dinvg, aux_lmax, rg)
            dz = self._pair_spmv(f["G"], zg[0], zg[1], n_ifc_out=n_ifc)
            return (z[0] + fi[..., None] * dz[0],
                    z[1] + ff[..., None] * dz[1])

        for _ in range(self._smooth_its):
            z = (aux(primary(z)) if not post else primary(aux(z)))
        return z

    def _smooth_rep(self, lvl, coefs, bcoefs, lmax, aux_lmax, r, z, post):
        """Replicated-level smoother (verbatim single-device math)."""
        from palace_tpu.linalg.device_ksp import BlockedDeviceSolver

        return BlockedDeviceSolver._smooth(self, lvl, coefs, bcoefs, lmax,
                                           aux_lmax, r, z, post)

    def _coarse_cb(self, r):
        # pure_callback may run concurrently from several devices' runtime
        # threads (the coarse problem is replicated); scipy's SuperLU solve
        # is not thread-safe on a shared factorization and aborts under
        # concurrent entry — serialize.
        r = np.asarray(r)
        with self._coarse_lock:
            return np.stack([self._active_lus[f].solve(np.ascontiguousarray(
                r[:, f])) for f in range(r.shape[1])], axis=1)

    def _vcycle_rep(self, li, coefs, bcoefs, lmaxs, aux_lmaxs, r):
        """V-cycle over the replicated levels (li >= 1; index into
        self._levels is li-1)."""
        if li == len(self._levels):  # coarsest replicated level
            out = jax.ShapeDtypeStruct(r.shape, r.dtype)
            return jax.pure_callback(self._coarse_cb, out, r)
        lvl = self._levels[li - 1]
        free = lvl["free"][:, None]
        z = self._smooth_rep(lvl, coefs, bcoefs, lmaxs[li], aux_lmaxs[li],
                             r, None, post=False)
        res = r - free * lvl["apply"](coefs, free * z)
        nxt = self._levels[li]
        rc = nxt["free"][:, None] * _ell_apply(nxt["Pt"], res)
        zc = self._vcycle_rep(li + 1, coefs, bcoefs, lmaxs, aux_lmaxs, rc)
        z = z + free * _ell_apply(nxt["P"], zc)
        return self._smooth_rep(lvl, coefs, bcoefs, lmaxs[li], aux_lmaxs[li],
                                r, z, post=True)

    def _vcycle(self, coefs, bcoefs, lmaxs, aux_lmaxs, r):
        """Full V-cycle from the sharded fine level."""
        f = self._fine
        fi, ff = f["free"]
        n_ifc = self.part.n_ifc
        z = self._smooth_fine(coefs, bcoefs, lmaxs[0], aux_lmaxs[0], r,
                              None, post=False)
        if self._levels:
            Az = self._term_apply(
                "term_ell", coefs, fi[..., None] * z[0],
                ff[..., None] * z[1], n_ifc)
            res = (r[0] - fi[..., None] * Az[0],
                   r[1] - ff[..., None] * Az[1])
            l1 = self._levels[0]
            rc = l1["free"][:, None] * self._pair_to_rep(f["P1t"], res[0],
                                                         res[1])
            zc = self._vcycle_rep(1, coefs, bcoefs, lmaxs, aux_lmaxs, rc)
            dz = self._rep_to_pair(f["P1"], zc, n_ifc_out=n_ifc)
            z = (z[0] + fi[..., None] * dz[0], z[1] + ff[..., None] * dz[1])
        else:
            # Single level (order-1 fine space): direct coarse solve on the
            # gathered global vector through the host factorization.
            Az = self._term_apply(
                "term_ell", coefs, fi[..., None] * z[0],
                ff[..., None] * z[1], n_ifc)
            res = (r[0] - fi[..., None] * Az[0],
                   r[1] - ff[..., None] * Az[1])
            rg = self._pair_to_global(res)
            out = jax.ShapeDtypeStruct(rg.shape, rg.dtype)
            zg = jax.pure_callback(self._coarse_cb, out, rg)
            dz = self._global_to_pair(zg)
            z = (z[0] + fi[..., None] * dz[0], z[1] + ff[..., None] * dz[1])
        return self._smooth_fine(coefs, bcoefs, lmaxs[0], aux_lmaxs[0], r,
                                 z, post=True)

    def _pair_to_global(self, v):
        """Jit-level (xi, xf) -> replicated (n, F) via static index tables."""
        part = self.part
        idx = np.where(part.int_valid.reshape(-1),
                       part.int_global.reshape(-1),
                       part.num_dofs)  # parked out-of-range row
        out = jnp.zeros((part.num_dofs + 1,) + v[1].shape[1:], v[1].dtype)
        out = out.at[jnp.asarray(idx)].add(
            v[0].reshape((-1,) + v[0].shape[2:]))
        out = out.at[jnp.asarray(part.ifc_global)].set(v[1])
        return out[:part.num_dofs]

    def _global_to_pair(self, x):
        part = self.part
        xi = jnp.where(jnp.asarray(part.int_valid)[..., None],
                       x[jnp.asarray(np.clip(part.int_global, 0, None))],
                       jnp.zeros((), x.dtype))
        return xi, x[jnp.asarray(part.ifc_global)]

    # ------------------------------------------------------------------
    # FGMRES
    # ------------------------------------------------------------------

    def _build_solve(self):
        self._put_tables()
        m = self.restart
        f = self._fine
        fi_m, ff_m = f["free"]
        n_ifc = self.part.n_ifc
        tol = self.tol
        n_outer = max(1, -(-self.max_its // m))

        def applyA(coefs, u):
            ui = fi_m[..., None] * u[0]
            uf = ff_m[..., None] * u[1]
            yi, yf = self._term_apply("term_ell", coefs, ui, uf, n_ifc)
            return (fi_m[..., None] * yi + (1.0 - fi_m[..., None]) * u[0],
                    ff_m[..., None] * yf + (1.0 - ff_m[..., None]) * u[1])

        def col_dots(a, b):
            return (jnp.einsum("smf,smf->f", jnp.conj(a[0]), b[0])
                    + jnp.einsum("nf,nf->f", jnp.conj(a[1]), b[1]))

        def solve(coefs, bcoefs, lmaxs, aux_lmaxs, bi, bf):
            b = (bi, bf)
            F = bf.shape[-1]
            dt = bf.dtype
            bnorm = jnp.sqrt(jnp.real(col_dots(b, b)))
            bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

            def vel(V, j):
                return (V[0][j], V[1][j])

            def arnoldi_step(carry, j):
                V, Z, H = carry
                z = self._vcycle(coefs, bcoefs, lmaxs, aux_lmaxs, vel(V, j))
                w = applyA(coefs, z)

                def mgs(i, wh):
                    w, hcol = wh
                    hij = jnp.where(i <= j, col_dots(vel(V, i), w),
                                    jnp.zeros(F, dt))
                    vi = vel(V, i)
                    return ((w[0] - hij[None, None, :] * vi[0],
                             w[1] - hij[None, :] * vi[1]),
                            hcol.at[i].set(hij))

                hcol = jnp.zeros((m + 1, F), dt)
                w, hcol = jax.lax.fori_loop(0, m, mgs, (w, hcol))
                hn = jnp.sqrt(jnp.real(col_dots(w, w)))
                hcol = hcol.at[j + 1].set(hn.astype(dt))
                sc = jnp.where(hn > 0, 1.0 / jnp.where(hn > 0, hn, 1.0),
                               1.0).astype(dt)
                V = (V[0].at[j + 1].set(sc[None, None, :] * w[0]),
                     V[1].at[j + 1].set(sc[None, :] * w[1]))
                Z = (Z[0].at[j].set(z[0]), Z[1].at[j].set(z[1]))
                H = H.at[:, j].set(hcol)
                return (V, Z, H), None

            S_, mi = bi.shape[0], bi.shape[1]

            def outer(state):
                x, done, iters, rn, k = state
                Ax = applyA(coefs, x)
                r = (b[0] - Ax[0], b[1] - Ax[1])
                beta = jnp.sqrt(jnp.real(col_dots(r, r)))
                sc = jnp.where(beta > 0, 1.0 / jnp.where(beta > 0, beta,
                                                         1.0), 1.0)
                V = (jnp.zeros((m + 1, S_, mi, F), dt),
                     jnp.zeros((m + 1, n_ifc, F), dt))
                Z = (jnp.zeros((m, S_, mi, F), dt),
                     jnp.zeros((m, n_ifc, F), dt))
                H = jnp.zeros((m + 1, m, F), dt)
                V = (V[0].at[0].set(sc.astype(dt)[None, None, :] * r[0]),
                     V[1].at[0].set(sc.astype(dt)[None, :] * r[1]))
                (V, Z, H), _ = jax.lax.scan(arnoldi_step, (V, Z, H),
                                            jnp.arange(m))
                e1 = jnp.zeros((m + 1, F), dt).at[0].set(beta.astype(dt))
                y = jax.vmap(lambda Hf, ef: jnp.linalg.lstsq(Hf, ef)[0],
                             in_axes=(2, 1), out_axes=1)(H, e1)
                x_new = (x[0] + jnp.einsum("msnf,mf->snf", Z[0], y),
                         x[1] + jnp.einsum("mnf,mf->nf", Z[1], y))
                Axn = applyA(coefs, x_new)
                r_new = (b[0] - Axn[0], b[1] - Axn[1])
                rn_new = jnp.sqrt(jnp.real(col_dots(r_new, r_new)))
                conv = rn_new <= tol * bnorm
                x = (jnp.where(done[None, None, :], x[0], x_new[0]),
                     jnp.where(done[None, :], x[1], x_new[1]))
                rn = jnp.where(done, rn, rn_new)
                iters = iters + jnp.where(done, 0, m)
                return (x, done | conv, iters, rn, k + 1)

            def cond(state):
                _, done, _, _, k = state
                return (~jnp.all(done)) & (k < n_outer)

            x0 = (jnp.zeros_like(bi), jnp.zeros_like(bf))
            state = (x0, jnp.zeros(F, bool), jnp.zeros(F, jnp.int32),
                     jnp.zeros(F), jnp.int32(0))
            x, done, iters, rn, _ = jax.lax.while_loop(cond, outer, state)
            return x[0], x[1], iters, rn / bnorm, done

        return jax.jit(solve)

    def apply_fine(self, coef_vec: np.ndarray, X) -> jnp.ndarray:
        """Global-layout fine apply (for eigensolver residuals)."""
        self._put_tables()
        X = np.asarray(X)
        fi, ff = self._fine["free"]
        xi, xf = scatter_cols(self.part, X)
        xi = jax.device_put(jnp.asarray(xi), self._sh_cells)
        xf = jax.device_put(jnp.asarray(xf), self._sh_rep)
        c = jnp.asarray(np.tile(np.asarray(coef_vec, complex)[:, None],
                                (1, X.shape[1])))
        xi = fi[..., None] * xi
        xf = ff[..., None] * xf
        yi, yf = self._term_apply("term_ell", c, xi, xf, self.part.n_ifc)
        yi = fi[..., None] * yi
        yf = ff[..., None] * yf
        return jnp.asarray(gather_cols(self.part, np.asarray(yi),
                                       np.asarray(yf)))

    def solve(self, rhs: np.ndarray, omega_idx: Optional[np.ndarray] = None
              ) -> Tuple[np.ndarray, Dict]:
        """Same contract as BlockedDeviceSolver.solve."""
        if self._solve_fn is None:
            self._solve_fn = self._build_solve()
        n, F = rhs.shape
        omega_idx = (np.arange(F) if omega_idx is None
                     else np.asarray(omega_idx, int))
        assert len(omega_idx) == F
        Fb = self.max_block
        X = np.empty((n, F), np.complex128)
        info = {"iterations": np.zeros(F, int), "relres": np.zeros(F)}
        for start in range(0, F, Fb):
            idx = np.arange(start, min(start + Fb, F))
            pad = np.concatenate([idx, np.full(Fb - len(idx), idx[-1])])
            om = omega_idx[pad]
            coefs = jnp.asarray(self._coefs_all[:, om])
            bcoefs = jnp.asarray(self._bcoefs_all[:, om])
            lmaxs = jnp.asarray(self._lmax_all[:, om])
            aux_lmaxs = jnp.asarray(self._aux_lmax_all[:, om])
            self._active_lus = [self._coarse_lus[f] for f in om]
            bi, bf = scatter_cols(self.part, rhs[:, pad])
            bi = jax.device_put(jnp.asarray(bi), self._sh_cells)
            bf = jax.device_put(jnp.asarray(bf), self._sh_rep)
            xi, xf, iters, relres, done = self._solve_fn(
                coefs, bcoefs, lmaxs, aux_lmaxs, bi, bf)
            x = gather_cols(self.part, np.asarray(xi), np.asarray(xf))
            X[:, idx] = x[:, :len(idx)]
            info["iterations"][idx] = np.asarray(iters)[:len(idx)]
            info["relres"][idx] = np.asarray(relres)[:len(idx)]
            if not bool(jnp.all(done)):
                bad = [int(pad[q]) for q in range(Fb) if not bool(done[q])]
                self.log(f"  sharded device ksp WARNING: no convergence at "
                         f"sample(s) {bad} "
                         f"(relres {float(jnp.max(relres)):.2e})")
            self.log(f"  sharded device ksp [{self.S} shards]: samples "
                     f"{idx[0] + 1}-{idx[-1] + 1}/{F}: iterations "
                     f"{list(np.asarray(iters)[:len(idx)])}, relres max "
                     f"{float(np.max(np.asarray(relres))):.2e}")
        return X, info
