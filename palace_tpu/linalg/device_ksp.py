"""Device-resident Krylov + p-multigrid stack for the driven/eigen hot loop.

The TPU-native replacement of the reference's FGMRES + GMG + Chebyshev/
Hiptmair production solver (reference: palace/linalg/ksp.cpp:30-229,
gmg.hpp:31-64, distrelaxation.hpp:24-30, chebyshev.hpp:15-22).

Design (TPU-first, not a translation):

* **Term-structured systems.**  Every frequency-domain operator here is
  A(omega) = sum_t c_t(omega) * X_t with all X_t REAL and constant across the
  sweep (K, C, M, Im(M), wave-port/conductivity/ABC boundary masses) and
  c_t(omega) complex scalars (reference: drivensolver.cpp:176-181
  re-assembles A per frequency; we never re-assemble — only the (T,)
  coefficient vector changes).
* **Frequency-blocked Krylov.**  All sweep frequencies are solved
  simultaneously as one (n, F) block through shared gather/scatter tables:
  the per-row dynamic-slice issue cost that bounds unstructured FEM on TPU
  (see PERF_NOTES.md) is amortized over the F columns, so the blocked apply
  runs ~F times cheaper per vector than F sequential applies.
* **p-multigrid V-cycle on device.**  Exactly the reference GMG design
  (spaceoperator.cpp:873-945 builds the complex preconditioner matrix per
  level): smoothing is 4th-kind Chebyshev with complex diagonal scaling on
  the complex level operator B_l(omega) (equal to A_l unless PCMatShifted
  flips the real mass sign), with Hiptmair auxiliary-space
  (discrete-gradient) correction; level operators are Galerkin products
  P^T X_t P of each term (the term structure survives coarsening); the
  coarsest complex problem is solved by host sparse-direct factorizations
  reached through jax.pure_callback (the analog of the reference's SuperLU
  coarse solve, ksp.cpp:161-175).

The whole sweep compiles ONCE: frequency chunks are padded to a fixed block
width and all chunk-varying data (coefficients, lambda_max, right-hand
sides) are arguments of a single jitted solve function.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


# ---------------------------------------------------------------------------
# Term-structured systems
# ---------------------------------------------------------------------------


@dataclass
class Term:
    """One constant real matrix X_t with its frequency coefficient c_t(omega).

    `tables` is the element/boundary (gidx, A) list (orientation signs
    folded); `coef` maps omega -> complex scalar; `bcoef` (optional) maps
    omega -> the coefficient used in the smoothing/preconditioner matrix
    B(omega) when it differs from the system coefficient — e.g. the
    PCMatShifted |Re a2| mass sign flip (reference:
    palace/models/spaceoperator.cpp:762-767, spaceoperator.hpp:49-50)."""

    name: str
    tables: List[Tuple[np.ndarray, np.ndarray]]
    coef: Callable[[float], complex]
    bcoef: Optional[Callable[[float], complex]] = None  # smoothing coef
    _csr: Optional[sp.csr_matrix] = None

    def smoothing_coef(self, w: float) -> complex:
        return self.coef(w) if self.bcoef is None else self.bcoef(w)

    def csr(self, n: int) -> sp.csr_matrix:
        if self._csr is None:
            rows, cols, vals = [], [], []
            for gidx, A in self.tables:
                E, nd = gidx.shape
                rows.append(np.repeat(gidx, nd, axis=1).ravel())
                cols.append(np.tile(gidx, (1, nd)).ravel())
                vals.append(np.real(A).reshape(E, -1).ravel())
            if not rows:
                self._csr = sp.csr_matrix((n, n))
            else:
                self._csr = sp.coo_matrix(
                    (np.concatenate(vals),
                     (np.concatenate(rows), np.concatenate(cols))),
                    shape=(n, n)).tocsr()
        return self._csr


def _csr_to_ell(A: sp.spmatrix) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-padded (cols, vals) tables for a gather+contract device SpMV."""
    A = A.tocsr()
    A.sum_duplicates()
    n = A.shape[0]
    cnt = np.diff(A.indptr)
    k = max(1, int(cnt.max()) if n else 1)
    cols = np.zeros((n, k), np.int32)
    vals = np.zeros((n, k), np.float64)
    rows = np.repeat(np.arange(n), cnt)
    rowpos = np.arange(A.nnz) - np.repeat(A.indptr[:-1], cnt)
    cols[rows, rowpos] = A.indices
    vals[rows, rowpos] = A.data
    return jnp.asarray(cols), jnp.asarray(vals)


def _ell_apply(ell, u):
    """(rows, F) <- ELL SpMV, blocked over columns (row gathers of width F)."""
    cols, vals = ell
    return jnp.einsum("nk,nkf->nf", vals, u[cols])


class ElemTermOperator:
    """Blocked apply y = sum_t coefs[t] * X_t @ u over element (gidx, A)
    tables with one shared sorted-segment-sum scatter (the same machinery as
    ops/partial.py, extended with the term/frequency coefficient axes).

    When the dof numbering is entity-blocked (ops/partial.py
    detect_dof_group), gather/scatter run at g-dof GROUP granularity:
    u is viewed as (N/g, g*F) so each gathered/scattered row carries g
    dofs.  The apply is row-issue bound on TPU (~10 ns per dynamically
    indexed row regardless of width, PERF_NOTES.md), so this cuts the
    dominant cost by the group size (g = p for the ND edge blocks)."""

    def __init__(self, terms: List[Term], num_dofs: int):
        from palace_tpu.ops.partial import Scatter, detect_dof_group

        self.num_dofs = num_dofs
        gidx_list, raw = [], []
        for ti, t in enumerate(terms):
            for gidx, A in t.tables:
                gidx_list.append(gidx)
                raw.append((ti, np.asarray(gidx), np.real(A)))
        self.group = detect_dof_group(gidx_list, num_dofs)
        g = self.group
        self._entries = [(ti, jnp.asarray(gidx[:, ::g] // g if g > 1
                                          else gidx), jnp.asarray(A))
                         for ti, gidx, A in raw]
        sc = Scatter.build([gidx[:, ::g] // g if g > 1 else gidx
                            for _, gidx, _ in raw], num_dofs // g)
        self._perm = jnp.asarray(sc.perm)
        self._seg = jnp.asarray(sc.seg_ids)

    def __call__(self, coefs, u):
        F = u.shape[1]
        g = self.group
        ug = u.reshape(self.num_dofs // g, g * F)
        locals_ = []
        for ti, gidxg, A in self._entries:
            E, ndg = gidxg.shape
            ul = ug[gidxg].reshape(E, ndg * g, F)  # (E, nd, F)
            vl = jnp.einsum("enm,emf->enf", A, ul)
            vl = vl * coefs[ti][None, None, :]
            locals_.append(vl.reshape(E * ndg, g * F))
        flat = jnp.concatenate(locals_, axis=0)
        yg = jax.ops.segment_sum(flat[self._perm], self._seg,
                                 num_segments=self.num_dofs // g,
                                 indices_are_sorted=True)
        return yg.reshape(self.num_dofs, F)


class EllTermOperator:
    """Blocked apply y = sum_t coefs[t] * X_t @ u from per-term ELL tables."""

    def __init__(self, csrs: List[sp.csr_matrix]):
        self._ell = [_csr_to_ell(A) for A in csrs]

    def __call__(self, coefs, u):
        y = jnp.zeros(u.shape, u.dtype)
        for t, ell in enumerate(self._ell):
            y = y + coefs[t][None, :] * _ell_apply(ell, u)
        return y


# ---------------------------------------------------------------------------
# Smoothing
# ---------------------------------------------------------------------------


def _cheb4(applyB, dinv, lmax, r, order):
    """4th-kind Chebyshev smoothing y ~ B^-1 r (Phillips & Fischer 2022;
    reference: palace/linalg/chebyshev.cpp:190-220 Mult2): accumulate
    increments d_k while the residual tracks the accumulated correction."""
    d = (4.0 / (3.0 * lmax))[None, :] * (dinv * r)
    y = d
    rk = r
    for k in range(1, order):
        rk = rk - applyB(d)
        sd = (2.0 * k - 1.0) / (2.0 * k + 3.0)
        sr = (8.0 * k + 4.0) / (2.0 * k + 3.0)
        d = sd * d + sr / lmax[None, :] * (dinv * rk)
        y = y + d
    return y


def mg_orders(p: int, coarsening: str = "Logarithmic", max_levels: int = 100
              ) -> List[int]:
    """Fine-to-coarse order sequence (reference: palace/fem/multigrid.hpp:19-75
    ConstructFECollections, Logarithmic/Linear coarsening)."""
    orders = [p]
    while orders[-1] > 1 and len(orders) < max_levels:
        if coarsening.lower().startswith("lin"):
            orders.append(orders[-1] - 1)
        else:
            orders.append(max(1, orders[-1] // 2))
    return orders


# ---------------------------------------------------------------------------
# The blocked device solver
# ---------------------------------------------------------------------------


class BlockedDeviceSolver:
    """FGMRES + p-MG on device for term systems A(omega) x = b over a block
    of frequencies.  Usable by the driven sweep (many omegas) and by eigen
    shift-and-invert (one fixed sigma, repeated solves)."""

    def __init__(self, space, materials_pec_attrs, terms: List[Term],
                 omegas: Sequence[float], ess_mask: np.ndarray, *,
                 tol: float = 1e-6, max_its: int = 200, restart: int = 30,
                 smooth_order: int = 4, smooth_its: int = 1,
                 use_aux: bool = True, coarsening: str = "Logarithmic",
                 max_levels: int = 100, max_block: int = 8,
                 structured: bool = True,
                 log: Optional[Callable] = None):
        from palace_tpu.fem.h1 import H1Space
        from palace_tpu.fem.nd import NDSpace
        from palace_tpu.fem.nd_operators import nd_h1_gradient
        from palace_tpu.linalg.ndmg import nd_prolongation

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

        orders = mg_orders(space.order, coarsening, max_levels)
        spaces = [space] + [NDSpace(mesh, q) for q in orders[1:]]

        # Per-level term CSRs (Galerkin-coarsened) and essential masks.
        csrs = [[t.csr(n) for t in terms]]
        ess_masks = [np.asarray(ess_mask)]
        Ps: List[Optional[sp.csr_matrix]] = [None]
        for li in range(1, len(spaces)):
            ess = np.zeros(spaces[li].num_dofs, bool)
            if pec:
                ess[spaces[li].boundary_dofs(pec)] = True
            P = nd_prolongation(spaces[li], spaces[li - 1])
            ff = sp.diags((~ess_masks[li - 1]).astype(float))
            fc = sp.diags((~ess).astype(float))
            P = (ff @ P @ fc).tocsr()
            Ps.append(P)
            ess_masks.append(ess)
            csrs.append([(P.T @ X @ P).tocsr() for X in csrs[li - 1]])

        # Structured fast path: on a uniform box hex mesh every term is a
        # stencil and the whole fine level runs in lattice order with NO
        # gathers (ops/structured.py StructuredTermApply).  All fine-level
        # tables (diags, free mask, G, and P's fine rows) are permuted once
        # here; n-ordered vectors convert only at the public solve()/
        # apply_fine() boundary.
        self._fine_perm = None
        st_apply = None
        try:
            from palace_tpu.ops.structured import StructuredTermApply

            if not structured:
                raise ValueError("structured path disabled")
            st_apply = StructuredTermApply.build(space, terms,
                                                 np.asarray(ess_mask))
            if len(spaces) == 1:
                # Coarse LU shares the fine level; keep dof order there.
                raise ValueError("structured: needs >= 2 MG levels")
            self._fine_perm = np.asarray(st_apply.perm)
            self.log("  device ksp: structured (stencil-conv) fine level "
                     f"engaged ({len(self._fine_perm)} lattice dofs)")
        except (ValueError, AssertionError):
            st_apply = None
            self._fine_perm = None

        # Device level data.  Large tables are jax Arrays captured by the
        # jitted solve as stable closure constants (compiled once).
        self._levels = []
        aux_csrs_all = []
        for li, sp_l in enumerate(spaces):
            nl = sp_l.num_dofs
            ess = ess_masks[li]
            if li == 0 and st_apply is not None:
                perm = self._fine_perm
                lvl = {
                    "n": len(perm),
                    "apply": st_apply,
                    "diags": jnp.asarray(np.stack(
                        [X.diagonal()[perm] for X in csrs[li]])),
                    "free": jnp.asarray(
                        (~ess)[perm].astype(np.float64)),
                }
            else:
                lvl = {
                    "n": nl,
                    "apply": (ElemTermOperator(terms, nl) if li == 0
                              else EllTermOperator(csrs[li])),
                    "diags": jnp.asarray(np.stack([X.diagonal()
                                                   for X in csrs[li]])),
                    "free": jnp.asarray((~ess).astype(np.float64)),
                }
            if use_aux:
                h1 = H1Space(mesh, sp_l.order)
                G = nd_h1_gradient(sp_l, h1)
                essg = np.zeros(h1.num_dofs, bool)
                if pec:
                    essg[h1.boundary_dofs(pec)] = True
                Gf = (sp.diags((~ess).astype(float)) @ G
                      @ sp.diags((~essg).astype(float))).tocsr()
                aux = [(Gf.T @ X @ Gf).tocsr() for X in csrs[li]]
                aux_csrs_all.append(aux)
                lvl["aux_apply"] = EllTermOperator(aux)
                lvl["aux_diags"] = jnp.asarray(np.stack([X.diagonal()
                                                         for X in aux]))
                lvl["aux_free"] = jnp.asarray((~essg).astype(np.float64))
                if li == 0 and st_apply is not None:
                    Gf = Gf[self._fine_perm].tocsr()
                lvl["G"] = _csr_to_ell(Gf)
                lvl["Gt"] = _csr_to_ell(Gf.T.tocsr())
            else:
                aux_csrs_all.append(None)
            if li > 0:
                P_li = Ps[li]
                if li == 1 and st_apply is not None:
                    P_li = P_li[self._fine_perm].tocsr()
                lvl["P"] = _csr_to_ell(P_li)
                lvl["Pt"] = _csr_to_ell(P_li.T.tocsr())
            self._levels.append(lvl)

        # Frequency tables: coefficients, lambda_max estimates, and the
        # coarse complex factorization per frequency.  Kept appendable so
        # the adaptive PROM driver can add greedy sample frequencies
        # without rebuilding the solver (`add_omega`).
        L = len(self._levels)
        T = len(terms)
        self._setup_csrs = csrs
        self._setup_aux_csrs = aux_csrs_all
        self._setup_ess_masks = ess_masks
        self._use_aux = use_aux
        self._coefs_all = np.zeros((T, 0), complex)
        self._bcoefs_all = np.zeros((T, 0), complex)
        self._lmax_all = np.ones((L, 0))
        self._aux_lmax_all = np.ones((L, 0))
        self._coarse_lus = []
        init_omegas, self.omegas = self.omegas, []
        for w in init_omegas:
            self.add_omega(w)
        self._active_lus: List = []
        self._smooth_order = smooth_order
        self._smooth_its = smooth_its
        self._use_aux = use_aux
        self._solve_fn = None

    def add_omega(self, w: float) -> int:
        """Register a new sweep frequency; returns its omega_idx.  Computes
        the per-frequency coefficient/lmax columns and the coarse complex
        LU — the jitted solve is frequency-table-driven and needs no
        recompilation (used by the adaptive PROM greedy loop)."""
        from scipy.sparse.linalg import splu

        csrs = self._setup_csrs
        aux_csrs_all = self._setup_aux_csrs
        ess_masks = self._setup_ess_masks
        T = len(self.terms)
        L = len(self._levels)
        coefs = np.array([t.coef(w) for t in self.terms], complex)
        bcoefs = np.array([t.smoothing_coef(w) for t in self.terms],
                          complex)
        lmax = np.ones(L)
        aux_lmax = np.ones(L)
        for li in range(L):
            B = sum(bcoefs[t] * csrs[li][t] for t in range(T))
            lmax[li] = _lmax_est(B, ess_masks[li])
            if self._use_aux:
                Bg = sum(bcoefs[t] * aux_csrs_all[li][t] for t in range(T))
                essg = np.asarray(self._levels[li]["aux_free"]) == 0.0
                aux_lmax[li] = _lmax_est(Bg, essg)
        A = sum(coefs[t] * csrs[-1][t] for t in range(T))
        A = A + sp.diags(ess_masks[-1].astype(float))
        self._coarse_lus.append(splu(A.tocsc()))
        self._coefs_all = np.concatenate(
            [self._coefs_all, coefs[:, None]], axis=1)
        self._bcoefs_all = np.concatenate(
            [self._bcoefs_all, bcoefs[:, None]], axis=1)
        self._lmax_all = np.concatenate(
            [self._lmax_all, lmax[:, None]], axis=1)
        self._aux_lmax_all = np.concatenate(
            [self._aux_lmax_all, aux_lmax[:, None]], axis=1)
        self.omegas.append(float(w))
        return len(self.omegas) - 1

    # -- the jitted chunk solve ---------------------------------------------

    def _coarse_cb(self, r):
        r = np.asarray(r)
        return np.stack([self._active_lus[f].solve(np.ascontiguousarray(
            r[:, f])) for f in range(r.shape[1])], axis=1)

    def _smooth(self, lvl, coefs, bcoefs, lmax, aux_lmax, r, z, post):
        free = lvl["free"][:, None]

        def applyA(u):
            return free * lvl["apply"](coefs, free * u)

        def applyB(u):
            return free * lvl["apply"](bcoefs, free * u)

        dB = jnp.einsum("tf,tn->nf", bcoefs, lvl["diags"])
        dinv = jnp.where(jnp.abs(dB) > 0, 1.0 / dB, 0.0) * free

        def primary(z):
            res = r if z is None else r - applyA(z)
            dz = _cheb4(applyB, dinv, lmax, res, self._smooth_order)
            return dz if z is None else z + dz

        def aux(z):
            if "G" not in lvl:
                return z
            auxfree = lvl["aux_free"][:, None]
            res = r - applyA(z)
            rg = auxfree * _ell_apply(lvl["Gt"], res)

            def applyBg(u):
                return auxfree * lvl["aux_apply"](bcoefs, auxfree * u)

            dg = jnp.einsum("tf,tn->nf", bcoefs, lvl["aux_diags"])
            dginv = jnp.where(jnp.abs(dg) > 0, 1.0 / dg, 0.0) * auxfree
            zg = _cheb4(applyBg, dginv, aux_lmax, rg, self._smooth_order)
            return z + free * _ell_apply(lvl["G"], zg)

        for _ in range(self._smooth_its):
            z = (aux(primary(z)) if not post else primary(aux(z)))
        return z

    def _vcycle(self, li, coefs, bcoefs, lmaxs, aux_lmaxs, r):
        if li == len(self._levels) - 1:
            out = jax.ShapeDtypeStruct(r.shape, r.dtype)
            return jax.pure_callback(self._coarse_cb, out, r)
        lvl = self._levels[li]
        free = lvl["free"][:, None]
        z = self._smooth(lvl, coefs, bcoefs, lmaxs[li], aux_lmaxs[li],
                         r, None, post=False)
        res = r - free * lvl["apply"](coefs, free * z)
        nxt = self._levels[li + 1]
        rc = nxt["free"][:, None] * _ell_apply(nxt["Pt"], res)
        zc = self._vcycle(li + 1, coefs, bcoefs, lmaxs, aux_lmaxs, rc)
        z = z + free * _ell_apply(nxt["P"], zc)
        return self._smooth(lvl, coefs, bcoefs, lmaxs[li], aux_lmaxs[li],
                            r, z, post=True)

    def _build_solve(self):
        m = self.restart
        n = self._levels[0]["n"]
        fine = self._levels[0]
        free = fine["free"][:, None]
        pin = (1.0 - fine["free"])[:, None]
        tol = self.tol
        n_outer = max(1, -(-self.max_its // m))

        def applyA(coefs, u):
            return free * fine["apply"](coefs, free * u) + pin * u

        def col_dots(a, b):
            return jnp.einsum("nf,nf->f", jnp.conj(a), b)

        def solve(coefs, bcoefs, lmaxs, aux_lmaxs, b):
            F = b.shape[1]
            dt = b.dtype
            bnorm = jnp.sqrt(jnp.real(col_dots(b, b)))
            bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

            def arnoldi_step(carry, j):
                V, Z, H = carry
                z = self._vcycle(0, coefs, bcoefs, lmaxs, aux_lmaxs, V[j])
                w = applyA(coefs, z)

                def mgs(i, wh):
                    w, hcol = wh
                    hij = jnp.where(i <= j, col_dots(V[i], w),
                                    jnp.zeros(F, dt))
                    return (w - hij[None, :] * V[i], hcol.at[i].set(hij))

                hcol = jnp.zeros((m + 1, F), dt)
                w, hcol = jax.lax.fori_loop(0, m, mgs, (w, hcol))
                hn = jnp.sqrt(jnp.real(col_dots(w, w)))
                hcol = hcol.at[j + 1].set(hn.astype(dt))
                vnext = jnp.where(hn > 0, w / jnp.where(
                    hn > 0, hn, 1.0).astype(dt), w)
                V = V.at[j + 1].set(vnext)
                Z = Z.at[j].set(z)
                H = H.at[:, j].set(hcol)
                return (V, Z, H), None

            def outer(state):
                x, done, iters, rn, k = state
                r = b - applyA(coefs, x)
                beta = jnp.sqrt(jnp.real(col_dots(r, r)))
                V = jnp.zeros((m + 1, n, F), dt)
                Z = jnp.zeros((m, n, F), dt)
                H = jnp.zeros((m + 1, m, F), dt)
                V = V.at[0].set(jnp.where(beta > 0, r / jnp.where(
                    beta > 0, beta, 1.0).astype(dt), r))
                (V, Z, H), _ = jax.lax.scan(arnoldi_step, (V, Z, H),
                                            jnp.arange(m))
                e1 = jnp.zeros((m + 1, F), dt).at[0].set(beta.astype(dt))
                y = jax.vmap(lambda Hf, ef: jnp.linalg.lstsq(Hf, ef)[0],
                             in_axes=(2, 1), out_axes=1)(H, e1)
                x_new = x + jnp.einsum("mnf,mf->nf", Z, y)
                r_new = b - applyA(coefs, x_new)
                rn_new = jnp.sqrt(jnp.real(col_dots(r_new, r_new)))
                conv = rn_new <= tol * bnorm
                x = jnp.where(done[None, :], x, x_new)
                rn = jnp.where(done, rn, rn_new)
                iters = iters + jnp.where(done, 0, m)
                return (x, done | conv, iters, rn, k + 1)

            def cond(state):
                _, done, _, _, k = state
                return (~jnp.all(done)) & (k < n_outer)

            x0 = jnp.zeros((n, F), dt)
            state = (x0, jnp.zeros(F, bool), jnp.zeros(F, jnp.int32),
                     jnp.zeros(F), jnp.int32(0))
            x, done, iters, rn, _ = jax.lax.while_loop(cond, outer, state)
            return x, iters, rn / bnorm, done

        return jax.jit(solve)

    def apply_fine(self, coef_vec: np.ndarray, X) -> jnp.ndarray:
        """y = (sum_t coef_vec[t] X_t) @ X on the fine level, free-restricted
        (for residual/Rayleigh-Ritz computations by the eigensolver)."""
        fine = self._levels[0]
        free = fine["free"][:, None]
        c = jnp.asarray(np.tile(np.asarray(coef_vec, complex)[:, None],
                                (1, X.shape[1])))
        X = np.asarray(X)
        if self._fine_perm is not None:
            y_l = free * fine["apply"](c, free * jnp.asarray(
                X[self._fine_perm]))
            y = np.zeros(X.shape, np.asarray(y_l).dtype)
            y[self._fine_perm] = np.asarray(y_l)
            return jnp.asarray(y)
        return free * fine["apply"](c, free * jnp.asarray(X))

    def solve(self, rhs: np.ndarray, omega_idx: Optional[np.ndarray] = None
              ) -> Tuple[np.ndarray, Dict]:
        """rhs: (n, F) complex; column f is a right-hand side at
        self.omegas[omega_idx[f]] (default omega_idx = arange: one column
        per sweep frequency).  Returns (X, info)."""
        if self._solve_fn is None:
            self._solve_fn = self._build_solve()
        n, F = rhs.shape
        if self._fine_perm is not None:
            X_l, info = self._solve_lattice(rhs[self._fine_perm], omega_idx)
            X = np.zeros((n, F), X_l.dtype)
            X[self._fine_perm] = X_l
            return X, info
        return self._solve_lattice(rhs, omega_idx)

    def _solve_lattice(self, rhs, omega_idx):
        n, F = rhs.shape
        omega_idx = (np.arange(F) if omega_idx is None
                     else np.asarray(omega_idx, int))
        assert len(omega_idx) == F
        Fb = self.max_block
        X = np.empty((n, F), np.complex128)
        info = {"iterations": np.zeros(F, int), "relres": np.zeros(F)}
        for start in range(0, F, Fb):
            idx = np.arange(start, min(start + Fb, F))
            # Pad the chunk to the fixed block width (repeat last column) so
            # every chunk hits the same compiled executable.
            pad = np.concatenate([idx, np.full(Fb - len(idx), idx[-1])])
            om = omega_idx[pad]
            coefs = jnp.asarray(self._coefs_all[:, om])
            bcoefs = jnp.asarray(self._bcoefs_all[:, om])
            lmaxs = jnp.asarray(self._lmax_all[:, om])
            aux_lmaxs = jnp.asarray(self._aux_lmax_all[:, om])
            self._active_lus = [self._coarse_lus[f] for f in om]
            b = jnp.asarray(rhs[:, pad])
            x, iters, relres, done = self._solve_fn(coefs, bcoefs, lmaxs,
                                                    aux_lmaxs, b)
            X[:, idx] = np.asarray(x)[:, :len(idx)]
            info["iterations"][idx] = np.asarray(iters)[:len(idx)]
            info["relres"][idx] = np.asarray(relres)[:len(idx)]
            if not bool(jnp.all(done)):
                bad = [int(pad[f]) for f in range(Fb) if not bool(done[f])]
                self.log(f"  device ksp WARNING: no convergence at sample(s) "
                         f"{bad} (relres {float(jnp.max(relres)):.2e})")
            self.log(f"  device ksp: samples {idx[0] + 1}-{idx[-1] + 1}"
                     f"/{F}: iterations "
                     f"{list(np.asarray(iters)[:len(idx)])}, relres max "
                     f"{float(np.max(np.asarray(relres))):.2e}")
        return X, info


def _lmax_est(B: sp.spmatrix, ess: np.ndarray, iters: int = 20) -> float:
    """Power-iteration estimate of |lambda|_max(D^-1 B) for real or complex
    B (reference: palace/linalg/operator.hpp:522)."""
    d = B.diagonal().copy()
    d[d == 0] = 1.0
    dinv = 1.0 / d
    dinv[np.asarray(ess, bool)] = 0.0
    rng = np.random.default_rng(3)
    v = rng.standard_normal(B.shape[0]).astype(B.dtype)
    v[np.asarray(ess, bool)] = 0.0
    lam = 1.0
    for _ in range(iters):
        w = dinv * (B @ v)
        w[np.asarray(ess, bool)] = 0.0
        lam = float(np.linalg.norm(w))
        if lam == 0:
            return 1.0
        v = w / lam
    return 1.1 * lam
