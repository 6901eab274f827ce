"""p-multigrid preconditioner with Chebyshev smoothing and a sparse-direct
coarse solve.

The TPU-native replacement for the reference solver's GMG + AMG stack
(reference: palace/linalg/gmg.hpp:31-64, palace/linalg/chebyshev.hpp): the
hierarchy coarsens polynomial order on the same mesh ("Logarithmic"
coarsening, reference: palace/utils/configfile.hpp MGCoarsenType), smooths
with 4th-kind Chebyshev, and solves the p=1 problem with a host LU
factorization reached through `jax.pure_callback` (the analog of the
gathered direct coarse solve).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from palace_tpu.fem import reference as ref
from palace_tpu.linalg.smoothers import chebyshev_smoother, power_iteration_max_eig


def mg_levels(p: int) -> List[int]:
    """Logarithmic order coarsening: 1, 2, 4, ..., p."""
    if p <= 1:
        return [1]
    lv = [1]
    while lv[-1] * 2 < p:
        lv.append(lv[-1] * 2)
    lv.append(p)
    return lv


class H1Prolongation:
    """Interpolation between nested-order H1 spaces on the same mesh."""

    def __init__(self, coarse, fine):
        assert coarse.mesh is fine.mesh
        self.coarse = coarse
        self.fine = fine
        self.P_local: List[jnp.ndarray] = []
        for b in fine.mesh.buckets:
            cb = coarse.basis(b.geom)
            fn = ref.fem_nodes(b.geom, fine.order)
            self.P_local.append(jnp.asarray(cb.eval(fn)))  # (nd_f, nd_c)
        # Multiplicity of each fine dof (number of contributing elements).
        mult = np.zeros(fine.num_dofs)
        for ed in fine.elem_dofs:
            np.add.at(mult, np.asarray(ed).ravel(), 1.0)
        self.inv_mult = jnp.asarray(1.0 / np.maximum(mult, 1.0))
        self._fine_dofs = [jnp.asarray(ed) for ed in fine.elem_dofs]
        self._coarse_dofs = [jnp.asarray(ed) for ed in coarse.elem_dofs]

    def prolong(self, uc):
        uf = jnp.zeros(self.fine.num_dofs, uc.dtype)
        for P, fd, cd in zip(self.P_local, self._fine_dofs, self._coarse_dofs):
            vals = uc[cd] @ P.T.astype(uc.dtype)  # (E, nd_f)
            uf = uf.at[fd.reshape(-1)].set(vals.reshape(-1))
        return uf

    def restrict(self, rf):
        """Exact transpose of prolong (multiplicity-weighted scatter-add)."""
        rw = rf * self.inv_mult.astype(rf.dtype)
        rc = jnp.zeros(self.coarse.num_dofs, rf.dtype)
        for P, fd, cd in zip(self.P_local, self._fine_dofs, self._coarse_dofs):
            vals = rw[fd] @ P.astype(rf.dtype)  # (E, nd_c)
            rc = rc.at[cd.reshape(-1)].add(vals.reshape(-1))
        return rc


def coarse_direct_solver(csr, ess_dofs: np.ndarray) -> Callable:
    """LU factorization of an (eliminated) sparse matrix on host, exposed as
    a jit-compatible callback."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = csr.tolil()
    if len(ess_dofs):
        A[ess_dofs, :] = 0.0
        A[:, ess_dofs] = 0.0
        A[ess_dofs, ess_dofs] = 1.0
    A = A.tocsc()
    lu = spla.splu(A)
    n = A.shape[0]
    is_complex = np.iscomplexobj(csr.data)
    out_dtype = np.complex128 if is_complex else np.float64

    def host_solve(r):
        return lu.solve(np.asarray(r, out_dtype))

    def apply(r):
        return jax.pure_callback(
            host_solve,
            jax.ShapeDtypeStruct((n,), out_dtype),
            r,
            vmap_method="sequential",
        )

    return apply


@dataclass
class MGLevel:
    op: Callable  # eliminated operator at this level
    smoother: Callable
    prolongation: Optional[H1Prolongation]  # to the next-finer level (None at coarsest)
    ess_mask: jnp.ndarray


class PMGPreconditioner:
    """V-cycle over order-coarsened levels; level 0 solved directly."""

    def __init__(self, levels: List[MGLevel], coarse_solve: Callable,
                 cycle_its: int = 1):
        self.levels = levels  # ordered coarse -> fine
        self.coarse_solve = coarse_solve
        self.cycle_its = cycle_its

    def _vcycle(self, lvl: int, r):
        if lvl == 0:
            x = self.coarse_solve(r.astype(jnp.result_type(r)))
            return jnp.where(self.levels[0].ess_mask, 0.0, x).astype(r.dtype)
        L = self.levels[lvl]
        r = jnp.where(L.ess_mask, 0.0, r)
        x = L.smoother(r)
        resid = r - L.op(x)
        resid = jnp.where(L.ess_mask, 0.0, resid)
        rc = L.prolongation.restrict(resid)
        rc = jnp.where(self.levels[lvl - 1].ess_mask, 0.0, rc)
        xc = self._vcycle(lvl - 1, rc)
        x = x + L.prolongation.prolong(xc)
        # Post-smooth (symmetric V-cycle).
        resid = r - L.op(x)
        resid = jnp.where(L.ess_mask, 0.0, resid)
        x = x + L.smoother(resid)
        return x

    def __call__(self, r):
        return self._vcycle(len(self.levels) - 1, r)


def build_h1_pmg(
    iodata,
    mesh,
    space_at_order: Callable,
    operator_at: Callable,
    ess_dofs_at: Callable,
    *,
    smooth_order: int = 4,
    dtype=jnp.float64,
):
    """Construct a p-MG preconditioner for an H1 problem.

    space_at_order(p) -> H1Space; operator_at(space) -> PAOperator;
    ess_dofs_at(space) -> essential dof ids.
    """
    from palace_tpu.ops.partial import EliminatedOperator, make_ess_mask

    p = iodata.solver.order
    orders = mg_levels(p)
    spaces = [space_at_order(q) for q in orders]
    ops = [operator_at(s) for s in spaces]
    masks = [
        jnp.asarray(make_ess_mask(s.num_dofs, ess_dofs_at(s))) for s in spaces
    ]
    eops = [EliminatedOperator(o, m) for o, m in zip(ops, masks)]

    levels: List[MGLevel] = []
    for i, (s, o, m, eo) in enumerate(zip(spaces, ops, masks, eops)):
        if i == 0:
            levels.append(MGLevel(eo, lambda r: r, None, m))
            continue
        diag = o.diagonal()
        diag = jnp.where(m, 1.0, diag)
        lmax = float(
            power_iteration_max_eig(
                eo, 1.0 / jnp.where(diag != 0, diag, 1.0), s.num_dofs,
                dtype=dtype,
            )
        )
        sm = chebyshev_smoother(eo, diag, 1.01 * lmax, order=smooth_order,
                                ess_mask=m)
        prol = H1Prolongation(spaces[i - 1], s)
        levels.append(MGLevel(eo, sm, prol, m))

    coarse_csr = ops[0].assemble_csr()
    coarse = coarse_direct_solver(coarse_csr, np.asarray(ess_dofs_at(spaces[0])))
    return PMGPreconditioner(levels, coarse), spaces, ops, masks
