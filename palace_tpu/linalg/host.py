"""Host (numpy/scipy) Krylov solvers for the CSR-assembled path.

The jit/jax solvers in linalg/iterative.py are the TPU path; these mirror
them for host-side direct/preconditioned solves where scipy CSR matvecs and
sparse-direct coarse solves dominate (reference: the FGMRES hot loop,
palace/linalg/iterative.cpp:734).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def fgmres_host(
    A: Callable,
    b: np.ndarray,
    M: Optional[Callable] = None,
    *,
    tol: float = 1e-8,
    max_its: int = 200,
    restart: int = 60,
    x0: Optional[np.ndarray] = None,
    callback: Optional[Callable] = None,
) -> Tuple[np.ndarray, int, float]:
    """Right-preconditioned flexible GMRES with MGS. Returns (x, its, relres)."""
    n = b.shape[0]
    dt = b.dtype if np.iscomplexobj(b) else np.float64
    M = M or (lambda v: v)
    x = np.zeros(n, dt) if x0 is None else x0.astype(dt)
    bnorm = np.linalg.norm(b)
    if bnorm == 0:
        return x, 0, 0.0
    its = 0
    while its < max_its:
        r = b - A(x)
        beta = np.linalg.norm(r)
        if beta <= tol * bnorm:
            return x, its, beta / bnorm
        m = min(restart, max_its - its)
        V = np.zeros((m + 1, n), dt)
        Z = np.zeros((m, n), dt)
        H = np.zeros((m + 1, m), dt)
        V[0] = r / beta
        j_done = m
        for j in range(m):
            z = M(V[j])
            w = A(z)
            for i in range(j + 1):
                hij = np.vdot(V[i], w)
                H[i, j] = hij
                w = w - hij * V[i]
            hn = np.linalg.norm(w)
            H[j + 1, j] = hn
            Z[j] = z
            its += 1
            if hn < 1e-14 * beta:
                j_done = j + 1
                break
            V[j + 1] = w / hn
            # Cheap convergence estimate via the least-squares residual.
            e1 = np.zeros(j + 2, dt)
            e1[0] = beta
            y, res, *_ = np.linalg.lstsq(H[: j + 2, : j + 1], e1, rcond=None)
            rn = np.linalg.norm(H[: j + 2, : j + 1] @ y - e1)
            if callback is not None:
                callback(its, rn / bnorm)
            if rn <= tol * bnorm:
                j_done = j + 1
                break
        e1 = np.zeros(j_done + 1, dt)
        e1[0] = beta
        y, *_ = np.linalg.lstsq(H[: j_done + 1, :j_done], e1, rcond=None)
        x = x + Z[:j_done].T @ y
    r = b - A(x)
    return x, its, np.linalg.norm(r) / bnorm


def cg_host(A, b, M=None, *, tol=1e-10, max_its=1000):
    M = M or (lambda v: v)
    x = np.zeros_like(b)
    r = b.copy()
    z = M(r)
    p = z.copy()
    rz = np.vdot(r, z)
    bn = np.linalg.norm(b)
    for k in range(max_its):
        Ap = A(p)
        alpha = rz / np.vdot(p, Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) <= tol * bn:
            return x, k + 1, np.linalg.norm(r) / bn
        z = M(r)
        rz_new = np.vdot(r, z)
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, max_its, np.linalg.norm(r) / bn
