"""Matrix-free Krylov solvers (reference: palace/linalg/iterative.hpp:119-222).

All solvers are jit-compatible (`lax.while_loop` bodies, static shapes) and
work for real or complex dtypes.  Inner products are global reductions; on a
sharded mesh these become `psum` over ICI automatically because the vectors
are jax arrays with shardings attached.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def _vdot(a, b):
    return jnp.vdot(a, b)


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    relres: jnp.ndarray
    converged: jnp.ndarray


def cg(
    A: Callable,
    b: jnp.ndarray,
    *,
    M: Optional[Callable] = None,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-8,
    max_its: int = 1000,
) -> SolveResult:
    """Preconditioned conjugate gradient (M SPD, A SPD)."""
    M = M or (lambda v: v)
    x0 = x0 if x0 is not None else jnp.zeros_like(b)

    r0 = b - A(x0)
    z0 = M(r0)
    rz0 = _vdot(r0, z0)
    bnorm = jnp.sqrt(jnp.real(_vdot(b, b)))
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(state):
        x, r, z, p, rz, k = state
        rn = jnp.sqrt(jnp.real(_vdot(r, r)))
        return (rn > tol * bnorm) & (k < max_its)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        alpha = rz / _vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    state = (x0, r0, z0, z0, rz0, jnp.int32(0))
    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, state)
    relres = jnp.sqrt(jnp.real(_vdot(r, r))) / bnorm
    return SolveResult(x, k, relres, relres <= tol)


def fgmres(
    A: Callable,
    b: jnp.ndarray,
    *,
    M: Optional[Callable] = None,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-8,
    max_its: int = 200,
    restart: int = 60,
) -> SolveResult:
    """Flexible GMRES with right preconditioning and MGS orthogonalization.

    Static Krylov dimension = `restart`; outer restarts until max_its.
    Works for real and complex operators (the hot path for driven solves,
    reference: palace/linalg/iterative.cpp:734).
    """
    M = M or (lambda v: v)
    x = x0 if x0 is not None else jnp.zeros_like(b)
    n = b.shape[0]
    dt = b.dtype
    m = restart

    bnorm = jnp.sqrt(jnp.real(_vdot(b, b)))
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    n_outer = max(1, -(-max_its // m))

    def arnoldi_step(carry, j):
        V, Z, H, ok = carry
        v = V[j]
        z = M(v)
        w = A(z)
        # Modified Gram-Schmidt against all previous (masked beyond j).
        def mgs(i, wh):
            w, hcol = wh
            hij = jnp.where(i <= j, _vdot(V[i], w), 0.0 * _vdot(V[i], w))
            w = w - hij * V[i]
            hcol = hcol.at[i].set(hij)
            return (w, hcol)

        hcol = jnp.zeros(m + 1, dt)
        w, hcol = jax.lax.fori_loop(0, m, mgs, (w, hcol))
        hnorm = jnp.sqrt(jnp.real(_vdot(w, w)))
        hcol = hcol.at[j + 1].set(hnorm.astype(dt))
        vnext = jnp.where(hnorm > 0, w / hnorm.astype(dt), w)
        V = V.at[j + 1].set(vnext)
        Z = Z.at[j].set(z)
        H = H.at[:, j].set(hcol)
        return (V, Z, H, ok), None

    def outer(carry, _):
        x, total_k, done = carry
        r = b - A(x)
        beta = jnp.sqrt(jnp.real(_vdot(r, r)))
        V = jnp.zeros((m + 1, n), dt)
        Z = jnp.zeros((m, n), dt)
        H = jnp.zeros((m + 1, m), dt)
        V = V.at[0].set(jnp.where(beta > 0, r / beta.astype(dt), r))
        (V, Z, H, _), _ = jax.lax.scan(
            arnoldi_step, (V, Z, H, True), jnp.arange(m)
        )
        # Solve least squares min || beta e1 - H y ||.
        e1 = jnp.zeros(m + 1, dt).at[0].set(beta.astype(dt))
        y = jnp.linalg.lstsq(H, e1)[0]
        x_new = x + Z.T @ y
        r_new = b - A(x_new)
        rn = jnp.sqrt(jnp.real(_vdot(r_new, r_new)))
        conv = rn <= tol * bnorm
        x = jnp.where(done, x, x_new)
        total_k = total_k + jnp.where(done, 0, m)
        return (x, total_k, done | conv), rn

    (x, k, done), _ = jax.lax.scan(
        outer, (x, jnp.int32(0), jnp.bool_(False)), None, length=n_outer
    )
    r = b - A(x)
    relres = jnp.sqrt(jnp.real(_vdot(r, r))) / bnorm
    return SolveResult(x, k, relres, relres <= tol)
