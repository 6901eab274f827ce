"""Preconditioners and smoothers (reference: palace/linalg/{jacobi,chebyshev}.hpp).

Matrix-free: only the operator diagonal is assembled.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def jacobi(diag: jnp.ndarray, ess_mask=None) -> Callable:
    """Inverse-diagonal preconditioner (reference: palace/linalg/jacobi.hpp:15)."""
    safe = jnp.where(diag != 0, diag, 1.0)
    dinv = 1.0 / safe
    if ess_mask is not None:
        dinv = jnp.where(ess_mask, 1.0, dinv)

    def apply(r):
        return dinv * r

    return apply


def power_iteration_max_eig(A: Callable, dinv: jnp.ndarray, n: int, iters: int = 20,
                            key=None, dtype=jnp.float64) -> jnp.ndarray:
    """Largest eigenvalue estimate of D^-1 A by power iteration
    (reference: palace/linalg/operator.hpp:522)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n,), dtype)

    def body(_, v):
        w = dinv * A(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = dinv * A(v)
    return jnp.vdot(v, w).real / jnp.vdot(v, v).real


def chebyshev_smoother(
    A: Callable,
    diag: jnp.ndarray,
    lmax: float,
    order: int = 4,
    fourth_kind: bool = True,
    ess_mask=None,
) -> Callable:
    """Chebyshev polynomial smoother on D^-1 A.

    4th-kind variant per Phillips & Fischer 2022 (reference:
    palace/linalg/chebyshev.hpp:15-22): optimal smoothing of the upper
    spectrum with no lower eigenvalue estimate needed.
    """
    safe = jnp.where(diag != 0, diag, 1.0)
    dinv = 1.0 / safe
    if ess_mask is not None:
        dinv = jnp.where(ess_mask, 0.0, dinv)

    if fourth_kind:
        def apply(r):
            # z_k accumulates the smoothed correction.
            z = (4.0 / (3.0 * lmax)) * (dinv * r)
            for k in range(2, order + 1):
                rk = r - A(z)
                z = ((2.0 * k - 3.0) / (2.0 * k + 1.0)) * z + (
                    (8.0 * k - 4.0) / ((2.0 * k + 1.0) * lmax)
                ) * (dinv * rk)
            return z

        return apply

    # 1st-kind Chebyshev on [lmax/theta_frac, lmax]
    lmin = 0.1 * lmax

    def apply1(r):
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho = 1.0 / sigma
        z = (dinv * r) / theta
        d = z
        for _ in range(order - 1):
            rk = r - A(z)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (dinv * rk)
            z = z + d
            rho = rho_new
        return z

    return apply1
