"""SPMD element-sharded operator application over a TPU device mesh.

The TPU-native replacement for the reference solver's MPI domain
decomposition (reference: palace/linalg/rap.hpp:18-39, utils/geodata.hpp:69-79):
instead of METIS partitions + halo exchange through the prolongation P, the
element axis of every bucket is sharded over a 1-D ``"cells"`` mesh axis and
shared-dof assembly is a single ``psum`` over ICI.  Dof vectors are kept
replicated across the axis; each device computes the partial scatter-add of
its own element range and the psum completes the T-vector.  Krylov dots and
norms then need no extra collectives (vectors are replicated), so a CG/FGMRES
iteration costs exactly one psum on ICI.

A second mesh axis ("freq") batches independent frequency-domain solves of a
driven sweep (reference: palace/drivers/drivensolver.cpp:154-225 frequency
loop, which is embarrassingly parallel across omega) via vmap over the batch
axis sharded on "freq".
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_cells: Optional[int] = None, n_freq: int = 1,
                     devices=None) -> Mesh:
    """1- or 2-axis device mesh ("cells", "freq")."""
    devices = devices if devices is not None else jax.devices()
    if n_cells is None:
        n_cells = len(devices) // n_freq
    dev = np.asarray(devices[: n_cells * n_freq]).reshape(n_cells, n_freq)
    return Mesh(dev, ("cells", "freq"))


def _pad_rows(a: np.ndarray, rows: int, fill=0) -> np.ndarray:
    if a.shape[0] == rows:
        return a
    pad = np.full((rows - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


class ShardedOperator:
    """Element-sharded matrix-free operator from a PAOperator's tables.

    Element matrices and gather indices are sharded on the "cells" axis;
    padded rows have zero element matrices (and gather index 0), so they
    contribute nothing to the scatter-add.  The apply is

        u (replicated) -> per-device gather -> batched element matmul
        -> per-device scatter-add into a full-length vector -> psum("cells")

    and is jit-compatible (call inside jit with the mesh's sharding in
    scope, or use :meth:`jit_apply`).
    """

    def __init__(self, op, mesh: Mesh, dtype=None):
        self.num_dofs = op.num_dofs
        self.mesh = mesh
        n = mesh.shape["cells"]
        self._tables = []
        for b in op.buckets:
            A = np.asarray(b.A)
            gidx = np.asarray(b.gidx)
            E = A.shape[0]
            Epad = ((E + n - 1) // n) * n
            A = _pad_rows(A, Epad)
            if dtype is not None:
                A = A.astype(dtype)
            gidx = _pad_rows(gidx, Epad)
            signs = None
            if b.signs is not None:
                signs = _pad_rows(np.asarray(b.signs), Epad)
            sh = NamedSharding(mesh, P("cells"))
            t = {
                "A": jax.device_put(jnp.asarray(A), sh),
                "gidx": jax.device_put(jnp.asarray(gidx), sh),
            }
            if signs is not None:
                t["signs"] = jax.device_put(jnp.asarray(signs), sh)
            self._tables.append(t)
        self._apply = functools.partial(
            _sharded_apply, mesh=self.mesh, num_dofs=self.num_dofs
        )

    def __call__(self, u):
        return self._apply(self._tables, u)


@functools.partial(jax.jit, static_argnames=("mesh", "num_dofs"))
def _sharded_apply(tables, u, *, mesh, num_dofs):
    in_specs = ([{k: P("cells") for k in t} for t in tables], P())
    f = jax.shard_map(
        functools.partial(_apply_local, num_dofs=num_dofs),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
    )
    return f(tables, u)


def _apply_local(tables, u, *, num_dofs):
    y = jnp.zeros(num_dofs, u.dtype)
    for t in tables:
        ul = u[t["gidx"]]
        if "signs" in t:
            ul = ul * t["signs"]
        vl = jnp.einsum("enm,em->en", t["A"], ul)
        if "signs" in t:
            vl = vl * t["signs"]
        y = y.at[t["gidx"].reshape(-1)].add(vl.reshape(-1))
    return jax.lax.psum(y, "cells")


def sharded_cg(op: ShardedOperator, b, diag, ess_mask, *, iters: int = 25):
    """Fixed-iteration Jacobi-preconditioned CG on the sharded operator with
    essential-dof elimination, jit-compatible (lax.fori_loop body).

    Used by the multi-chip dry run and scaling benchmarks; the production
    drivers use the adaptive-tolerance solvers in linalg.iterative with this
    operator plugged in as A.
    """
    dinv = jnp.where(ess_mask | (diag == 0), 0.0, 1.0 / jnp.where(diag == 0, 1.0, diag))

    def A(u):
        free = jnp.where(ess_mask, 0.0, u)
        y = op(free)
        return jnp.where(ess_mask, u, y)

    def M(r):
        return jnp.where(ess_mask, r, dinv * r)

    def body(_, state):
        x, r, z, p, rz = state
        Ap = A(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new)

    b = jnp.where(ess_mask, 0.0, b)
    r0 = b
    z0 = M(r0)
    x0 = jnp.zeros_like(b)
    state = (x0, r0, z0, z0, jnp.vdot(r0, z0))
    x, r, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x, jnp.linalg.norm(r)
