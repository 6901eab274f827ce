"""Pallas TPU kernel for the structured-mesh H(curl) apply.

The uniform-box hex ND operator is translation invariant (ops/structured.py):
with dofs on a per-cell channel lattice u[c, x, y, z] (C = 3 p^3 channels),
the apply is, per cell n and element-local dofs (a, b),

    y[chan_a, n + delta_a] += Af[a, b] * u[chan_b, n + delta_b]

with delta in {0, 1}^3 (shared-face dofs owned by the next cell).  Key
observation: on the FLATTENED padded lattice (C, (nx+1)(ny+1)(nz+1)) a
shift by delta is a constant flat offset, so "u at (chan_b, n + delta_b)
for all cells n" is ONE contiguous slice u_flat[chan_b, off_b : off_b + L].
Pad-plane columns (x = nx etc.) are not real cells; a per-column mask kills
their contributions.

The kernel therefore does, entirely in VMEM per batch column:
  1. gather: nd static row-slices  ul[n, :] = u_flat[chan_n, off_n:off_n+L]
  2. one (nd, nd) x (nd, L) MXU matmul (the minimal 2 nd^2 FLOPs/cell —
     the stencil-conv formulation carries ~8.5x padded FLOPs),
  3. mask, and nd static row-slice accumulations back into y_flat.

HBM traffic is exactly read-u + write-y (plus the once-per-grid Af), i.e.
the streaming lower bound; the 10 ns/row dynamic-slice issue cost that
bounds the unstructured gather path (PERF_NOTES.md) never appears because
every index is a compile-time constant.

Replaces the XLA `sliced_apply`, whose 144 `.at[].add` folds each copy the
whole HBM accumulator (measured 10x slower than its own roofline).
Reference analog: palace/fem/libceed/operator.cpp:148-214 (E-vector
gather/scatter apply), re-specialized for lattice-structured regions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flat_tables(p: int, shape: Tuple[int, int, int]):
    """Static tables: per local dof the (channel, flat offset), plus the
    real-cell column mask and layout sizes."""
    from palace_tpu.ops.structured import hex_local_map

    nx, ny, nz = shape
    sx, sy, sz = (ny + 1) * (nz + 1), nz + 1, 1
    deltas, chan = hex_local_map(p)
    offs = deltas[:, 0] * sx + deltas[:, 1] * sy + deltas[:, 2] * sz
    # Columns [0, L0) cover all cells (plus interleaved pad-plane columns).
    L0 = (nx - 1) * sx + (ny - 1) * sy + (nz - 1) + 1
    Lp = _round_up(L0, 128)
    Lu = _round_up(Lp + int(offs.max()), 128) + 128
    m = np.arange(Lp)
    x, r = np.divmod(m, sx)
    y, z = np.divmod(r, sy)
    mask = ((m < L0) & (x < nx) & (y < ny) & (z < nz)).astype(np.float32)
    return chan, offs, mask, L0, Lp, Lu, (sx, sy, sz)


def _class_tables(p: int, shape: Tuple[int, int, int]):
    """Carry-class-ordered tables for the block-copy kernel.

    Per edge family d the channels (d, i, j, k) fall into four carry
    classes by (j == 0, k == 0): A = (0,0), B = (0,>0), C = (>0,0),
    D = (>0,>0).  Ordering channels [A, B, C, D] per family makes every
    delta-group's channel set a union of <= 2 CONTIGUOUS ranges:

        delta (0,0): A+B+C+D (1 slice)   delta (1,0): A+B (1 slice)
        delta (0,1): A, C    (2 slices)  delta (1,1): A   (1 slice)

    so the E-vector gather (and the transposed scatter) is ~15 strided 2D
    block copies instead of nd single-row copies — full sublane
    utilization on the VPU.  Returns (perm_c channel permutation,
    perm_l local-dof permutation, Af row/col permuted accordingly is the
    caller's job, slices = [(row0, nrows, chan0, flat_offset)], sizes).
    """
    from palace_tpu.ops.structured import hex_local_map

    nx, ny, nz = shape
    sx, sy = (ny + 1) * (nz + 1), nz + 1
    deltas, chan = hex_local_map(p)
    C = 3 * p ** 3

    # Channel class order per family: A, B, C, D.
    def chan_key(c):
        d, r = divmod(c, p ** 3)
        i, r2 = divmod(r, p * p)
        j, k = divmod(r2, p)
        cls = 0 if (j == 0 and k == 0) else (1 if j == 0 else
                                             (2 if k == 0 else 3))
        return (d, cls, i, j, k)

    perm_c = np.asarray(sorted(range(C), key=chan_key), np.int64)
    rank_c = np.empty(C, np.int64)
    rank_c[perm_c] = np.arange(C)

    # Local dofs ordered by (family, delta group, new channel rank).
    def loc_key(n):
        d = chan[n] // p ** 3
        dj = tuple(deltas[n])
        return (d, dj, rank_c[chan[n]])

    perm_l = np.asarray(sorted(range(len(chan)), key=loc_key), np.int64)

    # Contiguous (row-range, channel-range, offset) slices.
    slices = []
    r = 0
    while r < len(perm_l):
        n = perm_l[r]
        off = int(deltas[n, 0] * sx + deltas[n, 1] * sy + deltas[n, 2])
        c0 = int(rank_c[chan[n]])
        ln = 1
        while (r + ln < len(perm_l)):
            n2 = perm_l[r + ln]
            off2 = int(deltas[n2, 0] * sx + deltas[n2, 1] * sy
                       + deltas[n2, 2])
            if off2 != off or int(rank_c[chan[n2]]) != c0 + ln:
                break
            ln += 1
        slices.append((r, ln, c0, off))
        r += ln
    return perm_c, perm_l, slices


def _kernel_v2(Lp, slices, mm_chunks, Af_ref, u_ref, mask_ref, y_ref,
               ul_ref):
    # Gather: block copies of contiguous channel ranges (rows in sublanes).
    for (r0, nr, c0, off) in slices:
        ul_ref[r0:r0 + nr, :] = u_ref[0, c0:c0 + nr, off:off + Lp]
    y_ref[...] = jnp.zeros_like(y_ref)
    mask = mask_ref[0, :]
    # Matmul chunked by output slice group + scatter block copies.
    for (r0s, chunk) in mm_chunks:
        nrows = sum(nr for (_, nr, _, _) in chunk)
        vl = jnp.dot(Af_ref[r0s:r0s + nrows, :], ul_ref[...],
                     preferred_element_type=jnp.float32)
        vl = (vl * mask[None, :]).astype(y_ref.dtype)
        for (r0, nr, c0, off) in chunk:
            y_ref[0, c0:c0 + nr, off:off + Lp] += vl[r0 - r0s:r0 - r0s + nr,
                                                     :]


@functools.partial(jax.jit, static_argnames=("p", "shape", "interpret"))
def structured_apply_flat_v2(Af_perm, u_flat_perm, *, p: int,
                             shape: Tuple[int, int, int],
                             interpret: bool = False):
    """Block-copy kernel: expects channel-permuted inputs (see
    `_class_tables` / `apply_permuted` for the wrapper that permutes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, offs, mask, L0, Lp, Lu, _ = _flat_tables(p, shape)
    _, _, slices = _class_tables(p, shape)
    B, C, Lu_in = u_flat_perm.shape
    assert Lu_in == Lu, (Lu_in, Lu)
    nd = Af_perm.shape[0]
    # Chunk the matmul by groups of consecutive output slices (~32 rows).
    mm_chunks = []
    cur, cur_rows = [], 0
    for s in slices:
        cur.append(s)
        cur_rows += s[1]
        if cur_rows >= 32:
            mm_chunks.append((cur[0][0], tuple(cur)))
            cur, cur_rows = [], 0
    if cur:
        mm_chunks.append((cur[0][0], tuple(cur)))
    mask = jnp.asarray(mask[None, :], u_flat_perm.dtype)

    kern = functools.partial(_kernel_v2, Lp, tuple(slices),
                             tuple(mm_chunks))
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((nd, nd), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Lu), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, Lu), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Lu), u_flat_perm.dtype),
        scratch_shapes=[pltpu.VMEM((nd, Lp), u_flat_perm.dtype)],
        interpret=interpret,
    )(Af_perm, u_flat_perm, mask)


def v2_tables(sop):
    """(Af_perm, perm_c) for the v2 kernel from a StructuredNDOperator."""
    from palace_tpu.ops.structured import hex_local_map

    perm_c, perm_l, _ = _class_tables(sop.p, sop.shape)
    Af = np.asarray(sop._Af)
    Af_perm = Af[np.ix_(perm_l, perm_l)]
    return jnp.asarray(Af_perm, sop._Af.dtype), perm_c


def structured_apply_lattice_v2(sop, lat, *, interpret: bool = False):
    """Masked lattice apply through the v2 block-copy kernel."""
    Af_perm, perm_c = v2_tables(sop)
    ess = sop.ess_lat
    free = jnp.where(ess[None], 0, lat)
    u_flat = to_flat(free[:, perm_c], sop.p, sop.shape)
    y_flat = structured_apply_flat_v2(Af_perm.astype(lat.dtype), u_flat,
                                      p=sop.p, shape=sop.shape,
                                      interpret=interpret)
    y = from_flat(y_flat, sop.p, sop.shape)
    inv = np.argsort(perm_c)
    return jnp.where(ess[None], 0, y[:, inv])


def _kernel(nd, C, Lp, Lu, chan, offs, row_chunk, Af_ref, u_ref, mask_ref,
            y_ref, ul_ref):
    # 1. gather the E-vector: nd static row-slices (VMEM copies).
    for n in range(nd):
        ul_ref[n, :] = u_ref[0, chan[n], offs[n]:offs[n] + Lp]
    # 3. zero the output block (accumulated into below).
    y_ref[...] = jnp.zeros_like(y_ref)
    mask = mask_ref[0, :]
    # 2. chunked matmul + masked scatter-back.
    for r0 in range(0, nd, row_chunk):
        r1 = min(r0 + row_chunk, nd)
        vl = jnp.dot(Af_ref[r0:r1, :], ul_ref[...],
                     preferred_element_type=jnp.float32)
        vl = (vl * mask[None, :]).astype(y_ref.dtype)
        for n in range(r0, r1):
            y_ref[0, chan[n], offs[n]:offs[n] + Lp] += vl[n - r0, :]


@functools.partial(jax.jit, static_argnames=("p", "shape", "interpret"))
def structured_apply_flat(Af, u_flat, *, p: int,
                          shape: Tuple[int, int, int],
                          interpret: bool = False):
    """y_flat = A @ u_flat on the flattened padded lattice.

    Af: (nd, nd) signed element matrix; u_flat: (B, C, Lu) with
    Lu = flat_layout(p, shape).Lu (see `to_flat`).  Essential-dof masking is
    the caller's business (pre/post multiply), matching
    StructuredNDOperator.__call__'s free-masking convention.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    chan, offs, mask, L0, Lp, Lu, _ = _flat_tables(p, shape)
    B, C, Lu_in = u_flat.shape
    assert Lu_in == Lu, (Lu_in, Lu)
    nd = Af.shape[0]
    row_chunk = 48 if Af.dtype == jnp.float32 else 96
    mask = jnp.asarray(mask[None, :], u_flat.dtype)

    kern = functools.partial(_kernel, nd, C, Lp, Lu, tuple(int(c) for c in chan),
                             tuple(int(o) for o in offs), row_chunk)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((nd, nd), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, Lu), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, Lu), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Lu), u_flat.dtype),
        scratch_shapes=[pltpu.VMEM((nd, Lp), u_flat.dtype)],
        interpret=interpret,
    )(Af, u_flat, mask)


# ---------------------------------------------------------------------------
# Lattice <-> flat layout helpers (XLA level)
# ---------------------------------------------------------------------------


def to_flat(lat, p: int, shape: Tuple[int, int, int]):
    """(B, C, nx, ny, nz) lattice -> (B, C, Lu) flat padded layout."""
    nx, ny, nz = shape
    _, _, _, _, _, Lu, _ = _flat_tables(p, shape)
    pad = jnp.pad(lat, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 1)))
    B, C = lat.shape[:2]
    flat = pad.reshape(B, C, (nx + 1) * (ny + 1) * (nz + 1))
    return jnp.pad(flat, ((0, 0), (0, 0), (0, Lu - flat.shape[2])))


def from_flat(flat, p: int, shape: Tuple[int, int, int]):
    """(B, C, Lu) flat padded layout -> (B, C, nx, ny, nz) lattice."""
    nx, ny, nz = shape
    B, C = flat.shape[:2]
    full = (nx + 1) * (ny + 1) * (nz + 1)
    pad = flat[:, :, :full].reshape(B, C, nx + 1, ny + 1, nz + 1)
    return pad[:, :, :nx, :ny, :nz]


def structured_apply_lattice(sop, lat, *, interpret: bool = False):
    """Drop-in masked apply on the (B, C, nx, ny, nz) lattice layout through
    the pallas flat kernel (same contract as StructuredNDOperator.__call__).
    """
    ess = sop.ess_lat
    free = jnp.where(ess[None], 0, lat)
    u_flat = to_flat(free, sop.p, sop.shape)
    y_flat = structured_apply_flat(sop._Af.astype(lat.dtype), u_flat,
                                   p=sop.p, shape=sop.shape,
                                   interpret=interpret)
    y = from_flat(y_flat, sop.p, sop.shape)
    return jnp.where(ess[None], 0, y)
