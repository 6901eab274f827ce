"""Structured-mesh H(curl) fast path: the operator as a stencil convolution.

On a uniform box hex mesh with uniform coefficients the assembled curl-curl
+ mass operator is translation invariant, so the apply needs NO gather at
all: dofs live on a per-cell channel lattice u[c, ix, iy, iz] with
C = 3 p^3 channels (three edge-direction families x p^3 intra-cell
positions), and

    y[co, n] = sum_{ci, D in {-1,0,1}^3} W[co, ci, D] u[ci, n + D]

is one `lax.conv_general_dilated` — a dense MXU workload streaming u and y
once from HBM instead of the per-row dynamic-slice gather that bounds the
unstructured path at ~10 ns/row (PERF_NOTES.md "Open ideas" 2; replaces the
E/L-vector gather machinery of reference
palace/fem/libceed/operator.cpp:148-214 for structured regions).

Shared-face dofs: the hex ND local layout (fem/nd_hex.py hex_nd_dofs) puts
cross-axis index p on the next cell's index 0, so each element-local dof is
(cell + delta, channel) with delta in {0,1}^3 — the stencil kernel W is the
element matrix scattered by delta differences.  The top-boundary lattice
planes (no owning cell) must be essential (PEC) dofs; they are represented
by the zero padding of the convolution.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _channel_id(p: int, d: int, i: int, j: int, k: int) -> int:
    return ((d * p + i) * p + j) * p + k


def hex_local_map(p: int):
    """Per local dof: (delta (3,) cell offset, channel id)."""
    from palace_tpu.fem.nd_hex import hex_nd_dofs

    dofs = hex_nd_dofs(p)
    nd = len(dofs)
    deltas = np.zeros((nd, 3), np.int64)
    chan = np.zeros(nd, np.int64)
    for n, (d, i, j, k) in enumerate(dofs):
        o = [a for a in range(3) if a != d]
        jj, kk = j, k
        if j == p:
            deltas[n, o[0]] = 1
            jj = 0
        if k == p:
            deltas[n, o[1]] = 1
            kk = 0
        chan[n] = _channel_id(p, d, i, jj, kk)
    return deltas, chan


@dataclass
class StructuredNDOperator:
    """Stencil-conv apply of an ND operator on a uniform box hex mesh."""

    p: int
    shape: Tuple[int, int, int]  # cells (nx, ny, nz)
    W: jnp.ndarray  # (C, C, 3, 3, 3) stencil kernel
    lat_gdof: np.ndarray  # (C, nx, ny, nz) lattice -> global dof (-1 none)
    ess_lat: jnp.ndarray  # (C, nx, ny, nz) essential-dof mask
    num_dofs: int
    _Af: Optional[jnp.ndarray] = None  # (nd, nd) signed element matrix

    @staticmethod
    def build(space, op, ess_mask: Optional[np.ndarray] = None,
              dtype=jnp.float32) -> "StructuredNDOperator":
        """From a hex NDSpace + element-mode PAOperator on a uniform grid.

        Requires: single hex bucket on a full uniform grid with identical
        element matrices and signs (uniform geometry/coefficients) — all
        verified here.
        """
        mesh = space.mesh
        assert len(mesh.buckets) == 1, "structured path: single hex bucket"
        b = op.buckets[0]
        A = np.asarray(b.A)
        E = A.shape[0]
        # Uniform grid: infer (nx, ny, nz) from element centroid lattice.
        cents = mesh.nodes[mesh.buckets[0].conn].mean(axis=1)
        uniq = [np.unique(np.round(cents[:, a], 9)) for a in range(3)]
        nx, ny, nz = (len(u) for u in uniq)
        assert nx * ny * nz == E, "not a full box grid"
        # Cell coordinates from centroid ranks (element order irrelevant).
        ex = np.searchsorted(uniq[0], np.round(cents[:, 0], 9))
        ey = np.searchsorted(uniq[1], np.round(cents[:, 1], 9))
        ez = np.searchsorted(uniq[2], np.round(cents[:, 2], 9))
        # Translation invariance.
        assert np.abs(A - A[0]).max() <= 1e-12 * np.abs(A[0]).max(), \
            "element matrices not uniform (geometry or coefficient varies)"
        sg = b.signs
        if sg is not None:
            sg = np.asarray(sg)
            assert (sg == sg[0]).all(), "orientation signs not uniform"
            Af = A[0] * sg[0][:, None] * sg[0][None, :]
        else:
            Af = A[0]

        p = space.order
        C = 3 * p ** 3
        deltas, chan = hex_local_map(p)
        W = np.zeros((C, C, 3, 3, 3))
        nd = len(chan)
        for a in range(nd):
            for bb in range(nd):
                off = deltas[bb] - deltas[a] + 1
                W[chan[a], chan[bb], off[0], off[1], off[2]] += Af[a, bb]

        # Lattice -> global dof map (top boundary planes unowned -> -1).
        gdofs = np.asarray(space.elem_dofs[0])  # (E, nd)
        lat = np.full((C, nx, ny, nz), -1, np.int64)
        cells = np.stack([ex, ey, ez], axis=1)
        tgt = cells[:, None, :] + deltas[None, :, :]  # (E, nd, 3)
        inside = ((tgt[..., 0] < nx) & (tgt[..., 1] < ny)
                  & (tgt[..., 2] < nz))
        ei, ni = np.nonzero(inside)
        lat[chan[ni], tgt[ei, ni, 0], tgt[ei, ni, 1], tgt[ei, ni, 2]] = \
            gdofs[ei, ni]
        # Every interior lattice slot assigned; unowned dofs (top planes)
        # must be essential.
        assert (lat >= 0).all(), "unassigned lattice slot"
        covered = np.zeros(space.num_dofs, bool)
        covered[lat.ravel()] = True
        if ess_mask is None:
            ess_mask = np.zeros(space.num_dofs, bool)
        if not covered[~np.asarray(ess_mask, bool)].all():
            raise ValueError(
                "structured path requires the unowned top-boundary dofs to "
                "be essential (PEC box)")
        ess_lat = np.asarray(ess_mask, bool)[lat]
        return StructuredNDOperator(p, (nx, ny, nz), jnp.asarray(W, dtype),
                                    lat, jnp.asarray(ess_lat),
                                    space.num_dofs,
                                    jnp.asarray(Af, dtype))

    @staticmethod
    def build_uniform(p: int, shape: Tuple[int, int, int], h: float,
                      dtype=jnp.float32, curl: float = 1.0,
                      mass: float = 0.0) -> "StructuredNDOperator":
        """Direct constructor for a uniform PEC box grid — no full mesh/space.

        On a uniform grid every element matrix is the single scaled
        reference-cell matrix, and the PEC essential pattern on the lattice
        is analytic, so an (nx, ny, nz) operator builds in O(nd^2) host work
        instead of the O(E nd^2) full-space assembly that `build` requires
        (the r2 bench timed out in exactly that setup).  Validated against
        `build` on a real mesh in tests/test_structured.py.
        """
        import jax.numpy as jnp_

        from palace_tpu.fem.nd import NDSpace
        from palace_tpu.fem.nd_operators import nd_operator
        from palace_tpu.mesh.generate import box_hex

        mesh1 = box_hex(1, 1, 1, lx=h, ly=h, lz=h)
        space1 = NDSpace(mesh1, p)
        eye = {1: np.eye(3)}
        op1 = nd_operator(space1, curl_coef={1: curl * np.eye(3)},
                          mass_coef=({1: mass * np.eye(3)} if mass else None),
                          dtype=jnp_.float64)
        b = op1.buckets[0]
        Af = np.asarray(b.A)[0]
        if b.signs is not None:
            s = np.asarray(b.signs)[0]
            Af = Af * s[:, None] * s[None, :]

        nx, ny, nz = shape
        C = 3 * p ** 3
        deltas, chan = hex_local_map(p)
        W = np.zeros((C, C, 3, 3, 3))
        nd = len(chan)
        for a in range(nd):
            for bb in range(nd):
                off = deltas[bb] - deltas[a] + 1
                W[chan[a], chan[bb], off[0], off[1], off[2]] += Af[a, bb]

        ess_lat = pec_ess_lat(p, shape)
        # True dof count of the full ND space (incl. the PEC top planes not
        # represented on the lattice): per direction d, (n_d p) edges along
        # d times (n_o p + 1) cross planes.
        npx, npy, npz = nx * p, ny * p, nz * p
        num_dofs = (npx * (npy + 1) * (npz + 1)
                    + (npx + 1) * npy * (npz + 1)
                    + (npx + 1) * (npy + 1) * npz)
        lat_gdof = np.arange(C * nx * ny * nz,
                             dtype=np.int64).reshape(C, nx, ny, nz)
        return StructuredNDOperator(p, shape, jnp.asarray(W, dtype),
                                    lat_gdof, jnp.asarray(ess_lat),
                                    num_dofs, jnp.asarray(Af, dtype))

    # -- vector layout ------------------------------------------------------

    def to_lattice(self, u: np.ndarray) -> np.ndarray:
        """Global (num_dofs,) or (num_dofs, B) -> (B, C, nx, ny, nz)."""
        u = np.asarray(u)
        if u.ndim == 1:
            u = u[:, None]
        lat = u[self.lat_gdof.ravel()].T.reshape(
            (u.shape[1], ) + self.lat_gdof.shape)
        return lat

    def from_lattice(self, lat: np.ndarray) -> np.ndarray:
        """(B, C, nx, ny, nz) -> (num_dofs, B) (unowned dofs get 0)."""
        lat = np.asarray(lat)
        B = lat.shape[0]
        out = np.zeros((self.num_dofs, B), lat.dtype)
        out[self.lat_gdof.ravel()] = lat.reshape(B, -1).T
        return out

    def __call__(self, lat):
        """Apply on lattice layout (B, C, nx, ny, nz), PEC-masked."""
        return _structured_apply(self.W, lat, self.ess_lat)


    def sliced_apply(self, lat):
        """Gather-free element apply on the lattice layout.

        Builds the E-vector by nd shifted slices of the (top-padded)
        lattice, runs ONE dense (nd x nd) MXU matmul over all elements and
        batch columns, and folds back with nd static slice-adds — the same
        arithmetic as the unstructured batched element apply but with every
        index operation replaced by a contiguous copy at streaming speed
        (the stencil conv above spends ~15x the FLOPs on the mostly-zero
        (C, C, 27) kernel; this path keeps the element matmul's minimal
        2 nd^2 FLOPs/element)."""
        if self._Af is None:
            raise ValueError("build with keep_element_matrix=True")
        deltas, chan = hex_local_map(self.p)
        return _sliced_apply(self._Af, lat, self.ess_lat,
                             tuple(map(tuple, deltas)), tuple(chan))


class StructuredTermApply:
    """Fine-level term apply for `BlockedDeviceSolver` on a uniform box hex
    mesh: every term's element table collapses to a (C, C, 3, 3, 3) stencil
    and the apply y = sum_t coefs[t] * X_t u is one convolution per term —
    no gather/scatter at all when the solver keeps its fine-level vectors in
    lattice order (the `perm` attribute; see device_ksp.py wiring).

    Replaces the gather-bound `ElemTermOperator` (~10 ns/row dynamic-slice
    floor, PERF_NOTES.md) with an MXU-bound stencil (reference analogue:
    the libCEED tensor-product fast path, palace/fem/libceed/operator.cpp:
    148-214, which similarly specializes the apply by element geometry).
    """

    def __init__(self, Ws, ess_lat, perm, shape):
        self.Ws = Ws  # per-term (C, C, 3, 3, 3)
        self.ess_lat = ess_lat  # (C, nx, ny, nz) bool
        self.perm = perm  # (L,) lattice-order dof ids (L = C nx ny nz)
        self.shape = shape

    @staticmethod
    def build(space, terms, ess_mask) -> "StructuredTermApply":
        """Raises ValueError/AssertionError unless every term is a single
        uniform domain element table on a single-hex-bucket box grid (the
        checks live in StructuredNDOperator.build)."""
        from types import SimpleNamespace

        if len(space.mesh.buckets) != 1:
            raise ValueError("structured: single-bucket mesh required")
        gd = np.asarray(space.elem_dofs[0])
        ops = []
        for t in terms:
            if len(t.tables) != 1:
                raise ValueError(f"term {t.name}: needs one domain table")
            gidx, A = t.tables[0]
            if np.asarray(gidx).shape != gd.shape or \
                    not np.array_equal(np.asarray(gidx), gd):
                raise ValueError(f"term {t.name}: not the domain table")
            fake = SimpleNamespace(buckets=[SimpleNamespace(
                A=np.real(np.asarray(A)), signs=None)])
            # Full-precision stencil; __call__ casts to the input dtype.
            ops.append(StructuredNDOperator.build(space, fake, ess_mask,
                                                  dtype=jnp.float64))
        st0 = ops[0]
        return StructuredTermApply(
            [op.W for op in ops], st0.ess_lat,
            st0.lat_gdof.ravel(), st0.shape)

    def __call__(self, coefs, u):
        """u: (L, F) in lattice order (complex or real); coefs: (T, F)."""
        nx, ny, nz = self.shape
        C = self.Ws[0].shape[0]
        F = u.shape[1]
        lat = u.T.reshape(F, C, nx, ny, nz)
        cplx = jnp.iscomplexobj(lat)
        if cplx:
            real = jnp.concatenate([jnp.real(lat), jnp.imag(lat)], axis=0)
        else:
            real = lat
        y = jnp.zeros(u.shape, u.dtype)
        for t, W in enumerate(self.Ws):
            v = _structured_apply(W.astype(real.dtype), real, self.ess_lat)
            if cplx:
                v = v[:F] + 1j * v[F:]
            y = y + coefs[t][None, :] * v.reshape(F, -1).T
        return y


def pec_ess_lat(p: int, shape: Tuple[int, int, int]) -> np.ndarray:
    """Analytic PEC (all-faces essential) mask on the dof lattice.

    A d-family dof with intra-cell cross indices (j, k) lies exactly on a
    domain boundary plane iff its cross coordinate is 0 (low faces; the high
    faces' dofs are the unowned top lattice planes, excluded from the
    lattice entirely), i.e. j == 0 in a cell with cross-cell index 0.
    Cross-checked against `build`'s mesh-derived mask in
    tests/test_structured.py.
    """
    nx, ny, nz = shape
    C = 3 * p ** 3
    ess = np.zeros((C, nx, ny, nz), bool)
    for d in range(3):
        o = [a for a in range(3) if a != d]
        for i in range(p):
            for j in range(p):
                for k in range(p):
                    c = _channel_id(p, d, i, j, k)
                    if j == 0:
                        sl = [slice(None)] * 3
                        sl[o[0]] = 0
                        ess[(c, *sl)] = True
                    if k == 0:
                        sl = [slice(None)] * 3
                        sl[o[1]] = 0
                        ess[(c, *sl)] = True
    return ess


@functools.partial(jax.jit, static_argnames=("deltas", "chan"))
def _sliced_apply(Af, lat, ess, deltas, chan):
    B = lat.shape[0]
    nx, ny, nz = lat.shape[2:]
    free = jnp.where(ess[None], 0, lat)
    pad = jnp.pad(free, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 1)))
    nd = len(chan)
    ul = jnp.stack([
        pad[:, chan[n], d[0]:d[0] + nx, d[1]:d[1] + ny, d[2]:d[2] + nz]
        for n, d in enumerate(deltas)], axis=1)  # (B, nd, nx, ny, nz)
    vl = jnp.einsum("ab,Bbxyz->Baxyz", Af, ul,
                    preferred_element_type=(jnp.float32
                                            if Af.dtype == jnp.bfloat16
                                            else None))
    if vl.dtype != lat.dtype:
        vl = vl.astype(lat.dtype)
    C = lat.shape[1]
    ypad = jnp.zeros((B, C, nx + 1, ny + 1, nz + 1), lat.dtype)
    for n, d in enumerate(deltas):
        ypad = ypad.at[:, chan[n], d[0]:d[0] + nx, d[1]:d[1] + ny,
                       d[2]:d[2] + nz].add(vl[:, n])
    y = ypad[:, :, :nx, :ny, :nz]
    return jnp.where(ess[None], 0, y)


@jax.jit
def _structured_apply(W, lat, ess):
    free = jnp.where(ess[None], 0, lat)
    C = W.shape[0]
    y = jax.lax.conv_general_dilated(
        free, W,
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NCXYZ", "OIXYZ", "NCXYZ"),
        preferred_element_type=(jnp.float32 if W.dtype == jnp.bfloat16
                                else None),
    )
    if y.dtype != lat.dtype:
        y = y.astype(lat.dtype)
    return jnp.where(ess[None], 0, y)
