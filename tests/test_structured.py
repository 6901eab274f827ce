"""Structured-mesh stencil-conv H(curl) apply vs the unstructured gather
path (ops/structured.py; PERF_NOTES.md idea 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.mesh.generate import box_hex
from palace_tpu.ops.structured import StructuredNDOperator


@pytest.mark.parametrize("p", [1, 2, 3])
def test_structured_apply_matches_unstructured(p):
    mesh = box_hex(4, 3, 5, lx=1.0, ly=0.8, lz=1.3)
    space = NDSpace(mesh, p)
    eye = {1: np.eye(3)}
    op = nd_operator(space, curl_coef=eye, mass_coef={1: 2.0 * np.eye(3)},
                     dtype=jnp.float64)
    ess = np.zeros(space.num_dofs, bool)
    ess[space.boundary_dofs([1, 2, 3, 4, 5, 6])] = True

    sop = StructuredNDOperator.build(space, op, ess, dtype=jnp.float64)
    assert sop.W.shape[0] == 3 * p ** 3

    rng = np.random.default_rng(0)
    u = np.where(ess[:, None], 0.0, rng.standard_normal((space.num_dofs, 3)))
    lat = jnp.asarray(sop.to_lattice(u))
    y = np.asarray(sop(lat))
    y_glob = sop.from_lattice(y)

    y_ref = np.stack([np.asarray(op(jnp.asarray(u[:, i])))
                      for i in range(3)], axis=1)
    y_ref[ess] = 0.0
    scale = np.abs(y_ref).max()
    assert np.abs(y_glob - y_ref).max() < 1e-11 * scale

    # Sliced (gather-free element matmul) variant matches too.
    y2 = sop.from_lattice(np.asarray(sop.sliced_apply(lat)))
    assert np.abs(y2 - y_ref).max() < 1e-11 * scale


def test_structured_rejects_nonuniform():
    mesh = box_hex(3, 3, 3)
    mesh.nodes[0] += 0.01  # perturb geometry
    space = NDSpace(mesh, 2)
    op = nd_operator(space, curl_coef={1: np.eye(3)}, dtype=jnp.float64)
    with pytest.raises(AssertionError):
        StructuredNDOperator.build(space, op)


@pytest.mark.parametrize("p", [2, 3])
def test_build_uniform_matches_build(p):
    """The direct constructor (single reference-cell matrix + analytic PEC
    mask; the bench setup path) reproduces the mesh-derived build exactly."""
    n = 3
    mesh = box_hex(n, n, n)
    space = NDSpace(mesh, p)
    op = nd_operator(space, curl_coef={1: np.eye(3)}, dtype=jnp.float64)
    ess = np.zeros(space.num_dofs, bool)
    ess[space.boundary_dofs([1, 2, 3, 4, 5, 6])] = True
    sop = StructuredNDOperator.build(space, op, ess, dtype=jnp.float64)
    su = StructuredNDOperator.build_uniform(p, (n, n, n), 1.0 / n,
                                            dtype=jnp.float64)
    assert su.num_dofs == space.num_dofs
    assert np.abs(np.asarray(sop.W) - np.asarray(su.W)).max() < 1e-13
    assert (np.asarray(sop.ess_lat) == np.asarray(su.ess_lat)).all()
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((2,) + sop.lat_gdof.shape))
    assert np.abs(np.asarray(sop(lat)) - np.asarray(su(lat))).max() < 1e-12


def test_device_solver_structured_fine_level():
    """BlockedDeviceSolver auto-engages the stencil fine level on a uniform
    PEC hex box and matches the unstructured solver to solver tolerance —
    the production wiring of the structured fast path (device_ksp.py)."""
    from palace_tpu.linalg.device_ksp import BlockedDeviceSolver, Term

    mesh = box_hex(4, 4, 4)
    space = NDSpace(mesh, 2)
    eye = {1: np.eye(3)}
    Kop = nd_operator(space, curl_coef=eye, dtype=jnp.float64)
    Mop = nd_operator(space, mass_coef=eye, dtype=jnp.float64)
    ess = np.zeros(space.num_dofs, bool)
    ess[space.boundary_dofs([1, 2, 3, 4, 5, 6])] = True

    def tables(op):
        return [(np.asarray(b.gidx), np.asarray(b.A)) for b in op.buckets]

    def make_terms():
        return [Term("K", tables(Kop), coef=lambda w: 1.0 + 0.0j),
                Term("M", tables(Mop), coef=lambda w: -complex(w) ** 2)]

    omegas = [3.0]
    rng = np.random.default_rng(7)
    b = rng.standard_normal((space.num_dofs, 1)) \
        + 1j * rng.standard_normal((space.num_dofs, 1))
    b[ess] = 0.0

    st = BlockedDeviceSolver(space, [1, 2, 3, 4, 5, 6], make_terms(),
                             omegas, ess, tol=1e-10)
    assert st._fine_perm is not None, "structured fine level did not engage"
    Xs, _ = st.solve(b)

    un = BlockedDeviceSolver(space, [1, 2, 3, 4, 5, 6], make_terms(),
                             omegas, ess, tol=1e-10, structured=False)
    assert un._fine_perm is None
    Xu, _ = un.solve(b)

    # Two independent Krylov solves at tol 1e-10 on an indefinite system
    # agree only to ~tol * cond; assert each residual directly instead.
    coefs = np.array([1.0, -omegas[0] ** 2], complex)
    bn = np.linalg.norm(b)
    for X in (Xs, Xu):
        r = np.asarray(un.apply_fine(coefs, X)) - b
        r[ess] = 0.0
        assert np.linalg.norm(r) < 1e-9 * bn

    # The applies themselves agree to roundoff in dof order.
    Y1 = np.asarray(st.apply_fine(coefs, Xu))
    Y2 = np.asarray(un.apply_fine(coefs, Xu))
    assert np.abs(Y1 - Y2).max() < 1e-10 * np.abs(Y2).max()
