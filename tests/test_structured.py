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
