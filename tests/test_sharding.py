"""Element-sharded operator apply: shard-count invariance at 1e-12 on the
8-device virtual CPU mesh (the reference tests this property by running the
same cases under 1 and 2 MPI ranks, test/unit/CMakeLists.txt:52-54)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh.mesh import canonicalize_simplices
from palace_tpu.parallel.sharded import (
    ShardedOperator, make_device_mesh, sharded_cg,
)


@pytest.fixture(scope="module")
def nd_setup():
    mesh = box_tet(3, 3, 3)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, 2)
    op = nd_operator(space, curl_coef={1: np.eye(3)}, mass_coef={1: np.eye(3)})
    return space, op


@pytest.mark.parametrize("n_cells", [1, 2, 8])
def test_sharded_matches_single(nd_setup, n_cells):
    space, op = nd_setup
    mesh = make_device_mesh(n_cells=n_cells, n_freq=1)
    sop = ShardedOperator(op, mesh)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal(space.num_dofs))
    np.testing.assert_allclose(
        np.asarray(sop(u)), np.asarray(op(u)), rtol=1e-12, atol=1e-12
    )


def test_sharded_cg_invariance(nd_setup):
    space, op = nd_setup
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(space.num_dofs))
    ess = np.zeros(space.num_dofs, bool)
    ess[space.boundary_dofs([1, 2, 3, 4, 5, 6])] = True
    diag = op.diagonal()
    sols = []
    for n_cells in (1, 4, 8):
        mesh = make_device_mesh(n_cells=n_cells, n_freq=1)
        sop = ShardedOperator(op, mesh)
        x, rn = sharded_cg(sop, b, diag, jnp.asarray(ess), iters=30)
        sols.append(np.asarray(x))
    np.testing.assert_allclose(sols[1], sols[0], rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(sols[2], sols[0], rtol=1e-7, atol=1e-10)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(2)
