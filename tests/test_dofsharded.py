"""Dof-sharded multi-chip layer: partition quality, apply invariance vs the
single-device operator, memory proportionality, and a full sharded CG solve
matching the host path at 1e-12 (reference: palace/linalg/rap.hpp:18-39
true-dof partition + halo exchange; utils/geodata.hpp:69-79 METIS)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from palace_tpu.fem.h1 import H1Space
from palace_tpu.fem.operators import h1_operator
from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh.mesh import canonicalize_simplices
from palace_tpu.parallel import dofsharded as ds


def _h1_problem(n=5, order=2):
    mesh = box_tet(n, n, n)
    canonicalize_simplices(mesh)
    space = H1Space(mesh, order)
    K = h1_operator(space, diffusion_coef={1: np.eye(3)})
    ess = np.zeros(space.num_dofs, bool)
    ess[space.boundary_dofs([1, 2, 3, 4, 5, 6])] = True
    return mesh, space, K, ess


def _nd_problem(n=4, order=2):
    mesh = box_tet(n, n, n)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, order)
    eye = {1: np.eye(3)}
    K = nd_operator(space, curl_coef=eye)
    M = nd_operator(space, mass_coef=eye)
    ess = np.zeros(space.num_dofs, bool)
    ess[space.boundary_dofs([1, 2, 3, 4, 5, 6])] = True
    return mesh, space, K, M, ess


@pytest.mark.parametrize("n_shards", [2, 8])
def test_apply_matches_host(n_shards):
    mesh, space, K, ess = _h1_problem()
    part = ds.partition_for_space(space, n_shards)
    dmesh = ds.make_cells_mesh(n_shards)
    shop = ds.shard_pa_operator(K, part, dmesh)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(space.num_dofs)
    xi, xf = shop.put_vector(*part.scatter_vector(x))
    yi, yf = shop.apply(jnp.ones((1,)), xi, xf)
    y = part.gather_vector(np.asarray(yi), np.asarray(yf))
    y_ref = np.asarray(K(jnp.asarray(x)))
    assert np.abs(y - y_ref).max() < 1e-12 * np.abs(y_ref).max()


def test_nd_signs_apply_matches_host():
    mesh, space, K, M, ess = _nd_problem()
    part = ds.partition_for_space(space, 8)
    dmesh = ds.make_cells_mesh(8)
    # Two-term operator: K + c*M through one shared partition.
    t1 = part.shard_term([np.asarray(b.gidx) for b in K.buckets],
                         [np.asarray(b.A) for b in K.buckets],
                         [np.asarray(b.signs) if b.signs is not None else None
                          for b in K.buckets])
    t2 = part.shard_term([np.asarray(b.gidx) for b in M.buckets],
                         [np.asarray(b.A) for b in M.buckets],
                         [np.asarray(b.signs) if b.signs is not None else None
                          for b in M.buckets])
    shop = ds.DofShardedOperator(part, [t1, t2], dmesh).device_put_tables()
    rng = np.random.default_rng(1)
    x = rng.standard_normal(space.num_dofs)
    c = np.array([1.0, 3.5])
    xi, xf = shop.put_vector(*part.scatter_vector(x))
    yi, yf = shop.apply(jnp.asarray(c), xi, xf)
    y = part.gather_vector(np.asarray(yi), np.asarray(yf))
    y_ref = np.asarray(K(jnp.asarray(x))) + 3.5 * np.asarray(M(jnp.asarray(x)))
    assert np.abs(y - y_ref).max() < 1e-12 * np.abs(y_ref).max()


def test_partition_memory_scales():
    """Per-shard footprint ~ N/S + interface surface; the interface stays a
    small fraction of the dofs (locality of the Morton order)."""
    mesh, space, K, ess = _h1_problem(n=8, order=2)
    N = space.num_dofs
    part = ds.partition_for_space(space, 8)
    # Balanced interior blocks: max_int within 35% of N/S.
    assert part.max_int < 1.35 * N / 8
    # Interface is a surface, not a volume.
    assert part.n_ifc < 0.30 * N
    # Every dof is exactly once interior-or-interface.
    assert part.int_valid.sum() + part.n_ifc == N
    ids = np.concatenate([part.int_global[part.int_valid], part.ifc_global])
    assert len(np.unique(ids)) == N
    # Element tables shard the element axis: per-shard count ~ E/S.
    E = sum(len(s) for s in part.shard_of)
    emax = max(int(np.bincount(s, minlength=8).max()) for s in part.shard_of)
    assert emax < 1.25 * E / 8


def test_driver_shard_invariance(tmp_path, monkeypatch):
    """Full electrostatic driver solve: the 8-device dof-sharded CG and the
    single-device host path give identical capacitance matrices (1e-12)."""
    import json
    import os

    from palace_tpu.api import run
    from palace_tpu.mesh import gmsh_write

    mesh = box_tet(4, 4, 4)
    gmsh_write.write(mesh, str(tmp_path / "box.msh"))
    cfg = {
        "Problem": {"Type": "Electrostatic", "Verbose": 0,
                    "Output": "postpro"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [
            {"Attributes": [1], "Permeability": 1.0, "Permittivity": 2.0}]},
        "Boundaries": {
            "Ground": {"Attributes": [2]},
            "Terminal": [{"Index": 1, "Attributes": [1]}],
        },
        "Solver": {"Order": 2, "Device": "CPU",
                   "Electrostatic": {"Save": 0},
                   "Linear": {"Tol": 1e-13, "MaxIts": 2000}},
    }
    path = tmp_path / "case.json"
    path.write_text(json.dumps(cfg))

    caps = {}
    for tag, flag in (("sharded", "1"), ("host", "0")):
        monkeypatch.setenv("PALACE_TPU_MULTICHIP", flag)
        res = run(str(path), output_dir=str(tmp_path / f"out_{tag}"))
        cmat = open(tmp_path / f"out_{tag}" / "terminal-C.csv").read()
        caps[tag] = cmat
    v_sh = [float(x) for x in caps["sharded"].splitlines()[1].split(",")[1:]]
    v_ho = [float(x) for x in caps["host"].splitlines()[1].split(",")[1:]]
    np.testing.assert_allclose(v_sh, v_ho, rtol=1e-11)


def test_sharded_cg_matches_host_solve():
    """Full production CG through the dof-sharded path reproduces the host
    CG solution at 1e-12 and per-device interior blocks are disjoint."""
    from palace_tpu.linalg.iterative import cg
    from palace_tpu.linalg.smoothers import jacobi
    from palace_tpu.ops.partial import EliminatedOperator

    mesh, space, K, ess = _h1_problem(n=5, order=2)
    rng = np.random.default_rng(2)
    b = np.where(ess, 0.0, rng.standard_normal(space.num_dofs))

    part = ds.partition_for_space(space, 8)
    x, its, relres, _ = ds.solve_spd_sharded(
        K, b, ess, part=part, mesh=ds.make_cells_mesh(8), tol=1e-13,
        max_its=2000)

    Keli = EliminatedOperator(K, ess)
    M = jacobi(K.diagonal(), jnp.asarray(ess))
    res = cg(Keli, jnp.asarray(b), M=M, tol=1e-13, max_its=2000)
    x_ref = np.asarray(res.x)
    scale = np.abs(x_ref).max()
    assert relres < 1e-12
    assert np.abs(x - x_ref).max() < 1e-10 * scale
    assert its > 5
