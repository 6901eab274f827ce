"""Multi-chip complex driven solves (linalg/device_ksp_sharded.py): the
dof-sharded FGMRES + p-MG path over an 8-virtual-device "cells" mesh must
reproduce the single-device device solver and the host sparse-direct sweep
(reference distributed analog: palace/linalg/rap.hpp:124 ComplexParOperator;
shard-count invariance is the analog of the reference's MPI-size-invariance
regression testing)."""

import json
import math
import os

import jax
import numpy as np
import pytest

from palace_tpu.config import IoData, ValueType
from palace_tpu.drivers.common import prepare_mesh
from palace_tpu.drivers.driven import driven_samples_ghz, sweep_uniform_direct
from palace_tpu.models.spaceoperator import SpaceOperator

from tests.test_device_ksp import _tem_case

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs a multi-device (virtual CPU) mesh")


def _setup(tmp_path, **kw):
    iodata = _tem_case(tmp_path, **kw)
    mesh = prepare_mesh(iodata)
    sop = SpaceOperator(iodata, mesh)
    freqs = driven_samples_ghz(iodata)
    fscale = iodata.units.scale_factor(ValueType.FREQUENCY)
    omegas = [2 * math.pi * f / fscale for f in freqs]
    return iodata, sop, omegas


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_matches_direct(tmp_path, n_shards):
    from palace_tpu.linalg.device_ksp_sharded import (
        ShardedBlockedDeviceSolver)
    from palace_tpu.parallel.dofsharded import make_cells_mesh

    iodata, sop, omegas = _setup(tmp_path, order=2, nfreq=3, lossy=True)
    lin = iodata.solver.linear
    jmesh = make_cells_mesh(n_shards)
    solver = ShardedBlockedDeviceSolver(
        sop.space, iodata.boundaries.pec, sop.driven_terms(omegas), omegas,
        sop.ess_mask, jmesh=jmesh, tol=lin.tol, max_its=lin.max_its)
    ex = sop.excitations()
    sols_direct = sweep_uniform_direct(iodata, sop, omegas, ex)
    for k in ex:
        rhs = np.stack([1j * w * sop.rhs1(k) for w in omegas], axis=1)
        X, info = solver.solve(rhs)
        assert (info["relres"] < 10 * lin.tol).all()
        for i in range(len(omegas)):
            a = sols_direct[(k, i)]
            rel = np.linalg.norm(a - X[:, i]) / np.linalg.norm(a)
            assert rel < 1e-8, (k, i, rel)


def test_shard_count_invariance(tmp_path):
    """2-shard and 8-shard runs agree to near machine precision (the same
    Krylov iteration up to fp reassociation)."""
    from palace_tpu.linalg.device_ksp_sharded import (
        ShardedBlockedDeviceSolver)
    from palace_tpu.parallel.dofsharded import make_cells_mesh

    iodata, sop, omegas = _setup(tmp_path, order=1, nfreq=2)
    lin = iodata.solver.linear
    k = list(sop.excitations())[0]
    rhs = np.stack([1j * w * sop.rhs1(k) for w in omegas], axis=1)
    sols = []
    for S in (2, 8):
        solver = ShardedBlockedDeviceSolver(
            sop.space, iodata.boundaries.pec, sop.driven_terms(omegas),
            omegas, sop.ess_mask, jmesh=make_cells_mesh(S), tol=lin.tol,
            max_its=lin.max_its)
        X, _ = solver.solve(rhs)
        sols.append(X)
    rel = np.linalg.norm(sols[0] - sols[1]) / np.linalg.norm(sols[0])
    assert rel < 1e-9, rel
