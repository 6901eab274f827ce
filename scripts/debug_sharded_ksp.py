"""Bisect the sharded device-KSP convergence: same tiny TEM box through
(a) single-device BlockedDeviceSolver, (b) ShardedBlockedDeviceSolver S=1,
(c) S=8.  Iteration counts should match across all three."""

import json
import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    # The axon PJRT plugin ignores the JAX_PLATFORMS env var; force CPU.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from palace_tpu.config import IoData, ValueType
    from palace_tpu.drivers.common import prepare_mesh
    from palace_tpu.drivers.driven import driven_samples_ghz
    from palace_tpu.linalg.device_ksp import BlockedDeviceSolver
    from palace_tpu.linalg.device_ksp_sharded import (
        ShardedBlockedDeviceSolver)
    from palace_tpu.mesh import gmsh_write
    from palace_tpu.mesh.generate import box_tet
    from palace_tpu.models.spaceoperator import SpaceOperator
    from palace_tpu.parallel.dofsharded import make_cells_mesh

    eta0 = 376.730313412
    tmp = tempfile.mkdtemp(prefix="dbg_sharded_")
    gmsh_write.write(box_tet(3, 3, 3, lx=10.0, ly=10.0, lz=10.0),
                     os.path.join(tmp, "box.msh"))
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": "postpro"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [{"Attributes": [1], "Permeability": 1.0,
                                   "Permittivity": 2.0, "LossTan": 0.01}]},
        "Boundaries": {
            "PEC": {"Attributes": [5, 6]},
            "LumpedPort": [
                {"Index": 1, "Attributes": [1], "R": eta0, "Direction": "+Z",
                 "Excitation": True},
                {"Index": 2, "Attributes": [2], "R": eta0,
                 "Direction": "+Z"}]},
        "Solver": {"Order": 2, "Device": "CPU",
                   "Driven": {"MinFreq": 8.0, "MaxFreq": 9.0,
                              "FreqStep": 1.0},
                   "Linear": {"Type": "GMG", "Tol": 1e-10, "MaxIts": 200}},
    }
    cpath = os.path.join(tmp, "case.json")
    json.dump(cfg, open(cpath, "w"))
    iodata = IoData(cpath)
    pmesh = prepare_mesh(iodata)
    sop = SpaceOperator(iodata, pmesh)
    fscale = iodata.units.scale_factor(ValueType.FREQUENCY)
    omegas = [2 * math.pi * f / fscale for f in driven_samples_ghz(iodata)]
    lin = iodata.solver.linear
    ex = list(sop.excitations())[0]
    rhs = np.stack([1j * w * sop.rhs1(ex) for w in omegas], axis=1)

    log = lambda s: print(s, flush=True)
    single = BlockedDeviceSolver(
        sop.space, iodata.boundaries.pec, sop.driven_terms(omegas), omegas,
        sop.ess_mask, tol=lin.tol, max_its=lin.max_its, log=log)
    X0, info0 = single.solve(rhs)
    print("single-device:", info0["iterations"], info0["relres"])

    for S in (1, 2, 8):
        solver = ShardedBlockedDeviceSolver(
            sop.space, iodata.boundaries.pec, sop.driven_terms(omegas),
            omegas, sop.ess_mask, jmesh=make_cells_mesh(S), tol=lin.tol,
            max_its=lin.max_its, log=log)
        X, info = solver.solve(rhs)
        rel = np.linalg.norm(X - X0) / np.linalg.norm(X0)
        print(f"S={S}:", info["iterations"], info["relres"], "dx", rel)


if __name__ == "__main__":
    main()
