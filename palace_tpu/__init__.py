"""palace-tpu: TPU-native full-wave 3D computational electromagnetics.

A finite-element solver for full-wave computational electromagnetics built
from scratch for TPU hardware on JAX/XLA/Pallas.  Provides the same
capabilities and JSON configuration API as the reference solver
(awslabs/palace, see /root/reference), re-designed TPU-first:

- Matrix-free partial assembly of FEM operators as batched per-element
  tensor contractions (MXU-friendly) instead of libCEED JIT'd qfunctions.
- SPMD element-partitioned parallelism over a ``jax.sharding.Mesh`` with
  XLA collectives over ICI, instead of MPI domain decomposition.
- Matrix-free Krylov + p-multigrid solvers instead of hypre/PETSc/SLEPc.

Public entry point mirrors ``palace::Run`` (reference: palace/driver.hpp:24):

    from palace_tpu import run
    run("config.json")
"""

__version__ = "0.1.0"

from palace_tpu.api import run  # noqa: F401,E402
