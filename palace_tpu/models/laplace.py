"""Electrostatics: Laplace operator with terminal boundary conditions.

Reference: palace/models/laplaceoperator.hpp:36-38 — H1 stiffness
(eps grad V, grad v), per-terminal unit-voltage excitations, E = -grad V.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp
import numpy as np

from palace_tpu.config import IoData
from palace_tpu.fem.h1 import H1Space
from palace_tpu.fem.operators import h1_operator
from palace_tpu.mesh.mesh import Mesh
from palace_tpu.models.materials import MaterialOperator
from palace_tpu.ops.partial import EliminatedOperator, make_ess_mask


@dataclass
class LaplaceOperator:
    space: H1Space
    materials: MaterialOperator
    K: object  # PAOperator (eps grad u, grad v)
    Keli: EliminatedOperator
    ess_mask: np.ndarray
    terminals: Dict[int, np.ndarray]  # terminal index -> dof ids

    @staticmethod
    def build(iodata: IoData, mesh: Mesh, dtype=jnp.float64) -> "LaplaceOperator":
        space = H1Space(mesh, iodata.solver.order)
        materials = MaterialOperator.build(iodata)
        K = h1_operator(space, diffusion_coef=materials.permittivity, dtype=dtype)

        terminals = {}
        for t in sorted(iodata.boundaries.terminals, key=lambda t: t.index):
            terminals[t.index] = space.boundary_dofs(t.attributes)
        ground = space.boundary_dofs(iodata.boundaries.ground)

        ess = [ground] + list(terminals.values())
        ess_dofs = np.unique(np.concatenate([e for e in ess if len(e)]))
        mask = make_ess_mask(space.num_dofs, ess_dofs)
        return LaplaceOperator(
            space, materials, K, EliminatedOperator(K, mask), mask, terminals
        )

    def excitation(self, idx: int):
        """(x_bc, rhs) for unit voltage on terminal idx, 0 elsewhere."""
        xbc = jnp.zeros(self.space.num_dofs).at[
            jnp.asarray(self.terminals[idx])
        ].set(1.0)
        b = self.Keli.eliminate_rhs(jnp.zeros(self.space.num_dofs), xbc)
        return xbc, b
