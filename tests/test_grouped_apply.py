"""Group-granular gather/scatter apply (ElemTermOperator) equivalence.

The entity-block dof numbering lets the blocked apply gather/scatter g
consecutive dofs per indexed row (g = p for ND spaces); the result must be
identical to the per-dof path (same arithmetic, different data movement).
Reference analogue: the libCEED E-vector restriction
(palace/fem/libceed/restriction.cpp) — here re-blocked for the TPU
row-issue cost model (PERF_NOTES.md).
"""

import numpy as np
import pytest

from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh.mesh import canonicalize_simplices
from palace_tpu.ops.partial import detect_dof_group


@pytest.mark.parametrize("order", [2, 3])
def test_group_detection_and_equivalence(order):
    from palace_tpu.linalg.device_ksp import ElemTermOperator, Term

    mesh = box_tet(3, 3, 3)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, order)
    eye = {1: np.eye(3)}
    op = nd_operator(space, curl_coef=eye, mass_coef=eye)
    t = op._tables[0]
    gidx = np.asarray(t["gidx"])
    A = np.asarray(t["A"])

    g = detect_dof_group([gidx], space.num_dofs)
    assert g == min(order, 4)

    term = Term("ka", [(gidx, A)], coef=lambda w: 1.0)
    eto = ElemTermOperator([term], space.num_dofs)
    assert eto.group == g

    rng = np.random.default_rng(0)
    F = 3
    u = rng.standard_normal((space.num_dofs, F))
    coefs = np.ones((1, F))
    y = np.asarray(eto(coefs, u))

    # per-dof reference
    ul = u[gidx]
    vl = np.einsum("enm,emf->enf", A, ul)
    y_ref = np.zeros_like(u)
    np.add.at(y_ref, gidx.reshape(-1), vl.reshape(-1, F))
    assert np.abs(y - y_ref).max() <= 1e-10 * max(np.abs(y_ref).max(), 1.0)


def test_group_detection_rejects_misaligned():
    gidx = np.array([[0, 1, 2, 4, 5, 6]])  # 3..5 not aligned triple
    assert detect_dof_group([gidx], 9) == 1
    gidx2 = np.array([[0, 1, 2, 3, 4, 5]])
    assert detect_dof_group([gidx2], 9) == 3
