"""H1 space + operator tests: dof counts, continuity, Poisson solves."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from palace_tpu.fem.h1 import H1Space
from palace_tpu.fem.operators import h1_operator
from palace_tpu.linalg.iterative import cg
from palace_tpu.linalg.smoothers import jacobi
from palace_tpu.mesh.generate import box_hex, box_tet
from palace_tpu.mesh.mesh import load_mesh
from palace_tpu.ops.partial import EliminatedOperator, make_ess_mask

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference examples not available"
)

ONE = {1: np.eye(3)}


def h1_dof_count_hex(nx, ny, nz, p):
    return (nx * p + 1) * (ny * p + 1) * (nz * p + 1)


@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_hex_dof_count(p):
    mesh = box_hex(3, 2, 2)
    sp = H1Space(mesh, p)
    assert sp.num_dofs == h1_dof_count_hex(3, 2, 2, p)


@pytest.mark.parametrize("p", [1, 2, 3])
def test_tet_dof_count(p):
    # V + E(p-1) + F*(p-1)(p-2)/2 + T*(p-1)(p-2)(p-3)/6 via Euler check:
    mesh = box_tet(2, 2, 2)
    sp = H1Space(mesh, p)
    nV = mesh.num_vertices
    ed, _ = mesh.edge_table()
    nE = len(ed)
    fc, _, _ = mesh.face_table()
    nF = len(fc)
    nT = mesh.num_elements
    expect = (
        nV
        + nE * (p - 1)
        + nF * (p - 1) * (p - 2) // 2
        + nT * (p - 1) * (p - 2) * (p - 3) // 6
    )
    assert sp.num_dofs == expect


@pytest.mark.parametrize("make,p", [(box_hex, 2), (box_tet, 2), (box_hex, 3),
                                    (box_tet, 3)])
def test_mass_volume_and_stiffness_nullspace(make, p):
    mesh = make(2, 2, 2, 1.0, 1.0, 1.0)
    sp = H1Space(mesh, p)
    op = h1_operator(sp, diffusion_coef=ONE, mass_coef=ONE)
    ones = jnp.ones(sp.num_dofs)
    y = op(ones)
    # grad(1) = 0, so only mass contributes: sum = volume
    assert np.isclose(float(ones @ y), 1.0, rtol=1e-12)
    opk = h1_operator(sp, diffusion_coef=ONE)
    assert np.allclose(np.asarray(opk(ones)), 0.0, atol=1e-10)


@pytest.mark.parametrize("p", [1, 2, 3])
def test_linear_exactness(p):
    """u = x + 2y + 3z: K u has zero residual at interior dofs, and
    u' K u = int |grad u|^2 = 14 * volume."""
    mesh = box_tet(2, 3, 2, 1.0, 1.0, 1.0)
    sp = H1Space(mesh, p)
    coords = sp.dof_coordinates()
    u = jnp.asarray(coords @ np.array([1.0, 2.0, 3.0]))
    opk = h1_operator(sp, diffusion_coef=ONE)
    y = opk(u)
    assert np.isclose(float(u @ y), 14.0, rtol=1e-12)
    bdr = sp.boundary_dofs([1, 2, 3, 4, 5, 6])
    mask = np.ones(sp.num_dofs, bool)
    mask[bdr] = False
    assert np.allclose(np.asarray(y)[mask], 0.0, atol=1e-10)


@pytest.mark.parametrize("make", [box_hex, box_tet])
def test_poisson_parallel_plate(make):
    """Laplace between z=0 (V=0) and z=1 (V=1): exact solution V=z at any
    order; energy = volume."""
    mesh = make(3, 3, 3)
    sp = H1Space(mesh, 2)
    op = h1_operator(sp, diffusion_coef=ONE)
    d_lo = sp.boundary_dofs([5])
    d_hi = sp.boundary_dofs([6])
    ess = np.concatenate([d_lo, d_hi])
    mask = make_ess_mask(sp.num_dofs, ess)
    eop = EliminatedOperator(op, mask)
    xbc = jnp.zeros(sp.num_dofs).at[jnp.asarray(d_hi)].set(1.0)
    b = eop.eliminate_rhs(jnp.zeros(sp.num_dofs), xbc)
    M = jacobi(op.diagonal(), mask)
    res = cg(eop, b, M=M, tol=1e-12, max_its=500)
    assert bool(res.converged)
    V = res.x
    coords = sp.dof_coordinates()
    assert np.allclose(np.asarray(V), coords[:, 2], atol=1e-9)
    energy = float(V @ op(V))
    assert np.isclose(energy, 1.0, rtol=1e-10)


@needs_ref
def test_cylinder_axial_laplace_curved_hex():
    """V between top/bottom of the (curved, hex27) cylinder: exact V=z/h.
    Validates curved geometry factors + boundary dofs on a real mesh.
    Capacitance integral: int |grad V|^2 = pi r^2 / h."""
    mesh = load_mesh(f"{REF}/examples/cylinder/mesh/cylinder_hex.msh")
    sp = H1Space(mesh, 2)
    op = h1_operator(sp, diffusion_coef=ONE)
    # attrs: 2 = top? 3 = bottom? (physical names); use both as plates.
    top = sp.boundary_dofs([2])
    bot = sp.boundary_dofs([3])
    ess = np.concatenate([top, bot])
    mask = make_ess_mask(sp.num_dofs, ess)
    eop = EliminatedOperator(op, mask)
    xbc = jnp.zeros(sp.num_dofs).at[jnp.asarray(top)].set(1.0)
    b = eop.eliminate_rhs(jnp.zeros(sp.num_dofs), xbc)
    res = cg(eop, b, M=jacobi(op.diagonal(), mask), tol=1e-12, max_its=2000)
    assert bool(res.converged)
    energy = float(res.x @ op(res.x))
    r, h = 2.74, 5.48
    # curved-mesh discretization error ~1e-4 on this coarse mesh
    assert np.isclose(energy, np.pi * r * r / h, rtol=1e-3), energy
