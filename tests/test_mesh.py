"""Mesh reading and geometry validation against the reference examples."""

import os

import numpy as np
import pytest

from palace_tpu.mesh import geometry
from palace_tpu.mesh.mesh import load_mesh

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference examples not available"
)


def total_volume(mesh, qorder=6):
    return sum(geometry.bucket_volume(mesh.nodes, b, qorder) for b in mesh.buckets)


def assert_positive_jacobians(mesh, qorder=4):
    for b in mesh.buckets:
        gf = geometry.compute(mesh.nodes, b, qorder)
        assert gf.detJ.min() > 0, f"negative Jacobian in {b.geom} bucket"


@needs_ref
def test_cylinder_meshes_agree():
    """The three cylinder meshes (tet10, hex27, prism18) discretize the same
    domain; their volumes must agree to curved-boundary discretization error.
    Validates gmsh high-order node orderings for all three element types."""
    vols = {}
    for name in ["cylinder_tet", "cylinder_hex", "cylinder_prism"]:
        mesh = load_mesh(f"{REF}/examples/cylinder/mesh/{name}.msh")
        assert_positive_jacobians(mesh)
        vols[name] = total_volume(mesh)
    # Analytic: radius 2.74cm, height 5.48cm => pi r^2 h.  Each mesh is a
    # different discretization of the curved boundary, so compare to the
    # analytic volume, not to each other exactly.
    r, h = 2.74, 5.48
    for name, v in vols.items():
        assert np.isclose(v, np.pi * r * r * h, rtol=1e-3), (name, vols)


@needs_ref
def test_spheres_mesh_cubic_tets():
    mesh = load_mesh(f"{REF}/examples/spheres/mesh/spheres.msh")
    assert mesh.dim == 3
    assert_positive_jacobians(mesh)
    # domain = ball(r=75) minus ball a (r=1, at x=-2.5) minus ball b (r=2, at x=2.5)
    # (examples/spheres/mesh/mesh.jl geometry)
    vol = total_volume(mesh)
    expect = 4.0 / 3.0 * np.pi * (75.0**3 - 1.0**3 - 2.0**3)
    assert np.isclose(vol, expect, rtol=1e-4), (vol, expect)
    # Boundary attributes present: 2 (farfield), 3 (sphere_a), 4 (sphere_b)
    assert set(mesh.bdr_attributes().tolist()) == {2, 3, 4}


@needs_ref
def test_coaxial_mesh():
    mesh = load_mesh(f"{REF}/test/data/regression/input/coaxial/mesh/coaxial.msh")
    assert_positive_jacobians(mesh)


@needs_ref
def test_cpw_mesh_linear_tets():
    mesh = load_mesh(f"{REF}/test/data/regression/input/cpw/mesh/cpw_lumped.msh")
    assert_positive_jacobians(mesh)
    assert mesh.num_elements == 16641


@needs_ref
def test_face_table_boundary_matching():
    mesh = load_mesh(f"{REF}/examples/cylinder/mesh/cylinder_tet.msh")
    fattr = mesh.bdr_face_attr()
    # every boundary element matched to a face
    nbdr = sum(b.num_elem for b in mesh.bdr_buckets)
    assert len(fattr) == nbdr
    # boundary faces have exactly one adjacent element
    _, _, counts = mesh.face_table()
    for fid in fattr:
        assert counts[fid] == 1
