"""Reference element sanity: quadrature exactness, nodal basis properties."""

import numpy as np
import pytest

from palace_tpu.fem import reference as ref
from palace_tpu.fem.reference import Geom

VOLUMES = {
    Geom.LINE: 1.0,
    Geom.TRI: 0.5,
    Geom.QUAD: 1.0,
    Geom.TET: 1.0 / 6.0,
    Geom.HEX: 1.0,
    Geom.PRISM: 0.5,
}


@pytest.mark.parametrize("geom", list(VOLUMES))
@pytest.mark.parametrize("order", [1, 3, 6, 9])
def test_quadrature_exactness(geom, order):
    pts, w = ref.quadrature(geom, order)
    assert np.isclose(w.sum(), VOLUMES[geom], rtol=1e-13)
    # exact integration of all monomials in the order-`order` space
    exps = ref.monomials(geom, order)
    vals = ref.eval_monomials(exps, pts)
    got = w @ vals
    # reference by very-high-order rule
    pts2, w2 = ref.quadrature(geom, 2 * order + 3)
    want = w2 @ ref.eval_monomials(exps, pts2)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("geom", [Geom.TRI, Geom.QUAD, Geom.TET, Geom.HEX, Geom.PRISM])
@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_lagrange_lattice_basis(geom, p):
    nodes = ref.lattice(geom, p)
    basis = ref.nodal_basis(geom, p, nodes)
    # Kronecker property
    V = basis.eval(nodes)
    assert np.allclose(V, np.eye(len(nodes)), atol=1e-9)
    # Partition of unity at random points
    rng = np.random.default_rng(0)
    pts = ref.quadrature(geom, 5)[0]
    assert np.allclose(basis.eval(pts).sum(axis=1), 1.0, atol=1e-10)
    # Gradient sums to zero
    assert np.allclose(basis.eval_grad(pts).sum(axis=1), 0.0, atol=1e-9)


def test_gmsh_geometry_bases():
    for etype in [1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13, 21, 29]:
        b = ref.gmsh_geometry_basis(etype)
        V = b.eval(b.nodes)
        assert np.allclose(V, np.eye(len(b.nodes)), atol=1e-9), f"etype {etype}"
