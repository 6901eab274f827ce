"""Analytic square-loop inductance helpers (palace_tpu/testing/rings.py):
closed-form segment Neumann integrals vs brute-force quadrature, dipole
limit, and mesh-construction smoke."""

import numpy as np

from palace_tpu.testing.rings import (
    MU0,
    rings_mesh,
    square_loop_mutual,
    square_ribbon_mutual,
    square_ribbon_self,
)


def _brute_mutual(alpha, beta, n=3000):
    """Direct Neumann double sum over discretized filament loops."""

    def loop(r, n):
        t = (np.arange(n) + 0.5) / n * 4.0  # perimeter parameter in sides
        pts = np.empty((n, 2))
        dl = np.empty((n, 2))
        side, u = np.divmod(t, 1.0)
        u = 2 * r * u - r
        for s, (fx, fy, dx, dy) in enumerate(
                [(1, 0, 0, 1), (0, 1, -1, 0), (-1, 0, 0, -1), (0, -1, 1, 0)]):
            m = side.astype(int) == s
            pts[m, 0] = fx * r + dx * u[m]
            pts[m, 1] = fy * r + dy * u[m]
            dl[m] = (dx, dy)
        return pts, dl * (8.0 * r / n)

    p1, d1 = loop(alpha, n)
    p2, d2 = loop(beta, n)
    r = np.linalg.norm(p1[:, None, :] - p2[None, :, :], axis=-1)
    dot = d1 @ d2.T
    return MU0 / (4 * np.pi) * float((dot / r).sum())


def test_mutual_matches_brute_force():
    m_exact = square_loop_mutual(0.6, 1.0)
    m_brute = _brute_mutual(0.6, 1.0)
    assert abs(m_exact - m_brute) < 2e-3 * abs(m_exact)


def test_mutual_dipole_limit():
    # b >> a: M -> 4 sqrt(2) mu0 a^2 / (pi b) (field at center of a square
    # loop of side 2b times the inner area).
    a, b = 1.0, 300.0
    m = square_loop_mutual(a, b)
    m_dip = 4 * np.sqrt(2) * MU0 * a * a / (np.pi * b)
    assert abs(m - m_dip) < 2e-4 * m_dip


def test_mutual_symmetry():
    assert np.isclose(square_loop_mutual(0.4, 1.3),
                      square_loop_mutual(1.3, 0.4), rtol=1e-12)


def test_ribbon_self_models():
    a, w = 50.0, 0.5
    L_uni = square_ribbon_self(a, w, n=64, model="uniform")
    L_pec = square_ribbon_self(a, w, model="pec")
    # Edge-peaked PEC current links slightly less flux than forced-uniform
    # (strip GMD 0.223 w < equivalent radius 0.25 w), but only through the
    # log: the two models must agree to the ln(0.25/0.223) ~ 2% level here.
    assert L_pec < L_uni
    assert abs(L_uni - L_pec) < 0.03 * L_uni
    # Convergence of the uniform cross-section average in n.
    L_uni32 = square_ribbon_self(a, w, n=32, model="uniform")
    assert abs(L_uni - L_uni32) < 2e-3 * L_uni


def test_ribbon_mutual_close_to_filament():
    a, b, w = 6e-6, 24e-6, 1e-6
    m_fil = square_loop_mutual(a, b)
    m_rib = square_ribbon_mutual(a, b, w, n=8)
    assert abs(m_rib - m_fil) < 5e-3 * abs(m_fil)


def test_rings_mesh_smoke():
    mesh = rings_mesh(6.0, 24.0, 1.0, 140.0, 0.5)
    assert mesh.num_elements > 1000
    attrs = np.concatenate([b.attr for b in mesh.bdr_buckets])
    for a in (7, 8, 11, 12):
        assert (attrs == a).sum() > 0, f"missing sheet attr {a}"
    # Sheets of each ring form a closed square annulus: count cells.
    n_src = (attrs == 11).sum()
    assert n_src >= 2  # w/h = 2 cells across the ribbon
