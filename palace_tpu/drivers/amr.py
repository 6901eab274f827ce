"""Adaptive mesh refinement: Dörfler marking + conforming local refinement.

The reference drives AMR from BaseSolver (reference:
palace/drivers/basesolver.cpp SolveEstimateMarkRefine: solve, estimate,
Dörfler-mark, refine, repeat until the relative error indicator meets
config["Model"]["Refinement"]["Tol"] or "MaxIts" is reached) with
mfem conforming/nonconforming refinement.  Here marked simplex elements are
refined by splitting their longest edge with the conforming edge-fan
bisection (`mesh/crack.py:local_edge_split`), the standard
longest-edge-bisection AMR pattern.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from palace_tpu.config import IoData
from palace_tpu.mesh.crack import local_edge_split
from palace_tpu.mesh.mesh import Mesh


def dorfler_mark(eta2: np.ndarray, fraction: float) -> np.ndarray:
    """Smallest element set carrying at least `fraction` of the total
    squared error (reference: palace/utils/dorfler.cpp
    ComputeDorflerThreshold)."""
    order = np.argsort(eta2)[::-1]
    csum = np.cumsum(eta2[order])
    k = int(np.searchsorted(csum, fraction * csum[-1])) + 1
    return order[:min(k, len(order))]


def combine_indicators(eta2_steps: Sequence[np.ndarray],
                       energies: Sequence[float]) -> Tuple[np.ndarray, float]:
    """Mean of the energy-normalized indicators over solve steps and its
    l2 norm (the global relative error, the "Norm" column of
    error-indicators.csv; reference: palace/fem/errorindicator.cpp)."""
    combined = None
    for eta2, Et in zip(eta2_steps, energies):
        eta = np.sqrt(eta2 * (0.5 / Et if Et and Et > 0 else 1.0))
        if combined is None:
            combined, n = eta, 1
        else:
            combined = np.sqrt((combined**2 * n + eta**2) / (n + 1))
            n += 1
    if combined is None:
        return np.zeros(0), 0.0
    return combined, float(np.linalg.norm(combined))


def refine_marked(mesh: Mesh, marked: np.ndarray) -> Mesh:
    """Split the longest edge of every marked element (global element ids
    across domain buckets, in bucket concatenation order)."""
    offsets = np.cumsum([0] + [b.num_elem for b in mesh.buckets])
    edges: List[Tuple[int, int]] = []
    seen = set()
    for ge in np.asarray(marked):
        bi = int(np.searchsorted(offsets, int(ge), side="right")) - 1
        b = mesh.buckets[bi]
        corners = b.corners[int(ge) - int(offsets[bi])]
        pts = mesh.nodes[corners]
        nv = len(corners)
        best, blen = None, -1.0
        for i in range(nv):
            for j in range(i + 1, nv):
                l = float(np.sum((pts[i] - pts[j]) ** 2))
                if l > blen:
                    blen, best = l, (int(corners[i]), int(corners[j]))
        key = (min(best), max(best))
        if key not in seen:
            seen.add(key)
            edges.append(key)
    return local_edge_split(mesh, edges)


def adapt_loop(iodata: IoData, mesh: Mesh, solve_and_estimate):
    """Generic solve-estimate-mark-refine loop.

    `solve_and_estimate(mesh)` returns (result, eta2_steps, energies,
    num_dofs); iterates while the combined relative indicator exceeds
    Refinement.Tol, up to Refinement.MaxIts adaptation steps (0 = AMR off)
    and Refinement.MaxSize dofs.  Returns (result, eta_elem, eta_norm,
    mesh, n_iterations)."""
    from palace_tpu.drivers.common import print_log

    cfg = iodata.model.refinement
    it = 0
    while True:
        result, eta2_steps, energies, ndof = solve_and_estimate(mesh)
        eta_elem, eta_norm = combine_indicators(eta2_steps, energies)
        if (it >= cfg.max_it or eta_norm <= cfg.tol
                or (cfg.max_size > 0 and ndof >= cfg.max_size)):
            return result, eta_elem, eta_norm, mesh, it
        marked = dorfler_mark(eta_elem**2, cfg.update_fraction)
        ne = mesh.num_elements
        try:
            mesh = refine_marked(mesh, marked)
        except NotImplementedError as e:
            print_log(iodata,
                      f"  WARNING: AMR stopped after {it} iterations "
                      f"(error {eta_norm:.3e}): {e}")
            return result, eta_elem, eta_norm, mesh, it
        it += 1
        print_log(iodata,
                  f"AMR iteration {it}: error {eta_norm:.3e} > {cfg.tol:.1e},"
                  f" marked {len(marked)} elements "
                  f"({ne} -> {mesh.num_elements})")
