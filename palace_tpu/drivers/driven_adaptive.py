"""Adaptive fast frequency sweep via projection-based reduced-order model
(reference: palace/models/romoperator.cpp, palace/drivers/drivensolver.cpp:235-486).

Offline: greedy sampling — solve the full (HDM) system at the endpoints and
at the frequency maximizing the PROM residual, orthonormalizing solution
vectors into the reduced basis V (CGS2, reference: romoperator.hpp:197-234);
stop when the maximum relative residual over the sweep grid drops below
AdaptiveTol or MaxSize is hit.  The residual norm of the PROM solution is
evaluated exactly in the full space from the precomputed K V / C V / M V
tall matrices (the role of the reference's minimal-rational-interpolation
error surrogate, romoperator.hpp:128-131).

Online: per frequency solve the dense reduced system
(V^H A(omega) V) z = V^H b(omega) and lift E = V z.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from palace_tpu.drivers.common import print_log
from palace_tpu.models.spaceoperator import SpaceOperator


def _orthonormalize(V: List[np.ndarray], w: np.ndarray) -> List[np.ndarray]:
    """CGS2 against the current basis; append if not in span."""
    for _ in range(2):
        for v in V:
            w = w - np.vdot(v, w) * v
    n = np.linalg.norm(w)
    if n > 1e-13:
        V.append(w / n)
    return V


def sweep_adaptive(iodata, sop: SpaceOperator, omegas, excitations
                   ) -> Dict[Tuple[int, int], np.ndarray]:
    from palace_tpu.linalg.ordering import dof_coordinates, splu_nd

    if sop.wave_ports:
        raise NotImplementedError(
            "adaptive PROM with wave ports (per-port factored reduced "
            "operators, reference: romoperator.hpp:177-187) lands next round")
    if sop._conductivity:
        raise NotImplementedError(
            "adaptive PROM with frequency-dependent conductivity boundaries "
            "is not supported; use a uniform sweep")
    cfg = iodata.solver.driven
    tol = cfg.adaptive_tol
    max_size = max(cfg.adaptive_max_size, 4)

    K = sop.stiffness_csr()
    C = sop.damping_csr()
    M = sop.mass_csr()
    coords = dof_coordinates(sop.space)
    rhs1 = {ex: sop.rhs1(ex).astype(complex) for ex in excitations}

    def solve_hdm(omega, ex):
        A = sop.system_csr(omega, K, C, M)
        lu = splu_nd(A, coords)
        return lu.solve(1j * omega * rhs1[ex])

    # Reduced basis (real + imag parts of each HDM solution enter
    # separately, reference: romoperator.cpp PROM update uses solution and
    # conjugate information; real/imag splitting spans the same space).
    V: List[np.ndarray] = []

    def add_solution(E):
        _orthonormalize(V, E.real.astype(complex))
        _orthonormalize(V, 1j * E.imag.astype(complex))

    omega_lo, omega_hi = min(omegas), max(omegas)
    sampled = set()
    for ex in excitations:
        for om in {omega_lo, omega_hi}:
            add_solution(solve_hdm(om, ex))
            sampled.add((round(om, 12), ex))
    print_log(iodata, f"  PROM init: {len(V)} basis vectors "
                      f"({2 * len(excitations)} HDM solves)")

    def reduced_tables():
        Vm = np.stack(V, axis=1)  # (n, m)
        KV = K @ Vm
        CV = C @ Vm if C is not None else None
        MV = M @ Vm
        Kr = Vm.conj().T @ KV
        Cr = Vm.conj().T @ CV if CV is not None else None
        Mr = Vm.conj().T @ MV
        br = {ex: Vm.conj().T @ rhs1[ex] for ex in excitations}
        return Vm, KV, CV, MV, Kr, Cr, Mr, br

    def prom_solve(om, ex, tabs):
        Vm, KV, CV, MV, Kr, Cr, Mr, br = tabs
        Ar = Kr - om * om * Mr
        if Cr is not None:
            Ar = Ar + 1j * om * Cr
        z = np.linalg.solve(Ar, 1j * om * br[ex])
        return z

    def residual_norm(om, ex, z, tabs):
        Vm, KV, CV, MV, Kr, Cr, Mr, br = tabs
        r = 1j * om * rhs1[ex] - (KV @ z - om * om * (MV @ z))
        if CV is not None:
            r = r - 1j * om * (CV @ z)
        return np.linalg.norm(r) / (abs(om) * np.linalg.norm(rhs1[ex]))

    # Greedy enrichment.
    it = 0
    while len(V) < 2 * max_size:
        tabs = reduced_tables()
        worst = (0.0, None, None)
        for om in omegas:
            for ex in excitations:
                z = prom_solve(om, ex, tabs)
                rn = residual_norm(om, ex, z, tabs)
                if rn > worst[0] and (round(om, 12), ex) not in sampled:
                    worst = (rn, om, ex)
        it += 1
        if worst[1] is None or worst[0] < tol:
            print_log(iodata, f"  PROM converged: basis size {len(V)}, "
                              f"max residual {worst[0]:.2e}")
            break
        print_log(iodata, f"  PROM iter {it}: sampling omega={worst[1]:.4f} "
                          f"(residual {worst[0]:.2e})")
        add_solution(solve_hdm(worst[1], worst[2]))
        sampled.add((round(worst[1], 12), worst[2]))

    # Online sweep.
    tabs = reduced_tables()
    Vm = tabs[0]
    sols = {}
    for i, om in enumerate(omegas):
        for ex in excitations:
            z = prom_solve(om, ex, tabs)
            sols[(ex, i)] = Vm @ z
    print_log(iodata, f"  PROM online: {len(omegas)} frequencies x "
                      f"{len(excitations)} excitations (basis {len(V)})")
    return sols
