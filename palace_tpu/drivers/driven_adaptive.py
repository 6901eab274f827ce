"""Adaptive fast frequency sweep via projection-based reduced-order model
(reference: palace/models/romoperator.cpp, palace/drivers/drivensolver.cpp:235-486).

Offline greedy sampling driven by minimal rational interpolation (MRI):
the next high-fidelity sample is placed at the minimizer of the MRI
denominator |Q(z)| = |sum_i q_i / (z - z_i)| (reference:
romoperator.cpp:233-360 MinimalRationalInterpolation), the sample's true
PROM error ||E - V y|| / ||E|| is recorded, and the loop stops after
`AdaptiveConvergenceMemory` consecutive samples below AdaptiveTol
(drivensolver.cpp:363-421).  HDM solutions are orthonormalized into the
reduced basis V with CGS2 (romoperator.hpp:197-234).

Wave ports are supported through the factored form of their contribution
A_wp(omega) = i sum_p k_np(omega) M_p with constant boundary-mass matrices
M_p: the reduced projections V^H M_p V are updated with the basis and the
online dense solve only evaluates the scalar k_np(omega)
(reference: romoperator.hpp:177-187 Mwp_p / Mwp_p_r).

Online: per frequency solve (V^H A(omega) V) z = V^H b(omega), E = V z.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from palace_tpu.drivers.common import print_log
from palace_tpu.models.spaceoperator import SpaceOperator


def _orthonormalize(V: List[np.ndarray], w: np.ndarray,
                    R: List[np.ndarray] | None = None) -> List[np.ndarray]:
    """CGS2 against the current basis; append if not in span.  When R is
    given, the orthogonalization coefficients (upper-triangular column
    [h_0..h_{m-1}, ||residual||]) are recorded — the reference's orth_R,
    whose diagonal carries the pre-normalization vector norms used by the
    circuit-synthesis scaling (romoperator.cpp:979-1000)."""
    h = np.zeros(len(V) + 1, complex)
    for _ in range(2):
        for i, v in enumerate(V):
            c = np.vdot(v, w)
            h[i] += c
            w = w - c * v
    n = np.linalg.norm(w)
    h[-1] = n
    if n > 1e-13:
        V.append(w / n)
        if R is not None:
            R.append(h)
    return V


class MinimalRationalInterpolation:
    """MRI of the frequency response used as the greedy error surrogate
    (reference: romoperator.cpp:149-172 ComputeMRI, 233-360).

    Snapshots [u; i omega u] are QR-accumulated (CGS2); the interpolation
    weights q are the right singular vector of R for the smallest singular
    value, with rank-deficiency fallback (ORTHOG_TOL)."""

    def __init__(self):
        self.Q: List[np.ndarray] = []
        self.R = np.zeros((0, 0), complex)
        self.z: List[float] = []
        self.q: np.ndarray | None = None

    def add_sample(self, omega: float, u: np.ndarray):
        col = np.concatenate([u, 1j * omega * u]).astype(complex)
        S = len(self.z)
        R = np.zeros((S + 1, S + 1), complex)
        R[:S, :S] = self.R
        for _ in range(2):
            for i, qv in enumerate(self.Q):
                h = np.vdot(qv, col)
                R[i, S] += h
                col = col - h * qv
        nrm = np.linalg.norm(col)
        R[S, S] = nrm
        self.Q.append(col / nrm if nrm > 0 else col)
        self.R = R
        self.z.append(float(omega))
        _, s, Vh = np.linalg.svd(R)
        m = len(s) - 1
        while m > 0 and s[m] < 1e-12 * s[0]:
            m -= 1
        self.q = Vh[m].conj()

    def find_max_error(self, n_grid: int = 200000) -> float:
        """argmin_z |Q(z)| over [min z, max z] (brute-force fine grid,
        reference: romoperator.cpp:318-360)."""
        z = np.asarray(self.z)
        grid = np.linspace(z.min(), z.max(), n_grid + 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            Qv = np.abs((self.q[None, :] / (grid[:, None] - z[None, :]))
                        .sum(axis=1))
        Qv[~np.isfinite(Qv)] = np.inf
        return float(grid[int(np.argmin(Qv))])


def _print_prom_matrices(iodata, sop, post_dir, V, labels, orth_R,
                         n_port_modes, K, C, M):
    """Write the circuit-synthesis reduced matrices rom-Linv/rom-C/rom-Rinv
    (+ the orthogonalization matrix R) as CSV tables (reference:
    romoperator.cpp:970-1094 CalculateNormalizedPROMMatrices /
    PrintPROMMatrices).  Port rows/cols are scaled by orth_R's diagonal to
    recover the physical port-port circuit block; sample rows keep unit
    scaling (their normalization is irrelevant for port quantities)."""
    import os

    from palace_tpu.config import ValueType
    from palace_tpu.post.tables import Column, Table

    units = iodata.units
    m = len(V)
    Vm = np.stack(V, axis=1)
    R = np.zeros((m, m), complex)
    for j, col in enumerate(orth_R):
        R[: len(col), j] = col
    v_conc = np.ones(m)
    for j in range(n_port_modes):
        v_conc[j] = R[j, j].real
    D = np.diag(v_conc)

    Kr = D @ (Vm.conj().T @ (K @ Vm)) @ D
    Mr = D @ (Vm.conj().T @ (M @ Vm)) @ D
    Cr = D @ (Vm.conj().T @ (C @ Vm)) @ D if C is not None else None

    L_inv = Kr / units.scale_factor(ValueType.INDUCTANCE)
    C_mat = Mr * units.scale_factor(ValueType.CAPACITANCE)
    R_inv = (Cr / units.scale_factor(ValueType.IMPEDANCE)
             if Cr is not None else None)

    def write(mat, name):
        t = Table()
        cols = [t.add(Column(f"c{i}", lab, precision=17))
                for i, lab in enumerate(labels)]
        for i in range(m):
            for j in range(m):
                cols[j].data.append(float(mat[i, j]))
        t.write(os.path.join(post_dir, name))

    write(L_inv.real, "rom-Linv-re.csv")
    write(C_mat.real, "rom-C-re.csv")
    if np.iscomplexobj(K) and np.abs(L_inv.imag).max() > 0:
        write(L_inv.imag, "rom-Linv-im.csv")
        write(C_mat.imag, "rom-C-im.csv")
    if R_inv is not None:
        write(R_inv.real, "rom-Rinv-re.csv")
        if np.iscomplexobj(C) and np.abs(R_inv.imag).max() > 0:
            write(R_inv.imag, "rom-Rinv-im.csv")
    write(R.real, "rom-orthogonalization-matrix-R.csv")


def sweep_adaptive(iodata, sop: SpaceOperator, omegas, excitations,
                   post_dir: str | None = None
                   ) -> Dict[Tuple[int, int], np.ndarray]:
    from palace_tpu.linalg.ordering import dof_coordinates, splu_nd

    cfg = iodata.solver.driven
    tol = cfg.adaptive_tol
    max_size = max(cfg.adaptive_max_size, 4)
    conv_memory = max(cfg.adaptive_memory, 1)

    K = sop.stiffness_csr()
    C = sop.damping_csr()
    M = sop.mass_csr()
    coords = dof_coordinates(sop.space)
    rhs1 = {ex: sop.rhs1(ex).astype(complex) for ex in excitations}
    wave_ports = {idx: wp for idx, wp in sop.wave_ports.items() if wp.active}
    Mwp = {idx: sop._csr([(np.asarray(bk.gidx), np.asarray(bk.A))])
           for idx, bk in ((idx, sop._waveport_mass_bucket(
               idx, sop._wp_trace_bases[idx])) for idx in wave_ports)}
    free_mask = ~sop.ess_mask

    def kn(idx, omega):
        # Propagation-constant real part only, matching the uniform-sweep
        # convention (spaceoperator.waveport_a2_csr) and the reference ROM
        # (romoperator.cpp:889 via GetWavePortKn -> kn0.real()): the wave
        # -port DtN term is i*Re{kn}*Mwp even for lossy/near-cutoff modes.
        return float(wave_ports[idx].solve_mode(omega).kn.real)

    import scipy.sparse as sp

    free = sp.diags(free_mask.astype(float))
    Mwp = {idx: (free @ Mp @ free).tocsr() for idx, Mp in Mwp.items()}

    # Non-factorable A2(omega) terms (finite-conductivity skin depth ~
    # sqrt(omega), 2nd-order ABC ~ 1/omega): the ROM cannot pre-reduce them,
    # so re-assemble and re-project at every evaluation frequency — the
    # reference's slow path (romoperator.hpp:186-189 "not all terms are
    # frequency-independent", romoperator.cpp assemble per omega).
    has_slow_a2 = bool(sop._conductivity) or sop._abc2_tb is not None
    _a2_cache: Dict[float, object] = {}

    def a2_extra(omega):
        if not has_slow_a2:
            return None
        key = float(omega)
        if key not in _a2_cache:
            A = None
            for f in (sop.conductivity_a2_csr, sop.abc2_a2_csr):
                X = f(omega)
                if X is not None:
                    A = X if A is None else A + X
            _a2_cache[key] = (free @ A @ free).tocsr() if A is not None \
                else None
        return _a2_cache[key]

    def assemble(omega):
        # PEC-eliminated wave-port term (system_csr applies DIAG_ONE).
        A = sop.system_csr(omega, K, C, M)
        for idx, Mp in Mwp.items():
            A = (A + 1j * kn(idx, omega) * Mp).tocsr()
        X = a2_extra(omega)
        if X is not None:
            A = (A + X).tocsr()
        return A

    def rhs(ex, omega):
        b = 1j * omega * rhs1[ex]
        if wave_ports:
            b = b + sop.waveport_rhs2(ex, omega)
        return b

    # Greedy HDM solves: the device FGMRES + p-MG solver with lazily added
    # sample frequencies (device_ksp.add_omega) — each greedy sample would
    # otherwise pay a full sparse-direct factorization, which is what blew
    # the cpw adaptive cases past their wall-clock budget (reference:
    # drivensolver.cpp adaptive loop reuses the same ksp too).
    _dev = {"solver": None, "omega_idx": {}}

    def _device_solver():
        if _dev["solver"] is None:
            from palace_tpu.drivers.driven import use_device_ksp
            from palace_tpu.linalg.device_ksp import BlockedDeviceSolver

            if not (use_device_ksp(iodata, sop.space.num_dofs)
                    and not has_slow_a2):
                _dev["solver"] = False
            else:
                lin = iodata.solver.linear
                try:
                    _dev["solver"] = BlockedDeviceSolver(
                        sop.space, iodata.boundaries.pec,
                        sop.driven_terms([]), [], sop.ess_mask,
                        tol=lin.tol, max_its=lin.max_its,
                        restart=(lin.max_size if lin.max_size > 0 else 30),
                        max_block=1,
                        log=lambda s: print_log(iodata, s))
                except Exception as e:
                    print_log(iodata, f"  PROM: device solver unavailable "
                                      f"({e!r}); sparse-direct HDM solves")
                    _dev["solver"] = False
        return _dev["solver"]

    def solve_hdm(omega, ex):
        from palace_tpu.utils import provenance

        provenance.record("solver_path", "prom-adaptive")
        solver = _device_solver()
        provenance.record(
            "prom_hdm_path",
            "device" if solver is not False else "direct")
        if solver is not False:
            if omega not in _dev["omega_idx"]:
                _dev["omega_idx"][omega] = solver.add_omega(omega)
            b = rhs(ex, omega).copy()
            b[~free_mask] = 0.0
            X, info = solver.solve(b[:, None],
                                   omega_idx=[_dev["omega_idx"][omega]])
            if float(np.max(info["relres"])) <= max(
                    100.0 * iodata.solver.linear.tol, 1e-8):
                return X[:, 0]
            print_log(iodata, "  PROM: device HDM solve not converged; "
                              "sparse-direct fallback for this sample")
            provenance.add("prom_hdm_direct_fallbacks", 1)
        lu = splu_nd(assemble(omega).tocsc(), coords)
        return lu.solve(rhs(ex, omega))

    V: List[np.ndarray] = []
    labels: List[str] = []
    orth_R: List[np.ndarray] = []

    def add_vector(w, label):
        before = len(V)
        _orthonormalize(V, w, orth_R)
        if len(V) > before:
            labels.append(label)

    def add_solution(E, label="sample"):
        add_vector(E.real.astype(complex), label)
        add_vector(1j * E.imag.astype(complex), label)

    # Circuit synthesis: seed the basis with the lumped-port mode fields so
    # the reduced K/C/M carry a port-port circuit block (reference:
    # romoperator.cpp:624-675 AddLumpedPortModesForSynthesis; port modes
    # come first and in port order).
    synthesis = bool(getattr(cfg, "adaptive_circuit_synthesis", False))
    n_port_modes = 0
    if synthesis:
        for idx in sorted(sop.ports):
            et = sop.lumped_port_primary_et(idx).astype(complex)
            add_vector(et, f"port_{idx}")
        n_port_modes = len(V)

    def reduced_tables():
        Vm = np.stack(V, axis=1)  # (n, m)
        Kr = Vm.conj().T @ (K @ Vm)
        Cr = Vm.conj().T @ (C @ Vm) if C is not None else None
        Mr = Vm.conj().T @ (M @ Vm)
        Wr = {idx: Vm.conj().T @ (Mp @ Vm) for idx, Mp in Mwp.items()}
        b1r = {ex: Vm.conj().T @ rhs1[ex] for ex in excitations}
        return Vm, Kr, Cr, Mr, Wr, b1r

    def prom_solve(om, ex, tabs):
        Vm, Kr, Cr, Mr, Wr, b1r = tabs
        Ar = Kr - om * om * Mr
        if Cr is not None:
            Ar = Ar + 1j * om * Cr
        for idx, W in Wr.items():
            Ar = Ar + 1j * kn(idx, om) * W
        X = a2_extra(om)
        if X is not None:
            Ar = Ar + Vm.conj().T @ (X @ Vm)  # slow path: project per omega
        br = 1j * om * b1r[ex]
        if wave_ports:
            br = br + Vm.conj().T @ sop.waveport_rhs2(ex, om)
        return np.linalg.solve(Ar, br)

    omega_lo, omega_hi = float(min(omegas)), float(max(omegas))
    total_hdm = 0
    for ex in excitations:
        mri = MinimalRationalInterpolation()
        max_errors = []
        sample_no = 0
        # Endpoint initialization (drivensolver.cpp:1167 prom_indices).
        for om in (omega_lo, omega_hi):
            E = solve_hdm(om, ex)
            total_hdm += 1
            add_solution(E, f"sample_e{ex}_s{sample_no}")
            sample_no += 1
            mri.add_sample(om, E)
        max_errors = [math.inf, math.inf]  # endpoint estimates inaccurate
        memory = 0
        it = 2
        while it < max_size and memory < conv_memory:
            om_star = mri.find_max_error()
            E = solve_hdm(om_star, ex)
            total_hdm += 1
            tabs = reduced_tables()
            z = prom_solve(om_star, ex, tabs)
            err = (np.linalg.norm(tabs[0] @ z - E)
                   / max(np.linalg.norm(E), 1e-300))
            max_errors.append(err)
            memory = memory + 1 if err < tol else 0
            print_log(iodata, f"  PROM greedy it {it - 1} (n = {len(V)}): "
                              f"omega* = {om_star:.6f}, error = {err:.3e}, "
                              f"memory = {memory}/{conv_memory}")
            add_solution(E, f"sample_e{ex}_s{sample_no}")
            sample_no += 1
            mri.add_sample(om_star, E)
            it += 1
        status = ("converged" if memory >= conv_memory
                  else "reached maximum samples")
        print_log(iodata, f"  PROM {status}: {it} samples, basis {len(V)}, "
                          f"last error {max_errors[-1]:.3e} (tol {tol:.1e})")

    if synthesis and post_dir is not None:
        _print_prom_matrices(iodata, sop, post_dir, V, labels, orth_R,
                             n_port_modes, K, C, M)

    # Online sweep.
    tabs = reduced_tables()
    Vm = tabs[0]
    sols = {}
    for i, om in enumerate(omegas):
        for ex in excitations:
            sols[(ex, i)] = Vm @ prom_solve(om, ex, tabs)
    print_log(iodata, f"  PROM online: {len(omegas)} frequencies x "
                      f"{len(excitations)} excitations (basis {len(V)}, "
                      f"{total_hdm} HDM solves)")
    return sols
