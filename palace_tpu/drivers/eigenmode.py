"""Eigenmode driver (reference: palace/drivers/eigensolver.cpp).

Solves the damped Maxwell eigenproblem (K + lam C + lam^2 M) x = 0 with
lam = i omega: K the mu^-1 curl-curl operator (+ inductive boundary terms),
C the conductivity/resistive-boundary damping, M the (complex, lossy)
permittivity mass (+ capacitive boundary terms) — all assembled through the
same SpaceOperator as the driven/transient solves.  Without damping the
linear pencil K x = omega^2 M x is solved directly.

Eigenvectors are normalized to unit M-norm so the per-mode electric field
energy is 1/2 nondimensional (reference: palace/linalg/slepc.cpp:470-510).
Lumped-port postprocessing (V, I, EPR, kappa/Q_ext) follows
postoperator.cpp MeasureLumpedPorts (eigenmode branch).
"""

from __future__ import annotations

import math
import os
import time

import numpy as np

from palace_tpu.config import IoData, ValueType
from palace_tpu.drivers.common import (
    make_output_dir, prepare_mesh, print_log, write_error_indicators,
)
from palace_tpu.linalg.eig import (quadratic_eigs, quadratic_eigs_jd,
                                   shift_invert_eigs)
from palace_tpu.models.spaceoperator import SpaceOperator
from palace_tpu.post.tables import Column, Table, index_column
from palace_tpu.utils import provenance


def solve(iodata: IoData, output_dir: str | None = None):
    t0 = time.time()
    mesh = prepare_mesh(iodata)
    post_dir = make_output_dir(iodata, output_dir)
    units = iodata.units

    cfg = iodata.solver.eigenmode

    def solve_and_estimate(m):
        sop = SpaceOperator(iodata, m)
        if sop._conductivity:
            raise NotImplementedError(
                "conductivity boundaries make the eigenproblem nonlinear in "
                "omega (reference rejects this for non-PEP solvers too)")
        space = sop.space
        print_log(iodata, f"eigenmode: {space.num_dofs} dofs, "
                          f"{m.num_elements} elements")

        Kcsr = sop.stiffness_csr()
        Ccsr = sop.damping_csr()
        Mcsr = sop.mass_csr()
        ess = np.where(sop.ess_mask)[0]

        f_t = units.nondimensionalize(ValueType.FREQUENCY, cfg.target)
        omega_t = 2 * np.pi * f_t
        nev = max(cfg.n, 1)

        # Frequency-dependent boundary terms (wave ports, second-order
        # absorbing) make the EVP nonlinear in omega.  Like the reference's
        # HYBRID solver (eigensolver.cpp:44-71, nleps.cpp
        # NewtonInterpolationOperator), interpolate A2(lam) with a
        # quadratic Newton polynomial on [i w_target, i w_upper] in
        # monomial form A2 ~ P0 + lam P1 + lam^2 P2, then absorb the
        # coefficients into the quadratic pencil.
        def funcA2(om):
            parts = [a for a in (sop.waveport_a2_csr(om),
                                 sop.abc2_a2_csr(om)) if a is not None]
            if not parts:
                return None
            out = parts[0]
            for a in parts[1:]:
                out = (out + a).tocsr()
            return out

        probeA2 = funcA2(omega_t)
        if probeA2 is not None:
            f_u = cfg.target_upper
            f_u = units.nondimensionalize(ValueType.FREQUENCY,
                                          f_u if f_u > 0 else 3 * cfg.target)
            om_u = 2 * np.pi * f_u
            pts = [1j * omega_t, 1j * 0.5 * (omega_t + om_u), 1j * om_u]
            S = [probeA2, funcA2(0.5 * (omega_t + om_u)), funcA2(om_u)]
            d01 = (S[1] - S[0]) * (1.0 / (pts[1] - pts[0]))
            d12 = (S[2] - S[1]) * (1.0 / (pts[2] - pts[1]))
            d012 = (d12 - d01) * (1.0 / (pts[2] - pts[0]))
            P2 = d012
            P1 = d01 - (pts[0] + pts[1]) * d012
            P0 = S[0] - pts[0] * d01 + pts[0] * pts[1] * d012
            Kcsr = (Kcsr + P0).tocsr()
            Ccsr = (P1 if Ccsr is None else Ccsr + P1).tocsr()
            Mcsr = (Mcsr + P2).tocsr()
        # Request extra vectors (the gradient-nullspace cluster at
        # lambda = 0 is filtered below); grow the subspace and retry if the
        # filter leaves fewer than the n requested physical modes.
        # Div-free projector data for damped solves (reference:
        # eigensolver.cpp:204-218 — disabled for Floquet/London problems).
        divfree = None
        m_ = sop.materials
        has_london = any(abs(l) > 0 for l in m_.london_depth.values())
        if (sop.K_flo_mass is None and not has_london
                and Ccsr is not None and abs(Ccsr).max() > 0):
            from palace_tpu.fem.h1 import H1Space
            from palace_tpu.fem.nd_operators import nd_h1_gradient

            try:
                h1 = H1Space(sop.mesh, iodata.solver.order)
                G = nd_h1_gradient(space, h1).tocsr()
                # Constrain the auxiliary H1 space on every lossy/port
                # boundary (reference: spaceoperator.cpp:193-204
                # aux_bdr_marker): only gradients vanishing on damped
                # surfaces satisfy g^H C x = 0, so only they may be
                # projected out of the damped pencil without corrupting
                # its spectrum.
                aux = sop.aux_bdr_attrs()
                if aux:
                    bdr = np.asarray(h1.boundary_dofs(aux), np.int64)
                    keep_h1 = np.setdiff1d(np.arange(G.shape[1]), bdr)
                    G = G[:, keep_h1].tocsr()
                divfree = (G, sop._csr(sop._combine(sop.M_re, [])))
            except (NotImplementedError, RuntimeError):
                divfree = None
        extra = 8
        for attempt in range(3):
            k_req = 2 * nev + extra
            if Ccsr is not None and abs(Ccsr).max() > 0:
                # Fast path first: lossless-seeded subspace projection
                # (linalg/eig.py quadratic_eigs_jd) — one Hermitian
                # shift-invert solve for the seed plus one complex
                # factorization.  Falls back to the companion-ARPACK
                # iteration when the pencil is too strongly damped for the
                # seed to converge (reference: SLEPc PEP/TOAR,
                # drivers/eigensolver.cpp:98-155).
                result = None
                # Retry the JD fast path once with doubled seeds before
                # conceding to the slow companion ARPACK: the seed pencils
                # deliver one lossless mode per vector, so when the junk
                # filter leaves fewer than the n requested physical pairs
                # (keep-count below), a 2x seed almost always covers the
                # deficit at a fraction of ARPACK's cost.
                if attempt <= 1:
                    try:
                        from palace_tpu.linalg.eig import quadratic_eigs_jd

                        Kre = Kcsr.real if np.iscomplexobj(
                            Kcsr.data) else Kcsr
                        Mre = Mcsr.real if np.iscomplexobj(
                            Mcsr.data) else Mcsr
                        k_seed = min((nev + 8) << attempt,
                                     Kcsr.shape[0] // 4)
                        seed = shift_invert_eigs(
                            Kre.tocsr(), Mre.tocsr(), ess, omega_t ** 2,
                            k_seed, tol=min(cfg.tol, 1e-9))
                        X0 = seed.eigenvectors
                        # Strong damping (e.g. near-PEC impedance walls,
                        # 1/Rs >> omega): the true modes approach the
                        # PEC-wall modes, which are orthogonal to the
                        # natural-BC seed above.  Union in a second seed
                        # with the damped-surface dofs held at zero so the
                        # projection subspace covers both regimes.
                        cd = np.abs(np.asarray(Ccsr.diagonal()))
                        damped = np.where(cd > 1e-12 * cd.max())[0] \
                            if cd.max() > 0 else np.zeros(0, np.int64)
                        md = np.abs(np.asarray(Mcsr.diagonal()))[damped]
                        strong = (len(damped) and np.median(
                            cd[damped] / np.maximum(omega_t * md.real,
                                                    1e-300)) > 10.0)
                        if strong:
                            ess2 = np.union1d(ess, damped)
                            if len(ess2) < Kcsr.shape[0] - 4 * k_seed:
                                seed2 = shift_invert_eigs(
                                    Kre.tocsr(), Mre.tocsr(), ess2,
                                    omega_t ** 2, k_seed,
                                    tol=min(cfg.tol, 1e-9))
                                X0 = np.concatenate(
                                    [X0, seed2.eigenvectors], axis=1)
                        result = quadratic_eigs_jd(
                            Kcsr, Ccsr, Mcsr, ess, 1j * omega_t,
                            nev + 4 + 8 * attempt, X0, tol=cfg.tol,
                            divfree=divfree,
                            log=lambda s: print_log(iodata, s),
                            # The tight polish refactorizes P(lam) per RQI
                            # step; affordable below ~150k reduced dofs
                            # (cylinder impedance: +5 min), prohibitive on
                            # the ~400k-dof cpw meshes (pushed a 1243 s
                            # solve past 1800 s).
                            polish_tol=(min(cfg.tol * 1e-4, 1e-10)
                                        if Kcsr.shape[0] < 150_000
                                        else None),
                            n_polish=cfg.n + 2)
                    except Exception as e:
                        print_log(iodata, f"quadratic JD fast path "
                                          f"unavailable ({e!r})")
                        result = None
                if result is not None:
                    provenance.record("eigen_path", "quadratic-jd")
                else:
                    # cfg.tol is the user's declaration tolerance verbatim
                    # (the default is already 1e-6; strongly non-normal
                    # pencils converge much faster there, but an explicitly
                    # tighter request must be honored — reference
                    # ARPACK/SLEPc pass the config Tol through unchanged,
                    # eigensolver.cpp:169-176).
                    result = quadratic_eigs(Kcsr, Ccsr, Mcsr, ess,
                                            1j * omega_t, k_req,
                                            tol=cfg.tol, divfree=divfree)
                    provenance.record("eigen_path", "quadratic-arpack")
                omega = -1j * result.eigenvalues  # lam = i omega
            else:
                from palace_tpu.drivers.driven import use_device_ksp

                # Floquet terms make K complex (non-Hermitian-Lanczos);
                # stay on the host shift-invert path for those.
                lossless_linear = (probeA2 is None and sop.M_im is None
                                   and sop.K_flo_mass is None)
                if lossless_linear and use_device_ksp(iodata,
                                                      space.num_dofs):
                    from palace_tpu.linalg.device_eig import (
                        device_shift_invert_eigs)

                    result = device_shift_invert_eigs(
                        space, list(iodata.boundaries.pec),
                        sop._combine(sop.K_dom, sop.K_bdr),
                        sop._combine(sop.M_re, sop.M_bdr),
                        sop.ess_mask, omega_t ** 2, k_req, tol=cfg.tol,
                        nconv=min(k_req, cfg.n + 4),
                        log=lambda s: print_log(iodata, s))
                    provenance.record("eigen_path", "device-lanczos")
                else:
                    result = shift_invert_eigs(
                        Kcsr, Mcsr, ess, omega_t ** 2, k_req, tol=cfg.tol,
                        which=("LR" if sop.K_flo_mass is not None
                               else "LM"))
                    provenance.record("eigen_path", "host-arpack")
                omega = np.sqrt(result.eigenvalues.astype(complex))
            keep = (np.real(omega) > max(1e-8, 1e-3 * abs(omega_t)))
            if sop.K_flo_mass is not None:
                # Reference shift-invert installs an RG interval region
                # [sigma, inf) (slepc.cpp:432-445): modes below the target
                # are discarded, which excludes the Floquet quasi-periodic
                # spurious gradient band (lam <= 2 k^T mu^-1 k / eps).
                keep &= (np.real(omega) >= omega_t * (1.0 - 1e-9))
            if probeA2 is not None:
                # Nonlinear case: the interpolated pencil sprays spurious
                # anti-damped modes; keep the physical branch above the
                # target (reference: nleps.cpp:786 Im lam > Im sigma).
                keep &= (np.real(omega) > omega_t)
                keep &= (np.imag(omega) > -1e-2 * abs(omega_t))
            if keep.sum() >= cfg.n or 2 * nev + extra > Kcsr.shape[0] // 4:
                break
            extra = 2 * extra + 2 * nev

        # Drop the gradient-nullspace cluster near omega = 0 (the role of
        # the div-free projection, reference: palace/linalg/divfree.hpp),
        # sort ascending Re(omega), keep n.
        omega = omega[keep]
        order = np.argsort(np.real(omega))[: cfg.n]
        vecs = result.eigenvectors[:, keep][:, order]
        res = result.residuals[keep][order]
        bkwd = result.backward_errors[keep][order]
        omega = omega[order]

        if probeA2 is not None and len(omega) < cfg.n:
            # The interpolated pencil's reach around the shift is limited;
            # harvest additional candidates from a second PEP targeted
            # above the highest mode found so far.
            sig2 = 1.15 * (np.real(omega).max() if len(omega) else omega_t)
            for _ in range(3):
                r2 = quadratic_eigs(Kcsr, Ccsr, Mcsr, ess, 1j * sig2,
                                    2 * nev + 8, tol=cfg.tol)
                om2 = -1j * r2.eigenvalues
                k2 = ((np.real(om2) > omega_t)
                      & (np.imag(om2) > -1e-2 * abs(omega_t)))
                fresh = [j for j in np.where(k2)[0]
                         if all(abs(om2[j] - o) > 1e-6 * abs(o)
                                for o in omega)]
                if fresh:
                    fr = sorted(fresh, key=lambda j: np.real(om2[j]))
                    fr = fr[: cfg.n - len(omega)]
                    omega = np.concatenate([omega, om2[fr]])
                    vecs = np.concatenate([vecs, r2.eigenvectors[:, fr]],
                                          axis=1)
                    res = np.concatenate([res, r2.residuals[fr]])
                    bkwd = np.concatenate([bkwd, r2.backward_errors[fr]])
                if len(omega) >= cfg.n:
                    break
                sig2 *= 1.2

        if probeA2 is not None:
            # Refine each interpolated eigenpair against the true nonlinear
            # problem by fixed-point iteration: freeze A2 at the mode's
            # current (real) frequency, re-solve the quadratic pencil
            # targeted at the mode, repeat.  At convergence
            # (K + A2(Re w*) + lam C + lam^2 M) u = 0 holds with A2
            # evaluated at the eigenfrequency — the same semantics as the
            # reference's HYBRID refinement (eigensolver.cpp / nleps.cpp).
            K0 = sop.stiffness_csr()
            C0 = sop.damping_csr()
            M0 = sop.mass_csr()
            for i in range(len(omega)):
                om = omega[i]
                x = vecs[:, i]
                rr = j = None
                for _ in range(12):
                    A2f = funcA2(float(np.real(om)))
                    Kf = (K0 + A2f).tocsr()
                    Cf = (C0 + 0 * A2f).tocsr() if C0 is not None else \
                        (0 * A2f).tocsr()
                    # Seeded subspace solve (1 factorization, 1-2 rounds):
                    # the current eigenpair is already in the quadratic
                    # basin, so the JD projection converges immediately —
                    # a full companion-ARPACK re-solve per fixed-point
                    # iteration (the old path) dominated the nonlinear
                    # eigen wall-clock (cpw_wave_eigen timed out at 2700s).
                    rr = quadratic_eigs_jd(
                        Kf, Cf, M0, ess, 1j * om, 1, x[:, None],
                        tol=max(cfg.tol, 1e-10), max_rounds=6,
                        log=lambda s: print_log(iodata, s))
                    if rr is None:
                        rr = quadratic_eigs(Kf, Cf, M0, ess, 1j * om, 4,
                                            tol=cfg.tol)
                    omr = -1j * rr.eigenvalues
                    j = int(np.argmin(np.abs(omr - om)))
                    dw = abs(omr[j] - om) / max(abs(om), 1e-30)
                    om = omr[j]
                    x = rr.eigenvectors[:, j]
                    if dw < max(cfg.tol, 1e-9):
                        break
                omega[i] = om
                vecs[:, i] = x
                res[i] = rr.residuals[j]
                bkwd[i] = rr.backward_errors[j]
            order = np.argsort(np.real(omega))
            omega, vecs = omega[order], vecs[:, order]
            res, bkwd = res[order], bkwd[order]
        # Curl-flux error indicators per mode, normalized by the mode
        # energy (unit M-norm: E_elec = 1/4 -> total E = 1/2).
        from palace_tpu.fem.estimators import (
            curl_flux_indicators, grad_flux_indicators)

        eta2, energies = [], []
        for i in range(len(omega)):
            x = vecs[:, i]
            mnorm2 = abs(np.real(np.conj(x) @ (Mcsr @ x)))
            x = x / math.sqrt(mnorm2)
            vecs[:, i] = x
            # Combined grad + curl flux indicators with B = -i/omega curl E
            # (reference: eigensolver.cpp:339-343 TimeDependentFlux with
            # E, B fields; B scales the curl part by 1/|omega|^2), Et the
            # mode's total energy (E_elec + E_mag = 2 E_elec for the
            # unit-M-normalized lossless mode).
            is_2d = m.nodes.shape[1] == 2
            if is_2d:
                # The reference's 2D B path yields B ~ 0 (committed refs
                # show E_mag ~ 1e-16 and noise-level curl estimates), so the
                # 2D indicator is the grad part only (BoundaryModeFlux with
                # zero B; see KNOWN_GAPS "2D E_mag" note).
                e2 = np.zeros(m.num_elements)
            else:
                e2 = curl_flux_indicators(
                    space, sop.materials, x,
                    floquet_k=sop.floquet_k) / abs(omega[i]) ** 2
            try:
                e2 = e2 + grad_flux_indicators(space, sop.materials, x)
            except NotImplementedError:
                pass  # RT on hex/prism meshes: curl-only indicators
            eta2.append(e2)
            E_elec = 0.5 * _quad(sop.M_re, x)
            E_mag = (0.0 if is_2d
                     else 0.5 * (_quad(sop.K_dom, x)
                                 + sop.floquet_mag_quad(
                                     x, abs(omega[i]))) / abs(omega[i]) ** 2)
            E_cap = E_ind = 0.0
            for idx, port in sop.ports.items():
                s, v = sop.port_functionals(idx)
                Vp = complex(np.dot(v, x))
                if abs(port.C) > 0:
                    E_cap += 0.5 * abs(port.C) * float(
                        np.real(Vp * np.conj(Vp)))
                if abs(port.L) > 0:
                    Ip = Vp / port.characteristic_impedance(
                        float(np.real(omega[i])), "L")
                    E_ind += 0.5 * abs(port.L) * float(
                        np.real(Ip * np.conj(Ip)))
            energies.append(E_elec + E_mag + E_cap + E_ind)
        return ((sop, Kcsr, Ccsr, Mcsr, omega, vecs, res, bkwd),
                eta2, energies, space.num_dofs)

    from palace_tpu.drivers.amr import adapt_loop

    ((sop, Kcsr, Ccsr, Mcsr, omega, vecs, res, bkwd),
     eta_elem, eta_norm, mesh, n_adapt) = adapt_loop(
         iodata, mesh, solve_and_estimate, post_dir=post_dir)
    space = sop.space

    ghz = units.scale_factor(ValueType.FREQUENCY)
    f = omega / (2 * np.pi) * ghz
    t = Table()
    t.add(index_column("m"))
    t.add(Column("refreq", "Re{f} (GHz)"))
    t.add(Column("imfreq", "Im{f} (GHz)"))
    t.add(Column("q", "Q"))
    t.add(Column("err_bkwd", "Error (Bkwd.)"))
    t.add(Column("err_abs", "Error (Abs.)"))
    for i in range(len(omega)):
        fi = f[i]
        Q = (abs(fi) / (2 * fi.imag)) if fi.imag != 0 else np.inf
        t.col("i").data.append(float(i + 1))
        t.col("refreq").data.append(fi.real)
        t.col("imfreq").data.append(fi.imag)
        t.col("q").data.append(Q if np.isfinite(Q) else 0.0)
        t.col("err_bkwd").data.append(bkwd[i])
        t.col("err_abs").data.append(res[i])
    t.write(os.path.join(post_dir, "eig.csv"))

    # Normalize to unit M-norm.
    modes = []
    for i in range(len(omega)):
        x = vecs[:, i]
        mnorm2 = abs(np.real(np.conj(x) @ (Mcsr @ x)))
        modes.append(x / math.sqrt(mnorm2))

    _write_domain_energy(iodata, sop, post_dir, omega, modes, Kcsr, Mcsr)
    if sop.ports:
        _write_port_tables(iodata, sop, post_dir, omega, modes)
    if iodata.boundaries.surface_fluxes or iodata.boundaries.dielectrics:
        _write_surface_tables(iodata, sop, post_dir, omega, modes)
    _write_farfield_eigen(iodata, sop, post_dir, omega, modes)

    # ParaView mode-field output.
    if iodata.problem.output_formats.paraview and cfg.n_post > 0 and modes:
        from palace_tpu.post.paraview import ParaviewSaver, nodal_average_nd

        pv = ParaviewSaver(post_dir, "eigenmode", mesh)
        for i in range(min(cfg.n_post, len(modes))):
            x = modes[i]
            Ev = nodal_average_nd(space, np.real(x).copy()) \
                + 1j * nodal_average_nd(space, np.imag(x).copy())
            pv.save(float(i + 1),
                    {"E_real": np.real(Ev), "E_imag": np.imag(Ev)})
        pv.finalize()

    write_error_indicators(post_dir, [eta_elem**2], [None])
    from palace_tpu.post import metadata
    metadata.save_problem(post_dir, "Eigenmode", mesh.num_elements,
                          space.num_dofs)
    metadata.save_timing(post_dir)
    print_log(iodata, f"eigenmode done in {time.time() - t0:.1f}s; "
                      f"f[0] = {f[0].real:.6f} GHz" if len(f) else "no modes")
    return dict(frequencies_ghz=f, post_dir=post_dir, num_dofs=space.num_dofs,
                modes=np.stack(modes, axis=1) if modes else None)


def _write_domain_energy(iodata, sop, post_dir, omega, modes, Kcsr, Mcsr):
    units = iodata.units
    Escale = units.scale_factor(ValueType.ENERGY)
    td = Table()
    td.add(index_column("m"))
    td.add(Column("Ee", "E_elec (J)"))
    td.add(Column("Em", "E_mag (J)"))
    td.add(Column("Ec", "E_cap (J)"))
    td.add(Column("Ei", "E_ind (J)"))
    for ecfg in iodata.domains.energies:
        td.add(Column(f"Ee{ecfg.index}", f"E_elec[{ecfg.index}] (J)"))
        td.add(Column(f"pe{ecfg.index}", f"p_elec[{ecfg.index}]"))
        td.add(Column(f"Em{ecfg.index}", f"E_mag[{ecfg.index}] (J)"))
        td.add(Column(f"pm{ecfg.index}", f"p_mag[{ecfg.index}]"))
    is_2d = sop.mesh.nodes.shape[1] == 2
    for i in range(len(omega)):
        x = modes[i]
        Ee = 0.5 * _quad(sop.M_re, x)
        # 2D: mirror the reference's zero B-energy output convention
        # (committed 2D refs have E_mag ~ 1e-16; see KNOWN_GAPS).
        Em = (0.0 if is_2d else
              0.5 * (_quad(sop.K_dom, x) + sop.floquet_mag_quad(
                  x, abs(omega[i]))) / abs(omega[i]) ** 2)
        Ec = Ei = 0.0
        for idx, port in sop.ports.items():
            s, v = sop.port_functionals(idx)
            V = complex(np.dot(v, x))
            if abs(port.L) > 0:
                I = V / port.characteristic_impedance(np.real(omega[i]), "L")
                Ei += 0.5 * abs(port.L) * float(np.real(I * np.conj(I)))
            if abs(port.C) > 0:
                Ec += 0.5 * abs(port.C) * float(np.real(V * np.conj(V)))
        td.col("i").data.append(float(i + 1))
        td.col("Ee").data.append(Ee * Escale)
        td.col("Em").data.append(Em * Escale)
        td.col("Ec").data.append(Ec * Escale)
        td.col("Ei").data.append(Ei * Escale)
        for ecfg in iodata.domains.energies:
            EeA = 0.5 * _masked_quad(sop, sop.M_re, x, ecfg.attributes)
            EmA = (0.0 if is_2d else 0.5 * (
                _masked_quad(sop, sop.K_dom, x, ecfg.attributes)
                + sop.floquet_mag_quad(x, abs(omega[i]), ecfg.attributes)
            ) / abs(omega[i]) ** 2)
            td.col(f"Ee{ecfg.index}").data.append(EeA * Escale)
            td.col(f"pe{ecfg.index}").data.append(EeA / Ee if Ee > 0 else 0.0)
            td.col(f"Em{ecfg.index}").data.append(EmA * Escale)
            # Em == 0 (2D): the reference's ratio of two zero-measures is
            # exactly 1.0 when the region spans the measured support.
            td.col(f"pm{ecfg.index}").data.append(
                EmA / Em if Em > 0 else (1.0 if is_2d else 0.0))
    td.write(os.path.join(post_dir, "domain-E.csv"))


def _write_surface_tables(iodata, sop, post_dir, omega, modes):
    """surface-F.csv / surface-Q.csv per eigenmode (reference:
    postoperatorcsv.cpp PrintSurfaceF/PrintSurfaceQ with the "m" index
    column in the eigenmode branch; measurements via postoperator.cpp
    MeasureSurfaceFlux / MeasureInterfaceEFieldEnergy)."""
    from palace_tpu.drivers.driven import build_surface_traces
    from palace_tpu.post.surfaces import interface_energy, surface_flux

    units = iodata.units
    traces = build_surface_traces(iodata, sop)
    fluxes = iodata.boundaries.surface_fluxes
    diels = iodata.boundaries.dielectrics

    if fluxes:
        Qc = units.scale_factor(ValueType.CAPACITANCE) * units.scale_factor(
            ValueType.VOLTAGE)
        Wb = units.scale_factor(ValueType.INDUCTANCE) * units.scale_factor(
            ValueType.CURRENT)
        W = units.scale_factor(ValueType.POWER)
        t = Table()
        t.add(index_column("m"))
        for fcfg in fluxes:
            i = fcfg.index
            if fcfg.type == "Electric":
                t.add(Column(f"fr{i}", f"Re{{Φ_elec[{i}]}} (C)"))
                t.add(Column(f"fi{i}", f"Im{{Φ_elec[{i}]}} (C)"))
            elif fcfg.type == "Magnetic":
                t.add(Column(f"fr{i}", f"Re{{Φ_mag[{i}]}} (Wb)"))
                t.add(Column(f"fi{i}", f"Im{{Φ_mag[{i}]}} (Wb)"))
            else:
                t.add(Column(f"fr{i}", f"Φ_pow[{i}] (W)"))
        for i in range(len(omega)):
            t.col("i").data.append(float(i + 1))
            om = abs(float(np.real(omega[i])))
            for fcfg in fluxes:
                v = surface_flux(sop, fcfg, traces["flux"][fcfg.index],
                                 modes[i], omega=om)
                scale = {"Electric": Qc, "Magnetic": Wb, "Power": W}[fcfg.type]
                t.col(f"fr{fcfg.index}").data.append(v.real * scale)
                if fcfg.type != "Power":
                    t.col(f"fi{fcfg.index}").data.append(v.imag * scale)
        t.write(os.path.join(post_dir, "surface-F.csv"))

    if diels:
        t = Table()
        t.add(index_column("m"))
        for d in diels:
            t.add(Column(f"p{d.index}", f"p_surf[{d.index}]"))
            t.add(Column(f"q{d.index}", f"Q_surf[{d.index}]"))
        for i in range(len(omega)):
            x = modes[i]
            Ee = 0.5 * _quad(sop.M_re, x)
            E_cap = 0.0
            for idx, port in sop.ports.items():
                if abs(port.C) > 0:
                    s, v = sop.port_functionals(idx)
                    V = complex(np.dot(v, x))
                    E_cap += 0.5 * abs(port.C) * float(np.real(V * np.conj(V)))
            denom = Ee + E_cap
            t.col("i").data.append(float(i + 1))
            for d in diels:
                class _D:
                    type = d.type
                    thickness = d.thickness / units.mesh_length_scale
                    permittivity = d.permittivity

                en = interface_energy(sop, _D, traces["eps"][d.index], x)
                p = en / denom if denom > 0 else 0.0
                Q = (np.inf if (p == 0.0 or d.loss_tan == 0.0)
                     else 1.0 / (d.loss_tan * p))
                t.col(f"p{d.index}").data.append(p)
                t.col(f"q{d.index}").data.append(Q if np.isfinite(Q) else 0.0)
        t.write(os.path.join(post_dir, "surface-Q.csv"))


def _write_farfield_eigen(iodata, sop, post_dir, omega, modes):
    """farfield-rE.csv per eigenmode (reference: postoperatorcsv.cpp
    InitializeFarFieldE/PrintFarFieldE EIGENMODE branch: m, f_re, f_im,
    exc=0, theta, phi, r*E components; kernel evaluated at Re{omega},
    postoperator.cpp:1431-1440)."""
    from palace_tpu.drivers.driven import build_farfield
    from palace_tpu.post.farfield import stratton_chu

    tb, grid = build_farfield(iodata, sop)
    if tb is None:
        return
    units = iodata.units
    ghz = units.scale_factor(ValueType.FREQUENCY)
    V = 1.0 / units.scale_factor(ValueType.FIELD_E)
    t = Table()
    t.add(index_column("m"))
    t.add(Column("fre", "f_re (GHz)"))
    t.add(Column("fim", "f_im (GHz)"))
    t.add(Column("exc", "exc", min_left_padding=2, print_as_int=True))
    t.add(Column("theta", "theta (deg.)", min_left_padding=2))
    t.add(Column("phi", "phi (deg.)", min_left_padding=2))
    for d in ("x", "y", "z"):
        t.add(Column(f"re{d}", f"r*Re{{E_{d}}} (V)"))
        t.add(Column(f"im{d}", f"r*Im{{E_{d}}} (V)"))
    for i in range(len(omega)):
        f = omega[i] / (2 * math.pi) * ghz
        # Complex eigenfrequency: the Stratton-Chu prefactor, phase, and
        # B = -curl E/(i omega) all use the full complex omega (reference:
        # postoperator.cpp:1438-1440 passes freq.real()/freq.imag();
        # strattonchu.cpp:101-140 complex k amplitude+phase).
        om_i = complex(omega[i])
        if om_i.real < 0:
            om_i = -om_i
        rE = stratton_chu(sop, tb, modes[i], om_i, grid)
        for p in range(len(grid)):
            t.col("i").data.append(float(i + 1))
            t.col("fre").data.append(float(np.real(f)))
            t.col("fim").data.append(float(np.imag(f)))
            t.col("exc").data.append(0.0)
            t.col("theta").data.append(math.degrees(grid[p, 0]))
            t.col("phi").data.append(math.degrees(grid[p, 1]))
            for di, d in enumerate(("x", "y", "z")):
                t.col(f"re{d}").data.append(rE[p, di].real * V)
                t.col(f"im{d}").data.append(rE[p, di].imag * V)
    t.write(os.path.join(post_dir, "farfield-rE.csv"))


def _write_port_tables(iodata, sop, post_dir, omega, modes):
    """port-V / port-I / port-EPR / port-Q for eigen modes (reference:
    postoperator.cpp MeasureLumpedPorts eigenmode branch)."""
    units = iodata.units
    Vs = units.scale_factor(ValueType.VOLTAGE)
    As = units.scale_factor(ValueType.CURRENT)
    ghz = units.scale_factor(ValueType.FREQUENCY)
    fn = {idx: sop.port_functionals(idx) for idx in sop.ports}
    with_L = [i for i, p in sop.ports.items() if abs(p.L) > 0]
    with_R = [i for i, p in sop.ports.items() if abs(p.R) > 0]

    tv, ti = Table(), Table()
    for T in (tv, ti):
        T.add(index_column("m"))
    for idx in sop.ports:
        tv.add(Column(f"re{idx}", f"Re{{V[{idx}]}} (V)"))
        tv.add(Column(f"im{idx}", f"Im{{V[{idx}]}} (V)"))
        ti.add(Column(f"re{idx}", f"Re{{I[{idx}]}} (A)"))
        ti.add(Column(f"im{idx}", f"Im{{I[{idx}]}} (A)"))
    tq = Table()
    tq.add(index_column("m"))
    for idx in with_R:
        tq.add(Column(f"q{idx}", f"Q_ext[{idx}]"))
        tq.add(Column(f"k{idx}", f"κ_ext[{idx}] (GHz)"))
    te = Table()
    te.add(index_column("m"))
    for idx in with_L:
        te.add(Column(f"p{idx}", f"p[{idx}]"))

    for i in range(len(omega)):
        x = modes[i]
        om_re = float(np.real(omega[i]))
        Ee = 0.5 * _quad(sop.M_re, x)
        E_cap = 0.0
        for idx, port in sop.ports.items():
            if abs(port.C) > 0:
                V = complex(np.dot(fn[idx][1], x))
                E_cap += 0.5 * abs(port.C) * float(np.real(V * np.conj(V)))
        E_tot = Ee + E_cap
        for T in (tv, ti, tq, te):
            T.col("i").data.append(float(i + 1))
        for idx, port in sop.ports.items():
            V = complex(np.dot(fn[idx][1], x))
            I = 0.0 + 0.0j
            I_R = I_L = 0.0 + 0.0j
            for br, val in (("R", port.R), ("L", port.L), ("C", port.C)):
                if abs(val) > 0:
                    Ib = V / port.characteristic_impedance(om_re, br)
                    I += Ib
                    if br == "R":
                        I_R = Ib
                    if br == "L":
                        I_L = Ib
            tv.col(f"re{idx}").data.append(V.real * Vs)
            tv.col(f"im{idx}").data.append(V.imag * Vs)
            ti.col(f"re{idx}").data.append(I.real * As)
            ti.col(f"im{idx}").data.append(I.imag * As)
            if idx in with_R:
                P_R = 0.5 * abs(port.R) * float(np.real(I_R * np.conj(I_R)))
                kappa = math.copysign(P_R / E_tot, I_R.real) if E_tot > 0 else 0.0
                Q = (om_re / abs(kappa)) if kappa != 0 else np.inf
                tq.col(f"q{idx}").data.append(Q if np.isfinite(Q) else 0.0)
                tq.col(f"k{idx}").data.append(kappa * ghz / (2 * math.pi))
            if idx in with_L:
                p = 0.5 * abs(port.L) * float(np.real(I_L * np.conj(I_L))) / \
                    E_tot if E_tot > 0 else 0.0
                te.col(f"p{idx}").data.append(p)
    tv.write(os.path.join(post_dir, "port-V.csv"))
    ti.write(os.path.join(post_dir, "port-I.csv"))
    if with_R:
        tq.write(os.path.join(post_dir, "port-Q.csv"))
    if with_L:
        te.write(os.path.join(post_dir, "port-EPR.csv"))


def _quad(op, x) -> float:
    tot = 0.0
    for part in (np.real(x), np.imag(x)):
        for e in op.element_energy(np.ascontiguousarray(part)):
            tot += 2.0 * float(np.sum(np.asarray(e)))
    return tot


def _masked_quad(sop, op, x, attrs) -> float:
    s = 0.0
    for part in (np.real(x), np.imag(x)):
        for b, e in zip(sop.mesh.buckets, op.element_energy(
                np.ascontiguousarray(part))):
            s += 2.0 * float(np.sum(np.asarray(e) * np.isin(b.attr, attrs)))
    return s
