"""Transient driver (reference: palace/drivers/transientsolver.cpp,
palace/models/timeoperator.cpp).

First-order ODE system on [dE/dt; E; A_B] where, instead of carrying the RT
B field, we carry the "vector potential accumulator" A_B in the ND space
with B = -curl A_B: every update the reference applies to its RT B dofs is
the curl of an ND-space linear combination (rhs3 = -curl E,
timeoperator.cpp:133-146), so B_ref = -curl(A_B) holds exactly, with the
same time-discretization coefficients, without an RT space.

Time integration: MFEM's first-order generalized-alpha with rho_inf = 1
(midpoint family; timeoperator.cpp:317-322) or singly-diagonal implicit RK
(SDIRK23).  The per-dt implicit system A = dt^2 K + dt C + M is factorized
once and reused every step (timeoperator.cpp:95-109).
"""

from __future__ import annotations

import math
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

from palace_tpu.config import IoData, ValueType
from palace_tpu.drivers.common import (
    make_output_dir, nondim_point, prepare_mesh, print_log,
    write_error_indicators,
)
from palace_tpu.models.spaceoperator import SpaceOperator
from palace_tpu.post.tables import Column, Table
from palace_tpu.utils.excitations import get_excitation


class TransientOperator:
    """M u1' = -(K u2 + C u1) + g'(t) NegJ;  u2' = u1;  A_B' = u2."""

    def __init__(self, iodata: IoData, sop: SpaceOperator, dJ):
        from scipy.sparse.linalg import splu
        import scipy.sparse as sp

        self.sop = sop
        self.dJ = dJ
        ess = sop.ess_mask
        free = sp.diags((~ess).astype(float))
        one = sp.diags(ess.astype(float))
        self.K = (free @ sop.stiffness_csr() @ free).tocsr()
        C = sop.damping_csr()
        self.C = (free @ C @ free).tocsr() if C is not None else None
        M = sop.mass_csr()
        if np.iscomplexobj(M.data):
            raise ValueError("transient solve requires lossless permittivity")
        self.M = (free @ M @ free + one).tocsr()
        excitations = sop.excitations()
        if len(excitations) != 1:
            raise ValueError("transient solve requires exactly one excitation")
        self.excitation_idx = next(iter(excitations))
        self.NegJ = sop.rhs1(self.excitation_idx)
        self._luM = splu(self.M.tocsc())
        self._luA = None
        self._dt = None
        self._splu = splu
        self.tol = iodata.solver.linear.tol

    def rhs(self, u1, u2, t):
        r1 = -(self.K @ u2) + self.dJ(t) * self.NegJ
        if self.C is not None:
            r1 -= self.C @ u1
        return r1

    def mult(self, u1, u2, t):
        """du = f(u, t): (du1, du2)."""
        return self._luM.solve(self.rhs(u1, u2, t)), u1

    def implicit_solve(self, dt, u1, u2, t):
        """Solve M k = f(u + dt k, t): returns (k1, k2) via block elimination
        (reference: timeoperator.cpp:183-224)."""
        if self._luA is None or dt != self._dt:
            import scipy.sparse as sp

            A = (self.M + dt * dt * self.K
                 + (dt * self.C if self.C is not None else 0.0)).tocsc()
            self._luA = self._splu(A)
            self._dt = dt
        r1 = self.rhs(u1, u2, t)
        r2 = u1
        k1 = self._luA.solve(r1 - dt * (self.K @ r2))
        k2 = r2 + dt * k1
        return k1, k2


class SDIRK23:
    """2-stage singly-diagonally-implicit Runge-Kutta (MFEM SDIRK23Solver
    with gamma_opt = 2, the L-stable gamma = (2 - sqrt(2))/2; reference:
    timeoperator.cpp:324-330 TimeSteppingScheme::RUNGE_KUTTA).

    Butcher tableau: a11 = g; a21 = 1 - 2g, a22 = g; b = (1/2, 1/2),
    c = (g, 1 - g)."""

    def __init__(self, op: TransientOperator, gamma_opt: int = 2):
        self.op = op
        if gamma_opt == 2:
            self.g = (2.0 - math.sqrt(2.0)) / 2.0  # L-stable
        elif gamma_opt == 0:
            self.g = (3.0 - math.sqrt(3.0)) / 6.0  # 3rd order, not A-stable
        else:
            self.g = (3.0 + math.sqrt(3.0)) / 6.0  # 3rd order, A-stable

    def step(self, x, t, dt):
        op = self.op
        g = self.g
        u1, u2, aB = x
        k1_1, k1_2 = op.implicit_solve(g * dt, u1, u2, t + g * dt)
        k1_B = u2 + g * dt * k1_2
        c = dt * (1.0 - 2.0 * g)
        k2_1, k2_2 = op.implicit_solve(g * dt, u1 + c * k1_1, u2 + c * k1_2,
                                       t + (1.0 - g) * dt)
        k2_B = (u2 + c * k1_2) + g * dt * k2_2
        h = 0.5 * dt
        return ((u1 + h * (k1_1 + k2_1), u2 + h * (k1_2 + k2_2),
                 aB + h * (k1_B + k2_B)), t + dt)


class _WRMS:
    """SUNDIALS-style weighted RMS error norm over the stacked state
    (reference: ARKodeSStolerances/CVodeSStolerances with scalar rel/abs
    tolerances, timeoperator.cpp:345,369)."""

    def __init__(self, rel_tol: float, abs_tol: float):
        self.rel = rel_tol
        self.abs = abs_tol

    def __call__(self, err, x) -> float:
        num = 0.0
        n = 0
        for e, xi in zip(err, x):
            e = np.asarray(e)
            w = self.abs + self.rel * np.abs(np.asarray(xi))
            num += float(np.sum((e / w) ** 2))
            n += e.size
        return math.sqrt(num / max(n, 1))


class AdaptiveSDIRK:
    """Adaptive implicit RK (the reference's Solver/Transient/Type "ARKODE",
    timeoperator.cpp:331-355: SUNDIALS ARKODE with ARKodeSetOrder and
    SStolerances).  TPU-native re-implementation: an embedded SDIRK pair —
    the 2-stage stiffly-accurate scheme of SDIRK23 with an embedded
    lower-order solution err = dt/2 (k2 - k1) — driven by a PI step-size
    controller on the SUNDIALS WRMS norm.  "Order" selects the stage gamma
    (<= 2: L-stable gamma = (2-sqrt(2))/2; >= 3: the 3rd-order A-stable
    gamma = (3+sqrt(3))/6; orders above 3 clamp to 3, logged by the caller).

    Step-size changes refactorize A = M + dt*g C + (dt*g)^2 K, so the
    controller applies hysteresis: dt only changes when the proposal moves
    >15% or a step is rejected (the lagged-reconfiguration idea of
    timeoperator.cpp:95-109/ImplicitSolve dt_ caching)."""

    def __init__(self, op: TransientOperator, rel_tol: float, abs_tol: float,
                 order: int = 2):
        self.op = op
        self.g = ((2.0 - math.sqrt(2.0)) / 2.0 if order <= 2
                  else (3.0 + math.sqrt(3.0)) / 6.0)
        self.norm = _WRMS(rel_tol, abs_tol)
        self.dt = None  # current internal step
        self.err_prev = 1.0
        self.n_steps = 0
        self.n_rejected = 0

    def _stages(self, x, t, dt):
        op = self.op
        g = self.g
        u1, u2, aB = x
        k1_1, k1_2 = op.implicit_solve(g * dt, u1, u2, t + g * dt)
        k1_B = u2 + g * dt * k1_2
        c = dt * (1.0 - 2.0 * g)
        k2_1, k2_2 = op.implicit_solve(g * dt, u1 + c * k1_1, u2 + c * k1_2,
                                       t + (1.0 - g) * dt)
        k2_B = (u2 + c * k1_2) + g * dt * k2_2
        h = 0.5 * dt
        x_new = (u1 + h * (k1_1 + k2_1), u2 + h * (k1_2 + k2_2),
                 aB + h * (k1_B + k2_B))
        err = (h * (k2_1 - k1_1), h * (k2_2 - k1_2), h * (k2_B - k1_B))
        return x_new, err

    def advance(self, x, t, t_target, dt_hint):
        """Integrate from t to t_target with internal adaptive substeps."""
        if self.dt is None:
            self.dt = dt_hint
        while t < t_target - 1e-14 * max(abs(t_target), 1.0):
            dt = min(self.dt, t_target - t)
            x_new, err = self._stages(x, t, dt)
            e = self.norm(err, x_new)
            if not math.isfinite(e):
                e = 10.0
            if e <= 1.0:  # accept
                x, t = x_new, t + dt
                self.n_steps += 1
                # PI controller (H211-like): order-2 method, order-1 embedded.
                fac = 0.9 * (max(e, 1e-10) ** -0.35) * \
                    (max(self.err_prev, 1e-10) ** 0.15)
                self.err_prev = max(e, 1e-10)
                fac = min(max(fac, 0.2), 5.0)
                if fac > 1.15 or fac < 0.85:  # hysteresis: avoid refactoring
                    self.dt = self.dt * fac
            else:  # reject, shrink
                self.n_rejected += 1
                self.dt = dt * min(max(0.9 * e ** -0.5, 0.2), 0.9)
        return x, t


class AdaptiveBDF:
    """Adaptive multistep BDF (the reference's Solver/Transient/Type "CVODE",
    timeoperator.cpp:356-373: SUNDIALS CVODE CV_BDF with SetMaxOrder and
    SStolerances).  TPU-native re-implementation: variable-step BDF2 (BDF1
    startup) with a variable-step AB2 predictor; the local error estimate is
    the scaled predictor-corrector difference (the standard Milne device),
    stepped by the same WRMS controller as AdaptiveSDIRK.  "Order" clamps
    the BDF order to min(order, 2)."""

    def __init__(self, op: TransientOperator, rel_tol: float, abs_tol: float,
                 order: int = 2):
        self.op = op
        self.max_order = max(1, min(order, 2))
        self.norm = _WRMS(rel_tol, abs_tol)
        self.dt = None
        self.hist = []  # [(t, x, f)] most recent last
        self.n_steps = 0
        self.n_rejected = 0

    def _f(self, x, t):
        d1, d2 = self.op.mult(x[0], x[1], t)
        return (d1, d2, x[1].copy())

    def _bdf_step(self, t, dt):
        """One BDF step from the newest history point; returns (x_new, err)."""
        tn, xn, fn = self.hist[-1]
        if len(self.hist) < 2 or self.max_order == 1:
            # BDF1 (backward Euler): x = xn + dt f(x).  Error estimate vs
            # the forward-Euler predictor: err ~ (x - xp)/2.
            k = self.op.implicit_solve(dt, xn[0], xn[1], t + dt)
            kB = xn[1] + dt * k[1]
            x = (xn[0] + dt * k[0], xn[1] + dt * k[1], xn[2] + dt * kB)
            xp = tuple(xi + dt * fi for xi, fi in zip(xn, fn))
            err = tuple(0.5 * (a - b) for a, b in zip(x, xp))
            return x, err
        tm, xm, fm = self.hist[-2]
        r = dt / (tn - tm)
        # Variable-step BDF2: x - a1 xn - a2 xm = b dt f(x) with
        # a1 = (1+r)^2/(1+2r), a2 = -r^2/(1+2r), b = (1+r)/(1+2r).
        a1 = (1 + r) ** 2 / (1 + 2 * r)
        a2 = -(r ** 2) / (1 + 2 * r)
        b = (1 + r) / (1 + 2 * r)
        ystar = tuple(a1 * yn + a2 * ym for yn, ym in zip(xn, xm))
        h = b * dt
        k = self.op.implicit_solve(h, ystar[0], ystar[1], t + dt)
        kB = ystar[1] + h * k[1]
        x = (ystar[0] + h * k[0], ystar[1] + h * k[1], ystar[2] + h * kB)
        # Variable-step AB2 predictor (order 2, different error constant).
        xp = tuple(xi + dt * ((1 + r / 2) * fi - (r / 2) * gi)
                   for xi, fi, gi in zip(xn, fn, fm))
        err = tuple((a - bb) / 6.0 for a, bb in zip(x, xp))
        return x, err

    def advance(self, x, t, t_target, dt_hint):
        if self.dt is None:
            self.dt = dt_hint
        if not self.hist:
            self.hist = [(t, x, self._f(x, t))]
        while t < t_target - 1e-14 * max(abs(t_target), 1.0):
            dt = min(self.dt, t_target - t)
            x_new, err = self._bdf_step(t, dt)
            e = self.norm(err, x_new)
            if not math.isfinite(e):
                e = 10.0
            if e <= 1.0:
                t = t + dt
                x = x_new
                self.hist.append((t, x, self._f(x, t)))
                if len(self.hist) > 2:
                    self.hist.pop(0)
                self.n_steps += 1
                p = 1 if len(self.hist) < 2 or self.max_order == 1 else 2
                fac = min(max(0.9 * max(e, 1e-10) ** (-1.0 / (p + 1)),
                              0.2), 5.0)
                if fac > 1.15 or fac < 0.85:
                    self.dt = self.dt * fac
            else:
                self.n_rejected += 1
                self.dt = dt * min(max(0.9 * e ** -0.5, 0.2), 0.9)
        return x, t


class GeneralizedAlpha:
    """MFEM first-order generalized-alpha (rho_inf = 1: alpha_m = alpha_f =
    gamma = 1/2, the implicit midpoint family)."""

    def __init__(self, op: TransientOperator, rho_inf: float = 1.0):
        self.op = op
        self.am = 0.5 * (3.0 - rho_inf) / (1.0 + rho_inf)
        self.af = 1.0 / (1.0 + rho_inf)
        self.gamma = 0.5 + self.am - self.af
        self.xdot: Optional[Tuple] = None

    def step(self, x, t, dt):
        """x = (u1, u2, aB); returns (x_new, t + dt)."""
        op = self.op
        u1, u2, aB = x
        if self.xdot is None:
            d1, d2 = op.mult(u1, u2, t)
            self.xdot = (d1, d2, u2.copy())
        ga = self.gamma / self.am
        c0 = self.af * (1.0 - ga) * dt
        y1 = u1 + c0 * self.xdot[0]
        y2 = u2 + c0 * self.xdot[1]
        yB = aB + c0 * self.xdot[2]
        dt_eff = ga * self.af * dt
        k1, k2 = op.implicit_solve(dt_eff, y1, y2, t + self.af * dt)
        kB = y2 + dt_eff * k2  # rhs3 analog: A_B' = E
        c1 = (1.0 - ga) * dt
        c2 = ga * dt
        x_new = (u1 + c1 * self.xdot[0] + c2 * k1,
                 u2 + c1 * self.xdot[1] + c2 * k2,
                 aB + c1 * self.xdot[2] + c2 * kB)
        oam = 1.0 / self.am
        self.xdot = (self.xdot[0] * (1.0 - oam) + oam * k1,
                     self.xdot[1] * (1.0 - oam) + oam * k2,
                     self.xdot[2] * (1.0 - oam) + oam * kB)
        return x_new, t + dt


def solve(iodata: IoData, output_dir: str | None = None):
    t0 = time.time()
    mesh = prepare_mesh(iodata)
    post_dir = make_output_dir(iodata, output_dir)
    units = iodata.units
    cfg = iodata.solver.transient
    if iodata.model.refinement.max_it > 0:
        # Reference parity: basesolver.cpp:163-169 warns and disables AMR
        # for transient simulations.
        print_log(iodata,
                  "WARNING: AMR is not currently supported for transient "
                  "simulations!")

    sop = SpaceOperator(iodata, mesh)
    if sop._conductivity:
        raise NotImplementedError(
            "transient solves do not support surface conductivity "
            "boundaries (reference: iodata.cpp:362-366)")
    print_log(iodata, f"transient: {sop.space.num_dofs} dofs, "
                      f"{mesh.num_elements} elements")

    # Nondimensionalize time parameters (reference: configfile.cpp:1620-1627).
    fscale = units.scale_factor(ValueType.FREQUENCY)
    tscale = units.scale_factor(ValueType.TIME)

    class NondimPulse:
        excitation = cfg.excitation
        pulse_f = 2 * math.pi * cfg.pulse_f / fscale
        pulse_tau = cfg.pulse_tau / tscale

    g = get_excitation(NondimPulse, dot=False)
    dg = get_excitation(NondimPulse, dot=True)
    max_t = cfg.max_t / tscale
    dt = cfg.delta_t / tscale
    nstep = int(round(max_t / dt)) + 1

    op = TransientOperator(iodata, sop, dg)
    if cfg.type in ("Default", "GeneralizedAlpha"):
        ode = GeneralizedAlpha(op)
    elif cfg.type in ("RungeKutta", "SDIRK23"):
        ode = SDIRK23(op)
    elif cfg.type == "ARKODE":
        if cfg.order > 3:
            print_log(iodata, "  ARKODE order > 3 clamps to the 3rd-order "
                              "SDIRK stage (TPU-native embedded pair)")
        ode = AdaptiveSDIRK(op, cfg.rel_tol, cfg.abs_tol, cfg.order)
    elif cfg.type == "CVODE":
        ode = AdaptiveBDF(op, cfg.rel_tol, cfg.abs_tol, cfg.order)
    else:
        raise NotImplementedError(f"transient scheme {cfg.type}")

    n = sop.space.num_dofs
    x = (np.zeros(n), np.zeros(n), np.zeros(n))
    t = 0.0

    probe_locs = None
    if iodata.domains.probes:
        from palace_tpu.fem import evaluation

        locator = evaluation.PointLocator(mesh)
        pts = np.array([nondim_point(iodata, p.center)
                        for p in iodata.domains.probes])
        probe_locs = locator.locate(pts)

    port_fn = {idx: sop.port_functionals(idx) for idx in sop.ports}
    rows = []
    eta2_steps, energies = [], []
    adaptive = isinstance(ode, (AdaptiveSDIRK, AdaptiveBDF))
    for step_i in range(nstep):
        if step_i > 0:
            if adaptive:
                x, t = ode.advance(x, t, step_i * dt, dt)
            else:
                x, t = ode.step(x, t, dt)
        row = measure_transient(iodata, sop, op, x, t, g, port_fn,
                                probe_locs)
        rows.append(row)
        # Per-step combined grad + curl flux indicators (reference:
        # transientsolver.cpp:108 AddEstimate(E, B, Et) every step; in 2D
        # the reference's B ~ 0 makes the curl part noise — grad only).
        if eta2_steps is not None:
            try:
                from palace_tpu.fem.estimators import (
                    curl_flux_indicators, grad_flux_indicators)

                e2 = grad_flux_indicators(sop.space, sop.materials, x[1])
                if sop.mesh.nodes.shape[1] == 3:
                    e2 = e2 + curl_flux_indicators(sop.space, sop.materials,
                                                   x[2])
                eta2_steps.append(e2)
                energies.append(row["E_elec"] + row["E_mag"] + row["E_cap"]
                                + row["E_ind"])
            except NotImplementedError:
                eta2_steps, energies = None, None  # hex/prism: no RT yet
        if step_i % 50 == 0:
            print_log(iodata, f"  step {step_i}/{nstep - 1}, "
                              f"t = {t * tscale:.4f} ns")

    if adaptive:
        # Stepper statistics, mirroring the reference's ARKODE/CVODE report
        # (timeoperator.cpp:425-450 PrintStats).
        print_log(iodata, f"  adaptive stepper: {ode.n_steps} internal steps,"
                          f" {ode.n_rejected} rejected, final dt = "
                          f"{(ode.dt or dt) * tscale:.3e} ns")
    write_transient_tables(iodata, sop, post_dir, rows)
    if eta2_steps:
        write_error_indicators(post_dir, eta2_steps, energies)
    else:
        write_error_indicators(post_dir, [np.zeros(mesh.num_elements)])
    print_log(iodata, f"transient done in {time.time() - t0:.1f}s")
    from palace_tpu.post import metadata as _metadata
    _metadata.save_problem(post_dir, "Transient", mesh.num_elements,
                           sop.space.num_dofs)
    _metadata.save_timing(post_dir)
    return dict(post_dir=post_dir, num_dofs=sop.space.num_dofs, rows=rows)


def measure_transient(iodata, sop: SpaceOperator, op: TransientOperator, x, t,
                      g, port_fn, probe_locs):
    u1, u2, aB = x
    m: Dict = {"t": t}
    # E_elec = 1/2 E^T M_eps E (domain); E_mag = 1/2 (curl aB)^T mu^-1 (curl aB)
    # = the K_dom quadratic form of the accumulator aB.
    # In 2D the reference's B path yields B ~ 0 and the committed refs show
    # E_mag ~ 1e-29 — mirror that output convention (KNOWN_GAPS "2D E_mag").
    is_2d = sop.mesh.nodes.shape[1] == 2
    m["E_elec"] = 0.5 * _op_energy(sop.M_re, u2)
    m["E_mag"] = 0.0 if is_2d else 0.5 * _op_energy(sop.K_dom, aB)
    m["E_cap"] = 0.0
    m["E_ind"] = 0.0
    m["domain_E"] = {}
    m["domain_M"] = {}
    for ecfg in iodata.domains.energies:
        m["domain_E"][ecfg.index] = 0.5 * _masked(sop, sop.M_re, u2,
                                                  ecfg.attributes)
        m["domain_M"][ecfg.index] = (0.0 if is_2d else 0.5 * _masked(
            sop, sop.K_dom, aB, ecfg.attributes))
    m["ports"] = {}
    for idx, port in sop.ports.items():
        s, v = port_fn[idx]
        V = float(v @ u2)
        # Transient current from P = V I (reference: postoperator.cpp
        # MeasureLumpedPorts else-branch: I = conj(P/V)); P here from the
        # instantaneous fields E and H = -mu^-1 curl aB.
        Pval = _port_power_transient(sop, idx, u2, aB)
        I = Pval / V if abs(V) > 0 else 0.0
        m["ports"][idx] = dict(V=V, I=I, P=Pval)
        if abs(port.L) > 0:
            m["E_ind"] += 0.5 * abs(port.L) * (I * I)
        if abs(port.C) > 0:
            m["E_cap"] += 0.5 * abs(port.C) * (V * V)
    m["g"] = g(t)
    if probe_locs is not None:
        from palace_tpu.fem import evaluation

        m["probe_E"] = evaluation.eval_nd(sop.space, u2, probe_locs, "value")
        m["probe_B"] = -evaluation.eval_nd(sop.space, aB, probe_locs, "curl")
    return m


def _op_energy(dom_op, x) -> float:
    """x^T A x over a domain PAOperator (element_energy returns 1/2 x^T A x)."""
    tot = 0.0
    for e in dom_op.element_energy(x):
        tot += 2.0 * float(np.sum(np.asarray(e)))
    return tot


def _masked(sop, dom_op, x, attrs):
    s = 0.0
    for b, e in zip(sop.mesh.buckets, dom_op.element_energy(x)):
        s += 2.0 * float(np.sum(np.asarray(e) * np.isin(b.attr, attrs)))
    return s


def _port_power_transient(sop: SpaceOperator, idx: int, E, aB) -> float:
    """P(t) = ∫ (E x H) . n dS into the domain, H = -mu^-1 curl aB."""
    from palace_tpu.fem.evaluation import trace_nd

    P = 0.0
    for tb in sop._port_trace_bases[idx]:
        tr = tb.tr
        attrs = np.empty(len(tr.elem), np.int32)
        for bi, b in enumerate(sop.mesh.buckets):
            ssel = tr.bucket == bi
            attrs[ssel] = b.attr[tr.elem[ssel]]
        muinv = sop.materials.attr_tensor(sop.materials.inv_permeability, attrs)
        Ev = trace_nd(sop.space, E, tr, which="value")
        Bv = -trace_nd(sop.space, aB, tr, which="curl")
        if sop.mesh.nodes.shape[1] == 2:
            H = muinv[:, 2, 2][:, None] * Bv[..., 0]
            ExH = np.stack([Ev[..., 1] * H, -Ev[..., 0] * H], axis=-1)
        else:
            H = np.einsum("fst,fqt->fqs", muinv, Bv)
            ExH = np.cross(Ev, H)
        P += float(np.einsum("fq,fqs,fqs->", tr.wdetJ, ExH, -tr.normal))
    return P


def write_transient_tables(iodata: IoData, sop: SpaceOperator, post_dir, rows):
    units = iodata.units
    ns = units.scale_factor(ValueType.TIME)
    V = units.scale_factor(ValueType.VOLTAGE)
    A = units.scale_factor(ValueType.CURRENT)
    J = units.scale_factor(ValueType.ENERGY)

    def time_col():
        return Column("t", "t (ns)", min_left_padding=0, precision=8, sign="")

    excitation_idx = next(iter(sop.excitations()))
    drive = [i for i, p in sop.ports.items() if p.excitation == excitation_idx]

    # port-V / port-I
    for name, unit, scale, inc in (
        ("V", "(V)", V, lambda p, gval: p.excitation_voltage() * gval),
        ("I", "(A)", A,
         lambda p, gval: p.excitation_voltage() / p.R * gval),
    ):
        t = Table()
        tc = t.add(time_col())
        for d in drive:
            t.add(Column(f"inc{d}", f"{name}_inc[{d}] {unit}"))
        for idx in sop.ports:
            t.add(Column(f"v{idx}", f"{name}[{idx}] {unit}"))
        for row in rows:
            tc.data.append(row["t"] * ns)
            for d in drive:
                t.col(f"inc{d}").data.append(inc(sop.ports[d], row["g"]) * scale)
            for idx in sop.ports:
                t.col(f"v{idx}").data.append(row["ports"][idx][name] * scale)
        t.write(os.path.join(post_dir, f"port-{name}.csv"))

    # domain-E
    t = Table()
    tc = t.add(time_col())
    t.add(Column("Ee", "E_elec (J)"))
    t.add(Column("Em", "E_mag (J)"))
    t.add(Column("Ec", "E_cap (J)"))
    t.add(Column("Ei", "E_ind (J)"))
    for ecfg in iodata.domains.energies:
        t.add(Column(f"Ee{ecfg.index}", f"E_elec[{ecfg.index}] (J)"))
        t.add(Column(f"pe{ecfg.index}", f"p_elec[{ecfg.index}]"))
        t.add(Column(f"Em{ecfg.index}", f"E_mag[{ecfg.index}] (J)"))
        t.add(Column(f"pm{ecfg.index}", f"p_mag[{ecfg.index}]"))
    for row in rows:
        tc.data.append(row["t"] * ns)
        t.col("Ee").data.append(row["E_elec"] * J)
        t.col("Em").data.append(row["E_mag"] * J)
        t.col("Ec").data.append(row["E_cap"] * J)
        t.col("Ei").data.append(row["E_ind"] * J)
        for ecfg in iodata.domains.energies:
            Ee, Em = row["domain_E"][ecfg.index], row["domain_M"][ecfg.index]
            t.col(f"Ee{ecfg.index}").data.append(Ee * J)
            t.col(f"pe{ecfg.index}").data.append(
                Ee / row["E_elec"] if row["E_elec"] > 0 else 0.0)
            t.col(f"Em{ecfg.index}").data.append(Em * J)
            t.col(f"pm{ecfg.index}").data.append(
                Em / row["E_mag"] if row["E_mag"] > 0 else 0.0)
    t.write(os.path.join(post_dir, "domain-E.csv"))

    # probes
    if iodata.domains.probes:
        Efield = units.scale_factor(ValueType.FIELD_E)
        Bfield = units.scale_factor(ValueType.FIELD_B)
        for name, unit, scale, key in (
            ("E", "(V/m)", Efield, "probe_E"),
            ("B", "(Wb/m²)", Bfield, "probe_B"),
        ):
            t = Table()
            tc = t.add(time_col())
            dims = ["x", "y", "z"]
            for p in iodata.domains.probes:
                for d in dims:
                    t.add(Column(f"{d}{p.index}", f"{name}_{d}[{p.index}] {unit}"))
            for row in rows:
                tc.data.append(row["t"] * ns)
                for pi, p in enumerate(iodata.domains.probes):
                    for di, d in enumerate(dims):
                        t.col(f"{d}{p.index}").data.append(
                            float(row[key][pi][di]) * scale)
            t.write(os.path.join(post_dir, f"probe-{name}.csv"))
