"""Driven & transient drivers on an analytic parallel-plate TEM line.

A matched parallel-plate waveguide (PEC top/bottom plates, PMC sides,
lumped ports with R = eta0 * l/w at both ends) transmits fully:
|S21| = 1, arg(S21) = -k L, |S11| << 1 (reference example analog:
coaxial matched, docs/src/examples/coaxial.md).
"""

import json
import math
import os

import numpy as np
import pytest

from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh import gmsh_write

ETA0 = 376.730313412  # impedance of free space, Z0 * l/w with l == w

L = 10.0  # mm, x extent = propagation direction


def make_case(tmpdir, problem: dict, solver: dict) -> str:
    mesh = box_tet(6, 6, 6, lx=L, ly=10.0, lz=10.0)
    gmsh_write.write(mesh, os.path.join(tmpdir, "box.msh"))
    cfg = {
        "Problem": dict(Verbose=0, Output="postpro", **problem),
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3},
        "Domains": {"Materials": [
            {"Attributes": [1], "Permeability": 1.0, "Permittivity": 1.0}]},
        "Boundaries": {
            "PEC": {"Attributes": [5, 6]},
            "LumpedPort": [
                {"Index": 1, "Attributes": [1], "R": ETA0,
                 "Direction": "+Z", "Excitation": True},
                {"Index": 2, "Attributes": [2], "R": ETA0, "Direction": "+Z"},
            ],
        },
        "Solver": dict(Order=2, Device="CPU", **solver),
    }
    path = os.path.join(tmpdir, "case.json")
    json.dump(cfg, open(path, "w"))
    return path


def test_driven_tem_line(tmp_path):
    from palace_tpu.api import run

    f_ghz = 15.0
    path = make_case(str(tmp_path), {"Type": "Driven"}, {
        "Driven": {"Samples": [{"Type": "Point", "Freq": [f_ghz]}]},
        "Linear": {"Tol": 1e-10, "MaxIts": 300},
    })
    res = run(path, output_dir=str(tmp_path / "out"))
    meas = res["measurements"]
    m = meas[(1, 0)]
    S11 = m.ports[1].S
    S21 = m.ports[2].S
    assert abs(S21) == pytest.approx(1.0, abs=0.02)
    assert abs(S11) < 0.05
    # Phase: -k L with k = 2 pi f / c.
    kL = 2 * math.pi * f_ghz * 1e9 / 299792458.0 * (L * 1e-3)
    phase = -math.atan2(S21.imag, S21.real) % (2 * math.pi)
    assert phase == pytest.approx(kL % (2 * math.pi), abs=0.05)
    # Power balance: injected 1 W (incident) ~ |S11|^2 + |S21|^2.
    assert abs(S11) ** 2 + abs(S21) ** 2 == pytest.approx(1.0, abs=0.03)


def test_transient_tem_line(tmp_path):
    from palace_tpu.api import run

    path = make_case(str(tmp_path), {"Type": "Transient"}, {
        "Transient": {"Type": "GeneralizedAlpha",
                      "Excitation": "ModulatedGaussian",
                      "ExcitationFreq": 30.0, "ExcitationWidth": 0.02,
                      "MaxTime": 0.3, "TimeStep": 0.002},
        "Linear": {"Tol": 1e-10, "MaxIts": 300},
    })
    res = run(path, output_dir=str(tmp_path / "out"))
    rows = res["rows"]
    t = np.array([r["t"] for r in rows])
    Vinc = np.array([r["g"] for r in rows])
    V1 = np.array([r["ports"][1]["V"] for r in rows])
    V2 = np.array([r["ports"][2]["V"] for r in rows])
    Etot = np.array([r["E_elec"] + r["E_mag"] for r in rows])
    # Full transmission on the matched line: peak |V2| ~ peak V_inc-driven V1.
    assert np.abs(V2).max() == pytest.approx(np.abs(V1).max(), rel=0.08)
    # Transit delay ~ L/c (in nondim units c = 1, L = 1 after Lc scaling).
    dt_peak = t[np.argmax(np.abs(V2))] - t[np.argmax(np.abs(V1))]
    assert dt_peak == pytest.approx(1.0, abs=0.5)
    # Energy exits through the matched ports.
    assert Etot[-1] < 1e-4 * Etot.max()


def test_driven_adaptive_matches_uniform(tmp_path):
    """Adaptive PROM sweep agrees with the uniform direct sweep
    (reference regression analog: cpw lumped_uniform vs lumped_adaptive)."""
    from palace_tpu.api import run

    samples = {"Samples": [{"Type": "Linear", "MinFreq": 5.0, "MaxFreq": 30.0,
                            "NSample": 11}]}
    base = make_case(str(tmp_path), {"Type": "Driven"}, {
        "Driven": dict(samples), "Linear": {"Tol": 1e-10, "MaxIts": 300}})
    res_u = run(base, output_dir=str(tmp_path / "out_u"))

    ad = make_case(str(tmp_path), {"Type": "Driven"}, {
        "Driven": dict(samples, AdaptiveTol=1e-9),
        "Linear": {"Tol": 1e-10, "MaxIts": 300}})
    res_a = run(ad, output_dir=str(tmp_path / "out_a"))

    for key in res_u["measurements"]:
        mu, ma = res_u["measurements"][key], res_a["measurements"][key]
        for idx in mu.ports:
            assert ma.ports[idx].S == pytest.approx(mu.ports[idx].S, abs=2e-6)
            assert ma.ports[idx].V == pytest.approx(mu.ports[idx].V, rel=2e-6,
                                                    abs=1e-9)


def test_driven_adaptive_slow_a2_matches_uniform(tmp_path):
    """PROM slow path (reference: romoperator.hpp:186-189): finite
    conductivity (surface impedance ~ sqrt(omega)) and 2nd-order absorbing
    (~ 1/omega) make A2(omega) non-factorable, so the ROM re-projects the
    extra term at every evaluation frequency.  The adaptive sweep must
    still match the uniform direct sweep."""
    import json as _json

    from palace_tpu.api import run

    samples = {"Samples": [{"Type": "Linear", "MinFreq": 10.0,
                            "MaxFreq": 30.0, "NSample": 7}]}

    def case(tag, solver_extra):
        path = make_case(str(tmp_path), {"Type": "Driven"}, {
            "Driven": dict(samples, **solver_extra),
            "Linear": {"Tol": 1e-10, "MaxIts": 300}})
        cfg = _json.load(open(path))
        # Plates: finite conductivity (copper-ish); port 2 face -> 2nd-order
        # absorbing termination.  Both slow-path A2 terms active.
        b = cfg["Boundaries"]
        b["PEC"] = {"Attributes": []}
        b["Conductivity"] = [
            {"Attributes": [5, 6], "Conductivity": 5.8e7}]
        b["LumpedPort"] = [b["LumpedPort"][0]]
        b["Absorbing"] = {"Attributes": [2], "Order": 2}
        p2 = os.path.join(str(tmp_path), f"case_{tag}.json")
        _json.dump(cfg, open(p2, "w"))
        return p2

    res_u = run(case("u", {}), output_dir=str(tmp_path / "sout_u"))
    res_a = run(case("a", {"AdaptiveTol": 1e-9}),
                output_dir=str(tmp_path / "sout_a"))
    for key in res_u["measurements"]:
        mu, ma = res_u["measurements"][key], res_a["measurements"][key]
        for idx in mu.ports:
            assert ma.ports[idx].S == pytest.approx(mu.ports[idx].S,
                                                    abs=5e-6)


def test_surface_postprocessing(tmp_path):
    """Power flux through the output port plane ~ transmitted power ~ 1 W
    (unit-incident-power normalization); interface dielectric Q = 1/(p tan d)."""
    from palace_tpu.api import run

    path = make_case(str(tmp_path), {"Type": "Driven"}, {
        "Driven": {"Samples": [{"Type": "Point", "Freq": [15.0]}]},
        "Linear": {"Tol": 1e-10, "MaxIts": 300}})
    cfg = json.load(open(path))
    cfg["Boundaries"]["Postprocessing"] = {
        "SurfaceFlux": [{"Index": 1, "Attributes": [2], "Type": "Power"}],
        "Dielectric": [{"Index": 1, "Attributes": [2], "Type": "Default",
                        "Thickness": 0.01, "Permittivity": 10.0,
                        "LossTan": 0.01}],
    }
    json.dump(cfg, open(path, "w"))
    res = run(path, output_dir=str(tmp_path / "out"))
    m = res["measurements"][(1, 0)]
    assert m.surf_flux[1].real == pytest.approx(1.0, abs=0.05)
    p, Q = m.surf_q[1]
    assert Q == pytest.approx(1.0 / (0.01 * p), rel=1e-9)
    assert (tmp_path / "out" / "surface-F.csv").exists()
    assert (tmp_path / "out" / "surface-Q.csv").exists()


def test_driven_wave_port_tem(tmp_path):
    """Wave-port driven solve on the parallel-plate TEM line: the port mode
    solver finds the TEM mode (kn = omega), |S21| ~ 1, arg(S21) = -k L
    (reference analog: cpw wave-port uniform sweep)."""
    from palace_tpu.api import run

    f_ghz = 15.0
    path = make_case(str(tmp_path), {"Type": "Driven"}, {
        "Driven": {"Samples": [{"Type": "Point", "Freq": [f_ghz]}]},
        "Linear": {"Tol": 1e-10, "MaxIts": 300}})
    cfg = json.load(open(path))
    cfg["Boundaries"] = {
        "PEC": {"Attributes": [5, 6]},
        "WavePort": [
            {"Index": 1, "Attributes": [1], "Mode": 1, "Excitation": True},
            {"Index": 2, "Attributes": [2], "Mode": 1},
        ],
    }
    json.dump(cfg, open(path, "w"))
    res = run(path, output_dir=str(tmp_path / "out"))
    m = res["measurements"][(1, 0)]
    S11, S21 = m.ports[1].S, m.ports[2].S
    assert abs(S21) == pytest.approx(1.0, abs=0.02)
    assert abs(S11) < 0.05
    kL = 2 * math.pi * f_ghz * 1e9 / 299792458.0 * (L * 1e-3)
    phase = -math.atan2(S21.imag, S21.real) % (2 * math.pi)
    assert phase == pytest.approx(kL % (2 * math.pi), abs=0.05)


def test_driven_restart(tmp_path):
    """Restart reloads checkpointed fields and reproduces the full sweep
    (reference: drivensolver.cpp:150-171 Restart; here via the field
    checkpoint)."""
    from palace_tpu.api import run

    samples = {"Samples": [{"Type": "Linear", "MinFreq": 10.0,
                            "MaxFreq": 20.0, "NSample": 3}]}
    base = make_case(str(tmp_path), {"Type": "Driven"}, {
        "Driven": dict(samples), "Linear": {"Tol": 1e-10}})
    run(base, output_dir=str(tmp_path / "out"))
    full = open(tmp_path / "out" / "port-S.csv").read()

    # Re-run with Restart=3 (skip the first two samples) in the same dir.
    cfg = json.load(open(base))
    cfg["Solver"]["Driven"]["Restart"] = 3
    json.dump(cfg, open(base, "w"))
    run(base, output_dir=str(tmp_path / "out"))
    again = open(tmp_path / "out" / "port-S.csv").read()
    assert again == full


class _ScalarOscillator:
    """Forced damped oscillator M u1' = -(K u2 + C u1) + g'(t),  u2' = u1,
    through the same implicit_solve interface as TransientOperator."""

    def __init__(self, K=400.0, C=1.5):
        self.K, self.C = K, C

    def dJ(self, t):
        return math.exp(-0.5 * ((t - 0.5) / 0.1) ** 2)

    def rhs(self, u1, u2, t):
        return -(self.K * u2 + self.C * u1) + self.dJ(t)

    def implicit_solve(self, dt, u1, u2, t):
        A = 1.0 + dt * dt * self.K + dt * self.C
        k1 = (self.rhs(u1, u2, t) - dt * self.K * u1) / A
        return k1, u1 + dt * k1


def test_sdirk23_second_order():
    """SDIRK23 (MFEM RUNGE_KUTTA, timeoperator.cpp:324-330) integrates the
    forced oscillator at observed order 2 with the L-stable gamma."""
    from palace_tpu.drivers.transient import SDIRK23
    from scipy.integrate import solve_ivp

    op = _ScalarOscillator()
    ref = solve_ivp(
        lambda t, y: [op.rhs(y[0], y[1], t), y[0]], (0.0, 1.0), [0.0, 0.0],
        rtol=1e-12, atol=1e-14).y[:, -1]

    errs = []
    for nstep in (50, 100, 200):
        ode = SDIRK23(op)
        x, t = (0.0, 0.0, 0.0), 0.0
        for _ in range(nstep):
            x, t = ode.step(x, t, 1.0 / nstep)
        errs.append(abs(x[1] - ref[1]) + abs(x[0] - ref[0]))
    r1 = math.log2(errs[0] / errs[1])
    r2 = math.log2(errs[1] / errs[2])
    assert 1.7 < r1 < 2.4 and 1.7 < r2 < 2.4, (errs, r1, r2)
    # aB accumulates u2: check against the trapezoid of the reference run
    assert errs[-1] < 1e-4


def test_transient_sdirk23_driver_smoke(tmp_path):
    """RungeKutta scheme runs through the transient driver and tracks
    Generalized-alpha on a short window (both 2nd order; loose tol since the
    local error constants differ)."""
    from palace_tpu.api import run

    sols = {}
    for name in ("GeneralizedAlpha", "RungeKutta"):
        path = make_case(str(tmp_path), {"Type": "Transient"}, {
            "Transient": {"Type": name,
                          "Excitation": "ModulatedGaussian",
                          "ExcitationFreq": 10.0, "ExcitationWidth": 0.08,
                          "MaxTime": 0.08, "TimeStep": 0.002},
            "Linear": {"Tol": 1e-10, "MaxIts": 300},
        })
        res = run(path, output_dir=str(tmp_path / f"out_{name}"))
        rows = res["rows"]
        sols[name] = np.array([r["ports"][2]["V"] for r in rows])
    a, b = sols["GeneralizedAlpha"], sols["RungeKutta"]
    scale = np.abs(a).max()
    assert scale > 0 and np.isfinite(b).all()
    assert np.abs(a - b).max() < 5e-2 * scale, np.abs(a - b).max() / scale


class _VecOscillator(_ScalarOscillator):
    """Array-state oscillator with the M-solve `mult` hook AdaptiveBDF needs
    (M = 1 here)."""

    def mult(self, u1, u2, t):
        return self.rhs(u1, u2, t), u1


def _ref_oscillator(op, t_end=1.0):
    from scipy.integrate import solve_ivp

    return solve_ivp(
        lambda t, y: [op.rhs(y[0], y[1], t), y[0]], (0.0, t_end), [0.0, 0.0],
        rtol=1e-12, atol=1e-14).y[:, -1]


def test_arkode_adaptive_tolerance():
    """AdaptiveSDIRK (Type "ARKODE", timeoperator.cpp:331-355) controls the
    local error: tightening RelTol reduces the global error and loosening it
    reduces the step count."""
    from palace_tpu.drivers.transient import AdaptiveSDIRK

    op = _VecOscillator()
    ref = _ref_oscillator(op)
    out = {}
    for rtol in (1e-3, 1e-6):
        ode = AdaptiveSDIRK(op, rtol, 1e-12)
        x = (np.zeros(1), np.zeros(1), np.zeros(1))
        t = 0.0
        for i in range(1, 11):
            x, t = ode.advance(x, t, 0.1 * i, 0.05)
        err = abs(float(x[0][0]) - ref[0]) + abs(float(x[1][0]) - ref[1])
        out[rtol] = (err, ode.n_steps)
    assert out[1e-6][0] < out[1e-3][0]
    assert out[1e-3][1] < out[1e-6][1]
    assert out[1e-6][0] < 1e-4, out
    # adaptivity actually coarsens: the embedded order-1 estimate gives
    # dt ~ sqrt(tol) (conservative), far fewer steps than the tight run
    assert out[1e-3][1] < 900, out


def test_cvode_bdf2_adaptive():
    """AdaptiveBDF (Type "CVODE", timeoperator.cpp:356-373): variable-step
    BDF2 hits the reference trajectory under the WRMS controller."""
    from palace_tpu.drivers.transient import AdaptiveBDF

    op = _VecOscillator()
    ref = _ref_oscillator(op)
    out = {}
    for rtol in (1e-3, 1e-6):
        ode = AdaptiveBDF(op, rtol, 1e-12, order=2)
        x = (np.zeros(1), np.zeros(1), np.zeros(1))
        t = 0.0
        for i in range(1, 11):
            x, t = ode.advance(x, t, 0.1 * i, 0.05)
        err = abs(float(x[0][0]) - ref[0]) + abs(float(x[1][0]) - ref[1])
        out[rtol] = (err, ode.n_steps)
    assert out[1e-6][0] < out[1e-3][0]
    assert out[1e-3][1] < out[1e-6][1]
    assert out[1e-6][0] < 3e-4, out


def test_transient_adaptive_driver_smoke(tmp_path):
    """ARKODE and CVODE schemes run through the transient driver and track
    the Generalized-alpha solution on a short window."""
    from palace_tpu.api import run

    sols = {}
    for name, extra in (("GeneralizedAlpha", {}),
                        ("ARKODE", {"RelTol": 1e-6, "AbsTol": 1e-12}),
                        ("CVODE", {"RelTol": 1e-6, "AbsTol": 1e-12,
                                   "Order": 2})):
        path = make_case(str(tmp_path), {"Type": "Transient"}, {
            "Transient": dict(Type=name,
                              Excitation="ModulatedGaussian",
                              ExcitationFreq=10.0, ExcitationWidth=0.08,
                              MaxTime=0.06, TimeStep=0.002, **extra),
            "Linear": {"Tol": 1e-10, "MaxIts": 300},
        })
        res = run(path, output_dir=str(tmp_path / f"out_{name}"))
        sols[name] = np.array([r["ports"][2]["V"] for r in res["rows"]])
    a = sols["GeneralizedAlpha"]
    scale = np.abs(a).max()
    assert scale > 0
    for name in ("ARKODE", "CVODE"):
        b = sols[name]
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 5e-2 * scale, (
            name, np.abs(a - b).max() / scale)
