"""Floquet diffraction-order ports (models/floquetport.py): an empty
periodic vacuum cell transmits the incident plane wave completely —
|S(0,0)| = 1 at the far port, |R| << 1 at the driving port, for normal and
oblique (frequency-scaled k_F) incidence (reference:
palace/models/floquetportoperator.cpp; regression case
dielectric_grating_uniform)."""

import json
import math

import numpy as np
import pytest

from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet


def run_cell(tmp_path, kf, fref, freqs, order=2, n=3):
    import palace_tpu

    mesh = box_tet(n, n, 2 * n, lx=1.0, ly=1.0, lz=2.0)
    gmsh_write.write(mesh, str(tmp_path / "cell.msh"))
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": "out"},
        "Model": {"Mesh": "cell.msh", "L0": 1.0e-2},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 1.0,
                                   "Permeability": 1.0}]},
        "Boundaries": {
            "Periodic": {
                "FloquetWaveVector": kf,
                **({"FloquetReferenceFrequency": fref} if fref else {}),
                "BoundaryPairs": [
                    {"DonorAttributes": [1], "ReceiverAttributes": [2],
                     "Translation": [1.0, 0.0, 0.0]},
                    {"DonorAttributes": [3], "ReceiverAttributes": [4],
                     "Translation": [0.0, 1.0, 0.0]},
                ]},
            "FloquetPort": [
                {"Index": 1, "Attributes": [6], "Excitation": True,
                 "IncidentPolarization": "TE", "MaxOrder": 1},
                {"Index": 2, "Attributes": [5], "MaxOrder": 1},
            ],
        },
        "Solver": {"Order": order, "Device": "CPU",
                   "Driven": {"Samples": [{"Type": "Point", "Freq": freqs}]},
                   "Linear": {"Tol": 1e-10, "MaxIts": 400}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    return palace_tpu.run(str(p), output_dir=str(tmp_path / "out"))


def test_empty_cell_normal_incidence(tmp_path):
    r = run_cell(tmp_path, [0.0, 0.0, 0.0], None, [12.0])
    m = r["measurements"][(1, 0)]
    s1 = m.floquet_s[1]
    s2 = m.floquet_s[2]
    T = s2[(0, 0, True)]
    R = s1[(0, 0, True)]
    assert abs(T) == pytest.approx(1.0, abs=0.03), abs(T)
    assert abs(R) < 0.05, abs(R)
    # Energy conservation over all propagating orders.
    tot = sum(abs(v) ** 2 for v in s1.values()) + \
        sum(abs(v) ** 2 for v in s2.values())
    assert tot == pytest.approx(1.0, abs=0.05), tot
    # Transmission phase = -k d (plane wave across the 2 cm cell).
    c0 = 299792458.0
    kd = 2 * math.pi * 12.0e9 / c0 * 0.02
    phase = math.degrees(-kd) % 360.0
    got = math.degrees(math.atan2(T.imag, T.real)) % 360.0
    assert abs((got - phase + 180) % 360 - 180) < 6.0, (got, phase)


def test_empty_cell_oblique_freqscaled(tmp_path):
    """Oblique incidence with FloquetReferenceFrequency: k_t = k0 * omega."""
    r = run_cell(tmp_path, [0.9, 0.0, 0.0], 12.0, [12.0], n=3)
    m = r["measurements"][(1, 0)]
    T = m.floquet_s[2][(0, 0, True)]
    R = m.floquet_s[1][(0, 0, True)]
    assert abs(T) == pytest.approx(1.0, abs=0.05), abs(T)
    assert abs(R) < 0.08, abs(R)
