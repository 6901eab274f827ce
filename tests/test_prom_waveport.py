"""Adaptive PROM with wave ports: factored reduced wave-port operators +
MRI greedy sampling against the uniform direct sweep (reference:
romoperator.hpp:177-187 Mwp_p_r, romoperator.cpp:233-360 MRI)."""

import json
import math

import numpy as np
import pytest

from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_hex


def make_case(tmp_path, tag, driven):
    mesh = box_hex(5, 4, 3, lx=20.0, ly=10.0, lz=6.0)
    gmsh_write.write(mesh, str(tmp_path / "w.msh"))
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": f"o_{tag}"},
        "Model": {"Mesh": "w.msh", "L0": 1e-3},
        "Domains": {"Materials": [{"Attributes": [1], "Permittivity": 1.0}]},
        "Boundaries": {
            "WavePort": [
                {"Index": 1, "Attributes": [1], "Excitation": True},
                {"Index": 2, "Attributes": [2]},
            ],
            "PEC": {"Attributes": [3, 4, 5, 6]}},
        "Solver": {"Order": 2, "Device": "CPU",
                   "Driven": driven,
                   "Linear": {"Tol": 1e-10, "MaxIts": 300}},
    }
    p = tmp_path / f"c_{tag}.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_adaptive_waveport_matches_uniform(tmp_path):
    from palace_tpu.api import run

    # TE10 cutoff at 15 GHz (a = 10 mm): sweep the propagating band.
    samples = {"Samples": [{"Type": "Linear", "MinFreq": 17.0,
                            "MaxFreq": 28.0, "NSample": 12}]}
    res_u = run(make_case(tmp_path, "u", dict(samples)),
                output_dir=str(tmp_path / "out_u"))
    res_a = run(make_case(tmp_path, "a", dict(samples, AdaptiveTol=1e-8)),
                output_dir=str(tmp_path / "out_a"))

    for key in res_u["measurements"]:
        mu, ma = res_u["measurements"][key], res_a["measurements"][key]
        for idx in mu.ports:
            assert ma.ports[idx].S == pytest.approx(mu.ports[idx].S,
                                                    abs=5e-6), (key, idx)
    # A full-wave matched waveguide: |S21| ~ 1 through the adaptive path.
    m0 = res_a["measurements"][min(res_a["measurements"])]
    assert abs(m0.ports[2].S) == pytest.approx(1.0, abs=0.05)
