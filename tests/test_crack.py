"""Internal-boundary cracking (reference: palace/utils/geodata.cpp
CrackInternalBoundaryElements).

Three properties pin the implementation down:

1. Topology: an interior sheet's nodes are duplicated so the ND spaces on
   either side share no dofs (full decoupling); seam (rim) nodes interior to
   the domain are NOT duplicated.
2. PEC neutrality: cracking a PEC sheet cannot change the solution (every
   duplicated tangential dof is eliminated on both sides anyway).
3. Impedance physics: an UNcracked interior impedance sheet is a transparent
   thin film (continuous tangential E, shunt Z_s: at Z_s = eta0 normal
   incidence transmits T = 2/3, reflects R = -1/3), while a CRACKED sheet is
   an opaque surface-impedance wall on each side (at Z_s = eta0 a matched
   absorber: R ~ T ~ 0).
"""

import json
import os

import numpy as np
import pytest

from palace_tpu.fem import reference as ref
from palace_tpu.mesh import gmsh_write
from palace_tpu.mesh.generate import box_tet
from palace_tpu.mesh.mesh import ElemBucket, Mesh

ETA0 = 376.730313412

L = 10.0  # mm box edge


def add_x_sheet(mesh: Mesh, x0: float, attr: int, zmax: float = None,
                zmin: float = None) -> Mesh:
    """Add interior TRI boundary facets on the plane x = x0 (optionally only
    where the facet's z range lies in [zmin, zmax], leaving seam strips)."""
    tris = set()
    b = mesh.buckets[0]
    x = mesh.nodes[:, 0]
    z = mesh.nodes[:, 2]
    for row in b.conn:
        for f in ref.GEOM_FACES[ref.Geom.TET]:
            tri = tuple(sorted(int(row[i]) for i in f))
            if all(abs(x[v] - x0) < 1e-9 for v in tri):
                if ((zmax is None or max(z[v] for v in tri) <= zmax + 1e-9)
                        and (zmin is None
                             or min(z[v] for v in tri) >= zmin - 1e-9)):
                    tris.add(tri)
    conn = np.array(sorted(tris), np.int32)
    bdr = list(mesh.bdr_buckets)
    bdr.append(ElemBucket(2, ref.Geom.TRI, 1, conn,
                          np.full(len(conn), attr, np.int32)))
    return Mesh(mesh.nodes, mesh.buckets, bdr, mesh.physical_names)


def tem_case(tmpdir, mesh, boundaries_extra, crack: bool, f_ghz=15.0) -> str:
    gmsh_write.write(mesh, os.path.join(tmpdir, "box.msh"))
    cfg = {
        "Problem": {"Type": "Driven", "Verbose": 0, "Output": "postpro"},
        "Model": {"Mesh": "box.msh", "L0": 1.0e-3,
                  "CrackBdrElements": bool(crack)},
        "Domains": {"Materials": [
            {"Attributes": [1], "Permeability": 1.0, "Permittivity": 1.0}]},
        "Boundaries": {
            "PEC": {"Attributes": [5, 6]},
            "LumpedPort": [
                {"Index": 1, "Attributes": [1], "R": ETA0,
                 "Direction": "+Z", "Excitation": True},
                {"Index": 2, "Attributes": [2], "R": ETA0, "Direction": "+Z"},
            ],
            **boundaries_extra,
        },
        "Solver": {"Order": 2, "Device": "CPU",
                   "Driven": {"Samples": [{"Type": "Point",
                                           "Freq": [f_ghz]}]},
                   "Linear": {"Tol": 1e-10, "MaxIts": 300}},
    }
    path = os.path.join(tmpdir, f"case_{crack}.json")
    json.dump(cfg, open(path, "w"))
    return path


def _sparams(path, outdir):
    from palace_tpu.api import run

    res = run(path, output_dir=outdir)
    m = res["measurements"][(1, 0)]
    return m.ports[1].S, m.ports[2].S


def test_crack_topology_decoupling_and_seam():
    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.mesh.crack import crack_internal_boundaries
    from palace_tpu.mesh.mesh import canonicalize_simplices

    # Full-plane sheet: rim is on the exterior -> every sheet node splits.
    mesh = add_x_sheet(box_tet(4, 4, 4, lx=L, ly=L, lz=L), L / 2, 9)
    m2, info = crack_internal_boundaries(mesh, [9])
    assert info.n_crack_facets == 2 * 16
    assert info.n_dup_nodes == 25  # all 5x5 plane nodes
    assert info.n_interior_seam_edges == 0
    # No ND dof is shared between elements on opposite sides of the sheet.
    canonicalize_simplices(m2)
    space = NDSpace(m2, 1)
    cx = m2.nodes[m2.buckets[0].corners, 0].mean(axis=1)
    left = np.unique(space.elem_dofs[0][cx < L / 2])
    right = np.unique(space.elem_dofs[0][cx > L / 2])
    assert len(np.intersect1d(left, right)) == 0

    # Partial sheet (z <= L/2): the rim strip nodes at z = L/2 inside the
    # domain are seam nodes (single component around the sheet edge).
    mesh = add_x_sheet(box_tet(4, 4, 4, lx=L, ly=L, lz=L), L / 2, 9,
                       zmax=L / 2)
    m2, info = crack_internal_boundaries(mesh, [9])
    assert info.n_dup_nodes > 0
    dup0 = m2.nodes[mesh.nodes.shape[0]:]
    # Duplicated nodes all on the sheet plane, never on the z = L/2 rim line.
    assert np.allclose(dup0[:, 0], L / 2)
    assert (dup0[:, 2] < L / 2 - 1e-9).all()


def test_local_edge_split_resolves_seam_edges():
    """A one-element-wide interior strip has crack edges connecting its two
    rims (interior seam edges); the edge-fan bisection plus re-crack loop
    must decouple them while preserving volume and conformity."""
    from palace_tpu.mesh import geometry
    from palace_tpu.mesh.crack import (crack_internal_boundaries,
                                       local_edge_split)

    mesh = add_x_sheet(box_tet(4, 4, 4, lx=L, ly=L, lz=L), L / 2, 9,
                       zmin=L / 4, zmax=L / 2)

    def vol(m):
        return sum(float(geometry.compute(m.nodes, b, 2).wdetJ.sum())
                   for b in m.buckets)

    v0 = vol(mesh)
    _, info = crack_internal_boundaries(mesh, [9])
    assert info.n_interior_seam_edges > 0
    for _ in range(5):
        mesh = local_edge_split(mesh, info.interior_seam_edges)
        cracked, info = crack_internal_boundaries(mesh, [9])
        if not info.interior_seam_edges:
            break
    assert info.n_interior_seam_edges == 0
    assert vol(cracked) == pytest.approx(v0, rel=1e-12)
    _, _, counts = cracked.face_table()
    assert counts.max() <= 2  # conforming: no face with >2 owners


def test_crack_pec_sheet_neutral(tmp_path):
    """Cracked and uncracked solves agree to solver precision for a PEC
    sheet (all duplicated dofs are eliminated on both sides)."""
    mesh = add_x_sheet(box_tet(5, 5, 5, lx=L, ly=L, lz=L), 2 * L / 5, 9,
                       zmax=3 * L / 5)
    S = {}
    for crack in (False, True):
        p = tem_case(str(tmp_path), mesh, {"PEC": {"Attributes": [5, 6, 9]}},
                     crack)
        S[crack] = _sparams(p, str(tmp_path / f"out{crack}"))
    assert abs(S[True][0] - S[False][0]) < 1e-8
    assert abs(S[True][1] - S[False][1]) < 1e-8
    # And the sheet actually does something (partial reflection).
    assert abs(S[True][0]) > 0.1


def test_crack_impedance_sheet_absorber(tmp_path):
    """eta0 impedance sheet across the TEM line: uncracked = transparent
    resistive film (T = 2/3, R = 1/3 analytically); cracked = matched
    absorbing wall on both sides (R ~ T ~ 0)."""
    mesh = add_x_sheet(box_tet(6, 6, 6, lx=L, ly=L, lz=L), L / 2, 9)
    imp = {"Impedance": [{"Attributes": [9], "Rs": ETA0}]}
    p = tem_case(str(tmp_path), mesh, imp, crack=False)
    S11u, S21u = _sparams(p, str(tmp_path / "u"))
    assert abs(S21u) == pytest.approx(2.0 / 3.0, abs=0.03)
    assert abs(S11u) == pytest.approx(1.0 / 3.0, abs=0.03)
    p = tem_case(str(tmp_path), mesh, imp, crack=True)
    S11c, S21c = _sparams(p, str(tmp_path / "c"))
    assert abs(S11c) < 0.05
    assert abs(S21c) < 0.05
