"""COMSOL and Nastran mesh readers (reference: palace/utils/meshio.cpp).

Samples are hand-written following the format sequences the reference
parser consumes; node-ordering assertions are derived independently from
the published Gmsh/COMSOL/Nastran element node conventions.
"""

import numpy as np

from palace_tpu.mesh import geometry
from palace_tpu.mesh.mesh import load_mesh

MPHTXT = """\
# Created by hand
0 1
1
5 mesh1
1
3 obj

0 0 1
4 Mesh
4
3 # sdim
5 # number of mesh vertices
0 # lowest mesh vertex index

# Mesh vertex coordinates
0 0 0
1 0 0
0 1 0
0 0 1
1 1 1
2 # number of element types

3 tet
4 # number of vertices per element
2 # number of elements
0 1 2 3
1 2 3 4
2 # number of geometric entity indices
1
1

3 tri
3 # number of vertices per element
2 # number of elements
0 1 2
1 2 4
2 # number of geometric entity indices
4
6
"""


def test_read_comsol_ascii(tmp_path):
    p = tmp_path / "m.mphtxt"
    p.write_text(MPHTXT)
    mesh = load_mesh(str(p))
    assert mesh.num_nodes == 5
    assert np.allclose(mesh.nodes[4], [1, 1, 1])
    [tets] = mesh.buckets
    assert tets.conn.tolist() == [[0, 1, 2, 3], [1, 2, 3, 4]]
    assert tets.attr.tolist() == [1, 1]
    [tris] = mesh.bdr_buckets
    # Boundary entity indices are 0-based in COMSOL -> +1.
    assert tris.attr.tolist() == [5, 7]
    gf = geometry.compute(mesh.nodes, tets, 2)
    assert gf.wdetJ.sum() > 0


def test_read_comsol_hex_ordering(tmp_path):
    """COMSOL hex vertex order is (0,1,3,2,4,5,7,6) relative to Gmsh: a
    unit cube written in COMSOL order must load with positive volume 1."""
    head = MPHTXT.split("3 # sdim")[0]
    body = """
3 # sdim
8
0
0 0 0
1 0 0
0 1 0
1 1 0
0 0 1
1 0 1
0 1 1
1 1 1
1 # number of element types
3 hex
8
1
0 1 2 3 4 5 6 7
1
1
"""
    p = tmp_path / "h.mphtxt"
    p.write_text(head + body)
    mesh = load_mesh(str(p))
    [hexes] = mesh.buckets
    assert hexes.conn.tolist() == [[0, 1, 3, 2, 4, 5, 7, 6]]
    gf = geometry.compute(mesh.nodes, hexes, 2)
    assert np.isclose(gf.wdetJ.sum(), 1.0)


_G3 = ("GRID*".ljust(8) + "3".rjust(16) + " " * 16 + "0.0".rjust(16)
       + "1.0".rjust(16))
_G3B = "*".ljust(8) + "0.0".rjust(16)
NAS = f"""\
$ hand-written test deck
BEGIN BULK
GRID           1        0.0     0.0     0.0
GRID           2        1.0     0.0     0.0
{_G3}
{_G3B}
GRID,4,,0.0,0.0,2.5-1
GRID           5        1.0     1.0     1.0
CTETRA         1       7       1       2       3       4
CTETRA,2,7,2,3,4,5
CTRIA3         3       2       1       2       3
ENDDATA
"""


def test_read_nastran(tmp_path):
    p = tmp_path / "m.nas"
    p.write_text(NAS)
    mesh = load_mesh(str(p))
    assert mesh.num_nodes == 5
    # GRID* long-format and '2.5-1' shorthand float both parse.
    assert np.allclose(mesh.nodes[2], [0.0, 1.0, 0.0])
    assert np.allclose(mesh.nodes[3], [0.0, 0.0, 0.25])
    [tets] = mesh.buckets
    assert tets.conn.tolist() == [[0, 1, 2, 3], [1, 2, 3, 4]]
    assert tets.attr.tolist() == [7, 7]
    [tris] = mesh.bdr_buckets
    assert tris.attr.tolist() == [2]


def test_read_nastran_tet10_continuation(tmp_path):
    """10-node CTETRA with a continuation line; Nastran midside order is
    (m01,m12,m02,m03,m13,m23) vs Gmsh (m01,m12,m02,m03,m23,m13): the loaded
    element must have midside nodes at the true edge midpoints (checked via
    an exactly straight curved element: |detJ| integrates to the affine
    volume)."""
    v = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [0, 0, 2]], float)
    mids = {(a, b): 0.5 * (v[a] + v[b]) for a in range(4) for b in range(4)}
    # Nastran file node order: corners then m01 m12 m02 m03 m13 m23.
    pts = [v[0], v[1], v[2], v[3], mids[(0, 1)], mids[(1, 2)], mids[(0, 2)],
           mids[(0, 3)], mids[(1, 3)], mids[(2, 3)]]
    lines = ["BEGIN BULK"]
    for i, p_ in enumerate(pts):
        lines.append(f"GRID,{i + 1},,{p_[0]},{p_[1]},{p_[2]}")
    lines.append("CTETRA         1       3       1       2       3       4"
                 "       5       6")
    lines.append("+              7       8       9      10")
    lines.append("ENDDATA")
    p = tmp_path / "t10.nas"
    p.write_text("\n".join(lines) + "\n")
    mesh = load_mesh(str(p))
    [tets] = mesh.buckets
    assert tets.etype == 11 and tets.conn.shape == (1, 10)
    from palace_tpu.fem import reference as ref

    # Every node must sit at its Gmsh reference position under the affine
    # corner map (wrong midside permutation would misplace two nodes).
    _, _, rn = ref.gmsh_node_coords(11)
    lam = np.concatenate([1 - rn.sum(1, keepdims=True), rn], axis=1)
    expect = lam @ v
    assert np.allclose(mesh.nodes[tets.conn[0]], expect)


def test_read_mfem_native(tmp_path):
    """MFEM mesh v1.0 (straight): unit square, 2 triangles + 4 boundary
    segments, attributes preserved."""
    from palace_tpu.mesh.mesh import load_mesh

    src = """\
MFEM mesh v1.0

dimension
2

elements
2
1 3 0 1 2
2 3 0 2 3

boundary
4
10 2 0 1
11 2 1 2
12 2 2 3
13 2 3 0

vertices
4
2
0 0
1 0
1 1
0 1
"""
    p = tmp_path / "sq.mesh"
    p.write_text(src)
    mesh = load_mesh(str(p))
    assert mesh.num_elements == 2
    assert sorted(mesh.buckets[0].attr.tolist()) == [1, 2]
    bdr = mesh.bdr_buckets[0]
    assert sorted(bdr.attr.tolist()) == [10, 11, 12, 13]
    import numpy as np
    assert np.allclose(mesh.nodes[:, :2],
                       [[0, 0], [1, 0], [1, 1], [0, 1]])


def test_read_vtk_legacy(tmp_path):
    """VTK legacy ASCII: 1 tet + 1 boundary triangle with CELL_DATA."""
    from palace_tpu.mesh.mesh import load_mesh

    src = """\
# vtk DataFile Version 3.0
test
ASCII
DATASET UNSTRUCTURED_GRID
POINTS 4 float
0 0 0
1 0 0
0 1 0
0 0 1
CELLS 2 9
4 0 1 2 3
3 0 1 2
CELL_TYPES 2
10
5
CELL_DATA 2
SCALARS material int 1
LOOKUP_TABLE default
7
42
"""
    p = tmp_path / "t.vtk"
    p.write_text(src)
    mesh = load_mesh(str(p))
    assert mesh.num_elements == 1
    assert mesh.buckets[0].attr.tolist() == [7]
    assert mesh.bdr_buckets[0].attr.tolist() == [42]
