"""Configuration parsing against the reference example configs."""

import glob
import os

import pytest

from palace_tpu.config import IoData, ProblemType
from palace_tpu.config.jsonio import expand_ranges, loads, strip_comments

REF = "/root/reference"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference examples not available"
)


def test_comments_and_ranges():
    text = """
    {
      // line comment
      "Attributes": [1, 3-5, 8], /* block */
      "Name": "a-b // not a comment",
      "Value": 1.5e-3
    }
    """
    d = loads(text)
    assert d["Attributes"] == [1, 3, 4, 5, 8]
    assert d["Name"] == "a-b // not a comment"
    assert d["Value"] == 1.5e-3


def test_negative_numbers_not_ranges():
    d = loads('{"X": [-0.5, 0.8, 1.0], "Y": [1, 2-4]}')
    assert d["X"] == [-0.5, 0.8, 1.0]
    assert d["Y"] == [1, 2, 3, 4]


def test_duplicate_keys_rejected():
    with pytest.raises(ValueError):
        loads('{"A": 1, "A": 2}')


@needs_ref
@pytest.mark.parametrize(
    "path",
    sorted(glob.glob(f"{REF}/examples/*/*.json")),
    ids=lambda p: "/".join(p.split("/")[-2:]),
)
def test_parse_all_example_configs(path):
    iodata = IoData(path)
    assert iodata.problem.type in ProblemType
    assert iodata.model.mesh


@needs_ref
def test_spheres_config_details():
    iodata = IoData(f"{REF}/examples/spheres/spheres.json")
    cfg = iodata.config
    assert cfg.problem.type is ProblemType.ELECTROSTATIC
    assert cfg.model.L0 == 1.0e-2
    assert cfg.solver.order == 3
    assert cfg.boundaries.ground == [2]
    assert [t.index for t in cfg.boundaries.terminals] == [1, 2]
    assert cfg.solver.linear.tol == 1.0e-8
    assert len(cfg.domains.probes) == 1
    assert cfg.boundaries.surface_fluxes[0].type == "Electric"
