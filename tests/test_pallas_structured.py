"""Pallas TPU structured-apply kernels vs the XLA reference apply
(ops/pallas_structured.py; interpret mode so the test runs on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from palace_tpu.ops.pallas_structured import (
    structured_apply_lattice,
    structured_apply_lattice_v2,
)
from palace_tpu.ops.structured import StructuredNDOperator


@pytest.mark.parametrize("p", [1, 2, 3])
@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_pallas_apply_matches_reference(p, variant):
    shape = (3, 2, 4)
    sop = StructuredNDOperator.build_uniform(p, shape, 0.25,
                                             dtype=jnp.float32)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(
        rng.standard_normal((2,) + sop.lat_gdof.shape), jnp.float32)

    y_ref = np.asarray(sop(lat), np.float64)
    fn = (structured_apply_lattice if variant == "v1"
          else structured_apply_lattice_v2)
    y = np.asarray(fn(sop, lat, interpret=True), np.float64)

    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() < 1e-5 * scale
