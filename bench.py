"""Headline benchmark: H(curl) curl-curl operator apply throughput (GDOF/s).

This is the innermost hot operation of every driver (reference: the libCEED
operator apply, palace/fem/libceed/operator.cpp:148-214, benchmarked by
test/unit/test-libceed.cpp:1260-1440).  The element-matrix apply is
HBM-bandwidth bound: per application the (E, nd, nd) element-matrix tables
are streamed once, so the model roofline is

    t_model = bytes(A_tables) / BW_HBM,   GDOF/s_model = ndofs / t_model.

vs_baseline reports achieved/model (1.0 = memory-bandwidth speed of light
for this formulation on the current chip).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.fem.nd_operators import nd_operator
    from palace_tpu.mesh.generate import box_tet
    from palace_tpu.mesh.mesh import canonicalize_simplices
    from palace_tpu.ops.partial import _apply_jit

    platform = jax.devices()[0].platform
    # ~16^3x6 = 25k tets at p=3 -> 45 dofs/elem, ~0.2 GB of f32 tables
    # (BASELINE north star: curl-curl apply at p=3-4).
    n = 16 if platform == "tpu" else 6
    order = 3
    mesh = box_tet(n, n, n)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, order)
    op = nd_operator(space, curl_coef={1: np.eye(3)},
                     mass_coef={1: np.eye(3)})

    dtype = jnp.float32
    tables = []
    nbytes = 0
    for t in op._tables:
        A = t["A"].astype(dtype)
        tables.append({"gidx": t["gidx"], "A": A})
        nbytes += A.size * A.dtype.itemsize + t["gidx"].size * 4
    scatter = op._scatter_tree
    nbytes += scatter["perm"].size * 4 + scatter["seg_ids"].size * 4

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(space.num_dofs).astype(np.float32))

    def apply(u):
        return _apply_jit(tables, scatter, u, space.num_dofs)

    # Warmup/compile.
    y = apply(u)
    y.block_until_ready()

    iters = 50 if platform == "tpu" else 5
    t0 = time.perf_counter()
    v = u
    for _ in range(iters):
        v = apply(v)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    gdofs = space.num_dofs / dt / 1e9

    # Model roofline: stream the element tables once per apply at HBM BW.
    bw = {"tpu": 2.7e12, "cpu": 5e10}.get(platform, 1e11)  # bytes/s
    t_model = nbytes / bw
    model_gdofs = space.num_dofs / t_model / 1e9

    print(json.dumps({
        "metric": "hcurl_apply_throughput",
        "value": round(gdofs, 4),
        "unit": "GDOF/s",
        "vs_baseline": round(gdofs / model_gdofs, 4),
    }))


if __name__ == "__main__":
    main()
