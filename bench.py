"""Headline benchmark: H(curl) curl-curl operator apply throughput.

The innermost hot operation of every driver (reference: the libCEED operator
apply, palace/fem/libceed/operator.cpp:148-214, benchmarked by
test/unit/test-libceed.cpp:1260-1440), at the BASELINE north-star order
p = 3 on ~490k dofs.

Headline path: the STRUCTURED-MESH stencil convolution
(palace_tpu/ops/structured.py) — on a uniform box hex mesh the assembled
operator is translation invariant, so the apply is one
`lax.conv_general_dilated` over a (B, C, nx, ny, nz) dof lattice with
C = 3 p^3 channels: a dense MXU workload with NO gathers (the per-row
dynamic-slice issue cost, ~10 ns/row on v5e, bounded the round-1
unstructured formulation at 4.1 GDOF/s; see PERF_NOTES.md).

vs_baseline = achieved / roofline-model of this formulation, where the
model time is max(conv FLOPs at peak MXU rate, u+y streamed once at HBM
speed) — 1.0 means the stencil conv runs at this chip's speed of light.
Measured r2 on v5e: 23.6 GDOF/s per vector at bf16, B = 512 (~50% of the
conv FLOP roofline, 99 TFLOP/s sustained).

Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    """Force full execution: fetch a value (block_until_ready alone does not
    synchronize through remote-tunnel TPU transports)."""
    import jax.numpy as jnp

    return float(jnp.sum(jnp.real(x)))


def _measure(apply, u, iters):
    """Time `iters` chained applies inside ONE jitted loop (a single device
    dispatch: per-call transport latency would otherwise dominate on
    tunneled TPU runtimes)."""
    import jax

    def loop(v):
        def body(_, x):
            return apply(x)

        return jax.lax.fori_loop(0, iters, body, v)

    loop_j = jax.jit(loop)
    _sync(loop_j(u))  # compile + warm
    t0 = time.perf_counter()
    _sync(u)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sync(loop_j(u))
    return max((time.perf_counter() - t0) - rtt, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp

    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.fem.nd_operators import nd_operator
    from palace_tpu.mesh.generate import box_hex
    from palace_tpu.ops.structured import StructuredNDOperator

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    # 18^3 hex cells at p = 3: 490k dofs, C = 81 lattice channels.
    n = 18 if on_tpu else 4
    order = 3
    B = 512 if on_tpu else 8
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    iters = 20 if on_tpu else 5

    kind = jax.devices()[0].device_kind.lower()
    if on_tpu:
        bw = (2.7e12 if "v5p" in kind or "v5 p" in kind else
              8.2e11 if "lite" in kind or "v5e" in kind else 1.2e12)
        peak = (4.59e14 if "v5p" in kind or "v5 p" in kind else
                1.97e14 if "lite" in kind or "v5e" in kind else 2.75e14)
    else:
        bw, peak = 5e10, 1e11

    mesh = box_hex(n, n, n)
    space = NDSpace(mesh, order)
    op = nd_operator(space, curl_coef={1: np.eye(3)}, dtype=jnp.float64)
    ess = np.zeros(space.num_dofs, bool)
    ess[space.boundary_dofs([1, 2, 3, 4, 5, 6])] = True
    N = space.num_dofs

    sop = StructuredNDOperator.build(space, op, ess, dtype=dtype)
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (B,) + sop.lat_gdof.shape, dtype)

    dt = _measure(sop, lat, iters) / B
    gdofs = N / dt / 1e9

    C = sop.W.shape[0]
    ncell = n ** 3
    itemsize = jnp.dtype(dtype).itemsize
    flops = 2.0 * 27 * C * C * ncell  # per vector
    bytes_ = 2.0 * C * ncell * itemsize  # u + y per vector
    t_model = max(flops / peak, bytes_ / bw)
    model = N / t_model / 1e9
    print(json.dumps({
        "metric": f"hcurl_p{order}_structured_stencil_apply_"
                  f"{jnp.dtype(dtype).name}_b{B}",
        "value": round(gdofs, 4),
        "unit": "GDOF/s",
        "vs_baseline": round(gdofs / model, 4),
    }))


if __name__ == "__main__":
    main()
