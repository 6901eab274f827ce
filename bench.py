"""Headline benchmark: H(curl) operator apply throughput + one end-to-end
driver wall-clock.

The innermost hot operation of every driver (reference: the libCEED
operator apply, palace/fem/libceed/operator.cpp:148-214, benchmarked by
test/unit/test-libceed.cpp:1260-1440), at the BASELINE north-star order
p = 3.

Rows (one JSON line each, printed as soon as measured), in order:

1. unstructured production apply (ops/partial.py batched element matmul +
   gather/segment-sum — the path every regression-corpus solve runs),
   complex-as-real-pair (the formulation production uses on the tunneled
   TPU backend, which does not lower complex dot_general) and f32.
   THE FIRST ROW IS THE HEADLINE and always runs — no budget skip.
2. Pallas kernels (structured block-copy, ops/pallas_structured.py) and
   the structured sliced apply (bf16 + the slow f32 variant, kept visible
   so the gap to roofline stays honest).
3. end-to-end driver wall-clock: one regression case solved on the default
   backend vs the same case on host CPU (the recorded point of comparison
   for the BASELINE "wall-clock vs CPU" north star).

vs_baseline is honest chip speed-of-light: achieved / (N / t_model) with
t_model = max(minimal_flops / chip_peak(dtype), minimal_bytes / chip_BW),
where minimal_flops is the assembled-CSR matvec count 2*nnz (unstructured)
or the element-matmul count 2*E*nd^2 (structured), and minimal_bytes
streams u + y once plus the operator tables amortized over the block.
For the wall-clock row, vs_baseline = cpu_seconds / device_seconds
(>1 means the device beats host CPU on the same solve).

TIME BUDGET: the tunneled "axon" TPU backend compiles each kernel in
~60-660 s cold and carries 100-300 ms per-dispatch RTT (amortized inside
_measure's fori_loop).  This version enforces a global deadline
(BENCH_DEADLINE_S, default 450 s) with the production row exempt: it runs
first, unconditionally, so the driver ALWAYS gets the headline row even if
everything else is skipped.  Remaining rows pre-budget against estimates
that are updated with the measured cost of earlier rows.  A persistent
JAX compilation cache (.jax_cache/) makes repeat runs hit warm compiles.

The LAST stdout line (what the driver parses) is always the production
unstructured complex row; the second-to-last is an explicitly-labeled
"summary" object carrying every measured row.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

T0 = time.time()
DEADLINE = float(os.environ.get("BENCH_DEADLINE_S", "450"))


def remaining() -> float:
    return DEADLINE - (time.time() - T0)


def _setup_cache():
    import jax

    # The tunneled "axon" TPU plugin ignores the JAX_PLATFORMS env var;
    # honor it through the config API so CPU smoke runs stay off the chip.
    plat = os.environ.get("PALACE_TPU_PLATFORM") \
        or os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as exc:
        print(f"compilation cache unavailable: {exc!r}", file=sys.stderr)


def _sync(x):
    """Force full execution: fetch a value (block_until_ready alone does not
    synchronize through remote-tunnel TPU transports)."""
    import jax.numpy as jnp

    return float(jnp.sum(jnp.real(x)))


def _measure(apply, u, iters, reps=3):
    """Time chained applies inside ONE jitted loop (a single device dispatch:
    per-call transport latency would otherwise dominate on tunneled TPU
    runtimes).  The iteration count auto-grows until one loop call takes
    >= max(0.3 s, 20x the transport RTT) — fast kernels would otherwise
    measure RTT noise, not kernel time (the round-3 driver bench recorded
    1000x-off values this way).  Best of `reps` timings rejects transient
    tunnel degradation."""
    import jax

    def loop(v, n):
        def body(_, x):
            return apply(x)

        return jax.lax.fori_loop(0, n, body, v)

    loop_j = jax.jit(loop)
    _sync(loop_j(u, 1))  # compile + warm
    t0 = time.perf_counter()
    _sync(u)
    rtt = time.perf_counter() - t0
    floor = max(0.3, 20.0 * rtt)
    n = max(int(iters), 1)
    while True:
        t0 = time.perf_counter()
        _sync(loop_j(u, n))
        el = time.perf_counter() - t0
        if el >= floor or n >= 65536:
            break
        n = max(2 * n, int(n * floor / max(el, 1e-6)) + 1)
    best = el
    for _ in range(reps - 1):
        t0 = time.perf_counter()
        _sync(loop_j(u, n))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / n


RESULTS = []  # row dicts of every emitted measurement


def _emit(metric, value, vs_baseline, unit="GDOF/s"):
    row = {"metric": metric, "value": round(value, 4), "unit": unit,
           "vs_baseline": round(vs_baseline, 4)}
    RESULTS.append(row)
    print(json.dumps(row))
    sys.stdout.flush()


def _chip():
    import jax

    d = jax.devices()[0]
    on_tpu = d.platform == "tpu"
    kind = d.device_kind.lower()
    if on_tpu:
        if "v5p" in kind or "v5 p" in kind:
            bw, peak_bf16 = 2.7e12, 4.59e14
        elif "lite" in kind or "v5e" in kind:
            bw, peak_bf16 = 8.2e11, 1.97e14
        else:
            bw, peak_bf16 = 1.2e12, 2.75e14
    else:
        bw, peak_bf16 = 5e10, 1e11
    peaks = {"bfloat16": peak_bf16, "float32": peak_bf16 / 4.0}
    peaks["complex64"] = peaks["float32"]  # complex64 = f32 mul/adds on MXU
    return on_tpu, bw, peaks


def _unstructured_setup(on_tpu):
    from palace_tpu.fem.nd import NDSpace
    from palace_tpu.fem.nd_operators import nd_operator
    from palace_tpu.mesh.generate import box_tet
    from palace_tpu.mesh.mesh import canonicalize_simplices

    n = 12 if on_tpu else 4
    mesh = box_tet(n, n, n)
    canonicalize_simplices(mesh)
    space = NDSpace(mesh, 3)
    eye = {1: np.eye(3)}
    op = nd_operator(space, curl_coef=eye, mass_coef=eye)

    # Assembled-CSR nnz (minimal-FLOP denominator), estimated per-element
    # from a small mesh of the same family (ratio is mesh-size invariant to
    # ~1%; the full COO would cost ~1 GB of host memory here).
    m_s = box_tet(4, 4, 4)
    canonicalize_simplices(m_s)
    s_s = NDSpace(m_s, 3)
    op_s = nd_operator(s_s, curl_coef=eye, mass_coef=eye)
    E = op._tables[0]["gidx"].shape[0]
    nnz = op_s.assemble_csr().nnz * (E / op_s.buckets[0].gidx.shape[0])
    return space, op, nnz


def bench_unstructured(on_tpu, bw, peaks, budget):
    """The production path. The first row (complex realpair on TPU /
    complex128 on CPU) is the headline and is exempt from the budget."""
    import jax
    import jax.numpy as jnp

    space, op, nnz = _unstructured_setup(on_tpu)
    N = space.num_dofs
    t = op._tables[0]
    gidx = t["gidx"]

    # rows: (tag, compute dtype, complex-as-real-pair?, n complex/real
    # vectors, iters, est. cost in s, exempt-from-budget?)
    if on_tpu:
        rows = [("complex64_realpair", jnp.float32, True, 32, 8, 150.0,
                 True),
                ("float32", jnp.float32, False, 128, 8, 150.0, False)]
    else:
        rows = [("complex128", jnp.complex128, False, 2, 3, 30.0, True),
                ("float32", jnp.float32, False, 4, 3, 30.0, False)]
    headline = None
    for name, dtype, pair, B, iters, est, exempt in rows:
      if not exempt and not budget.admit(f"unstructured {name}", est):
          continue
      t_row = time.time()
      try:
        from palace_tpu.linalg.device_ksp import ElemTermOperator, Term

        ncol = 2 * B if pair else B  # real-pair: [Re | Im] column block
        is_c = jnp.issubdtype(dtype, jnp.complexfloating)
        key = jax.random.PRNGKey(0)
        if is_c:
            rng = np.random.default_rng(0)
            U = rng.standard_normal((N, ncol)) \
                + 1j * rng.standard_normal((N, ncol))
            U = jnp.asarray(U.astype(dtype))
        else:
            U = jax.random.normal(key, (N, ncol), dtype)

        # THE production apply object (device_ksp.ElemTermOperator: grouped
        # gather -> batched element matmul -> grouped sorted segment-sum),
        # exactly what the blocked device FGMRES calls each iteration.
        term = Term("ka", [(np.asarray(gidx),
                            np.asarray(t["A"], np.float64))],
                    coef=lambda w: 1.0)
        eto = ElemTermOperator([term], N)
        eto._entries = [(ti, gi, Ai.astype(dtype if not is_c else
                                           jnp.float64))
                        for ti, gi, Ai in eto._entries]
        coefs = jnp.ones((1, ncol),
                         jnp.float32 if dtype == jnp.float32 else
                         jnp.float64)

        def blocked_apply(u):
            return eto(coefs, u)

        dt = _measure(blocked_apply, U, iters) / B
        gdofs = N / dt / 1e9
        item = jnp.dtype(dtype).itemsize * (2 if pair else 1)
        flops = (2.0 * (2 if pair else 4) if (is_c or pair) else 2.0) * nnz
        tbl_bytes = nnz * (jnp.dtype(dtype).itemsize + 4)
        bytes_ = 2.0 * N * item + tbl_bytes / B
        t_model = bytes_ / bw
        pname = jnp.dtype(dtype).name
        if pname in peaks:
            t_model = max(t_model, flops / peaks[pname])
        row_metric = f"hcurl_p3_unstructured_apply_{name}_b{B}"
        _emit(row_metric, gdofs, gdofs / (N / t_model / 1e9))
        if exempt:
            headline = RESULTS[-1]
      except Exception as exc:
        print(f"unstructured {name} failed: {exc!r}", file=sys.stderr)
      budget.update(est, time.time() - t_row)
    return headline


def bench_structured(on_tpu, bw, peaks, budget):
    import jax.numpy as jnp

    from palace_tpu.ops.structured import StructuredNDOperator

    n = 16 if on_tpu else 4
    p = 3
    # bf16 is the production-relevant variant; the f32 sliced variant
    # measured a pathological 0.036 GDOF/s on the tunnel chip (slice-fold
    # accumulator spills) — kept so the regression to roofline stays
    # visible rather than silently dropped.
    for dtype, B, iters, est in ((jnp.bfloat16, 128 if on_tpu else 4,
                                  8 if on_tpu else 3, 130.0),
                                 (jnp.float32, 64 if on_tpu else 4,
                                  8 if on_tpu else 3, 130.0)):
      if not budget.admit(f"structured {jnp.dtype(dtype).name}", est):
          continue
      t_row = time.time()
      try:
        sop = StructuredNDOperator.build_uniform(p, (n, n, n), 1.0 / n,
                                                 dtype=dtype)
        import jax

        key = jax.random.PRNGKey(0)
        lat = jax.random.normal(key, (B,) + sop.lat_gdof.shape, dtype)
        dt = _measure(sop.sliced_apply, lat, iters) / B
        N = sop.num_dofs
        gdofs = N / dt / 1e9
        C = sop.W.shape[0]
        nd = sop._Af.shape[0]
        ncell = n ** 3
        item = jnp.dtype(dtype).itemsize
        flops = 2.0 * ncell * nd * nd  # element-matmul minimum, per vector
        bytes_ = 2.0 * C * ncell * item + sop._Af.size * item / B
        name = jnp.dtype(dtype).name
        t_model = max(bytes_ / bw, flops / peaks[name])
        _emit(f"hcurl_p3_structured_sliced_apply_{name}_b{B}", gdofs,
              gdofs / (N / t_model / 1e9))
      except Exception as exc:
        print(f"structured {jnp.dtype(dtype).name} failed: {exc!r}",
              file=sys.stderr)
      budget.update(est, time.time() - t_row)


def bench_pallas(on_tpu, bw, peaks, budget):
    """Pallas block-copy kernel (ops/pallas_structured.py) on the same
    structured operator: E-vector gather/scatter as contiguous VMEM block
    copies + one minimal-FLOP (nd, nd) MXU matmul per batch column."""
    import jax
    import jax.numpy as jnp

    from palace_tpu.ops.pallas_structured import (
        _flat_tables, structured_apply_flat_v2, v2_tables)
    from palace_tpu.ops.structured import StructuredNDOperator

    if not on_tpu:
        return  # interpret mode is correctness-only; timing is meaningless
    n, p = 16, 3
    for dtype, B, iters, est in ((jnp.float32, 64, 8, 150.0),
                                 (jnp.bfloat16, 128, 8, 150.0)):
      if not budget.admit(f"pallas {jnp.dtype(dtype).name}", est):
          continue
      t_row = time.time()
      try:
        sop = StructuredNDOperator.build_uniform(p, (n, n, n), 1.0 / n,
                                                 dtype=dtype)
        Af_perm, _ = v2_tables(sop)
        Af_perm = Af_perm.astype(dtype)
        _, _, _, _, _, Lu, _ = _flat_tables(p, (n, n, n))
        C = 3 * p ** 3
        key = jax.random.PRNGKey(0)
        u = jax.random.normal(key, (B, C, Lu), dtype)

        def apply(x):
            return structured_apply_flat_v2(Af_perm, x, p=p, shape=(n, n, n))

        dt = _measure(apply, u, iters) / B
        N = sop.num_dofs
        gdofs = N / dt / 1e9
        nd = Af_perm.shape[0]
        ncell = n ** 3
        item = jnp.dtype(dtype).itemsize
        flops = 2.0 * ncell * nd * nd
        bytes_ = 2.0 * C * Lu * item + Af_perm.size * item / B
        name = jnp.dtype(dtype).name
        t_model = max(bytes_ / bw, flops / peaks[name])
        _emit(f"hcurl_p3_structured_pallas_apply_{name}_b{B}", gdofs,
              gdofs / (N / t_model / 1e9))
      except Exception as exc:
        print(f"pallas {jnp.dtype(dtype).name} failed: {exc!r}",
              file=sys.stderr)
      budget.update(est, time.time() - t_row)


def bench_solve_wallclock(on_tpu, budget):
    """End-to-end driver wall-clock on one regression case, device vs host
    CPU — the round-over-round track for the BASELINE "wall-clock vs CPU
    Palace" north star (the reference binary is not buildable here, so the
    recorded comparison point is this framework on host CPU).
    Case override: BENCH_SOLVE_CASE (default cavity2d_driven)."""
    case = os.environ.get("BENCH_SOLVE_CASE", "cavity2d_driven")
    est = 240.0
    if not budget.admit(f"solve {case}", est):
        return
    root = os.path.dirname(os.path.abspath(__file__))
    code = (
        "import time, sys\n"
        "from palace_tpu.testing.regression import CASES, run_case\n"
        f"res = run_case(CASES[{case!r}], '/tmp/palace_tpu_bench_solve')\n"
        "print('WALL', res.seconds, res.status)\n"
    )

    def run(env_extra):
        env = dict(os.environ)
        env.update(env_extra)
        try:
            proc = subprocess.run([sys.executable, "-c", code], cwd=root,
                                  env=env, capture_output=True, text=True,
                                  timeout=max(remaining(), 120.0))
        except subprocess.TimeoutExpired:
            return None
        for line in proc.stdout.splitlines():
            if line.startswith("WALL "):
                _, secs, status = line.split()
                return float(secs) if status in ("pass", "fail") else None
        print(f"solve bench failed rc={proc.returncode}: "
              f"{(proc.stdout + proc.stderr)[-500:]}", file=sys.stderr)
        return None

    t_row = time.time()
    dev_s = run({})
    cpu_s = run({"PALACE_TPU_PLATFORM": "cpu"}) \
        if (dev_s is not None and on_tpu and remaining() > 60) else None
    budget.update(est, time.time() - t_row)
    if dev_s is None:
        print(f"solve {case}: device run failed/timed out", file=sys.stderr)
        return
    speedup = (cpu_s / dev_s) if cpu_s else 0.0
    _emit(f"solve_wall_{case}", dev_s, speedup, unit="s")
    if cpu_s:
        _emit(f"solve_wall_{case}_hostcpu", cpu_s, 1.0, unit="s")


class Budget:
    """Admit rows against the global deadline, refining cost estimates with
    the measured cost of already-run rows (the round-4 bench overran its
    450 s deadline on one cold compile and silently skipped the production
    row — estimates now scale by the worst observed overrun factor)."""

    def __init__(self):
        self.factor = 1.0

    def admit(self, tag, est) -> bool:
        need = est * self.factor
        if remaining() < need:
            print(f"{tag} skipped: {remaining():.0f}s left < "
                  f"{need:.0f}s estimate", file=sys.stderr)
            return False
        return True

    def update(self, est, actual):
        if actual > est:
            self.factor = max(self.factor, actual / est)


def main():
    _setup_cache()
    on_tpu, bw, peaks = _chip()
    budget = Budget()
    headline = bench_unstructured(on_tpu, bw, peaks, budget)
    for fn in (bench_pallas, bench_structured):
        try:
            fn(on_tpu, bw, peaks, budget)
        except Exception as exc:  # a failed path must not kill the bench
            print(f"bench path {fn.__name__} failed: {exc!r}",
                  file=sys.stderr)
    try:
        bench_solve_wallclock(on_tpu, budget)
    except Exception as exc:
        print(f"bench path bench_solve_wallclock failed: {exc!r}",
              file=sys.stderr)
    if not RESULTS:
        sys.exit(1)
    # Explicitly-labeled summary carrying every row, then the headline
    # (the production unstructured apply) as the LAST line — the driver
    # parses the last complete JSON line.
    print(json.dumps({"metric": "summary_all_rows", "value": len(RESULTS),
                      "unit": "rows", "vs_baseline": 0.0, "rows": RESULTS}))
    if headline is None:
        headline = RESULTS[0]
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
