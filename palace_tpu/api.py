"""Library entry point, mirroring palace::Run (reference: palace/driver.hpp:24)."""

from __future__ import annotations

import os


def configure_platform(device: str = "CPU"):
    """Select the JAX platform from config["Solver"]["Device"] (reference:
    palace/main.cpp:51-112 device configuration).

    "CPU" runs float64 on host; "GPU"/"TPU" use the accelerator.  The
    PALACE_TPU_PLATFORM env var overrides the config.  Must run before any
    jax computation; no-op if jax is already initialized.
    """
    import jax

    plat = os.environ.get("PALACE_TPU_PLATFORM")
    if plat is None:
        plat = "cpu" if device.upper() in ("CPU", "DEBUG") else "tpu"
    try:
        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            jax.config.update("jax_enable_x64", True)
    except RuntimeError:
        pass


def run(config_path: str, output_dir: str | None = None, dry_run: bool = False):
    """Load a configuration file and run the requested problem type.

    Returns the driver's result object (driver-specific measurements).
    """
    from palace_tpu.config import IoData, ProblemType

    iodata = IoData(config_path)
    if dry_run:
        return iodata

    configure_platform(iodata.solver.device)

    from palace_tpu.fem.operators import QuadraturePolicy, _env_policy

    QuadraturePolicy.set(iodata.solver.quadrature_order_jac,
                         iodata.solver.quadrature_order_extra)
    _env_policy()  # PALACE_TPU_QORDER_* env vars win over config

    from palace_tpu.drivers import get_driver
    from palace_tpu.utils import timers

    timers.reset()
    driver = get_driver(iodata.problem.type)
    return driver(iodata, output_dir=output_dir)
