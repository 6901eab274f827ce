"""Library entry point, mirroring palace::Run (reference: palace/driver.hpp:24)."""

from __future__ import annotations

import json
import os


def run(config_path: str, output_dir: str | None = None, dry_run: bool = False):
    """Load a configuration file and run the requested problem type.

    Returns the driver's result object (driver-specific measurements).
    """
    from palace_tpu.config import IoData, ProblemType

    iodata = IoData(config_path)
    if dry_run:
        return iodata

    from palace_tpu.drivers import get_driver

    driver = get_driver(iodata.problem.type)
    return driver(iodata, output_dir=output_dir)
