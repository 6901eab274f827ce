"""Problem drivers (reference: palace/drivers/)."""

from __future__ import annotations


def get_driver(problem_type):
    from palace_tpu.config import ProblemType

    if problem_type is ProblemType.ELECTROSTATIC:
        from palace_tpu.drivers.electrostatic import solve
        return solve
    if problem_type is ProblemType.MAGNETOSTATIC:
        from palace_tpu.drivers.magnetostatic import solve
        return solve
    if problem_type is ProblemType.EIGENMODE:
        from palace_tpu.drivers.eigenmode import solve
        return solve
    if problem_type is ProblemType.DRIVEN:
        from palace_tpu.drivers.driven import solve
        return solve
    if problem_type is ProblemType.TRANSIENT:
        from palace_tpu.drivers.transient import solve
        return solve
    if problem_type is ProblemType.BOUNDARY_MODE:
        from palace_tpu.drivers.boundarymode import solve
        return solve
    raise NotImplementedError(f"driver for {problem_type} not implemented yet")
