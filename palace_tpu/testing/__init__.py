"""Test-support utilities: the reference regression-corpus harness."""

from palace_tpu.testing.regression import (  # noqa: F401
    CASES,
    CaseResult,
    CaseSpec,
    diff_tree,
    load_table,
    run_case,
)
