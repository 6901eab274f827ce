"""Static-analysis gate: scripts/lint.py must be clean over palace_tpu
(the reference's clang-tidy/CI gate analogue; SURVEY §5 sanitizers row)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "lint.py"),
         os.path.join(REPO, "palace_tpu")],
        capture_output=True, text=True)
    assert proc.returncode == 0, "lint findings:\n" + proc.stdout
