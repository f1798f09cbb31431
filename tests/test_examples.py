"""Smoke-execute every example pipeline end to end at sf0.001.

The ``examples/`` directory is the showcase surface; nothing else in CI
executes it, so a rename inside ``inception_spark`` would rot it
silently (VERDICT r8 ask 5).  Each example is run exactly the way a
user runs it — ``python examples/<name>.py <sf_dir>`` in a fresh
interpreter — which also covers the sys.path bootstrap at the top of
each script (an in-process ``main()`` call would miss it, and every
example stops its SparkSession, which would tear down the shared
pytest session).
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EXAMPLES_DIR = os.path.join(_REPO, "examples")
_EXAMPLES = sorted(
    f for f in os.listdir(_EXAMPLES_DIR) if f.endswith(".py")
)


def test_every_example_is_covered():
    """Parametrization below must track the directory: a new example
    file is automatically picked up, so this pins that the glob saw a
    sane, non-empty set."""
    assert len(_EXAMPLES) >= 9


@pytest.mark.parametrize("script", _EXAMPLES)
def test_example_runs_clean(script):
    proc = subprocess.run(
        [sys.executable, os.path.join("examples", script),
         "/root/testdata/sf0.001"],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"--- stdout (tail) ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr (tail) ---\n{proc.stderr[-3000:]}"
    )
