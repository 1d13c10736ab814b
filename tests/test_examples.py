"""Every examples/ script must run end to end (each asserts its own
correctness against fp64 oracles). Run in-process so the suite's
forced-CPU config applies."""

import glob
import os
import runpy

import pytest

_EXAMPLES = sorted(
    glob.glob(
        os.path.join(os.path.dirname(__file__), os.pardir, "examples", "0*.py")
    )
)


def test_examples_discovered():
    assert len(_EXAMPLES) >= 6


@pytest.mark.parametrize("path", _EXAMPLES, ids=[os.path.basename(p) for p in _EXAMPLES])
def test_example_runs(path):
    runpy.run_path(path, run_name="__main__")
