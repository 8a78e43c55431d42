"""Guard: every example script at least byte-compiles.

The examples/ tree is the ported analog of the reference's example
corpus (math-bem/examples/*.rs and the DE / IIR-FIR / test-functions
crates' examples); they are exercised manually, so this cheap compile
pass keeps syntax rot out of the suite without paying their runtimes.
"""

import glob
import os
import py_compile

import pytest

EXAMPLES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.py"))
)


def test_examples_present():
    # the full reference example corpus is ported; keep the floor honest
    assert len(EXAMPLES) >= 60


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_compiles(path, tmp_path):
    py_compile.compile(path, cfile=str(tmp_path / "c.pyc"), doraise=True)
