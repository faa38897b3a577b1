"""Every script at the repo root / under scripts/ must at least compile.

Round-2 regression: a sys.path bootstrap was inserted *above*
``from __future__ import annotations`` in two scripts, making them
SyntaxErrors at HEAD while 204 tests stayed green (nothing imported
them). This test closes that hole: ``compile()`` every .py file that is
not part of the installed-and-imported ``tpugs``/``tests`` trees.
"""

import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _script_files():
    files = []
    for name in sorted(os.listdir(REPO_ROOT)):
        if name.endswith(".py"):
            files.append(os.path.join(REPO_ROOT, name))
    scripts_dir = os.path.join(REPO_ROOT, "scripts")
    for name in sorted(os.listdir(scripts_dir)):
        if name.endswith(".py"):
            files.append(os.path.join(scripts_dir, name))
    return files


@pytest.mark.parametrize(
    "path", _script_files(), ids=lambda p: os.path.relpath(p, REPO_ROOT)
)
def test_script_compiles(path):
    with open(path, "r", encoding="utf-8") as f:
        source = f.read()
    compile(source, path, "exec")
