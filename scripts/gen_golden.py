"""Regenerate the committed golden vectors (tests/golden/*.npz).

Run ONLY after an intended numerics change in the encoder/LPIPS blocks;
the diff of the regenerated files is the reviewable record of the
change. See tests/test_golden.py for what each case pins.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # goldens are CPU-f32
    from tests.test_golden import CASES, GOLDEN_DIR

    _os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in sorted(CASES.items()):
        out = {k: np.asarray(v) for k, v in fn().items()}
        path = _os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez(path, **out)
        sizes = {k: v.shape for k, v in out.items()}
        print(f"wrote {path}: {sizes}")


if __name__ == "__main__":
    main()
