"""tpugs — a TPU-native 3D Gaussian Splatting feature-lifting framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
JojiJoseph/3dgs-gradient-backprojection (gradient-weighted feature
back-projection for 3DGS), including the differentiable tile-based
rasterizer itself (the reference delegates that to the CUDA `gsplat`
library; here it is built TPU-first).

Layering (mirrors reference SURVEY layer map):
  L0 raster/   — differentiable tiled rasterizer (projection, binning,
                 block-parallel compositing, Pallas kernels)
  L1 io/ core/ — scene pytree, camera math, COLMAP + checkpoint I/O
  L2 lift/     — gradient pruning + render-equivalence verification
  L3 lift/     — gradient-weighted feature back-projection engine
  L4 query/    — text / pixel / exemplar queries, 3D mask editing
  L5 viz/      — gif / pca / checkerboard render outputs
  L6 apps/     — CLI apps (backproject, segment, viewer, ...)
  L7 train/    — feature-3DGS training baseline
     dist/     — device mesh + sharding for multi-chip runs
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TPUGS_PLATFORM"):
    # Escape hatch for a dead/contended accelerator tunnel: the axon
    # plugin force-registers itself and ignores JAX_PLATFORMS, so honor
    # an explicit platform request via jax.config (which it respects).
    # e.g. TPUGS_PLATFORM=cpu python -m tpugs.apps.backproject ...
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TPUGS_PLATFORM"])

from tpugs.core.scene import GaussianScene  # noqa: F401
from tpugs.core.camera import Camera  # noqa: F401
from tpugs.raster.api import rasterize  # noqa: F401
