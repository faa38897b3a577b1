"""Device mesh construction for multi-chip runs.

The reference scales with ``gsplat.distributed.cli`` — one NCCL process
per GPU, Gaussians strided across ranks, all-gathers inside the CUDA
rasterizer (``f3dgs/simple_trainer_feature_3dgs.py:205-208,460``). The
TPU-native equivalent is a ``jax.sharding.Mesh`` with two logical axes:

  * ``cam``   — data parallelism over training views (the back-
    projection camera loop is embarrassingly parallel; the reference
    serializes it);
  * ``gauss`` — model parallelism over the Gaussian axis (the N×512
    feature accumulator is the dominant memory object, SURVEY §5).

Collectives ride ICI via ``shard_map`` + ``psum``/``all_gather``; no
launcher daemon is needed — ``jax.distributed.initialize()`` covers
multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("cam", "gauss"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the ``cam`` axis, ``gauss`` singleton.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def pad_cameras(viewmats, Ks, multiple: int):
    """Pad the camera axis to a multiple of the mesh size; returns
    (viewmats, Ks, weights) with 0-weight padding entries."""
    import jax.numpy as jnp

    c = viewmats.shape[0]
    pad = (-c) % multiple
    w = jnp.concatenate([jnp.ones((c,)), jnp.zeros((pad,))])
    if pad:
        viewmats = jnp.concatenate(
            [viewmats, jnp.tile(jnp.eye(4)[None], (pad, 1, 1))]
        )
        Ks = jnp.concatenate([Ks, jnp.tile(Ks[:1], (pad, 1, 1))])
    return viewmats, Ks, w
