"""Shared host-side visualization helpers."""

from __future__ import annotations

import numpy as np


def create_checkerboard(width: int, height: int, size: int = 64) -> np.ndarray:
    """White/gray checkerboard background (reference ``utils.py:274-282``)."""
    yy, xx = np.mgrid[0:height, 0:width]
    cells = ((xx // size) + (yy // size)) % 2 == 0
    board = np.where(cells, 255, 128).astype(np.uint8)
    return np.repeat(board[..., None], 3, axis=-1)


def to_uint8(img) -> np.ndarray:
    """Clamp [0,1] float image to uint8 (reference ``torch_to_cv`` without
    the BGR flip, ``utils.py:285-290``)."""
    return (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
