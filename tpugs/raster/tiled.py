"""Tiled block-parallel differentiable rasterizer (pure-JAX path).

Design (TPU-first, not a CUDA translation):

The CUDA rasterizer in gsplat walks each tile's depth-sorted Gaussian
list *serially per pixel-thread*, updating transmittance T step by step.
A serial per-Gaussian scan is the worst shape for a TPU. Instead we make
compositing block-parallel:

    for each tile, for each block of B Gaussians (front-to-back):
        A[b, p]   = alpha of Gaussian b at pixel p          (VPU, dense)
        Texc[b,p] = exclusive prod_{b'<b} (1 - A[b', p])    (prefix product)
        W[b, p]   = A * Texc * T_carry[p]                   (VPU)
        image[p] += W^T @ colors_block                      (MXU matmul!)
        T_carry  *= prod_b (1 - A[b, p])

The per-Gaussian weights W are exactly the w(g, p) blend weights whose
sums the reference pipeline extracts with two autograd backward passes
through gsplat (``/root/reference/backproject.py:115-150``); here they
are explicit intermediates, which is what makes the fused single-pass
feature back-projection possible (see ``tpugs/lift/backproject.py``).

Compositing order is exact (prefix product == serial recurrence); the
matrix-multiply accumulation runs on the MXU, and the alpha math is
dense VPU work. Tiles are processed in chunks (vectorized) with a scan
over blocks; everything is static-shaped and reverse-mode
differentiable with plain ``jax.grad``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpugs.raster.binning import TileBinning, cdiv, tile_grid
from tpugs.raster.naive import evaluate_alpha


class TileConfig(NamedTuple):
    tile_size: int = 16  # pixels per tile edge
    block_size: int = 128  # Gaussians per compositing block (MXU K-dim)
    tiles_per_chunk: int = 32  # tiles vectorized together per scan step


def _tile_pixel_coords(
    tile_ids: jax.Array, ntx: int, tile_size: int
) -> Tuple[jax.Array, jax.Array]:
    """(TC,) tile ids -> pixel-center coords (TC, ts*ts) for x and y."""
    ts = tile_size
    ox = (tile_ids % ntx).astype(jnp.float32) * ts
    oy = (tile_ids // ntx).astype(jnp.float32) * ts
    lp = jnp.arange(ts * ts, dtype=jnp.float32)
    lx = lp % ts + 0.5
    ly = lp // ts + 0.5
    return ox[:, None] + lx[None, :], oy[:, None] + ly[None, :]


def render_tiled(
    means2d: jax.Array,  # (N, 2) depth-ordered
    conics: jax.Array,  # (N, 3) depth-ordered
    opacities: jax.Array,  # (N,) depth-ordered (already masked by validity)
    colors: jax.Array,  # (N, D) depth-ordered
    sorted_gid: jax.Array,  # (T,) from TileBinning (indices into the above)
    tile_starts: jax.Array,  # (n_tiles + 1,)
    width: int,
    height: int,
    max_blocks: int,  # static: ceil(max per-tile span / block_size)
    config: TileConfig = TileConfig(),
    background: Optional[jax.Array] = None,  # (D,)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (image (H, W, D), alpha (H, W))."""
    ts, B, TC = config.tile_size, config.block_size, config.tiles_per_chunk
    ntx, nty = tile_grid(width, height, ts)
    n_tiles = ntx * nty
    n_chunks = cdiv(n_tiles, TC)
    tspx = ts * ts
    D = colors.shape[-1]
    T_flat = sorted_gid.shape[0]
    n = means2d.shape[0]

    # Dummy row for sentinel gathers (opacity 0 -> zero contribution).
    m2d_x = jnp.concatenate([means2d, jnp.zeros((1, 2), means2d.dtype)], 0)
    con_x = jnp.concatenate(
        [conics, jnp.ones((1, 3), conics.dtype)], 0
    )
    opa_x = jnp.concatenate([opacities, jnp.zeros((1,), opacities.dtype)], 0)
    col_x = jnp.concatenate([colors, jnp.zeros((1, D), colors.dtype)], 0)

    starts = tile_starts[:-1]
    ends = tile_starts[1:]

    def chunk_body(_, chunk_start):
        tile_ids = chunk_start + jnp.arange(TC, dtype=jnp.int32)
        tid_safe = jnp.minimum(tile_ids, n_tiles - 1)
        live = tile_ids < n_tiles
        t_start = jnp.where(live, starts[tid_safe], 0)
        t_end = jnp.where(live, ends[tid_safe], 0)
        px_x, px_y = _tile_pixel_coords(tid_safe, ntx, ts)  # (TC, tspx)

        def block_body(carry, b):
            img, trans = carry
            idx = t_start[:, None] + b * B + jnp.arange(B, dtype=jnp.int32)
            in_span = idx < t_end[:, None]
            idx_safe = jnp.clip(idx, 0, T_flat - 1)
            gid = jnp.where(in_span, sorted_gid[idx_safe], n)  # (TC, B)

            mx = m2d_x[gid, 0]  # (TC, B)
            my = m2d_x[gid, 1]
            con = con_x[gid]  # (TC, B, 3)
            opa = opa_x[gid]  # (TC, B)
            col = col_x[gid]  # (TC, B, D)

            dx = px_x[:, None, :] - mx[:, :, None]  # (TC, B, tspx)
            dy = px_y[:, None, :] - my[:, :, None]
            alpha = evaluate_alpha(
                con[:, :, None, :], opa[:, :, None], dx, dy
            )  # (TC, B, tspx)
            alpha = jnp.where(in_span[:, :, None], alpha, 0.0)

            one_minus = 1.0 - alpha
            cum = jnp.cumprod(one_minus, axis=1)  # inclusive prefix
            texc = jnp.concatenate(
                [jnp.ones_like(cum[:, :1, :]), cum[:, :-1, :]], axis=1
            )
            w = alpha * texc * trans[:, None, :]  # (TC, B, tspx)

            img = img + jnp.einsum(
                "tbp,tbd->tpd",
                w,
                col,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            trans = trans * cum[:, -1, :]
            return (img, trans), None

        img0 = jnp.zeros((TC, tspx, D), jnp.float32)
        trans0 = jnp.ones((TC, tspx), jnp.float32)
        (img, trans), _ = jax.lax.scan(
            block_body, (img0, trans0), jnp.arange(max_blocks, dtype=jnp.int32)
        )
        return None, (img, trans)

    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * TC
    _, (imgs, transs) = jax.lax.scan(chunk_body, None, chunk_starts)
    # imgs: (n_chunks, TC, tspx, D); transs: (n_chunks, TC, tspx)
    imgs = imgs.reshape(n_chunks * TC, tspx, D)[:n_tiles]
    transs = transs.reshape(n_chunks * TC, tspx)[:n_tiles]

    alpha_out = 1.0 - transs
    if background is not None:
        imgs = imgs + transs[..., None] * background[None, None, :]

    def tiles_to_image(t):  # (n_tiles, tspx, C) -> (H, W, C)
        c = t.shape[-1]
        t = t.reshape(nty, ntx, ts, ts, c)
        t = jnp.transpose(t, (0, 2, 1, 3, 4))
        return t.reshape(nty * ts, ntx * ts, c)[:height, :width]

    image = tiles_to_image(imgs)
    alpha = tiles_to_image(alpha_out[..., None])[..., 0]
    return image, alpha


def required_blocks(binning: TileBinning, block_size: int) -> int:
    """Host helper: concrete number of blocks needed for this binning."""
    return max(1, cdiv(int(binning.max_span), block_size))
