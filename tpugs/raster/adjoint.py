"""Adjoint (transpose) rasterization: image -> per-Gaussian sums.

The paper's core identity (reference ``backproject.py:115-150``): for a
rendered image I(p) = Σ_g w(g,p)·c_g, the gradient of Σ_p I(p)·F(p)
w.r.t. c_g equals Σ_p w(g,p)·F(p) — the alpha-blend-weighted sum of
pixel features per Gaussian. The reference extracts this by running the
CUDA rasterizer **three times per view** (one no-grad RGB render plus
two autograd backwards: one against the feature image, one against an
all-ones image for the normalizer Σ_p w(g,p)).

Because our tiled renderer materializes the blend weights w(g,p)
blockwise (see ``tiled.py``), the adjoint is a *single forward-structured
pass* that produces BOTH the feature numerator and the weight denominator
at once — no backward, no N×512 zero-color render, no second pass. The
per-block accumulation is an MXU matmul (pixels × features contracted
against weights) followed by a scatter-add keyed by Gaussian id.

This op is also its own gradient story: it IS the VJP of the renderer
w.r.t. colors, so it doubles as the hand-written backward for color
gradients (used by ``prune_by_gradients``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpugs.raster.binning import cdiv, tile_grid
from tpugs.raster.naive import evaluate_alpha
from tpugs.raster.tiled import TileConfig, _tile_pixel_coords


def image_to_tiles(image: jax.Array, tile_size: int) -> jax.Array:
    """(H, W, D) -> (n_tiles, ts*ts, D) with zero padding at the edges."""
    H, W, D = image.shape
    ntx, nty = tile_grid(W, H, tile_size)
    ts = tile_size
    pad_h, pad_w = nty * ts - H, ntx * ts - W
    img = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
    img = img.reshape(nty, ts, ntx, ts, D)
    img = jnp.transpose(img, (0, 2, 1, 3, 4))
    return img.reshape(nty * ntx, ts * ts, D)


def backproject_tiled(
    means2d: jax.Array,  # (N, 2) depth-ordered
    conics: jax.Array,  # (N, 3) depth-ordered
    opacities: jax.Array,  # (N,) depth-ordered, validity-masked
    sorted_gid: jax.Array,  # (T,)
    tile_starts: jax.Array,  # (n_tiles+1,)
    feat_image: Optional[jax.Array],  # (H, W, D) pixel features, or None
    width: int,
    height: int,
    max_blocks: int,
    config: TileConfig = TileConfig(),
) -> Tuple[Optional[jax.Array], jax.Array]:
    """Returns (feat_sums (N, D) or None, weight_sums (N,)), both in the
    same depth order as the inputs.

    feat_sums[g]  = Σ_p w(g,p) · feat_image[p]
    weight_sums[g] = Σ_p w(g,p)
    """
    ts, B, TC = config.tile_size, config.block_size, config.tiles_per_chunk
    ntx, nty = tile_grid(width, height, ts)
    n_tiles = ntx * nty
    n_chunks = cdiv(n_tiles, TC)
    tspx = ts * ts
    T_flat = sorted_gid.shape[0]
    n = means2d.shape[0]

    m2d_x = jnp.concatenate([means2d, jnp.zeros((1, 2), means2d.dtype)], 0)
    con_x = jnp.concatenate([conics, jnp.ones((1, 3), conics.dtype)], 0)
    opa_x = jnp.concatenate([opacities, jnp.zeros((1,), opacities.dtype)], 0)

    with_feats = feat_image is not None
    if with_feats:
        D = feat_image.shape[-1]
        feat_tiles = image_to_tiles(feat_image, ts)  # (n_tiles, tspx, D)

    starts = tile_starts[:-1]
    ends = tile_starts[1:]

    def chunk_body(carry, chunk_start):
        acc_f, acc_w = carry
        tile_ids = chunk_start + jnp.arange(TC, dtype=jnp.int32)
        tid_safe = jnp.minimum(tile_ids, n_tiles - 1)
        live = tile_ids < n_tiles
        t_start = jnp.where(live, starts[tid_safe], 0)
        t_end = jnp.where(live, ends[tid_safe], 0)
        px_x, px_y = _tile_pixel_coords(tid_safe, ntx, ts)
        if with_feats:
            feats_chunk = jnp.where(
                live[:, None, None], feat_tiles[tid_safe], 0.0
            )  # (TC, tspx, D)

        def block_body(carry, b):
            acc_f, acc_w, trans = carry
            idx = t_start[:, None] + b * B + jnp.arange(B, dtype=jnp.int32)
            in_span = idx < t_end[:, None]
            idx_safe = jnp.clip(idx, 0, T_flat - 1)
            gid = jnp.where(in_span, sorted_gid[idx_safe], n)  # (TC, B)

            mx = m2d_x[gid, 0]
            my = m2d_x[gid, 1]
            con = con_x[gid]
            opa = opa_x[gid]

            dx = px_x[:, None, :] - mx[:, :, None]
            dy = px_y[:, None, :] - my[:, :, None]
            alpha = evaluate_alpha(con[:, :, None, :], opa[:, :, None], dx, dy)
            alpha = jnp.where(in_span[:, :, None], alpha, 0.0)

            one_minus = 1.0 - alpha
            cum = jnp.cumprod(one_minus, axis=1)
            texc = jnp.concatenate(
                [jnp.ones_like(cum[:, :1, :]), cum[:, :-1, :]], axis=1
            )
            w = alpha * texc * trans[:, None, :]  # (TC, B, tspx)

            gid_flat = gid.reshape(-1)
            if with_feats:
                contrib = jnp.einsum(
                    "tbp,tpd->tbd",
                    w,
                    feats_chunk,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (TC, B, D)
                acc_f = acc_f.at[gid_flat].add(
                    contrib.reshape(-1, contrib.shape[-1])
                )
            acc_w = acc_w.at[gid_flat].add(jnp.sum(w, axis=-1).reshape(-1))
            trans = trans * cum[:, -1, :]
            return (acc_f, acc_w, trans), None

        trans0 = jnp.ones((TC, tspx), jnp.float32)
        (acc_f, acc_w, _), _ = jax.lax.scan(
            block_body,
            (acc_f, acc_w, trans0),
            jnp.arange(max_blocks, dtype=jnp.int32),
        )
        return (acc_f, acc_w), None

    acc_f0 = (
        jnp.zeros((n + 1, feat_image.shape[-1]), jnp.float32)
        if with_feats
        else jnp.zeros((1, 1), jnp.float32)  # unused placeholder
    )
    acc_w0 = jnp.zeros((n + 1,), jnp.float32)
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * TC
    (acc_f, acc_w), _ = jax.lax.scan(chunk_body, (acc_f0, acc_w0), chunk_starts)

    feat_sums = acc_f[:n] if with_feats else None
    return feat_sums, acc_w[:n]
