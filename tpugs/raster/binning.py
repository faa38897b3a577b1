"""Tile binning: per-tile depth-ordered Gaussian lists, without atomics.

The CUDA reference path (gsplat, used by every reference script through
``rasterization``) builds tile lists by duplicating each Gaussian once
per covered tile and radix-sorting 64-bit (tile, depth) keys with atomics
for the offsets. TPUs have neither fast global atomics nor a hardware
sort, so this module re-derives the same structure from primitives XLA
compiles well:

  1. depth-argsort all Gaussians once (``jax.lax.sort``);
  2. expand each (depth-ordered) Gaussian into a *static* number
     ``max_cover`` of (tile_id, position) pairs covering its screen
     bounding box, invalid slots pointing at a sentinel tile;
  3. one stable two-key sort by (tile_id, depth position) — depth order
     within each tile falls out of the pre-sort;
  4. per-tile spans via ``searchsorted``.

Everything is static-shaped. ``max_cover`` (max tiles per Gaussian) and
the per-tile max span are data-dependent, so the host wrapper buckets
them to powers of two and re-jits on bucket growth (SURVEY §7 "bucketed
recompilation").
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpugs.raster.projection import Projected


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    return cdiv(width, tile_size), cdiv(height, tile_size)


def tile_bbox(
    means2d: jax.Array,
    radii: jax.Array,
    valid: jax.Array,
    tile_size: int,
    n_tiles_x: int,
    n_tiles_y: int,
):
    """Inclusive-exclusive tile rectangle [tx0, tx1) x [ty0, ty1) covered
    by each Gaussian's radius square. Shared by the tiled renderer and the
    naive oracle so coverage semantics are identical."""
    x, y = means2d[..., 0], means2d[..., 1]
    r = radii
    ts = float(tile_size)
    tx0 = jnp.clip(jnp.floor((x - r) / ts), 0, n_tiles_x).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / ts), 0, n_tiles_y).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / ts) + 1, 0, n_tiles_x).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / ts) + 1, 0, n_tiles_y).astype(jnp.int32)
    # Invalid or zero-radius Gaussians cover nothing.
    empty = jnp.logical_not(valid) | (r <= 0)
    tx1 = jnp.where(empty, tx0, tx1)
    ty1 = jnp.where(empty, ty0, ty1)
    return tx0, ty0, tx1, ty1


def tile_cut_mask(
    means2d: jax.Array,  # (N, 2)
    conics: jax.Array,  # (N, 3) inverse-covariance upper triangle (a, b, c)
    sig_cut: jax.Array,  # (N,) sigma threshold ln(255*op); -1 if invalid
    tx: jax.Array,  # (N, K) candidate tile x indices
    ty: jax.Array,  # (N, K)
    tile_size: int,
) -> jax.Array:
    """False where every pixel of tile (tx, ty) is provably below the
    1/255 alpha clip for the Gaussian: the EXACT minimum of the conic
    quadratic sigma(p) = 0.5*(a dx^2 + c dy^2) + b dx dy over the tile
    rectangle exceeds ``sig_cut`` = ln(255*op) (``project``), i.e.
    alpha = op*exp(-sigma) < 1/255 everywhere in the tile. Dropping
    those intersections changes no output beyond f32 reassociation (the
    kernels zero sub-clip alphas anyway; removing zero entries only
    shifts block boundaries). Unlike the earlier circular bound
    (2*lambda_max*sig_cut radius), the ellipse test prunes the
    anisotropy slop — elongated Gaussians keep a circle of the MAJOR
    axis, covering ~16% more tiles than their true extent at garden
    scale. Pixel centers sit at +0.5 inside [x0, x0+ts], so testing the
    full rectangle is conservative; the min of a convex quadratic over
    a rectangle is 0 if the mean is inside, else the min over the four
    edges, each a clamped 1D quadratic."""
    ts = float(tile_size)
    x0 = tx.astype(jnp.float32) * ts
    mx = means2d[..., 0:1]
    my = means2d[..., 1:2]
    y0 = ty.astype(jnp.float32) * ts
    a = conics[..., 0:1]
    b = conics[..., 1:2]
    c = conics[..., 2:3]
    # Tile rectangle in mean-relative coordinates.
    lx = x0 - mx
    ux = lx + ts
    ly = y0 - my
    uy = ly + ts
    inside = (lx <= 0.0) & (ux >= 0.0) & (ly <= 0.0) & (uy >= 0.0)
    a_s = jnp.maximum(a, 1e-12)
    c_s = jnp.maximum(c, 1e-12)

    def edge_terms(dx, dy):
        t1 = (0.5 * a) * dx * dx
        t2 = (0.5 * c) * dy * dy
        t3 = b * dx * dy
        # (value, magnitude): |t1|+|t2|+|t3| bounds the cancellation
        # mass of the f32 sum — t1, t2 >= 0 for PSD conics, so only t3
        # can cancel, but the symmetric bound is 2 extra abs ops.
        return t1 + t2 + t3, jnp.abs(t1) + jnp.abs(t2) + jnp.abs(t3)

    def edge_x(dx):  # min over dy in [ly, uy] at fixed dx (c > 0: convex)
        dy = jnp.clip(-b * dx / c_s, ly, uy)
        return edge_terms(dx, dy)

    def edge_y(dy):
        dx = jnp.clip(-b * dy / a_s, lx, ux)
        return edge_terms(dx, dy)

    q_xl, m_xl = edge_x(lx)
    q_xu, m_xu = edge_x(ux)
    q_yl, m_yl = edge_y(ly)
    q_yu, m_yu = edge_y(uy)
    qmin = jnp.minimum(jnp.minimum(q_xl, q_xu), jnp.minimum(q_yl, q_yu))
    qmin = jnp.where(inside, 0.0, qmin)
    mmax = jnp.maximum(jnp.maximum(m_xl, m_xu), jnp.maximum(m_yl, m_yu))
    # Headroom absorbs f32 ordering differences between this bound and
    # the kernels' per-pixel sigma: a 1e-3 absolute floor (weights near
    # the clip are ~1/255) PLUS a few ULPs of the evaluated term
    # magnitudes — for highly anisotropic conics the O(|b*dx*dy|)
    # cancellation alone can exceed any absolute constant (ADVICE r4).
    eps = 32.0 * jnp.finfo(jnp.float32).eps
    return qmin <= sig_cut[..., None] + 1e-3 + eps * mmax


def culled_covers(
    proj,  # Projected
    tile_size: int,
    width: int,
    height: int,
    max_cover: int,
):
    """Per-Gaussian (bbox_cover, culled_cover): the number of candidate
    tiles in the radius bbox, and how many survive the exact ellipse
    cull (``tile_cut_mask``). Drives the culled-cover-aware
    ``cover_caps`` estimate for the compacted slot table (the reduce
    gathers per-row prefixes sized by these caps)."""
    ntx, nty = tile_grid(width, height, tile_size)
    tx0, ty0, tx1, ty1 = tile_bbox(
        proj.means2d, proj.radii, proj.valid, tile_size, ntx, nty
    )
    w = tx1 - tx0
    cnt = w * (ty1 - ty0)
    j = jnp.arange(max_cover, dtype=jnp.int32)
    w_safe = jnp.maximum(w, 1)
    jx = j[None, :] % w_safe[:, None]
    jy = j[None, :] // w_safe[:, None]
    sv = j[None, :] < cnt[:, None]
    sv &= tile_cut_mask(
        proj.means2d, proj.conics, proj.sig_cut,
        tx0[:, None] + jx, ty0[:, None] + jy, tile_size,
    )
    return cnt, jnp.sum(sv.astype(jnp.int32), axis=1)


class TileBinning(NamedTuple):
    order: jax.Array  # (N,) depth-sort permutation (front first)
    sorted_gid: jax.Array  # (N*max_cover,) idx into depth-ordered arrays;
    #                         sentinel entries == N
    tile_starts: jax.Array  # (n_tiles + 1,) span offsets into sorted_gid
    max_span: jax.Array  # () int32 — longest per-tile list (for bucketing)
    max_cover_req: jax.Array  # () int32 — true max tiles/Gaussian (must be
    #                            <= the static max_cover used; else re-bucket)
    n_isects: jax.Array  # () int32 — number of real intersections


def build_tile_binning(
    proj: Projected,
    tile_size: int,
    width: int,
    height: int,
    max_cover: int,
) -> TileBinning:
    ntx, nty = tile_grid(width, height, tile_size)
    n_tiles = ntx * nty
    n = proj.means2d.shape[0]

    depth_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(depth_key)

    m2d = proj.means2d[order]
    radii = proj.radii[order]
    valid = proj.valid[order]

    tx0, ty0, tx1, ty1 = tile_bbox(m2d, radii, valid, tile_size, ntx, nty)
    w = tx1 - tx0
    h = ty1 - ty0
    cnt = w * h
    max_cover_req = jnp.max(cnt)

    j = jnp.arange(max_cover, dtype=jnp.int32)
    w_safe = jnp.maximum(w, 1)
    jx = j[None, :] % w_safe[:, None]
    jy = j[None, :] // w_safe[:, None]
    slot_valid = j[None, :] < cnt[:, None]
    # Drop bbox candidates that are provably below the alpha clip
    # everywhere in the tile (exact; see tile_cut_mask).
    slot_valid &= tile_cut_mask(
        m2d, proj.conics[order], proj.sig_cut[order],
        tx0[:, None] + jx, ty0[:, None] + jy, tile_size,
    )
    tid = (ty0[:, None] + jy) * ntx + (tx0[:, None] + jx)
    tid = jnp.where(slot_valid, tid, n_tiles).astype(jnp.int32)
    gid = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, max_cover)
    )
    gid = jnp.where(slot_valid, gid, n).astype(jnp.int32)

    tid_flat = tid.reshape(-1)
    gid_flat = gid.reshape(-1)
    # Two-key sort: primary tile id, secondary depth position. (tid, gid)
    # pairs are unique, so the result is the exact front-to-back order per
    # tile.
    tid_sorted, gid_sorted = jax.lax.sort(
        (tid_flat, gid_flat), num_keys=2, is_stable=False
    )

    tile_starts = jnp.searchsorted(
        tid_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    spans = tile_starts[1:] - tile_starts[:-1]
    max_span = jnp.max(spans)
    n_isects = tile_starts[-1]

    return TileBinning(
        order=order,
        sorted_gid=gid_sorted,
        tile_starts=tile_starts,
        max_span=max_span,
        max_cover_req=max_cover_req,
        n_isects=n_isects,
    )


def bucket(value: int, minimum: int = 1) -> int:
    """Round up to the next power of two (host-side bucketing to bound
    recompilation)."""
    v = max(int(value), minimum)
    return 1 << (v - 1).bit_length()
