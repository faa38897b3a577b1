"""Pallas TPU kernels: fused tile rasterization + adjoint back-projection.

Why these exist: the pure-JAX tiled path (``tiled.py``/``adjoint.py``)
is HBM-bound — every (tiles, block, pixels) intermediate round-trips to
HBM, per-block parameter gathers serialize, and XLA lowers the
per-Gaussian scatter-add as a sequential loop (measured ~4.6 s/view at
garden scale). These kernels fuse the whole per-tile pipeline in VMEM
and eliminate gathers/scatters from the hot loop entirely:

  * per-view, parameters are **pre-gathered once** into intersection
    order (XLA gather), laid out transposed so a block DMA lands each
    parameter as a (1, 128) lane vector;
  * the kernel walks each tile's contiguous span with async DMA,
    computing alpha/transmittance/weights on the VPU with pixels on
    sublanes (256) and Gaussians on lanes (128); the prefix-product
    transmittance is 7 lane-roll doubling steps;
  * color/feature accumulation is an MXU matmul per block;
  * tiles early-exit once transmittance saturates (< 1e-4);
  * the adjoint writes per-intersection contribution rows to a
    **block-padded contiguous layout** (plain DMA, no scatter); the
    per-Gaussian reduction is then an XLA *gather* over a precomputed
    (N, max_cover) slot table — scatter-free end to end, the
    "segmented reductions instead of CUDA atomics" design from
    SURVEY §7 / BASELINE.json.

Reference equivalence: kernel output matches ``render_tiled`` /
``backproject_tiled`` (and therefore the naive oracle + autodiff) up to
the early-exit threshold; see tests/test_pallas.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugs.raster.binning import bucket, build_tile_binning, cdiv, tile_grid
from tpugs.raster.projection import (
    Projected,
    ProjectionConfig,
    project,
)

BLOCK = 128  # Gaussians per block (lane dimension)
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
TRANS_EPS = 1e-4  # early-exit transmittance threshold


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


_STATIC = dict(static=True)


@_pytree_dataclass
class PallasPlan:
    """Per-(scene, camera) static-shaped plan for the Pallas kernels."""

    order: jax.Array  # (N,) depth permutation
    padded_gid: jax.Array  # (T_padded,) Gaussian id per block-padded
    #                        intersection slot (sentinel = N for padding)
    tile_starts: jax.Array  # (n_tiles,) raw span offsets (for lane masks)
    tile_ends: jax.Array  # (n_tiles,)
    padded_starts: jax.Array  # (n_tiles,) block-padded offsets — every
    #                           value is a multiple of BLOCK, so all
    #                           kernel DMAs are lane-tile aligned
    slots: jax.Array  # (cover_pad, N) padded-contrib slot per cover, or
    #                    T_padded (dummy zero row) for unused covers.
    #                    Stored cover-major (transposed) so each cover row
    #                    is contiguous and lane-packed; columns sorted by
    #                    DESCENDING cover count, so row j's real entries
    #                    form a prefix (see reduce).
    slot_order: jax.Array  # (N,) original Gaussian index per slots COLUMN
    #                         (the table is cover-major (cover_pad, N))
    # Scatter-write reduce (reduce_engine="scatter") extras, built only
    # when the plan is constructed with scatter=True:
    slot_pos: Optional[jax.Array] = None  # (T_padded,) striped-layout
    #   destination row per padded plan position (R_striped = trash row
    #   for culled/padding entries) — lets the adjoint kernel write its
    #   contribution rows directly in slot-table order, replacing the
    #   reduce's 68-ms random-row gather with per-row DMA writes hidden
    #   behind the kernel's own pipeline (exp_scatter_write, r5)
    culled: Optional[jax.Array] = None  # (N,) culled cover count per
    #   slots COLUMN — masks striped rows never written
    width: int = dataclasses.field(metadata=_STATIC, default=0)
    height: int = dataclasses.field(metadata=_STATIC, default=0)
    tile_size: int = dataclasses.field(metadata=_STATIC, default=16)
    K_pad: int = dataclasses.field(metadata=_STATIC, default=0)
    T_padded: int = dataclasses.field(metadata=_STATIC, default=0)
    cover_pad: int = dataclasses.field(metadata=_STATIC, default=0)
    cover_caps: tuple = dataclasses.field(metadata=_STATIC, default=())
    # ((count, slots), ...) descending slots; () = single class
    classes: tuple = dataclasses.field(metadata=_STATIC, default=())


# --------------------------------------------------------------- planning


@functools.partial(
    jax.jit, static_argnames=("tile_size", "width", "height", "max_cover")
)
def _plan_stats(proj: Projected, tile_size, width, height, max_cover):
    """Concrete sizes needed to bucket the static dims."""
    binning = build_tile_binning(proj, tile_size, width, height, max_cover)
    spans = binning.tile_starts[1:] - binning.tile_starts[:-1]
    t_padded = jnp.sum(cdiv_arr(spans, BLOCK)) * BLOCK
    return binning.n_isects, t_padded, binning.max_cover_req


def cdiv_arr(a, b):
    return -(-a // b)


def _cap_req(proj: Projected, tile_size, width, height, max_cover):
    """Per-view ``cover_caps`` requirement in the COMPACTED slot table's
    rank domain — the SAME quantity ``estimate_pallas_sizes`` sizes the
    caps from (ADVICE r4: the audit must not compare the raw bbox-cover
    histogram against culled-cover-sized caps).

    After column compaction, column p (cover-rank order by bbox count)
    has real row-j entries iff its CULLED cover > j, so the exact
    requirement is req[j] = 1 + max{rank p : culled_p > j}. The plan
    ranks by ``argsort(-bbox_cnt)`` with arbitrary tie order, so the
    bound uses the END of the tie group: any Gaussian with bbox count c
    ranks before #(cnt >= c), hence req[j] <= suffix_hist[min cnt among
    culled > j]. Returns (max_cover,) int32."""
    from tpugs.raster.binning import culled_covers

    cnt, culled = culled_covers(proj, tile_size, width, height, max_cover)
    bc = jnp.bincount(jnp.clip(cnt, 0, max_cover), length=max_cover + 1)
    # suffix[c] = #Gaussians with bbox count >= c
    suffix = jnp.cumsum(bc[::-1])[::-1]
    j_ar = jnp.arange(max_cover, dtype=jnp.int32)
    big = jnp.int32(max_cover + 1)
    m_j = jnp.min(
        jnp.where(culled[None, :] > j_ar[:, None], cnt[None, :], big),
        axis=1,
    )
    return jnp.where(
        m_j <= max_cover,
        suffix[jnp.clip(m_j, 0, max_cover)],
        0,
    ).astype(jnp.int32)


_cap_req_jit = functools.partial(
    jax.jit, static_argnames=("tile_size", "width", "height", "max_cover")
)(_cap_req)


@functools.partial(
    jax.jit, static_argnames=("tile_size", "width", "height", "max_cover")
)
def _cover_hist_jit(proj: Projected, tile_size, width, height, max_cover):
    """hist[j] = #Gaussians covering more than j tiles."""
    from tpugs.raster.binning import tile_bbox

    ntx, nty = tile_grid(width, height, tile_size)
    tx0, ty0, tx1, ty1 = tile_bbox(
        proj.means2d, proj.radii, proj.valid, tile_size, ntx, nty
    )
    cnt = (tx1 - tx0) * (ty1 - ty0)
    j = jnp.arange(max_cover, dtype=jnp.int32)
    return jnp.sum(cnt[None, :] > j[:, None], axis=1)


def _sort_by_tile_rank(tid_flat, gid_flat, eidx, n, n_tiles,
                       force_path=None):
    """Sort expansion entries by (tile, depth-rank).

    Packs (tile, rank) into one uint32 key when it fits: a one-key
    two-operand sort moves ~40% less data through the sort network than
    the two-key three-operand form (the sort dominates plan cost).
    Two bit-savers widen the packed path to garden scale (524k
    Gaussians x 4293 tiles needs 33 bits signed, 32 unsigned):
    sentinel entries (tid == n_tiles) never share a tile with valid
    ones, so their rank can be clamped to n-1 (saving the +1 bit when
    n is a power of two), and uint32 keys buy the sign bit.

    Returns (tid_s, gid_s, eidx_s, tile_starts_full). ``force_path``
    ("packed"/"twokey") is a test hook; gid_s of sentinel rows is
    path-dependent (n-1 packed, n two-key) and every consumer masks on
    tid_s < n_tiles first.
    """
    S = 1 << int(np.ceil(np.log2(max(n, 2))))
    packed = (n_tiles + 1) * S <= 2**32
    if force_path is not None:
        packed = force_path == "packed"
        assert not (packed and (n_tiles + 1) * S > 2**32)
    if packed:
        gid_key = jnp.minimum(gid_flat, n - 1).astype(jnp.uint32)
        key = tid_flat.astype(jnp.uint32) * jnp.uint32(S) + gid_key
        key_s, eidx_s = jax.lax.sort((key, eidx), num_keys=1, is_stable=False)
        tid_s = (key_s // jnp.uint32(S)).astype(jnp.int32)  # pow2 -> shift
        gid_s = (key_s & jnp.uint32(S - 1)).astype(jnp.int32)
        tile_starts_full = jnp.searchsorted(
            key_s,
            jnp.arange(n_tiles + 1, dtype=jnp.uint32) * jnp.uint32(S),
            side="left",
        ).astype(jnp.int32)
    else:
        tid_s, gid_s, eidx_s = jax.lax.sort(
            (tid_flat, gid_flat, eidx), num_keys=2, is_stable=False
        )
        tile_starts_full = jnp.searchsorted(
            tid_s, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    return tid_s, gid_s, eidx_s, tile_starts_full


def _normalize_classes(classes, n, max_cover):
    """Canonical size-class layout: ((count, slots), ...) with slots
    strictly descending, counts summing to n, every count > 0, and the
    first class at full max_cover slots (cover-rank order guarantees
    the highest-cover Gaussians land there). () -> single class."""
    if not classes or n <= 0:
        return ((max(n, 0), max_cover),)
    out = []
    total = 0
    for cnt, slots in classes:
        cnt = min(int(cnt), n - total)
        slots = max(1, min(int(slots), max_cover))
        if cnt <= 0:
            continue
        if out and slots >= out[-1][1]:
            slots = out[-1][1]  # enforce descending by merging
        if out and out[-1][1] == slots:
            out[-1] = (out[-1][0] + cnt, slots)
        else:
            out.append((cnt, slots))
        total += cnt
    if not out:
        return ((n, max_cover),)
    if total < n:  # tail class absorbs the remainder
        out[-1] = (out[-1][0] + (n - total), out[-1][1])
    if out[0][1] != max_cover:
        out[0] = (out[0][0], max_cover)
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_size",
        "width",
        "height",
        "max_cover",
        "K_pad",
        "T_padded",
        "cover_pad",
        "cover_caps",
        "classes",
        "with_stats",
        "scatter",
    ),
)
def _plan_build(
    proj: Projected,
    tile_size,
    width,
    height,
    max_cover,
    K_pad,
    T_padded,
    cover_pad,
    cover_caps=(),
    classes=(),
    with_stats=False,
    scatter=False,
):
    n = proj.means2d.shape[0]
    ntx, nty = tile_grid(width, height, tile_size)
    n_tiles = ntx * nty

    # Re-run the binning, this time keeping the expansion index so the
    # inverse permutation (expansion entry -> sorted position) is known.
    from tpugs.raster.binning import tile_bbox

    depth_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    # The TPU row gather is row-RATE-bound (~63 M rows/s for any row
    # width up to ~64 B — BASELINE round 4), so every per-Gaussian array
    # permuted or gathered separately pays the full N-row price. Stack
    # all depth-ordered inputs into ONE table: one permute here, one
    # row gather per class inside expand.
    tab0 = jnp.concatenate(
        [
            proj.means2d,  # 0:2  mx, my
            proj.conics,  # 2:5  ca, cb, cc
            proj.sig_cut[:, None],  # 5
            proj.radii[:, None],  # 6
            jnp.where(proj.valid, 1.0, 0.0)[:, None],  # 7
        ],
        axis=1,
    )[order]
    m2d = tab0[:, 0:2]
    radii = tab0[:, 6]
    valid = tab0[:, 7] > 0.5
    tx0, ty0, tx1, ty1 = tile_bbox(m2d, radii, valid, tile_size, ntx, nty)
    w = tx1 - tx0
    h = ty1 - ty0
    cnt = w * h
    w_safe = jnp.maximum(w, 1)
    # Expand-side table: bbox ints (exact in f32: tiles < 2^12, covers
    # < 2^12) + the cull inputs. 10 f32 columns = 40-B rows, still one
    # row-gather unit.
    etab = jnp.concatenate(
        [
            tx0[:, None].astype(jnp.float32),  # 0
            ty0[:, None].astype(jnp.float32),  # 1
            w_safe[:, None].astype(jnp.float32),  # 2
            cnt[:, None].astype(jnp.float32),  # 3
            tab0[:, 0:6],  # 4:10  mx, my, ca, cb, cc, sig_cut
        ],
        axis=1,
    )

    # ---- size-classed expansion: sort Gaussians by descending cover
    # and give each class of ranks only as many expansion slots as its
    # covers need (the classes come from the maxed cover histogram with
    # margins — see _choose_classes). The expansion entry index e
    # encodes (class, j, row) — j-major within a class, matching the
    # cover-major (slots_per, count) flatten and the reshape(c_slots,
    # c_cnt) reassembly of the slot table after the big sort.
    cover_rank = jnp.argsort(-cnt)
    classes = _normalize_classes(classes, n, max_cover)

    def expand(rows, slots_per):
        # Cover-major (slots_per, count) layout: the class's count is the
        # minor (lane) dim, so the VPU is fully packed; a (count,
        # slots_per) layout pads the tiny minor dim (4..24) to 128 lanes
        # and wastes ~97% of it (measured 93 ms -> 9 ms for this stage).
        # ONE (count, 10) row gather fetches every per-Gaussian input —
        # per-array gathers each pay the full row-rate price, per-entry
        # scalar gathers are latency-bound (measured 5x slower overall).
        # Entries flatten j-MAJOR; the slot-table reassembly matches.
        r = etab[rows]  # (count, 10)
        r_tx0 = r[:, 0].astype(jnp.int32)[None, :]
        r_ty0 = r[:, 1].astype(jnp.int32)[None, :]
        r_w = r[:, 2].astype(jnp.int32)[None, :]
        r_cnt = r[:, 3].astype(jnp.int32)[None, :]
        jj = jnp.arange(slots_per, dtype=jnp.int32)[:, None]
        jx = jj % r_w
        jy = jj // r_w
        # truncation guard: entries beyond slots_per are dropped (the
        # size estimation's class-boundary margins must cover all
        # high-cover Gaussians; see _choose_classes)
        sv = jj < jnp.minimum(r_cnt, slots_per)
        # Sub-cutoff tile cull (exact): bbox candidates whose whole tile
        # is below the 1/255 alpha clip become sentinels, shrinking the
        # real per-tile spans (hence T_padded, the adjoint grid, and the
        # pack) without changing any output pixel or gradient. Inline
        # (slots, count)-layout form of binning.tile_cut_mask (exact
        # ellipse-vs-tile-rect: min of the conic quadratic over the
        # rect vs ln(255*op) — see that docstring for the math).
        ts = float(tile_size)
        x0 = (r_tx0 + jx).astype(jnp.float32) * ts
        y0 = (r_ty0 + jy).astype(jnp.float32) * ts
        mx = r[:, 4][None, :]
        my = r[:, 5][None, :]
        ca = r[:, 6][None, :]
        cb = r[:, 7][None, :]
        cc = r[:, 8][None, :]
        sc = r[:, 9][None, :]
        lx = x0 - mx
        ux = lx + ts
        ly = y0 - my
        uy = ly + ts
        inside = (lx <= 0.0) & (ux >= 0.0) & (ly <= 0.0) & (uy >= 0.0)
        ca_s = jnp.maximum(ca, 1e-12)
        cc_s = jnp.maximum(cc, 1e-12)

        def _edge_x(dxe):
            dye = jnp.clip(-cb * dxe / cc_s, ly, uy)
            return (0.5 * ca) * dxe * dxe + (0.5 * cc) * dye * dye \
                + cb * dxe * dye

        def _edge_y(dye):
            dxe = jnp.clip(-cb * dye / ca_s, lx, ux)
            return (0.5 * ca) * dxe * dxe + (0.5 * cc) * dye * dye \
                + cb * dxe * dye

        qmin = jnp.minimum(
            jnp.minimum(_edge_x(lx), _edge_x(ux)),
            jnp.minimum(_edge_y(ly), _edge_y(uy)),
        )
        qmin = jnp.where(inside, 0.0, qmin)
        sv &= qmin <= sc + 1e-3
        t = (r_ty0 + jy) * ntx + (r_tx0 + jx)
        t = jnp.where(sv, t, n_tiles).astype(jnp.int32)
        g = jnp.where(sv, rows[None, :], n).astype(jnp.int32)
        return t.reshape(-1), g.reshape(-1)

    tid_parts, gid_parts = [], []
    off = 0
    for c_cnt, c_slots in classes:
        t_c, g_c = expand(cover_rank[off : off + c_cnt], c_slots)
        tid_parts.append(t_c)
        gid_parts.append(g_c)
        off += c_cnt
    tid_flat = jnp.concatenate(tid_parts) if len(tid_parts) > 1 else tid_parts[0]
    gid_flat = jnp.concatenate(gid_parts) if len(gid_parts) > 1 else gid_parts[0]

    eidx = jnp.arange(tid_flat.shape[0], dtype=jnp.int32)
    tid_s, gid_s, eidx_s, tile_starts_full = _sort_by_tile_rank(
        tid_flat, gid_flat, eidx, n, n_tiles
    )
    spans = tile_starts_full[1:] - tile_starts_full[:-1]
    padded_spans = cdiv_arr(spans, BLOCK) * BLOCK
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_spans)[:-1].astype(jnp.int32)]
    )

    # Slot table: sorted position s holds expansion entry eidx_s[s];
    # its padded output position is padded_starts[tile] + (s - start).
    s_idx = jnp.arange(tid_s.shape[0], dtype=jnp.int32)
    tile_of_s = jnp.minimum(tid_s, n_tiles - 1)
    pos = padded_starts[tile_of_s] + (s_idx - tile_starts_full[tile_of_s])
    pos = jnp.where(tid_s < n_tiles, pos, T_padded)  # sentinel -> dummy row
    slots_flat = jnp.full(
        (tid_flat.shape[0],), T_padded, jnp.int32
    ).at[eidx_s].set(pos, unique_indices=True)
    # Reassemble per class into the cover-major (cover_pad, N) table:
    # entries were flattened j-major, so each class block reshapes
    # directly to (c_slots, c_cnt) with the class count on lanes — no
    # transpose anywhere. Columns are already in cover_rank order, which
    # is exactly the cover-descending order the prefix reduction wants.
    slot_cols = []
    culled_cols = []
    pos0 = 0
    for c_cnt, c_slots in classes:
        s_c = slots_flat[pos0 : pos0 + c_cnt * c_slots].reshape(c_slots, c_cnt)
        # Compact each column: move real entries (the Gaussian's slots
        # that survived the ellipse cull) to rows 0..culled-1, sentinels
        # below. The reduce gathers row-j prefixes sized by cover_caps;
        # with compaction the caps bound CULLED covers instead of bbox
        # covers, dropping the sentinel rows the cull created from the
        # gather entirely (the row gather is rate-bound per index, so a
        # sentinel costs as much as a real row). At most one summand is
        # nonzero per (r, column), so the where-sum is exact.
        real = s_c < T_padded
        kc = jnp.cumsum(real.astype(jnp.int32), axis=0)
        comp = [
            T_padded
            + jnp.sum(
                jnp.where(real & (kc == r + 1), s_c - T_padded, 0), axis=0
            )
            for r in range(c_slots)
        ]
        s_c = jnp.stack(comp, axis=0)
        culled_cols.append(kc[-1])
        if c_slots < cover_pad:
            s_c = jnp.concatenate(
                [
                    s_c,
                    jnp.full((cover_pad - c_slots, c_cnt), T_padded, jnp.int32),
                ],
                axis=0,
            )
        slot_cols.append(s_c[:cover_pad])
        pos0 += c_cnt * c_slots
    slots = (
        jnp.concatenate(slot_cols, axis=1) if len(slot_cols) > 1 else slot_cols[0]
    )
    slot_order = order[cover_rank]  # column i of the cover-major
    #                                 (cover_pad, N) table -> original Gaussian

    slot_pos = None
    culled_arr = None
    if scatter:
        # Inverse of the reduce's slot-table gather: striped-layout
        # destination per padded plan position, so the adjoint kernel
        # can WRITE contribution rows straight into slot order
        # (reduce_engine="scatter"). Striped row of slot-table entry
        # (cover row j, column c) = cumsum of 128-padded caps up to j,
        # plus c; sentinel entries collide harmlessly on index T_padded
        # (sliced off before use). The audit guarantees real entries sit
        # below their cap (cap_over == 0), so every real write is in
        # range.
        n_pad_sc = cdiv(max(n, 1), BLOCK) * BLOCK
        caps_l = [
            min(max(int(cover_caps[j]), 1), n)
            if j < len(cover_caps) else n
            for j in range(cover_pad)
        ]
        caps_pad = [
            min(cdiv(c, BLOCK) * BLOCK, n_pad_sc) for c in caps_l
        ]
        base = np.concatenate([[0], np.cumsum(caps_pad)]).astype(np.int32)
        r_striped = int(base[-1])
        idx_parts, val_parts = [], []
        col_off = 0
        for ci, (c_cnt, c_slots) in enumerate(classes):
            s_c = slot_cols[ci][: min(c_slots, cover_pad)]
            rows_here = s_c.shape[0]
            spos = (
                jnp.asarray(base[:rows_here], jnp.int32)[:, None]
                + (col_off + jnp.arange(c_cnt, dtype=jnp.int32))[None, :]
            )
            valid_c = s_c < T_padded
            idx_parts.append(jnp.where(valid_c, s_c, T_padded).reshape(-1))
            val_parts.append(
                jnp.where(valid_c, spos, r_striped).reshape(-1)
            )
            col_off += c_cnt
        idx_all = jnp.concatenate(idx_parts)
        val_all = jnp.concatenate(val_parts)
        slot_pos = (
            jnp.full((T_padded + 1,), r_striped, jnp.int32)
            .at[idx_all]
            .set(val_all)[:T_padded]
        )
        culled_arr = (
            jnp.concatenate(culled_cols)
            if len(culled_cols) > 1
            else culled_cols[0]
        ).astype(jnp.int32)

    # Gaussian id per padded slot (block-padding slots -> sentinel N).
    pos_sc = jnp.where(tid_s < n_tiles, pos, T_padded)
    padded_gid = (
        jnp.full((T_padded + 1,), n, jnp.int32)
        .at[pos_sc]
        .set(jnp.where(tid_s < n_tiles, gid_s, n), unique_indices=True)[
            :T_padded
        ]
    )
    plan = PallasPlan(
        order=order,
        padded_gid=padded_gid,
        slot_order=slot_order,
        slot_pos=slot_pos,
        culled=culled_arr,
        tile_starts=tile_starts_full[:-1],
        tile_ends=tile_starts_full[1:],
        padded_starts=padded_starts,
        slots=slots,
        width=width,
        height=height,
        tile_size=tile_size,
        K_pad=K_pad,
        T_padded=T_padded,
        cover_pad=cover_pad,
        cover_caps=tuple(cover_caps),
        classes=classes,
    )
    if not with_stats:
        return plan
    # On-device overflow accounting (3 scalars): whether this view's
    # requirements exceed the static buckets. Long training runs move
    # the scene between size re-estimates; without this the plan/kernels
    # truncate silently (ADVICE r1). `dropped` is an upper bound (it
    # ignores the sub-cutoff cull, which legitimately removes entries).
    slots_cap = jnp.zeros((n,), jnp.int32)
    off = 0
    for c_cnt, c_slots in classes:
        slot_ids = cover_rank[off : off + c_cnt]
        slots_cap = slots_cap.at[slot_ids].set(c_slots)
        off += c_cnt
    dropped = jnp.sum(jnp.maximum(cnt - slots_cap, 0))
    t_req = jnp.sum(padded_spans)
    # cover_caps[j] bounds the highest cover-rank column with a real
    # row-j entry. With column compaction, column p's real entries fill
    # rows 0..culled_p-1, so the exact per-view requirement is
    # req[j] = 1 + max{rank p : culled_p > j} (load-bearing for the
    # reduce's prefix gathers).
    cap_over = jnp.int32(0)
    if cover_caps:
        culled_all = (
            jnp.concatenate(culled_cols)
            if len(culled_cols) > 1
            else culled_cols[0]
        )  # (n,) culled covers, in cover_rank (column) order
        p1 = jnp.arange(n, dtype=jnp.int32) + 1
        k = min(len(cover_caps), max_cover)
        j_ar = jnp.arange(k, dtype=jnp.int32)
        req = jnp.max(
            jnp.where(culled_all[None, :] > j_ar[:, None], p1[None, :], 0),
            axis=1,
        )
        caps_arr = jnp.asarray(
            [min(int(c), n) for c in cover_caps[:k]], jnp.int32
        )
        cap_over = jnp.max(jnp.maximum(req - caps_arr, 0))
    stats = {
        "t_req": t_req,
        "dropped": dropped,
        "cap_overflow": cap_over,
    }
    return plan, stats


@functools.partial(
    jax.jit,
    static_argnames=("tile_size", "width", "height", "proj_config"),
)
def _probe_cover_scan_jit(
    means, quats, scales, opacities, viewmats, Ks,
    tile_size, width, height, proj_config,
):
    """max over views of the per-view worst tile-cover (one dispatch)."""
    from tpugs.raster.binning import tile_bbox

    ntx, nty = tile_grid(width, height, tile_size)

    def body(mx, vk):
        vm, K = vk
        proj = project(
            means, quats, scales, opacities, vm, K, width, height,
            proj_config,
        )
        tx0, ty0, tx1, ty1 = tile_bbox(
            proj.means2d, proj.radii, proj.valid, tile_size, ntx, nty
        )
        return jnp.maximum(mx, jnp.max((tx1 - tx0) * (ty1 - ty0))), None

    mx, _ = jax.lax.scan(body, jnp.int32(1), (viewmats, Ks))
    return mx


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_size", "width", "height", "max_cover", "proj_config",
    ),
)
def _probe_stats_scan_jit(
    means, quats, scales, opacities, viewmats, Ks,
    tile_size, width, height, max_cover, proj_config,
):
    """(max t_padded, per-column-maxed bbox-cover histogram, per-row
    maxed culled-cover cap requirement) over views, at a fixed global
    cover bucket (one dispatch, one compile).

    The third output sizes ``cover_caps`` for the COMPACTED slot table
    via ``_cap_req`` (the suffix-histogram tie bound — see its
    docstring); ``check_pallas_sizes`` audits against the identical
    quantity."""

    def body(carry, vk):
        t_max, h_max, r_max = carry
        vm, K = vk
        proj = project(
            means, quats, scales, opacities, vm, K, width, height,
            proj_config,
        )
        binning = build_tile_binning(proj, tile_size, width, height,
                                     max_cover)
        spans = binning.tile_starts[1:] - binning.tile_starts[:-1]
        t_pad = jnp.sum(cdiv_arr(spans, BLOCK)) * BLOCK
        hist = _cover_hist_jit(proj, tile_size, width, height, max_cover)
        req = _cap_req(proj, tile_size, width, height, max_cover)
        return (
            jnp.maximum(t_max, t_pad),
            jnp.maximum(h_max, hist),
            jnp.maximum(r_max, req),
        ), None

    carry0 = (
        jnp.int32(0),
        jnp.zeros((max_cover,), jnp.int32),
        jnp.zeros((max_cover,), jnp.int32),
    )
    (t_max, h_max, r_max), _ = jax.lax.scan(body, carry0, (viewmats, Ks))
    return t_max, h_max, r_max


class PallasSizes(NamedTuple):
    """Static shape buckets for a (scene, camera rig) pair. Measure once
    with ``estimate_pallas_sizes`` then build plans for every view with
    ZERO host syncs."""

    max_cover: int
    T_padded: int
    cover_pad: int
    # cover_caps[j]: static upper bound on #Gaussians covering > j tiles
    # (monotone nonincreasing). Lets the reduction gather only prefixes.
    cover_caps: tuple = ()
    # Size-classed expansion ((count, slots), ... descending slots):
    # the count highest-cover Gaussians get that many expansion slots.
    # Chosen by a small DP on the cover histogram (_choose_classes) so
    # the plan's sort/scatter volume tracks the real intersection count
    # instead of count*max_cover (~2-4x smaller: most Gaussians cover
    # <= 4 tiles). () disables classing (everyone gets max_cover).
    classes: tuple = ()


def estimate_pallas_sizes(
    means,
    quats,
    scales,
    opacities,
    viewmats,  # (C, 4, 4) — probes all (or a stride of) views
    Ks,
    width: int,
    height: int,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_size: int = 16,
    margin: float = 1.25,
    probe_stride: int = 1,
) -> PallasSizes:
    """Host-side, once per scene+rig: measure the worst-case cover and
    padded-intersection count over the probed views, add headroom, and
    bucket. All later per-view plan builds are then pure jit.

    Probing is TWO device dispatches total (a scanned cover pass, then a
    scanned stats pass at the global cover bucket) — the former per-view
    loop paid 4 dispatches/view through the remote transport AND
    recompiled `_plan_stats`/`_cover_hist_jit` for every distinct
    per-view bucket, which made training-loop re-estimates cost minutes."""
    vms = viewmats[::probe_stride]
    ks = Ks[::probe_stride]
    cover_req = max(1, int(_probe_cover_scan_jit(
        means, quats, scales, opacities, vms, ks,
        tile_size, width, height, proj_config,
    )))
    t_pad_dev, hist_dev, req_dev = _probe_stats_scan_jit(
        means, quats, scales, opacities, vms, ks,
        tile_size, width, height, bucket(cover_req), proj_config,
    )
    t_padded = max(BLOCK, int(t_pad_dev))
    # The histogram/requirement rows are maxed per column over views at
    # the full global bucket length — never truncated, so very-high-
    # cover Gaussians keep correctly sized caps (silent reduce drops
    # otherwise). `hist` (bbox covers) sizes the expansion classes;
    # `req` (culled covers, rank-domain) sizes the reduce caps for the
    # compacted slot table.
    hist = np.asarray(hist_dev)
    req = np.asarray(req_dev)
    cover = max(1, int(np.ceil(cover_req * margin)))
    max_cover = 8 * cdiv(cover, 8)
    t = int(np.ceil(t_padded * margin))
    T_padded = cdiv(t, BLOCK * 1024) * BLOCK * 1024  # 128K granularity
    n = means.shape[0]
    caps = []
    for j in range(max_cover):
        c_j = req[j] if j < len(req) else 0
        c_j = int(min(n, np.ceil(c_j * margin)))
        c_j = cdiv(max(c_j, 1), 1024) * 1024  # 1K granularity
        caps.append(min(c_j, n))
    # enforce monotone nonincreasing
    for j in range(1, max_cover):
        caps[j] = min(caps[j], caps[j - 1])
    classes = _choose_classes(hist, n, max_cover)
    return PallasSizes(
        max_cover=max_cover,
        T_padded=T_padded,
        cover_pad=max_cover,
        cover_caps=tuple(caps),
        classes=classes,
    )


def _choose_classes(hist, n, max_cover, max_classes=8):
    """Pick expansion size classes from the (view-maxed) cover
    histogram: levels l_1 < ... < l_m = max_cover such that the
    cover-rank prefix B(l) (the margin-padded count of Gaussians
    covering more than l tiles) gets l_{i+1} slots, minimizing total
    expansion entries sum_i (B(l_{i-1}) - B(l_i)) * l_i. Exact DP over
    levels (max_cover is small). Margins:
    2x for small classes, 1.35x for large ones, 1K rank granularity —
    the audit (check_pallas_sizes) flags any view that outgrows them."""
    hist = np.asarray(hist)
    if n <= 0 or max_cover <= 1:
        return ((max(n, 0), max(max_cover, 1)),)

    def _raw_b(l):  # rank boundary: Gaussians with cover > l land before it
        h = int(hist[l]) if l < len(hist) else 0
        m = 2.0 if h <= 32768 else 1.35
        return min(n, cdiv(max(int(np.ceil(h * m)), 1024), 1024) * 1024)

    # Nonincreasing in l (the margin switch at 32768 could invert it).
    b_arr = [0] * (max_cover + 1)
    for l in range(max_cover, -1, -1):
        b_arr[l] = _raw_b(l) if l < max_cover else 0
        if l < max_cover:
            b_arr[l] = max(b_arr[l], b_arr[l + 1])
    b_arr[0] = n  # every Gaussian (even cover 0) occupies a class slot row
    # b_arr[max_cover] = 0: the top class spans ranks [0, B(l_{m-1})) —
    # nothing above max_cover is representable, so no headroom applies.

    def B(l):
        return b_arr[l] if l <= max_cover else 0
    # g[l] = (entries, levels) to serve all Gaussians with cover > l
    # using class levels strictly greater than l.
    g = {max_cover: (0, ())}
    for j in range(max_cover - 1, -1, -1):
        best = None
        for l in range(j + 1, max_cover + 1):
            sub_cost, sub_levels = g[l]
            if len(sub_levels) + 1 > max_classes:
                continue
            cost = (B(j) - B(l)) * l + sub_cost
            # strict-improvement tie-break on level count: equal-B
            # boundaries create zero-cost zero-width classes that would
            # otherwise exhaust max_classes with useless levels
            if (
                best is None
                or cost < best[0]
                or (cost == best[0] and len(sub_levels) + 1 < len(best[1]))
            ):
                best = (cost, (l,) + sub_levels)
        g[j] = best
    levels = g[0][1]  # ascending
    classes = []
    upper = n  # B(l_0) with l_0 = 0: every Gaussian gets >= l_1 slots
    for l in levels:
        b = B(l)
        if upper > b:
            classes.append((upper - b, l))
        upper = b
    classes.reverse()  # descending slots, counts sum to n
    return tuple(classes)


@functools.partial(
    jax.jit, static_argnames=("tile_size", "width", "height", "sizes")
)
def _size_requirements_jit(proj: Projected, tile_size, width, height, sizes):
    """Per-view requirements vs the static ``PallasSizes`` buckets.

    Returns (kept_entries, dropped_entries): dropped_entries counts
    expansion slots the size-classed plan would silently truncate —
    covers beyond max_cover or beyond the Gaussian's rank class's slot
    count."""
    from tpugs.raster.binning import tile_bbox

    ntx, nty = tile_grid(width, height, tile_size)
    tx0, ty0, tx1, ty1 = tile_bbox(
        proj.means2d, proj.radii, proj.valid, tile_size, ntx, nty
    )
    cnt = (tx1 - tx0) * (ty1 - ty0)
    n = cnt.shape[0]
    classes = _normalize_classes(sizes.classes, n, sizes.max_cover)
    if len(classes) == 1:
        caps = jnp.full((n,), classes[0][1], jnp.int32)
    else:
        cover_rank = jnp.argsort(-cnt)
        rank_of = jnp.zeros((n,), jnp.int32).at[cover_rank].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        bounds = np.cumsum([c for c, _ in classes])  # class upper ranks
        slots_per_class = jnp.asarray(
            [s for _, s in classes], dtype=jnp.int32
        )
        cls_idx = jnp.searchsorted(
            jnp.asarray(bounds, dtype=jnp.int32), rank_of, side="right"
        )
        caps = slots_per_class[jnp.minimum(cls_idx, len(classes) - 1)]
    kept = jnp.minimum(cnt, caps)
    dropped = jnp.sum(cnt - kept)
    return jnp.sum(kept), dropped


def check_pallas_sizes(
    means,
    quats,
    scales,
    opacities,
    viewmats,
    Ks,
    width: int,
    height: int,
    sizes: "PallasSizes",
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_size: int = 16,
    stride: int = 1,
    raise_on_overflow: bool = True,
) -> dict:
    """Host-side overflow audit (ADVICE r1): verify the static
    ``PallasSizes`` buckets cover every (strided) view, instead of the
    kernels silently truncating splats. Returns per-view worst cases;
    raises (or warns) when a view exceeds the buckets."""
    import warnings

    from tpugs.raster.api import _project_jit

    worst = {
        "n_isects": 0, "t_padded": 0, "dropped": 0, "view": -1,
        "cap_overflow": 0,
    }
    n = means.shape[0]
    for c in range(0, viewmats.shape[0], max(1, stride)):
        proj = _project_jit(
            means, quats, scales, opacities,
            viewmats[c], Ks[c], width, height, proj_config,
        )
        kept, dropped = _size_requirements_jit(
            proj, tile_size, width, height, sizes
        )
        _, t_req, _ = _plan_stats(
            proj, tile_size, width, height, sizes.max_cover
        )
        kept, dropped, t_req = int(kept), int(dropped), int(t_req)
        if t_req > worst["t_padded"]:
            worst.update(t_padded=t_req, view=c)
        worst["n_isects"] = max(worst["n_isects"], kept)
        worst["dropped"] = max(worst["dropped"], dropped)
        # cover_caps are load-bearing for reduce_contribs: the
        # compacted-slot-table requirement req[j] (see ``_cap_req`` —
        # the SAME tie bound the estimator sizes caps from; the raw
        # bbox-cover histogram would spuriously flag views whose
        # ellipse cull opens a gap vs the 1.05 margin, ADVICE r4) must
        # stay within the static per-column cap or real contributions
        # get dropped.
        if sizes.cover_caps:
            req = np.asarray(
                _cap_req_jit(
                    proj, tile_size, width, height, sizes.max_cover
                )
            )
            for j, cap in enumerate(sizes.cover_caps):
                r_j = int(req[j]) if j < len(req) else 0
                worst["cap_overflow"] = max(
                    worst["cap_overflow"], r_j - min(int(cap), n)
                )
    overflow = (
        worst["t_padded"] > sizes.T_padded
        or worst["dropped"] > 0
        or worst["cap_overflow"] > 0
    )
    worst["overflow"] = overflow
    worst["T_padded_static"] = sizes.T_padded
    if overflow:
        msg = (
            f"PallasSizes overflow: view {worst['view']} needs "
            f"T_padded={worst['t_padded']} (static {sizes.T_padded}), "
            f"{worst['dropped']} expansion entries would be truncated. "
            f"Re-estimate sizes with a larger margin or probe_stride=1."
        )
        if raise_on_overflow:
            raise ValueError(msg)
        warnings.warn(msg)
    return worst


def build_plan_pure(
    means,
    quats,
    scales,
    opacities,
    viewmat,
    K,
    width: int,
    height: int,
    sizes: PallasSizes,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_size: int = 16,
    scatter: bool = False,
) -> PallasPlan:
    """Fully traceable per-view plan construction (fixed static sizes)."""
    proj = project(
        means, quats, scales, opacities, viewmat, K, width, height, proj_config
    )
    return _plan_build(
        proj,
        tile_size,
        width,
        height,
        sizes.max_cover,
        sizes.T_padded,  # K_pad retained for hash stability
        sizes.T_padded,
        sizes.cover_pad,
        sizes.cover_caps,
        sizes.classes,
        scatter=scatter,
    )


def build_pallas_plan(
    means,
    quats,
    scales,
    opacities,
    viewmat,
    K,
    width: int,
    height: int,
    proj_config: ProjectionConfig = ProjectionConfig(),
    tile_size: int = 16,
) -> PallasPlan:
    """Host-orchestrated plan construction with power-of-two bucketing
    (single-view convenience; production paths use
    estimate_pallas_sizes + build_plan_pure)."""
    from tpugs.raster.api import _cover_stats_jit, _project_jit

    proj = _project_jit(
        means, quats, scales, opacities, viewmat, K, width, height, proj_config
    )
    cover_req = int(_cover_stats_jit(proj, tile_size, width, height))
    max_cover = bucket(cover_req)
    n_isects, t_padded, _ = jax.tree_util.tree_map(
        int, _plan_stats(proj, tile_size, width, height, max_cover)
    )
    K_pad = bucket(max(n_isects, BLOCK))
    T_padded = bucket(max(int(t_padded), BLOCK))
    cover_pad = min(max_cover, 8 * cdiv(cover_req, 8) if cover_req > 0 else 8)
    cover_pad = max(cover_pad, 1)
    return _plan_build(
        proj,
        tile_size,
        width,
        height,
        max_cover,
        K_pad,
        T_padded,
        cover_pad,
    )


# -------------------------------------------------------- param packing


GEOM_ROWS = 8  # rows 0-7 of the packed table: geometry
PACK_ROWS = 16  # + rows 8-15: colors [c0, c1, c2, depth, 0...]


def pack_isect_all(
    proj: Projected, colors3: Optional[jax.Array], plan: PallasPlan
):
    """Pre-gather per-intersection params, transposed: (16, T_padded)
    with rows [mx, my, conic_a, conic_b, conic_c, opacity, depth, 0 |
    c0, c1, c2, depth, 0, 0, 0, 0].

    One merged gather: the TPU row gather is row-rate-bound (~75 M
    rows/s measured for narrow rows), so gathering 64-B rows costs the
    same as 32-B rows — merging geometry+colors halves pack time vs the
    round-1 two-gather layout and lets the kernels run a single DMA
    queue. The padded layout means every block DMA offset is a multiple
    of BLOCK (Mosaic requires lane-tile alignment for HBM slices) and
    always in bounds."""
    order = plan.order
    opac = jnp.where(proj.valid, proj.opacities, 0.0)
    zeros = jnp.zeros_like(opac)
    if colors3 is None:
        c0 = c1 = c2 = zeros
    else:
        c0, c1, c2 = colors3[:, 0], colors3[:, 1], colors3[:, 2]
    packed = jnp.stack(
        [
            proj.means2d[:, 0],
            proj.means2d[:, 1],
            proj.conics[:, 0],
            proj.conics[:, 1],
            proj.conics[:, 2],
            opac,
            proj.depths,
            zeros,
            c0,
            c1,
            c2,
            proj.depths,
            zeros,
            zeros,
            zeros,
            zeros,
        ],
        axis=1,
    )  # (N, 16) in ORIGINAL order
    n = packed.shape[0]
    # Permute to depth-sorted order FIRST (an N-row gather), then gather
    # slots by padded_gid directly. Composing the permutation into the
    # slot indices instead (order_ext[padded_gid]) looks cheaper but is
    # a T-row int gather, and the TPU row gather is row-RATE-bound
    # (~34-63 M rows/s regardless of row bytes, see BASELINE round 4):
    # at garden scale T ~ 4x N, so the composition costs ~4x the permute
    # it saves (measured: the round-4 composition regressed the plan
    # bucket ~20 ms/view).
    packed = packed[order]
    dummy = jnp.zeros((1, PACK_ROWS), packed.dtype)
    packed = jnp.concatenate([packed, dummy], axis=0)  # (N+1, 16)
    return jnp.transpose(packed[plan.padded_gid])  # (16, T_padded)


# ------------------------------------------------------------- kernels


def _lane_prefix_prod(x):
    """Inclusive cumprod along the lane axis (axis=1, width 128) via 7
    doubling steps of roll+mask-multiply."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    p = x
    for k in (1, 2, 4, 8, 16, 32, 64):
        shifted = pltpu.roll(p, k, 1)
        shifted = jnp.where(lane < k, 1.0, shifted)
        p = p * shifted
    return p


def _shift_one(x):
    """Exclusive shift along lanes: out[:, i] = x[:, i-1], out[:, 0] = 1."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = pltpu.roll(x, 1, 1)
    return jnp.where(lane < 1, 1.0, s)


def _block_weights_full(geom, px_x, px_y, trans, lane_valid):
    """Blend weights for one block, plus the internals the training
    backward needs (exact mirror of naive.evaluate_alpha semantics).

    geom: (8, BLOCK) transposed params; px_x/px_y: (tspx, 1);
    trans: (tspx, 1) carry. Returns a dict with:
      w (tspx, BLOCK), new_trans (tspx, 1), alpha, texc,
      e (exp(-max(sigma,0))), grad_mask (VJP mask of the alpha
      clip chain: lane_valid & sigma>=0 & alpha_raw>=MIN & <MAX).
    """
    mx = geom[0:1, :]
    my = geom[1:2, :]
    ca = geom[2:3, :]
    cb = geom[3:4, :]
    cc = geom[4:5, :]
    op = geom[5:6, :]
    dx = px_x - mx  # (tspx, BLOCK)
    dy = px_y - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    e = jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha_raw = op * e
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    keep = (
        (sigma >= 0.0)
        & (jnp.where(sigma >= 0.0, alpha, 0.0) >= ALPHA_MIN)
        & lane_valid
    )
    alpha = jnp.where(keep, alpha, 0.0)
    om = 1.0 - alpha
    inclusive = _lane_prefix_prod(om)
    texc = _shift_one(inclusive)
    w = alpha * texc * trans
    new_trans = trans * inclusive[:, BLOCK - 1 :]
    # d(alpha)/d(alpha_raw) chain: the min() blocks gradient above
    # ALPHA_MAX; sigma<0 / sub-MIN / lane pads are zeroed by `keep`.
    # (The max(sigma, 0) inside exp additionally gates d/d_sigma with
    # sigma > 0 — applied by the caller, NOT here, because d/d_opacity
    # has no such gate.)
    grad_mask = keep & (alpha_raw < ALPHA_MAX)
    return dict(
        w=w, new_trans=new_trans, alpha=alpha, texc=texc, e=e,
        grad_mask=grad_mask, sigma=sigma, dx=dx, dy=dy,
    )


def _block_weights(geom, px_x, px_y, trans, lane_valid):
    """Blend weights for one block (forward-only view of
    :func:`_block_weights_full`)."""
    full = _block_weights_full(geom, px_x, px_y, trans, lane_valid)
    return full["w"], full["new_trans"]


def _block_weights_mxu(geom, px_x, px_y, trans, lane_valid):
    """Blend weights for one block with the lane prefix-product computed
    as a log-space triangular matmul on the MXU instead of the 7-step
    roll/select/mul VPU scan.

    The adjoint kernel is VPU-bound (the prefix scan is ~half its
    per-pair ops while the contribution matmul keeps the MXU mostly
    idle), so moving the scan to the MXU is nearly free wall-clock.
    Numerics: log(1-alpha) is summed by a bf16 matmul with f32
    accumulation. The absolute cumsum error is ~|cumsum|*2^-9; weights
    with |cumsum| large are exactly the ones whose transmittance (hence
    weight) has decayed exponentially, so the ABSOLUTE weight error
    stays ~2^-9 of the leading weights — within the production bf16
    path's existing ~0.4% budget. Exact f32 paths keep the VPU scan.

    This fast path also drops the exact path's keep-mask chain (the
    kernel is VPU-bound, so every per-pair op counts):
    - ``lane_valid`` is redundant: block-padding slots carry the pack's
      dummy row (opacity 0 -> alpha 0 -> log_om 0 -> w 0).
    - ``sigma >= 0`` guards invalid conics, but invalid Gaussians are
      packed with opacity 0; for valid (PSD) conics sigma < 0 only by
      f32 rounding at the mean, where alpha ~ op either way. The clamp
      in exp(-max(sigma, 0)) bounds the result.
    ``lane_valid`` stays in the signature for interface parity."""
    del lane_valid
    mx = geom[0:1, :]
    my = geom[1:2, :]
    ca = geom[2:3, :]
    cb = geom[3:4, :]
    cc = geom[4:5, :]
    op = geom[5:6, :]
    dx = px_x - mx
    dy = px_y - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    e = jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(op * e, ALPHA_MAX)
    # 1/255 compositing clip (gsplat parity; one compare+select)
    alpha = jnp.where(alpha >= ALPHA_MIN, alpha, 0.0)
    # log(1-alpha): masked lanes have alpha=0 -> log1=0 (no masking
    # needed); ALPHA_MAX caps alpha so om >= 1e-3 and the log is finite.
    # (plain log of the subtraction, not log1p: om >= 1e-3 keeps the
    # rounding of (1-alpha) at <= 2e-5 relative, and log is the safer
    # Mosaic lowering)
    log_om = jnp.log(1.0 - alpha)
    n_lanes = alpha.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_lanes), 1)
    tri_strict = (row < col).astype(jnp.bfloat16)  # exclusive prefix
    cs = jax.lax.dot_general(
        log_om.astype(jnp.bfloat16),
        tri_strict,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tspx, BLOCK) strict cumsum of log(1-alpha) along lanes
    texc = jnp.exp(cs)
    w = alpha * texc * trans
    # inclusive total = strict cumsum at the last lane + its own term
    total = cs[:, n_lanes - 1 :] + log_om[:, n_lanes - 1 :]
    new_trans = trans * jnp.exp(total)
    return w, new_trans


def _tile_pixels(t, ntx: int, ts: int, tspx: int):
    """Pixel-center coordinates of tile t as (tspx, 1) columns."""
    tx = (t % ntx).astype(jnp.float32)
    ty = (t // ntx).astype(jnp.float32)
    lp = jax.lax.broadcasted_iota(jnp.int32, (tspx, 1), 0)
    lx = (lp % ts).astype(jnp.float32)
    ly = (lp // ts).astype(jnp.float32)
    return tx * ts + lx + 0.5, ty * ts + ly + 0.5


def _make_render_kernel(ntx: int, ts: int, n_out: int, trans_eps: float,
                        t_padded: int, mxu_prefix: bool = False):
    tspx = ts * ts
    block_weights = _block_weights_mxu if mxu_prefix else _block_weights

    def kernel(
        starts_ref,
        ends_ref,
        pstarts_ref,
        packed_hbm,  # (16, T_padded) merged geometry+color rows
        img_ref,
        gbuf,
        gsem,
    ):
        t = pl.program_id(0)
        start = starts_ref[t]
        end = ends_ref[t]
        pstart = pl.multiple_of(pstarts_ref[t], BLOCK)
        nb = (end - start + BLOCK - 1) // BLOCK
        # Safety clamp: if the plan's static T_padded underestimated this
        # view (sizes measured on other views), truncate rather than DMA
        # out of bounds.
        nb = jnp.minimum(nb, (t_padded - pstart) // BLOCK)
        px_x, px_y = _tile_pixels(t, ntx, ts, tspx)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tspx, BLOCK), 1)

        def fetch(slot, b):
            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, BLOCK)],
                gbuf.at[slot],
                gsem.at[slot],
            ).start()

        @pl.when(nb > 0)
        def _():
            fetch(0, 0)

        def cond(carry):
            b, _, max_t = carry
            return jnp.logical_and(b < nb, max_t > trans_eps)

        def body(carry):
            b, img_trans, _ = carry
            img, trans = img_trans
            slot = jax.lax.rem(b, 2)
            # Prefetch next block into the other slot.
            @pl.when(b + 1 < nb)
            def _():
                fetch(1 - slot, b + 1)

            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, BLOCK)],
                gbuf.at[slot],
                gsem.at[slot],
            ).wait()

            remaining = end - start - b * BLOCK
            lane_valid = lane < remaining
            w, trans = block_weights(gbuf[slot], px_x, px_y, trans, lane_valid)
            # Per-channel accumulation: img[:, c] += sum_lanes w * col_c.
            # (n_out <= 4 small channel counts: lane reductions beat a
            # degenerate matmul and avoid transposing the color block.)
            chans = [
                jnp.sum(
                    w * gbuf[slot, GEOM_ROWS + c : GEOM_ROWS + c + 1, :],
                    axis=1,
                    keepdims=True,
                )
                for c in range(n_out)
            ]
            img = img + jnp.concatenate(chans, axis=1)
            return b + 1, (img, trans), jnp.max(trans)

        img0 = jnp.zeros((tspx, n_out), jnp.float32)
        trans0 = jnp.ones((tspx, 1), jnp.float32)
        b_stop, (img, trans), _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), (img0, trans0), jnp.float32(1.0))
        )
        # Early exit leaves one prefetched block in flight — drain it, or
        # its completion would desync the semaphores for the next tile.
        @pl.when(b_stop < nb)
        def _():
            slot = jax.lax.rem(b_stop, 2)
            pltpu.make_async_copy(
                packed_hbm.at[
                    :, pl.ds(pl.multiple_of(pstart + b_stop * BLOCK, BLOCK), BLOCK)
                ],
                gbuf.at[slot],
                gsem.at[slot],
            ).wait()

        img_ref[0, :, :n_out] = img
        img_ref[0, :, n_out:] = 1.0 - trans  # alpha channel

    return kernel


def render_pallas_raw(
    packed: jax.Array,  # (16, T_padded) from pack_isect_all
    plan: PallasPlan,
    n_out: int = 4,  # color channels actually used (rgb+depth)
    interpret: bool = False,
    trans_eps: float = TRANS_EPS,
    mxu_prefix: bool = False,
):
    """Per-tile images (n_tiles, tspx, n_out + 1 alpha).

    ``mxu_prefix``: log-space MXU transmittance prefix (production
    fused-backprojection path, ~0.2% pixel error; exact renders keep
    the default VPU scan).

    INVARIANT (ADVICE r4): ``packed`` MUST come from
    :func:`pack_isect_all` with this ``plan``. The kernels carry no
    validity mask of their own — they rely on the pack's guarantees:
    opacity is zeroed for invalid projections (so padding and culled
    lanes contribute alpha 0), slot-table padding entries point at the
    trailing all-zero dummy row, and non-finite sigmas are only
    harmless because a NaN fails the ``alpha >= ALPHA_MIN`` compare.
    A caller packing geometry differently reintroduces unmasked
    invalid/padding lanes with no guard."""
    ntx, nty = tile_grid(plan.width, plan.height, plan.tile_size)
    n_tiles = ntx * nty
    ts = plan.tile_size
    tspx = ts * ts

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tspx, n_out + 1), lambda t, *_: (t, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_ROWS, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_render_kernel(ntx, ts, n_out, trans_eps, plan.T_padded,
                            mxu_prefix),
        out_shape=jax.ShapeDtypeStruct((n_tiles, tspx, n_out + 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(plan.tile_starts, plan.tile_ends, plan.padded_starts, packed)
    return out


def tiles_to_image(tiles: jax.Array, width: int, height: int, tile_size: int):
    """(n_tiles, ts*ts, C) -> (H, W, C)."""
    ntx, nty = tile_grid(width, height, tile_size)
    ts = tile_size
    c = tiles.shape[-1]
    t = tiles.reshape(nty, ntx, ts, ts, c)
    t = jnp.transpose(t, (0, 2, 1, 3, 4))
    return t.reshape(nty * ts, ntx * ts, c)[:height, :width]


def _make_adjoint_kernel(
    ntx: int, ts: int, d_chunk: int, trans_eps: float, t_padded: int,
    out_dtype, width: int = 0, height: int = 0, feat_cols: int = 0,
    mxu_prefix: bool = False,
):
    """feat_cols > 0: the feature block carries only that many real
    channels; the kernel pads to d_chunk lanes and synthesizes the
    weight-denominator ones-channel at column ``feat_cols`` (aligned
    in-VMEM, instead of a whole-image HBM concat pass outside).

    mxu_prefix: compute the lane transmittance prefix with the log-space
    MXU matmul (:func:`_block_weights_mxu`) — the production bf16 path;
    exact f32 callers keep the VPU scan."""
    tspx = ts * ts
    block_weights = _block_weights_mxu if mxu_prefix else _block_weights

    def kernel(
        starts_ref,
        ends_ref,
        pstarts_ref,
        geom_hbm,  # (16, T_padded) merged pack (only rows 0-7 used)
        feat_ref,  # (1, tspx, d_chunk) VMEM (blocked per tile)
        contrib_hbm,  # (T_padded + BLOCK, d_chunk) ANY
        gbuf,
        obuf,
        gsem,
        osem,
    ):
        t = pl.program_id(0)
        start = starts_ref[t]
        end = ends_ref[t]
        pstart = pl.multiple_of(pstarts_ref[t], BLOCK)
        nb = (end - start + BLOCK - 1) // BLOCK
        nb = jnp.minimum(nb, (t_padded - pstart) // BLOCK)  # see render kernel
        px_x, px_y = _tile_pixels(t, ntx, ts, tspx)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tspx, BLOCK), 1)
        feats = feat_ref[0]  # (tspx, d_chunk) or (tspx, feat_cols)
        if feat_cols > 0:
            col = jax.lax.broadcasted_iota(jnp.int32, (tspx, d_chunk), 1)
            feats = jnp.where(
                col == feat_cols,
                jnp.ones((), feats.dtype),
                jnp.pad(feats, ((0, 0), (0, d_chunk - feat_cols))),
            )

        def fetch(slot, b):
            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            pltpu.make_async_copy(
                geom_hbm.at[:, pl.ds(off, BLOCK)],
                gbuf.at[slot],
                gsem.at[slot],
            ).start()

        @pl.when(nb > 0)
        def _():
            fetch(0, 0)

        def out_dma(slot, b):
            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            return pltpu.make_async_copy(
                obuf.at[slot],
                contrib_hbm.at[pl.ds(off, BLOCK), :],
                osem.at[slot],
            )

        def cond(carry):
            b, _, max_t = carry
            return jnp.logical_and(b < nb, max_t > trans_eps)

        def body(carry):
            b, trans, _ = carry
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < nb)
            def _():
                fetch(1 - slot, b + 1)

            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            pltpu.make_async_copy(
                geom_hbm.at[:, pl.ds(off, BLOCK)],
                gbuf.at[slot],
                gsem.at[slot],
            ).wait()

            remaining = end - start - b * BLOCK
            lane_valid = lane < remaining
            w, trans = block_weights(gbuf[slot], px_x, px_y, trans, lane_valid)
            if width > 0:
                # Zero the weights of pixels beyond the image crop so
                # the tiled (uncropped) feature layout needs no masking
                # pass: pad pixels contribute nothing to num or den,
                # exactly like the zero-padded image path.
                in_b = jnp.logical_and(px_x < width, px_y < height)
                w = jnp.where(in_b, w, 0.0)

            # contrib (BLOCK, d_chunk) = w^T @ feats (MXU). The driver
            # prepends a ones-channel to the features, so channel 0 of
            # the contribution IS the weight denominator Σ_p w(g,p) —
            # the reference's all-ones backward pass for free
            # (backproject.py:133-150).
            # On the bf16 production path, cast w to bf16 too: a mixed
            # f32 x bf16 dot upcasts and runs the MXU at the ~8x-slower
            # f32 rate, and this matmul is the kernel's flop core. The
            # f32 accumulate (preferred_element_type) keeps the extra
            # error within the path's existing ~0.4% budget; the exact
            # path (out_dtype=f32) keeps w in f32.
            w_mm = w.astype(feats.dtype) if feats.dtype == jnp.bfloat16 else w
            contrib = jax.lax.dot_general(
                w_mm,
                feats,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            # Wait for the previous flush on this slot before reuse.
            @pl.when(b >= 2)
            def _():
                out_dma(slot, b - 2).wait()

            obuf[slot] = contrib.astype(out_dtype)
            out_dma(slot, b).start()
            return b + 1, trans, jnp.max(trans)

        trans0 = jnp.ones((tspx, 1), jnp.float32)
        b_stop, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), trans0, jnp.float32(1.0))
        )

        # Early exit leaves one prefetched geometry block in flight —
        # drain it before the buffers are reused.
        @pl.when(b_stop < nb)
        def _():
            slot = jax.lax.rem(b_stop, 2)
            off = pl.multiple_of(pstart + b_stop * BLOCK, BLOCK)
            pltpu.make_async_copy(
                geom_hbm.at[:, pl.ds(off, BLOCK)], gbuf.at[slot], gsem.at[slot]
            ).wait()

        # Zero-fill blocks skipped by early exit so the padded layout
        # stays dense (their true weights are < trans_eps per pixel).
        def zcond(carry):
            return carry[0] < nb

        def zbody(carry):
            b, _ = carry
            slot = jax.lax.rem(b, 2)

            @pl.when(b >= 2)
            def _():
                out_dma(slot, b - 2).wait()

            obuf[slot] = jnp.zeros((BLOCK, d_chunk), out_dtype)
            out_dma(slot, b).start()
            return b + 1, 0

        jax.lax.while_loop(zcond, zbody, (b_stop, 0))

        # Drain outstanding flushes.
        @pl.when(nb >= 2)
        def _():
            out_dma(jax.lax.rem(nb - 2, 2), nb - 2).wait()

        @pl.when(nb >= 1)
        def _():
            out_dma(jax.lax.rem(nb - 1, 2), nb - 1).wait()

        # Tile 0 also zeroes the dummy block at T_padded so the slot
        # table's unused entries read exact zeros without any XLA-side
        # masking or buffer-wide copies.
        @pl.when(t == 0)
        def _():
            obuf[0] = jnp.zeros((BLOCK, d_chunk), out_dtype)
            dma = pltpu.make_async_copy(
                obuf.at[0],
                contrib_hbm.at[pl.ds(t_padded, BLOCK), :],
                osem.at[0],
            )
            dma.start()
            dma.wait()

    return kernel


def adjoint_pallas_raw(
    geom: jax.Array,  # (16, T_padded) merged pack (rows 0-7 used)
    feat_tiles: jax.Array,  # (n_tiles, tspx, d_chunk) — or (.., feat_cols)
    plan: PallasPlan,
    interpret: bool = False,
    trans_eps: float = TRANS_EPS,
    out_dtype=jnp.float32,
    d_chunk: Optional[int] = None,
    feat_cols: int = 0,
    mxu_prefix: Optional[bool] = None,  # default: on iff out_dtype is bf16
):
    """Per-intersection contribution rows (T_padded + BLOCK, d_chunk).
    Rows beyond T_padded are the dummy region that unused slot-table
    entries point to (masked out in reduce_contribs).

    With ``feat_cols > 0`` the input carries only the real feature
    channels and the kernel synthesizes the ones-channel at column
    ``feat_cols`` in VMEM (pass ``d_chunk`` explicitly then).

    INVARIANT (ADVICE r4): ``geom`` MUST come from
    :func:`pack_isect_all` with this ``plan`` — see
    :func:`render_pallas_raw` for the packing guarantees the kernels
    (especially ``_block_weights_mxu``) silently depend on."""
    ntx, nty = tile_grid(plan.width, plan.height, plan.tile_size)
    n_tiles = ntx * nty
    ts = plan.tile_size
    tspx = ts * ts
    d_in = feat_tiles.shape[-1]
    if d_chunk is None:
        d_chunk = d_in
    if mxu_prefix is None:
        mxu_prefix = out_dtype == jnp.bfloat16

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, tspx, d_in), lambda t, *_: (t, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_ROWS, BLOCK), jnp.float32),
            pltpu.VMEM((2, BLOCK, d_chunk), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    contribs = pl.pallas_call(
        _make_adjoint_kernel(
            ntx, ts, d_chunk, trans_eps, plan.T_padded, out_dtype,
            plan.width, plan.height, feat_cols, mxu_prefix,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (plan.T_padded + BLOCK, d_chunk), out_dtype
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(plan.tile_starts, plan.tile_ends, plan.padded_starts, geom, feat_tiles)
    return contribs


# -------------------------------------------- scatter-write adjoint+reduce
#
# The slot-table reduce's random-row GATHER is issue-rate-bound (~44 GB/s,
# 68.6 ms/view at garden scale — exp_reduce_tail) and locality-independent.
# Per-row DMA WRITES cost about the same issue time, but issued from inside
# the adjoint kernel they ride its existing DMA pipeline: exp_scatter_write
# measured 1.97M scattered 2-KB row writes at +15-27 ms over the contiguous
# write at matched compute, vs the +68.6 ms standalone gather they replace.
# So this variant has the adjoint write each contribution row DIRECTLY at
# its slot-table position (the plan's `slot_pos` inverse map), and the
# reduce becomes a sequential-read masked stripe sum — no gather at all.
# Rows are (8, 128) = 1024-lane units (the minimum Mosaic-legal scattered
# row), so d_chunk <= 1024 - 1 real channels.


DL_SCATTER = 1024  # lanes per striped row ((8, 128) tile)


def _striped_layout(cover_caps, cover_pad: int, n: int):
    """((base_row, cap_pad, cover_j), ...) for every cover row, plus the
    total striped rows. MUST match the slot_pos construction in
    :func:`_plan_build` (same 128-padding of the per-row caps)."""
    n_pad = cdiv(max(n, 1), BLOCK) * BLOCK
    meta = []
    base = 0
    for j in range(cover_pad):
        cap = cover_caps[j] if j < len(cover_caps) else n
        cap = min(max(int(cap), 1), n)
        cap = min(cdiv(cap, BLOCK) * BLOCK, n_pad)
        meta.append((base, cap, j))
        base += cap
    return tuple(meta), base


def _make_adjoint_scatter_kernel(
    ntx: int, ts: int, d_chunk: int, trans_eps: float, t_padded: int,
    out_dtype, width: int, height: int, feat_cols: int, mxu_prefix: bool,
):
    """The adjoint kernel with per-row scattered output: contribution
    rows land at their striped slot positions (pbuf, DMA'd from the
    plan's slot_pos per rank block) instead of plan order. Culled /
    padding entries target the trash row (never read by the masked
    stripe sum). Early-exited blocks still write zero rows — their
    striped positions ARE summed (they are real intersections whose
    contribution is below trans_eps)."""
    tspx = ts * ts
    block_weights = _block_weights_mxu if mxu_prefix else _block_weights

    def kernel(
        starts_ref,
        ends_ref,
        pstarts_ref,
        geom_hbm,  # (16, T_padded) merged pack
        pos_hbm,  # (T_padded,) i32 striped destination per plan row
        feat_ref,  # (1, tspx, d_in) VMEM (blocked per tile)
        striped_hbm,  # (R_striped + 1, 8, 128) ANY
        gbuf,
        obuf,  # (2, BLOCK, 8, 128) out_dtype
        pbuf,  # (2, BLOCK) i32 SMEM
        gsem,
        osem,
        psem,
    ):
        t = pl.program_id(0)
        start = starts_ref[t]
        end = ends_ref[t]
        pstart = pl.multiple_of(pstarts_ref[t], BLOCK)
        nb = (end - start + BLOCK - 1) // BLOCK
        nb = jnp.minimum(nb, (t_padded - pstart) // BLOCK)
        px_x, px_y = _tile_pixels(t, ntx, ts, tspx)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tspx, BLOCK), 1)
        feats = feat_ref[0]
        if feat_cols > 0:
            col = jax.lax.broadcasted_iota(jnp.int32, (tspx, d_chunk), 1)
            feats = jnp.where(
                col == feat_cols,
                jnp.ones((), feats.dtype),
                jnp.pad(feats, ((0, 0), (0, d_chunk - feat_cols))),
            )

        def fetch(slot, b):
            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            pltpu.make_async_copy(
                geom_hbm.at[:, pl.ds(off, BLOCK)], gbuf.at[slot],
                gsem.at[slot],
            ).start()

        # pos_hbm is lane-padded: block b's 128 destinations live at
        # [b*1024, b*1024+128) (1-D i32 slices need 1024-element
        # granularity on Mosaic). Single SMEM buffer, fetch-ahead chain:
        # each block WAITS the fetch its predecessor issued, uses the
        # scalars (DMA descriptors capture addresses at .start()), then
        # issues the next block's fetch (SMEM scratch cannot be sliced
        # per double-buffer slot: (2, N) SMEM slicing violates tiling).
        def fetch_pos(b):
            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            pltpu.make_async_copy(
                pos_hbm.at[
                    pl.ds(pl.multiple_of(off * 8, 8 * BLOCK), 8 * BLOCK)
                ],
                pbuf,
                psem,
            ).start()

        def wait_pos(b):
            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            pltpu.make_async_copy(
                pos_hbm.at[
                    pl.ds(pl.multiple_of(off * 8, 8 * BLOCK), 8 * BLOCK)
                ],
                pbuf,
                psem,
            ).wait()

        @pl.when(nb > 0)
        def _():
            fetch(0, 0)
            fetch_pos(0)

        def out_rows(slot):
            for r in range(BLOCK):
                pltpu.make_async_copy(
                    obuf.at[slot, r],
                    striped_hbm.at[pbuf[r]],
                    osem.at[slot],
                ).start()

        def wait_rows(slot):
            # 128 same-size decrements of this slot's DMA semaphore.
            for _r in range(BLOCK):
                pltpu.make_async_copy(
                    obuf.at[slot, 0], striped_hbm.at[0], osem.at[slot]
                ).wait()

        def cond(carry):
            b, _, max_t = carry
            return jnp.logical_and(b < nb, max_t > trans_eps)

        def body(carry):
            b, trans, _ = carry
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < nb)
            def _():
                fetch(1 - slot, b + 1)

            off = pl.multiple_of(pstart + b * BLOCK, BLOCK)
            pltpu.make_async_copy(
                geom_hbm.at[:, pl.ds(off, BLOCK)], gbuf.at[slot],
                gsem.at[slot],
            ).wait()

            remaining = end - start - b * BLOCK
            lane_valid = lane < remaining
            w, trans = block_weights(gbuf[slot], px_x, px_y, trans, lane_valid)
            if width > 0:
                in_b = jnp.logical_and(px_x < width, px_y < height)
                w = jnp.where(in_b, w, 0.0)

            w_mm = w.astype(feats.dtype) if feats.dtype == jnp.bfloat16 else w
            contrib = jax.lax.dot_general(
                w_mm,
                feats,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BLOCK, d_chunk)

            @pl.when(b >= 2)
            def _():
                wait_rows(slot)

            wait_pos(b)
            full = jnp.pad(contrib, ((0, 0), (0, DL_SCATTER - d_chunk)))
            obuf[slot] = full.astype(out_dtype).reshape(BLOCK, 8, 128)
            out_rows(slot)

            @pl.when(b + 1 < nb)
            def _():
                fetch_pos(b + 1)

            return b + 1, trans, jnp.max(trans)

        trans0 = jnp.ones((tspx, 1), jnp.float32)
        b_stop, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), trans0, jnp.float32(1.0))
        )

        # Early exit leaves one geometry prefetch in flight — drain it
        # (its paired pos fetch is CONSUMED by the zero-fill loop below).
        @pl.when(b_stop < nb)
        def _():
            slot = jax.lax.rem(b_stop, 2)
            off = pl.multiple_of(pstart + b_stop * BLOCK, BLOCK)
            pltpu.make_async_copy(
                geom_hbm.at[:, pl.ds(off, BLOCK)], gbuf.at[slot],
                gsem.at[slot],
            ).wait()

        def zcond(carry):
            return carry[0] < nb

        def zbody(carry):
            b, _ = carry
            slot = jax.lax.rem(b, 2)

            @pl.when(b >= 2)
            def _():
                wait_rows(slot)

            wait_pos(b)
            obuf[slot] = jnp.zeros((BLOCK, 8, 128), out_dtype)
            out_rows(slot)

            @pl.when(b + 1 < nb)
            def _():
                fetch_pos(b + 1)

            return b + 1, 0

        jax.lax.while_loop(zcond, zbody, (b_stop, 0))

        @pl.when(nb >= 2)
        def _():
            wait_rows(jax.lax.rem(nb - 2, 2))

        @pl.when(nb >= 1)
        def _():
            wait_rows(jax.lax.rem(nb - 1, 2))

    return kernel


def adjoint_scatter_pallas_raw(
    geom: jax.Array,  # (16, T_padded) merged pack (rows 0-7 used)
    feat_tiles: jax.Array,  # (n_tiles, tspx, d_chunk) or (.., feat_cols)
    plan: PallasPlan,
    interpret: bool = False,
    trans_eps: float = TRANS_EPS,
    out_dtype=jnp.bfloat16,
    d_chunk: Optional[int] = None,
    feat_cols: int = 0,
    mxu_prefix: Optional[bool] = None,
) -> jax.Array:
    """Adjoint with slot-ordered scattered output: returns the striped
    buffer (R_striped + 1, 8, 128) for :func:`reduce_striped_pallas`
    (last row is the trash row for culled/padding entries). Same packing
    INVARIANT as :func:`adjoint_pallas_raw`. Requires a plan built with
    ``scatter=True``."""
    assert plan.slot_pos is not None, "plan needs scatter=True"
    ntx, nty = tile_grid(plan.width, plan.height, plan.tile_size)
    n_tiles = ntx * nty
    ts = plan.tile_size
    tspx = ts * ts
    d_in = feat_tiles.shape[-1]
    if d_chunk is None:
        d_chunk = d_in
    assert d_chunk <= DL_SCATTER
    if mxu_prefix is None:
        mxu_prefix = out_dtype == jnp.bfloat16
    n = plan.slots.shape[1]
    _, r_striped = _striped_layout(plan.cover_caps, plan.cover_pad, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, tspx, d_in), lambda t, *_: (t, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_ROWS, BLOCK), jnp.float32),
            pltpu.VMEM((2, BLOCK, 8, 128), out_dtype),
            pltpu.SMEM((8 * BLOCK,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # Lane-pad the destination table: block b's 128 positions at
    # [b*1024, b*1024+128) so each per-block SMEM fetch is one legal
    # 1024-element i32 slice.
    pos_padded = jnp.pad(
        plan.slot_pos.reshape(-1, BLOCK),
        ((0, 0), (0, 8 * BLOCK - BLOCK)),
    ).reshape(-1)
    striped = pl.pallas_call(
        _make_adjoint_scatter_kernel(
            ntx, ts, d_chunk, trans_eps, plan.T_padded, out_dtype,
            plan.width, plan.height, feat_cols, mxu_prefix,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (r_striped + 1, 8, 128), out_dtype
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        plan.tile_starts, plan.tile_ends, plan.padded_starts,
        geom, pos_padded, feat_tiles,
    )
    return striped


def _make_masked_stripe_kernel(d_out: int, stripe_meta):
    """Sequential stripe sum over the scatter-written striped buffer.
    stripe_meta: ((base_row, cap_pad, cover_j), ...) with caps monotone
    nonincreasing, so a column block's live stripes form a prefix.
    Striped rows beyond a column's culled cover were never written —
    masked by `culled > j` (select, so HBM garbage incl. NaN is inert)."""
    S = len(stripe_meta)

    def kernel(striped_hbm, culled_ref, out_ref, buf, sem):
        col = pl.program_id(0) * BLOCK
        out_ref[:] = jnp.zeros((BLOCK, d_out), jnp.float32)
        cull = culled_ref[...]  # (BLOCK, 1) i32

        def dma(slot, s):
            return pltpu.make_async_copy(
                striped_hbm.at[pl.ds(stripe_meta[s][0] + col, BLOCK), :],
                buf.at[slot],
                sem.at[slot],
            )

        @pl.when(col < stripe_meta[0][1])
        def _():
            dma(0, 0).start()

        for s in range(S):
            slot = s % 2
            if s + 1 < S:

                @pl.when(col < stripe_meta[s + 1][1])
                def _(s=s, slot=slot):
                    dma(1 - slot, s + 1).start()

            @pl.when(col < stripe_meta[s][1])
            def _(s=s, slot=slot):
                dma(slot, s).wait()
                keep = cull > stripe_meta[s][2]
                x = buf[slot][:, :d_out].astype(jnp.float32)
                out_ref[:] += jnp.where(keep, x, 0.0)

    return kernel


def reduce_striped_pallas(
    striped: jax.Array,  # (R_striped + 1, 8, 128) from the scatter adjoint
    plan: PallasPlan,
    d_out: int,
    interpret: bool = False,
) -> jax.Array:
    """Per-Gaussian sums from the scatter-written striped buffer:
    NO gather — every striped byte is read once, sequentially, by the
    masked stripe-sum kernel. Returns (N, d_out) f32 in ORIGINAL
    Gaussian order (same contract as :func:`reduce_contribs_pallas`)."""
    assert plan.culled is not None, "plan needs scatter=True"
    n = plan.slots.shape[1]
    n_pad = cdiv(max(n, 1), BLOCK) * BLOCK
    stripe_meta, r_striped = _striped_layout(
        plan.cover_caps, plan.cover_pad, n
    )
    striped2 = striped.reshape(r_striped + 1, DL_SCATTER)
    culled = plan.culled
    if n_pad != n:
        culled = jnp.pad(culled, (0, n_pad - n))
    acc = pl.pallas_call(
        _make_masked_stripe_kernel(d_out, stripe_meta),
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, d_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK, DL_SCATTER), striped.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(striped2, culled[:, None])
    acc = acc[:n]
    inv = jnp.zeros((n,), jnp.int32).at[plan.slot_order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return acc[inv]


def reduce_contribs(
    contribs: jax.Array,  # (T_padded + BLOCK, D)
    plan: PallasPlan,
    unpermute: str = "gather",  # or "scatter" (A/B hook, see below)
) -> jax.Array:
    """Per-Gaussian sums via the slot-table gather (no scatter).
    Returns (N, D) in ORIGINAL Gaussian order.

    The slot table (cover-major, (cover_pad, N)) columns are sorted by
    descending cover count, so row j's real entries form a prefix; with
    static prefix caps (``cover_caps``) each cover row gathers only
    ~the real intersections instead of N rows of mostly dummies.

    Perf notes (measured, TPU v5e, garden scale): the row gather runs at
    ~46 GB/s for 1280-B rows and is the floor (~73 ms); everything else
    here is arranged so the gather happens ONCE over all columns and the
    per-Gaussian accumulation is a handful of reshape-sums / slice-adds
    over the gathered buffer — the previous per-column-group structure
    (24 gathers + f32 materialization + serialization tokens) cost 4x
    the gather itself."""
    slots = plan.slots  # (cover_pad, N), cover-major; cover-sorted cols
    cover, n = slots.shape
    D = contribs.shape[-1]
    cover_caps = plan.cover_caps

    def cap_of(j):
        cap = cover_caps[j] if j < len(cover_caps) else n
        return min(max(int(cap), 1), n)

    caps = [cap_of(j) for j in range(cover)]
    # Group adjacent columns with EQUAL caps — their gathered prefixes
    # stack into a (k, cap, D) block whose reduction over k is one
    # sum (far less accumulator read-modify-write traffic than one
    # slice-add per column) — while bounding each gather's transient
    # rows buffer to ~max_rows (the contrib buffer is several GB at
    # garden scale; an unbounded flat gather OOMs inside the grouped
    # multi-view dispatch).
    max_rows = 1_250_000
    groups = []  # (j0, j1, cap)
    j = 0
    while j < cover:
        j1 = j
        while (
            j1 + 1 < cover
            and caps[j1 + 1] == caps[j]
            and (j1 + 2 - j) * caps[j] <= max_rows
        ):
            j1 += 1
        groups.append((j, j1 + 1, caps[j]))
        j = j1 + 1

    acc = None
    for (j0, j1, cap) in groups:
        k = j1 - j0
        # Row slice of the cover-major table: contiguous, no transpose.
        flat = jax.lax.slice_in_dim(slots[j0:j1], 0, cap, axis=1).reshape(-1)
        if acc is not None:
            # Serialize group gathers on the running accumulator:
            # without this dependency XLA schedules them concurrently
            # and their transient rows buffers are live simultaneously
            # (OOM at garden scale). optimization_barrier ties the next
            # gather's indices to the previous group's accumulator in
            # the schedule without any fake arithmetic for XLA to fold.
            flat, acc = jax.lax.optimization_barrier((flat, acc))
        # Unused slots point at the dummy zero block the adjoint kernel
        # wrote at T_padded, so no masking is needed.
        block = contribs[flat]  # (k*cap, D) in contrib dtype (bf16)
        if k > 1:
            part = jnp.sum(
                block.reshape(k, cap, D), axis=0, dtype=jnp.float32
            )
        else:
            part = block.astype(jnp.float32)
        if acc is None:  # first group initializes (saves one full pass)
            acc = part if cap == n else jnp.pad(part, ((0, n - cap), (0, 0)))
        else:
            acc = acc.at[:cap, :].add(part)
    if unpermute == "scatter":
        # A/B alternative: unique-indices scatter instead of the inverse
        # gather. Scatters with unique_indices lower well on TPU (the
        # plan's two scatters beat a sort-back by 1.7x, BASELINE.md);
        # whether that holds for (N, D) rows is measured on chip by
        # scripts/profile_stages.py --reduce-unpermute.
        return jnp.zeros((n, D), acc.dtype).at[plan.slot_order].set(
            acc, unique_indices=True
        )
    inv = jnp.zeros((n,), jnp.int32).at[plan.slot_order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return acc[inv]


def _make_stripe_sum_kernel(d: int, stripe_offs):
    """stripe_offs: static ((base_row, cap_rows), ...) with caps
    monotone nonincreasing — for any column block, the valid stripes
    (cap > col) are a PREFIX of the list, so the double-buffer parity
    can be the static unroll index."""
    S = len(stripe_offs)

    def kernel(gathered_hbm, out_ref, buf, sem):
        col = pl.program_id(0) * BLOCK

        def dma(slot, s):
            return pltpu.make_async_copy(
                gathered_hbm.at[pl.ds(stripe_offs[s][0] + col, BLOCK), :],
                buf.at[slot],
                sem.at[slot],
            )

        out_ref[:] = jnp.zeros((BLOCK, d), jnp.float32)

        @pl.when(col < stripe_offs[0][1])
        def _():
            dma(0, 0).start()

        for s in range(S):
            slot = s % 2
            if s + 1 < S:

                @pl.when(col < stripe_offs[s + 1][1])
                def _(s=s, slot=slot):
                    dma(1 - slot, s + 1).start()

            @pl.when(col < stripe_offs[s][1])
            def _(s=s, slot=slot):
                dma(slot, s).wait()
                out_ref[:] += buf[slot].astype(jnp.float32)

    return kernel


def _reduce_groups(caps, cover: int, n: int):
    """Group adjacent cover rows with equal (128-padded) caps.
    Returns [(j0, j1, cap_pad), ...]."""
    caps_pad = [
        min(cdiv(min(max(int(c), 1), n), BLOCK) * BLOCK, cdiv(n, BLOCK) * BLOCK)
        for c in caps
    ]
    groups = []
    j = 0
    while j < cover:
        j1 = j
        while j1 + 1 < cover and caps_pad[j1 + 1] == caps_pad[j]:
            j1 += 1
        groups.append((j, j1 + 1, caps_pad[j]))
        j = j1 + 1
    return groups


def reduce_contribs_pallas(
    contribs: jax.Array,  # (T_padded + BLOCK, D)
    plan: PallasPlan,
    interpret: bool = False,
) -> jax.Array:
    """Per-Gaussian sums: XLA row-gather + a Pallas stripe-sum kernel.
    Returns (N, D) in ORIGINAL Gaussian order (same contract as
    :func:`reduce_contribs`).

    The row gather itself runs at the TPU's random-row DMA rate and is
    irreducible in this layout, but the XLA reduce then burns another
    ~60 ms re-reading the materialized rows through grouped slice-adds
    over an (N, D) f32 accumulator (with barriers between groups for
    memory). Here the gather materializes ALL cover prefixes at once
    (row j of a column lands at group_base + j*cap + column) and the
    kernel sums, per 128-column block, its ≤cover_pad stripes with
    aligned (128, D) double-buffered DMAs — each gathered byte is read
    once, each output row written once, no (N, D) read-modify-write.
    Per-row DMAs are NOT an option: Mosaic requires HBM slices at
    sublane/1024-element granularity, so scattered single rows can only
    move through a gather."""
    slots = plan.slots  # (cover_pad, N) cover-major; cover-sorted cols
    cover, n = slots.shape
    D = contribs.shape[-1]
    n_pad = cdiv(max(n, 1), BLOCK) * BLOCK
    if n_pad != n:
        slots = jnp.pad(
            slots, ((0, 0), (0, n_pad - n)), constant_values=plan.T_padded
        )
    n_blocks = n_pad // BLOCK
    cover_caps = plan.cover_caps

    def cap_of(j):
        cap = cover_caps[j] if j < len(cover_caps) else n
        return min(max(int(cap), 1), n)

    groups = _reduce_groups([cap_of(j) for j in range(cover)], cover, n_pad)

    # Gather index vector: per group, rows j0..j1 of the slot table,
    # each sliced to the padded cap (extra columns index the dummy zero
    # row at T_padded).
    idx_parts = []
    base = 0
    stripe_offs = []  # per group: list of (stripe base row, cap)
    for (j0, j1, cap) in groups:
        k = j1 - j0
        idx_parts.append(
            jax.lax.slice_in_dim(slots[j0:j1], 0, cap, axis=1).reshape(-1)
        )
        for j in range(k):
            stripe_offs.append((base + j * cap, cap))
        base += k * cap
    flat = jnp.concatenate(idx_parts) if len(idx_parts) > 1 else idx_parts[0]
    gathered = contribs[flat]  # (R, D) — THE random-row pass

    acc = pl.pallas_call(
        _make_stripe_sum_kernel(D, tuple(stripe_offs)),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK, D), contribs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(gathered)
    acc = acc[:n]
    inv = jnp.zeros((n,), jnp.int32).at[plan.slot_order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return acc[inv]


# ------------------------------------------------------- high-level API


def render_view_pallas(
    means,
    quats,
    scales,
    opacities,
    colors,  # (N, 3) direct colors or (N, K, 3) SH coeffs
    viewmat,
    K,
    plan: PallasPlan,
    sh_degree: Optional[int] = None,
    render_mode: str = "RGB",
    background: Optional[jax.Array] = None,
    proj_config: ProjectionConfig = ProjectionConfig(),
    interpret: bool = False,
    trans_eps: float = TRANS_EPS,
    packed: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fast fused render for one camera. Returns (image (H,W,C), alpha).
    Pass ``packed`` (from :func:`pack_isect_all`) to reuse a pack shared
    with the adjoint — the fused back-projection path does."""
    from tpugs.raster.api import _prepare_colors

    if packed is None:
        proj = project(
            means, quats, scales, opacities, viewmat, K,
            plan.width, plan.height, proj_config,
        )
        cols3 = _prepare_colors(means, colors, viewmat, sh_degree)
        packed = pack_isect_all(proj, cols3, plan)

    want_rgb = render_mode in ("RGB", "RGB+D", "RGB+ED")
    want_depth = render_mode in ("RGB+D", "RGB+ED", "D", "ED")
    n_out = 4  # rgb + depth always computed (cheap; sliced below)

    tiles = render_pallas_raw(packed, plan, n_out, interpret, trans_eps)
    img_full = tiles_to_image(tiles, plan.width, plan.height, plan.tile_size)
    rgb = img_full[..., :3]
    depth = img_full[..., 3:4]
    alpha = img_full[..., 4]

    chans = []
    if want_rgb:
        chans.append(rgb)
    if want_depth:
        if render_mode in ("RGB+ED", "ED"):
            depth = depth / jnp.maximum(alpha[..., None], 1e-10)
        chans.append(depth)
    image = jnp.concatenate(chans, axis=-1) if len(chans) > 1 else chans[0]
    if background is not None and want_rgb:
        image = image.at[..., :3].add(
            (1.0 - alpha[..., None]) * background[None, None, :]
        )
    return image, alpha


def backproject_view_pallas(
    means,
    quats,
    scales,
    opacities,
    feat_image: Optional[jax.Array],  # (H, W, D)
    viewmat,
    K,
    plan: PallasPlan,
    d_chunk: int = 128,
    proj_config: ProjectionConfig = ProjectionConfig(),
    interpret: bool = False,
    trans_eps: float = TRANS_EPS,
    contrib_dtype=jnp.float32,
    packed: Optional[jax.Array] = None,
    reduce_engine: str = "xla",  # "xla" | "pallas"
    feat_tiles: Optional[jax.Array] = None,  # (n_tiles, ts*ts, D)
) -> Tuple[jax.Array, jax.Array]:
    """Fused adjoint for one camera: (feat_sums (N, D), weight_sums (N,))
    in original Gaussian order. A ones-channel is prepended to the
    features, so the weight denominator falls out as channel 0 of the
    first chunk (the reference's all-ones backward pass, for free).
    Channels are processed in d_chunk passes so the per-intersection
    contribution buffer stays bounded; with ``d_chunk >= D+1`` the whole
    adjoint is a single pass (use ``contrib_dtype=bfloat16`` to halve
    the buffer — ~0.4% relative error on the lifted features).
    Pass ``packed`` to reuse the render pass's pack (fused path).

    Features come in either layout: ``feat_image`` (H, W, D), or
    ``feat_tiles`` (n_tiles, ts*ts, D) straight from a pixelwise encoder
    run on the render kernel's native tile layout — that skips BOTH
    image<->tile transpose passes; the adjoint kernel zeroes the weights
    of pixels beyond the image crop, so tile padding contributes
    nothing (exactly the zero-padded image semantics)."""
    from tpugs.raster.adjoint import image_to_tiles

    if (feat_image is None) == (feat_tiles is None):
        raise ValueError("pass exactly one of feat_image / feat_tiles")
    if packed is None:
        proj = project(
            means, quats, scales, opacities, viewmat, K,
            plan.width, plan.height, proj_config,
        )
        packed = pack_isect_all(proj, None, plan)
    geom = packed
    if feat_image is not None:
        H, W, D = feat_image.shape
        feats = feat_image.astype(contrib_dtype)
        lead = (H, W)
    else:
        n_tiles, tspx, D = feat_tiles.shape
        feats = feat_tiles.astype(contrib_dtype)
        lead = (n_tiles, tspx)
    # Work in the contribution dtype from the start so no full-size f32
    # intermediates (concat / tiles) are ever materialized.
    d_pad = cdiv(D + 1, d_chunk) * d_chunk

    if d_pad == d_chunk:
        # Single-chunk fast path: no [ones|feats|pad] HBM concat at all —
        # the adjoint kernel pads to d_chunk lanes in VMEM and puts the
        # ones-channel at column D (so the denominator is channel D,
        # not 0, of the contribution rows).
        chunk = feats if feat_tiles is not None else image_to_tiles(
            feats, plan.tile_size
        )
        if reduce_engine == "scatter":
            # Scatter-write adjoint: rows land in slot order, the reduce
            # is a gather-free masked stripe sum (plan needs scatter=True).
            striped = adjoint_scatter_pallas_raw(
                geom,
                chunk,
                plan,
                interpret=interpret,
                trans_eps=trans_eps,
                out_dtype=contrib_dtype,
                d_chunk=d_chunk,
                feat_cols=D,
            )
            red = reduce_striped_pallas(
                striped, plan, d_out=d_chunk, interpret=interpret
            )
            return red[:, :D], red[:, D]
        contribs = adjoint_pallas_raw(
            geom,
            chunk,
            plan,
            interpret=interpret,
            trans_eps=trans_eps,
            out_dtype=contrib_dtype,
            d_chunk=d_chunk,
            feat_cols=D,
        )
        if reduce_engine == "pallas":
            red = reduce_contribs_pallas(contribs, plan, interpret=interpret)
        else:
            if D + 1 < d_chunk:
                contribs = jax.lax.slice_in_dim(contribs, 0, D + 1, axis=1)
            red = reduce_contribs(contribs, plan)
        return red[:, :D], red[:, D]

    def chunk_feats(c0):
        """Channels [c0, c0+d_chunk) of [ones | feats | zero-pad],
        materialized per chunk to keep peak HBM bounded."""
        lo = c0 - 1  # index into feats of the first channel (ones at -1)
        hi = lo + d_chunk
        parts = []
        if lo < 0:
            parts.append(jnp.ones(lead + (1,), contrib_dtype))
            lo = 0
        take = min(hi, D) - lo
        if take > 0:
            parts.append(
                jax.lax.slice_in_dim(feats, lo, lo + take, axis=len(lead))
            )
        have = sum(p.shape[-1] for p in parts)
        if have < d_chunk:
            parts.append(jnp.zeros(lead + (d_chunk - have,), contrib_dtype))
        return jnp.concatenate(parts, axis=-1)

    feat_parts = []
    for c0 in range(0, d_pad, d_chunk):
        chunk = chunk_feats(c0)
        if feat_image is not None:
            chunk = image_to_tiles(chunk, plan.tile_size)
        contribs = adjoint_pallas_raw(
            geom,
            chunk,
            plan,
            interpret=interpret,
            trans_eps=trans_eps,
            out_dtype=contrib_dtype,
        )
        real = min(d_chunk, D + 1 - c0)
        if reduce_engine == "pallas":
            # The kernel's row DMAs are row-rate-bound, not byte-bound:
            # gather at full lane-padded width (no pre-slice pass) and
            # drop the zero pad columns on the (N, d_chunk) output.
            red = reduce_contribs_pallas(contribs, plan, interpret=interpret)
            if real < d_chunk:
                red = jax.lax.slice_in_dim(red, 0, real, axis=1)
        else:
            # Only the kernel needs the lane-aligned channel pad;
            # slicing the zero columns off before the reduce cuts the
            # slot-table gather's bytes by the pad fraction (~20% at
            # D=512, d_chunk 640: 513 real channels).
            if real < d_chunk:
                contribs = jax.lax.slice_in_dim(contribs, 0, real, axis=1)
            red = reduce_contribs(contribs, plan)
        feat_parts.append(red)
    all_sums = jnp.concatenate(feat_parts, axis=-1)
    weight_sums = all_sums[:, 0]
    feat_sums = all_sums[:, 1 : 1 + D]
    return feat_sums, weight_sums
