"""Per-stage timing of the fused back-projection pipeline at garden scale.

Run on TPU:  timeout 900 python scripts/profile_stages.py
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.encoders.base import LinearRGBEncoder
from tpugs.lift.pallas_batch import (
    DEFAULT_TILE,
    backproject_one_view_pallas,
    estimate_sizes_pallas,
)
from tpugs.raster.pallas_tiled import (
    adjoint_pallas_raw,
    backproject_view_pallas,
    build_plan_pure,
    pack_isect_all,
    reduce_contribs,
    render_view_pallas,
)
from tpugs.raster.api import _prepare_colors
from tpugs.raster.projection import ProjectionConfig, project
from tpugs.raster.adjoint import image_to_tiles
from tpugs.utils.synthetic import orbit_cameras, random_scene
from tpugs.utils.timing import measure
from tpugs.utils.profiling import (
    StageTimer,
    adjoint_model,
    device_memory_stats,
    reduce_model,
    render_model,
    trace,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=2**19)
    ap.add_argument("--width", type=int, default=1296)
    ap.add_argument("--height", type=int, default=840)
    ap.add_argument("--feature-dim", type=int, default=512)
    ap.add_argument("--tile", type=int, default=DEFAULT_TILE)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--plan-breakdown", action="store_true",
                    help="also time the plan's internal stages "
                         "(expansion / sort / scatters)")
    ap.add_argument("--profile-dir", type=str, default="",
                    help="capture a jax.profiler trace here")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].platform}", flush=True)
    scene = random_scene(
        args.num_gaussians, seed=0, extent=1.0, scale_range=(0.004, 0.02)
    )
    cams = orbit_cameras(4, args.width, args.height, radius=3.0)
    encoder = LinearRGBEncoder(feature_dim=args.feature_dim)
    pc = ProjectionConfig()
    t0 = time.time()
    sizes = estimate_sizes_pallas(scene, cams, probe_stride=2, tile_size=args.tile)
    print(f"sizes: {sizes} (est took {time.time()-t0:.1f}s)", flush=True)

    vm, K = cams.viewmats[0], cams.Ks[0]
    W, H = args.width, args.height
    it = args.iters

    # plan
    def f_plan(eps, means):
        m = means + (eps * jnp.uint32(0)).astype(jnp.float32)
        return build_plan_pure(
            m, scene.quats, scene.scales, scene.opacities,
            vm, K, W, H, sizes, pc, args.tile,
        ).padded_gid

    measure(f_plan, scene.means, iters=it, name="plan", verbose=True)

    if args.plan_breakdown:
        # Time the plan's internal stages (expansion -> sort -> slots
        # scatter -> padded_gid scatter). NOTE: these are standalone
        # timings of stage-shaped workloads, NOT an in-situ
        # decomposition: XLA fuses/overlaps stages inside the full
        # program (scripts/ablate_full.py measures what a stage really
        # costs there; round 3: plan ~25 ms in-situ vs ~134 standalone).
        from tpugs.raster.binning import tile_bbox
        from tpugs.raster.pallas_tiled import (
            BLOCK,
            _normalize_classes,
            _sort_by_tile_rank,
            cdiv_arr,
        )

        ntx, nty = (W + args.tile - 1) // args.tile, (H + args.tile - 1) // args.tile
        n_tiles = ntx * nty
        n = scene.means.shape[0]

        mc = sizes.max_cover
        classes = _normalize_classes(sizes.classes, n, mc)

        @jax.jit
        def stage_expand(means):
            # mirrors _plan_build's cover-major (slots_per, count)
            # expansion (keep in sync with tpugs/raster/pallas_tiled.py)
            proj = project(means, scene.quats, scene.scales,
                           scene.opacities, vm, K, W, H, pc)
            depth_key = jnp.where(proj.valid, proj.depths, jnp.inf)
            order = jnp.argsort(depth_key)
            tab0 = jnp.concatenate(
                [proj.means2d, proj.conics, proj.sig_cut[:, None],
                 proj.radii[:, None],
                 jnp.where(proj.valid, 1.0, 0.0)[:, None]], axis=1,
            )[order]
            m2d = tab0[:, 0:2]
            radii = tab0[:, 6]
            valid = tab0[:, 7] > 0.5
            tx0, ty0, tx1, ty1 = tile_bbox(m2d, radii, valid, args.tile,
                                           ntx, nty)
            w = tx1 - tx0
            cnt = w * (ty1 - ty0)
            w_safe = jnp.maximum(w, 1)
            etab = jnp.concatenate(
                [tx0[:, None].astype(jnp.float32),
                 ty0[:, None].astype(jnp.float32),
                 w_safe[:, None].astype(jnp.float32),
                 cnt[:, None].astype(jnp.float32),
                 tab0[:, 0:6]], axis=1,
            )
            cover_rank = jnp.argsort(-cnt)

            def expand(rows, slots_per):
                r = etab[rows]
                r_tx0 = r[:, 0].astype(jnp.int32)[None, :]
                r_ty0 = r[:, 1].astype(jnp.int32)[None, :]
                r_w = r[:, 2].astype(jnp.int32)[None, :]
                r_cnt = r[:, 3].astype(jnp.int32)[None, :]
                jj = jnp.arange(slots_per, dtype=jnp.int32)[:, None]
                jx = jj % r_w
                jy = jj // r_w
                sv = jj < jnp.minimum(r_cnt, slots_per)
                ts = float(args.tile)
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

            tps, gps = [], []
            off = 0
            for c_cnt, c_slots in classes:
                t_c, g_c = expand(cover_rank[off : off + c_cnt], c_slots)
                tps.append(t_c)
                gps.append(g_c)
                off += c_cnt
            return jnp.concatenate(tps), jnp.concatenate(gps)

        def f_expand(eps, means):
            m = means + (eps * jnp.uint32(0)).astype(jnp.float32)
            return stage_expand(m)[0]

        measure(f_expand, scene.means, iters=it, name="plan/expand",
                verbose=True)
        tid_flat, gid_flat = stage_expand(scene.means)
        eidx = jnp.arange(tid_flat.shape[0], dtype=jnp.int32)
        print(f"plan/expand entries: {tid_flat.shape[0]}", flush=True)

        def f_sort(eps, tf, gf):
            t = tf + eps.astype(jnp.int32) * 0
            return _sort_by_tile_rank(t, gf, eidx, n, n_tiles)[0]

        measure(f_sort, tid_flat, gid_flat, iters=it, name="plan/sort",
                verbose=True)
        tid_s, gid_s, eidx_s, starts_full = jax.jit(
            lambda tf, gf: _sort_by_tile_rank(tf, gf, eidx, n, n_tiles)
        )(tid_flat, gid_flat)
        spans = starts_full[1:] - starts_full[:-1]
        padded_spans = cdiv_arr(spans, BLOCK) * BLOCK
        padded_starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(padded_spans)[:-1].astype(jnp.int32)]
        )
        T_pad = sizes.T_padded
        s_idx = jnp.arange(tid_s.shape[0], dtype=jnp.int32)
        tile_of_s = jnp.minimum(tid_s, n_tiles - 1)
        pos = padded_starts[tile_of_s] + (s_idx - starts_full[tile_of_s])
        pos = jnp.where(tid_s < n_tiles, pos, T_pad)

        def f_slot_scatter(eps, p, ei):
            pp = p + eps.astype(jnp.int32) * 0
            return jnp.full((tid_flat.shape[0],), T_pad, jnp.int32).at[
                ei].set(pp, unique_indices=True)

        measure(f_slot_scatter, pos, eidx_s, iters=it,
                name="plan/slots-scatter", verbose=True)

        def f_gid_scatter(eps, p, g):
            pp = p + eps.astype(jnp.int32) * 0
            return jnp.full((T_pad + 1,), n, jnp.int32).at[pp].set(
                jnp.where(tid_s < n_tiles, g, n), unique_indices=True
            )[:T_pad]

        measure(f_gid_scatter, pos, gid_s, iters=it,
                name="plan/gid-scatter", verbose=True)
        del tid_flat, gid_flat, tid_s, gid_s, eidx_s, pos

    plan = jax.jit(
        build_plan_pure,
        static_argnames=("width", "height", "sizes", "proj_config", "tile_size"),
    )(
        scene.means, scene.quats, scene.scales, scene.opacities,
        vm, K, width=W, height=H, sizes=sizes, proj_config=pc,
        tile_size=args.tile,
    )
    plan = jax.tree_util.tree_map(
        lambda x: jax.device_put(x) if hasattr(x, "shape") else x, plan
    )

    # pack
    def f_pack(eps, means):
        m = means + (eps * jnp.uint32(0)).astype(jnp.float32)
        proj = project(
            m, scene.quats, scene.scales, scene.opacities, vm, K, W, H, pc
        )
        cols3 = _prepare_colors(m, scene.colors_all, vm, scene.sh_degree)
        return pack_isect_all(proj, cols3, plan)

    measure(f_pack, scene.means, iters=it, name="pack(proj+geom)", verbose=True)

    # render
    def f_render(eps, means):
        m = means + (eps * jnp.uint32(0)).astype(jnp.float32)
        img, _ = render_view_pallas(
            m, scene.quats, scene.scales, scene.opacities, scene.colors_all,
            vm, K, plan, sh_degree=scene.sh_degree, render_mode="RGB",
            proj_config=pc,
        )
        return img

    t_render = measure(
        f_render, scene.means, iters=it, name="render(incl pack)",
        verbose=True,
    )

    # encoder
    rgb = jax.jit(
        lambda m: render_view_pallas(
            m, scene.quats, scene.scales, scene.opacities, scene.colors_all,
            vm, K, plan, sh_degree=scene.sh_degree, render_mode="RGB",
            proj_config=pc,
        )[0]
    )(scene.means)

    def f_enc(eps, img):
        x = img + (eps * jnp.uint32(0)).astype(jnp.float32)
        return encoder(x)

    measure(f_enc, rgb, iters=it, name="encoder", verbose=True)

    feats = jax.jit(encoder)(rgb)

    # adjoint kernel only (contrib write), D=640 bf16
    d_chunk = 640
    featp = jnp.concatenate(
        [jnp.ones((H, W, 1), jnp.bfloat16), feats.astype(jnp.bfloat16),
         jnp.zeros((H, W, d_chunk - 1 - args.feature_dim), jnp.bfloat16)],
        axis=-1,
    )
    proj0 = jax.jit(
        lambda m: project(
            m, scene.quats, scene.scales, scene.opacities, vm, K, W, H, pc
        )
    )(scene.means)
    geom0 = jax.jit(lambda p: pack_isect_all(p, None, plan))(proj0)
    ftiles = jax.jit(lambda fi: image_to_tiles(fi, plan.tile_size))(featp)

    def f_adj(eps, geom, ft):
        g = geom + (eps * jnp.uint32(0)).astype(jnp.float32)
        return adjoint_pallas_raw(g, ft, plan, out_dtype=jnp.bfloat16)

    t_adj = measure(
        f_adj, geom0, ftiles, iters=it, name="adjoint kernel", verbose=True
    )

    contribs = jax.jit(
        lambda g, ft: adjoint_pallas_raw(g, ft, plan, out_dtype=jnp.bfloat16)
    )(geom0, ftiles)
    n_contrib_rows = int(contribs.shape[0])

    # free held garden-scale buffers before the reduce measurement
    del ftiles, featp, rgb, feats, geom0, proj0

    # reduce only
    def f_red(eps, c):
        cc = c + (eps * jnp.uint32(0)).astype(jnp.bfloat16)
        return reduce_contribs(cc, plan)

    t_red = measure(f_red, contribs, iters=it, name="reduce", verbose=True)

    # A/B: unique-indices scatter instead of the inverse-permutation
    # gather for the final (N, D) unpermute inside the reduce.
    def f_red_scatter(eps, c):
        cc = c + (eps * jnp.uint32(0)).astype(jnp.bfloat16)
        return reduce_contribs(cc, plan, unpermute="scatter")

    measure(f_red_scatter, contribs, iters=it,
            name="reduce(unpermute=scatter)", verbose=True)
    del contribs

    # full fused single view
    def f_full(eps, means):
        m = means + (eps * jnp.uint32(0)).astype(jnp.float32)
        sc = scene.replace(means=m)
        return backproject_one_view_pallas(
            sc, vm, K, W, H, encoder, sizes, tile_size=args.tile
        )[1]

    with trace(args.profile_dir):
        t_full = measure(
            f_full, scene.means, iters=it, name="FULL view", verbose=True
        )

    # Roofline: analytic FLOPs/bytes per stage vs v5e peaks (SURVEY §5
    # "per-kernel roofline counters").
    n_isect = int(plan.padded_gid.shape[0])
    n_pix = W * H
    d = args.feature_dim
    rt = StageTimer(dtype="bf16")
    rt.add("render(incl pack)", t_render, **render_model(n_isect, n_pix, 3))
    rt.add("adjoint kernel", t_adj, **adjoint_model(n_isect, d + 1))
    rt.add("reduce", t_red, **reduce_model(n_contrib_rows, d + 1))
    rt.add("FULL view", t_full,
           flops=(render_model(n_isect, n_pix, 3)["flops"]
                  + adjoint_model(n_isect, d + 1)["flops"]
                  + reduce_model(n_contrib_rows, d + 1)["flops"]),
           hbm_bytes=(render_model(n_isect, n_pix, 3)["hbm_bytes"]
                      + adjoint_model(n_isect, d + 1)["hbm_bytes"]
                      + reduce_model(n_contrib_rows, d + 1)["hbm_bytes"]))
    print()
    print(rt.report(), flush=True)
    mem = device_memory_stats()
    if mem:
        print(f"device memory: {mem}", flush=True)


if __name__ == "__main__":
    main()
