"""Pallas kernel correctness vs the pure-JAX tiled path (interpret mode
on CPU; the same kernels compile for real on TPU — exercised by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.raster.api import plan_render, rasterize_with_plan
from tpugs.raster.pallas_tiled import (
    backproject_view_pallas,
    build_pallas_plan,
    render_view_pallas,
)
from tpugs.lift.ops import accumulate_view
from tpugs.utils.synthetic import orbit_cameras, random_scene

W, H = 64, 48


def _setup(n=200, seed=0):
    scene = random_scene(n, seed=seed, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(2, W, H, radius=2.5)
    return scene, cams


def _args(scene):
    return scene.means, scene.quats, scene.scales, scene.opacities


def test_pallas_plan_slot_table():
    """Every real intersection appears exactly once in the slot table,
    at a position inside its tile's padded span."""
    scene, cams = _setup(n=100)
    plan = build_pallas_plan(*_args(scene), cams.viewmats[0], cams.Ks[0], W, H)
    slots = np.asarray(plan.slots)
    valid = slots < plan.T_padded
    real = slots[valid]
    assert len(real) == len(np.unique(real)), "slot collisions"
    ps = np.asarray(plan.padded_starts)
    starts = np.asarray(plan.tile_starts)
    ends = np.asarray(plan.tile_ends)
    n_real = int((ends - starts).sum())
    assert valid.sum() == n_real, "slot count != intersection count"


@pytest.mark.parametrize("cam_idx", [0, 1])
def test_pallas_render_matches_tiled(cam_idx):
    scene, cams = _setup()
    vm, K = cams.viewmats[cam_idx], cams.Ks[cam_idx]
    colors = jnp.abs(scene.sh0[:, 0, :])

    plan_ref = plan_render(*_args(scene), vm, K, W, H)
    img_ref, alpha_ref = rasterize_with_plan(
        *_args(scene), colors, vm, K, plan_ref
    )
    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    img, alpha = render_view_pallas(
        *_args(scene), colors, vm, K, plan, interpret=True
    )
    # early-exit threshold allows 1e-4-level differences
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(img_ref), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(alpha_ref), atol=3e-4
    )


def test_pallas_render_sh_and_depth():
    scene, cams = _setup(n=120)
    vm, K = cams.viewmats[0], cams.Ks[0]
    plan_ref = plan_render(*_args(scene), vm, K, W, H)
    img_ref, _ = rasterize_with_plan(
        *_args(scene), scene.colors_all, vm, K, plan_ref,
        sh_degree=3, render_mode="RGB+D",
    )
    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    img, _ = render_view_pallas(
        *_args(scene), scene.colors_all, vm, K, plan,
        sh_degree=3, render_mode="RGB+D", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref), atol=5e-4)


def test_pallas_adjoint_matches_jax():
    scene, cams = _setup(n=150)
    vm, K = cams.viewmats[0], cams.Ks[0]
    D = 20
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(H, W, D)).astype(np.float32))

    fs_ref, ws_ref = accumulate_view(scene, vm, K, W, H, feat_image=feats)

    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    fs, ws = backproject_view_pallas(
        *_args(scene), feats, vm, K, plan, d_chunk=16, interpret=True,
        trans_eps=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(ws), np.asarray(ws_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fs), np.asarray(fs_ref), atol=1e-4
    )


def test_pallas_adjoint_mxu_prefix_close_to_exact():
    """The production bf16 path now computes the lane transmittance
    prefix as a log-space MXU matmul (mxu_prefix). It must stay within
    the bf16 path's error budget of the exact f32/VPU-scan result."""
    from tpugs.raster.pallas_tiled import adjoint_pallas_raw, pack_isect_all
    from tpugs.raster.projection import project
    from tpugs.raster.adjoint import image_to_tiles

    scene, cams = _setup(n=150)
    vm, K = cams.viewmats[0], cams.Ks[0]
    D = 15
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.uniform(size=(H, W, D)).astype(np.float32))
    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    proj = project(*_args(scene), vm, K, W, H)
    packed = pack_isect_all(proj, None, plan)
    ones = jnp.ones((H, W, 1), jnp.float32)
    chunk = image_to_tiles(
        jnp.concatenate([ones, feats], -1), plan.tile_size
    )
    from tpugs.raster.pallas_tiled import reduce_contribs

    def run(dtype, mxu):
        c = adjoint_pallas_raw(
            packed, chunk.astype(dtype), plan, interpret=True,
            out_dtype=dtype, mxu_prefix=mxu,
        )
        # reduce to (N, D+1) per-gaussian sums — raw contribution rows
        # include bucket-padding rows the kernel never writes
        return np.asarray(reduce_contribs(c, plan), np.float32)

    e = run(jnp.float32, False)
    f = run(jnp.bfloat16, True)  # production path
    scale = np.abs(e).max()
    assert scale > 0
    assert np.abs(f - e).max() <= 6e-3 * scale
    # and the mxu prefix alone (f32 contribs, bf16 only inside the
    # prefix matmul) is much tighter
    m = run(jnp.float32, True)
    assert np.abs(m - e).max() <= 3e-3 * scale


def test_pallas_adjoint_channel_chunking_consistent():
    scene, cams = _setup(n=80)
    vm, K = cams.viewmats[0], cams.Ks[0]
    D = 24
    feats = jnp.asarray(
        np.random.default_rng(0).normal(size=(H, W, D)).astype(np.float32)
    )
    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    fs1, ws1 = backproject_view_pallas(
        *_args(scene), feats, vm, K, plan, d_chunk=8, interpret=True
    )
    fs2, ws2 = backproject_view_pallas(
        *_args(scene), feats, vm, K, plan, d_chunk=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(fs1), np.asarray(fs2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ws1), np.asarray(ws2), atol=1e-5)


def test_pallas_sizes_path_with_cover_caps():
    """estimate_sizes + build_plan_pure + prefix-capped reduction must
    match the host-bucketed plan path."""
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        estimate_sizes_pallas,
    )
    from tpugs.encoders.base import LinearRGBEncoder

    scene, cams = _setup(n=150)
    vm, K = cams.viewmats[0], cams.Ks[0]
    sizes = estimate_sizes_pallas(scene, cams, tile_size=16)
    assert len(sizes.cover_caps) == sizes.cover_pad
    assert all(
        sizes.cover_caps[j] >= sizes.cover_caps[j + 1]
        for j in range(len(sizes.cover_caps) - 1)
    )
    import jax.numpy as jnp2

    enc = LinearRGBEncoder(feature_dim=8)
    fs, ws = backproject_one_view_pallas(
        scene, vm, K, W, H, enc, sizes, d_chunk=16,
        interpret=True, trans_eps=0.0, tile_size=16,
        contrib_dtype=jnp2.float32,
    )
    # Oracle: pure-JAX render -> same encoder -> dense adjoint. Asserts
    # BOTH sides of the production path (feature sums were uncovered on
    # this test in round 1).
    from tpugs.raster.api import rasterize

    rgb_ref, _, _ = rasterize(
        scene.means, scene.quats, scene.scales, scene.opacities,
        scene.colors_all, vm[None], K[None], W, H,
        sh_degree=scene.sh_degree,
    )
    feats_ref = enc(rgb_ref[0])
    fs_ref, ws_ref = accumulate_view(
        scene, vm, K, W, H,
        feat_image=feats_ref,
    )
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ws_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fs_ref), atol=1e-3)



def test_pallas_bf16_contribs_close():
    """bfloat16 contribution rows (the production fast path) stay within
    ~0.5% relative error of the exact float32 path."""
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        estimate_sizes_pallas,
    )
    from tpugs.encoders.base import LinearRGBEncoder

    scene, cams = _setup(n=120)
    vm, K = cams.viewmats[0], cams.Ks[0]
    sizes = estimate_pallas = estimate_sizes_pallas(scene, cams, tile_size=16)
    enc = LinearRGBEncoder(feature_dim=8)
    kw = dict(d_chunk=16, interpret=True, trans_eps=0.0, tile_size=16)
    fs32, ws32 = backproject_one_view_pallas(
        scene, vm, K, W, H, enc, sizes, contrib_dtype=jnp.float32, **kw
    )
    fsbf, wsbf = backproject_one_view_pallas(
        scene, vm, K, W, H, enc, sizes, contrib_dtype=jnp.bfloat16, **kw
    )
    scale = float(jnp.abs(ws32).max())
    assert float(jnp.abs(wsbf - ws32).max()) < 0.005 * scale
    fscale = float(jnp.abs(fs32).max())
    assert float(jnp.abs(fsbf - fs32).max()) < 0.01 * fscale


def test_grouped_dispatch_matches_loop():
    """backproject_views_grouped (incl. the padded last group) must match
    per-view accumulation exactly."""
    from tpugs.encoders.base import LinearRGBEncoder
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        backproject_views_grouped,
        estimate_sizes_pallas,
    )

    scene, _ = _setup(n=100)
    cams = orbit_cameras(3, W, H, radius=2.5)  # 3 views, group=2 -> pad
    sizes = estimate_sizes_pallas(scene, cams, tile_size=16)
    enc = LinearRGBEncoder(feature_dim=8)
    kw = dict(interpret=True, tile_size=16, d_chunk=16,
              contrib_dtype=jnp.float32)
    num_g, den_g = backproject_views_grouped(
        scene, cams.viewmats, cams.Ks, W, H, enc, sizes, group_size=2, **kw
    )
    num = jnp.zeros_like(num_g)
    den = jnp.zeros_like(den_g)
    for c in range(3):
        fs, ws = backproject_one_view_pallas(
            scene, cams.viewmats[c], cams.Ks[c], W, H, enc, sizes, **kw
        )
        num, den = num + fs, den + ws
    np.testing.assert_allclose(np.asarray(den_g), np.asarray(den), atol=1e-4)
    np.testing.assert_allclose(np.asarray(num_g), np.asarray(num), atol=1e-4)


def test_split_encoder_grouped_matches_fused():
    """backproject_views_grouped_split (render / encode / adjoint in
    separate programs, the heavyweight-encoder path) must match the
    fused grouped dispatch — including the zero-weighted padded last
    group — within bf16-materialized-features tolerance."""
    from tpugs.encoders.base import LinearRGBEncoder
    from tpugs.lift.pallas_batch import (
        backproject_views_grouped,
        backproject_views_grouped_split,
        estimate_sizes_pallas,
    )

    scene, _ = _setup(n=100)
    cams = orbit_cameras(3, W, H, radius=2.5)  # 3 views, group=2 -> pad
    sizes = estimate_sizes_pallas(scene, cams, tile_size=16)
    enc = LinearRGBEncoder(feature_dim=8)
    kw = dict(interpret=True, tile_size=16, d_chunk=16,
              contrib_dtype=jnp.float32)
    num_f, den_f = backproject_views_grouped(
        scene, cams.viewmats, cams.Ks, W, H, enc, sizes, group_size=2, **kw
    )
    num_s, den_s = backproject_views_grouped_split(
        scene, cams.viewmats, cams.Ks, W, H, enc, sizes, group_size=2, **kw
    )
    # split materializes encoder outputs in bf16 (the production
    # adjoint consumes bf16 anyway); weights differ at that precision
    ws = float(jnp.abs(den_f).max())
    fs = float(jnp.abs(num_f).max())
    assert float(jnp.abs(den_s - den_f).max()) < 0.01 * ws
    assert float(jnp.abs(num_s - num_f).max()) < 0.01 * fs


def test_size_class_truncation_detected_and_safe():
    """Undersized static buckets (a tiny top class, 1-slot tail) make
    the size-classed expansion truncate high-cover Gaussians. The kernel
    path must stay safe (no crash, finite outputs), and the host-side
    audit (check_pallas_sizes, ADVICE r1) must flag the dropped entries
    instead of letting them vanish silently."""
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        estimate_sizes_pallas,
    )
    from tpugs.raster.pallas_tiled import PallasSizes, check_pallas_sizes
    from tpugs.encoders.base import LinearRGBEncoder

    # big splats: most Gaussians cover many tiles
    scene = random_scene(60, seed=3, extent=0.5, scale_range=(0.15, 0.3))
    cams = orbit_cameras(1, W, H, radius=2.0)
    vm, K = cams.viewmats[0], cams.Ks[0]
    good = estimate_sizes_pallas(scene, cams, tile_size=16)
    assert good.max_cover > 2, "test scene must produce multi-tile covers"
    bad = PallasSizes(
        max_cover=good.max_cover,
        T_padded=good.T_padded,
        cover_pad=good.cover_pad,
        cover_caps=good.cover_caps,
        # only 4 Gaussians keep full cover slots; everyone else is
        # truncated to ONE tile
        classes=((4, good.max_cover), (56, 1)),
    )
    worst = check_pallas_sizes(
        scene.means, scene.quats, scene.scales, scene.opacities,
        cams.viewmats, cams.Ks, W, H, bad, tile_size=16,
        raise_on_overflow=False,
    )
    assert worst["overflow"] and worst["dropped"] > 0
    with pytest.raises(ValueError, match="overflow"):
        check_pallas_sizes(
            scene.means, scene.quats, scene.scales, scene.opacities,
            cams.viewmats, cams.Ks, W, H, bad, tile_size=16,
        )
    # the kernels themselves must not crash on the truncated plan
    enc = LinearRGBEncoder(feature_dim=4)
    fs, ws = backproject_one_view_pallas(
        scene, vm, K, W, H, enc, bad, d_chunk=8,
        interpret=True, tile_size=16, contrib_dtype=jnp.float32,
    )
    assert np.isfinite(np.asarray(fs)).all()
    assert np.isfinite(np.asarray(ws)).all()
    # good sizes pass the audit
    ok = check_pallas_sizes(
        scene.means, scene.quats, scene.scales, scene.opacities,
        cams.viewmats, cams.Ks, W, H, good, tile_size=16,
    )
    assert not ok["overflow"]


def test_t_padded_clamp_no_crash():
    """A view needing more intersection entries than the static T_padded
    must be clamped by the kernel (pallas_tiled nb-clamp), not crash —
    and the audit must report it."""
    from tpugs.raster.pallas_tiled import (
        PallasSizes,
        build_plan_pure,
        check_pallas_sizes,
        pack_isect_all,
        render_pallas_raw,
        tiles_to_image,
    )
    from tpugs.raster.projection import project
    from tpugs.raster.api import _prepare_colors

    scene = random_scene(80, seed=4, extent=0.6, scale_range=(0.08, 0.2))
    cams = orbit_cameras(1, W, H, radius=2.0)
    vm, K = cams.viewmats[0], cams.Ks[0]
    from tpugs.lift.pallas_batch import estimate_sizes_pallas

    good = estimate_sizes_pallas(scene, cams, tile_size=16)
    small = PallasSizes(
        max_cover=good.max_cover,
        T_padded=512,  # below the ~1.5k entries this view needs
        cover_pad=good.cover_pad,
        cover_caps=good.cover_caps,
        classes=good.classes,
    )
    worst = check_pallas_sizes(
        scene.means, scene.quats, scene.scales, scene.opacities,
        cams.viewmats, cams.Ks, W, H, small, tile_size=16,
        raise_on_overflow=False,
    )
    assert worst["overflow"] and worst["t_padded"] > small.T_padded
    plan = build_plan_pure(
        scene.means, scene.quats, scene.scales, scene.opacities,
        vm, K, W, H, small, tile_size=16,
    )
    proj = project(
        scene.means, scene.quats, scene.scales, scene.opacities,
        vm, K, W, H,
    )
    cols3 = _prepare_colors(scene.means, scene.colors_all, vm, scene.sh_degree)
    packed = pack_isect_all(proj, cols3, plan)
    tiles = render_pallas_raw(packed, plan, 4, interpret=True)
    img = tiles_to_image(tiles, W, H, plan.tile_size)
    assert np.isfinite(np.asarray(img)).all()


def test_sort_by_tile_rank_paths_agree():
    """The packed uint32 single-key sort and the two-key fallback must
    produce the same ordering and tile boundaries (sentinel gid values
    differ by design and are masked by every consumer)."""
    from tpugs.raster.pallas_tiled import _sort_by_tile_rank

    rng = np.random.default_rng(3)
    n, n_tiles, E = 200, 12, 4096
    tid = rng.integers(0, n_tiles + 1, size=E).astype(np.int32)
    # depth ranks: unique per expansion entry set is NOT guaranteed in
    # general (one gaussian covers several tiles), so draw with repeats
    gid = rng.integers(0, n, size=E).astype(np.int32)
    gid[tid == n_tiles] = n  # sentinel entries carry sentinel rank
    eidx = np.arange(E, dtype=np.int32)
    outs = {}
    for path in ("packed", "twokey"):
        tid_s, gid_s, eidx_s, starts = _sort_by_tile_rank(
            jnp.asarray(tid), jnp.asarray(gid), jnp.asarray(eidx),
            n, n_tiles, force_path=path,
        )
        outs[path] = tuple(np.asarray(x) for x in (tid_s, gid_s, eidx_s, starts))
    a, b = outs["packed"], outs["twokey"]
    np.testing.assert_array_equal(a[0], b[0])  # tile order identical
    np.testing.assert_array_equal(a[3], b[3])  # tile starts identical
    valid = a[0] < n_tiles
    np.testing.assert_array_equal(a[1][valid], b[1][valid])  # ranks
    # eidx may legitimately differ where (tid, gid) ties (same gaussian
    # duplicated into the same tile cannot happen in the real plan, but
    # this synthetic draw allows it) — check the sort is a permutation
    # and keys match positionwise instead.
    np.testing.assert_array_equal(np.sort(a[2]), eidx)
    np.testing.assert_array_equal(np.sort(b[2]), eidx)
    np.testing.assert_array_equal(a[0], tid[a[2]])
    np.testing.assert_array_equal(
        np.where(valid, a[1], 0), np.where(valid, gid[a[2]], 0)
    )


def test_estimate_sizes_high_cover_histogram_not_truncated():
    """estimate_pallas_sizes must size cover caps correctly even when
    Gaussians cover more than 256 tiles (the histogram used to be
    truncated at 256 columns, fabricating zero counts and under-sized
    caps -> silent contribution drops in the reduce)."""
    from tpugs.lift.pallas_batch import estimate_sizes_pallas
    from tpugs.utils.synthetic import orbit_cameras, random_scene

    # 1400 big clustered splats, each covering hundreds of tiles at
    # 1296x840 with 16px tiles.
    scene = random_scene(1400, seed=0, extent=0.1,
                         scale_range=(0.30, 0.40), sh_degree=0)
    cams = orbit_cameras(1, 1296, 840, radius=2.5)
    sizes = estimate_sizes_pallas(scene, cams, probe_stride=1)
    assert sizes.max_cover > 256, (
        f"test scene too small: max_cover={sizes.max_cover}"
    )
    # Pre-fix, every cap column >= 256 fell to the 1024 floor even
    # though ~1400 Gaussians genuinely cover that many tiles.
    deep = [c for c in sizes.cover_caps[256:] if c > 1024]
    assert deep, f"caps beyond column 256 under-sized: "\
                 f"{sizes.cover_caps[256:260]}"


def test_subcutoff_tile_cull_exact_and_shrinks():
    """The sub-cutoff ellipse-vs-tile-rect cull (projection.sig_cut +
    binning.tile_cut_mask) must drop only provably-zero intersections:
    renders match a bbox-only binning to float reassociation noise,
    while low-opacity
    scenes bin strictly fewer intersections (reference keeps the full
    bbox because gsplat bakes it into the radix-sort key)."""
    from tpugs.raster.binning import build_tile_binning
    from tpugs.raster.projection import ProjectionConfig, project
    from tpugs.raster.tiled import TileConfig, render_tiled, required_blocks

    scene, cams = _setup(n=400, seed=7)
    # Mix in low opacities: the cutoff circle shrinks well inside the
    # 3-sigma bbox for those, so whole tiles drop out.
    lo = np.asarray(scene.logit_opacities).copy()
    lo[::3] -= 3.0
    lo[1::3] -= 1.5
    scene = scene.replace(logit_opacities=jnp.asarray(lo))
    vm, K = cams.viewmats[0], cams.Ks[0]
    proj = project(*_args(scene), vm, K, W, H, ProjectionConfig())
    colors = jnp.abs(scene.sh0[:, 0, :])

    imgs = {}
    isects = {}
    for tag, p in (
        ("cut", proj),
        # sig_cut = +inf keeps every bbox candidate (no cull)
        ("nocut", proj._replace(
            sig_cut=jnp.full_like(proj.sig_cut, 1e30))),
    ):
        b = build_tile_binning(p, 16, W, H, 64)
        od = b.order
        opac = jnp.where(p.valid, p.opacities, 0.0)
        img, alpha = render_tiled(
            p.means2d[od], p.conics[od], opac[od], colors[od],
            b.sorted_gid, b.tile_starts, W, H,
            required_blocks(b, TileConfig().block_size),
        )
        imgs[tag] = (np.asarray(img), np.asarray(alpha))
        isects[tag] = int(b.n_isects)

    assert isects["cut"] < isects["nocut"], isects
    # Dropped intersections have alpha < 1/255 at every pixel of their
    # tile, which the compositor zeroes anyway. Removing the zero
    # entries shifts block boundaries, so f32 products reassociate:
    # equal up to ~1 ulp, nothing above it.
    np.testing.assert_allclose(imgs["cut"][0], imgs["nocut"][0], atol=1e-6)
    np.testing.assert_allclose(imgs["cut"][1], imgs["nocut"][1], atol=1e-6)


def test_multiclass_plan_matches_single_class():
    """The DP-chosen multi-class expansion must produce the same
    back-projection as the single-class layout (it only removes
    guaranteed-sentinel expansion slots)."""
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        estimate_sizes_pallas,
    )
    from tpugs.encoders.base import LinearRGBEncoder

    scene = random_scene(300, seed=11, extent=0.7, scale_range=(0.03, 0.15))
    cams = orbit_cameras(2, W, H, radius=2.3)
    sizes = estimate_sizes_pallas(scene, cams, tile_size=16)
    # Small scenes collapse to one class (the 1K rank-granularity
    # floor), so build a safe 2-class split by hand: everyone with
    # cover > mid must rank inside the top class.
    from tpugs.raster.pallas_tiled import _cover_hist_jit
    from tpugs.raster.api import _project_jit
    from tpugs.raster.projection import ProjectionConfig

    mid = max(2, sizes.max_cover // 2)
    n_hi = 0
    for c in range(2):
        proj = _project_jit(
            scene.means, scene.quats, scene.scales, scene.opacities,
            cams.viewmats[c], cams.Ks[c], W, H, ProjectionConfig(),
        )
        h = np.asarray(
            _cover_hist_jit(proj, 16, W, H, sizes.max_cover)
        )
        n_hi = max(n_hi, int(h[mid]))
    n_hi = min(scene.num_gaussians, n_hi + 8)
    assert 0 < n_hi < scene.num_gaussians
    sizes = sizes._replace(
        classes=(
            (n_hi, sizes.max_cover),
            (scene.num_gaussians - n_hi, mid),
        )
    )
    single = sizes._replace(classes=())
    enc = LinearRGBEncoder(feature_dim=8)
    outs = {}
    for tag, sz in (("multi", sizes), ("single", single)):
        fs, ws = backproject_one_view_pallas(
            scene, cams.viewmats[0], cams.Ks[0], W, H, enc, sz,
            d_chunk=16, interpret=True, tile_size=16,
            contrib_dtype=jnp.float32,
        )
        outs[tag] = (np.asarray(fs), np.asarray(ws))
    np.testing.assert_allclose(
        outs["multi"][0], outs["single"][0], atol=1e-6
    )
    np.testing.assert_allclose(
        outs["multi"][1], outs["single"][1], atol=1e-6
    )


def test_choose_classes_properties():
    """_choose_classes: counts sum to n, slots strictly descending,
    top class serves max_cover, and every Gaussian with cover > l ranks
    inside a class with slots > l (the margin-padded boundary rule)."""
    from tpugs.raster.pallas_tiled import _choose_classes

    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 800_000))
        mc = int(rng.integers(2, 48))
        # random nonincreasing histogram
        h = np.sort(rng.integers(0, n + 1, size=mc))[::-1]
        cls = _choose_classes(h, n, mc)
        counts = [c for c, _ in cls]
        slots = [s for _, s in cls]
        assert sum(counts) == n, (trial, cls, n)
        assert all(c > 0 for c in counts)
        assert slots == sorted(slots, reverse=True)
        assert slots[0] == mc
        # boundary rule: for each level l = slots[i] of a lower class,
        # all Gaussians with cover > l (hist[l]) must rank before the
        # cumulative count of higher classes.
        cum = 0
        for i, (c, s) in enumerate(cls):
            if i > 0:
                l = s  # gaussians with cover > s need a higher class
                need = int(h[l]) if l < len(h) else 0
                assert cum >= need, (trial, cls, l, need, cum)
            cum += c


def test_reduce_contribs_pallas_matches_xla():
    """The fused stripe-sum reduce kernel (XLA row-gather + Pallas
    per-column-block accumulate) equals the grouped XLA reduce, on a
    multi-class sized plan, for both contrib dtypes."""
    from tpugs.lift.pallas_batch import estimate_sizes_pallas
    from tpugs.raster.adjoint import image_to_tiles
    from tpugs.raster.pallas_tiled import (
        adjoint_pallas_raw,
        build_plan_pure,
        pack_isect_all,
        reduce_contribs,
        reduce_contribs_pallas,
    )
    from tpugs.raster.projection import ProjectionConfig, project

    scene, cams = _setup(n=600, seed=3)
    pc = ProjectionConfig()
    sizes = estimate_sizes_pallas(scene, cams, tile_size=16)
    vm, K = cams.viewmats[0], cams.Ks[0]
    plan = build_plan_pure(*_args(scene), vm, K, W, H, sizes, pc, 16)
    proj = project(*_args(scene), vm, K, W, H, pc)
    packed = pack_isect_all(proj, None, plan)
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(H, W, 128)).astype(np.float32))
    ft = image_to_tiles(feats, 16)
    for dt in (jnp.float32, jnp.bfloat16):
        contribs = adjoint_pallas_raw(
            packed, ft.astype(dt), plan, interpret=True, out_dtype=dt
        )
        a = np.asarray(reduce_contribs(contribs, plan))
        b = np.asarray(reduce_contribs_pallas(contribs, plan, interpret=True))
        np.testing.assert_allclose(b, a, atol=2e-5)


def test_backproject_reduce_engine_pallas_matches():
    """backproject_view_pallas(reduce_engine='pallas') equals the XLA
    reduce path end to end (weight + feature sums)."""
    scene, cams = _setup(n=150)
    vm, K = cams.viewmats[0], cams.Ks[0]
    D = 20
    feats = jnp.asarray(
        np.random.default_rng(4).normal(size=(H, W, D)).astype(np.float32)
    )
    plan = build_pallas_plan(*_args(scene), vm, K, W, H)
    kw = dict(d_chunk=128, interpret=True, trans_eps=0.0)
    fs_x, ws_x = backproject_view_pallas(
        *_args(scene), feats, vm, K, plan, reduce_engine="xla", **kw
    )
    fs_p, ws_p = backproject_view_pallas(
        *_args(scene), feats, vm, K, plan, reduce_engine="pallas", **kw
    )
    np.testing.assert_allclose(np.asarray(fs_p), np.asarray(fs_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ws_p), np.asarray(ws_x), atol=1e-5)


def test_pixelwise_tile_path_matches_image_path():
    """backproject_one_view_pallas with a pixelwise encoder (tile-layout
    feature path, kernel-masked pad pixels) equals the same encoder
    forced down the image path."""
    from tpugs.encoders.base import LinearRGBEncoder
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        estimate_sizes_pallas,
    )

    class ImageOnly:
        """Same map, pixelwise flag off -> image path."""

        def __init__(self, inner):
            self._inner = inner
            self.feature_dim = inner.feature_dim

        def __call__(self, image):
            return self._inner(image)

    # W=64, H=48 with tile 32 -> bottom tile row is half out of crop:
    # exercises the pad-pixel masking.
    scene, cams = _setup(n=200)
    enc = LinearRGBEncoder(feature_dim=16, seed=1)
    assert enc.pixelwise
    sizes = estimate_sizes_pallas(scene, cams, tile_size=32)
    kw = dict(d_chunk=32, interpret=True, tile_size=32,
              contrib_dtype=jnp.float32)
    vm, K = cams.viewmats[0], cams.Ks[0]
    fs_t, ws_t = backproject_one_view_pallas(
        scene, vm, K, W, H, enc, sizes, **kw
    )
    fs_i, ws_i = backproject_one_view_pallas(
        scene, vm, K, W, H, ImageOnly(enc), sizes, **kw
    )
    np.testing.assert_allclose(np.asarray(ws_t), np.asarray(ws_i), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs_t), np.asarray(fs_i), atol=1e-5)


def test_backproject_reduce_engine_scatter_matches():
    """The scatter-write adjoint + gather-free masked stripe reduce
    (reduce_engine='scatter') must match the production slot-table
    gather reduce exactly: same kernels' weights, same f32 accumulation,
    only the row transport differs (per-row DMA writes in slot order vs
    gather after a plan-order write)."""
    from tpugs.encoders.base import LinearRGBEncoder
    from tpugs.lift.pallas_batch import (
        backproject_one_view_pallas,
        estimate_sizes_pallas,
    )

    scene = random_scene(400, seed=7, extent=0.8, scale_range=(0.02, 0.1))
    cams = orbit_cameras(2, 160, 96, radius=2.5)
    enc = LinearRGBEncoder(feature_dim=24)
    sizes = estimate_sizes_pallas(scene, cams, probe_stride=1, tile_size=32)
    kw = dict(d_chunk=640, interpret=True, tile_size=32)
    outs = {}
    for eng in ("pallas", "scatter"):
        outs[eng] = backproject_one_view_pallas(
            scene, cams.viewmats[0], cams.Ks[0], 160, 96, enc, sizes,
            reduce_engine=eng, **kw,
        )
    np.testing.assert_array_equal(
        np.asarray(outs["scatter"][0]), np.asarray(outs["pallas"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(outs["scatter"][1]), np.asarray(outs["pallas"][1])
    )
