"""Single-chip dispatch of the SHARDED programs (VERDICT r4 #7).

The multichip path is normally exercised on an 8-device virtual CPU
mesh in interpret mode (tests/test_dist.py, dryrun_multichip) — which
validates semantics but cannot catch collective-layout or Mosaic
lowering regressions that only appear on real hardware. This script
dispatches the production sharded programs on the REAL device with a
1x1 mesh and reports:

  * parity: sharded backprojection == unsharded grouped pipeline,
    sharded train step == the trainer's own jitted step (loss),
  * overhead: sharded-program time vs the unsharded program.

Run on TPU:  timeout 1800 python scripts/bench_sharded_singlechip.py
CPU check:   TPUGS_PLATFORM=cpu python scripts/bench_sharded_singlechip.py \
                 --num-gaussians 4096 --width 128 --height 96
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=2**17)
    ap.add_argument("--width", type=int, default=648)
    ap.add_argument("--height", type=int, default=420)
    ap.add_argument("--feature-dim", type=int, default=64)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-backproject", action="store_true")
    args = ap.parse_args()

    import jax

    if _os.environ.get("TPUGS_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp

    from tpugs.dist.mesh import make_mesh
    from tpugs.encoders.base import LinearRGBEncoder
    from tpugs.lift.pallas_batch import (
        backproject_views_grouped,
        estimate_sizes_pallas,
    )
    from tpugs.utils.synthetic import orbit_cameras, random_scene

    dev = jax.devices()[0]
    interpret = dev.platform == "cpu"
    print(f"device: {dev.platform} ({len(jax.devices())} visible)",
          flush=True)
    mesh = make_mesh((1, 1), ("cam", "gauss"), devices=jax.devices()[:1])

    W, H = args.width, args.height
    scene = random_scene(args.num_gaussians, seed=0, extent=1.0,
                         scale_range=(0.004, 0.02))
    cams = orbit_cameras(args.views, W, H, radius=3.0)
    enc = LinearRGBEncoder(feature_dim=args.feature_dim)

    def sync(x):
        return float(np.asarray(jax.device_get(x.ravel()[:1]))[0])

    def timed(fn, s):
        """Compile on the unperturbed scene, then time two dispatches on
        minutely perturbed scenes: the remote layer serves REPEATED
        (executable, inputs) pairs from a result cache, so re-timing
        identical inputs measures transport, not execution."""
        out = fn(s)  # compile
        sync(out[1] if isinstance(out, tuple) else out)
        best = None
        for rep in range(2):
            sp = s.replace(means=s.means + 1e-6 * (rep + 1))
            t0 = time.perf_counter()
            out = fn(sp)
            sync(out[1] if isinstance(out, tuple) else out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return out, best

    if not args.skip_backproject:
        from tpugs.dist.shard import backproject_views_sharded_pallas

        sizes = estimate_sizes_pallas(scene, cams, probe_stride=1)
        w = jnp.ones((args.views,), jnp.float32)

        def unsharded(s):
            return backproject_views_grouped(
                s, cams.viewmats, cams.Ks, W, H, enc, sizes,
                group_size=args.views, interpret=interpret,
            )

        def sharded(s):
            return backproject_views_sharded_pallas(
                s, cams.viewmats, cams.Ks, w, W, H, enc, sizes, mesh,
                interpret=interpret,
            )

        (num0, den0), t0s = timed(unsharded, scene)
        (num1, den1), t1s = timed(sharded, scene)
        err = float(
            jnp.max(jnp.abs(num1 - num0))
            / (jnp.max(jnp.abs(num0)) + 1e-30)
        )
        derr = float(jnp.max(jnp.abs(den1 - den0))
                     / (jnp.max(jnp.abs(den0)) + 1e-30))
        ok = err < 5e-3 and derr < 5e-3
        print(
            f"[backproject] unsharded {t0s*1e3:.1f} ms, sharded(1x1 mesh) "
            f"{t1s*1e3:.1f} ms ({t1s/t0s:.2f}x), rel err num {err:.2e} "
            f"den {derr:.2e} parity={'OK' if ok else 'FAIL'}",
            flush=True,
        )
        if not ok:
            raise SystemExit("sharded backprojection parity FAILED")

    if not args.skip_train:
        from tpugs.dist.shard import make_trainer_step_sharded
        from tpugs.encoders import get_encoder
        from tpugs.train.config import TrainConfig
        from tpugs.train.trainer import Trainer, init_scene_from_points

        rng = np.random.default_rng(0)
        n = args.num_gaussians
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        cfg = TrainConfig(
            max_steps=100, sh_degree=3, feature_dim=32,
            feature_out_dim=args.feature_dim, strategy="none",
            random_bkgd=False,
            raster_engine="tiled" if interpret else "pallas",
        )
        tr = Trainer(cfg, init_scene_from_points(pts, rgbs, cfg),
                     width=W, height=H, n_cameras=args.views)
        tr._estimate_sizes(np.asarray(cams.viewmats), np.asarray(cams.Ks))
        teacher = get_encoder(f"linear:{args.feature_dim}")
        B = 1
        images = jnp.asarray(
            rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
        )
        teachers = jnp.stack([teacher(images[i]) for i in range(B)])
        bkgds = jnp.zeros((B, 3), jnp.float32)
        cam_ids = jnp.arange(B, dtype=jnp.int32)
        step = make_trainer_step_sharded(tr, mesh, batch_size=B)

        def run_sharded():
            out = step(
                tr.scene, tr.opt_state, tr.module_state(),
                cams.viewmats[:B], cams.Ks[:B], images, teachers,
                bkgds, cam_ids,
            )
            return out

        out = run_sharded()
        loss_sh = sync(out[3])  # loss of the UNPERTURBED scene (parity)
        # timed reps on perturbed scenes (remote result cache, see
        # timed()); scene0 kept for the parity comparison
        scene0 = tr.scene
        t_sh = None
        for rep in range(2):
            tr.scene = scene0.replace(
                means=scene0.means + 1e-6 * (rep + 1)
            )
            t0 = time.perf_counter()
            out_p = run_sharded()
            sync(out_p[3])
            dt = time.perf_counter() - t0
            t_sh = dt if t_sh is None else min(t_sh, dt)
        tr.scene = scene0

        batch = {
            "image": np.asarray(images[0]),
            "viewmat": np.asarray(cams.viewmats[0]),
            "K": np.asarray(cams.Ks[0]),
            "image_id": 0,
        }
        tr2 = Trainer(cfg, init_scene_from_points(pts, rgbs, cfg),
                      width=W, height=H, n_cameras=args.views)
        tr2._sizes = tr._sizes
        stats = tr2.train_step(batch, teacher_feats=teachers[0])
        loss_un = float(stats["loss"])  # unperturbed (parity)
        # timed reps on perturbed scenes, SAME trainer (a fresh Trainer
        # re-jits its step; identical inputs hit the remote result cache)
        s0 = tr2.scene
        t_un = None
        for rep in range(2):
            tr2.scene = s0.replace(means=s0.means + 1e-6 * (rep + 1))
            t0 = time.perf_counter()
            stats_p = tr2.train_step(batch, teacher_feats=teachers[0])
            _ = float(stats_p["loss"])
            dt = time.perf_counter() - t0
            t_un = dt if t_un is None else min(t_un, dt)
        tr2.scene = s0
        rel = abs(loss_sh - loss_un) / (abs(loss_un) + 1e-30)
        ok = rel < 5e-3
        print(
            f"[train-step] unsharded loss {loss_un:.6f} ({t_un*1e3:.0f} ms),"
            f" sharded(1x1) loss {loss_sh:.6f} ({t_sh*1e3:.0f} ms, "
            f"{t_sh/max(t_un,1e-9):.2f}x), rel diff {rel:.2e} "
            f"parity={'OK' if ok else 'FAIL'}",
            flush=True,
        )
        if not ok:
            raise SystemExit("sharded train step parity FAILED")
    print("single-chip sharded dispatch: all OK", flush=True)


if __name__ == "__main__":
    main()
