"""Train-step rate: fused Pallas engine vs pure-JAX tiled engine.

The reference trains garden at data_factor 4 (~1296x840) with 128-d
latent features distilled against a 512-d teacher
(``/root/reference/f3dgs/simple_trainer_feature_3dgs.py:57-78``).
This script measures steps/s for the jitted train step at a
configurable scale on the current device.

Run on TPU:  timeout 900 python scripts/bench_train_step.py
Quick CPU check: TPUGS_PLATFORM=cpu python scripts/bench_train_step.py \
    --num-gaussians 2000 --width 128 --height 96 --steps 4 --engines tiled
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=2**17)
    ap.add_argument("--width", type=int, default=648)
    ap.add_argument("--height", type=int, default=420)
    ap.add_argument("--feature-dim", type=int, default=128)
    ap.add_argument("--teacher-dim", type=int, default=512)
    ap.add_argument("--n-cams", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--engines", type=str, default="pallas,tiled")
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--tile-size", type=int, default=0,
                    help="pallas tile size (0 = TrainConfig default, "
                    "which auto-selects 32 at >=1M-pixel renders)")
    ap.add_argument("--contrib-dtype", type=str, default="",
                    help="backward gradient-row dtype for the pallas "
                    "engine: float32 | bfloat16 (default: TrainConfig)")
    ap.add_argument("--margin", type=float, default=0.0,
                    help="pallas size margin override (0 = TrainConfig "
                    "default)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp

    from tpugs.encoders import get_encoder
    from tpugs.train.config import TrainConfig
    from tpugs.train.trainer import Trainer, init_scene_from_points
    from tpugs.utils.synthetic import orbit_cameras

    print(f"device: {jax.devices()[0].platform}", flush=True)
    W, H, n = args.width, args.height, args.num_gaussians
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cams = orbit_cameras(args.n_cams, W, H, radius=3.0)
    teacher = get_encoder(f"linear:{args.teacher_dim}")
    images = jnp.asarray(
        rng.uniform(0, 1, (args.n_cams, H, W, 3)).astype(np.float32)
    )

    results = {}
    for engine in args.engines.split(","):
        cfg = TrainConfig(
            max_steps=30_000, sh_degree=args.sh_degree,
            feature_dim=args.feature_dim,
            feature_out_dim=args.teacher_dim,
            strategy="none", random_bkgd=False, raster_engine=engine,
            **({"pallas_tile_size": args.tile_size} if args.tile_size
               else {}),
            **({"pallas_contrib_dtype": args.contrib_dtype}
               if args.contrib_dtype else {}),
            **({"pallas_size_margin": args.margin} if args.margin else {}),
        )
        scene = init_scene_from_points(pts, rgbs, cfg)
        tr = Trainer(cfg, scene, 1.0, teacher=teacher, width=W, height=H,
                     n_cameras=args.n_cams)
        tr.teacher = teacher
        t0 = time.time()
        tr._estimate_sizes(np.asarray(cams.viewmats), np.asarray(cams.Ks))
        print(f"[{engine}] sizes={tr._sizes} "
              f"(est {time.time()-t0:.1f}s)", flush=True)
        staged = {
            "images": images,
            "viewmats": jnp.asarray(cams.viewmats),
            "Ks": jnp.asarray(cams.Ks),
            "image_ids": jnp.arange(args.n_cams, dtype=jnp.int32),
        }
        idx = rng.integers(0, args.n_cams, args.steps)
        t0 = time.time()
        tr.train_chunk(staged, args.steps, cam_idx=idx)  # compile + run
        print(f"[{engine}] first chunk (incl compile): "
              f"{time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        out = tr.train_chunk(staged, args.steps, cam_idx=idx)
        # device->host read of the losses forces completion on the
        # remote transport (block_until_ready is not reliable there)
        _ = float(np.asarray(out["loss"]).sum())
        dt = time.time() - t0
        rate = args.steps / dt
        results[engine] = rate
        print(f"[{engine}] {rate:.2f} steps/s "
              f"({dt/args.steps*1e3:.0f} ms/step, N={n}, {W}x{H}, "
              f"D={args.feature_dim}->{args.teacher_dim})", flush=True)

    if len(results) == 2 and "pallas" in results and "tiled" in results:
        print(f"speedup pallas/tiled: "
              f"{results['pallas']/results['tiled']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
