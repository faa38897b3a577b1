"""CLI: Feature-3DGS training (reference
``f3dgs/simple_trainer_feature_3dgs.py`` main/cli, ``:950-1023``).

Runs the full loop: COLMAP parse -> SfM init -> jitted train steps with
joint RGB + feature distillation -> periodic eval/checkpoint -> final
trajectory video. Multi-chip training lives in ``tpugs/dist`` (see
``dist.shard.make_trainer_step_sharded``); this CLI drives the
single-chip trainer."""

from __future__ import annotations

import os
import time

import numpy as np


def main(
    data_dir: str = "./data/garden",
    result_dir: str = "./results/garden",
    data_factor: int = 4,
    max_steps: int = 30_000,
    feature_dim: int = 128,
    feature_out_dim: int = 512,
    teacher: str = "linear:512",
    strategy: str = "default",
    init_type: str = "sfm",
    sh_degree: int = 3,
    test_every: int = 8,
    eval_every: int = 7000,
    save_every: int = 7000,
    depth_loss: bool = False,
    steps_scaler: float = 1.0,
    seed: int = 42,
    pose_opt: bool = False,
    pose_noise: float = 0.0,
    app_opt: bool = False,
    absgrad: bool = False,
    grow_grad2d: float = 0.0002,
    compression: str = "",
    lpips_weights: str = "",
    resume: str = "",
    chunked: bool = False,
    chunk_steps: int = 50,
    # Pad the Gaussian capacity to a bucket after refine: without this
    # every densification changes N and the whole train step recompiles
    # each refine_every steps (tens of minutes of wall clock at scale).
    # 0 disables (exact N; only sensible on CPU or with strategy=none).
    capacity_multiple: int = 16384,
    viewer_port: int = -1,
    viewer_every: int = 100,
    raster_engine: str = "auto",
):
    import jax

    # Persistent compilation cache: capacity re-bucketing and
    # supervisor resumes recompile the step; cached executables make
    # both (and repeat runs) near-free.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    import jax.numpy as jnp

    from tpugs.encoders import get_encoder
    from tpugs.train.config import TrainConfig
    from tpugs.train.dataset import Dataset, Parser
    from tpugs.train.trainer import (
        Trainer,
        init_scene_from_points,
        init_scene_random,
    )

    cfg = TrainConfig(
        data_dir=data_dir,
        result_dir=result_dir,
        data_factor=data_factor,
        max_steps=max_steps,
        feature_dim=feature_dim,
        feature_out_dim=feature_out_dim,
        strategy=strategy,
        init_type=init_type,
        sh_degree=sh_degree,
        test_every=test_every,
        depth_loss=depth_loss,
        steps_scaler=steps_scaler,
        seed=seed,
        pose_opt=pose_opt,
        pose_noise=pose_noise,
        app_opt=app_opt,
        absgrad=absgrad,
        grow_grad2d=grow_grad2d,
        compression=compression,
        capacity_multiple=capacity_multiple,
        raster_engine=raster_engine,
    ).adjust_steps()

    os.makedirs(result_dir, exist_ok=True)
    parser = Parser(
        data_dir, factor=data_factor,
        normalize=cfg.normalize_world_space, test_every=test_every,
    )
    trainset = Dataset(parser, "train", load_depths=depth_loss)
    valset = Dataset(parser, "val")
    sample = trainset[0]
    height, width = sample["image"].shape[:2]

    if cfg.init_type == "sfm" and len(parser.points):
        scene = init_scene_from_points(
            parser.points, parser.points_rgb, cfg, parser.scene_scale
        )
    else:
        scene = init_scene_random(cfg, parser.scene_scale)

    encoder = get_encoder(teacher) if feature_dim else None
    lpips_params = None
    if lpips_weights:
        from tpugs.train.lpips import load_lpips_file

        lpips_params = load_lpips_file(lpips_weights)
    trainer = Trainer(
        cfg, scene, parser.scene_scale,
        teacher=encoder, width=width, height=height,
        n_cameras=parser.num_images, lpips_params=lpips_params,
    )
    if resume:
        trainer.load_checkpoint_full(resume)
        print(f"resumed from {resume} at step {trainer.step}", flush=True)

    viewer = None
    if viewer_port >= 0:
        from tpugs.train.viewer import LiveViewer, orbit_viewmat

        viewer = LiveViewer(port=viewer_port)
        print(f"live viewer: http://localhost:{viewer.port}/", flush=True)
        center = np.asarray(scene.means).mean(axis=0)
        default_vm = np.asarray(sample["viewmat"], np.float32)
        view_K = np.asarray(sample["K"], np.float32)

    def viewer_update(step, stats):
        """Render the browser-requested view and push frame + stats
        (reference: viser update per step, ``:771-781``)."""
        if viewer is None:
            return
        cam = viewer.render_request()
        vm = (
            orbit_viewmat(center, cam["yaw"], cam["pitch"], cam["radius"])
            if cam
            else default_vm
        )
        img, _ = trainer.render_eval(vm, view_K)
        frame = np.asarray(
            np.clip(np.asarray(img[..., :3]), 0, 1) * 255
        ).astype(np.uint8)
        viewer.update(
            step, stats, frame, num_rays_per_step=width * height
        )

    def maybe_eval_save(step):
        if eval_every and step > 0 and step % eval_every == 0:
            metrics = trainer.evaluate(valset)
            print(f"eval @ {step}: {metrics}", flush=True)
            trainer.save_stats(
                metrics, os.path.join(result_dir, f"stats/val_step{step}.json")
            )
        if save_every and step > 0 and step % save_every == 0:
            trainer.save_checkpoint(
                os.path.join(result_dir, f"ckpts/ckpt_{step}.npz")
            )
            trainer.save_checkpoint_full(
                os.path.join(result_dir, f"ckpts/full_{step}.npz")
            )

    t0 = time.time()
    if chunked:
        # One device dispatch per chunk (lax.scan over steps, dataset
        # staged in HBM) — the TPU-native loop for high-latency
        # transports. Host-side events (refine, opacity reset, eval,
        # save, prints) land on chunk boundaries: chunk = gcd of every
        # event cadence.
        import math
        from functools import reduce

        staged = trainer.stage_dataset(trainset)
        cadences = [cfg.sh_degree_interval, 100]
        if cfg.strategy != "none":
            cadences += [cfg.refine_every]
            if cfg.reset_every > 0:
                cadences.append(cfg.reset_every)
        if eval_every:
            cadences.append(eval_every)
        if save_every:
            cadences.append(save_every)
        chunk = reduce(math.gcd, cadences)
        if chunk_steps > 0 and chunk > chunk_steps:
            # Bound single-dispatch wall time (a very long device
            # program can outlive the remote worker's patience): use
            # the largest divisor of the event gcd that fits the cap,
            # so chunk boundaries still land on every event step.
            chunk = max(
                d for d in range(1, chunk + 1)
                if chunk % d == 0 and d <= chunk_steps
            )
        start = trainer.step
        while trainer.step < cfg.max_steps:
            n = min(chunk, cfg.max_steps - trainer.step)
            stats = trainer.train_chunk(staged, n)
            step = trainer.step
            rate = (step - start) / (time.time() - t0)
            print(
                f"step {step} loss {stats['loss'][-1]:.4f} "
                f"l1 {stats['l1'][-1]:.4f} "
                f"feat {stats['feature_l1'][-1]:.4f} "
                f"N {trainer.scene.num_gaussians} {rate:.2f} it/s",
                flush=True,
            )
            if trainer.strategy is not None:
                if (
                    cfg.refine_start_iter <= step < cfg.refine_stop_iter
                    and step % cfg.refine_every == 0
                ):
                    info = trainer.refine()
                    print(f"refine @ {step}: {info}", flush=True)
                if (
                    cfg.reset_every > 0
                    and step % cfg.reset_every == 0
                    # resets stop with densification (gsplat DefaultStrategy
                    # gates all post-backward maintenance at refine_stop_iter)
                    and step < cfg.refine_stop_iter
                ):
                    trainer.scene = trainer.strategy.reset_opacities(
                        trainer.scene
                    )
                    trainer._reset_opt_group("opacities")
            viewer_update(
                step, {k: float(v[-1]) for k, v in stats.items()}
            )
            if step < cfg.max_steps:
                maybe_eval_save(step)
    else:
        rng = np.random.default_rng(seed)
        for step in range(trainer.step, cfg.max_steps):
            data = trainset[int(rng.integers(0, len(trainset)))]
            feats = (
                encoder(jnp.asarray(data["image"]))
                if encoder is not None
                else None
            )
            stats = trainer.train_step(data, teacher_feats=feats)
            if step % 100 == 0:
                rate = (step + 1) / (time.time() - t0)
                print(
                    f"step {step} loss {stats['loss']:.4f} "
                    f"l1 {stats['l1']:.4f} "
                    f"feat {stats['feature_l1']:.4f} "
                    f"N {trainer.scene.num_gaussians} {rate:.2f} it/s",
                    flush=True,
                )
            if viewer is not None and step % viewer_every == 0:
                viewer_update(step, stats)
            maybe_eval_save(step)

    metrics = trainer.evaluate(valset)
    print("final eval:", metrics)
    trainer.save_stats(
        metrics, os.path.join(result_dir, "stats/val_final.json")
    )
    trainer.save_checkpoint(
        os.path.join(result_dir, f"ckpts/ckpt_{cfg.max_steps - 1}.npz")
    )
    trainer.save_checkpoint_full(
        os.path.join(result_dir, f"ckpts/full_{cfg.max_steps - 1}.npz")
    )
    try:
        trainer.render_traj(
            np.asarray(sample["K"]),
            os.path.join(result_dir, "traj.gif"),
            n_frames=30,
        )
    except Exception as e:  # trajectory is a nicety, not a gate
        print("render_traj failed:", e)
    return trainer


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
