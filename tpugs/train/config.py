"""Trainer configuration (reference ``f3dgs/simple_trainer_feature_3dgs.py``
``Config`` dataclass, ``:47-172``), including the ``adjust_steps`` schedule
scaler (``:155-172``)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional


@dataclasses.dataclass
class TrainConfig:
    # data
    data_dir: str = "./data/garden"
    data_factor: int = 4
    result_dir: str = "./results/garden"
    test_every: int = 8
    patch_size: Optional[int] = None
    normalize_world_space: bool = True

    # training
    max_steps: int = 30_000
    batch_size: int = 1
    steps_scaler: float = 1.0
    eval_steps: List[int] = dataclasses.field(
        default_factory=lambda: [7_000, 30_000]
    )
    save_steps: List[int] = dataclasses.field(
        default_factory=lambda: [7_000, 30_000]
    )

    # model
    init_type: str = "sfm"  # sfm | random
    init_num_pts: int = 100_000
    init_extent: float = 3.0
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    init_opa: float = 0.1
    init_scale: float = 1.0
    feature_dim: int = 128  # per-Gaussian latent feature size
    feature_out_dim: int = 512  # teacher feature size (LSeg 512)

    # loss weights (reference :602-644)
    ssim_lambda: float = 0.2
    feature_lambda: float = 1.0
    # dtype of the on-device teacher target ("bfloat16" halves the
    # dominant HBM buffer at garden scale; "float32" for exact targets)
    teacher_dtype: str = "bfloat16"
    depth_loss: bool = False
    depth_lambda: float = 0.01
    opacity_reg: float = 0.0
    scale_reg: float = 0.0
    # random background to discourage transparency (reference :118,578-580)
    random_bkgd: bool = True

    # camera pose optimization (reference :124-131)
    pose_opt: bool = False
    pose_opt_lr: float = 1e-5
    pose_opt_reg: float = 1e-6  # weight decay
    pose_noise: float = 0.0  # synthetic extrinsics noise (pose-opt testing)

    # appearance optimization (reference :134-141; the reference builds
    # the module + optimizers at :363-384 but its application inside
    # rasterize_splats is commented out — here it is actually applied)
    app_opt: bool = False
    app_embed_dim: int = 16
    app_opt_lr: float = 1e-3
    app_opt_reg: float = 1e-6

    # eval extras
    lpips_net: str = "alex"  # alex | vgg (weights loaded via codec file)
    compression: str = ""  # "png" -> run PngCompression-style eval (:911-926)

    # learning rates (reference create_splats_with_optimizers :233-254)
    means_lr: float = 1.6e-4
    scales_lr: float = 5e-3
    opacities_lr: float = 5e-2
    quats_lr: float = 1e-3
    sh0_lr: float = 2.5e-3
    shN_lr: float = 2.5e-3 / 20
    features_lr: float = 2.5e-3
    conv_lr: float = 2.5e-3

    # densification (reference DefaultStrategy knobs)
    strategy: str = "default"  # default | mcmc | none
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    refine_every: int = 100
    grow_grad2d: float = 0.0002
    # Use the per-pixel-abs screen gradient (gsplat's means2d.absgrad;
    # reference f3dgs/simple_trainer_feature_3dgs.py:453-476) as the
    # grow criterion instead of the signed sum. gsplat pairs this with
    # a ~4x higher grow_grad2d (0.0008) — set both together.
    absgrad: bool = False
    grow_scale3d: float = 0.01
    prune_opa: float = 0.005
    prune_scale3d: float = 0.1
    reset_every: int = 3000

    # static-shape capacity: pad N up to a multiple after each refine so
    # XLA recompiles only when the bucket grows, not on every refine
    # (padded Gaussians are fully transparent; default strategy only —
    # MCMC keeps N constant by construction). 0 = exact N.
    capacity_multiple: int = 0

    # rendering
    near_plane: float = 0.01
    far_plane: float = 1e10
    antialiased: bool = False
    # rasterizer engine for the train step: "tiled" (pure-JAX recompute
    # VJP), "pallas" (fused TPU kernels fwd+bwd, raster/pallas_train.py),
    # "auto" = pallas on accelerators, tiled on CPU
    raster_engine: str = "auto"
    # tile edge for the Pallas training kernels. 0 = auto: 32 for
    # >=1M-pixel renders, else 16. Tile 32 quarters the intersection
    # count T at roughly constant pixel-pair work, which quarters the
    # backward's two T-row HBM buffers (pack + contributions) — at
    # garden scale (1296x840, D=128) tile 16 needs ~15 GB of backward
    # temps and OOMs a 16 GB v5e chip; tile 32 fits. Tile 16 keeps the
    # (ts*ts, BLOCK) VPU temporaries smaller for little renders.
    pallas_tile_size: int = 0
    # extra headroom on the measured Pallas size buckets: the scene keeps
    # moving between refines (sizes are re-estimated only on refine), so
    # training wants more margin than the static lift pipeline's 1.05.
    # Every T-proportional stage (backward gradient-row write, reduce
    # gather, pack, render) scales with this, and overflow self-heals
    # (the step reports size_overflow and the host re-estimates +
    # recompiles), so the default buys steps/s and trusts the healer;
    # raise it if a run logs frequent overflow re-estimates.
    pallas_size_margin: float = 1.2
    # dtype of the backward's per-intersection gradient rows ("float32"
    # or "bfloat16"). bf16 halves the step's dominant HBM buffer
    # (several GB at garden scale) at ~0.4% relative gradient error
    # (reduce still accumulates f32) — same tradeoff the lift path
    # ships by default.
    pallas_contrib_dtype: str = "float32"
    # early-exit transmittance threshold for the Pallas kernels; 0.0
    # composites every block (bit-comparable to the tiled engine, which
    # never exits early)
    pallas_trans_eps: float = 1e-4

    # misc
    seed: int = 42
    tb_every: int = 100
    disable_viewer: bool = True

    def adjust_steps(self, factor: Optional[float] = None) -> "TrainConfig":
        """Scale every schedule by steps_scaler (reference ``:155-172``)."""
        f = self.steps_scaler if factor is None else factor
        if f == 1.0:
            return self
        return dataclasses.replace(
            self,
            max_steps=int(self.max_steps * f),
            eval_steps=[int(s * f) for s in self.eval_steps],
            save_steps=[int(s * f) for s in self.save_steps],
            sh_degree_interval=int(self.sh_degree_interval * f),
            refine_start_iter=int(self.refine_start_iter * f),
            refine_stop_iter=int(self.refine_stop_iter * f),
            refine_every=int(self.refine_every * f),
            reset_every=int(self.reset_every * f),
        )
