"""Single configuration tree for the whole framework.

Replaces the reference's per-script argparse defaults (reference: train.py:99-131,
pre_train.py:90-120, train_vovnet_transformer.py:37-51, predict.py:102-134) and the
two dicts threaded everywhere (`grid_conf`, `data_aug_conf`, reference train.py:15-27).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


CAM_ORDER = (
    "CAM_FRONT_LEFT",
    "CAM_FRONT",
    "CAM_FRONT_RIGHT",
    "CAM_BACK_LEFT",
    "CAM_BACK",
    "CAM_BACK_RIGHT",
)


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """BEV voxel-grid bounds. Matches reference train.py:116-119 defaults.

    Each bound is (lo, hi, step). Derived: dx=(.5,.5,20), bx=(-49.75,-49.75,0),
    nx=(200,200,1), D=41 (SURVEY Appendix A).
    """

    xbound: Tuple[float, float, float] = (-50.0, 50.0, 0.5)
    ybound: Tuple[float, float, float] = (-50.0, 50.0, 0.5)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    dbound: Tuple[float, float, float] = (4.0, 45.0, 1.0)

    @property
    def nx(self) -> Tuple[int, int, int]:
        return tuple(
            int((b[1] - b[0]) / b[2]) for b in (self.xbound, self.ybound, self.zbound)
        )

    @property
    def dx(self) -> Tuple[float, float, float]:
        return (self.xbound[2], self.ybound[2], self.zbound[2])

    @property
    def bx(self) -> Tuple[float, float, float]:
        return tuple(b[0] + b[2] / 2.0 for b in (self.xbound, self.ybound, self.zbound))

    @property
    def num_depth_bins(self) -> int:
        lo, hi, step = self.dbound
        import math

        return int(math.ceil((hi - lo) / step))


@dataclasses.dataclass(frozen=True)
class AugConfig:
    """Image-augmentation configuration. Matches reference train.py:120-127."""

    H: int = 900
    W: int = 1600
    final_dim: Tuple[int, int] = (128, 352)
    resize_lim: Tuple[float, float] = (0.193, 0.225)
    bot_pct_lim: Tuple[float, float] = (0.0, 0.22)
    rot_lim: Tuple[float, float] = (-5.4, 5.4)
    rand_flip: bool = False
    cams: Sequence[str] = CAM_ORDER
    ncams: int = 6


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model-family selection and architecture knobs."""

    # 'lss' | 'bev_txt' | 'bev_txt_onlybev' | 'vovnet_transformer' | 'vovnet_pretrain'
    family: str = "lss"
    seg_classes: int = 4
    cam_channels: int = 64  # stack A camC (reference model_baseline.py:25)
    downsample: int = 16
    # stack A backbone scale: 'b0'..'b7' (reference modules.py:33-35)
    effnet_variant: str = "b4"
    # stack B options (reference model_vovnet_transformer.py:363-374)
    vovnet_type: str = "vovnet39"  # 'vovnet39' | 'vovnet57' | 'vovnet99'
    lss_version: str = "v2"  # 'v1' | 'v2'
    use_camera_attn: bool = True  # ablation V2/V3
    use_cross_attn: bool = True  # ablation V3
    v2_cam_channels: int = 128  # stack B C (reference model_vovnet_transformer.py:400)
    num_action_classes: int = 4
    num_desc_classes: int = 8
    # numerics: parameters are always fp32; activations in compute_dtype
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference train.py:42,110-111; pre_train.py:42,101-102;
    train_vovnet_transformer.py:54-63,477-478)."""

    batch_size: int = 6
    lr: float = 1e-4
    weight_decay: float = 1e-8
    max_grad_norm: float = 5.0
    num_epochs: int = 50
    # stack B: layer-wise lr + warmup-cosine, stepped per batch
    backbone_lr_mult: float = 0.1
    warmup_epochs: int = 5
    min_lr: float = 1e-6
    use_schedule: bool = False
    seed: int = 42
    log_every: int = 200
    # wandb.watch equivalent (reference train_vovnet_transformer.py:505-517):
    # per-top-module gradient norms + a strided value sample for histograms,
    # computed in the jitted step (no extra backward pass)
    watch_gradients: bool = False
    # PRNG impl for dropout masks. "rbg" uses the TPU hardware bit generator
    # (XLA RngBitGenerator) — the flagship's ~120M mask bits/step cost
    # multiple ms under threefry, pure overhead the torch reference never
    # pays (cuRAND is hardware-rate). "threefry" keeps JAX's default.
    dropout_rng_impl: str = "rbg"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding. New TPU-native surface (SURVEY §2.5)."""

    # data-parallel × fsdp (parameter-sharding) axes; dp*fsdp must equal device count
    dp: int = 1
    fsdp: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    grid: GridConfig = GridConfig()
    aug: AugConfig = AugConfig()
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()
    dataroot: str = "/data/nu-A2D"
    version: str = "trainval"  # 'trainval' | 'mini'
    logdir: str = "./result-log"


def preset(name: str) -> Config:
    """Named presets mirroring the 5 reference entry points / BASELINE configs."""
    if name == "pretrain":  # reference pre_train.py (stage-1 BEV-only, stack A)
        return Config(
            model=ModelConfig(family="lss"),
            train=TrainConfig(batch_size=6, lr=1e-3, weight_decay=1e-7),
            aug=AugConfig(rand_flip=True),
        )
    if name == "train":  # reference train.py (stage-2 multitask, stack A)
        return Config(
            model=ModelConfig(family="bev_txt"),
            train=TrainConfig(batch_size=6, lr=1e-4, weight_decay=1e-8),
        )
    if name == "train_onlybev":  # reference train variant w/ compile_model_onlybev
        return Config(
            model=ModelConfig(family="bev_txt_onlybev"),
            train=TrainConfig(batch_size=6, lr=1e-4, weight_decay=1e-8),
        )
    if name == "pretrain_v2":  # reference pre_train_vovnet.py
        return Config(
            model=ModelConfig(family="vovnet_pretrain", lss_version="v2"),
            train=TrainConfig(
                batch_size=12, lr=1e-4,
                weight_decay=1e-8,  # "Paper: 1e-8" pre_train_vovnet.py:309
                num_epochs=60, use_schedule=True,
            ),
            aug=AugConfig(rand_flip=True),
        )
    if name == "train_v2":  # reference train_vovnet_transformer.py (V3 default)
        return Config(
            model=ModelConfig(family="vovnet_transformer", lss_version="v1"),
            train=TrainConfig(
                batch_size=8,
                lr=1e-4,
                weight_decay=1e-8,  # "Paper: 1e-8" train_vovnet_transformer.py:393
                max_grad_norm=10.0,
                num_epochs=60,
                use_schedule=True,
            ),
            aug=AugConfig(rand_flip=True),
        )
    raise ValueError(f"unknown preset: {name}")
