"""Train state + optimizer construction.

Reproduces the reference's optimization semantics:
  * stack A: torch.optim.Adam(lr, weight_decay) — L2 decay added to the
    gradient BEFORE the Adam moments (train.py:42); grad-norm clip 5.0
    applied before the step (train.py:64).
  * stack B: 3 param groups — backbone & pretrained BEV modules at lr*0.1,
    new modules at lr (train_vovnet_transformer.py:133-166) — plus linear
    warmup -> cosine schedule stepped PER BATCH with multiplier floor
    `min_lr` (:54-63; note the reference uses min_lr as a *multiplier*
    floor, so the actual floor is lr*min_lr — quirk preserved), clip 10.0.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config

# modules trained at lr*backbone_lr_mult in stack B (reference :144-155)
PRETRAINED_PREFIXES = ("backbone", "depth_net", "cam_encode", "bev_encoder")


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int, min_lr_mult: float = 1e-6
):
    """get_cosine_schedule_with_warmup (train_vovnet_transformer.py:54-63)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        cos = jnp.maximum(min_lr_mult, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return fn


def _torch_adam(lr_or_schedule, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: coupled L2 decay before the moments."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    if callable(lr_or_schedule):
        parts.append(optax.scale_by_schedule(lambda s: -lr_or_schedule(s)))
    else:
        parts.append(optax.scale(-lr_or_schedule))
    return optax.chain(*parts)


def build_optimizer(
    cfg: Config, steps_per_epoch: Optional[int] = None
) -> optax.GradientTransformation:
    tc = cfg.train
    if tc.use_schedule:
        assert steps_per_epoch is not None, "schedule needs steps_per_epoch"
        total = tc.num_epochs * steps_per_epoch
        warm = tc.warmup_epochs * steps_per_epoch
        lr = warmup_cosine_schedule(tc.lr, warm, total, tc.min_lr)
        lr_low = warmup_cosine_schedule(
            tc.lr * tc.backbone_lr_mult, warm, total, tc.min_lr
        )
    else:
        lr, lr_low = tc.lr, tc.lr * tc.backbone_lr_mult

    clip = optax.clip_by_global_norm(tc.max_grad_norm)

    if cfg.model.family == "vovnet_transformer":
        def label_fn(params):
            def label(path, _):
                top = path[0].key if hasattr(path[0], "key") else str(path[0])
                return "pretrained" if top in PRETRAINED_PREFIXES else "new"

            return jax.tree_util.tree_map_with_path(label, params)

        return optax.chain(
            clip,
            optax.multi_transform(
                {
                    "pretrained": _torch_adam(lr_low, tc.weight_decay),
                    "new": _torch_adam(lr, tc.weight_decay),
                },
                label_fn,
            ),
        )
    return optax.chain(clip, _torch_adam(lr, tc.weight_decay))


def create_train_state(cfg: Config, model, rng, sample_batch, steps_per_epoch=None):
    vars_ = model.init(rng, *sample_batch, train=False)
    params = vars_["params"]
    batch_stats = vars_.get("batch_stats", {})
    tx = build_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
