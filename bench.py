"""Headline benchmark: 6-camera frames/sec/chip on the flagship model
(VoVNet-39 + LSS v2 + transformer, the reference's strongest config).

Prints ONE JSON line. Baseline: the reference reports 25-30 FPS full-model
inference on an RTX 3090 (README_TRAINING.md:37); vs_baseline uses the
midpoint 27.5.

Timing notes (see .claude/skills/verify/SKILL.md): the axon backend caches
repeated identical executions and laziness defeats block_until_ready, so we
time over VARYING inputs and force each step with a scalar fetch.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lss2_multimodal_nu_tpu.config import Config, ModelConfig
    from lss2_multimodal_nu_tpu.models.factory import build_model
    from __graft_entry__ import _fake_inputs

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    family = sys.argv[2] if len(sys.argv) > 2 else "vovnet_transformer"
    cfg = Config(
        model=ModelConfig(
            family=family, vovnet_type="vovnet39", lss_version="v2",
            effnet_variant="b4",
        )
    )
    model = build_model(cfg)
    batches = [_fake_inputs(b=batch, seed=s) for s in range(6)]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *batches[0])

    @jax.jit
    def fwd_probe(v, *args):
        out = model.apply(v, *args)
        if not isinstance(out, tuple):
            out = (out,)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    float(fwd_probe(variables, *batches[0]))  # compile + warm
    t0 = time.time()
    n = 5
    for i in range(1, n + 1):
        float(fwd_probe(variables, *batches[i]))
    dt = (time.time() - t0) / n
    fps = batch / dt
    print(
        json.dumps(
            {
                "metric": "6cam_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 27.5, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
