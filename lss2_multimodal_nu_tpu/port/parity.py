"""Output-parity harness vs the PyTorch reference (BASELINE north star:
identical BEV segmentation maps and context logits within fp32 tolerance).

Workflow (the torch side runs wherever the reference's dependencies exist):

1. On the reference side, dump a trace while running predict.py-style eval:

       trace = {"inputs": {"imgs": ..., "rots": ..., ...},   # numpy, NCHW imgs
                "outputs": {"bev": ..., "act": ..., "desc": ...},
                "state_dict": {k: v.numpy() for k, v in model.state_dict().items()},
                "family": "bev_txt", "variant": "b4"}
       np.savez("trace.npz", **flatten(trace))   # or pickle

2. Here, `check_parity("trace.npz")` ports the weights, replays the inputs
   through the Flax model (eval mode, deterministic aug already baked into
   the inputs), and reports max-abs / rel errors per output.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import Config, ModelConfig


def load_trace(path: str) -> Dict[str, Any]:
    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=True)
        return {k: z[k].item() if z[k].dtype == object else z[k] for k in z.files}
    with open(path, "rb") as f:
        return pickle.load(f)


def to_nhwc_inputs(inputs: Dict[str, np.ndarray]) -> Tuple[np.ndarray, ...]:
    """Reference batches are NCHW images (B, N, 3, H, W); we run NHWC."""
    imgs = np.asarray(inputs["imgs"])
    if imgs.ndim == 5 and imgs.shape[2] == 3:
        imgs = np.transpose(imgs, (0, 1, 3, 4, 2))
    return (
        imgs,
        np.asarray(inputs["rots"]),
        np.asarray(inputs["trans"]),
        np.asarray(inputs["intrins"]),
        np.asarray(inputs["post_rots"]),
        np.asarray(inputs["post_trans"]),
    )


def check_parity(
    trace_path: str,
    family: Optional[str] = None,
    variant: str = "b4",
    rtol: float = 1e-3,
    atol: float = 1e-3,
    cfg: Optional[Config] = None,
) -> Dict[str, Dict[str, float]]:
    import jax.numpy as jnp

    from ..models.factory import build_model
    from .torch_port import port_state_dict

    trace = load_trace(trace_path)
    family = family or trace.get("family", "bev_txt")
    variant = trace.get("variant", variant)
    cfg = cfg or Config(model=ModelConfig(family=family, effnet_variant=variant))

    params, batch_stats, missing = port_state_dict(
        family, trace["state_dict"], strict=False, variant=variant
    )
    if missing:
        print(f"[parity] {len(missing)} torch keys missing (first: {missing[:3]})")

    model = build_model(cfg)
    inputs = tuple(map(jnp.asarray, to_nhwc_inputs(trace["inputs"])))
    out = model.apply({"params": params, "batch_stats": batch_stats}, *inputs)
    if not isinstance(out, tuple):
        out = (out,)

    names = ("bev", "act", "desc")[: len(out)]
    report = {}
    for name, got in zip(names, out):
        want = np.asarray(trace["outputs"][name])
        got = np.asarray(got)
        if name == "bev" and want.ndim == 4 and want.shape[1] == got.shape[-1]:
            want = np.transpose(want, (0, 2, 3, 1))  # NCHW -> NHWC
        err = np.abs(got - want)
        denom = np.maximum(np.abs(want), 1e-6)
        report[name] = {
            "max_abs": float(err.max()),
            "max_rel": float((err / denom).max()),
            "mean_abs": float(err.mean()),
            "argmax_match": float(
                (got.argmax(-1) == want.argmax(-1)).mean()
            ) if name == "bev" else float("nan"),
            "pass": bool(np.allclose(got, want, rtol=rtol, atol=atol)),
        }
    return report
