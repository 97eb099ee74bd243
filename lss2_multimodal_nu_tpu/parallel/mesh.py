"""Device mesh + sharding rules — new TPU-native surface (SURVEY §2.5).

The reference is single-GPU; its only collective is the guarded metric
all_reduce (tools.py:567-573). Here the distributed layer is first-class:

  * a 2-D Mesh (dp, fsdp): batch sharded over BOTH axes (every device gets a
    batch shard), parameters replicated over dp and sharded over fsdp
    (ZeRO-3 style). With fsdp=1 this degenerates to pure DP.
  * gradients/BN-stats/metric sums over the sharded batch axis become
    psum/reduce-scatter collectives inserted by XLA under jit — the moral
    equivalent of `ConfusionMatrix.reduce_from_all_processes`, but compiled.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config


# The two mesh axes the batch dimension is sharded over (see module docstring).
BATCH_AXES = ("dp", "fsdp")

# one-time warning latch for non-divisible batch dims (see constrain_batch)
_WARNED_NONDIVISIBLE = False


def activate_mesh(mesh: Mesh):
    """Install `mesh` as the ambient mesh (jax.sharding.set_mesh) so that
    `constrain_batch` hints inside model code resolve its axis names.

    Returns a context manager: use `with activate_mesh(mesh): ...` in tests,
    or call it once at startup in scripts/CLI (the context need not be
    exited for a process that uses one mesh for its whole life)."""
    return jax.sharding.set_mesh(mesh)


def constrain_batch(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Hint GSPMD that dim `axis` of `x` is sharded over the batch mesh axes.

    Without these hints XLA's sharding propagation gives up at reshapes that
    mix the batch dim (e.g. (B*N,C) -> (B,N,C)) and at some residual adds,
    falling back to "involuntary full rematerialization" — full replication
    of the activation on every device (observed in MULTICHIP_r03, VERDICT r3
    item 2). A no-op unless a mesh is active via `activate_mesh` AND the dim
    divides the mesh extent, so single-chip traces are byte-identical."""
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:  # pre-0.9 JAX without ambient-mesh API
        return x
    if am is None or getattr(am, "empty", True):
        return x
    axes = tuple(a for a in BATCH_AXES if a in am.axis_names)
    if not axes:
        return x
    extent = int(np.prod([am.shape[a] for a in axes]))
    if extent <= 1:
        return x
    if x.shape[axis] % extent != 0:
        # A non-divisible batch silently loses ALL sharding hints and
        # regresses to the full-replication behavior the hints were added to
        # fix (ADVICE r4) — warn once so the config gets fixed, don't crash
        # (odd trailing shapes can be legitimate, e.g. an eval tail batch).
        global _WARNED_NONDIVISIBLE
        if not _WARNED_NONDIVISIBLE:
            _WARNED_NONDIVISIBLE = True
            import warnings

            warnings.warn(
                f"constrain_batch: dim {axis} of shape {x.shape} does not "
                f"divide the dp*fsdp extent {extent}; sharding hints are "
                f"dropped and activations will be fully replicated. Use a "
                f"batch size divisible by dp*fsdp.",
                stacklevel=2,
            )
        return x
    spec = [None] * x.ndim
    spec[axis] = axes if len(axes) > 1 else axes[0]
    return jax.lax.with_sharding_constraint(x, P(*spec))


def make_mesh(cfg: Config, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    dp, fsdp = cfg.mesh.dp, cfg.mesh.fsdp
    n = dp * fsdp
    assert n <= len(devices), f"mesh {dp}x{fsdp} needs {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, fsdp)
    return Mesh(arr, axis_names=("dp", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over all devices (dp x fsdp)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params: Any, min_shard_elems: int = 2**19) -> Any:
    """ZeRO-style parameter sharding: shard each large tensor's largest
    axis that divides the fsdp size; small tensors stay replicated.

    The floor is deliberately high (0.5M elems = 2 MB f32): a sharded weight
    axis is contracted by either the forward or the backward matmul, and for
    small Dense kernels (the transformer/txt-branch 256-wide projections)
    the SPMD partitioner answers that with "involuntary full
    rematerialization" of the batch-sharded activations — costing far more
    than the sub-MB of memory sharding saves (VERDICT r3 item 2). Large
    backbone conv kernels partition cleanly (XLA all-gathers the weight)."""
    fsdp = mesh.shape["fsdp"]

    def rule(p: jnp.ndarray) -> NamedSharding:
        if fsdp == 1 or p.size < min_shard_elems:
            return replicated(mesh)
        # largest divisible axis
        axes = sorted(range(p.ndim), key=lambda a: -p.shape[a])
        for a in axes:
            if p.shape[a] % fsdp == 0:
                spec = [None] * p.ndim
                spec[a] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree_util.tree_map(rule, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_state(mesh: Mesh, state: Any) -> Any:
    """Place params/opt_state by the fsdp rule, everything else replicated."""
    p_sh = param_sharding(mesh, state.params)

    def put_like(tree, shardings):
        return jax.tree_util.tree_map(jax.device_put, tree, shardings)

    params = put_like(state.params, p_sh)
    # opt_state moments mirror param shapes; reuse the same rule per-leaf
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x,
            param_sharding(mesh, x)
            if hasattr(x, "shape") and x.ndim > 0
            else replicated(mesh),
        )
        if hasattr(x, "shape")
        else x,
        state.opt_state,
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), state.batch_stats
    )
    return state.replace(
        step=jax.device_put(state.step, replicated(mesh)),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
