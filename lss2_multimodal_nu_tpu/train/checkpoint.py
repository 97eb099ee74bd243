"""Checkpointing via Orbax — the reference's three schemes (SURVEY §5):

  1. params-only per epoch (`model{epoch}.pt`, train.py:93-95);
  2. component-wise subtrees for transfer learning
     (pre_train_vovnet.py:465-477 -> consumed with graceful mismatch skip at
     train_vovnet_transformer.py:430-449);
  3. full train state incl. optimizer + step (best/periodic,
     train_vovnet_transformer.py:573-605).

Restores support `strict=False` semantics (train.py:39): subtrees present in
the checkpoint override the freshly-initialized tree; everything else keeps
its init values; shape mismatches are skipped with a warning.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _ckptr():
    return ocp.PyTreeCheckpointer()


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_params(path: str, params: Any, batch_stats: Any) -> None:
    _ckptr().save(
        os.path.abspath(path),
        {"params": _to_host(params), "batch_stats": _to_host(batch_stats)},
        force=True,
    )


def load_tree(path: str) -> Dict[str, Any]:
    return _ckptr().restore(os.path.abspath(path))


def merge_loose(init: Any, restored: Any, prefix: str = "") -> Any:
    """load_state_dict(strict=False)-style merge: recursively take restored
    leaves whose path+shape match the init tree; keep init otherwise."""
    if isinstance(init, dict):
        if not isinstance(restored, dict):
            return init
        return {
            k: merge_loose(v, restored[k], f"{prefix}/{k}") if k in restored else v
            for k, v in init.items()
        }
    if restored is None:
        return init
    try:
        r = np.asarray(restored)
        i = np.asarray(init)
        if r.shape == i.shape:
            return r.astype(i.dtype)
        print(f"[ckpt] skip {prefix}: shape {r.shape} != {i.shape}")
    except Exception as e:  # pragma: no cover
        print(f"[ckpt] skip {prefix}: {e}")
    return init


def _align_root(init: Any, restored: Any) -> Any:
    """Re-root `restored` when the checkpoint and the target model nest the
    same modules at different depths.

    The reference's stage-1 LSS checkpoint holds encoder/camencode/bevencode
    at the state_dict root, and BEV_TXT declares the same attributes at ITS
    root (model_BEV_TXT.py:160-174), so `load_state_dict(strict=False)`
    transfers them (train.py:37-39). Here BevTxt nests those modules under
    'lss' — without alignment the cross-stack warm start silently merges
    nothing. If no root key overlaps, look one level down on either side;
    a UNIQUE overlapping child re-roots the restored tree (ambiguity keeps
    the trees as-is rather than guessing)."""
    if not isinstance(init, dict) or not isinstance(restored, dict):
        return restored

    def overlap(a, b):
        return len(set(a) & set(b))

    if overlap(init, restored) > 0:
        return restored
    # init nests deeper: wrap restored under the one child it matches
    down = [
        k for k, v in init.items()
        if isinstance(v, dict) and overlap(v, restored) > 0
    ]
    if len(down) == 1:
        print(f"[ckpt] warm start: aligning checkpoint root under '{down[0]}'")
        return {down[0]: restored}
    # restored nests deeper: lift the one child that matches init
    up = [
        k for k, v in restored.items()
        if isinstance(v, dict) and overlap(init, v) > 0
    ]
    if len(up) == 1:
        print(f"[ckpt] warm start: lifting checkpoint subtree '{up[0]}'")
        return restored[up[0]]
    return restored


def restore_params_loose(path: str, params: Any, batch_stats: Any):
    tree = load_tree(path)
    return (
        merge_loose(params, _align_root(params, tree.get("params", {}))),
        merge_loose(
            batch_stats, _align_root(batch_stats, tree.get("batch_stats", {}))
        ),
    )


def save_components(
    path: str, params: Any, batch_stats: Any, components: Sequence[str],
    extra: Optional[Dict] = None,
) -> None:
    """Scheme 2: save named top-level module subtrees only (+ optional
    metadata, e.g. epoch/miou/lss_version as in pre_train_vovnet.py:465-477)."""
    payload = {
        "params": {k: _to_host(params[k]) for k in components if k in params},
        "batch_stats": {
            k: _to_host(batch_stats[k]) for k in components if k in batch_stats
        },
        "components": list(components),
    }
    if extra:
        payload["extra"] = extra
    _ckptr().save(os.path.abspath(path), payload, force=True)


def save_train_state(path: str, state: TrainState, extra: Optional[Dict] = None):
    """Scheme 3: full resumable state (step/params/batch_stats/opt_state)."""
    payload = {
        "step": np.asarray(jax.device_get(state.step)),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    if extra:
        payload["extra"] = extra
    _ckptr().save(os.path.abspath(path), payload, force=True)


def restore_train_state(path: str, state: TrainState) -> TrainState:
    # partial_restore: the save-side payload may carry an `extra` metadata
    # subtree ({"epoch": ..}, cli.py); restoring with a strict item tree would
    # raise a structure mismatch on it (caught by test_dist.py's sharded
    # round-trip), so restore only the keys the TrainState actually needs.
    item = {
        "step": np.asarray(jax.device_get(state.step)),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    try:
        restored = _ckptr().restore(
            os.path.abspath(path),
            args=ocp.args.PyTreeRestore(item=item, partial_restore=True),
        )
    except TypeError:
        # orbax-checkpoint < 0.11 has no partial_restore kwarg. Fall back to
        # restoring the full saved tree (incl. any `extra` metadata subtree)
        # and re-impose the live opt_state tree structure (orbax returns
        # namedtuples/tuples as plain dicts on an item-less restore).
        raw = _ckptr().restore(os.path.abspath(path))
        restored = {k: raw[k] for k in item}
        restored["opt_state"] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(restored["opt_state"]),
        )
    return state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=jax.tree_util.tree_map(
            lambda i, r: r, state.opt_state, restored["opt_state"]
        ),
    )


class AsyncSaver:
    """Async checkpointing (SURVEY §5: Orbax async save) — the save runs in a
    background thread while training continues; `wait()` before exit."""

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save_params(self, path: str, params: Any, batch_stats: Any):
        self._ckptr.save(
            os.path.abspath(path),
            {"params": _to_host(params), "batch_stats": _to_host(batch_stats)},
            force=True,
        )

    def wait(self):
        self._ckptr.wait_until_finished()

    def close(self):
        self.wait()
        self._ckptr.close()


class PreemptionHandler:
    """SIGTERM-aware emergency checkpointing (the reference has no recovery
    path beyond a manual --checkpoint flag, train.py:37-39). Register once;
    call `should_stop()` in the epoch loop and save before exiting."""

    def __init__(self):
        import signal
        import threading

        self._flag = threading.Event()
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev = signal.getsignal(sig)

                def handler(signum, frame, _prev=prev):
                    self._flag.set()
                    if callable(_prev):
                        _prev(signum, frame)

                signal.signal(sig, handler)
            except (ValueError, OSError):  # non-main thread etc.
                pass

    def should_stop(self) -> bool:
        return self._flag.is_set()


def latest_checkpoint(logdir: str, prefix: str = "model") -> Optional[str]:
    """Auto-restore-latest helper (the reference has none — recovery is a
    manual --checkpoint flag, train.py:37-39)."""
    if not os.path.isdir(logdir):
        return None
    cands = []
    for name in os.listdir(logdir):
        if name.startswith(prefix):
            digits = "".join(c for c in name[len(prefix):] if c.isdigit())
            if digits:
                cands.append((int(digits), os.path.join(logdir, name)))
    return max(cands)[1] if cands else None
