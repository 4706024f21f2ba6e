"""Checkpointing via orbax.

The reference saves only final weights with ``torch.save(state_dict)`` to
fixed paths (`lib/standard/runner.py:48-60`) — no optimizer state, no resume.
Here the full TrainState (params, batch stats, Adafactor state, step, PRNG)
round-trips, enabling exact resume mid-NST-generation (SURVEY.md §5), and a
selective encoder-only restore mirrors the reference's 'conformer'-filtered
partial load (`runner.py:61-77`).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from nn_conformer_for_speech_recognition_tpu.train.state import TrainState


def _to_save(state: TrainState, iterator=None):
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
        # data-iterator position (SURVEY.md §5 full train-state): the epoch
        # stream is deterministic given (seed, epoch), so (epoch, step) is a
        # complete cursor — resume skips `step` batches of epoch `epoch`.
        "iterator": {
            "epoch": (iterator or {}).get("epoch", -1),
            "step": (iterator or {}).get("step", 0),
        },
    }
    return payload


def save_state(path: str, state: TrainState, iterator=None) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_save(state, iterator), force=True)


def restore_state(path: str, template: TrainState, with_iterator: bool = False):
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, _to_save(template))

    def match_placement(r, t):
        # orbax commits restored leaves to single-device placement, which
        # conflicts with mesh-committed params inside jitted steps.  Re-place
        # leaves whose template carries an explicit mesh sharding; return the
        # rest as HOST arrays (uncommitted — jit places them like fresh
        # inputs, matching the pre-restore state's behaviour).
        from jax.sharding import NamedSharding

        if isinstance(t, jax.Array) and isinstance(t.sharding, NamedSharding):
            return jax.device_put(r, t.sharding)
        return np.asarray(r)

    state = template.replace(
        step=match_placement(restored["step"], template.step),
        params=jax.tree.map(match_placement, restored["params"], template.params),
        batch_stats=jax.tree.map(
            match_placement, restored["batch_stats"], template.batch_stats
        ),
        opt_state=jax.tree.map(
            match_placement, restored["opt_state"], template.opt_state
        ),
        # wrap from HOST data: wrapping the restored (device-committed) array
        # would pin the key to one device, conflicting with mesh-placed params
        rng=jax.random.wrap_key_data(jnp.asarray(np.asarray(restored["rng"]))),
    )
    if with_iterator:
        it = restored.get("iterator", {"epoch": -1, "step": 0})
        it = {"epoch": int(it["epoch"]), "step": int(it["step"])}
        return state, (it if it["epoch"] >= 0 else None)
    return state


def restore_encoder_params(path: str, template_params: Any) -> Any:
    """Restore only encoder/subsampling params, keep the rest (decoder/head)
    from ``template_params`` — the 'load pretrained conformer' path."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        # untyped restore: returns the raw saved tree regardless of template
        restored = ckptr.restore(path)["params"]

    def merge(tpl, new, key_path=""):
        out = {}
        for k in tpl:
            sub = f"{key_path}/{k}"
            if isinstance(tpl[k], dict):
                out[k] = merge(tpl[k], new.get(k, tpl[k]), sub)
            else:
                take_new = ("encoder" in key_path or "subsampling" in key_path)
                out[k] = new.get(k, tpl[k]) if take_new else tpl[k]
        return out

    return merge(template_params, restored)


class CheckpointManager:
    """Rotating checkpoint manager: keeps the newest ``keep`` checkpoints
    (plus an optional 'best' by metric), the durable-training layer the
    reference's fixed-path ``torch.save`` lacks (`runner.py:48-60`)."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        self.best_metric: float | None = None

    def _step_dirs(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    out.append((int(name.split("_")[1]), name))
                except ValueError:
                    pass
        return sorted(out)

    def save(self, state: TrainState, metric: float | None = None,
             iterator: dict | None = None) -> str:
        step = int(state.step)
        path = os.path.join(self.directory, f"step_{step:08d}")
        save_state(path, state, iterator=iterator)
        if metric is not None and (self.best_metric is None or metric < self.best_metric):
            self.best_metric = metric
            best = os.path.join(self.directory, "best")
            if os.path.islink(best) or os.path.exists(best):
                import shutil

                shutil.rmtree(best, ignore_errors=True)
            import shutil

            shutil.copytree(path, best)
        # rotate
        dirs = self._step_dirs()
        while len(dirs) > self.keep:
            _, name = dirs.pop(0)
            import shutil

            shutil.rmtree(os.path.join(self.directory, name), ignore_errors=True)
        return path

    def latest(self) -> str | None:
        dirs = self._step_dirs()
        return os.path.join(self.directory, dirs[-1][1]) if dirs else None

    def restore_latest(self, template: TrainState) -> TrainState | None:
        path = self.latest()
        return restore_state(path, template) if path else None

    def restore_latest_with_iterator(self, template: TrainState):
        """(state, iterator|None) of the newest checkpoint, or (None, None).
        ``iterator`` = {"epoch", "step"} when the save was mid-epoch."""
        path = self.latest()
        if not path:
            return None, None
        return restore_state(path, template, with_iterator=True)
