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
import orbax.checkpoint as ocp

from nn_conformer_for_speech_recognition_tpu.train.state import TrainState


def _to_save(state: TrainState):
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
    }


def save_state(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_save(state), force=True)


def restore_state(path: str, template: TrainState) -> TrainState:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, _to_save(template))
    return template.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        rng=jax.random.wrap_key_data(restored["rng"]),
    )


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

    def save(self, state: TrainState, metric: float | None = None) -> str:
        step = int(state.step)
        path = os.path.join(self.directory, f"step_{step:08d}")
        save_state(path, state)
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
