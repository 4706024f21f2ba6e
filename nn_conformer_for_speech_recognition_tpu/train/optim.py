"""Optimizers and schedules.

``make_optimizer`` reproduces the reference's Adafactor semantics
(`lib/standard/runner.py:36`: HF ``Adafactor(lr, beta1=0.9,
scale_parameter=False, relative_step=False)``) on top of optax, plus a
transformer inverse-sqrt warmup schedule for the larger configs.
"""

from __future__ import annotations

import optax

from nn_conformer_for_speech_recognition_tpu.config import OptimizerConfig


def make_schedule(cfg: OptimizerConfig):
    if cfg.schedule == "constant" or cfg.warmup_steps == 0:
        return cfg.learning_rate
    if cfg.schedule == "transformer":
        warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
        decay = lambda step: cfg.learning_rate * (cfg.warmup_steps ** 0.5) * (
            (step + cfg.warmup_steps) ** -0.5
        )
        return optax.join_schedules([warmup, decay], [cfg.warmup_steps])
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    lr = make_schedule(cfg)
    if cfg.name == "adafactor":
        tx = optax.adafactor(
            learning_rate=lr,
            multiply_by_parameter_scale=False,  # scale_parameter=False
            momentum=cfg.momentum,  # beta1=0.9
            clipping_threshold=cfg.clip_threshold,
            weight_decay_rate=cfg.weight_decay or None,
        )
    elif cfg.name == "adam":
        # pretraining path uses Adam(lr=3e-5) (`unused_lib/pretraining/runner.py:40`)
        tx = optax.adam(lr)
    elif cfg.name == "adamw":
        tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.name!r}")
    return tx
