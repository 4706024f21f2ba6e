"""Dissect the step's 6.95 ms attention bucket (round-5 follow-up).

After the hardware-RNG dropout fix the Conformer-M step's largest bucket
is the XLA einsum rel-pos attention (6.95 of 23.5 ms vs a ~1 ms FLOPs
roofline; results/step_trace_tpu.json m_auto_bf16).  This probe
reproduces the load standalone — a 16-sublayer residual stack of
RelPositionMHSA (einsum path, Conformer-M geometry, bf16, T=235, fwd+bwd
with param grads) — and varies one suspect per fresh-subprocess cell:

  full          product construction (rel-pos, rbg dropout 0.1)
  nodrop        dropout off — the residual mask cost
  norel         use_relative=False — the rel-pos machinery's share
                (bd einsum on (B,H,T,2T-1) f32 + pad/reshape rel_shift)

The irreducible part is O(T^2) f32 score traffic: ~6 materialisations of
(B,H,235,235) f32 per sublayer fwd+bwd ~= 0.2 ms/sublayer of pure HBM at
8.1e11 B/s -> ~3 ms for the stack; flash does not help at this T
(results/flash_crossover_tpu.json: flash loses below 768).

Writes results/attention_probe_tpu.json.
Run: JAX_PLATFORMS='' python examples/attention_probe.py
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B = 16
T = 235
D_MODEL = 256
HEADS = 4
N_LAYERS = 16
DROPOUT = 0.1

CELLS = {
    "full": dict(dropout=True, rel=True),
    "nodrop": dict(dropout=False, rel=True),
    "norel": dict(dropout=True, rel=False),
}


def run_cell(name: str) -> None:
    spec = CELLS[name]
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    if jax.default_backend() not in ("tpu", "axon"):
        if "/root/.axon_site" not in os.environ.get("PYTHONPATH", ""):
            raise RuntimeError("misconfigured: axon plugin path not on "
                               "PYTHONPATH (deterministic, do not retry)")
        raise RuntimeError(f"fell back to {jax.default_backend()!r}")

    from nn_conformer_for_speech_recognition_tpu.models.conformer import (
        RelPositionMHSA,
        length_mask,
    )
    from nn_conformer_for_speech_recognition_tpu.utils.rng import dropout_key
    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        scan_marginal_ms,
    )

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, mask, deterministic):
            for i in range(N_LAYERS):
                x = x + RelPositionMHSA(
                    D_MODEL, HEADS,
                    dropout=DROPOUT if spec["dropout"] else 0.0,
                    use_relative=spec["rel"], use_pallas=False,
                    dtype=jnp.bfloat16, name=f"mhsa_{i}",
                )(x, mask, deterministic)
            return x

    mod = Stack()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, T, D_MODEL)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    lengths = jnp.asarray(
        np.clip(rng.integers(T // 2, T + 1, size=(B,)), 1, T).astype(np.int32)
    )
    mask = length_mask(lengths, T)
    deterministic = not spec["dropout"]
    params = mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, mask, deterministic,
    )["params"]
    base_key = jax.random.key(2)

    def step(carry):
        p, i = carry
        sub = dropout_key(jax.random.fold_in(base_key, i))  # rbg on TPU

        def loss_fn(p_):
            out = mod.apply(
                {"params": p_}, x, mask, deterministic,
                rngs={} if deterministic else {"dropout": sub},
            )
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss_fn)(p)
        p = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
        return p, i + 1

    ms, details = scan_marginal_ms(step, (params, jnp.int32(0)), n1=5, n2=25)
    print(json.dumps({"cell": name, **spec, "ms": round(ms, 3), **details}),
          flush=True)


def main():
    path = (pathlib.Path(__file__).resolve().parent.parent
            / "results" / "attention_probe_tpu.json")
    rows = {}
    if path.exists():
        rows = {r["cell"]: r for r in json.loads(path.read_text())["cells"]}
    env = dict(os.environ)
    for name in CELLS:
        if name in rows and "ms" in rows[name]:
            continue
        for attempt in range(3):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cell", name],
                capture_output=True, text=True, timeout=3600, env=env,
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode == 0 and lines:
                rows[name] = json.loads(lines[-1])
                break
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
            if "deterministic, do not retry" in p.stdout + p.stderr:
                raise RuntimeError("axon plugin not on PYTHONPATH")
            if attempt < 2:
                time.sleep(60)
        else:
            rows[name] = {"cell": name, "error": "failed"}
        _write(path, rows)
        print(rows[name], flush=True)
    _write(path, rows)
    print("wrote", path, flush=True)


def _write(path, rows):
    path.write_text(json.dumps({
        "geometry": {"B": B, "T": T, "d_model": D_MODEL, "heads": HEADS,
                     "n_layers": N_LAYERS, "dtype": "bfloat16",
                     "what": "16-sublayer residual RelPositionMHSA stack "
                             "(einsum path) fwd+bwd(params) — the step's "
                             "attention load in isolation"},
        "cells": [rows[k] for k in rows],
    }, indent=1))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--cell":
        run_cell(sys.argv[2])
    else:
        main()
