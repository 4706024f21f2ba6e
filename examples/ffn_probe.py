"""Isolate the FFN bucket's 14.5 ms (VERDICT round-5 item 1, route finding).

The shipped Conformer-M step attributes 14.5 ms to the FFN sublayers
against a ~2 ms roofline share (results/step_trace_tpu.json m_auto_bf16),
with individual wgrad fusions at ~140 us vs a 39 us isolated floor
(results/matmul_floor_tpu.json).  Round-5 experiments killed the two prior
hypotheses (loop-construct overhead: examples/unrolled_bench.py; compile
roll: examples/compile_roll_bench.py).  Remaining suspects, each isolated
here as a fresh-subprocess cell measuring a 32-module FFN stack (exactly
the step's 16 blocks x 2 half-FFNs, Conformer-M geometry, bf16) fwd+bwd
with parameter gradients under the scan/value-fetch marginal protocol:

  t235            the step's ragged T' (does non-(8,128) time break tiling?)
  t240 / t256     sublane-aligned and lane-aligned padded time
  t235_nodrop     dropout RNG (threefry) cost + fusion-breaking
  t235_dotsonly   LayerNorm's f32 reductions (no LN, no dropout)
  t235_fwd        bwd-only inflation (fwd pass alone)

Roofline context: 32 modules x (fwd 2 dots + bwd 4 dots) x 2*M*K*N
(M=B*T, K=256, N=1024) ~= 1.9 ms at 197 TFLOP/s bf16 for T=235.

Writes results/ffn_probe_tpu.json.
Run: JAX_PLATFORMS='' python examples/ffn_probe.py
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B = 16
D_MODEL = 256
FFN_DIM = 1024
N_MODULES = 32
DROPOUT = 0.1

CELLS = {
    "t235": dict(t=235, dropout=True, ln=True, bwd=True),
    "t240": dict(t=240, dropout=True, ln=True, bwd=True),
    "t256": dict(t=256, dropout=True, ln=True, bwd=True),
    "t235_nodrop": dict(t=235, dropout=False, ln=True, bwd=True),
    "t235_dotsonly": dict(t=235, dropout=False, ln=False, bwd=True),
    "t235_fwd": dict(t=235, dropout=True, ln=True, bwd=False),
    # second pass (dropout identified as ~11 of the 14 ms): does the TPU
    # hardware RNG path (rbg keys -> XLA RngBitGenerator instead of ~20
    # VPU ops/element of threefry) recover the no-dropout rate?
    "t235_rbg": dict(t=235, dropout=True, ln=True, bwd=True, rbg=True),
    "t235_nodrop_r2": dict(t=235, dropout=False, ln=True, bwd=True,
                           adaptive=True),
    "t235_rbg_fwd": dict(t=235, dropout=True, ln=True, bwd=False, rbg=True),
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
            raise RuntimeError(
                "misconfigured: axon plugin path not on PYTHONPATH "
                "(deterministic, do not retry)"
            )
        raise RuntimeError(
            f"TPU benchmark fell back to {jax.default_backend()!r}"
        )

    from nn_conformer_for_speech_recognition_tpu.models.conformer import (
        FeedForwardModule,
    )
    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        adaptive_scan_marginal_ms,
        scan_marginal_ms,
    )

    t = spec["t"]

    class DotsOnly(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic):
            h = nn.Dense(FFN_DIM, dtype=jnp.bfloat16)(x)
            h = nn.silu(h)
            return nn.Dense(D_MODEL, dtype=jnp.bfloat16)(h)

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic):
            for i in range(N_MODULES):
                if spec["ln"]:
                    m = FeedForwardModule(
                        D_MODEL, FFN_DIM, DROPOUT if spec["dropout"] else 0.0,
                        dtype=jnp.bfloat16, name=f"ffn_{i}",
                    )
                else:
                    m = DotsOnly(name=f"ffn_{i}")
                x = x + 0.5 * m(x, deterministic)
            return x

    mod = Stack()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, t, D_MODEL)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    deterministic = not spec["dropout"]
    params = mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, deterministic,
    )["params"]

    # closed over; carry holds a plain counter.  'rbg' keys draw their bits
    # from XLA RngBitGenerator (TPU hardware RNG) instead of threefry
    base_key = jax.random.key(2, impl="rbg" if spec.get("rbg") else None)
    if spec["bwd"]:
        def step(carry):
            p, i = carry
            sub = jax.random.fold_in(base_key, i)

            def loss_fn(p_):
                out = mod.apply(
                    {"params": p_}, x, deterministic,
                    rngs={} if deterministic else {"dropout": sub},
                )
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

            g = jax.grad(loss_fn)(p)
            p = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
            return p, i + 1
        carry0 = (params, jnp.int32(0))
    else:
        def step(carry):
            x_c, i = carry
            sub = jax.random.fold_in(base_key, i)
            out = mod.apply(
                {"params": params}, x_c, deterministic,
                rngs={} if deterministic else {"dropout": sub},
            )
            return x_c + 1e-6 * out.astype(x_c.dtype), i + 1
        carry0 = (x, jnp.int32(0))

    if spec.get("adaptive"):
        ms, details = adaptive_scan_marginal_ms(step, carry0, target_s=1.0)
    else:
        ms, details = scan_marginal_ms(step, carry0, n1=5, n2=25)
    m = B * t
    dots = 6 if spec["bwd"] else 2  # fwd 2, bwd dgrad+wgrad per dot
    flops = N_MODULES * dots * 2 * m * D_MODEL * FFN_DIM
    print(json.dumps({
        "cell": name, **{k: v for k, v in spec.items()},
        "ms": round(ms, 3),
        "eff_tflops": round(flops / (ms / 1e3) / 1e12, 1),
        "roofline_ms": round(flops / 197e12 * 1e3, 2),
        **details,
    }), flush=True)


def main():
    path = (pathlib.Path(__file__).resolve().parent.parent
            / "results" / "ffn_probe_tpu.json")
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
    out = {
        "geometry": {
            "B": B, "d_model": D_MODEL, "ffn_dim": FFN_DIM,
            "n_modules": N_MODULES, "dtype": "bfloat16",
            "what": "32-module half-residual FFN stack fwd+bwd(params), "
                    "the step's full FFN load in isolation",
        },
        "cells": [rows[k] for k in rows],
    }
    path.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--cell":
        run_cell(sys.argv[2])
    else:
        main()
