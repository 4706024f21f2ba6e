"""Locate the flash-attention crossover T (VERDICT round-4 item 2).

``config.FLASH_ATTENTION_MIN_T`` routes 'auto' attention between the XLA
einsum rel-pos path and the Pallas flash kernels.  Round 4 proved the old
1024 threshold wrong in part of its range (flash already wins at T=896:
10.2 vs 15.9 ms, results/flashbwd_tpu.json) but never located the actual
crossover between 235 (where XLA clearly wins) and 896.

This bench times ONE Conformer attention sublayer (RelPositionMHSA,
Conformer-M geometry: d_model=256, 4 heads, bf16) fwd+bwd under the
scan/value-fetch marginal protocol (docs/STATUS.md env fact 10) at a grid of
T, per (T, impl) in a fresh subprocess (env fact 8), and derives the
crossover: the smallest measured T where flash beats the einsum path.

Writes results/flash_crossover_tpu.json.
Run: JAX_PLATFORMS='' python examples/flash_crossover_bench.py
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
HEADS = 4
TS = [256, 384, 512, 640, 768, 896]


def run_cell(t: int, impl: str) -> None:
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
        RelPositionMHSA,
    )
    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        adaptive_scan_marginal_ms,
    )

    mod = RelPositionMHSA(
        D_MODEL, HEADS, dropout=0.0, use_relative=True,
        use_pallas=impl == "flash", dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, t, D_MODEL)).astype(np.float32) * 0.3)
    lengths = jnp.asarray(
        np.clip(rng.integers(t // 2, t + 1, size=(B,)), 1, t).astype(np.int32)
    )
    from nn_conformer_for_speech_recognition_tpu.models.conformer import (
        length_mask,
    )

    mask = length_mask(lengths, t)
    params = mod.init({"params": jax.random.key(0)}, x, mask, True)

    def step(x_c):
        def f(x_i):
            out = mod.apply(params, x_i, mask, True)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(f)(x_c)  # full fwd+bwd of the sublayer
        return x_c - 1e-6 * g

    # adaptive N: a one-sublayer fwd+bwd runs ~0.3-1.5 ms, so fixed N=5/25
    # scans yield deltas inside dispatch jitter (VERDICT r4 weak #3)
    ms, details = adaptive_scan_marginal_ms(step, x, target_s=1.0)
    print(json.dumps({
        "T": t, "impl": impl, "ms_fwd_bwd": round(ms, 3),
        "protocol": "scan-marginal", **details,
    }), flush=True)


def main():
    path = pathlib.Path(__file__).resolve().parent.parent / "results" / "flash_crossover_tpu.json"
    rows = {}
    if path.exists():
        rows = {(r["T"], r["impl"]): r
                for r in json.loads(path.read_text())["cells"]}
    env = dict(os.environ)
    for t in TS:
        for impl in ("xla", "flash"):
            if (t, impl) in rows:
                continue
            for attempt in range(4):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--cell",
                     str(t), impl],
                    capture_output=True, text=True, timeout=3600, env=env,
                )
                lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
                if p.returncode == 0 and lines:
                    rows[(t, impl)] = json.loads(lines[-1])
                    break
                sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
                err = p.stdout + p.stderr
                if "deterministic, do not retry" in err:
                    raise RuntimeError("axon plugin not on PYTHONPATH")
                if attempt < 3:
                    time.sleep(60)
            else:
                rows[(t, impl)] = {"T": t, "impl": impl, "error": "failed"}
            _write(path, rows)
            print(rows[(t, impl)], flush=True)
    _write(path, rows)
    print("wrote", path, flush=True)


def _write(path, rows):
    cells = [rows[k] for k in sorted(rows)]
    by_t = {}
    for r in cells:
        if "ms_fwd_bwd" in r and r.get("resolvable", True):
            by_t.setdefault(r["T"], {})[r["impl"]] = r["ms_fwd_bwd"]
    crossover = None
    for t in sorted(by_t):
        d = by_t[t]
        if "xla" in d and "flash" in d and d["flash"] < d["xla"]:
            crossover = t
            break
    out = {
        "geometry": {"B": B, "d_model": D_MODEL, "heads": HEADS,
                     "dtype": "bfloat16", "what": "one RelPositionMHSA "
                     "sublayer fwd+bwd (LN+qkv+rel-pos attention+out_proj)"},
        "cells": cells,
        "crossover_T": crossover,
        "note": "crossover_T = smallest measured T where flash < xla; "
                "config.FLASH_ATTENTION_MIN_T should cite this",
    }
    path.write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--cell":
        run_cell(int(sys.argv[2]), sys.argv[3])
    else:
        main()
