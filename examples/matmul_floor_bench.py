"""What matmul rate can this chip actually sustain right now?

Round-5 discriminator: the train step's dot fusions run ~5x their roofline
share in every program form measured (FFN bucket 14.4 ms vs ~2 ms,
results/unrolled_bench_tpu.json), and re-rolling the compile reproduces the
same executable and the same ~34 ms step (results/compile_roll_tpu.json).
Either (a) the device/tunnel cannot sustain peak right now (virtualization /
co-tenant HBM contention — then a bare matmul chain is ALSO slow), or (b)
the step's program structure (layouts, fusion choices, small-op mix) is at
fault — then a bare matmul chain hits near-peak and the gap is attackable
with program-level work.

Measures scan/value-fetch-marginal time of chained matmuls at:
  * the step's FFN geometry: (B*T'=3760, 256) x (256, 1024) bf16
  * the same with M padded to a lane multiple (3840)
  * a big square (4096^3) bf16 — the MXU's best case
  * f32 square for the multi-pass comparison
Reports achieved TFLOP/s and fraction of the 197 TFLOP/s v5e bf16 peak.

Run: JAX_PLATFORMS='' python examples/matmul_floor_bench.py
Writes results/matmul_floor_tpu.json.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CASES = [
    # name, M, K, N, dtype, n_chain (dots per scan iteration)
    ("ffn_shape_bf16", 3760, 256, 1024, "bfloat16", 8),
    ("ffn_shape_padded_bf16", 3840, 256, 1024, "bfloat16", 8),
    ("square4k_bf16", 4096, 4096, 4096, "bfloat16", 2),
    ("square2k_f32", 2048, 2048, 2048, "float32", 2),
]


def main():
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

    from nn_conformer_for_speech_recognition_tpu.utils.flops import (
        TPU_V5E_PEAK_FLOPS,
    )
    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        adaptive_scan_marginal_ms,
    )

    rng = np.random.default_rng(0)
    rows = {}
    for name, m, k, n, dtype, n_chain in CASES:
        dt = jnp.dtype(dtype)
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(dt)
        ws = [
            jnp.asarray(rng.standard_normal((k if i == 0 else n, n))
                        .astype(np.float32)).astype(dt) * 0.02
            for i in range(n_chain)
        ]

        def step(c):
            y = c
            for w in ws:
                y = jnp.dot(y, w, preferred_element_type=dt)
            # fold back to the carry's (m, k) shape so iterations chain
            return c * 0.999 + jnp.sum(y, axis=1, keepdims=True) * 1e-9

        ms, det = adaptive_scan_marginal_ms(step, x, target_s=1.0)
        flops_per_iter = 2 * m * n * (k + (n_chain - 1) * n)
        tflops = flops_per_iter / (ms / 1e3) / 1e12
        rows[name] = {
            "M": m, "K": k, "N": n, "dtype": dtype, "dots_per_iter": n_chain,
            "ms_per_iter": round(ms, 4),
            "us_per_dot": round(ms * 1e3 / n_chain, 2),
            "achieved_tflops": round(tflops, 1),
            "fraction_of_peak": round(tflops * 1e12 / TPU_V5E_PEAK_FLOPS, 3),
            "delta_s": det["delta_s"], "n1": det["n1"], "n2": det["n2"],
            "resolvable": det["resolvable"],
        }
        print(name, json.dumps(rows[name]), flush=True)

    path = pathlib.Path(__file__).resolve().parent.parent / "results" / "matmul_floor_tpu.json"
    path.write_text(json.dumps(rows, indent=1) + "\n")
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
