"""Compiled (Mosaic) validation + timing for the blockwise flash backward.

Three phases, each in THIS process (run variants separately for clean perf,
docs/STATUS.md env fact 8):

  parity — grads of the Pallas blockwise backward vs the XLA einsum backward
           at a long-form shape, on the real chip (compiled, not interpret).
  time   — fwd+bwd step time of both backward implementations.
  maxt   — largest T that fits HBM for fwd+bwd with each backward, bisecting
           upward; demonstrates the O(T) vs O(T²) training-memory claim.

Run: JAX_PLATFORMS='' python examples/flashbwd_tpu_check.py <phase>
"""

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nn_conformer_for_speech_recognition_tpu.ops.pallas import attention as A

B, H, DH = 16, 4, 64
SCALE = 1.0 / np.sqrt(DH)


# einsum-backward twin of flash_attention_relpos (same Pallas forward)
@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def flash_relpos_xlabwd(qu, qv, k, v, p, lengths, scale):
    return A._flash_relpos_forward(qu, qv, k, v, p, lengths, scale)


def _fwd(qu, qv, k, v, p, lengths, scale):
    return A._flash_relpos_forward(qu, qv, k, v, p, lengths, scale), (
        qu, qv, k, v, p, lengths,
    )


flash_relpos_xlabwd.defvjp(_fwd, A._far_bwd_xla)


def case(t, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)
    qu, qv, k, v = (mk(B, t, H, DH) for _ in range(4))
    p = mk(2 * t - 1, H, DH)
    lengths = jnp.asarray(
        np.clip(rng.integers(t // 2, t + 1, size=(B,)), 1, t).astype(np.int32)
    )
    return qu, qv, k, v, p, lengths


def loss_fn(attn):
    def f(qu, qv, k, v, p, lengths):
        out = attn(qu, qv, k, v, p, lengths, SCALE)
        return jnp.sum(out**2)

    return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))


def parity(t=896):
    args = case(t)
    # force true-f32 einsums in the XLA reference backward: the TPU default
    # (bf16-pass matmuls) is itself ~1e-3 off; the Pallas kernels accumulate
    # in f32 via preferred_element_type
    with jax.default_matmul_precision("highest"):
        g_pl = loss_fn(A.flash_attention_relpos)(*args)
        g_xla = loss_fn(flash_relpos_xlabwd)(*args)
    report = {}
    for name, a, b in zip(("dqu", "dqv", "dk", "dv", "dp"), g_pl, g_xla):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-9
        report[name] = float(np.abs(a - b).max() / denom)
    print(json.dumps({"phase": "parity", "T": t, "rel_err": report}), flush=True)
    assert all(v < 2e-4 for v in report.values()), report
    return report


def timing(t=896, iters=20):
    """fwd+bwd step time under the scan/value-fetch MARGINAL protocol
    (`utils/timing.scan_marginal_ms`).  The round-2 version scanned
    device-side but barriered a single N with block_until_ready, which does
    not reliably block on the tunnel (docs/STATUS.md env fact 10) — its
    14.1 ms reading was irreconcilable with the full-step trace."""
    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        scan_marginal_ms,
    )

    out = {}
    for name, attn in (("pallas_bwd", A.flash_attention_relpos),
                       ("xla_bwd", flash_relpos_xlabwd)):
        qu, qv, k, v, p, lengths = case(t)

        def step(qu_c):
            def f(qu_i):
                o = attn(qu_i, qv, k, v, p, lengths, SCALE)
                return jnp.sum(o**2)

            g = jax.grad(f)(qu_c)  # runs the full custom bwd
            return qu_c - 1e-6 * g

        ms, _ = scan_marginal_ms(step, qu, n1=5, n2=25)
        out[name] = round(ms, 3)
    print(json.dumps({"phase": "time", "T": t, "ms_fwd_bwd": out,
                      "protocol": "scan-marginal"}), flush=True)
    return out


def maxt(which):
    attn = {"pallas": A.flash_attention_relpos, "xla": flash_relpos_xlabwd}[which]
    ok = 0
    for t in (1024, 2048, 4096, 8192, 16384):
        try:
            g = loss_fn(attn)(*case(t))
            jax.block_until_ready(g)
            ok = t
            print(json.dumps({"phase": "maxt", "impl": which, "T": t, "fits": True}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — OOM is the expected failure
            print(json.dumps({"phase": "maxt", "impl": which, "T": t, "fits": False,
                              "err": type(e).__name__}), flush=True)
            break
    print(json.dumps({"phase": "maxt_final", "impl": which, "max_T": ok}), flush=True)
    return ok


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "parity"
    print("devices:", jax.devices(), flush=True)
    if phase == "parity":
        parity()
    elif phase == "time":
        timing()
    elif phase.startswith("maxt"):
        maxt(sys.argv[2] if len(sys.argv) > 2 else "pallas")
