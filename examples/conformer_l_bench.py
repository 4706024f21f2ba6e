"""Conformer-L flagship measurement on the real TPU chip (VERDICT r2 #5/#4).

BASELINE.json configs[4] is Conformer-L (~100M params); until now the only L
datapoint was a single-sample dtype-crossover note ("bf16 −11%") that was
never investigated.  This bench measures, subprocess-isolated (fresh process
per sample — docs/STATUS.md env fact 8) with N samples per variant:

  l_f32        Pallas stack (flash attn fwd+bwd, fused CTC) + remat, f32
  l_bf16       same, bf16 compute
  l_xla_bf16   XLA einsum attention + scan CTC, bf16, no remat
               (isolates whether any bf16 regression lives in the kernels)

plus a max-length probe: longest 30s-multiple clip length that fits
fwd+bwd at B=16 with remat+flash-backward (the O(T)-memory headline).

Writes results/conformer_l_tpu.json: median/min/max ms/step, audio-s/s, MFU
(197 TFLOP/s bf16 peak — v5e has no native f32 MXU mode, so f32 MFU is
reported against the same peak), and the max-T result.

Run: python examples/conformer_l_bench.py
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SR = 16000
B = 16
V = 1024
L = 100
N1, N2 = 5, 25
REPEATS = 3
SAMPLES = 2

VARIANTS = {
    # round-3 pinned full-Pallas + remat constructions (continuity)
    "l_f32": dict(ctc="pallas", dtype="float32",
                  mk=dict(use_pallas=True, attention_impl="flash",
                          conv_impl="pallas", remat=True)),
    "l_bf16": dict(ctc="pallas", dtype="bfloat16",
                   mk=dict(use_pallas=True, attention_impl="flash",
                           conv_impl="pallas", remat=True)),
    # round-4 shape-aware auto routing (at T=235: XLA attention/conv,
    # Pallas LSTM + CTC), no remat
    "l_auto_bf16": dict(ctc="pallas", dtype="bfloat16",
                        mk=dict(use_pallas=True, remat=False)),
    "l_xla_bf16": dict(ctc="xla", dtype="bfloat16",
                       mk=dict(use_pallas=False, remat=False)),
}


def run_variant(key: str, seconds: float) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.data.vocab import WordVocab
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.ops.features import (
        log_mel_spectrogram,
    )
    from nn_conformer_for_speech_recognition_tpu.train.loop import (
        make_augment_step,
        make_feature_train_step,
    )
    from nn_conformer_for_speech_recognition_tpu.train.optim import make_optimizer
    from nn_conformer_for_speech_recognition_tpu.train.state import TrainState
    from nn_conformer_for_speech_recognition_tpu.utils.flops import (
        TPU_V5E_PEAK_FLOPS,
        train_step_flops,
    )

    import os as _os
    if jax.default_backend() not in ("tpu", "axon") and \
            "/root/.axon_site" not in _os.environ.get("PYTHONPATH", ""):
        raise RuntimeError(
            "misconfigured: axon plugin path not on PYTHONPATH "
            "(deterministic, do not retry) — use "
            "PYTHONPATH=/root/repo:$PYTHONPATH or no override at all"
        )
    assert jax.default_backend() in ("tpu", "axon"), (
        f"TPU benchmark fell back to {jax.default_backend()!r} — the Pallas "
        "kernels would silently run in interpret mode and the numbers would "
        "be meaningless. Fix the tunnel (JAX_PLATFORMS='') and re-run."
    )
    v = VARIANTS[key]
    feat_cfg = C.FeatureConfig()
    mcfg = C.conformer_l(compute_dtype=v["dtype"], **v["mk"])
    vocab = WordVocab(["<blank>", "<pad>", "<unk>"] + [f"w{i}" for i in range(V - 3)])
    model = ConformerCTC(mcfg, vocab_size=len(vocab))

    rng = np.random.default_rng(0)
    n_samp = int(seconds * SR)
    audio = jnp.asarray(rng.standard_normal((B, n_samp)).astype(np.float32) * 0.1)
    alen = jnp.full((B,), n_samp, jnp.int32)
    targets = jnp.asarray(rng.integers(3, len(vocab), size=(B, L)).astype(np.int32))
    tlen = jnp.full((B,), L, jnp.int32)

    feats, flens = log_mel_spectrogram(audio, feat_cfg, alen)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats, flens
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(C.OptimizerConfig(learning_rate=2e-5)),
        rng=jax.random.key(0),
    )
    aug = make_augment_step(feat_cfg, C.SpecAugmentConfig(),
                            use_specaugment=True)
    core = make_feature_train_step(model, vocab.blank_id, ctc_impl=v["ctc"])

    # scan/value-fetch marginal protocol (docs/STATUS.md env fact 10 — the
    # old block_until_ready host loop measured dispatch rate, not compute)
    def full_step(st, _):
        f, fl = aug(st.rng, audio, alen)
        st, metrics = core(st, f, fl, targets, tlen)
        return st, metrics["loss"]

    def make_scan(n):
        @jax.jit
        def scan_fn(st):
            st, losses = jax.lax.scan(full_step, st, None, length=n)
            return st, losses[-1]
        return scan_fn

    scans = {}
    loss_val = None
    compile_s = 0.0
    for n in (N1, N2):
        fn = make_scan(n)
        t0 = time.time()
        _, last = fn(state)
        float(last)  # compile + first run, value fetch
        compile_s += time.time() - t0
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _, last = fn(state)
            loss_val = float(last)
            ts.append(time.perf_counter() - t0)
        scans[n] = min(ts)
    dt = (scans[N2] - scans[N1]) / (N2 - N1)

    frames = feat_cfg.num_frames(n_samp)
    flops = train_step_flops(mcfg, len(vocab), B, frames)
    print(json.dumps({
        "ms_per_step": dt * 1e3,
        "protocol": "scan-marginal",
        "audio_s_per_s": B * seconds / dt,
        "mfu": flops / dt / TPU_V5E_PEAK_FLOPS,
        "compile_s": round(compile_s, 1),
        "n_params": n_params,
        "loss": loss_val,
    }), flush=True)


def _run_sample(argv, env, what, tries=4):
    """Run one fresh-process sample, retrying backend-fallback failures.

    The common cause is environmental (a clobbered PYTHONPATH drops the
    axon plugin — docs/STATUS.md env fact 9); the worker asserts out
    rather than silently benchmarking interpret-mode CPU, and the retry
    covers genuinely transient tunnel hiccups."""
    for attempt in range(tries):
        p = subprocess.run(
            [sys.executable, *argv],
            capture_output=True, text=True, timeout=5400, env=env,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode == 0 and lines:
            return json.loads(lines[-1])
        err_text = p.stdout + p.stderr
        if "deterministic, do not retry" in err_text:
            raise RuntimeError("axon plugin not on PYTHONPATH — fix the environment")
        flake = "fell back to" in err_text
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
        if flake and attempt < tries - 1:
            print(f"{what}: tunnel flake, retrying in 60 s "
                  f"({attempt + 1}/{tries})", flush=True)
            time.sleep(60)
            continue
        # attach the worker output so callers can classify the failure
        # (e.g. the maxfit probe matches an OOM signature, ADVICE r3)
        raise RuntimeError(
            f"{what} failed rc={p.returncode}\n"
            + p.stdout[-4000:] + p.stderr[-4000:])


def main():
    import numpy as np

    out = {"model": "conformer_l", "B": B, "V": V, "L": L,
           "protocol": f"scan-marginal N={N1}->{N2}",
           "samples_per_variant": SAMPLES, "variants": {}}
    env = dict(os.environ)
    for key in VARIANTS:
        samples = []
        for s in range(SAMPLES):
            samples.append(_run_sample(
                [os.path.abspath(__file__), "--variant", key, "--seconds", "30"],
                env, f"variant {key} sample {s}"))
            print(f"{key} sample {s}: {samples[-1]['ms_per_step']:.1f} ms "
                  f"(mfu {samples[-1]['mfu']:.3f})", flush=True)
        ms = sorted(x["ms_per_step"] for x in samples)
        med = float(np.median(ms))
        out["variants"][key] = {
            "ms_per_step_median": round(med, 2),
            "ms_min": round(ms[0], 2), "ms_max": round(ms[-1], 2),
            "audio_s_per_s": round(B * 30.0 / (med / 1e3), 0),
            "mfu": round(float(np.median([x["mfu"] for x in samples])), 4),
            "n_params": samples[0]["n_params"],
        }

    # max clip length that fits fwd+bwd at B=16, bf16 + remat + flash bwd
    max_fit = None
    OOM_SIGNATURES = ("RESOURCE_EXHAUSTED", "Out of memory", "out of memory",
                      "OOM", "Allocator")
    for seconds in (30, 60, 120, 240, 480):
        try:
            r = _run_sample(
                [os.path.abspath(__file__), "--variant", "l_bf16",
                 "--seconds", str(seconds)],
                env, f"maxfit {seconds}s", tries=2)
        except RuntimeError as e:
            # only an OOM signature means "does not fit"; anything else
            # (tunnel flake after retries, timeout) must not silently
            # record a too-small max_fit (ADVICE r3)
            if any(s in str(e) for s in OOM_SIGNATURES):
                print(f"maxfit: {seconds}s clip does NOT fit (B={B})", flush=True)
                break
            raise
        max_fit = {"seconds": seconds, "ms_per_step": round(r["ms_per_step"], 1),
                   "audio_s_per_s": round(r["audio_s_per_s"], 0),
                   "mfu": round(r["mfu"], 4)}
        print(f"maxfit: {seconds}s fits — {max_fit}", flush=True)
    out["max_fit_bf16_remat_B16"] = max_fit

    path = pathlib.Path(__file__).resolve().parent.parent / "results" / "conformer_l_tpu.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print("wrote", path, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--variant":
        run_variant(sys.argv[2], float(sys.argv[4]) if len(sys.argv) >= 5 else 30.0)
    else:
        main()
