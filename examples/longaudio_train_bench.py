"""RETIRED (round 4): this bench used the block_until_ready barrier that
measures dispatch rate, not compute (docs/STATUS.md env fact 10). The
kernel-stack comparison it performed is superseded by the
examples/timing_audit.py variant matrix (m_bf16 / m_flash_noremat /
m_xla / m_auto) under the trusted scan-marginal protocol.

Long-form audio train-step matrix on the real TPU chip.

Reproduces (and extends with the fused Pallas CTC) the measurement recorded
in docs/STATUS.md: Conformer-M, 30 s utterances, B=16, word-piece-sized
vocab (V=1024), L=100 targets — the regime where the true-flash rel-pos
attention and per-block remat pay off.  Variants:

  xla            — XLA einsum attention, no remat, lax.scan CTC
  pallas+remat   — Pallas flash attention + depthwise conv, remat, scan CTC
  pallas+remat+plctc — same plus the fused Pallas CTC kernel

Writes results/longaudio_train_tpu.json and prints one line per variant.
Run: python examples/longaudio_train_bench.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nn_conformer_for_speech_recognition_tpu import config as C
from nn_conformer_for_speech_recognition_tpu.data.vocab import WordVocab
from nn_conformer_for_speech_recognition_tpu.ops.features import log_mel_spectrogram
from nn_conformer_for_speech_recognition_tpu.train.loop import (
    make_augment_step,
    make_feature_train_step,
)
from nn_conformer_for_speech_recognition_tpu.train.optim import make_optimizer
from nn_conformer_for_speech_recognition_tpu.train.state import TrainState

SR = 16000
SECONDS = 30.0
B = 16
V = 1024
L = 100
ITERS = 20


def build(use_pallas: bool, remat: bool, ctc_impl: str, dtype: str = "float32"):
    feat_cfg = C.FeatureConfig()
    mcfg = C.conformer_m(use_pallas=use_pallas, remat=remat, compute_dtype=dtype)
    vocab = WordVocab(["<blank>", "<pad>", "<unk>"] + [f"w{i}" for i in range(V - 3)])
    model_vocab = len(vocab)

    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC

    model = ConformerCTC(mcfg, vocab_size=model_vocab)
    rng = np.random.default_rng(0)
    n_samp = int(SECONDS * SR)
    audio = jnp.asarray(rng.standard_normal((B, n_samp)).astype(np.float32) * 0.1)
    alen = jnp.full((B,), n_samp, jnp.int32)
    targets = jnp.asarray(rng.integers(3, model_vocab, size=(B, L)).astype(np.int32))
    tlen = jnp.full((B,), L, jnp.int32)

    feats, flens = log_mel_spectrogram(audio, feat_cfg, alen)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats, flens
    )
    tx = make_optimizer(C.OptimizerConfig(learning_rate=2e-5))
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
        rng=jax.random.key(0),
    )
    # two-dispatch form, as the Trainer runs it (deterministic core schedule)
    aug = jax.jit(make_augment_step(feat_cfg, C.SpecAugmentConfig(),
                                    use_specaugment=True))
    core = jax.jit(make_feature_train_step(model, vocab.blank_id,
                                           ctc_impl=ctc_impl),
                   donate_argnums=(0,))

    def step(state, audio, alen, targets, tlen):
        feats, fl = aug(state.rng, audio, alen)
        return core(state, feats, fl, targets, tlen)

    return step, state, (audio, alen, targets, tlen)


def bench(name, use_pallas, remat, ctc_impl, dtype="float32"):
    t0 = time.time()
    step, state, args = build(use_pallas, remat, ctc_impl, dtype)
    state, metrics = step(state, *args)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, *args)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    thr = B * SECONDS / dt
    print(f"{name:24s} {dt*1e3:8.2f} ms/step  {thr:10.0f} audio-s/s  "
          f"(compile {compile_s:.0f}s, loss {float(metrics['loss']):.3f})",
          flush=True)
    return {"ms_per_step": round(dt * 1e3, 2), "audio_s_per_s": round(thr, 0)}


VARIANTS = {
    "xla": ("xla", False, False, "xla"),
    "pallas_remat": ("pallas+remat", True, True, "xla"),
    "pallas_remat_plctc": ("pallas+remat+plctc", True, True, "pallas"),
    "xla_bf16": ("xla bf16", False, False, "xla", "bfloat16"),
    "pallas_bf16": ("pallas+remat+plctc bf16", True, True, "pallas", "bfloat16"),
}


def main():
    # Each variant runs in a FRESH subprocess: leftover HBM allocations from
    # a previous variant degrade XLA's latency-hiding prefetch and the same
    # program measures 4-5× slower (14.7 ms fresh vs 62.6 ms run third —
    # docs/STATUS.md env fact 8).
    import subprocess
    import sys as _sys

    results = {}
    for key in VARIANTS:
        out = subprocess.run(
            [_sys.executable, __file__, "--variant", key],
            capture_output=True, text=True, timeout=2400,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise RuntimeError(f"variant {key} failed")
        results[key] = json.loads(line[-1])
    outp = pathlib.Path(__file__).resolve().parent.parent / "results" / "longaudio_train_tpu.json"
    outp.write_text(json.dumps({"B": B, "seconds": SECONDS, "V": V, "L": L,
                                "model": "conformer_m", "variants": results}, indent=1) + '\n')
    print("wrote", outp)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--variant":
        key = sys.argv[2]
        import jax as _jax
        print("devices:", _jax.devices(), flush=True)
        r = bench(*VARIANTS[key])
        print(json.dumps(r), flush=True)
    else:
        main()
