"""Benchmark: compute-bound training throughput + MFU on real TPU hardware.

Headline config (VERDICT round-1 item 3 — a compute-bound measurement, not a
dispatch-bound toy): Conformer-M (16 blocks, d=256), 30-second utterances,
B=16, V=1024 word-piece-sized vocab, bf16 compute, Pallas kernels (flash
rel-pos attention fwd+bwd, fused CTC, fused BiLSTM), per-block remat — the
long-form regime where the MXU is actually loaded.  The step is the FULL
pipeline: on-device log-mel featurization + SpecAugment + fwd/bwd +
Adafactor update.

Reported fields:
  value/unit     audio-seconds of speech trained per wall-clock second
  mfu            analytic model FLOPs/step ÷ step time ÷ 197 TFLOP/s
                 (TPU v5e bf16 peak; `utils/flops.py` — remat recompute not
                 credited, so the number is conservative)
  vs_baseline    against the reference's 123 audio-s/s host featurization
                 loop (`main.ipynb` cell 33, BASELINE.md) — its pipeline
                 bound, since it featurizes every clip on host before the
                 GPU sees it.  Apples-to-oranges by nature (the reference
                 publishes no training-throughput number at all); recorded
                 for continuity.

Prints exactly one JSON line.  Run in a FRESH process (docs/STATUS.md env
fact 8: leftover HBM allocations degrade XLA prefetch by 4-5x).
"""

import json
import time

import numpy as np

BASELINE_AUDIO_SECONDS_PER_S = 123.0  # main.ipynb cell 33 (see BASELINE.md)

BATCH = 16
SECONDS = 30.0
VOCAB = 1024
TARGET_LEN = 100


def main():
    import jax

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()  # survive a stale JAX_PLATFORMS pin (docs/STATUS.md)

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.data.vocab import WordVocab
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.parallel import mesh as pmesh
    from nn_conformer_for_speech_recognition_tpu.train.loop import Trainer
    from nn_conformer_for_speech_recognition_tpu.utils.flops import (
        TPU_V5E_PEAK_FLOPS,
        train_step_flops,
    )

    feat_cfg = C.FeatureConfig()
    mcfg = C.conformer_m(
        compute_dtype="bfloat16",  # +42% over f32 for M/30s (docs/STATUS.md)
        use_pallas=jax.default_backend() != "cpu",
        remat=True,
    )
    vocab = WordVocab(
        ["<blank>", "<pad>", "<unk>"] + [f"w{i}" for i in range(VOCAB - 3)]
    )
    train_cfg = C.TrainConfig(
        batch_size=BATCH,
        optimizer=C.OptimizerConfig(learning_rate=2e-5),
        use_specaugment=True,
        donate_state=True,
        ctc_impl="auto",  # fused Pallas CTC on TPU
    )
    mesh_cfg = C.MeshConfig()
    mesh = pmesh.make_mesh(mesh_cfg)
    model = ConformerCTC(mcfg, vocab_size=len(vocab))
    trainer = Trainer(model, vocab, feat_cfg, train_cfg, mesh_cfg, mesh=mesh)
    trainer.init_state(seed=0)

    rng = np.random.default_rng(0)
    n_samples = int(SECONDS * feat_cfg.sample_rate)
    audio = rng.standard_normal((BATCH, n_samples)).astype(np.float32) * 0.1
    alen = np.full((BATCH,), n_samples, np.int32)
    targets = rng.integers(3, len(vocab), size=(BATCH, TARGET_LEN)).astype(np.int32)
    tlen = np.full((BATCH,), TARGET_LEN, np.int32)
    args = pmesh.shard_batch_arrays(mesh, mesh_cfg, audio, alen, targets, tlen)

    # warmup / compile
    state = trainer.state
    for _ in range(3):
        state, metrics = trainer._train_step(state, *args)
    jax.block_until_ready(metrics["loss"])

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer._train_step(state, *args)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    audio_seconds_per_s = BATCH * SECONDS / dt
    frames = feat_cfg.num_frames(n_samples)
    flops = train_step_flops(mcfg, len(vocab), BATCH, frames)
    print(
        json.dumps(
            {
                "metric": "conformer_m_30s_train_audio_seconds_per_second",
                "value": round(audio_seconds_per_s, 1),
                "unit": "audio-s/s",
                "mfu": round(flops / dt / TPU_V5E_PEAK_FLOPS, 4),
                "ms_per_step": round(dt * 1e3, 2),
                "flops_per_step": flops,
                "vs_baseline": round(
                    audio_seconds_per_s / BASELINE_AUDIO_SECONDS_PER_S, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
