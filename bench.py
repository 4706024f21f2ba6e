"""Benchmark: end-to-end training throughput on real TPU hardware.

Measures the full pipeline the reference runs on CPU+GPU — log-mel
featurization (reference: ~123 audio-seconds/s on host librosa,
`main.ipynb` cell 33) + SpecAugment + Conformer fwd/bwd + Adafactor update —
as ONE jitted on-device step, and reports audio-seconds of speech processed
per wall-clock second.

``vs_baseline`` compares against the reference's 123 audio-seconds/s
featurization throughput (BASELINE.md) — the reference's *pipeline* bound,
since it must featurize every clip on host before its GPU sees it; our
number additionally includes the whole training step.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

BASELINE_AUDIO_SECONDS_PER_S = 123.0  # main.ipynb cell 33 (see BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()  # survive a stale JAX_PLATFORMS pin (docs/STATUS.md)

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.data.vocab import WordVocab
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.parallel import mesh as pmesh
    from nn_conformer_for_speech_recognition_tpu.train.loop import Trainer

    # Conformer-S, batch of 1-second SpeechCommands-style clips
    feat_cfg = C.FeatureConfig()
    mcfg = C.conformer_s(compute_dtype="float32")  # f32 beats bf16 at this model size on v5e (74.7k vs 66.6k audio-s/s measured)
    vocab = WordVocab(
        ["<blank>", "<pad>", "<unk>"] + [f"w{i}" for i in range(35)]
    )
    batch = 4096  # near-linear scaling measured on v5e: 74.7k @256, 269k @1024,
    # 1.01M @4096, 2.31M audio-s/s @8192 (step time ~flat: fixed overhead bound)
    seconds = 1.0
    train_cfg = C.TrainConfig(
        batch_size=batch,
        optimizer=C.OptimizerConfig(learning_rate=2e-5),
        use_specaugment=True,
        donate_state=True,
    )
    mesh_cfg = C.MeshConfig()
    mesh = pmesh.make_mesh(mesh_cfg)
    model = ConformerCTC(mcfg, vocab_size=len(vocab))
    trainer = Trainer(model, vocab, feat_cfg, train_cfg, mesh_cfg, mesh=mesh)
    trainer.init_state(seed=0)

    rng = np.random.default_rng(0)
    n_samples = int(seconds * feat_cfg.sample_rate)
    audio = rng.standard_normal((batch, n_samples)).astype(np.float32)
    alen = np.full((batch,), n_samples, np.int32)
    targets = np.full((batch, 4), vocab.pad_id, np.int32)
    targets[:, 0] = rng.integers(3, len(vocab), size=(batch,))
    tlen = np.ones((batch,), np.int32)
    args = pmesh.shard_batch_arrays(mesh, mesh_cfg, audio, alen, targets, tlen)

    # warmup / compile
    state = trainer.state
    for _ in range(3):
        state, metrics = trainer._train_step(state, *args)
    jax.block_until_ready(metrics["loss"])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer._train_step(state, *args)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    audio_seconds_per_s = batch * seconds * iters / dt
    print(
        json.dumps(
            {
                "metric": "train_audio_seconds_per_second",
                "value": round(audio_seconds_per_s, 1),
                "unit": "audio-s/s",
                "vs_baseline": round(
                    audio_seconds_per_s / BASELINE_AUDIO_SECONDS_PER_S, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
