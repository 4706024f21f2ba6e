"""Benchmark: compute-bound training throughput + MFU on real TPU hardware.

Headline config (VERDICT round-1 item 3 — a compute-bound measurement, not a
dispatch-bound toy): Conformer-M (16 blocks, d=256), 30-second utterances,
B=16, V=1024 word-piece-sized vocab, bf16 compute, Pallas kernels (flash
rel-pos attention fwd+bwd, fused CTC, fused BiLSTM), per-block remat — the
long-form regime where the MXU is actually loaded.  The step is the FULL
pipeline: on-device log-mel featurization + SpecAugment + fwd/bwd +
Adafactor update.

Statistical protocol (VERDICT round-2 item 3): XLA's schedule is
nondeterministic across processes on this TPU (docs/STATUS.md env fact 8 —
the identical program compiled in different processes lands fast or slow
schedules, a ~15% spread), so a single-sample headline is not a benchmark.
``main`` re-executes itself in ``BENCH_SAMPLES`` (default 5) FRESH
subprocesses — each gets its own process, empty HBM, and schedule roll — and
reports the MEDIAN with min/max.  The persistent compile cache makes samples
after the first cheap; Mosaic programs miss the cache, so every sample still
re-rolls the schedule dice the way real runs do.

Reported fields:
  value/unit     audio-seconds of speech trained per wall-clock second
                 (median across samples)
  mfu            analytic model FLOPs/step ÷ median step time ÷ 197 TFLOP/s
                 (TPU v5e bf16 peak; `utils/flops.py` — remat recompute not
                 credited, so the number is conservative)
  ms_per_step / ms_min / ms_max / samples   the distribution
  vs_baseline    against the reference's 123 audio-s/s host featurization
                 loop (`main.ipynb` cell 33, BASELINE.md) — its pipeline
                 bound, since it featurizes every clip on host before the
                 GPU sees it.  Apples-to-oranges by nature (the reference
                 publishes no training-throughput number at all); recorded
                 for continuity.

Prints exactly one JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_AUDIO_SECONDS_PER_S = 123.0  # main.ipynb cell 33 (see BASELINE.md)

BATCH = 16
SECONDS = 30.0
VOCAB = 1024
TARGET_LEN = 100


def run_worker():
    """One fresh-process sample: build the trainer, time the step, print a
    single JSON line (consumed by the parent)."""
    import jax

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()  # survive a stale JAX_PLATFORMS pin (docs/STATUS.md)
    if jax.default_backend() not in ("tpu", "axon"):
        # A silent CPU fallback would run Pallas in interpret mode and
        # record meaningless numbers as a TPU benchmark — fail loudly.
        raise RuntimeError(
            f"bench requires the TPU backend, got {jax.default_backend()!r}"
        )

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
    import jax as _jax

    state = trainer.state
    for _ in range(3):
        state, metrics = trainer._train_step(state, *args)
    _jax.block_until_ready(metrics["loss"])

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer._train_step(state, *args)
    _jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    frames = feat_cfg.num_frames(n_samples)
    flops = train_step_flops(mcfg, len(vocab), BATCH, frames)
    print(json.dumps({
        "ms_per_step": dt * 1e3,
        "flops_per_step": flops,
        "peak_flops": TPU_V5E_PEAK_FLOPS,
    }))


def main():
    if os.environ.get("BENCH_WORKER"):
        run_worker()
        return

    n_samples = int(os.environ.get("BENCH_SAMPLES", "5"))
    env = dict(os.environ, BENCH_WORKER="1")
    results = []
    for i in range(n_samples):
        # fresh process per sample: leftover HBM allocations degrade XLA's
        # latency-hiding prefetch 4-5x (docs/STATUS.md env fact 8), and each
        # process re-rolls the schedule
        for attempt in range(4):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            if proc.returncode == 0:
                break
            sys.stderr.write(proc.stdout + "\n" + proc.stderr + "\n")
            # the axon relay intermittently fails TPU discovery; the worker
            # raises rather than silently benchmarking CPU — retry fresh
            if "bench requires the TPU backend" in proc.stdout + proc.stderr \
                    and attempt < 3:
                time.sleep(60)
                continue
            raise RuntimeError(f"bench worker {i} failed rc={proc.returncode}")
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        sys.stderr.write(
            f"[bench] sample {i + 1}/{n_samples}: "
            f"{results[-1]['ms_per_step']:.2f} ms/step\n"
        )

    ms = sorted(r["ms_per_step"] for r in results)
    median_ms = float(np.median(ms))
    flops = results[0]["flops_per_step"]
    peak = results[0]["peak_flops"]
    dt = median_ms / 1e3
    audio_seconds_per_s = BATCH * SECONDS / dt
    print(json.dumps({
        "metric": "conformer_m_30s_train_audio_seconds_per_second",
        "value": round(audio_seconds_per_s, 1),
        "unit": "audio-s/s",
        "mfu": round(flops / dt / peak, 4),
        "ms_per_step": round(median_ms, 2),
        "ms_min": round(ms[0], 2),
        "ms_max": round(ms[-1], 2),
        "samples": len(ms),
        "flops_per_step": flops,
        "vs_baseline": round(audio_seconds_per_s / BASELINE_AUDIO_SECONDS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
