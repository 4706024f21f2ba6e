"""RETIRED (round 4): this bench used the block_until_ready barrier that
measures dispatch rate, not compute (docs/STATUS.md env fact 10), and
its conclusions were falsified by the scan-protocol re-measurement
(l_f32 vs l_bf16 in results/timing_audit_tpu.json - the '-11% bf16
regression' never existed). Use examples/timing_audit.py variants
instead.

bf16-vs-f32 crossover measurement on the real TPU chip.

docs/STATUS.md records that f32 beats bf16 for Conformer-S on 1 s clips
(bf16 conversion overhead dominates a fixed-overhead-bound step).  This
sweeps model size × clip length × dtype on the full train step so the
crossover point is measured, not guessed; results drive the
`compute_dtype` guidance in config.py docstrings.

Run: python examples/dtype_crossover_bench.py
Writes results/dtype_crossover_tpu.json.
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
from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
from nn_conformer_for_speech_recognition_tpu.ops.features import log_mel_spectrogram
from nn_conformer_for_speech_recognition_tpu.train.loop import make_train_step
from nn_conformer_for_speech_recognition_tpu.train.optim import make_optimizer
from nn_conformer_for_speech_recognition_tpu.train.state import TrainState

SR = 16000
ITERS = 15

CASES = [
    # (name, factory, batch, seconds, vocab, target_len)
    ("s_1s_B1024", C.conformer_s, 1024, 1.0, 38, 4),
    ("m_30s_B16", C.conformer_m, 16, 30.0, 1024, 100),
    ("l_30s_B8", C.conformer_l, 8, 30.0, 1024, 100),
]


def bench(name, factory, batch, seconds, vsz, tlen_val, dtype):
    mcfg = factory(compute_dtype=dtype, remat=(seconds > 10))
    vocab = WordVocab(["<blank>", "<pad>", "<unk>"] + [f"w{i}" for i in range(vsz - 3)])
    model = ConformerCTC(mcfg, vocab_size=len(vocab))
    feat_cfg = C.FeatureConfig()
    rng = np.random.default_rng(0)
    n_samp = int(seconds * SR)
    audio = jnp.asarray(rng.standard_normal((batch, n_samp)).astype(np.float32) * 0.1)
    alen = jnp.full((batch,), n_samp, jnp.int32)
    targets = jnp.asarray(
        rng.integers(3, len(vocab), size=(batch, tlen_val)).astype(np.int32)
    )
    tlen = jnp.full((batch,), tlen_val, jnp.int32)

    feats, flens = log_mel_spectrogram(audio, feat_cfg, alen)
    vs = jax.jit(model.init)(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats, flens
    )
    tx = make_optimizer(C.OptimizerConfig(learning_rate=2e-5))
    state = TrainState.create(params=vs["params"],
                              batch_stats=vs.get("batch_stats", {}),
                              tx=tx, rng=jax.random.key(0))
    step = jax.jit(
        make_train_step(model, feat_cfg, C.SpecAugmentConfig(), vocab.blank_id,
                        use_specaugment=True),
        donate_argnums=(0,),
    )
    state, m = step(state, audio, alen, targets, tlen)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, audio, alen, targets, tlen)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    thr = batch * seconds / dt
    print(f"{name:12s} {dtype:9s} {dt*1e3:9.2f} ms/step {thr:12.0f} audio-s/s",
          flush=True)
    return thr


def main():
    # fresh subprocess per measurement: in-process leftovers skew step time
    # 4-5x (docs/STATUS.md env fact 8)
    import subprocess

    results = {}
    for name, *_ in CASES:
        row = {}
        for dtype in ("float32", "bfloat16"):
            out = subprocess.run(
                [sys.executable, __file__, "--case", name, dtype],
                capture_output=True, text=True, timeout=2400,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(out.stdout[-2000:], out.stderr[-2000:])
                raise RuntimeError(f"{name}/{dtype} failed")
            row[dtype] = json.loads(lines[-1])["audio_s_per_s"]
        row["bf16_speedup"] = round(row["bfloat16"] / row["float32"], 3)
        results[name] = row
        print(name, row, flush=True)
    out = pathlib.Path(__file__).resolve().parent.parent / "results" / "dtype_crossover_tpu.json"
    out.write_text(json.dumps(results, indent=1) + '\n')
    print("wrote", out)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--case":
        case = next(c for c in CASES if c[0] == sys.argv[2])
        name, factory, batch, seconds, vsz, tl = case
        thr = bench(name, factory, batch, seconds, vsz, tl, sys.argv[3])
        print(json.dumps({"audio_s_per_s": round(thr, 0)}), flush=True)
    else:
        main()
