"""Conformer-L maxfit probe (VERDICT round-4 item 9).

The O(T) training-memory claim for the flash backward rested on a round-2
kernel micro-probe (one attention layer runs to T=16384 where einsum OOMs at
4096).  This probes the FULL Conformer-L model: fwd+bwd+Adafactor at B=16,
sweeping clip seconds per arm until the first OOM —

  * ``noremat_auto``: shape-aware routing, no remat (the fast short-form
    configuration; auto picks einsum attention below FLASH_ATTENTION_MIN_T
    and flash above);
  * ``remat_flash``: per-block remat + forced flash attention (the long-form
    memory configuration).

Where a point fits, its step time is measured with the scan/value-fetch
marginal protocol (n1=3, n2=10 — L steps are tens/hundreds of ms, so small
scans already resolve).  One fresh subprocess per point (docs/STATUS.md env
fact 8); an OOM (RESOURCE_EXHAUSTED) is recorded, not fatal.

Writes results/l_maxfit_tpu.json.
Run: JAX_PLATFORMS='' python examples/l_maxfit_probe.py
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

B = 16
V = 1024
L_TGT = 100
SR = 16000
# Both arms pin lstm_impl='xla': the probe measures the ENCODER memory
# boundary (flash-bwd O(T) vs einsum, remat on/off).  The Pallas LSTM
# kernel VMEM-caps first at L sizes — 19.77M scoped vs the 16M limit at
# B=16/240 s (T'=1875), recorded on the first run of this probe — which
# would otherwise mask the encoder behavior at every point >=240 s; the
# product escape hatch for long-form decoding is exactly this
# lstm_impl='xla' routing knob.
ARMS = {
    "noremat_auto": dict(mk=dict(use_pallas=True, remat=False,
                                 lstm_impl="xla")),
    "remat_flash": dict(mk=dict(use_pallas=True, attention_impl="flash",
                                remat=True, lstm_impl="xla")),
}
SECONDS = [120.0, 240.0, 480.0, 960.0]


def run_point(arm: str, seconds: float) -> None:
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

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.data.vocab import WordVocab
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.ops.features import (
        log_mel_spectrogram,
    )
    from nn_conformer_for_speech_recognition_tpu.train.loop import (
        make_feature_train_step,
    )
    from nn_conformer_for_speech_recognition_tpu.train.optim import make_optimizer
    from nn_conformer_for_speech_recognition_tpu.train.state import TrainState
    from nn_conformer_for_speech_recognition_tpu.utils.flops import (
        TPU_V5E_PEAK_FLOPS,
        train_step_flops,
    )
    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        scan_marginal_ms,
    )

    feat_cfg = C.FeatureConfig()
    mcfg = C.conformer_l(compute_dtype="bfloat16", **ARMS[arm]["mk"])
    vocab = WordVocab(["<blank>", "<pad>", "<unk>"] + [f"w{i}" for i in range(V - 3)])
    model = ConformerCTC(mcfg, vocab_size=len(vocab))

    rng = np.random.default_rng(0)
    n_samp = int(seconds * SR)
    audio = jnp.asarray(rng.standard_normal((B, n_samp)).astype(np.float32) * 0.1)
    alen = jnp.full((B,), n_samp, jnp.int32)
    targets = jnp.asarray(rng.integers(3, len(vocab), size=(B, L_TGT)).astype(np.int32))
    tlen = jnp.full((B,), L_TGT, jnp.int32)

    frames = feat_cfg.num_frames(n_samp)
    t_enc = mcfg.subsampled_length(frames)
    feats, flens = log_mel_spectrogram(audio, feat_cfg, alen)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats, flens
    )
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(C.OptimizerConfig(learning_rate=2e-5)),
        rng=jax.random.key(0),
    )
    core = make_feature_train_step(model, vocab.blank_id, ctc_impl="pallas")

    def step(st):
        st, metrics = core(st, feats, flens, targets, tlen)
        return st

    ms, details = scan_marginal_ms(step, state, n1=3, n2=10)
    flops = train_step_flops(mcfg, len(vocab), B, frames)
    print(json.dumps({
        "arm": arm, "B": B, "seconds": seconds, "t_encoder": t_enc,
        "ms_per_step": round(ms, 2),
        "audio_s_per_s": round(B * seconds / (ms / 1e3), 0),
        "mfu": round(flops / (ms / 1e3) / TPU_V5E_PEAK_FLOPS, 4),
        "attention_impl": mcfg.resolved_attention_impl(t_enc),
        "remat": mcfg.remat,
        "fits": True,
        **details,
    }), flush=True)


def main():
    path = pathlib.Path(__file__).resolve().parent.parent / "results" / "l_maxfit_tpu.json"
    rows = {}
    if path.exists():
        rows = {(r["arm"], r["seconds"]): r
                for r in json.loads(path.read_text())["points"]}
    env = dict(os.environ)
    for arm in ARMS:
        for seconds in SECONDS:
            if (arm, seconds) in rows:
                if not rows[(arm, seconds)].get("fits", False):
                    break
                continue
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--point", arm,
                 str(seconds)],
                capture_output=True, text=True, timeout=7200, env=env,
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode == 0 and lines:
                rows[(arm, seconds)] = json.loads(lines[-1])
            else:
                err = p.stdout + p.stderr
                # the XLA allocation-failure dump can be longer than the
                # captured tail, cutting off the "RESOURCE_EXHAUSTED"
                # header — its buffer-table markers identify it just as
                # well ("Allocation type: HLO temp" ranked-buffer lines
                # only appear in allocation-failure reports)
                oom = "RESOURCE_EXHAUSTED" in err or "Out of memory" in err \
                    or "OOM" in err or "Allocation type: HLO temp" in err \
                    or "Largest program allocations" in err
                rows[(arm, seconds)] = {
                    "arm": arm, "B": B, "seconds": seconds, "fits": False,
                    "oom": oom,
                    "error": None if oom else (err[-500:] or f"rc={p.returncode}"),
                }
                sys.stderr.write(err[-2000:])
            _write(path, rows)
            print(rows[(arm, seconds)], flush=True)
            if not rows[(arm, seconds)]["fits"]:
                break  # longer clips in this arm will not fit either
    _write(path, rows)
    print("wrote", path, flush=True)


def _write(path, rows):
    points = [rows[k] for k in sorted(rows)]
    summary = {}
    for arm in ARMS:
        fit = [r["seconds"] for r in points if r["arm"] == arm and r.get("fits")]
        nofit = [r["seconds"] for r in points
                 if r["arm"] == arm and not r.get("fits", True)]
        summary[arm] = {
            "max_seconds_fit": max(fit) if fit else None,
            "first_oom_seconds": min(nofit) if nofit else None,
        }
    path.write_text(json.dumps({
        "what": "Conformer-L full train step (fwd+bwd+Adafactor) maxfit, "
                "B=16, bf16, scan-marginal where it fits",
        "points": points, "summary": summary,
    }, indent=1) + "\n")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--point":
        run_point(sys.argv[2], float(sys.argv[3]))
    else:
        main()
