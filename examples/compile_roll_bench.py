"""Compile-roll experiment: is the 11.2 ms fast mode a compile-time roll?

Round-4 evidence: the identical per-step two-dispatch train step measured
11.2 ms/step (hostloop value-fetch marginal) in one fresh process and
33-38 ms in others (`results/timing_audit_tpu.json` m_auto_bf16 vs fence
variant; round-5's `unrolled_bench` re-measured 38.6 with a device trace
showing busy 33.4 ms/step).  Round-5's straight-line experiment ruled out
the while-loop: a Python-unrolled 8-step program traces at the same
~33 ms/step with the same per-op inflation (FFN dot fusions ~0.13 ms vs a
~0.025 ms roofline).  Two hypotheses remain:

  A. XLA's TPU backend compiles a 3x better executable on some rolls
     (autotuning/layout/fusion nondeterminism) — then the optimized-HLO
     fingerprints of fast and slow rolls differ, and the fix is to pin the
     fast executable (`jax.experimental.serialize_executable`).
  B. The roll is runtime state (HBM layout, tunnel/tenant contention) —
     fingerprints identical, op self-times inflate uniformly, and no
     compile-side pin can help; bench medians are the honest number.

Method: N fresh subprocesses, persistent compile cache DISABLED (each roll
re-compiles), AOT-compile the exact bench construction (augment + core),
hostloop value-fetch marginal at 20/100 steps, sha256 of the optimized HLO,
10-step device trace → top op self-times.  A roll under 20 ms/step
serializes its executable for pinning and keeps its HLO text for diffing.

Writes results/compile_roll_tpu.json.
Run: JAX_PLATFORMS='' python examples/compile_roll_bench.py [N]
"""

import hashlib
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SR = 16000
B = 16
V = 1024
L = 100
SECONDS = 30.0
FAST_MS = 20.0

RESULTS = pathlib.Path(__file__).resolve().parent.parent / "results"


def run_roll(i: int) -> None:
    import jax

    # force a fresh backend compile this process: the whole point is to
    # re-roll XLA's compilation, not to replay the cached executable
    jax.config.update("jax_enable_compilation_cache", False)

    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    if jax.default_backend() not in ("tpu", "axon"):
        if "/root/.axon_site" not in os.environ.get("PYTHONPATH", ""):
            raise RuntimeError("misconfigured: axon plugin path not on "
                               "PYTHONPATH (deterministic, do not retry)")
        raise RuntimeError(f"fell back to {jax.default_backend()!r}")

    from examples.step_trace import device_self_times, load_trace_events
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

    feat_cfg = C.FeatureConfig()
    mcfg = C.conformer_m(compute_dtype="bfloat16", use_pallas=True, remat=False)
    vocab = WordVocab(["<blank>", "<pad>", "<unk>"] + [f"w{i}" for i in range(V - 3)])
    model = ConformerCTC(mcfg, vocab_size=len(vocab))

    rng = np.random.default_rng(0)
    n_samp = int(SECONDS * SR)
    audio = jnp.asarray(rng.standard_normal((B, n_samp)).astype(np.float32) * 0.1)
    alen = jnp.full((B,), n_samp, jnp.int32)
    targets = jnp.asarray(rng.integers(3, len(vocab), size=(B, L)).astype(np.int32))
    tlen = jnp.full((B,), L, jnp.int32)

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
    augment = make_augment_step(feat_cfg, C.SpecAugmentConfig(), True)
    core = make_feature_train_step(model, vocab.blank_id, ctc_impl="pallas")

    t0 = time.perf_counter()
    aug_c = jax.jit(augment).lower(state.rng, audio, alen).compile()
    core_c = jax.jit(core, donate_argnums=(0,)).lower(
        state, feats, flens, targets, tlen
    ).compile()
    compile_s = time.perf_counter() - t0

    hlo = core_c.as_text()
    fingerprint = hashlib.sha256(hlo.encode()).hexdigest()[:16]

    def host_chain(st, iters):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(iters):
            f, fl = aug_c(st.rng, audio, alen)
            st, metrics = core_c(st, f, fl, targets, tlen)
        _ = float(metrics["loss"])  # value-fetch barrier
        return time.perf_counter() - t0, st

    _, st = host_chain(state, 3)  # warm
    t20, st = host_chain(st, 20)
    t100, st = host_chain(st, 100)
    marginal_ms = (t100 - t20) / 80 * 1e3

    # 10-step device trace: per-op self times for fast-vs-slow diffing
    trace_dir = tempfile.mkdtemp(prefix=f"roll{i}_")
    with jax.profiler.trace(trace_dir):
        _, st = host_chain(st, 10)
    self_us = device_self_times(load_trace_events(trace_dir))
    ops = [
        {"op": name[:80], "ms_per_step": round(us / 1e3 / 10, 4)}
        for name, us in self_us.most_common(200)
        if us > 0 and not (name.startswith("jit_") or "(" in name or name.isdigit())
    ]
    busy = sum(o["ms_per_step"] for o in ops)

    out = {
        "roll": i,
        "compile_s": round(compile_s, 1),
        "ms_per_step_hostloop_marginal": round(marginal_ms, 3),
        "trace_busy_ms_per_step": round(busy, 2),
        "hlo_sha256_16": fingerprint,
        "hlo_bytes": len(hlo),
        "top_ops": ops[:12],
    }

    if marginal_ms < FAST_MS:
        # pin the fast roll: serialized executable + its HLO for diffing
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(core_c)
        (RESULTS / f"fast_step_exec_roll{i}.bin").write_bytes(payload)
        (RESULTS / f"fast_step_hlo_roll{i}.txt").write_text(hlo)
        out["fast_executable_saved"] = f"results/fast_step_exec_roll{i}.bin"
    print(json.dumps(out), flush=True)


def main(n_rolls: int):
    path = RESULTS / "compile_roll_tpu.json"
    rolls = []
    if path.exists():
        rolls = json.loads(path.read_text())["rolls"]
    env = dict(os.environ)
    start = len(rolls)
    for i in range(start, start + n_rolls):
        for attempt in range(3):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--roll", str(i)],
                stdout=subprocess.PIPE, text=True, timeout=7200, env=env,
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode == 0 and lines:
                rolls.append(json.loads(lines[-1]))
                break
            if attempt < 2:
                time.sleep(60)
        else:
            rolls.append({"roll": i, "error": "failed"})
        ms = [r["ms_per_step_hostloop_marginal"] for r in rolls
              if "ms_per_step_hostloop_marginal" in r]
        fps = sorted({r["hlo_sha256_16"] for r in rolls if "hlo_sha256_16" in r})
        path.write_text(json.dumps({
            "what": "N fresh-process compiles of the bench step, persistent "
                    "cache disabled; hostloop value-fetch marginal + "
                    "optimized-HLO fingerprint per roll",
            "rolls": rolls,
            "ms_sorted": sorted(round(m, 1) for m in ms),
            "distinct_hlo_fingerprints": fps,
        }, indent=1) + "\n")
        print(f"roll {i}: {rolls[-1].get('ms_per_step_hostloop_marginal')} ms "
              f"fp={rolls[-1].get('hlo_sha256_16')}", flush=True)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--roll":
        run_roll(int(sys.argv[2]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
