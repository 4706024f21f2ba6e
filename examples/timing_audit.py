"""Audit the benchmark timing methodology on the axon TPU tunnel.

Motivation: the Conformer-L bench produced 8.9 ms/step "measurements" with
MFU 1.8 — physically impossible (the analytic bf16 roofline floor for that
step is ~16 ms, and the variant ran f32).  docs/STATUS.md already warns that
naive per-call host timing through the tunnel reads ~0.05 ms "steps"; this
shows the chained-host-loop + block_until_ready methodology (bench.py and
the round-2/3 headlines) can ALSO undercount: if block_until_ready returns
before remote execution completes, the wall clock only covers dispatch.

Trustworthy protocol used here (adopted by bench.py in round 4 — its worker
now times the same jitted-scan construction with the value-fetch marginal
barrier; the round-2/3 headlines measured a block_until_ready host loop that
undercounted ~10x because block_until_ready can return before remote
execution completes on the axon tunnel):

  1. The full train step (augment -> core -> Adafactor) is wrapped in ONE
     jitted ``lax.scan`` of length N — all N steps execute device-side with
     no host round-trips.
  2. The timing barrier is a VALUE FETCH of the final loss scalar
     (``float(...)``): a value cannot be materialized on host before the
     device produced it, so the measurement covers all device work, whatever
     block_until_ready does.
  3. ms/step = marginal cost (t(N2) - t(N1)) / (N2 - N1) over two scan
     lengths: dispatch overhead and the scalar-fetch latency are identical
     in both and cancel exactly.

For comparison it also reports the legacy host-loop number for the same
step.  One variant per fresh process (env fact 8).

Run: JAX_PLATFORMS='' python examples/timing_audit.py [--variant KEY]
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
N1, N2 = 10, 50
REPEATS = 3

VARIANTS = {
    # the round-3 headline construction: every op Pallas + remat (pinned
    # explicitly now that ModelConfig has per-op 'auto' routing)
    "m_bf16": dict(model="m", ctc="pallas", dtype="bfloat16",
                   mk=dict(use_pallas=True, attention_impl="flash",
                           conv_impl="pallas", remat=True)),
    # round-4 candidate headline: shape-aware auto routing (at T=235 that is
    # XLA attention + XLA depthwise + Pallas LSTM), no remat
    "m_auto_bf16": dict(model="m", ctc="pallas", dtype="bfloat16",
                        mk=dict(use_pallas=True, remat=False)),
    # same, with the product's augment/core optimization_barrier fence inside
    # the scan body (make_train_step's fused form): without it the scanned
    # program can compile the pathological interleaved schedule (35.6 ms
    # scan-device vs 11.2 ms two-dispatch hostloop marginal, round 4)
    "m_auto_fence_bf16": dict(model="m", ctc="pallas", dtype="bfloat16",
                              barrier=True,
                              mk=dict(use_pallas=True, remat=False)),
    # unrolled scan: the while-loop body pays ~0.1 ms per op on this device
    # (step_trace m_auto: every fusion ~3-7x its dispatched-program cost);
    # unrolling amortises the per-iteration overhead across k steps
    "m_auto_unroll8_bf16": dict(model="m", ctc="pallas", dtype="bfloat16",
                                unroll=8,
                                mk=dict(use_pallas=True, remat=False)),
    # isolate the remat cost from the kernel routing
    "m_flash_noremat_bf16": dict(model="m", ctc="pallas", dtype="bfloat16",
                                 mk=dict(use_pallas=True,
                                         attention_impl="flash",
                                         conv_impl="pallas", remat=False)),
    # everything XLA (the no-Pallas floor; fused Pallas CTC kept — measured
    # 0.5 ms of the step)
    "m_xla_bf16": dict(model="m", ctc="pallas", dtype="bfloat16",
                       mk=dict(use_pallas=False, remat=False)),
    # dtype story for M under the trusted protocol (round-1's "+42% bf16"
    # was measured with the broken barrier)
    "m_auto_f32": dict(model="m", ctc="pallas", dtype="float32",
                       mk=dict(use_pallas=True, remat=False)),
    "l_f32": dict(model="l", ctc="pallas", dtype="float32",
                  mk=dict(use_pallas=True, attention_impl="flash",
                          conv_impl="pallas", remat=True)),
    "l_bf16": dict(model="l", ctc="pallas", dtype="bfloat16",
                   mk=dict(use_pallas=True, attention_impl="flash",
                           conv_impl="pallas", remat=True)),
    "l_auto_bf16": dict(model="l", ctc="pallas", dtype="bfloat16",
                        mk=dict(use_pallas=True, remat=False)),
    "l_xla_bf16": dict(model="l", ctc="xla", dtype="bfloat16",
                       mk=dict(use_pallas=False, remat=False)),
}


def run_variant(key: str, seconds: float = 30.0) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    assert jax.default_backend() in ("tpu", "axon"), (
        f"timing audit needs the TPU backend, got {jax.default_backend()!r}"
    )

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

    v = VARIANTS[key]
    feat_cfg = C.FeatureConfig()
    factory = C.conformer_m if v["model"] == "m" else C.conformer_l
    mcfg = factory(compute_dtype=v["dtype"], **v["mk"])
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
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(C.OptimizerConfig(learning_rate=2e-5)),
        rng=jax.random.key(0),
    )
    augment = make_augment_step(feat_cfg, C.SpecAugmentConfig(), True)
    core = make_feature_train_step(model, vocab.blank_id, ctc_impl=v["ctc"])

    def full_step(st, _):
        f, fl = augment(st.rng, audio, alen)
        if v.get("barrier"):
            # scheduling fence between augment and core (docs/STATUS.md env
            # fact 7b / make_train_step)
            f = jax.lax.optimization_barrier(f)
        st, metrics = core(st, f, fl, targets, tlen)
        return st, metrics["loss"]

    def make_scan(n):
        @jax.jit
        def scan_fn(st):
            st, losses = jax.lax.scan(full_step, st, None, length=n,
                                      unroll=v.get("unroll", 1))
            return st, losses[-1]
        return scan_fn

    def timed_fetch(fn, st):
        t0 = time.perf_counter()
        st2, last = fn(st)
        val = float(last)  # value fetch: cannot complete early
        return time.perf_counter() - t0, val

    out = {"variant": key, "B": B, "seconds": seconds}
    scans = {}
    for n in (N1, N2):
        fn = make_scan(n)
        t_compile, _ = timed_fetch(fn, state)  # compile + first run
        ts = [timed_fetch(fn, state)[0] for _ in range(REPEATS)]
        scans[n] = min(ts)
        out[f"scan{n}_s"] = round(min(ts), 4)
        out[f"scan{n}_compile_s"] = round(t_compile, 1)
    marginal = (scans[N2] - scans[N1]) / (N2 - N1)
    out["ms_per_step_device"] = round(marginal * 1e3, 3)

    # host-loop methodology on the same (separately jitted) dispatches —
    # the production execution pattern (two dispatches per step).  Timed
    # two ways: the legacy single-N block_until_ready protocol, and a
    # marginal (t(N2)-t(N1))/(N2-N1) with a VALUE-FETCH barrier that cannot
    # be fooled by weak block semantics.
    aug_j = jax.jit(augment)
    core_j = jax.jit(core, donate_argnums=(0,))

    def host_chain(st, iters):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(iters):
            f, fl = aug_j(st.rng, audio, alen)
            st, metrics = core_j(st, f, fl, targets, tlen)
        loss_val = float(metrics["loss"])  # value-fetch barrier
        return time.perf_counter() - t0, st, loss_val

    _, st, _ = host_chain(state, 3)  # warmup
    t20, st, _ = host_chain(st, 20)
    t100, st, loss_val = host_chain(st, 100)
    out["ms_per_step_hostloop"] = round(t20 / 20 * 1e3, 3)
    out["ms_per_step_hostloop_marginal"] = round((t100 - t20) / 80 * 1e3, 3)

    frames = feat_cfg.num_frames(n_samp)
    flops = train_step_flops(mcfg, len(vocab), B, frames)
    out["mfu_device"] = round(flops / marginal / TPU_V5E_PEAK_FLOPS, 4)
    out["roofline_floor_ms"] = round(flops / TPU_V5E_PEAK_FLOPS * 1e3, 2)
    out["audio_s_per_s_device"] = round(B * seconds / marginal, 0)
    out["loss"] = loss_val
    print(json.dumps(out), flush=True)


def run_trainer_variant(seconds: float = 30.0) -> None:
    """The EXACT bench.py construction (Trainer + NamedSharding-committed
    args), timed with the value-fetch marginal protocol — if this matches
    bench.py's number, the headline survives the bulletproof methodology."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    assert jax.default_backend() in ("tpu", "axon")

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
    mcfg = C.conformer_m(compute_dtype="bfloat16", use_pallas=True, remat=True)
    vocab = WordVocab(["<blank>", "<pad>", "<unk>"] + [f"w{i}" for i in range(V - 3)])
    train_cfg = C.TrainConfig(
        batch_size=B, optimizer=C.OptimizerConfig(learning_rate=2e-5),
        use_specaugment=True, donate_state=True, ctc_impl="auto",
    )
    mesh_cfg = C.MeshConfig()
    mesh = pmesh.make_mesh(mesh_cfg)
    model = ConformerCTC(mcfg, vocab_size=len(vocab))
    trainer = Trainer(model, vocab, feat_cfg, train_cfg, mesh_cfg, mesh=mesh)
    trainer.init_state(seed=0)

    rng = np.random.default_rng(0)
    n_samp = int(seconds * SR)
    audio = rng.standard_normal((B, n_samp)).astype(np.float32) * 0.1
    alen = np.full((B,), n_samp, np.int32)
    targets = rng.integers(3, len(vocab), size=(B, L)).astype(np.int32)
    tlen = np.full((B,), L, np.int32)
    args = pmesh.shard_batch_arrays(mesh, mesh_cfg, audio, alen, targets, tlen)

    def chain(st, iters):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(iters):
            st, metrics = trainer._train_step(st, *args)
        loss_val = float(metrics["loss"])
        return time.perf_counter() - t0, st, loss_val

    _, st, _ = chain(trainer.state, 3)
    t20, st, _ = chain(st, 20)
    t100, st, loss_val = chain(st, 100)
    frames = feat_cfg.num_frames(n_samp)
    flops = train_step_flops(mcfg, len(vocab), B, frames)
    marginal = (t100 - t20) / 80
    print(json.dumps({
        "variant": "m_trainer_bf16", "B": B, "seconds": seconds,
        "ms_per_step_device": None,
        "roofline_floor_ms": round(flops / TPU_V5E_PEAK_FLOPS * 1e3, 2),
        "ms_per_step_hostloop": round(t20 / 20 * 1e3, 3),
        "ms_per_step_hostloop_marginal": round(marginal * 1e3, 3),
        "mfu_marginal": round(flops / marginal / TPU_V5E_PEAK_FLOPS, 4),
        "loss": loss_val,
    }), flush=True)


def main(keys):
    env = dict(os.environ)
    path = pathlib.Path(__file__).resolve().parent.parent / "results" / "timing_audit_tpu.json"
    # merge into prior results keyed by variant (don't discard other variants)
    results = {r["variant"]: r for r in json.loads(path.read_text())} \
        if path.exists() else {}
    for key in keys:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--variant", key],
            capture_output=True, text=True, timeout=5400, env=env,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not lines:
            sys.stderr.write(p.stdout[-3000:] + p.stderr[-3000:])
            print(f"variant {key} FAILED", flush=True)
            continue
        r = json.loads(lines[-1])
        results[key] = r
        print(f"{key}: scan-device {r.get('ms_per_step_device')} ms/step "
              f"(floor {r['roofline_floor_ms']} ms) "
              f"vs hostloop {r['ms_per_step_hostloop']} ms "
              f"(marginal {r['ms_per_step_hostloop_marginal']} ms)", flush=True)
        path.write_text(json.dumps(list(results.values()), indent=1) + "\n")
    print("wrote", path, flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None,
                    help="run ONE variant inline (used by the subprocess fan-out)")
    ap.add_argument("variants", nargs="*",
                    help="variants to run via subprocesses (default: all)")
    ns = ap.parse_args()
    if ns.variant:
        if ns.variant == "m_trainer_bf16":
            run_trainer_variant()
        else:
            run_variant(ns.variant)
    else:
        bad = [k for k in ns.variants
               if k not in VARIANTS and k != "m_trainer_bf16"]
        if bad:
            ap.error(f"unknown variants: {bad}; known: "
                     f"{sorted(VARIANTS) + ['m_trainer_bf16']}")
        main(ns.variants or list(VARIANTS))
