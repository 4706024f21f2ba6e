"""Round-5 step-time attack: measure the step WITHOUT the while-loop tax.

VERDICT round-4 item 1: the shipped scan-marginal headline is 34.1 ms/step,
but the builder's own artifacts prove the hardware runs the same step ~11 ms:
the dispatched two-dispatch host chain measured 11.2 ms marginal on good
process rolls (`results/timing_audit_tpu.json` m_auto_bf16), and the trace of
the SCANNED program shows every fusion 3-7x its dispatched-program cost
(~0.1 ms per op of while-body overhead, `results/step_trace_tpu.json`).

Hypothesis: the ~35 ms is a property of the ``lax.scan``/while wrapper on
this device, not of the step.  A STRAIGHT-LINE program — one jit whose body
is a Python-unrolled chain of K full steps, no while loop anywhere — should
run at the dispatched per-op speed while still being timeable with the only
trustworthy protocol (single dispatch + value fetch + marginal over two K).

This script measures, in one fresh process per variant:

  1. ``unrolled-marginal``: jitted straight-line programs at K1 and K2 steps,
     value-fetch barrier, marginal (t(K2)-t(K1))/(K2-K1).  Same trust model
     as the scan protocol (one dispatch, chained carries, value fetch — the
     device must execute all K steps before the loss scalar exists) but with
     zero while-loop overhead.
  2. A ``jax.profiler`` device trace of the K2 program: device-busy,
     scheduler-gap, and SPAN (first->last device event) per step, plus the
     per-module bucket attribution — the independent cross-check (STATUS env
     fact 10 protocol (b)).
  3. The production two-dispatch host chain under a device trace: span per
     step tells us what the per-step path really costs on device this roll,
     independent of tunnel dispatch latency (the hostloop marginal is an
     upper bound contaminated by dispatch; the trace span is the truth).

Output: results/unrolled_bench_tpu.json.

Run: JAX_PLATFORMS='' python examples/unrolled_bench.py [--k1 3 --k2 12]
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from examples.step_trace import (  # noqa: E402
    bucket_of,
    device_self_times,
    hlo_name_to_opname,
    load_trace_events,
)

SR = 16000
B = 16
V = 1024
L = 100
SECONDS = 30.0
REPEATS = 5


def device_span_us(events):
    """Wall span of device activity: (min start -> max end) over device pids,
    excluding envelope/meta events."""
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    t0, t1 = None, None
    for e in events:
        if e.get("ph") == "X" and e["pid"] in dev_pids and e.get("dur", 0) > 0:
            s, f = e["ts"], e["ts"] + e["dur"]
            t0 = s if t0 is None or s < t0 else t0
            t1 = f if t1 is None or f > t1 else t1
    return 0.0 if t0 is None else t1 - t0


def trace_device_stats(trace_dir, hlo_text=None, n_steps=1):
    events = load_trace_events(trace_dir)
    self_us = device_self_times(events)
    names = hlo_name_to_opname(hlo_text) if hlo_text else {}
    import collections
    buckets = collections.Counter()
    gaps_us = 0.0
    total_us = 0.0
    for name, us in self_us.items():
        if us <= 0:
            continue
        if name.startswith("jit_") or "(" in name or name.isdigit():
            gaps_us += us
            continue
        total_us += us
        buckets[bucket_of(name, names.get(name, ""))] += us
    span = device_span_us(events)
    return {
        "device_busy_ms_per_step": round(total_us / 1e3 / n_steps, 3),
        "device_gap_ms_per_step": round(gaps_us / 1e3 / n_steps, 3),
        "device_span_ms_per_step": round(span / 1e3 / n_steps, 3),
        "buckets_ms_per_step": {
            k: round(v / 1e3 / n_steps, 3)
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])
        },
    }


def run_inline(k1: int, k2: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    assert jax.default_backend() in ("tpu", "axon"), (
        f"needs the TPU backend, got {jax.default_backend()!r}"
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

    feat_cfg = C.FeatureConfig()
    # bench.py's exact headline construction (m_auto_fence_bf16)
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

    def full_step(st):
        f, fl = augment(st.rng, audio, alen)
        f = jax.lax.optimization_barrier(f)
        st, metrics = core(st, f, fl, targets, tlen)
        return st, metrics["loss"]

    def make_unrolled(k):
        @jax.jit
        def prog(st):
            loss = None
            for _ in range(k):  # straight line: no while loop anywhere
                st, loss = full_step(st)
            return st, loss
        return prog

    def timed_fetch(fn, st):
        t0 = time.perf_counter()
        _, last = fn(st)
        val = float(last)
        return time.perf_counter() - t0, val

    out = {"variant": f"m_auto_fence_bf16_unrolled_{k1}_{k2}",
           "B": B, "seconds": SECONDS, "k1": k1, "k2": k2}

    runs = {}
    loss_val = None
    for k in (k1, k2):
        fn = make_unrolled(k)
        for attempt in range(3):
            try:
                t0 = time.perf_counter()
                _, loss_val = timed_fetch(fn, state)
                out[f"unrolled{k}_compile_s"] = round(time.perf_counter() - t0, 1)
                break
            except Exception as e:  # transient remote-compile tunnel flake
                print(f"[unrolled] k={k} attempt {attempt} failed: {e}",
                      file=sys.stderr, flush=True)
                if attempt == 2:
                    raise
                time.sleep(60)
        print(f"[unrolled] k={k} compile+first {out[f'unrolled{k}_compile_s']}s",
              file=sys.stderr, flush=True)
        ts = [timed_fetch(fn, state)[0] for _ in range(REPEATS)]
        runs[k] = min(ts)
        out[f"unrolled{k}_s"] = round(min(ts), 4)
        out[f"unrolled{k}_s_all"] = [round(t, 4) for t in ts]
    marginal = (runs[k2] - runs[k1]) / (k2 - k1)
    out["ms_per_step_unrolled_marginal"] = round(marginal * 1e3, 3)

    # --- trace the K2 straight-line program (protocol (b) cross-check) ---
    compiled = make_unrolled(k2).lower(state).compile()
    hlo_text = compiled.as_text()
    _, last = compiled(state)
    float(last)  # warm
    trace_dir = tempfile.mkdtemp(prefix="unrolled_trace_")
    with jax.profiler.trace(trace_dir):
        _, last = compiled(state)
        float(last)
    stats = trace_device_stats(trace_dir, hlo_text, n_steps=k2)
    out["unrolled_trace"] = stats
    print("[unrolled] trace:", json.dumps(stats), file=sys.stderr, flush=True)

    # --- the production two-dispatch path: hostloop marginal + device trace ---
    aug_j = jax.jit(augment)
    core_j = jax.jit(core, donate_argnums=(0,))

    def host_chain(st, iters):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(iters):
            f, fl = aug_j(st.rng, audio, alen)
            st, metrics = core_j(st, f, fl, targets, tlen)
        _ = float(metrics["loss"])
        return time.perf_counter() - t0, st

    _, st = host_chain(state, 3)  # compile (persistent-cache hit) + warm
    t20, st = host_chain(st, 20)
    t100, st = host_chain(st, 100)
    out["ms_per_step_hostloop_marginal"] = round((t100 - t20) / 80 * 1e3, 3)

    n_trace = 10
    trace_dir2 = tempfile.mkdtemp(prefix="dispatched_trace_")
    with jax.profiler.trace(trace_dir2):
        _, st = host_chain(st, n_trace)
    stats2 = trace_device_stats(trace_dir2, None, n_steps=n_trace)
    out["dispatched_trace"] = stats2
    print("[dispatched] trace:", json.dumps(stats2), file=sys.stderr, flush=True)

    frames = feat_cfg.num_frames(n_samp)
    flops = train_step_flops(mcfg, len(vocab), B, frames)
    out["roofline_floor_ms"] = round(flops / TPU_V5E_PEAK_FLOPS * 1e3, 2)
    out["mfu_unrolled"] = round(flops / marginal / TPU_V5E_PEAK_FLOPS, 4)
    out["loss"] = loss_val
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=8)
    ap.add_argument("--inline", action="store_true")
    ns = ap.parse_args()
    if ns.inline:
        run_inline(ns.k1, ns.k2)
        return
    # stderr inherits (live progress in the parent log); stdout carries the
    # result JSON
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--inline",
         "--k1", str(ns.k1), "--k2", str(ns.k2)],
        stdout=subprocess.PIPE, text=True, timeout=10800,
        env=dict(os.environ),
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("{\"variant\"")]
    if p.returncode != 0 or not lines:
        raise SystemExit(f"worker failed rc={p.returncode}")
    result = json.loads(lines[-1])
    path = pathlib.Path(__file__).resolve().parent.parent / "results" / "unrolled_bench_tpu.json"
    existing = []
    if path.exists():
        existing = [r for r in json.loads(path.read_text())
                    if r.get("variant") != result["variant"]]
    existing.append(result)
    path.write_text(json.dumps(existing, indent=1) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
