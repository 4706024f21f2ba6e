"""Attribute device time of the flagship train step per op class.

VERDICT round-3 item 2: the Conformer-M/30s/B=16 bf16 step measures ~69-70
ms under the trusted scan/value-fetch protocol, against a 4.69 ms analytic
roofline floor — where do the other ~64 ms go?

Method (all in ONE process so the compile cache applies):
  1. Build the EXACT timing-audit construction (`examples/timing_audit.py`
     ``run_variant``): augment → core train step, wrapped in one jitted
     ``lax.scan`` of N steps.
  2. AOT-compile via ``jit(...).lower(...).compile()`` and keep the
     optimized HLO text (``.as_text()``) — it carries per-instruction
     ``metadata={op_name="jit(scan_fn)/.../block_3/mhsa/..."}`` which maps
     every fused op back to the flax module that produced it.
  3. Execute once to warm, then execute under ``jax.profiler.trace`` with a
     value-fetch barrier.
  4. Parse the trace: per-(pid,tid) SELF time of every device event
     (children subtracted), joined against the HLO metadata, bucketed by
     module (attention / ffn / conv / bilstm / ctc / featurize+SA /
     optimizer / copies / ...), divided by N steps.

Output: results/step_trace_tpu.json + a human-readable table on stdout.

Run: JAX_PLATFORMS='' python examples/step_trace.py [--variant m_bf16]
"""

import collections
import gzip
import json
import os
import pathlib
import re
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from examples.timing_audit import VARIANTS  # noqa: E402

SR = 16000
B = 16
V = 1024
L = 100
N_STEPS = 10

# ---------------------------------------------------------------------------
# trace parsing
# ---------------------------------------------------------------------------


def load_trace_events(trace_dir: str):
    """Newest trace.json.gz under trace_dir → list of events."""
    paths = sorted(pathlib.Path(trace_dir).rglob("*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    return data["traceEvents"]


def device_self_times(events):
    """Per-event-name SELF device time (µs): child spans subtracted.

    Complete events ('X') nest; for each (pid, tid) we sweep by start time
    with a stack.  Each event charges its full duration to itself and
    subtracts it from its innermost still-open parent — every span is
    debited from exactly one parent, so totals are exclusive times.
    """
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    by_tid = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e["pid"] in dev_pids and e.get("dur", 0) >= 0:
            by_tid[(e["pid"], e["tid"])].append(e)

    self_us = collections.Counter()
    for evs in by_tid.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (name, end_ts)
        for e in evs:
            ts, dur, name = e["ts"], e["dur"], e["name"]
            while stack and stack[-1][1] <= ts + 1e-6:
                stack.pop()
            self_us[name] += dur
            if stack:
                self_us[stack[-1][0]] -= dur
            stack.append((name, ts + dur))
    return self_us


# ---------------------------------------------------------------------------
# HLO metadata join
# ---------------------------------------------------------------------------

_META_RE = re.compile(
    r"%?([\w\.\-]+) = .*?metadata={[^}]*op_name=\"([^\"]*)\""
)
_CALLTARGET_RE = re.compile(
    r"%?([\w\.\-]+) = .*?custom_call_target=\"([^\"]*)\""
)


def hlo_name_to_opname(hlo_text: str):
    names = {}
    for m in _META_RE.finditer(hlo_text):
        names.setdefault(m.group(1), m.group(2))
    for m in _CALLTARGET_RE.finditer(hlo_text):
        names.setdefault(m.group(1), "custom:" + m.group(2))
    return names


BUCKETS = [
    ("attention", re.compile(r"/mhsa/|rel_attention|flash|attention", re.I)),
    ("ffn", re.compile(r"/ffn[12]/")),
    ("conv_module", re.compile(r"/conv/|depthwise", re.I)),
    ("subsampling", re.compile(r"subsampling", re.I)),
    ("bilstm", re.compile(r"lstm", re.I)),
    ("ctc", re.compile(r"ctc", re.I)),
    ("featurize_specaug", re.compile(r"log_mel|specaug|stft|augment|mel", re.I)),
    ("optimizer", re.compile(r"adafactor|apply_gradients|optax|update", re.I)),
    ("proj_head", re.compile(r"projection|final_fc|log_softmax", re.I)),
    ("transpose_copy", re.compile(r"^transpose|^copy|^bitcast", re.I)),
]


def bucket_of(hlo_name: str, op_name: str) -> str:
    for b, rx in BUCKETS:
        if rx.search(op_name):
            return b
    for b, rx in BUCKETS:
        if rx.search(hlo_name):
            return b
    if hlo_name.startswith(("copy", "bitcast", "transpose")):
        return "transpose_copy"
    if hlo_name.startswith(("all-reduce", "all-gather", "reduce-scatter")):
        return "collectives"
    return "other"


# ---------------------------------------------------------------------------
# the traced run
# ---------------------------------------------------------------------------


def run(variant_key: str, seconds: float = 30.0, out_name: str = "step_trace_tpu.json"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    assert jax.default_backend() in ("tpu", "axon"), (
        f"step trace needs the TPU backend, got {jax.default_backend()!r}"
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

    v = VARIANTS[variant_key]
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
        st, metrics = core(st, f, fl, targets, tlen)
        return st, metrics["loss"]

    def scan_fn(st):
        st, losses = jax.lax.scan(full_step, st, None, length=N_STEPS)
        return st, losses[-1]

    print(f"[trace] compiling scan of {N_STEPS} steps ...", flush=True)
    t0 = time.perf_counter()
    compiled = jax.jit(scan_fn).lower(state).compile()
    print(f"[trace] compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    hlo_text = compiled.as_text()

    # warm run (value fetch)
    t0 = time.perf_counter()
    st2, last = compiled(state)
    _ = float(last)
    warm_s = time.perf_counter() - t0

    trace_dir = tempfile.mkdtemp(prefix="step_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        st2, last = compiled(state)
        _ = float(last)
    traced_s = time.perf_counter() - t0
    print(f"[trace] warm {warm_s:.3f}s traced {traced_s:.3f}s "
          f"({traced_s / N_STEPS * 1e3:.2f} ms/step)", flush=True)

    events = load_trace_events(trace_dir)
    self_us = device_self_times(events)
    names = hlo_name_to_opname(hlo_text)

    # drop envelope events (jit_scan_fn(...)): their self time is scheduler
    # gaps between ops — report it separately as 'device_idle_gaps'
    buckets = collections.Counter()
    per_op = collections.Counter()
    gaps_us = 0.0
    total_us = 0.0
    for name, us in self_us.items():
        if us <= 0:
            continue
        # envelope events (jit_scan_fn(...)) and bare-number step markers are
        # trace scaffolding, not ops — their self time is scheduler gap
        if name.startswith("jit_") or "(" in name or name.isdigit():
            gaps_us += us
            continue
        total_us += us
        op_name = names.get(name, "")
        b = bucket_of(name, op_name)
        buckets[b] += us
        per_op[(name, op_name[:120])] += us

    ms_per_step = {k: v / 1e3 / N_STEPS for k, v in buckets.items()}
    frames = feat_cfg.num_frames(n_samp)
    flops = train_step_flops(mcfg, len(vocab), B, frames)

    result = {
        "variant": variant_key,
        "B": B, "seconds": seconds, "n_steps": N_STEPS,
        "wall_ms_per_step_warm": round(warm_s / N_STEPS * 1e3, 3),
        "wall_ms_per_step_traced": round(traced_s / N_STEPS * 1e3, 3),
        "device_busy_ms_per_step": round(total_us / 1e3 / N_STEPS, 3),
        "device_gap_ms_per_step": round(gaps_us / 1e3 / N_STEPS, 3),
        "roofline_floor_ms": round(flops / TPU_V5E_PEAK_FLOPS * 1e3, 2),
        "buckets_ms_per_step": {k: round(v, 3) for k, v in sorted(
            ms_per_step.items(), key=lambda kv: -kv[1])},
        "top_ops_ms_per_step": [
            {"hlo": n, "op_name": o, "ms": round(us / 1e3 / N_STEPS, 3)}
            for (n, o), us in per_op.most_common(40)
        ],
    }
    out_path = pathlib.Path(__file__).resolve().parent.parent / "results" / out_name
    existing = []
    if out_path.exists():
        existing = [r for r in json.loads(out_path.read_text())
                    if r.get("variant") != variant_key]
    existing.append(result)
    out_path.write_text(json.dumps(existing, indent=1) + "\n")

    print(f"\n=== {variant_key}: device time per step (ms) ===")
    for k, ms in sorted(ms_per_step.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {ms:8.3f}")
    print(f"  {'TOTAL busy':20s} {total_us / 1e3 / N_STEPS:8.3f}")
    print(f"  {'(sched gaps)':20s} {gaps_us / 1e3 / N_STEPS:8.3f}")
    print(f"  wall/step traced: {traced_s / N_STEPS * 1e3:.2f} ms; "
          f"floor {result['roofline_floor_ms']} ms")
    print("\ntop ops:")
    for item in result["top_ops_ms_per_step"][:25]:
        print(f"  {item['ms']:8.3f}  {item['hlo']:24s} {item['op_name']}")
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    key = "m_bf16"
    if args and args[0] == "--variant":
        key = args[1]
    run(key)
