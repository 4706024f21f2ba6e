"""Decode-path benchmark: NST pseudo-labeling e2e + greedy vs CTC beam.

The beam is the XLA-native fixed-width prefix search (`ops/decode.py`) —
static shapes, rolling-hash merges, one lax.scan over time under vmap.

Round 5 (VERDICT r4 item 3 + weak #3):
  * the pseudo-label e2e job (the north star's sharded batch-inference pass,
    `lib/standard/runner.py:253-281` role) now runs the PRODUCT construction:
    ``compute_dtype='auto'`` (bf16 on TPU — the round-4 number was silently
    f32, 3.3x slow), shape-aware kernel routing, and the product featurizer
    (`make_featurizer` routes the Pallas STFT exactly like
    ``Trainer._featurize``); B swept {64, 128, 256}, one fresh subprocess
    per cell (docs/STATUS.md env fact 8).
  * greedy/beam micro rows use ``adaptive_scan_marginal_ms``: scan lengths
    sized so the wall delta clears dispatch jitter; cells that still cannot
    be resolved are marked ``below-resolution`` instead of quoting
    noise-derived audio-s/s (the old 0.06 ms → "18-27M audio-s/s" rows).

Run: JAX_PLATFORMS='' python examples/decode_bench.py
Writes results/decode_tpu.json.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CASES = [
    # (name, B, T, V, beam, prune, audio_seconds_per_utt)
    ("speechcommands", 1024, 8, 38, 8, 8, 1.0),
    ("wpm_longform", 64, 240, 1024, 8, 8, 30.0),
    ("wpm_longform_wide", 64, 240, 1024, 16, 16, 30.0),
]

E2E_BATCHES = [64, 128, 256]
SEC, SR = 30.0, 16000


def _assert_tpu(jax):
    if jax.default_backend() not in ("tpu", "axon"):
        if "/root/.axon_site" not in os.environ.get("PYTHONPATH", ""):
            raise RuntimeError(
                "misconfigured: axon plugin path not on PYTHONPATH "
                "(deterministic, do not retry)"
            )
        raise RuntimeError(
            f"decode bench fell back to {jax.default_backend()!r}"
        )


def pseudo_label_cell(b: int) -> None:
    """One fresh-process e2e cell: audio → product featurizer → Conformer-M
    (auto-routed, auto-dtype) → greedy decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    _assert_tpu(jax)

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.ops.decode import greedy_decode
    from nn_conformer_for_speech_recognition_tpu.ops.features import (
        make_featurizer,
        resolve_featurizer_impl,
    )
    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        scan_marginal_ms,
    )

    feat_cfg = C.FeatureConfig()
    mcfg = C.conformer_m(use_pallas=True)  # compute_dtype='auto' → bf16 here
    model = ConformerCTC(mcfg, vocab_size=1024)
    featurize = make_featurizer(feat_cfg)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((b, int(SEC * SR))).astype(np.float32) * 0.1
    )
    alen = jnp.full((b,), int(SEC * SR), jnp.int32)
    feats, flens = featurize(audio, alen)
    vs = jax.jit(model.init)(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats, flens
    )

    @jax.jit
    def predict(vs, audio, alen):
        feats, flens = featurize(audio, alen)
        lp, ol = model.apply(vs, feats, flens, deterministic=True)
        return greedy_decode(lp, ol)

    def step(carry):
        a = carry
        ids = predict(vs, a, alen)
        # chain: next iteration's audio depends on this decode's output
        return a + jnp.sum(ids).astype(a.dtype) * 1e-12

    ms, details = scan_marginal_ms(step, audio, n1=3, n2=13)
    t_frames = mcfg.subsampled_length(feat_cfg.num_frames(int(SEC * SR)))
    print(json.dumps({
        "B": b, "ms": round(ms, 2),
        "audio_s_per_s": round(b * SEC / (ms / 1e3), 0),
        "compute_dtype": mcfg.resolved_compute_dtype(),
        "attention_impl": mcfg.resolved_attention_impl(t_frames),
        "lstm_impl": mcfg.resolved_lstm_impl(),
        "featurizer_impl": resolve_featurizer_impl(feat_cfg),
        **details,
    }), flush=True)


def micro_cases(results):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nn_conformer_for_speech_recognition_tpu.ops.decode import (
        ctc_beam_search,
        greedy_decode,
    )
    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        adaptive_scan_marginal_ms,
    )

    rng = np.random.default_rng(0)
    for name, b, t, v, beam, prune, secs in CASES:
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32)), -1
        )
        lens = jnp.full((b,), t, jnp.int32)

        def g_step(carry):
            ids = greedy_decode(carry, lens)
            return carry + jnp.sum(ids).astype(carry.dtype) * 1e-12

        ms_g, det_g = adaptive_scan_marginal_ms(g_step, lp)

        def b_step(carry):
            toks, _, _ = ctc_beam_search(carry, lens, blank_id=0, beam=beam,
                                         prune=prune,
                                         max_label_len=min(t, 128))
            return carry + jnp.sum(toks).astype(carry.dtype) * 1e-12

        ms_b, det_b = adaptive_scan_marginal_ms(b_step, lp)

        audio_s = b * secs
        row = {
            "beam": beam, "prune": prune, "B": b, "T": t, "V": v,
            "protocol": "scan-marginal-adaptive",
        }
        for key, ms, det in (("greedy", ms_g, det_g), ("beam", ms_b, det_b)):
            row[f"{key}_ms"] = round(ms, 3)
            row[f"{key}_n"] = [det["n1"], det["n2"]]
            row[f"{key}_delta_s"] = det["delta_s"]
            if det["resolvable"]:
                row[f"{key}_audio_s_per_s"] = round(audio_s / (ms / 1e3), 0)
            else:
                row[f"{key}_resolution"] = "below-resolution"
        results[name] = row
        print(name, json.dumps(row), flush=True)


def main():
    import jax

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    _assert_tpu(jax)
    print("devices:", jax.devices(), flush=True)

    out_path = pathlib.Path(__file__).resolve().parent.parent / "results" / "decode_tpu.json"
    results = {}
    if out_path.exists():
        results = json.loads(out_path.read_text())
    results.setdefault("pseudo_label_e2e", {})
    env = dict(os.environ)
    for b in E2E_BATCHES:
        for attempt in range(4):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--e2e", str(b)],
                capture_output=True, text=True, timeout=5400, env=env,
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode == 0 and lines:
                results["pseudo_label_e2e"][f"B{b}"] = json.loads(lines[-1])
                break
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
            if "deterministic, do not retry" in p.stdout + p.stderr:
                raise RuntimeError("axon plugin not on PYTHONPATH")
            if attempt < 3:
                time.sleep(60)
        out_path.write_text(json.dumps(results, indent=1) + "\n")
        print(f"e2e B={b}:", results["pseudo_label_e2e"].get(f"B{b}"),
              flush=True)

    micro_cases(results)
    out_path.write_text(json.dumps(results, indent=1) + "\n")
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--e2e":
        pseudo_label_cell(int(sys.argv[2]))
    else:
        main()
