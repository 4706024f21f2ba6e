"""Decode-path benchmark: greedy vs vectorized CTC beam search on TPU.

The beam is the XLA-native fixed-width prefix search (`ops/decode.py`) —
static shapes, rolling-hash merges, one lax.scan over time under vmap.
This measures its cost per audio-second against greedy decode at NST
pseudo-labeling shapes, deciding whether a Pallas beam kernel (SURVEY.md §7
build order, last item) is worth building.

Round 4: retimed with the scan/value-fetch marginal protocol
(`utils/timing.scan_marginal_ms`; docs/STATUS.md env fact 10 — the previous
version's block_until_ready host loop recorded 0.05 ms dispatch times as
"steps").

Run: JAX_PLATFORMS='' python examples/decode_bench.py
Writes results/decode_tpu.json.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nn_conformer_for_speech_recognition_tpu.ops.decode import (
    ctc_beam_search,
    greedy_decode,
)
from nn_conformer_for_speech_recognition_tpu.utils.timing import scan_marginal_ms

CASES = [
    # (name, B, T, V, beam, prune, audio_seconds_per_utt)
    ("speechcommands", 1024, 8, 38, 8, 8, 1.0),
    ("wpm_longform", 64, 240, 1024, 8, 8, 30.0),
    ("wpm_longform_wide", 64, 240, 1024, 16, 16, 30.0),
]


def pseudo_label_throughput():
    """End-to-end NST pseudo-labeling: audio → featurize → Conformer-M →
    greedy decode, the sharded-inference job of `nst/driver.py` on one chip."""
    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.ops.features import log_mel_spectrogram

    B, SEC, SR = 64, 30.0, 16000
    feat_cfg = C.FeatureConfig()
    mcfg = C.conformer_m(use_pallas=True)
    model = ConformerCTC(mcfg, vocab_size=1024)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, int(SEC * SR))).astype(np.float32) * 0.1)
    alen = jnp.full((B,), int(SEC * SR), jnp.int32)
    feats, flens = log_mel_spectrogram(audio, feat_cfg, alen)
    vs = jax.jit(model.init)(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats, flens
    )

    @jax.jit
    def predict(vs, audio, alen):
        feats, flens = log_mel_spectrogram(audio, feat_cfg, alen)
        lp, ol = model.apply(vs, feats, flens, deterministic=True)
        return greedy_decode(lp, ol)

    def step(carry):
        a = carry
        ids = predict(vs, a, alen)
        # chain: next iteration's audio depends on this decode's output
        return a + jnp.sum(ids).astype(a.dtype) * 1e-12

    ms, details = scan_marginal_ms(step, audio, n1=3, n2=13)
    thr = B * SEC / (ms / 1e3)
    print(f"pseudo-label e2e (Conformer-M, B={B}, 30 s): {ms:.2f} ms "
          f"→ {thr:.0f} audio-s/s", flush=True)
    return {"ms": round(ms, 2), "audio_s_per_s": round(thr, 0), "B": B,
            **details}


def main():
    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()
    assert jax.default_backend() in ("tpu", "axon"), (
        f"decode bench fell back to {jax.default_backend()!r}"
    )
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    results = {}
    results["pseudo_label_e2e"] = pseudo_label_throughput()
    for name, b, t, v, beam, prune, secs in CASES:
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32)), -1
        )
        lens = jnp.full((b,), t, jnp.int32)

        def g_step(carry):
            ids = greedy_decode(carry, lens)
            return carry + jnp.sum(ids).astype(carry.dtype) * 1e-12

        ms_g, _ = scan_marginal_ms(g_step, lp, n1=3, n2=13)
        dt_g = ms_g / 1e3

        def b_step(carry):
            toks, _, _ = ctc_beam_search(carry, lens, blank_id=0, beam=beam,
                                         prune=prune,
                                         max_label_len=min(t, 128))
            return carry + jnp.sum(toks).astype(carry.dtype) * 1e-12

        ms_b, _ = scan_marginal_ms(b_step, lp, n1=3, n2=13)
        dt_b = ms_b / 1e3

        audio_s = b * secs
        row = {
            "greedy_ms": round(dt_g * 1e3, 2),
            "greedy_audio_s_per_s": round(audio_s / dt_g, 0),
            "beam_ms": round(dt_b * 1e3, 2),
            "beam_audio_s_per_s": round(audio_s / dt_b, 0),
            "beam": beam, "prune": prune, "B": b, "T": t, "V": v,
            "protocol": "scan-marginal",
        }
        results[name] = row
        print(f"{name:20s} greedy {dt_g*1e3:8.2f} ms ({row['greedy_audio_s_per_s']:.0f} a-s/s)  "
              f"beam {dt_b*1e3:8.2f} ms ({row['beam_audio_s_per_s']:.0f} a-s/s)", flush=True)
    out = pathlib.Path(__file__).resolve().parent.parent / "results" / "decode_tpu.json"
    out.write_text(json.dumps(results, indent=1) + '\n')
    print("wrote", out)


if __name__ == "__main__":
    main()
