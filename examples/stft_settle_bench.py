"""Settle the Pallas STFT/log-mel kernel (VERDICT r2 #4/#5).

docs/STATUS.md has carried "wins expected for long-form audio" for two rounds
without a measurement.  This bench times `make_featurizer(use_pallas=False)`
(the fused XLA matmul-DFT path the product uses) against
`make_featurizer(use_pallas=True)` (the fused Pallas kernel) in the kernel's
claimed regime — long-form clips, small-to-mid batch — on the real chip,
subprocess-isolated per (B, seconds, impl) cell (docs/STATUS.md env fact 8).

Writes results/stft_settle_tpu.json with the matrix and a per-cell winner;
the decision (wire into Trainer._featurize or retire the claim) is recorded
in docs/STATUS.md next to the numbers.

Run: python examples/stft_settle_bench.py
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SR = 16000
N1, N2 = 5, 25
REPEATS = 3
CELLS = [(4, 30.0), (4, 300.0), (16, 30.0), (16, 120.0), (8, 300.0)]


def run_cell(b: int, seconds: float, use_pallas: bool) -> None:
    """Scan/value-fetch marginal timing (docs/STATUS.md env fact 10 — the
    old `block_until_ready` host loop measured dispatch, not compute).  The
    scan carry perturbs the audio each iteration so XLA cannot hoist the
    featurization out of the loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nn_conformer_for_speech_recognition_tpu as pkg

    pkg.ensure_backend()

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.ops.features import make_featurizer

    import os as _os
    if jax.default_backend() not in ("tpu", "axon") and \
            "/root/.axon_site" not in _os.environ.get("PYTHONPATH", ""):
        raise RuntimeError(
            "misconfigured: axon plugin path not on PYTHONPATH "
            "(deterministic, do not retry) — use "
            "PYTHONPATH=/root/repo:$PYTHONPATH or no override at all"
        )
    assert jax.default_backend() in ("tpu", "axon"), (
        f"TPU benchmark fell back to {jax.default_backend()!r} — interpret-"
        "mode Pallas numbers would be meaningless. Fix the tunnel and re-run."
    )
    feat_cfg = C.FeatureConfig()
    fn = make_featurizer(feat_cfg, use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    n = int(seconds * SR)
    audio = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32) * 0.1)
    alen = jnp.full((b,), n, jnp.int32)

    from nn_conformer_for_speech_recognition_tpu.utils.timing import (
        adaptive_scan_marginal_ms,
    )

    def step(c):
        feats, _fl = fn(audio + c, alen)
        return jnp.mean(feats) * 1e-12

    # iterative adaptive sizing (utils/timing.py): a single probe-based
    # sizing is dispatch-dominated for the sub-ms cells (this bench once
    # recorded a NEGATIVE marginal at B=4/30 s, then an unresolvable 188-
    # iteration scan); the helper grows n2 from each round's measured delta
    # until the wall delta clears the jitter bound.  The fastest cell here
    # (~0.05 ms) needs n2 ~ 20k for a ~1 s delta.
    t0 = time.time()
    ms, det = adaptive_scan_marginal_ms(
        step, jnp.float32(0.0), target_s=1.0, max_n=30000
    )
    compile_s = round(time.time() - t0, 1)  # incl. all sizing-round compiles
    dt = ms / 1e3
    feats, _ = fn(audio, alen)
    print(json.dumps({
        "ms": ms,
        "protocol": "scan-marginal",
        "n1": det["n1"], "n2": det["n2"],
        # total wall delta the marginal was derived from; resolvable=False
        # cells must be marked below-resolution, not scored (VERDICT r4
        # weak #1)
        "delta_s": det["delta_s"],
        "resolvable": det["resolvable"],
        "audio_s_per_s": b * seconds / dt,
        "compile_s": compile_s,
        "out_shape": list(feats.shape),
    }), flush=True)


MIN_RESOLVABLE_DELTA_S = 0.1  # dispatch+fetch jitter bound on the tunnel


def main(only_cells=None):
    path = pathlib.Path(__file__).resolve().parent.parent / "results" / "stft_settle_tpu.json"
    out = {"protocol": "scan-marginal, adaptive N (n2 sized so the scan "
                       "runs ~1 s; cells whose wall delta stays under "
                       f"{MIN_RESOLVABLE_DELTA_S} s are below-resolution)",
           "cells": []}
    prior = {}
    if path.exists():
        prior = {(c["B"], c["seconds"]): c
                 for c in json.loads(path.read_text())["cells"]}
    env = dict(os.environ)
    cells = only_cells or CELLS
    for b, seconds in CELLS:
        if (b, seconds) not in cells:
            out["cells"].append(prior[(b, seconds)])
            continue
        row = {"B": b, "seconds": seconds}
        for impl, flag in (("xla", "0"), ("pallas", "1")):
            for attempt in range(4):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--cell",
                     str(b), str(seconds), flag],
                    capture_output=True, text=True, timeout=1800, env=env,
                )
                lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
                if p.returncode == 0 and lines:
                    row[impl] = json.loads(lines[-1])
                    break
                sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
                # transient axon-relay discovery flake: worker asserts out
                # instead of benchmarking interpret-mode CPU — retry fresh
                err_text = p.stdout + p.stderr
                if "deterministic, do not retry" in err_text:
                    raise RuntimeError("axon plugin not on PYTHONPATH — fix the environment")
                if "fell back to" in err_text and attempt < 3:
                    time.sleep(60)
                    continue
                row[impl] = {"error": f"rc={p.returncode}"}
                break
        if "ms" in row.get("xla", {}) and "ms" in row.get("pallas", {}):
            resolvable = all(
                row[i]["ms"] > 0
                and row[i].get("delta_s", MIN_RESOLVABLE_DELTA_S)
                >= MIN_RESOLVABLE_DELTA_S
                for i in ("xla", "pallas")
            )
            if resolvable:
                row["pallas_speedup"] = round(
                    row["xla"]["ms"] / row["pallas"]["ms"], 3
                )
                row["winner"] = "pallas" if row["pallas_speedup"] > 1.0 else "xla"
            else:
                # a negative or sub-jitter marginal is dispatch noise, not a
                # measurement — do not pick a winner from it
                row["winner"] = "below-resolution"
        print(row, flush=True)
        out["cells"].append(row)

    wins = [c for c in out["cells"] if c.get("winner") == "pallas"]
    unresolved = [c for c in out["cells"] if c.get("winner") == "below-resolution"]
    out["verdict"] = (
        f"pallas wins {len(wins)}/{len(out['cells']) - len(unresolved)} "
        f"resolvable cells ({len(unresolved)} below-resolution)"
    )
    path.write_text(json.dumps(out, indent=1) + "\n")
    print("wrote", path, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--cell":
        run_cell(int(sys.argv[2]), float(sys.argv[3]), sys.argv[4] == "1")
    elif len(sys.argv) >= 2 and sys.argv[1] == "--only":
        # re-measure a subset, e.g. --only 4x30 16x30 (other cells keep
        # their prior rows)
        sel = []
        for spec in sys.argv[2:]:
            b, s = spec.split("x")
            sel.append((int(b), float(s)))
        main(only_cells=sel)
    else:
        main()
