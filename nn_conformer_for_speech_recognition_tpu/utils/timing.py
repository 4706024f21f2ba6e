"""Trustworthy device timing on remote/tunneled TPUs.

The only protocols that measure device compute (not dispatch) through the
axon tunnel are (docs/STATUS.md env fact 10):

  1. wrap the computation in ONE jitted ``lax.scan`` of N iterations whose
     carry chains each iteration to the previous (so XLA cannot hoist or
     dead-code-eliminate the body),
  2. barrier with a VALUE FETCH (``float(...)`` of a scalar derived from the
     carry) — a value cannot materialize on host before the device produced
     it, unlike ``block_until_ready`` which can return early on the tunnel,
  3. report the MARGINAL cost (t(N2) - t(N1)) / (N2 - N1) so dispatch and
     fetch latency cancel exactly.

``scan_marginal_ms`` packages the protocol for any carry→carry step.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def _carry_scalar(carry) -> jnp.ndarray:
    """A cheap f32 scalar that depends on every leaf of the carry."""
    total = jnp.float32(0.0)
    for leaf in jax.tree.leaves(carry):
        total = total + jnp.sum(jnp.asarray(leaf).astype(jnp.float32)) * 1e-12
    return total


def scan_marginal_ms(
    step_fn: Callable[[Any], Any],
    init_carry: Any,
    n1: int = 5,
    n2: int = 25,
    repeats: int = 3,
) -> Tuple[float, Dict[str, float]]:
    """Time ``step_fn`` (carry → carry) with the scan/value-fetch protocol.

    ``step_fn`` must return a carry whose leaves depend on its input carry;
    if the natural computation doesn't chain, fold its output into the carry
    (e.g. ``audio + tiny_scalar(output)``) so the scan can't be collapsed.

    Returns (ms_per_iteration, details) where details carries the raw scan
    wall times and compile seconds.
    """

    def make(n):
        @jax.jit
        def f(c):
            def body(c, _):
                return step_fn(c), None
            c, _ = jax.lax.scan(body, c, None, length=n)
            return _carry_scalar(c)
        return f

    details: Dict[str, float] = {}
    scans = {}
    for n in (n1, n2):
        fn = make(n)
        t0 = time.time()
        float(fn(init_carry))  # compile + first run; value-fetch barrier
        details[f"compile_s_n{n}"] = round(time.time() - t0, 1)
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(init_carry))
            ts.append(time.perf_counter() - t0)
        scans[n] = min(ts)
        details[f"scan{n}_s"] = round(min(ts), 4)
    ms = (scans[n2] - scans[n1]) / (n2 - n1) * 1e3
    details["protocol"] = "scan-marginal"
    return ms, details
