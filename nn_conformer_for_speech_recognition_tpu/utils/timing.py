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
    """A cheap f32 scalar that depends on every leaf of the carry.

    Typed PRNG keys (e.g. a TrainState.rng) cannot convert to f32
    directly — fold their raw uint32 key data instead."""
    total = jnp.float32(0.0)
    for leaf in jax.tree.leaves(carry):
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            leaf = jax.random.key_data(leaf)
        total = total + jnp.sum(leaf.astype(jnp.float32)) * 1e-12
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
    delta = scans[n2] - scans[n1]
    ms = delta / (n2 - n1) * 1e3
    details["protocol"] = "scan-marginal"
    # the wall delta the marginal is derived from: if it sits within
    # dispatch/fetch jitter (~0.1 s on the tunnel) the reading is noise —
    # callers must mark such cells below-resolution instead of quoting
    # throughputs from them (VERDICT r4 weak #3: a 0.06 ms reading became a
    # fictional "26.9M audio-s/s")
    details["delta_s"] = round(delta, 4)
    return ms, details


MIN_RESOLVABLE_DELTA_S = 0.1  # dispatch + value-fetch jitter bound (tunnel)


def adaptive_scan_marginal_ms(
    step_fn: Callable[[Any], Any],
    init_carry: Any,
    n1_probe: int = 5,
    target_s: float = 1.0,
    max_n: int = 4000,
    repeats: int = 3,
) -> Tuple[float, Dict[str, float]]:
    """``scan_marginal_ms`` with scan lengths sized so the measured wall
    delta actually clears ``MIN_RESOLVABLE_DELTA_S`` — required for
    sub-millisecond steps, where fixed N=5/25 scans yield deltas inside
    dispatch jitter (negative marginals were recorded that way).

    A single probe-based sizing is NOT enough on the tunnel: the probe wall
    time is dispatch-dominated for fast steps, so the per-iteration estimate
    comes out ~100x too high and the sized scan still lands under the
    resolution bound (that is how results/matmul_floor_tpu.json's
    ffn_shape cells ended up resolvable=false).  This version ITERATES:
    after each measurement, if the delta is below ``target_s/2`` and the
    scan length can still grow, it rescales n2 from the *measured* delta
    and re-measures.  Scan length does not affect compile time (the loop
    bound is a constant in one compiled program), only run time.

    Returns the same (ms, details); ``details['resolvable']`` is False when
    even the longest allowed scan could not push the delta past
    ``MIN_RESOLVABLE_DELTA_S``."""
    import math

    probe_compile_s = None
    n2 = max(25, 5 * n1_probe)
    n1 = n1_probe
    ms, details = None, {}
    for _ in range(4):
        t0 = time.time()
        ms, details = scan_marginal_ms(step_fn, init_carry, n1=n1, n2=n2,
                                       repeats=repeats)
        if probe_compile_s is None:
            probe_compile_s = details.get(f"compile_s_n{n1}", 0.0)
        delta = details["delta_s"]
        if delta >= target_s / 2 or n2 >= max_n:
            break
        # rescale from the measured delta (true marginal signal), not from
        # wall time (dispatch-polluted); guard against non-positive deltas
        per_iter = max(delta, MIN_RESOLVABLE_DELTA_S / 10) / (n2 - n1)
        n2 = int(min(max(n2 * 4, math.ceil(target_s / per_iter)), max_n))
        n1 = max(n1_probe, n2 // 5)
    details["probe_compile_s"] = round(probe_compile_s or 0.0, 1)
    details["n1"], details["n2"] = n1, n2
    details["resolvable"] = bool(
        ms > 0 and details["delta_s"] >= MIN_RESOLVABLE_DELTA_S
    )
    return ms, details
