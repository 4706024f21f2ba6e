"""Numerics guards — replacing the reference's silent NaN→100 substitution
(`lib/standard/runner.py:166`) and defensive ``zero_infinity`` with explicit
detection (SURVEY.md §5 "race detection/sanitizers" row: jit-time checks +
checkify NaN guards)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a jitted step with float-error checking: returns
    ``(error, outputs)``; call ``error.throw()`` (or inspect ``error.get()``)
    on host to surface NaN/Inf with the failing primitive's location."""
    return checkify.checkify(step_fn, errors=checkify.float_checks)


def tree_finite_report(tree: Any) -> Dict[str, Tuple[int, int]]:
    """Host-side audit: {path: (nan_count, inf_count)} for offending leaves."""
    import numpy as np

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        nans, infs = int(np.isnan(arr).sum()), int(np.isinf(arr).sum())
        if nans or infs:
            out[jax.tree_util.keystr(path).lstrip("['").rstrip("']").replace("']['", "/")] = (nans, infs)
    return out


def assert_all_finite(tree: Any, what: str = "tree") -> None:
    bad = tree_finite_report(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: {bad}")


def nan_guard(x: jnp.ndarray, name: str = "value") -> jnp.ndarray:
    """In-graph debug check (jax.debug-based, works under jit): prints when
    the array contains non-finite values, passes the value through."""
    def _report(has_bad):
        jax.debug.print("NaN/Inf detected in " + name + ": {}", has_bad)

    has_bad = ~jnp.all(jnp.isfinite(x))
    jax.lax.cond(has_bad, lambda: _report(has_bad), lambda: None)
    return x
