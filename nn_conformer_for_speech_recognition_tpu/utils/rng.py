"""Dropout RNG implementation selection (TPU hardware RNG vs threefry).

JAX's default threefry PRNG costs ~20 VPU ops per random bit drawn.  In a
dropout-regularised Conformer train step that is not noise: the round-5 FFN
probe (results/ffn_probe_tpu.json) measured the step's 32-module FFN stack
at 14.1 ms/step with threefry dropout vs 3.1 ms without dropout — i.e.
~11 ms of the 34 ms Conformer-M step was spent *generating dropout masks*,
5x the FFN's entire matmul cost.

The fix: draw dropout bits from the TPU's hardware RNG instead.  JAX's
'rbg' PRNG implementation keys `jax.random`'s samplers off XLA's
RngBitGenerator — a single instruction stream on TPU — while key
split/fold_in still goes through threefry on the (tiny) key itself, so flax
module-path folding (`make_rng('dropout')`) works unchanged.  One
conversion of the per-step dropout key at the `model.apply(rngs=...)`
boundary switches every `nn.Dropout` in the model.

Trade-offs (why this is the right default for dropout and not for
initialization): rbg bit streams are not bit-stable across XLA backends or
sharding choices, and the generator's statistical guarantees are those of
the hardware RNG, not threefry's.  Dropout masks need neither property.
Parameter init and data sampling keep threefry.

'auto' resolves to 'rbg' only on the TPU backend: on CPU threefry is cheap,
interpret-mode tests stay bit-identical, and the 8-device virtual mesh
(tests/conftest.py) keeps cross-process determinism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VALID_IMPLS = ("auto", "rbg", "threefry")


def resolve_dropout_rng_impl(impl: str = "auto") -> str:
    """'rbg' or 'threefry'; 'auto' picks rbg on the TPU backend."""
    if impl not in VALID_IMPLS:
        raise ValueError(
            f"dropout rng impl must be one of {VALID_IMPLS}, got {impl!r}"
        )
    if impl == "auto":
        return (
            "rbg" if jax.default_backend() in ("tpu", "axon") else "threefry"
        )
    return impl


def dropout_key(key: jax.Array, impl: str = "auto") -> jax.Array:
    """Convert a (threefry) PRNG key to the resolved dropout implementation.

    The conversion re-keys an 'rbg' generator from the threefry key's raw
    data (2 words tiled to rbg's 4-word key), so distinct step keys yield
    distinct hardware-RNG streams.  With impl resolved to 'threefry' the key
    passes through untouched — CPU paths and tests see identical masks to
    before this feature existed.
    """
    resolved = resolve_dropout_rng_impl(impl)
    if resolved == "threefry":
        return key
    data = jax.random.key_data(key)
    return jax.random.wrap_key_data(
        jnp.tile(data, 2)[..., :4], impl="rbg"
    )
