"""Sequence (context) parallelism: Ulysses-style head-sharded attention.

SURVEY.md §2.3: the reference pads everything to a global max length on one
device; for very long audio the TPU build optionally shards the *time* axis
of attention across the mesh.  The Ulysses scheme: activations arrive
time-sharded; an all-to-all over the sequence axis exchanges the time shards
for head shards, each device computes full-length attention for H/n heads,
and a second all-to-all restores time sharding.  Both collectives ride ICI
(`jax.lax.all_to_all` inside ``shard_map``).

Requires num_heads % axis_size == 0 and T % axis_size == 0 (pad T to the
mesh multiple — bucketed batching already rounds lengths).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _local_attention(qu, k, v, bias, lengths, scale):
    """Plain masked attention over full T for the local head shard."""
    t = qu.shape[1]
    scores = jnp.einsum("bihd,bjhd->bhij", qu, k, preferred_element_type=jnp.float32)
    scores = (scores + bias) * scale
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhij,bjhd->bihd", p, v).astype(qu.dtype)


def ulysses_attention(
    qu: jnp.ndarray,  # (B, T, H, dh) — T sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (B, H, T, T) — heads sharded over `axis`
    lengths: jnp.ndarray,  # (B,) replicated
    scale: float,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Attention with the time axis sharded over ``axis``.

    Inside each shard: all-to-all T-shards ↔ H-shards, full-T attention on
    H/n local heads, all-to-all back.  ``bias`` enters head-sharded (it is
    already O(H·T²) — sharding it over heads keeps per-device memory at
    O(H/n·T²)).
    """
    n = mesh.shape[axis]
    h = qu.shape[2]
    assert h % n == 0, f"heads {h} not divisible by seq-parallel size {n}"

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, axis, None, None),  # qu time-sharded
            P(None, axis, None, None),
            P(None, axis, None, None),
            P(None, axis, None, None),  # bias head-sharded (axis 1)
            P(None),
        ),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    def inner(qu_l, k_l, v_l, bias_l, lengths_l):
        # (B, T/n, H, dh) → (B, T, H/n, dh): split heads, gather time
        def t2h(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)

        qu_f, k_f, v_f = t2h(qu_l), t2h(k_l), t2h(v_l)
        out = _local_attention(qu_f, k_f, v_f, bias_l, lengths_l, scale)
        # (B, T, H/n, dh) → (B, T/n, H, dh)
        return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2, tiled=True)

    return inner(qu, k, v, bias, lengths)


def sequence_sharding(mesh: Mesh, axis: str = "data"):
    """NamedSharding placing the time axis (dim 1) of a (B, T, ...) array
    over ``axis``."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P(None, axis))
