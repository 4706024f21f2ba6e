"""Depthwise 1-D convolution Pallas kernel (Conformer conv module, k=33).

The Conformer conv module's depthwise conv (k=33, SAME padding —
`unused_lib/conformer.py:100-106`, `lib/hparams.py:62-63`) is a pure VPU op:
out[t, c] = Σ_k w[k, c] · x[t+k-k//2, c].  The kernel unrolls the K taps as
shifted fused multiply-adds over a VMEM-resident (T, block_c) tile — no HBM
traffic beyond one read of x and one write of out, where XLA's general conv
lowering would materialise an im2col buffer.

Forward is Pallas; backward uses the jnp reference (d/dx is the same conv
with a flipped kernel; d/dw a correlation) so training works through
``jax.custom_vjp`` while inference/NST-labeling rides the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nn_conformer_for_speech_recognition_tpu.parallel.kernel_sharding import (
    shard_over_batch,
)

LANES = 128
SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def depthwise_conv1d_reference(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """jnp reference: x (B, T, C), w (K, C) → (B, T, C), SAME padding."""
    k = w.shape[0]
    pad_lo = (k - 1) // 2
    pad_hi = k - 1 - pad_lo
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    t = x.shape[1]
    out = jnp.zeros_like(x)
    for i in range(k):
        out = out + xp[:, i : i + t, :] * w[i][None, None, :]
    return out


def _dw_kernel(x_ref, w_ref, o_ref, *, k: int, t: int):
    # x_ref: (1, T + k - 1 padded rows, block_c); w_ref: (k_pad, block_c)
    acc = jnp.zeros((t, x_ref.shape[2]), jnp.float32)
    for i in range(k):
        acc = acc + x_ref[0, i : i + t, :] * w_ref[i, :][None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_c", "interpret"))
def _dw_forward(
    x: jnp.ndarray, w: jnp.ndarray, block_c: int = 128, interpret=None
) -> jnp.ndarray:
    if interpret is None:  # auto: interpret off-TPU so CPU tests/mesh work
        interpret = jax.default_backend() != "tpu"
    b, t, c = x.shape
    k = w.shape[0]
    pad_lo = (k - 1) // 2
    pad_hi = k - 1 - pad_lo

    t_pad = _round_up(t, SUBLANES)
    c_pad = _round_up(c, block_c)
    k_pad = _round_up(k, SUBLANES)
    # rows: [pad_lo zeros | x | pad_hi zeros | alignment]
    rows = _round_up(t_pad + k - 1, SUBLANES)
    xp = jnp.zeros((b, rows, c_pad), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, pad_lo, 0))
    wp = jnp.zeros((k_pad, c_pad), w.dtype)
    wp = jax.lax.dynamic_update_slice(wp, w, (0, 0))

    out = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, t=t_pad),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c_pad), x.dtype),
        grid=(b, c_pad // block_c),
        in_specs=[
            pl.BlockSpec(
                (1, rows, block_c), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((k_pad, block_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_pad, block_c), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, wp)
    return out[:, :t, :c]


@jax.custom_vjp
def depthwise_conv1d_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x (B, T, C), w (K, C) → (B, T, C); SAME padding, Pallas forward."""
    return _dw_forward(x, w)


def _dw_fwd(x, w):
    return _dw_forward(x, w), (x, w)


def _dw_bwd(res, g):
    x, w = res
    k = w.shape[0]
    # dx: cross-correlation of g with w reversed; matching SAME-padding
    # offsets for even k require the complementary pad split.
    pad_lo = (k - 1) // 2
    pad_hi = k - 1 - pad_lo
    t = x.shape[1]
    gp = jnp.pad(g, ((0, 0), (pad_hi, pad_lo), (0, 0)))
    dx = jnp.zeros_like(x)
    for i in range(k):
        dx = dx + gp[:, i : i + t, :] * w[k - 1 - i][None, None, :]
    # dw[i, c] = Σ_{b,t} x_padded[b, t+i, c] * g[b, t, c]
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    dw = jnp.stack(
        [jnp.sum(xp[:, i : i + t, :] * g, axis=(0, 1)) for i in range(k)], axis=0
    )
    return dx, dw


depthwise_conv1d_pallas.defvjp(_dw_fwd, _dw_bwd)
# batch-elementwise: shard over the data axis when a kernel mesh is active
depthwise_conv1d_pallas = shard_over_batch(batched=(0,))(depthwise_conv1d_pallas)
