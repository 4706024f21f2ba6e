"""Fused (Bi)LSTM Pallas kernels — the CTC decoder head's recurrence.

The reference decodes with a 1-layer BiLSTM (`lib/standard/asrnn.py:250-256`,
`lib/hparams.py:78-81`).  The scan-based flax path lowers to an XLA `while`
per direction whose per-step launches + carry copies dominate the long-form
train step (profiled ~1.4 ms per while at T=235 plus dozens of carry
copy-starts — docs/STATUS.md).  Here the whole sequence runs in ONE kernel:
grid walks (batch-tile, time) with time innermost/sequential, (h, c) live in
VMEM scratch, the input projection x·W_ih + b is hoisted OUT of the
recurrence as one big MXU matmul over all T, and each step does a single
(BB, Hp) @ (Hp, 4Hp) recurrent matmul plus VPU gate math.

Gate math matches flax's LSTMCell (i, f, g, o order):
    i,f,o = σ(xw + h·Whh) ;  g = tanh(·)
    c' = f∘c + i∘g ;  h' = o∘tanh(c')

Length handling: rows stop updating at their valid length (the carried h is
emitted for padded steps); the reverse direction iterates t = T-1..0 under
the same rule, so each row's recurrence effectively starts at its own
len-1 — equivalent on the valid region to flax's flip_sequences approach.

Backward is the standard LSTM BPTT as a second kernel (time reversed via
index maps): saved post-activation gates + cell states make each step pure
VPU math plus dgates·Whhᵀ and the h_{t-1}ᵀ·dgates weight-gradient
accumulation in a VMEM scratch.  Exposed via ``jax.custom_vjp`` on
(xw, w_hh); the hoisted input projection differentiates in XLA outside.

Lane padding: H → Hp (128-multiple); zero-padded weights keep the padded
lanes exactly 0 through both recursions (g = tanh(0) = 0 kills i∘g).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nn_conformer_for_speech_recognition_tpu.parallel.kernel_sharding import (
    shard_over_batch,
)

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_bb(b: int, hp: int) -> int:
    bb = min(128, _round_up(b, 8))
    # dominant blocks are (BB, 4Hp); keep each ≲ 1 MB
    while bb > 8 and bb * 4 * hp * 4 > 1024 * 1024:
        bb //= 2
    return bb


def _gates(lin, hp):
    i = jax.nn.sigmoid(lin[:, :hp])
    f = jax.nn.sigmoid(lin[:, hp:2 * hp])
    g = jnp.tanh(lin[:, 2 * hp:3 * hp])
    o = jax.nn.sigmoid(lin[:, 3 * hp:])
    return i, f, g, o


def _fwd_kernel(
    xw_ref,  # (1, BB, 4Hp)
    wh_ref,  # (Hp, 4Hp)
    len_ref,  # (BB, Hp) f32
    h_out,  # (1, BB, Hp)
    c_out,  # (1, BB, Hp)
    gates_out,  # (1, BB, 4Hp)
    h_scr,  # VMEM (BB, Hp)
    c_scr,  # VMEM (BB, Hp)
    *,
    t_total: int,
    reverse: bool,
    hp: int,
):
    t_ = pl.program_id(1)

    @pl.when(t_ == 0)
    def _init():
        h_scr[...] = jnp.zeros(h_scr.shape, jnp.float32)
        c_scr[...] = jnp.zeros(c_scr.shape, jnp.float32)

    t_real = (t_total - 1 - t_) if reverse else t_
    active = t_real < len_ref[...]

    h = h_scr[...]
    lin = xw_ref[0] + jax.lax.dot(
        h, wh_ref[...], preferred_element_type=jnp.float32
    )
    i, f, g, o = _gates(lin, hp)
    c_new = f * c_scr[...] + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[...] = jnp.where(active, h_new, h)
    c_scr[...] = jnp.where(active, c_new, c_scr[...])
    h_out[0] = h_scr[...]
    c_out[0] = c_scr[...]
    gates_out[0] = jnp.concatenate([i, f, g, o], axis=1)


def _bwd_kernel(
    gout_ref,  # (1, BB, Hp) upstream dL/dh_t
    gates_ref,  # (1, BB, 4Hp)
    c_ref,  # (1, BB, Hp) c_t
    cprev_ref,  # (1, BB, Hp) c at the previous sequence step
    hprev_ref,  # (1, BB, Hp) h at the previous sequence step
    whT_ref,  # (4Hp, Hp)
    len_ref,  # (BB, Hp) f32
    dxw_ref,  # (1, BB, 4Hp)
    dwh_ref,  # (1, Hp, 4Hp) per-batch-tile accumulation
    dh_scr,  # VMEM (BB, Hp)
    dc_scr,  # VMEM (BB, Hp)
    dw_scr,  # VMEM (Hp, 4Hp)
    *,
    t_total: int,
    reverse: bool,
    hp: int,
):
    t_ = pl.program_id(1)

    @pl.when(t_ == 0)
    def _init():
        dh_scr[...] = jnp.zeros(dh_scr.shape, jnp.float32)
        dc_scr[...] = jnp.zeros(dc_scr.shape, jnp.float32)
        dw_scr[...] = jnp.zeros(dw_scr.shape, jnp.float32)

    # fwd processed t_real = t_ (or T-1-t_ when reverse); bwd walks it back
    t_real = t_ if reverse else (t_total - 1 - t_)
    active = t_real < len_ref[...]

    gates = gates_ref[0]
    i, f, g, o = (gates[:, :hp], gates[:, hp:2 * hp],
                  gates[:, 2 * hp:3 * hp], gates[:, 3 * hp:])
    ct = c_ref[0]
    cp = cprev_ref[0]
    th = jnp.tanh(ct)

    dh_tot = dh_scr[...] + gout_ref[0]
    do = dh_tot * th * o * (1.0 - o)
    dct = dc_scr[...] + dh_tot * o * (1.0 - th * th)
    di = dct * g * i * (1.0 - i)
    df = dct * cp * f * (1.0 - f)
    dg = dct * i * (1.0 - g * g)
    dgates = jnp.concatenate([di, df, dg, do], axis=1)
    active4 = jnp.concatenate([active] * 4, axis=1)
    dgates = jnp.where(active4, dgates, 0.0)

    dxw_ref[0] = dgates
    dh_rec = jax.lax.dot(dgates, whT_ref[...], preferred_element_type=jnp.float32)
    # inactive step: h_t ≡ h_{t-1}, c_t ≡ c_{t-1} → cotangents flow through
    dh_scr[...] = jnp.where(active, dh_rec, dh_tot)
    dc_scr[...] = jnp.where(active, dct * f, dc_scr[...])
    dw_scr[...] += jax.lax.dot_general(
        hprev_ref[0], dgates, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t_ == t_total - 1)
    def _store():
        dwh_ref[0] = dw_scr[...]


def _pad_gates_lanes(x, h, hp):
    """(..., 4H) → (..., 4Hp): pad each of the 4 gate chunks to Hp lanes."""
    shape = x.shape[:-1]
    x4 = x.reshape(*shape, 4, h)
    x4 = jnp.pad(x4, [(0, 0)] * len(shape) + [(0, 0), (0, hp - h)])
    return x4.reshape(*shape, 4 * hp)


def _unpad_gates_lanes(x, h, hp):
    shape = x.shape[:-1]
    x4 = x.reshape(*shape, 4, hp)[..., :h]
    return x4.reshape(*shape, 4 * h)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def _lstm_forward(xw_p, wh_p, len_map, reverse, interpret):
    t, b_pad, hp4 = xw_p.shape
    hp = hp4 // 4
    bb = _pick_bb(b_pad, hp)
    grid = (b_pad // bb, t)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, t_total=t, reverse=reverse, hp=hp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bb, 4 * hp),
                         (lambda b_, t_: (t - 1 - t_, b_, 0)) if reverse
                         else (lambda b_, t_: (t_, b_, 0))),
            pl.BlockSpec((hp, 4 * hp), lambda b_, t_: (0, 0)),
            pl.BlockSpec((bb, hp), lambda b_, t_: (b_, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bb, hp),
                         (lambda b_, t_: (t - 1 - t_, b_, 0)) if reverse
                         else (lambda b_, t_: (t_, b_, 0))),
            pl.BlockSpec((1, bb, hp),
                         (lambda b_, t_: (t - 1 - t_, b_, 0)) if reverse
                         else (lambda b_, t_: (t_, b_, 0))),
            pl.BlockSpec((1, bb, 4 * hp),
                         (lambda b_, t_: (t - 1 - t_, b_, 0)) if reverse
                         else (lambda b_, t_: (t_, b_, 0))),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, hp), jnp.float32),
            pltpu.VMEM((bb, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t, b_pad, hp), jnp.float32),
            jax.ShapeDtypeStruct((t, b_pad, hp), jnp.float32),
            jax.ShapeDtypeStruct((t, b_pad, 4 * hp), jnp.float32),
        ],
        interpret=interpret,
    )(xw_p, wh_p, len_map)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def _lstm_backward(gout, gates, c_all, h_all, wh_p, len_map, reverse, interpret):
    t, b_pad, hp = gout.shape
    bb = _pick_bb(b_pad, hp)
    grid = (b_pad // bb, t)

    # previous-sequence-step h/c: shift along time in SEQUENCE order
    zrow = jnp.zeros((1, b_pad, hp), jnp.float32)
    if reverse:  # sequence order is t = T-1..0, so "previous" is t+1
        c_prev = jnp.concatenate([c_all[1:], zrow], axis=0)
        h_prev = jnp.concatenate([h_all[1:], zrow], axis=0)
    else:
        c_prev = jnp.concatenate([zrow, c_all[:-1]], axis=0)
        h_prev = jnp.concatenate([zrow, h_all[:-1]], axis=0)
    whT = wh_p.T

    # bwd walks time in the opposite order of the fwd recurrence
    rev_map = (lambda b_, t_: (t_, b_, 0)) if reverse \
        else (lambda b_, t_: (t - 1 - t_, b_, 0))

    dxw, dwh_tiles = pl.pallas_call(
        functools.partial(_bwd_kernel, t_total=t, reverse=reverse, hp=hp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bb, hp), rev_map),
            pl.BlockSpec((1, bb, 4 * hp), rev_map),
            pl.BlockSpec((1, bb, hp), rev_map),
            pl.BlockSpec((1, bb, hp), rev_map),
            pl.BlockSpec((1, bb, hp), rev_map),
            pl.BlockSpec((4 * hp, hp), lambda b_, t_: (0, 0)),
            pl.BlockSpec((bb, hp), lambda b_, t_: (b_, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bb, 4 * hp), rev_map),
            pl.BlockSpec((1, hp, 4 * hp), lambda b_, t_: (b_, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, hp), jnp.float32),
            pltpu.VMEM((bb, hp), jnp.float32),
            pltpu.VMEM((hp, 4 * hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t, b_pad, 4 * hp), jnp.float32),
            jax.ShapeDtypeStruct((b_pad // bb, hp, 4 * hp), jnp.float32),
        ],
        interpret=interpret,
    )(gout, gates, c_all, c_prev, h_prev, whT, len_map)
    return dxw, jnp.sum(dwh_tiles, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _lstm_seq(xw_p, wh_p, len_map, reverse, interpret):
    h_all, _, _ = _lstm_forward(xw_p, wh_p, len_map, reverse, interpret)
    return h_all


def _lstm_seq_fwd(xw_p, wh_p, len_map, reverse, interpret):
    h_all, c_all, gates = _lstm_forward(xw_p, wh_p, len_map, reverse, interpret)
    return h_all, (gates, c_all, h_all, wh_p, len_map)


def _lstm_seq_bwd(reverse, interpret, res, g):
    gates, c_all, h_all, wh_p, len_map = res
    dxw, dwh = _lstm_backward(
        g.astype(jnp.float32), gates, c_all, h_all, wh_p, len_map,
        reverse, interpret,
    )
    return dxw, dwh, jnp.zeros_like(len_map)


_lstm_seq.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)


@shard_over_batch(batched=(0, 2))  # xw, lengths; w_hh replicated
def lstm_pallas(
    xw: jnp.ndarray,
    w_hh: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    reverse: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Run one LSTM direction over a padded batch.

    Args:
        xw: (B, T, 4H) precomputed input projection x·W_ih + b, gate order
            i, f, g, o along the last axis.
        w_hh: (H, 4H) recurrent weights.
        lengths: (B,) valid step counts; padded steps emit the carried h.
        reverse: process t = T-1..0 (the backward direction of a BiLSTM).

    Returns:
        (B, T, H) hidden states, differentiable wrt ``xw`` and ``w_hh``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, h4 = xw.shape
    h = h4 // 4
    hp = _round_up(h, LANES)
    bb = _pick_bb(b, hp)
    b_pad = _round_up(b, bb)

    xw_p = _pad_gates_lanes(xw.astype(jnp.float32), h, hp)
    xw_p = jnp.pad(jnp.moveaxis(xw_p, 1, 0), ((0, 0), (0, b_pad - b), (0, 0)))
    wh_p = _pad_gates_lanes(
        jnp.pad(w_hh.astype(jnp.float32), ((0, hp - h), (0, 0))), h, hp
    )
    len_map = jnp.pad(
        jnp.broadcast_to(lengths.astype(jnp.float32)[:, None], (b, hp)),
        ((0, b_pad - b), (0, 0)),
    )

    h_all = _lstm_seq(xw_p, wh_p, len_map, reverse, interpret)
    return jnp.moveaxis(h_all[:, :b, :h], 0, 1)


def lstm_reference(xw, w_hh, lengths, reverse=False):
    """lax.scan twin of `lstm_pallas` for parity tests."""
    b, t, h4 = xw.shape
    h = h4 // 4

    def step(carry, inp):
        hx, cx = carry
        lin_t, t_idx = inp
        lin = lin_t + hx @ w_hh
        i = jax.nn.sigmoid(lin[:, :h])
        f = jax.nn.sigmoid(lin[:, h:2 * h])
        g = jnp.tanh(lin[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(lin[:, 3 * h:])
        c_new = f * cx + i * g
        h_new = o * jnp.tanh(c_new)
        active = (t_idx < lengths)[:, None]
        h_out = jnp.where(active, h_new, hx)
        c_out = jnp.where(active, c_new, cx)
        return (h_out, c_out), h_out

    ts = jnp.arange(t)
    xs = jnp.moveaxis(xw, 1, 0)
    if reverse:
        xs, ts = xs[::-1], ts[::-1]
    init = (jnp.zeros((b, h), xw.dtype), jnp.zeros((b, h), xw.dtype))
    _, hs = jax.lax.scan(step, init, (xs, ts))
    if reverse:
        hs = hs[::-1]
    return jnp.moveaxis(hs, 0, 1)
