"""Flash attention Pallas kernel with relative-position bias + length masking.

Blockwise online-softmax attention (Dao et al.; tiling per the JAX Pallas
flash implementation): the (T, T) score matrix is never materialised —
per-(batch, head, q-tile) the kernel walks kv-tiles maintaining running max
``m``, normaliser ``l`` and output accumulator in VMEM, all in f32.

The Transformer-XL relative-position term (q+v_bias)·r_{j-i} is supplied as
an additive bias input (computed once per layer by XLA's take_along_axis
path, `models/conformer.py`), and the content bias u is folded into q before
the kernel — so the kernel computes softmax(qu·kᵀ·scale + bias + mask) · v
with no interior gathers.  Length masking uses broadcasted_iota against the
per-batch valid length (mask_value −1e30, not −inf, to keep exp() NaN-free).

The rel-pos variant's backward is ALSO blockwise Pallas (``jax.custom_vjp``
→ `_flash_relpos_backward`): dq/dkv kernels recompute score tiles from the
saved logsumexp (Dao et al. backward recipe), and a third diagonal-band
kernel accumulates the rel-pos *table* gradient per band slice — training
memory stays O(T) per block end-to-end.  The plain bias-input variant keeps
an einsum backward (its bias input is O(T²) by construction).  Supersedes
the reference's `nn.MultiheadAttention` usage
(`unused_lib/conformer.py:92-105`).
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

MASK_VALUE = -1e30
LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention_reference(
    qu: jnp.ndarray,  # (B, T, H, dh) — q + u_bias
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (B, H, T, T) additive (rel-pos term, pre-scaled or not)
    lengths: jnp.ndarray,  # (B,)
    scale: float,
) -> jnp.ndarray:
    t = qu.shape[1]
    scores = jnp.einsum("bihd,bjhd->bhij", qu, k, preferred_element_type=jnp.float32)
    scores = (scores + bias) * scale
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    scores = jnp.where(mask, scores, MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhij,bjhd->bihd", p, v).astype(qu.dtype)


def _flash_kernel(
    len_ref,  # SMEM (B,) int32
    qu_ref,  # (1, 1, block_q, dh)
    k_ref,  # (1, 1, block_k, dh)
    v_ref,  # (1, 1, block_k, dh)
    bias_ref,  # (1, 1, block_q, block_k)
    o_ref,  # (1, 1, block_q, dh)
    m_scr,  # VMEM (block_q, LANES)
    l_scr,  # VMEM (block_q, LANES)
    acc_scr,  # VMEM (block_q, dh)
    *,
    scale: float,
    block_q: int,
    block_k: int,
    kv_tiles: int,
):
    b = pl.program_id(0)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, MASK_VALUE, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    qu = qu_ref[0, 0]
    kk = k_ref[0, 0]
    s = jax.lax.dot_general(
        qu, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    s = (s + bias_ref[0, 0]) * scale

    # length mask on keys
    valid_len = len_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
    s = jnp.where(col < valid_len, s, MASK_VALUE)

    m_prev = m_scr[:, :1]  # (block_q, 1)
    l_prev = l_scr[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    vv = v_ref[0, 0]
    o_curr = jax.lax.dot(
        p.astype(vv.dtype), vv, preferred_element_type=jnp.float32
    )
    acc_scr[...] = acc_scr[...] * alpha + o_curr

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        l_final = l_scr[:, :1]
        inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scr[...] * inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def _flash_forward(
    qu, k, v, bias, lengths, scale, block_q=128, block_k=128, interpret=None
):
    if interpret is None:  # auto: interpret off-TPU so CPU tests/mesh work
        interpret = jax.default_backend() != "tpu"
    b, t, h, dh = qu.shape
    # clamp blocks to the (8-aligned) sequence length: short utterances
    # (1s clips are 8 frames post-subsampling) would otherwise pad to a full
    # 128-tile and waste 16x the FLOPs
    block_q = min(block_q, _round_up(t, 8))
    block_k = min(block_k, _round_up(t, 8))
    t_pad = _round_up(t, max(block_q, block_k))
    dh_pad = _round_up(dh, LANES)

    def pad_qkv(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, dh_pad - dh)))

    qu_p = jnp.moveaxis(pad_qkv(qu), 2, 1)  # (B, H, T_pad, dh_pad)
    k_p = jnp.moveaxis(pad_qkv(k), 2, 1)
    v_p = jnp.moveaxis(pad_qkv(v), 2, 1)
    bias_p = jnp.pad(bias, ((0, 0), (0, 0), (0, t_pad - t), (0, t_pad - t)))

    q_tiles = t_pad // block_q
    kv_tiles = t_pad // block_k

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
            kv_tiles=kv_tiles,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, q_tiles, kv_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, dh_pad), lambda b_, h_, q_, kv_, *_refs: (b_, h_, q_, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, dh_pad), lambda b_, h_, q_, kv_, *_refs: (b_, h_, kv_, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, dh_pad), lambda b_, h_, q_, kv_, *_refs: (b_, h_, kv_, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_q, block_k), lambda b_, h_, q_, kv_, *_refs: (b_, h_, q_, kv_)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, dh_pad), lambda b_, h_, q_, kv_, *_refs: (b_, h_, q_, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, dh_pad), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, dh_pad), qu.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qu_p, k_p, v_p, bias_p)
    return jnp.moveaxis(out, 1, 2)[:, :t, :, :dh]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention(qu, k, v, bias, lengths, scale):
    """(B, T, H, dh) attention with additive bias and valid-length masking."""
    return _flash_forward(qu, k, v, bias, lengths, scale)


def _fa_fwd(qu, k, v, bias, lengths, scale):
    return _flash_forward(qu, k, v, bias, lengths, scale), (qu, k, v, bias, lengths)


def _fa_bwd(scale, res, g):
    qu, k, v, bias, lengths = res
    t = qu.shape[1]
    scores = jnp.einsum("bihd,bjhd->bhij", qu, k, preferred_element_type=jnp.float32)
    scores = (scores + bias) * scale
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    scores = jnp.where(mask, scores, MASK_VALUE)
    p = jax.nn.softmax(scores, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhij,bihd->bjhd", p, g32).astype(v.dtype)
    dp = jnp.einsum("bihd,bjhd->bhij", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = jnp.where(mask, ds, 0.0)
    dbias = (ds * scale).astype(bias.dtype)
    dqu = jnp.einsum("bhij,bjhd->bihd", ds * scale, k.astype(jnp.float32)).astype(qu.dtype)
    dk = jnp.einsum("bhij,bihd->bjhd", ds * scale, qu.astype(jnp.float32)).astype(k.dtype)
    return dqu, dk, dv, dbias, None


flash_attention.defvjp(_fa_fwd, _fa_bwd)


@shard_over_batch(batched=(0, 1, 2, 6))  # q, k, v, mask; p/u/v replicated
def rel_attention_pallas(
    q: jnp.ndarray,  # (B, T, H, dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    p: jnp.ndarray,  # (2T-1, H, dh) projected rel-pos embeddings
    u_bias: jnp.ndarray,  # (H, dh)
    v_bias: jnp.ndarray,  # (H, dh)
    mask: jnp.ndarray,  # (B, T) bool validity
    scale: float,
) -> jnp.ndarray:
    """Drop-in for the einsum path in `models/conformer.RelPositionMHSA`:
    content bias folds into q, position bias into qv, and the kernel
    computes the rel-pos term in-VMEM from the O(T·H·dh) table — no
    O(B·H·T²) bias materialisation (see `flash_attention_relpos`)."""
    qu = q + u_bias[None, None]
    qv = q + v_bias[None, None]
    lengths = jnp.sum(mask.astype(jnp.int32), axis=1)
    return flash_attention_relpos(qu, qv, k, v, p, lengths, scale)


# ---------------------------------------------------------------------------
# True-flash variant: relative-position term computed IN-KERNEL
# ---------------------------------------------------------------------------
#
# The bias-input variant above needs an O(B·H·T²) rel-pos bias in HBM.  Here
# the Transformer-XL term is computed inside the kernel from the O(T·H·dh)
# projected embedding table: for the (q, kv) tile pair the band
# p[l0 : l0 + bq + bk] is loaded via two BlockSpec-indexed 128-row blocks
# (l0 = T - bq + bk·kv - bq·q is block-aligned by construction), the kernel
# computes qp = (q+v_bias) @ bandᵀ, and the skew bd[i,c] = qp[i, c+bq-1-i]
# is realised with a barrel shifter: log2(bq) row-masked rolls — no gathers,
# no T² memory.


def _skew(qp, bq: int, bk: int):
    """(bq, bq+bk) → (bq, bk): out[i, c] = qp[i, c + bq - 1 - i].

    Row i is rolled right by i via masked power-of-two rolls (barrel
    shifter), then a uniform left roll by bq-1 aligns the wanted diagonal
    band at column 0.
    """
    w = qp.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, qp.shape, 0)
    shift = 1
    while shift < bq:
        mask = (row_ids & shift) != 0
        qp = jnp.where(mask, pltpu.roll(qp, shift, axis=1), qp)
        shift *= 2
    # sheared[i, c] = qp[i, (c - i) mod w]; want col c + bq - 1
    qp = pltpu.roll(qp, w - (bq - 1), axis=1)  # left-roll by bq-1
    return qp[:, :bk]


def _flash_relpos_kernel(
    len_ref,  # SMEM (B,) int32
    qu_ref,  # (1, 1, block_q, dh)
    qv_ref,  # (1, 1, block_q, dh)
    k_ref,  # (1, 1, block_k, dh)
    v_ref,  # (1, 1, block_k, dh)
    p_lo_ref,  # (1, block_q, dh) rel-pos band, lower half
    p_hi_ref,  # (1, block_k, dh) rel-pos band, upper half
    o_ref,  # (1, 1, block_q, dh)
    lse_ref,  # (1, 1, block_q, LANES) or None — logsumexp residual for bwd
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    block_q: int,
    block_k: int,
    kv_tiles: int,
):
    b = pl.program_id(0)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, MASK_VALUE, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    qu = qu_ref[0, 0]
    kk = k_ref[0, 0]
    s = jax.lax.dot_general(
        qu, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    # in-kernel rel-pos term
    qv = qv_ref[0, 0]
    band = jnp.concatenate([p_lo_ref[0], p_hi_ref[0]], axis=0)  # (bq+bk, dh)
    qp = jax.lax.dot_general(
        qv, band, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bq+bk)
    s = (s + _skew(qp, block_q, block_k)) * scale

    valid_len = len_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
    s = jnp.where(col < valid_len, s, MASK_VALUE)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    vv = v_ref[0, 0]
    o_curr = jax.lax.dot(p.astype(vv.dtype), vv, preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha + o_curr

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        l_final = l_scr[:, :1]
        inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_scr[...] * inv).astype(o_ref.dtype)
        if lse_ref is not None:
            # logsumexp over valid keys, lanes-replicated so the backward
            # kernels can read it as a (block_q, LANES) tile and slice [:, :1]
            lse = m_scr[...] + jnp.log(jnp.maximum(l_scr[...], 1e-30))
            lse_ref[0, 0] = lse


@functools.partial(
    jax.jit, static_argnames=("scale", "block", "interpret", "return_lse")
)
def _flash_relpos_forward(
    qu, qv, k, v, p, lengths, scale, block=128, interpret=None, return_lse=False
):
    """p: (2T-1, H, dh) projected rel-pos table; everything else as before.

    Requires a single block size for q and kv so the band offset is
    block-aligned: l0 = T - block + block*(kv - q).
    """
    if interpret is None:  # auto: interpret off-TPU so CPU tests/mesh work
        interpret = jax.default_backend() != "tpu"
    b, t, h, dh = qu.shape
    block = min(block, _round_up(t, 8))
    t_pad = _round_up(t, block)
    dh_pad = _round_up(dh, LANES)

    def pad_qkv(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, dh_pad - dh)))

    qu_p = jnp.moveaxis(pad_qkv(qu), 2, 1)
    qv_p = jnp.moveaxis(pad_qkv(qv), 2, 1)
    k_p = jnp.moveaxis(pad_qkv(k), 2, 1)
    v_p = jnp.moveaxis(pad_qkv(v), 2, 1)

    # p rows l ∈ [0, 2T-1) encode distance (j - i) + (T-1) for the ORIGINAL
    # T; re-center for t_pad and pad to 2*t_pad rows:
    # l_pad = (j - i) + (t_pad - 1) → shift rows by (t_pad - t), then the
    # kernel's band offset arithmetic is exact.
    p_padded = jnp.zeros((2 * t_pad, h, dh_pad), p.dtype)
    p_padded = jax.lax.dynamic_update_slice(
        p_padded, jnp.pad(p, ((0, 0), (0, 0), (0, dh_pad - dh))), (t_pad - t, 0, 0)
    )
    p_hl = jnp.moveaxis(p_padded, 1, 0)  # (H, 2*t_pad, dh_pad)

    tiles = t_pad // block
    # band low block index: (t_pad/block - 1) + kv - q ; high: + 1.
    # The skew wants band row 0 ↔ l = l0 = t_pad - block + block*(kv - q)
    # and bd[i,c] = qv_i · p[l0 + (block-1) - i + c]  (verified in tests).

    kernel = functools.partial(
        _flash_relpos_kernel,
        scale=scale,
        block_q=block,
        block_k=block,
        kv_tiles=tiles,
    )
    if not return_lse:
        inner = kernel

        def kernel(len_ref, qu_r, qv_r, k_r, v_r, plo, phi, o_r, m_s, l_s, a_s):
            inner(len_ref, qu_r, qv_r, k_r, v_r, plo, phi, o_r, None, m_s, l_s, a_s)

    o_spec = pl.BlockSpec(
        (1, 1, block, dh_pad), lambda b_, h_, q_, kv_, *_r: (b_, h_, q_, 0)
    )
    lse_spec = pl.BlockSpec(
        (1, 1, block, LANES), lambda b_, h_, q_, kv_, *_r: (b_, h_, q_, 0)
    )
    o_shape = jax.ShapeDtypeStruct((b, h, t_pad, dh_pad), qu.dtype)
    lse_shape = jax.ShapeDtypeStruct((b, h, t_pad, LANES), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, tiles, tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block, dh_pad), lambda b_, h_, q_, kv_, *_r: (b_, h_, q_, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block, dh_pad), lambda b_, h_, q_, kv_, *_r: (b_, h_, q_, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block, dh_pad), lambda b_, h_, q_, kv_, *_r: (b_, h_, kv_, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block, dh_pad), lambda b_, h_, q_, kv_, *_r: (b_, h_, kv_, 0)
                ),
                pl.BlockSpec(
                    (1, block, dh_pad),
                    lambda b_, h_, q_, kv_, *_r: (h_, tiles - 1 + kv_ - q_, 0),
                ),
                pl.BlockSpec(
                    (1, block, dh_pad),
                    lambda b_, h_, q_, kv_, *_r: (h_, tiles + kv_ - q_, 0),
                ),
            ],
            out_specs=(o_spec, lse_spec) if return_lse else o_spec,
            scratch_shapes=[
                pltpu.VMEM((block, LANES), jnp.float32),
                pltpu.VMEM((block, LANES), jnp.float32),
                pltpu.VMEM((block, dh_pad), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        out_shape=(o_shape, lse_shape) if return_lse else o_shape,
        interpret=interpret,
    )(lengths.astype(jnp.int32), qu_p, qv_p, k_p, v_p, p_hl, p_hl)
    if return_lse:
        out, lse = out
        return jnp.moveaxis(out, 1, 2)[:, :t, :, :dh], lse
    return jnp.moveaxis(out, 1, 2)[:, :t, :, :dh]


# ---------------------------------------------------------------------------
# Flash BACKWARD for the rel-pos kernel: blockwise dqu/dqv/dk/dv AND the
# rel-pos table gradient, all O(T) memory — the score matrix is recomputed
# tile-by-tile from the saved logsumexp (Dao et al. backward recipe, extended
# with the Transformer-XL band term).
#
# Three kernels:
#   * dq-kernel   grid (b, h, q, kv): accumulates dqu, dqv per q-tile.
#   * dkv-kernel  grid (b, h, kv, q): accumulates dk, dv per kv-tile.
#   * dband-kernel grid (h, diff, b, q) with diff = tiles-1 + kv - q: for a
#     fixed diagonal offset the rel-pos band is the FIXED table slice
#     [block·diff, block·diff + 2·block) (the fwd's l0 = block·diff identity),
#     so the (b, q) inner loops accumulate the table gradient for that band
#     in VMEM and write it once — no O(T²) re-binning buffer.  The two
#     half-band outputs land in separate arrays (lo at block diff, hi at
#     block diff+1, stored shifted) and are summed by XLA afterwards.
# ---------------------------------------------------------------------------


def _unskew(dbd, bq: int, bk: int):
    """Adjoint of `_skew`: (bq, bk) → (bq, bq+bk) with
    out[i, m] = dbd[i, m - bq + 1 + i] where in-range, else 0."""
    w = bq + bk
    x = jnp.pad(dbd, ((0, 0), (0, w - bk)))
    x = pltpu.roll(x, bq - 1, axis=1)  # adjoint of the uniform left-roll
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < bq:  # row i left-rolled by i (adjoint of right-roll by i)
        mask = (row_ids & shift) != 0
        x = jnp.where(mask, pltpu.roll(x, w - shift, axis=1), x)
        shift *= 2
    return x


def _bwd_recompute(
    valid_len, qu_ref, qv_ref, k_ref, v_ref, p_lo_ref, p_hi_ref, do_ref,
    lse_ref, delta_ref, *, scale, block_q, block_k, kv_idx,
):
    """Shared tile recompute: returns (p, ds_scaled, band, do32, qu32, qv32)."""
    qu = qu_ref[0, 0].astype(jnp.float32)
    qv = qv_ref[0, 0].astype(jnp.float32)
    kk = k_ref[0, 0].astype(jnp.float32)
    vv = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    band = jnp.concatenate(
        [p_lo_ref[0], p_hi_ref[0]], axis=0
    ).astype(jnp.float32)  # (2·block, dh)

    s = jax.lax.dot_general(
        qu, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    qp = jax.lax.dot_general(
        qv, band, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = (s + _skew(qp, block_q, block_k)) * scale

    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
    lse = lse_ref[0, 0][:, :1]  # (block_q, 1)
    p = jnp.where(col < valid_len, jnp.exp(s - lse), 0.0)

    dp = jax.lax.dot_general(
        do, vv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = delta_ref[0, 0][:, :1]
    ds = p * (dp - delta) * scale
    return p, ds, band, do, qu, qv


def _flash_relpos_bwd_dq_kernel(
    len_ref, qu_ref, qv_ref, k_ref, v_ref, p_lo_ref, p_hi_ref, do_ref,
    lse_ref, delta_ref, dqu_ref, dqv_ref, dqu_scr, dqv_scr,
    *, scale, block_q, block_k, kv_tiles,
):
    b = pl.program_id(0)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dqu_scr[...] = jnp.zeros(dqu_scr.shape, jnp.float32)
        dqv_scr[...] = jnp.zeros(dqv_scr.shape, jnp.float32)

    _, ds, band, _, _, _ = _bwd_recompute(
        len_ref[b], qu_ref, qv_ref, k_ref, v_ref, p_lo_ref, p_hi_ref,
        do_ref, lse_ref, delta_ref,
        scale=scale, block_q=block_q, block_k=block_k, kv_idx=kv_idx,
    )
    kk = k_ref[0, 0].astype(jnp.float32)
    dqu_scr[...] += jax.lax.dot(ds, kk, preferred_element_type=jnp.float32)
    dqp = _unskew(ds, block_q, block_k)  # (block_q, 2·block)
    dqv_scr[...] += jax.lax.dot(dqp, band, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_tiles - 1)
    def _store():
        dqu_ref[0, 0] = dqu_scr[...].astype(dqu_ref.dtype)
        dqv_ref[0, 0] = dqv_scr[...].astype(dqv_ref.dtype)


def _flash_relpos_bwd_dkv_kernel(
    len_ref, qu_ref, qv_ref, k_ref, v_ref, p_lo_ref, p_hi_ref, do_ref,
    lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, block_q, block_k, q_tiles,
):
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    p, ds, _, do, qu, _ = _bwd_recompute(
        len_ref[pl.program_id(0)], qu_ref, qv_ref, k_ref, v_ref,
        p_lo_ref, p_hi_ref, do_ref, lse_ref, delta_ref,
        scale=scale, block_q=block_q, block_k=block_k, kv_idx=kv_idx,
    )
    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_scr[...] += jax.lax.dot_general(
        ds, qu, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(q_idx == q_tiles - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_relpos_bwd_dband_kernel(
    len_ref, qu_ref, qv_ref, k_ref, v_ref, p_lo_ref, p_hi_ref, do_ref,
    lse_ref, delta_ref, dlo_ref, dhi_ref, dband_scr,
    *, scale, block, tiles, batch,
):
    d_idx = pl.program_id(1)
    b_idx = pl.program_id(2)
    q_idx = pl.program_id(3)
    kv_idx = q_idx + d_idx - (tiles - 1)  # may be out of [0, tiles)

    @pl.when(jnp.logical_and(b_idx == 0, q_idx == 0))
    def _init():
        dband_scr[...] = jnp.zeros(dband_scr.shape, jnp.float32)

    @pl.when(jnp.logical_and(kv_idx >= 0, kv_idx < tiles))
    def _accum():
        _, ds, _, _, _, qv = _bwd_recompute(
            len_ref[b_idx], qu_ref, qv_ref, k_ref, v_ref,
            p_lo_ref, p_hi_ref, do_ref, lse_ref, delta_ref,
            scale=scale, block_q=block, block_k=block, kv_idx=kv_idx,
        )
        dqp = _unskew(ds, block, block)  # (block, 2·block)
        dband_scr[...] += jax.lax.dot_general(
            dqp, qv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(jnp.logical_and(b_idx == batch - 1, q_idx == tiles - 1))
    def _store():
        dlo_ref[0] = dband_scr[:block].astype(dlo_ref.dtype)
        dhi_ref[0] = dband_scr[block:].astype(dhi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block", "interpret"))
def _flash_relpos_backward(
    qu, qv, k, v, p, lengths, scale, o, lse, g, block=128, interpret=None
):
    """Blockwise flash backward; returns (dqu, dqv, dk, dv, dp_table)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, h, dh = qu.shape
    block = min(block, _round_up(t, 8))
    t_pad = _round_up(t, block)
    dh_pad = _round_up(dh, LANES)
    tiles = t_pad // block

    def pad_qkv(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, dh_pad - dh)))

    qu_p = jnp.moveaxis(pad_qkv(qu), 2, 1)
    qv_p = jnp.moveaxis(pad_qkv(qv), 2, 1)
    k_p = jnp.moveaxis(pad_qkv(k), 2, 1)
    v_p = jnp.moveaxis(pad_qkv(v), 2, 1)
    do_p = jnp.moveaxis(pad_qkv(g), 2, 1)

    p_padded = jnp.zeros((2 * t_pad, h, dh_pad), p.dtype)
    p_padded = jax.lax.dynamic_update_slice(
        p_padded, jnp.pad(p, ((0, 0), (0, 0), (0, dh_pad - dh))), (t_pad - t, 0, 0)
    )
    p_hl = jnp.moveaxis(p_padded, 1, 0)  # (H, 2·t_pad, dh_pad)

    # delta_i = dO_i · O_i, lanes-replicated like lse
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # (B,T,H)
    delta = jnp.moveaxis(delta, 2, 1)  # (B,H,T)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, t_pad - t)))
    delta = jnp.broadcast_to(delta[..., None], (b, h, t_pad, LANES))

    lens32 = lengths.astype(jnp.int32)

    qkv_spec = lambda idx: pl.BlockSpec(
        (1, 1, block, dh_pad), idx
    )
    lane_spec = lambda idx: pl.BlockSpec((1, 1, block, LANES), idx)
    band_lo = lambda f: pl.BlockSpec((1, block, dh_pad), f)

    common_cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )

    # --- dq kernel: grid (b, h, q, kv) ---
    q_ix = lambda b_, h_, q_, kv_, *_r: (b_, h_, q_, 0)
    kv_ix = lambda b_, h_, q_, kv_, *_r: (b_, h_, kv_, 0)
    dqu_p, dqv_p = pl.pallas_call(
        functools.partial(
            _flash_relpos_bwd_dq_kernel,
            scale=scale, block_q=block, block_k=block, kv_tiles=tiles,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, tiles, tiles),
            in_specs=[
                qkv_spec(q_ix), qkv_spec(q_ix), qkv_spec(kv_ix), qkv_spec(kv_ix),
                band_lo(lambda b_, h_, q_, kv_, *_r: (h_, tiles - 1 + kv_ - q_, 0)),
                band_lo(lambda b_, h_, q_, kv_, *_r: (h_, tiles + kv_ - q_, 0)),
                qkv_spec(q_ix), lane_spec(q_ix), lane_spec(q_ix),
            ],
            out_specs=(qkv_spec(q_ix), qkv_spec(q_ix)),
            scratch_shapes=[
                pltpu.VMEM((block, dh_pad), jnp.float32),
                pltpu.VMEM((block, dh_pad), jnp.float32),
            ],
        ),
        compiler_params=common_cp,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, dh_pad), qu.dtype),
            jax.ShapeDtypeStruct((b, h, t_pad, dh_pad), qv.dtype),
        ),
        interpret=interpret,
    )(lens32, qu_p, qv_p, k_p, v_p, p_hl, p_hl, do_p, lse, delta)

    # --- dkv kernel: grid (b, h, kv, q) ---
    q_ix2 = lambda b_, h_, kv_, q_, *_r: (b_, h_, q_, 0)
    kv_ix2 = lambda b_, h_, kv_, q_, *_r: (b_, h_, kv_, 0)
    dk_p, dv_p = pl.pallas_call(
        functools.partial(
            _flash_relpos_bwd_dkv_kernel,
            scale=scale, block_q=block, block_k=block, q_tiles=tiles,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, tiles, tiles),
            in_specs=[
                qkv_spec(q_ix2), qkv_spec(q_ix2), qkv_spec(kv_ix2), qkv_spec(kv_ix2),
                band_lo(lambda b_, h_, kv_, q_, *_r: (h_, tiles - 1 + kv_ - q_, 0)),
                band_lo(lambda b_, h_, kv_, q_, *_r: (h_, tiles + kv_ - q_, 0)),
                qkv_spec(q_ix2), lane_spec(q_ix2), lane_spec(q_ix2),
            ],
            out_specs=(qkv_spec(kv_ix2), qkv_spec(kv_ix2)),
            scratch_shapes=[
                pltpu.VMEM((block, dh_pad), jnp.float32),
                pltpu.VMEM((block, dh_pad), jnp.float32),
            ],
        ),
        compiler_params=common_cp,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, t_pad, dh_pad), k.dtype),
            jax.ShapeDtypeStruct((b, h, t_pad, dh_pad), v.dtype),
        ),
        interpret=interpret,
    )(lens32, qu_p, qv_p, k_p, v_p, p_hl, p_hl, do_p, lse, delta)

    # --- dband kernel: grid (h, diff, b, q); kv = q + diff - (tiles-1) ---
    n_diag = 2 * tiles - 1

    def clamp_kv(d_, q_):
        return jnp.clip(q_ + d_ - (tiles - 1), 0, tiles - 1)

    q_ix3 = lambda h_, d_, b_, q_, *_r: (b_, h_, q_, 0)
    kv_ix3 = lambda h_, d_, b_, q_, *_r: (b_, h_, clamp_kv(d_, q_), 0)
    dlo, dhi = pl.pallas_call(
        functools.partial(
            _flash_relpos_bwd_dband_kernel,
            scale=scale, block=block, tiles=tiles, batch=b,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h, n_diag, b, tiles),
            in_specs=[
                qkv_spec(q_ix3), qkv_spec(q_ix3), qkv_spec(kv_ix3), qkv_spec(kv_ix3),
                band_lo(lambda h_, d_, b_, q_, *_r: (h_, d_, 0)),
                band_lo(lambda h_, d_, b_, q_, *_r: (h_, d_ + 1, 0)),
                qkv_spec(q_ix3), lane_spec(q_ix3), lane_spec(q_ix3),
            ],
            out_specs=(
                pl.BlockSpec((1, block, dh_pad), lambda h_, d_, b_, q_, *_r: (h_, d_, 0)),
                pl.BlockSpec((1, block, dh_pad), lambda h_, d_, b_, q_, *_r: (h_, d_, 0)),
            ),
            scratch_shapes=[pltpu.VMEM((2 * block, dh_pad), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, n_diag * block, dh_pad), jnp.float32),
            jax.ShapeDtypeStruct((h, n_diag * block, dh_pad), jnp.float32),
        ),
        interpret=interpret,
    )(lens32, qu_p, qv_p, k_p, v_p, p_hl, p_hl, do_p, lse, delta)

    # assemble the table gradient: lo covers rows [block·d, block·(d+1)),
    # hi (stored at block d) covers rows [block·(d+1), block·(d+2))
    dp_pad = jnp.pad(dlo, ((0, 0), (0, block), (0, 0))) + jnp.pad(
        dhi, ((0, 0), (block, 0), (0, 0))
    )  # (H, 2·t_pad, dh_pad)
    dp_table = jnp.moveaxis(dp_pad, 0, 1)[t_pad - t : t_pad + t - 1, :, :dh]

    unpad = lambda x: jnp.moveaxis(x, 1, 2)[:, :t, :, :dh]
    return (
        unpad(dqu_p), unpad(dqv_p), unpad(dk_p), unpad(dv_p),
        dp_table.astype(p.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def flash_attention_relpos(qu, qv, k, v, p, lengths, scale):
    """True-flash rel-pos attention: O(T·H·dh) inputs, no T² bias."""
    return _flash_relpos_forward(qu, qv, k, v, p, lengths, scale)


def _far_fwd(qu, qv, k, v, p, lengths, scale):
    o, lse = _flash_relpos_forward(qu, qv, k, v, p, lengths, scale, return_lse=True)
    return o, (qu, qv, k, v, p, lengths, o, lse)


def _far_bwd(scale, res, g):
    qu, qv, k, v, p, lengths, o, lse = res
    dqu, dqv, dk, dv, dp_table = _flash_relpos_backward(
        qu, qv, k, v, p, lengths, scale, o, lse, g
    )
    return dqu, dqv, dk, dv, dp_table, None


def _far_bwd_xla(scale, res, g):
    """Reference einsum backward (materialises O(B·H·T²)); kept for grad-
    parity tests against the blockwise Pallas backward."""
    from nn_conformer_for_speech_recognition_tpu.ops.relshift import (
        rel_shift,
        rel_shift_adjoint,
    )

    qu, qv, k, v, p, lengths = res[:6]
    b, t, h, dh = qu.shape
    bd_full = jnp.einsum("bihd,lhd->bhil", qv, p, preferred_element_type=jnp.float32)
    bias = rel_shift(bd_full)  # pad/reshape shift — no pathological gathers

    scores = jnp.einsum("bihd,bjhd->bhij", qu, k, preferred_element_type=jnp.float32)
    scores = (scores + bias) * scale
    mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :]
    scores = jnp.where(mask, scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhij,bihd->bjhd", probs, g32).astype(v.dtype)
    dp_ = jnp.einsum("bihd,bjhd->bhij", g32, v.astype(jnp.float32))
    ds = probs * (dp_ - jnp.sum(dp_ * probs, axis=-1, keepdims=True))
    ds = jnp.where(mask, ds, 0.0) * scale
    dqu = jnp.einsum("bhij,bjhd->bihd", ds, k.astype(jnp.float32)).astype(qu.dtype)
    dk = jnp.einsum("bhij,bihd->bjhd", ds, qu.astype(jnp.float32)).astype(k.dtype)
    # re-bin ds over relative distances: dbd_full[..., i, l] = ds[..., i, j]
    # with j = l - (T-1) + i — the exact adjoint of rel_shift (pad/reshape)
    dbd_full = rel_shift_adjoint(ds)
    dqv = jnp.einsum("bhil,lhd->bihd", dbd_full, p.astype(jnp.float32)).astype(qv.dtype)
    dp_table = jnp.einsum("bhil,bihd->lhd", dbd_full, qv.astype(jnp.float32)).astype(p.dtype)
    return dqu, dqv, dk, dv, dp_table, None


flash_attention_relpos.defvjp(_far_fwd, _far_bwd)
