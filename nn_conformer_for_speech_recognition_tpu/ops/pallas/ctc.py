"""Fused CTC loss Pallas kernel (alpha forward / beta backward recursions).

TPU-native replacement for the ``lax.scan`` CTC in `ops/ctc.py` (itself the
port target of the reference's ``torch.nn.CTCLoss``, `lib/standard/
runner.py:35,143`).  The scan version launches T tiny XLA loop iterations;
here the whole recursion is ONE kernel: the grid walks (batch-tile,
time-block) with the time axis innermost/sequential, the (BB, S_pad) alpha
lives in VMEM scratch across time blocks, and each grid cell unrolls
``time_block`` recursion steps on the VPU — no per-step loop overhead, no
HBM round-trips for the carry.

Layout: states S (= 2L+1 blank-interleaved positions) on the 128-lane axis,
batch rows on sublanes; the s-1 / s-2 shifts of the recursion are
``pltpu.roll``s along lanes.  Per-example input lengths enter as broadcast
(B, S) maps so inactive frames elementwise-carry the state — no
data-dependent control flow anywhere.

Backward is the classic beta recursion in a second kernel (time reversed via
BlockSpec index maps): d ll / d emit[t, s] = exp(alpha[t,s] + beta[t,s] - ll).
The emit gather (log_probs at blank-interleaved label ids) and its scatter
adjoint stay in XLA outside the custom_vjp boundary, so ``labels`` never
enter the kernel.

``zero_infinity`` / reduction semantics are shared with the XLA version via
`ops.ctc.apply_reduction`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nn_conformer_for_speech_recognition_tpu.ops.ctc import (
    LOG_EPS,
    _logaddexp3,
    apply_reduction,
    emit_log_probs,
    extended_labels,
)

from nn_conformer_for_speech_recognition_tpu.parallel.kernel_sharding import (
    shard_over_batch,
)

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _alpha_kernel(
    emit_ref,  # (TT, BB, S_pad)
    canskip_ref,  # (BB, S_pad) f32 (0/1)
    valid_ref,  # (BB, S_pad) f32 (0/1)
    len_ref,  # (BB, S_pad) f32, input_lengths broadcast over lanes
    alpha_out_ref,  # (TT, BB, S_pad)
    alpha_scr,  # VMEM (BB, S_pad) f32
    *,
    time_block: int,
):
    t_blk = pl.program_id(1)
    canskip = canskip_ref[...] > 0.0
    valid = valid_ref[...] > 0.0
    lens = len_ref[...]
    shape = alpha_scr.shape
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    for tt in range(time_block):
        emit = emit_ref[tt]
        t_real = t_blk * time_block + tt
        a = alpha_scr[...]
        s1 = pltpu.roll(a, 1, axis=1)
        s1 = jnp.where(col >= 1, s1, LOG_EPS)
        s2 = pltpu.roll(a, 2, axis=1)
        s2 = jnp.where((col >= 2) & canskip, s2, LOG_EPS)
        new = _logaddexp3(a, s1, s2) + emit
        new = jnp.where(valid, new, LOG_EPS)
        # frames at/after input_length carry alpha through unchanged
        upd = jnp.where(t_real < lens, new, a)
        if tt == 0:
            # t_real == 0 only in the first time block: alpha_0 init
            # (overwrites the uninitialised scratch; garbage never escapes)
            init = jnp.where((col < 2) & valid, emit, LOG_EPS)
            upd = jnp.where(t_real == 0, init, upd)
        alpha_scr[...] = upd
        alpha_out_ref[tt] = upd


def _beta_kernel(
    emitnext_ref,  # (TT, BB, S_pad): emit at t+1 (time-shifted outside)
    alpha_ref,  # (TT, BB, S_pad)
    canskip_ref,  # (BB, S_pad) f32
    valid_ref,  # (BB, S_pad) f32
    fin_ref,  # (BB, S_pad) f32 — final extended positions {2L, 2L-1}
    len_ref,  # (BB, S_pad) f32
    gll_ref,  # (BB, S_pad) f32 — incoming cotangent g broadcast
    ll_ref,  # (BB, S_pad) f32 — per-row log-likelihood broadcast
    demit_ref,  # (TT, BB, S_pad)
    beta_scr,  # VMEM (BB, S_pad) f32
    *,
    time_block: int,
    t_pad: int,
):
    t_blk_rev = pl.program_id(1)  # walks time blocks last-to-first (index map)
    canskip = canskip_ref[...] > 0.0
    valid = valid_ref[...] > 0.0
    fin = fin_ref[...] > 0.0
    lens = len_ref[...]
    gll = gll_ref[...]
    ll = ll_ref[...]
    shape = beta_scr.shape
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    s_pad = shape[1]
    n_tblocks = t_pad // time_block
    init = jnp.where(fin, 0.0, LOG_EPS)

    for k in range(time_block):
        tt = time_block - 1 - k
        t_real = (n_tblocks - 1 - t_blk_rev) * time_block + tt
        b_next = beta_scr[...]  # beta_{t+1}
        eb = emitnext_ref[tt] + b_next
        eb = jnp.where(valid, eb, LOG_EPS)
        t2 = pltpu.roll(eb, s_pad - 1, axis=1)  # eb[s+1]
        t2 = jnp.where(col < s_pad - 1, t2, LOG_EPS)
        ebs = jnp.where(canskip, eb, LOG_EPS)
        t3 = pltpu.roll(ebs, s_pad - 2, axis=1)  # can_skip[s+2] ? eb[s+2]
        t3 = jnp.where(col < s_pad - 2, t3, LOG_EPS)
        new = _logaddexp3(eb, t2, t3)
        new = jnp.where(valid, new, LOG_EPS)
        # the transition into t+1 exists only while t < len-1; otherwise the
        # end-state init carries (alpha was carried forward symmetrically)
        beta = jnp.where(t_real < lens - 1, new, b_next)
        # global last step: overwrite the uninitialised scratch
        beta = jnp.where(t_real == t_pad - 1, init, beta)
        beta_scr[...] = beta
        # posterior; alpha+beta ≤ ll always, clamp keeps exp finite when
        # ll = LOG_EPS (impossible alignment; its cotangent is 0 anyway)
        post = jnp.exp(jnp.minimum(alpha_ref[tt] + beta - ll, 0.0))
        demit = gll * post
        demit_ref[tt] = jnp.where((t_real < lens) & valid, demit, 0.0)


def _pick_blocks(b: int, s_pad: int, time_block: int):
    bb = min(LANES, _round_up(b, 8))
    # keep the dominant (TT, BB, S_pad) blocks ≲ 2 MB of VMEM each
    while bb > 8 and time_block * bb * s_pad * 4 > 2 * 1024 * 1024:
        bb //= 2
    return bb


@functools.partial(jax.jit, static_argnames=("time_block", "interpret"))
def _alpha_forward(emit_tbs, canskip_f, valid_f, len_map, time_block, interpret):
    t_pad, b_pad, s_pad = emit_tbs.shape
    bb = _pick_blocks(b_pad, s_pad, time_block)
    grid = (b_pad // bb, t_pad // time_block)
    return pl.pallas_call(
        functools.partial(_alpha_kernel, time_block=time_block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((time_block, bb, s_pad), lambda b_, t_: (t_, b_, 0)),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
        ],
        out_specs=pl.BlockSpec((time_block, bb, s_pad), lambda b_, t_: (t_, b_, 0)),
        scratch_shapes=[pltpu.VMEM((bb, s_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, s_pad), jnp.float32),
        interpret=interpret,
    )(emit_tbs, canskip_f, valid_f, len_map)


@functools.partial(jax.jit, static_argnames=("time_block", "interpret"))
def _beta_backward(
    emit_tbs, alpha_tbs, canskip_f, valid_f, fin_f, len_map, gll, ll,
    time_block, interpret,
):
    t_pad, b_pad, s_pad = emit_tbs.shape
    bb = _pick_blocks(b_pad, s_pad, time_block)
    n_tblocks = t_pad // time_block
    grid = (b_pad // bb, n_tblocks)
    # emitnext[t] = emit[t+1]; final row is never read through an active
    # transition (t = T_pad-1 is always the init step)
    emitnext = jnp.concatenate(
        [emit_tbs[1:], jnp.full((1, b_pad, s_pad), LOG_EPS, emit_tbs.dtype)], axis=0
    )
    gll_map = jnp.broadcast_to(gll[:, None], (b_pad, s_pad))
    ll_map = jnp.broadcast_to(ll[:, None], (b_pad, s_pad))

    def rev_t(b_, t_):
        return (n_tblocks - 1 - t_, b_, 0)

    return pl.pallas_call(
        functools.partial(_beta_kernel, time_block=time_block, t_pad=t_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((time_block, bb, s_pad), rev_t),
            pl.BlockSpec((time_block, bb, s_pad), rev_t),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
            pl.BlockSpec((bb, s_pad), lambda b_, t_: (b_, 0)),
        ],
        out_specs=pl.BlockSpec((time_block, bb, s_pad), rev_t),
        scratch_shapes=[pltpu.VMEM((bb, s_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, s_pad), jnp.float32),
        interpret=interpret,
    )(emitnext, alpha_tbs, canskip_f, valid_f, fin_f, len_map, gll_map, ll_map)


def _final_ll(alpha_last, fin_f):
    """Masked logsumexp of the final alpha over the end states."""
    a_fin = jnp.where(fin_f > 0.0, alpha_last, LOG_EPS)
    m = jnp.max(a_fin, axis=1)
    m_safe = jnp.where(m <= LOG_EPS / 2, 0.0, m)
    ll = m_safe + jnp.log(
        jnp.maximum(jnp.sum(jnp.exp(a_fin - m_safe[:, None]), axis=1), 1e-37)
    )
    return jnp.where(m <= LOG_EPS / 2, LOG_EPS, ll)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ctc_ll(emit_tbs, canskip_f, valid_f, fin_f, len_map, time_block, interpret):
    """(T_pad, B_pad, S_pad) emit log-probs → per-row log-likelihood (B_pad,)."""
    alpha = _alpha_forward(emit_tbs, canskip_f, valid_f, len_map, time_block, interpret)
    return _final_ll(alpha[-1], fin_f)


def _ctc_ll_fwd(emit_tbs, canskip_f, valid_f, fin_f, len_map, time_block, interpret):
    alpha = _alpha_forward(emit_tbs, canskip_f, valid_f, len_map, time_block, interpret)
    ll = _final_ll(alpha[-1], fin_f)
    return ll, (emit_tbs, alpha, canskip_f, valid_f, fin_f, len_map, ll)


def _ctc_ll_bwd(time_block, interpret, res, g):
    emit_tbs, alpha, canskip_f, valid_f, fin_f, len_map, ll = res
    demit = _beta_backward(
        emit_tbs, alpha, canskip_f, valid_f, fin_f, len_map,
        g.astype(jnp.float32), ll, time_block, interpret,
    )
    zeros = jnp.zeros_like(canskip_f)
    return demit, zeros, zeros, zeros, jnp.zeros_like(len_map)  # len_map is f32


_ctc_ll.defvjp(_ctc_ll_fwd, _ctc_ll_bwd)


@shard_over_batch(batched=(0, 1, 2, 3))
def _ctc_ll_batched(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int,
    time_block: int,
    interpret: Optional[bool],
) -> jnp.ndarray:
    """Per-sample CTC log-likelihood (B,) — the batch-elementwise kernel
    core, shard-mapped over the data axis on multi-chip meshes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, v = log_probs.shape
    ext, can_skip, valid_pos, ext_len = extended_labels(
        labels, label_lengths, blank_id
    )
    s = ext.shape[1]

    # emit[b, t, s] = log_probs[b, t, ext[b, s]] — one-hot MXU contraction
    # (77× faster than the take_along_axis gather on v5e, and its adjoint is
    # a matmul rather than a scatter); stays in XLA outside the custom_vjp
    # so d log_probs is handled by autodiff.
    emit = emit_log_probs(log_probs.astype(jnp.float32), ext)

    s_pad = _round_up(s, LANES)
    t_pad = _round_up(t, time_block)
    bb = _pick_blocks(b, s_pad, time_block)
    b_pad = _round_up(b, bb)

    emit_tbs = jnp.pad(
        jnp.moveaxis(emit, 1, 0),
        ((0, t_pad - t), (0, b_pad - b), (0, s_pad - s)),
        constant_values=LOG_EPS,
    )

    def pad_bs(x, dtype):
        return jnp.pad(
            x.astype(dtype), ((0, b_pad - b), (0, s_pad - s))
        )

    pos = jnp.arange(s)[None, :]
    fin = (pos == (ext_len - 1)[:, None]) | (
        (pos == (ext_len - 2)[:, None]) & (ext_len >= 2)[:, None]
    )
    canskip_f = pad_bs(can_skip, jnp.float32)
    valid_f = pad_bs(valid_pos, jnp.float32)
    fin_f = pad_bs(fin, jnp.float32)
    len_map = jnp.pad(
        jnp.broadcast_to(input_lengths.astype(jnp.float32)[:, None], (b, s_pad)),
        ((0, b_pad - b), (0, 0)),
    )

    return _ctc_ll(
        emit_tbs, canskip_f, valid_f, fin_f, len_map, time_block, interpret
    )[:b]


def ctc_loss_pallas(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    zero_infinity: bool = True,
    reduction: Optional[str] = "mean",
    *,
    time_block: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in for `ops.ctc.ctc_loss` with the recursion fused in Pallas.

    Same arguments/semantics as the XLA version (torch-CTCLoss parity incl.
    ``zero_infinity``, `runner.py:35`); differentiable wrt ``log_probs``.
    ``interpret=None`` auto-selects interpret mode off-TPU so the trainer's
    ``ctc_impl='pallas'`` stays runnable on the CPU test mesh.

    The per-sample likelihood runs batch-sharded when a kernel mesh is
    active (`parallel/kernel_sharding.py`); the reduction is global, outside
    the shard_map.
    """
    ll = _ctc_ll_batched(
        log_probs, labels, input_lengths, label_lengths, blank_id,
        time_block, interpret,
    )
    return apply_reduction(-ll, ll, label_lengths, zero_infinity, reduction)
