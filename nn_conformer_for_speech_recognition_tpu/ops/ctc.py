"""CTC loss — log-space forward (alpha) recursion under ``lax.scan``.

TPU-native replacement for the reference's ``torch.nn.CTCLoss(blank=blank_idx,
zero_infinity=True)`` (`lib/standard/runner.py:35,143`).  The recursion is a
single ``lax.scan`` over time with fully static shapes: labels are padded to a
fixed max length, the extended (blank-interleaved) sequence has static length
2L+1, and per-example input/label lengths enter only through masks — no
data-dependent control flow, so the whole loss jits and differentiates
(backward = autodiff through the scan).

``zero_infinity`` semantics are reproduced: when a target is longer than the
input permits (no valid alignment), the loss is zeroed instead of inf
(`runner.py:35`), replacing the reference's downstream NaN→100 metric hack
(`runner.py:166`) with a well-defined value.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

LOG_EPS = -1e30  # effectively log(0) without producing nan gradients


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.where(m <= LOG_EPS, 0.0, m)
    # subtracting m_safe keeps exps ≤ 1; clamping the sum away from 0 keeps
    # log (and its gradient) finite when every operand is log(0)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    out = m_safe + jnp.log(jnp.maximum(s, 1e-37))
    return jnp.where(m <= LOG_EPS, LOG_EPS, out)


def ctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    zero_infinity: bool = True,
    reduction: Optional[str] = "mean",
) -> jnp.ndarray:
    """Connectionist Temporal Classification loss.

    Args:
        log_probs: (B, T, V) log-softmax outputs.
        labels: (B, L) int32 target ids (padded arbitrarily beyond length).
        input_lengths: (B,) valid frame counts.
        label_lengths: (B,) valid label counts.
        blank_id: index of the CTC blank (reference: `<blank>` at
            vocab position per `myvocab.py:94-99`).
        reduction: 'mean' (torch CTCLoss default: sum over batch of
            per-sequence loss / label_length, then mean), 'sum', or None.

    Returns:
        scalar (reduced) or (B,) per-sequence negative log-likelihood.
    """
    b, t, v = log_probs.shape
    l = labels.shape[1]
    s = 2 * l + 1

    # Extended label sequence z: blank, y1, blank, y2, ..., blank. (B, S)
    ext = jnp.full((b, s), blank_id, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)

    # Can alpha skip from s-2? Only for non-blank positions whose label
    # differs from the label two back.
    prev2 = jnp.concatenate([jnp.full((b, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1)
    is_label_pos = (jnp.arange(s)[None, :] % 2) == 1
    can_skip = is_label_pos & (ext != prev2)

    # Positions beyond the true extended length 2*label_len+1 are invalid.
    ext_len = 2 * label_lengths + 1
    valid_pos = jnp.arange(s)[None, :] < ext_len[:, None]

    # alpha_0
    lp0 = jnp.take_along_axis(log_probs[:, 0, :], ext, axis=1)  # (B, S)
    alpha0 = jnp.where(jnp.arange(s)[None, :] < 2, lp0, LOG_EPS)
    alpha0 = jnp.where(valid_pos, alpha0, LOG_EPS)

    def step(alpha, lp_t):
        lp, t_idx = lp_t
        emit = jnp.take_along_axis(lp, ext, axis=1)  # (B, S)
        shift1 = jnp.concatenate([jnp.full((b, 1), LOG_EPS), alpha[:, :-1]], axis=1)
        shift2 = jnp.concatenate([jnp.full((b, 2), LOG_EPS), alpha[:, :-2]], axis=1)
        shift2 = jnp.where(can_skip, shift2, LOG_EPS)
        new = _logaddexp3(alpha, shift1, shift2) + emit
        new = jnp.where(valid_pos, new, LOG_EPS)
        # frames at/after input_length leave alpha unchanged
        active = (t_idx < input_lengths)[:, None]
        new = jnp.where(active, new, alpha)
        return new, None

    lps = jnp.moveaxis(log_probs[:, 1:, :], 1, 0)  # (T-1, B, V)
    t_ids = jnp.arange(1, t)
    alpha_final, _ = jax.lax.scan(step, alpha0, (lps, t_ids))

    # NLL = -logsumexp(alpha[2L], alpha[2L-1]) at the final extended positions.
    idx_last = (ext_len - 1)[:, None]
    idx_prev = jnp.maximum(ext_len - 2, 0)[:, None]
    a_last = jnp.take_along_axis(alpha_final, idx_last, axis=1)[:, 0]
    a_prev = jnp.take_along_axis(alpha_final, idx_prev, axis=1)[:, 0]
    # degenerate empty label (len 0): only the single blank position counts
    a_prev = jnp.where(ext_len[...] >= 2, a_prev, LOG_EPS)
    ll = jnp.logaddexp(a_last, a_prev)
    nll = -ll

    if zero_infinity:
        # impossible alignment (e.g. label too long for input) → 0, matching
        # torch's zero_infinity=True.
        impossible = ll <= LOG_EPS / 2
        nll = jnp.where(impossible, 0.0, nll)

    if reduction is None or reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        # torch CTCLoss 'mean': per-seq loss / target_length, then batch mean.
        denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")


def ctc_loss_from_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    **kw,
) -> jnp.ndarray:
    """Convenience wrapper applying log_softmax first."""
    return ctc_loss(
        jax.nn.log_softmax(logits, axis=-1),
        labels,
        input_lengths,
        label_lengths,
        blank_id=blank_id,
        **kw,
    )
