"""Pallas kernel tests vs. pure-jnp references (interpret mode on CPU).

Each kernel has a jnp twin (SURVEY.md §7 build order item 6); compiled-mode
parity on real TPU hardware is exercised by bench/driver runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu.config import FeatureConfig
from nn_conformer_for_speech_recognition_tpu.ops.features import log_mel_spectrogram
from nn_conformer_for_speech_recognition_tpu.ops.pallas.attention import (
    _flash_forward,
    flash_attention,
    flash_attention_reference,
    rel_attention_pallas,
)
from nn_conformer_for_speech_recognition_tpu.ops.pallas.depthwise_conv import (
    _dw_forward,
    depthwise_conv1d_pallas,
    depthwise_conv1d_reference,
)
from nn_conformer_for_speech_recognition_tpu.ops.pallas.stft_logmel import (
    stft_logmel_pallas,
)


# ---------------------------------------------------------------- stft_logmel


def test_stft_logmel_matches_jnp(rng):
    cfg = FeatureConfig(normalize="none")
    x = jnp.asarray(rng.standard_normal((3, 16000)).astype(np.float32) * 0.1)
    got = stft_logmel_pallas(x, cfg, interpret=True)
    ref, _ = log_mel_spectrogram(x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_stft_logmel_unaligned_geometry_falls_back(rng):
    cfg = FeatureConfig(n_fft=400, hop_length=160, normalize="none")
    x = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
    got = stft_logmel_pallas(x, cfg, interpret=True)
    ref, _ = log_mel_spectrogram(x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_stft_logmel_odd_length(rng):
    cfg = FeatureConfig(normalize="none")
    x = jnp.asarray(rng.standard_normal((1, 24000)).astype(np.float32))
    got = stft_logmel_pallas(x, cfg, interpret=True)
    assert got.shape == (1, 24000 // 512 + 1, 40)


def test_stft_logmel_multi_tile_parity(rng):
    """hop == n_fft time-tiled blocking (the long-form VMEM fix): parity
    across several frame tiles, including the final partial tile."""
    cfg = FeatureConfig(normalize="none")
    x = jnp.asarray(rng.standard_normal((2, 60000)).astype(np.float32) * 0.1)
    got = stft_logmel_pallas(x, cfg, interpret=True)  # 118 frames → 4 tiles
    ref, _ = log_mel_spectrogram(x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_stft_logmel_misaligned_tile_t_falls_back(rng):
    """ADVICE round-4: a non-default tile_t whose audio block rows are not
    (8,128)-aligned (tile_t=4, hop=128 → 4 rows/tile) must not take the
    time-tiled layout — it routes to the whole-row path and stays exact."""
    cfg = FeatureConfig(n_fft=128, hop_length=128, normalize="none")
    x = jnp.asarray(rng.standard_normal((2, 6400)).astype(np.float32) * 0.1)
    got = stft_logmel_pallas(x, cfg, tile_t=4, interpret=True)
    ref, _ = log_mel_spectrogram(x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_stft_logmel_overlapping_geometry_parity(rng):
    """hop < n_fft (lane-aligned) rides the whole-row VMEM layout."""
    cfg = FeatureConfig(n_fft=256, hop_length=128, normalize="none")
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    got = stft_logmel_pallas(x, cfg, interpret=True)
    ref, _ = log_mel_spectrogram(x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


# ------------------------------------------------------------- depthwise conv


def test_depthwise_conv_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((2, 40, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((33, 64)).astype(np.float32) * 0.1)
    got = _dw_forward(x, w, interpret=True)
    ref = depthwise_conv1d_reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_depthwise_conv_matches_flax_conv(rng):
    """Same semantics as nn.Conv(feature_group_count=C, SAME) used in the
    non-pallas ConvModule path."""
    import flax.linen as nn

    c = 16
    x = jnp.asarray(rng.standard_normal((1, 20, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, c)).astype(np.float32))
    conv = nn.Conv(features=c, kernel_size=(7,), padding="SAME",
                   feature_group_count=c, use_bias=False)
    params = {"params": {"kernel": w[:, None, :]}}
    ref = conv.apply(params, x)
    got = depthwise_conv1d_reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_depthwise_conv_grads(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))

    def f_ref(x, w):
        return jnp.sum(depthwise_conv1d_reference(x, w) ** 2)

    def f_k(x, w):
        return jnp.sum(depthwise_conv1d_reference(x, w) ** 2)

    gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)

    # custom_vjp backward vs autodiff-of-reference
    def f_custom(x, w):
        from nn_conformer_for_speech_recognition_tpu.ops.pallas import depthwise_conv as D

        out, vjp = jax.vjp(lambda a, b: D._dw_bwd((a, b), jnp.ones((2, 16, 8))), x, w)
        return out

    dx, dw = f_custom(x, w)

    def f_lin(x, w):
        return jnp.sum(depthwise_conv1d_reference(x, w))

    gx_lin, gw_lin = jax.grad(f_lin, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gx_lin), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(gw_lin), atol=1e-4)


# ------------------------------------------------------------ flash attention


def _attn_case(rng, b=2, t=24, h=2, dh=16):
    qu = rng.standard_normal((b, t, h, dh)).astype(np.float32)
    k = rng.standard_normal((b, t, h, dh)).astype(np.float32)
    v = rng.standard_normal((b, t, h, dh)).astype(np.float32)
    bias = rng.standard_normal((b, h, t, t)).astype(np.float32) * 0.2
    lengths = np.array([t, t // 2], np.int32)[:b]
    return map(jnp.asarray, (qu, k, v, bias, lengths))


def test_flash_forward_matches_reference(rng):
    qu, k, v, bias, lengths = _attn_case(rng)
    got = _flash_forward(qu, k, v, bias, lengths, 0.25, block_q=8, block_k=8,
                         interpret=True)
    ref = flash_attention_reference(qu, k, v, bias, lengths, 0.25)
    # padded-key rows of the output for masked queries are irrelevant; compare
    # valid regions per example
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(ref)[0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got)[1, :12], np.asarray(ref)[1, :12], atol=1e-4
    )


def test_flash_forward_single_tile(rng):
    qu, k, v, bias, lengths = _attn_case(rng, b=1, t=16)
    got = _flash_forward(qu, k, v, bias, lengths, 1.0, block_q=16, block_k=16,
                         interpret=True)
    ref = flash_attention_reference(qu, k, v, bias, lengths, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_flash_backward_matches_reference_grads(rng):
    qu, k, v, bias, lengths = _attn_case(rng, b=1, t=12, h=1, dh=8)

    def loss_ref(qu, k, v, bias):
        return jnp.sum(flash_attention_reference(qu, k, v, bias, lengths, 0.5) ** 2)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qu, k, v, bias)

    from nn_conformer_for_speech_recognition_tpu.ops.pallas import attention as A

    def loss_custom(qu, k, v, bias):
        out = flash_attention_reference(qu, k, v, bias, lengths, 0.5)
        # reuse the custom bwd directly
        g = 2 * out
        return A._fa_bwd(0.5, (qu, k, v, bias, lengths), g)

    dqu, dk, dv, dbias, _ = loss_custom(qu, k, v, bias)
    np.testing.assert_allclose(np.asarray(dqu), np.asarray(grads_ref[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(grads_ref[1]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(grads_ref[2]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(grads_ref[3]), atol=2e-4)


def test_rel_attention_pallas_matches_einsum_path(rng, monkeypatch):
    """End-to-end MHSA parity: pallas path == jnp einsum path in the model."""
    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.models.conformer import (
        RelPositionMHSA, length_mask)
    from nn_conformer_for_speech_recognition_tpu.ops.pallas import attention as A

    # force interpret mode inside the model's pallas call
    orig = A._flash_relpos_forward
    monkeypatch.setattr(
        A, "_flash_relpos_forward",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )

    d, hH = 32, 2
    x = jnp.asarray(rng.standard_normal((2, 12, d)).astype(np.float32))
    mask = length_mask(jnp.array([12, 7]), 12)

    m_ref = RelPositionMHSA(d, hH, 0.0, use_relative=True, use_pallas=False)
    params = m_ref.init(jax.random.key(0), x, mask, True)
    out_ref = m_ref.apply(params, x, mask, True)

    m_pl = RelPositionMHSA(d, hH, 0.0, use_relative=True, use_pallas=True)
    out_pl = m_pl.apply(params, x, mask, True)

    r, p_ = np.asarray(out_ref), np.asarray(out_pl)
    np.testing.assert_allclose(p_[0], r[0], atol=2e-4)
    np.testing.assert_allclose(p_[1, :7], r[1, :7], atol=2e-4)


def test_flash_relpos_matches_bias_variant(rng):
    """In-kernel rel-pos band == bias-input formulation."""
    from nn_conformer_for_speech_recognition_tpu.ops.pallas.attention import (
        _flash_relpos_forward)
    import jax.numpy as jnp

    b, t, h, dh = 2, 24, 2, 16
    qu = jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
    qv = jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
    p = jnp.asarray(rng.standard_normal((2 * t - 1, h, dh)).astype(np.float32) * 0.3)
    lengths = jnp.array([24, 15])
    bd_full = jnp.einsum("bihd,lhd->bhil", qv, p)
    idx = (jnp.arange(t)[None, :] - jnp.arange(t)[:, None]) + (t - 1)
    bias = jnp.take_along_axis(bd_full, jnp.broadcast_to(idx, (b, h, t, t)), axis=-1)
    ref = flash_attention_reference(qu, k, v, bias, lengths, 0.25)
    got = _flash_relpos_forward(qu, qv, k, v, p, lengths, 0.25, block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(ref)[0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[1, :15], np.asarray(ref)[1, :15], atol=2e-5)


def test_flash_relpos_backward_matches_autodiff(rng):
    """Custom bwd (incl. the rel-distance scatter for dp/dqv) == autodiff of
    the bias-formulated reference."""
    from nn_conformer_for_speech_recognition_tpu.ops.pallas import attention as A

    b, t, h, dh = 1, 12, 2, 8
    qu, qv, k, v = (
        jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
        for _ in range(4)
    )
    p = jnp.asarray(rng.standard_normal((2 * t - 1, h, dh)).astype(np.float32) * 0.3)
    lengths = jnp.array([t - 3])

    def ref_fn(qu, qv, k, v, p):
        bd_full = jnp.einsum("bihd,lhd->bhil", qv, p)
        idx = (jnp.arange(t)[None, :] - jnp.arange(t)[:, None]) + (t - 1)
        bias = jnp.take_along_axis(bd_full, jnp.broadcast_to(idx, (b, h, t, t)), axis=-1)
        return jnp.sum(flash_attention_reference(qu, k, v, bias, lengths, 0.5) ** 2)

    grads_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)

    out = None
    # forward via the reference (same math), XLA-einsum bwd via _far_bwd_xla
    bd_full = jnp.einsum("bihd,lhd->bhil", qv, p)
    idx = (jnp.arange(t)[None, :] - jnp.arange(t)[:, None]) + (t - 1)
    bias = jnp.take_along_axis(bd_full, jnp.broadcast_to(idx, (b, h, t, t)), axis=-1)
    out = flash_attention_reference(qu, k, v, bias, lengths, 0.5)
    grads = A._far_bwd_xla(0.5, (qu, qv, k, v, p, lengths), 2 * out)
    names = ("dqu", "dqv", "dk", "dv", "dp")
    for name, got, ref in zip(names, grads[:5], grads_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, err_msg=name
        )


def test_flash_relpos_pallas_backward_matches_autodiff(rng):
    """The blockwise Pallas backward (dq/dkv/dband kernels through the real
    custom_vjp) == autodiff of the bias-formulated reference, with multiple
    q/kv tiles, ragged lengths and a padded-to-tile sequence."""
    from nn_conformer_for_speech_recognition_tpu.ops.pallas.attention import (
        flash_attention_relpos,
    )

    b, t, h, dh = 2, 20, 2, 16  # t=20 → t_pad=24 at block=8: 3 tiles + row pad
    qu, qv, k, v = (
        jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
        for _ in range(4)
    )
    p = jnp.asarray(rng.standard_normal((2 * t - 1, h, dh)).astype(np.float32) * 0.3)
    lengths = jnp.array([t, t - 7])

    def ref_fn(qu, qv, k, v, p):
        bd_full = jnp.einsum("bihd,lhd->bhil", qv, p)
        idx = (jnp.arange(t)[None, :] - jnp.arange(t)[:, None]) + (t - 1)
        bias = jnp.take_along_axis(
            bd_full, jnp.broadcast_to(idx, (b, h, t, t)), axis=-1
        )
        out = flash_attention_reference(qu, k, v, bias, lengths, 0.5)
        # only valid rows contribute (masked-query rows differ by design)
        row_ok = (jnp.arange(t)[None, :] < lengths[:, None])[..., None, None]
        return jnp.sum(jnp.where(row_ok, out, 0.0) ** 2)

    grads_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)

    def pallas_fn(qu, qv, k, v, p):
        out = flash_attention_relpos(qu, qv, k, v, p, lengths, 0.5)
        row_ok = (jnp.arange(t)[None, :] < lengths[:, None])[..., None, None]
        return jnp.sum(jnp.where(row_ok, out, 0.0) ** 2)

    grads = jax.grad(pallas_fn, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)
    names = ("dqu", "dqv", "dk", "dv", "dp")
    for name, got, ref in zip(names, grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-4, err_msg=name
        )


def test_flash_relpos_pallas_backward_single_tile(rng):
    """Single-tile degenerate case (tiles=1, diff grid of width 1)."""
    from nn_conformer_for_speech_recognition_tpu.ops.pallas.attention import (
        flash_attention_relpos,
    )

    b, t, h, dh = 1, 8, 1, 8
    qu, qv, k, v = (
        jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
        for _ in range(4)
    )
    p = jnp.asarray(rng.standard_normal((2 * t - 1, h, dh)).astype(np.float32) * 0.3)
    lengths = jnp.array([t])

    def ref_fn(qu, qv, k, v, p):
        bd_full = jnp.einsum("bihd,lhd->bhil", qv, p)
        idx = (jnp.arange(t)[None, :] - jnp.arange(t)[:, None]) + (t - 1)
        bias = jnp.take_along_axis(
            bd_full, jnp.broadcast_to(idx, (b, h, t, t)), axis=-1
        )
        return jnp.sum(flash_attention_reference(qu, k, v, bias, lengths, 0.5) ** 2)

    grads_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)

    def pallas_fn(qu, qv, k, v, p):
        return jnp.sum(flash_attention_relpos(qu, qv, k, v, p, lengths, 0.5) ** 2)

    grads = jax.grad(pallas_fn, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)
    for name, got, ref in zip(("dqu", "dqv", "dk", "dv", "dp"), grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-4, err_msg=name
        )


# ------------------------------------------------------------------ ctc loss


def _ctc_rand(rng, b, t, v, l, ilens, llens):
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    lp = jax.nn.log_softmax(logits, axis=-1)
    labels = jnp.asarray(rng.integers(1, v, size=(b, l)).astype(np.int32))
    return lp, labels, jnp.asarray(ilens, jnp.int32), jnp.asarray(llens, jnp.int32)


def test_ctc_pallas_matches_xla_fwd_and_grad(rng):
    from nn_conformer_for_speech_recognition_tpu.ops.ctc import ctc_loss
    from nn_conformer_for_speech_recognition_tpu.ops.pallas.ctc import ctc_loss_pallas

    # ragged inputs, an empty label, and an impossible alignment (ilen=3 <
    # needed frames for L=9 → zero_infinity path)
    lp, labels, ilen, llen = _ctc_rand(
        rng, 5, 37, 12, 9, [37, 30, 25, 37, 3], [9, 5, 0, 7, 9]
    )
    ref = ctc_loss(lp, labels, ilen, llen, blank_id=0, reduction=None)
    got = ctc_loss_pallas(
        lp, labels, ilen, llen, blank_id=0, reduction=None, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(
        lambda x: ctc_loss(x, labels, ilen, llen, blank_id=0, reduction="mean")
    )(lp)
    g_got = jax.grad(
        lambda x: ctc_loss_pallas(
            x, labels, ilen, llen, blank_id=0, reduction="mean", interpret=True
        )
    )(lp)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_ctc_pallas_long_labels_multi_lane_tile(rng):
    # S = 2*70+1 = 141 > 128: state axis spans two lane tiles, exercising the
    # cross-tile pltpu.roll shifts; T=50 not a multiple of time_block=8.
    from nn_conformer_for_speech_recognition_tpu.ops.ctc import ctc_loss
    from nn_conformer_for_speech_recognition_tpu.ops.pallas.ctc import ctc_loss_pallas

    b, t, v, l = 3, 150, 30, 70
    lp, labels, ilen, llen = _ctc_rand(
        rng, b, t, v, l, [150, 149, 144], [70, 64, 1]
    )
    ref = ctc_loss(lp, labels, ilen, llen, blank_id=0, reduction=None)
    got = ctc_loss_pallas(
        lp, labels, ilen, llen, blank_id=0, reduction=None, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=2e-4)

    g_ref = jax.grad(
        lambda x: ctc_loss(x, labels, ilen, llen, blank_id=0, reduction="sum")
    )(lp)
    g_got = jax.grad(
        lambda x: ctc_loss_pallas(
            x, labels, ilen, llen, blank_id=0, reduction="sum", interpret=True
        )
    )(lp)
    # f32 accumulation-order noise over 150 recursion steps: a handful of
    # elements land ~3e-4 apart between the scan and the kernel orderings
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=5e-4, atol=5e-4)


def test_ctc_pallas_repeated_labels(rng):
    # repeated tokens disable the skip transition (can_skip) — the part of
    # the recursion most easily broken by shift/mask bugs
    from nn_conformer_for_speech_recognition_tpu.ops.ctc import ctc_loss
    from nn_conformer_for_speech_recognition_tpu.ops.pallas.ctc import ctc_loss_pallas

    b, t, v = 2, 25, 6
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32)), axis=-1
    )
    labels = jnp.asarray([[2, 2, 2, 3, 3], [1, 2, 1, 2, 1]], jnp.int32)
    ilen = jnp.asarray([25, 25], jnp.int32)
    llen = jnp.asarray([5, 5], jnp.int32)
    ref = ctc_loss(lp, labels, ilen, llen, blank_id=0, reduction=None)
    got = ctc_loss_pallas(
        lp, labels, ilen, llen, blank_id=0, reduction=None, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------------ lstm


def test_lstm_pallas_matches_scan_reference(rng):
    from nn_conformer_for_speech_recognition_tpu.ops.pallas.lstm import (
        lstm_pallas,
        lstm_reference,
    )

    B, T, H = 5, 11, 7
    xw = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32) * 0.5)
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.3)
    lens = jnp.asarray([11, 7, 1, 11, 0], jnp.int32)

    for rev in (False, True):
        got = lstm_pallas(xw, wh, lens, reverse=rev, interpret=True)
        ref = lstm_reference(xw, wh, lens, reverse=rev)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

        def loss(f):
            def inner(xw, wh):
                out = f(xw, wh, lens, reverse=rev)
                return jnp.sum(jnp.sin(out) * jnp.arange(1, out.size + 1).reshape(out.shape))
            return inner

        gp = jax.grad(loss(lambda *a, **k: lstm_pallas(*a, interpret=True, **k)),
                      argnums=(0, 1))(xw, wh)
        gr = jax.grad(loss(lstm_reference), argnums=(0, 1))(xw, wh)
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=5e-4)
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), atol=5e-4)


def test_lstm_pallas_wide_hidden_multi_lane(rng):
    # H=160 > 128: gate chunks span lane-tile boundaries after padding
    from nn_conformer_for_speech_recognition_tpu.ops.pallas.lstm import (
        lstm_pallas,
        lstm_reference,
    )

    B, T, H = 3, 6, 160
    xw = jnp.asarray(rng.standard_normal((B, T, 4 * H)).astype(np.float32) * 0.2)
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1)
    lens = jnp.asarray([6, 4, 6], jnp.int32)
    got = lstm_pallas(xw, wh, lens, interpret=True)
    ref = lstm_reference(xw, wh, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bilstm_model_pallas_path(rng):
    """ConformerCTC with use_pallas routes the decoder through the fused
    LSTM kernel: forward shapes + finite grads on the CPU mesh."""
    import jax

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC

    enc = C.ConformerConfig(num_blocks=1, d_model=32, num_heads=2, ffn_dim=64,
                            conv_kernel_size=7, dropout=0.0)
    dec = C.DecoderConfig(projection_dim=16, lstm_hidden=16, dropout=0.0)
    mcfg = C.ModelConfig(encoder=enc, decoder=dec, n_mels=13, use_pallas=True)
    model = ConformerCTC(mcfg, vocab_size=9)
    feats = jnp.asarray(rng.standard_normal((2, 20, 13)).astype(np.float32))
    flens = jnp.asarray([20, 12], jnp.int32)
    vs = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                    feats, flens)
    lp, ol = model.apply(vs, feats, flens, deterministic=True)
    assert lp.shape[0] == 2 and lp.shape[2] == 9
    g = jax.grad(
        lambda p: jnp.sum(model.apply(
            {"params": p, "batch_stats": vs.get("batch_stats", {})},
            feats, flens, deterministic=True)[0])
    )(vs["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
