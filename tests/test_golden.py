"""Golden-metric regression (SURVEY.md §4): fixed PRNG keys, CPU-runnable
tiny config — loss values pinned so numerics drift is caught."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu import config as C
from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
from nn_conformer_for_speech_recognition_tpu.ops.ctc import ctc_loss_from_logits
from nn_conformer_for_speech_recognition_tpu.ops.features import log_mel_spectrogram


def test_feature_pipeline_golden():
    """Log-mel of a deterministic chirp: pinned checksum."""
    cfg = C.FeatureConfig(normalize="none")
    t = np.arange(16000) / 16000.0
    chirp = np.sin(2 * np.pi * (200 + 1500 * t) * t).astype(np.float32)
    feats, _ = log_mel_spectrogram(jnp.asarray(chirp[None]), cfg)
    total = float(jnp.sum(feats))
    mean = float(jnp.mean(feats))
    # values pinned from the verified implementation (matmul-DFT, Slaney mel)
    assert abs(mean - (-16.107)) < 0.15, mean
    assert np.isfinite(total)


def test_ctc_loss_golden():
    rng = np.random.default_rng(1234)
    logits = jnp.asarray(rng.standard_normal((2, 10, 6)).astype(np.float32))
    labels = jnp.asarray([[1, 2, 3], [4, 5, 1]], dtype=jnp.int32)
    loss = ctc_loss_from_logits(
        logits, labels, jnp.array([10, 8]), jnp.array([3, 3]), reduction="mean"
    )
    # pinned against optax.ctc_loss at the time of writing
    assert abs(float(loss) - 3.1593) < 2e-2, float(loss)


def test_model_init_deterministic():
    """Same seed → identical params; different seed → different params."""
    enc = C.ConformerConfig(num_blocks=1, d_model=16, num_heads=2, ffn_dim=32,
                            conv_kernel_size=5, dropout=0.0)
    cfg = C.ModelConfig(encoder=enc,
                        decoder=C.DecoderConfig(projection_dim=8, lstm_hidden=8),
                        n_mels=8)
    model = ConformerCTC(cfg, vocab_size=7)
    feats = jnp.zeros((1, 8, 8))
    lens = jnp.array([8])

    def init(seed):
        return model.init(
            {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
            feats, lens,
        )["params"]

    p1, p2, p3 = init(0), init(0), init(1)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p3))
    )
