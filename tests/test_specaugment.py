"""SpecAugment property tests (policies per `lib/hparams.py:85-95`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu.config import SpecAugmentConfig
from nn_conformer_for_speech_recognition_tpu.ops.specaugment import (
    add_gaussian_noise,
    specaugment,
)


def _feats(rng, b=4, t=32, f=16):
    return jnp.asarray(rng.standard_normal((b, t, f)).astype(np.float32)) + 5.0


def test_masking_changes_values(rng):
    cfg = SpecAugmentConfig(time_warp_w=0, freq_mask_f=4, time_mask_t=6)
    x = _feats(rng)
    lengths = jnp.full((4,), 32)
    y = specaugment(x, lengths, jax.random.key(0), cfg)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(x), np.asarray(y))
    # masked entries are exactly mask_value (0); everything else unchanged
    changed = ~np.isclose(np.asarray(x), np.asarray(y))
    assert np.all(np.asarray(y)[changed] == 0.0)


def test_freq_masks_differ_per_example(rng):
    """The reference masked the same rows for every batch element
    (`asrnn.py:140-141`); ours must not."""
    cfg = SpecAugmentConfig(time_warp_w=0, freq_mask_f=6, freq_mask_n=2,
                            time_mask_t=0, time_mask_n=0)
    x = jnp.ones((8, 16, 32)) * 7.0
    y = np.asarray(specaugment(x, jnp.full((8,), 16), jax.random.key(1), cfg))
    masked_rows = [frozenset(np.nonzero((y[i] == 0).any(axis=0))[0].tolist()) for i in range(8)]
    assert len(set(masked_rows)) > 1, masked_rows


def test_time_masks_stay_within_valid_length(rng):
    cfg = SpecAugmentConfig(time_warp_w=0, freq_mask_n=0, time_mask_t=4, time_mask_n=2)
    x = jnp.ones((2, 32, 8)) * 3.0
    lengths = jnp.array([32, 10])
    y = np.asarray(specaugment(x, lengths, jax.random.key(2), cfg))
    # no mask may start beyond the valid region for the short utterance:
    # frames >= 10+4 must be untouched
    assert np.all(y[1, 14:] == 3.0)


def test_adaptive_multiplicity_reduces_masks():
    # tau=10, pm=0.05 → floor(0.5)=0 masks allowed
    cfg = SpecAugmentConfig(time_warp_w=0, freq_mask_n=0, time_mask_t=5,
                            time_mask_n=4, adaptive_multiplicity=True, pm=0.05)
    x = jnp.ones((1, 16, 8)) * 2.0
    y = np.asarray(specaugment(x, jnp.array([10]), jax.random.key(3), cfg))
    assert np.all(y == 2.0)  # zero masks applied


def test_adaptive_size_uses_ps():
    # tau=20, ps=0.05 → T=1: masks at most 1 frame each
    cfg = SpecAugmentConfig(time_warp_w=0, freq_mask_n=0, time_mask_t=100,
                            time_mask_n=2, adaptive_size=True, ps=0.05)
    x = jnp.ones((1, 24, 8)) * 2.0
    y = np.asarray(specaugment(x, jnp.array([20]), jax.random.key(4), cfg))
    n_masked_frames = int((y[0] == 0).any(axis=1).sum())
    assert n_masked_frames <= 2


def test_time_warp_preserves_mass_roughly(rng):
    """Warping interpolates — values move but stay in the convex hull."""
    cfg = SpecAugmentConfig(time_warp_w=4, freq_mask_n=0, time_mask_n=0)
    x = _feats(rng, b=2, t=40)
    y = np.asarray(specaugment(x, jnp.full((2,), 40), jax.random.key(5), cfg))
    xn = np.asarray(x)
    assert y.min() >= xn.min() - 1e-4 and y.max() <= xn.max() + 1e-4


def test_warp_identity_outside_valid_region(rng):
    cfg = SpecAugmentConfig(time_warp_w=3, freq_mask_n=0, time_mask_n=0)
    x = _feats(rng, b=1, t=40)
    y = np.asarray(specaugment(x, jnp.array([20]), jax.random.key(6), cfg))
    np.testing.assert_allclose(y[0, 21:], np.asarray(x)[0, 21:], atol=1e-5)


def test_deterministic_given_key(rng):
    cfg = SpecAugmentConfig()
    x = _feats(rng)
    lengths = jnp.full((4,), 32)
    y1 = specaugment(x, lengths, jax.random.key(7), cfg)
    y2 = specaugment(x, lengths, jax.random.key(7), cfg)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_gaussian_noise():
    x = jnp.zeros((3, 100))
    y = np.asarray(add_gaussian_noise(x, jax.random.key(0), std=0.01))
    assert 0.001 < np.std(y) < 0.05
