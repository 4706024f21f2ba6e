"""Parallelism tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from nn_conformer_for_speech_recognition_tpu import config as C
from nn_conformer_for_speech_recognition_tpu.parallel import mesh as pmesh


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_pure_dp():
    mesh = pmesh.make_mesh(C.MeshConfig())
    assert mesh.shape == {"data": 8, "model": 1}


def test_make_mesh_tp():
    mesh = pmesh.make_mesh(C.MeshConfig(model_parallel_size=2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_batch_sharding_splits_batch():
    cfg = C.MeshConfig()
    mesh = pmesh.make_mesh(cfg)
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    (xs,) = pmesh.shard_batch_arrays(mesh, cfg, x)
    assert xs.sharding.spec == P("data")
    # each device holds 2 rows
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 4)}


def test_param_shardings_dp_replicated():
    cfg = C.MeshConfig()
    mesh = pmesh.make_mesh(cfg)
    params = {"mhsa": {"qkv": {"kernel": np.zeros((16, 48))}},
              "other": {"bias": np.zeros((4,))}}
    sh = pmesh.param_shardings(mesh, params, cfg)
    assert sh["mhsa"]["qkv"]["kernel"].spec == P()
    assert sh["other"]["bias"].spec == P()


def test_param_shardings_tp_rules():
    cfg = C.MeshConfig(model_parallel_size=2)
    mesh = pmesh.make_mesh(cfg)
    params = {
        "block_0": {
            "mhsa": {"qkv": {"kernel": np.zeros((16, 48))},
                      "out_proj": {"kernel": np.zeros((16, 16))}},
            "ffn1": {"Dense_0": {"kernel": np.zeros((16, 64))}},
            "conv": {"Dense_0": {"kernel": np.zeros((16, 31))}},  # odd: replicated
        }
    }
    sh = pmesh.param_shardings(mesh, params, cfg)
    b = sh["block_0"]
    assert b["mhsa"]["qkv"]["kernel"].spec == P(None, "model")
    assert b["mhsa"]["out_proj"]["kernel"].spec == P("model", None)
    assert b["ffn1"]["Dense_0"]["kernel"].spec == P(None, "model")
    assert b["conv"]["Dense_0"]["kernel"].spec == P()


def test_dp_grad_is_global_mean():
    """Sharded-batch loss grad == full-batch grad (GSPMD inserts the psum)."""
    cfg = C.MeshConfig()
    mesh = pmesh.make_mesh(cfg)
    w = jnp.ones((4, 4))
    x = np.random.default_rng(0).standard_normal((16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_local = jax.grad(loss)(w, jnp.asarray(x))
    (xs,) = pmesh.shard_batch_arrays(mesh, cfg, x)
    ws = jax.device_put(w, pmesh.replicated(mesh))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_local), np.asarray(g_sharded), rtol=1e-5)


def test_sharded_model_forward_matches_single_device(rng):
    """Full ASR forward under DP sharding == unsharded forward."""
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC

    enc = C.ConformerConfig(num_blocks=1, d_model=16, num_heads=2, ffn_dim=32,
                            conv_kernel_size=5, dropout=0.0)
    dec = C.DecoderConfig(projection_dim=8, lstm_hidden=8, dropout=0.0)
    mcfg = C.ModelConfig(encoder=enc, decoder=dec, n_mels=8)
    model = ConformerCTC(mcfg, vocab_size=7)

    feats = jnp.asarray(rng.standard_normal((16, 12, 8)).astype(np.float32))
    lengths = jnp.full((16,), 12)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats, lengths
    )
    lp_ref, _ = model.apply(variables, feats, lengths, deterministic=True)

    cfg = C.MeshConfig()
    mesh = pmesh.make_mesh(cfg)
    vs = jax.device_put(variables, pmesh.replicated(mesh))
    fs, ls = pmesh.shard_batch_arrays(mesh, cfg, np.asarray(feats), np.asarray(lengths))
    lp_sh, _ = jax.jit(
        lambda v, f, l: model.apply(v, f, l, deterministic=True)
    )(vs, fs, ls)
    np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_sh), atol=2e-5)


def test_ulysses_attention_matches_local(rng):
    """Time-sharded Ulysses attention == single-device attention."""
    import jax.numpy as jnp
    from nn_conformer_for_speech_recognition_tpu.parallel.sequence import (
        _local_attention, ulysses_attention)

    mesh = pmesh.make_mesh(C.MeshConfig())  # 8-way 'data'
    b, t, h, dh = 2, 32, 8, 16  # T and H divisible by 8
    qu = jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, dh)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((b, h, t, t)).astype(np.float32) * 0.1)
    lengths = jnp.array([32, 20])

    ref = _local_attention(qu, k, v, bias, lengths, 0.25)
    got = jax.jit(
        lambda *a: ulysses_attention(*a, scale=0.25, mesh=mesh, axis="data")
    )(qu, k, v, bias, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
