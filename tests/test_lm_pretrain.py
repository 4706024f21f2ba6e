"""LM and contrastive-pretraining tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu import config as C
from nn_conformer_for_speech_recognition_tpu.models.lm import (
    CausalWordLM,
    TransformerLM,
    fuse_lm_weights_into_asr,
    shallow_fusion,
)
from nn_conformer_for_speech_recognition_tpu.models.pretrain import (
    PretrainModel,
    contrastive_loss,
)


def test_transformer_lm_shapes(rng):
    m = TransformerLM(src_vocab=40, tgt_vocab=30, d=32, heads=2, ffn=64,
                      enc_layers=2, dec_layers=2)
    src = jnp.asarray(rng.integers(0, 40, (2, 7)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, 30, (2, 5)).astype(np.int32))
    params = m.init(jax.random.key(0), src, tgt)
    out = m.apply(params, src, tgt)
    assert out.shape == (2, 5, 30)


def test_lm_causality(rng):
    """Changing a future target token must not change past logits."""
    m = TransformerLM(src_vocab=10, tgt_vocab=10, d=16, heads=2, ffn=32,
                      enc_layers=1, dec_layers=1, dropout=0.0)
    src = jnp.asarray(rng.integers(0, 10, (1, 4)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, 10, (1, 6)).astype(np.int32))
    params = m.init(jax.random.key(0), src, tgt)
    out1 = m.apply(params, src, tgt)
    tgt2 = tgt.at[0, 5].set((tgt[0, 5] + 1) % 10)
    out2 = m.apply(params, src, tgt2)
    np.testing.assert_allclose(np.asarray(out1[:, :5]), np.asarray(out2[:, :5]), atol=1e-5)


def test_causal_word_lm_next_token(rng):
    m = CausalWordLM(vocab=12, d=16, heads=2, ffn=32, layers=1, dropout=0.0)
    ids = jnp.asarray(rng.integers(0, 12, (3, 8)).astype(np.int32))
    params = m.init(jax.random.key(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (3, 8, 12)


def test_shallow_fusion_changes_logits(rng):
    lm = CausalWordLM(vocab=9, d=16, heads=2, ffn=32, layers=1, dropout=0.0)
    ids0 = jnp.zeros((2, 6), jnp.int32)
    params = lm.init(jax.random.key(0), ids0)
    asr_lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((2, 6, 9)).astype(np.float32)), axis=-1
    )
    fused = shallow_fusion(asr_lp, lambda ids: lm.apply(params, ids), lm_weight=0.5)
    assert fused.shape == asr_lp.shape
    assert not np.allclose(np.asarray(fused), np.asarray(asr_lp))


def _fusion_fixture(rng, d=8, heads=2, n_blocks=3):
    """Real TransformerLM params + a toy n-block ASR encoder tree."""
    lm = TransformerLM(src_vocab=11, tgt_vocab=7, d=d, heads=heads, ffn=16,
                       enc_layers=1, dec_layers=1, dropout=0.0)
    lm_vars = lm.init(
        jax.random.key(0), jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 3), jnp.int32)
    )
    asr_params = {
        "encoder": {
            f"block_{i}": {
                "mhsa": {
                    "qkv": {"kernel": jnp.ones((d, 3 * d)) * (i + 1)},
                    "out_proj": {"kernel": jnp.ones((d, d)) * (i + 1)},
                }
            }
            for i in range(n_blocks)
        }
    }
    return lm, lm_vars["params"], asr_params


def test_weight_fusion_zero_lm_is_noop(rng):
    """Fusing an all-zero LM must leave the ASR bit-identical (semantic
    no-op check, not just 'weights changed')."""
    _, lm_params, asr_params = _fusion_fixture(rng)
    zero_lm = jax.tree.map(jnp.zeros_like, lm_params)
    fused = fuse_lm_weights_into_asr(asr_params, zero_lm)
    for a, b in zip(jax.tree.leaves(fused), jax.tree.leaves(asr_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weight_fusion_structured_mapping(rng):
    """`runner.py:78-101` semantics: encoder-LM layer 0 → block_0
    projection-by-projection, decoder-LM layer 0 (cross-attention) →
    mirrored block_2, middle block untouched."""
    d = 8
    _, lm_params, asr_params = _fusion_fixture(rng, d=d)
    fused = fuse_lm_weights_into_asr(asr_params, lm_params)

    def qkv_out(attn):
        q, k, v = (
            np.asarray(attn[n]["kernel"]).reshape(d, -1)
            for n in ("query", "key", "value")
        )
        return (
            np.concatenate([q, k, v], axis=1),
            np.asarray(attn["out"]["kernel"]).reshape(-1, d),
        )

    enc_qkv, enc_out = qkv_out(lm_params["enc_0"]["self_attn"])
    dec_qkv, dec_out = qkv_out(lm_params["dec_0"]["cross_attn"])
    f = fused["encoder"]
    a = asr_params["encoder"]
    np.testing.assert_allclose(
        np.asarray(f["block_0"]["mhsa"]["qkv"]["kernel"]),
        np.asarray(a["block_0"]["mhsa"]["qkv"]["kernel"]) + enc_qkv, rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(f["block_0"]["mhsa"]["out_proj"]["kernel"]),
        np.asarray(a["block_0"]["mhsa"]["out_proj"]["kernel"]) + enc_out, rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(f["block_2"]["mhsa"]["qkv"]["kernel"]),
        np.asarray(a["block_2"]["mhsa"]["qkv"]["kernel"]) + dec_qkv, rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(f["block_2"]["mhsa"]["out_proj"]["kernel"]),
        np.asarray(a["block_2"]["mhsa"]["out_proj"]["kernel"]) + dec_out, rtol=1e-6,
    )
    # untouched middle block
    np.testing.assert_array_equal(
        np.asarray(f["block_1"]["mhsa"]["qkv"]["kernel"]),
        np.asarray(a["block_1"]["mhsa"]["qkv"]["kernel"]),
    )


def test_pron_lm_apply_shallow_fusion(rng):
    """The trained pronunciation→word TransformerLM wires into the ASR
    shallow-fusion hook: logits change vs no-LM, weight 0 is a no-op."""
    from nn_conformer_for_speech_recognition_tpu.models.lm import (
        make_pron_lm_apply,
    )

    v_words, v_pron, p = 7, 11, 3
    lm = TransformerLM(src_vocab=v_pron, tgt_vocab=v_words, d=8, heads=2,
                       ffn=16, enc_layers=1, dec_layers=1, dropout=0.0)
    tbl = rng.integers(0, v_pron, size=(v_words, p)).astype(np.int32)
    b, t = 2, 5
    lm_vars = lm.init(
        jax.random.key(0),
        jnp.zeros((1, t * p), jnp.int32), jnp.zeros((1, t), jnp.int32),
    )
    lm_apply = make_pron_lm_apply(lm, lm_vars, tbl)
    asr_lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((b, t, v_words)).astype(np.float32))
    )
    fused = shallow_fusion(asr_lp, lm_apply, lm_weight=0.5)
    assert fused.shape == asr_lp.shape
    assert np.isfinite(np.asarray(fused)).all()
    assert not np.allclose(np.asarray(fused), np.asarray(asr_lp))
    noop = shallow_fusion(asr_lp, lm_apply, lm_weight=0.0)
    np.testing.assert_allclose(np.asarray(noop), np.asarray(asr_lp), atol=1e-7)


def _pt_cfgs():
    enc = C.ConformerConfig(num_blocks=1, d_model=16, num_heads=2, ffn_dim=32,
                            conv_kernel_size=5, dropout=0.0)
    mcfg = C.ModelConfig(
        encoder=enc, decoder=C.DecoderConfig(projection_dim=8, lstm_hidden=8),
        n_mels=8, subsampling=C.SubsamplingConfig(channels=(4, 4)),
    )
    pcfg = C.PretrainConfig(target_dim=16, distractors_k=3)
    return mcfg, pcfg


def test_pretrain_model_shapes(rng):
    mcfg, pcfg = _pt_cfgs()
    m = PretrainModel(mcfg, pcfg)
    feats = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    flens = jnp.array([16, 10])
    variables = m.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "gumbel": jax.random.key(2), "dropout": jax.random.key(3)},
        feats, flens, deterministic=False,
    )
    (ctx, tgt, mask_pos, lengths), _ = m.apply(
        variables, feats, flens, deterministic=False,
        rngs={"mask": jax.random.key(4), "gumbel": jax.random.key(5),
              "dropout": jax.random.key(6)},
        mutable=["batch_stats"],
    )
    assert ctx.shape == (2, 4, 16) and tgt.shape == (2, 4, 16)
    assert mask_pos.shape == (2, 4)
    # no masks outside valid region
    assert not np.asarray(mask_pos)[1, 3:].any()


def test_contrastive_loss_prefers_aligned(rng):
    """Loss is lower when context == targets than for random context."""
    b, t, d = 2, 12, 8
    tgt = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    lengths = jnp.full((b,), t)
    good = contrastive_loss(tgt, tgt, mask, lengths, jax.random.key(0),
                            diversity_alpha=0.0)
    bad = contrastive_loss(
        jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32)),
        tgt, mask, lengths, jax.random.key(0), diversity_alpha=0.0,
    )
    assert float(good) < float(bad)


def test_contrastive_loss_grad_finite(rng):
    b, t, d = 2, 8, 6
    ctx = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    lengths = jnp.full((b,), t)

    g = jax.grad(
        lambda c: contrastive_loss(c, tgt, mask, lengths, jax.random.key(1))
    )(ctx)
    assert np.isfinite(np.asarray(g)).all()


def test_pretrain_trainer_loss_decreases(rng, tmp_path):
    from nn_conformer_for_speech_recognition_tpu.data.audio import make_synthetic_corpus
    from nn_conformer_for_speech_recognition_tpu.data.datasets import (
        BucketedDataset, load_manifest)
    from nn_conformer_for_speech_recognition_tpu.data.vocab import WordVocab
    from nn_conformer_for_speech_recognition_tpu.train.pretrain_loop import PretrainTrainer

    man = make_synthetic_corpus(str(tmp_path), ["go", "stop"], n_train=0, n_val=0,
                                n_test=0, n_unlabeled=8, seed=0)
    vocab = WordVocab(["<blank>", "<pad>", "<unk>", "go", "stop"])
    feat_cfg = C.FeatureConfig(n_fft=256, hop_length=256, n_mels=8)
    ds = BucketedDataset(load_manifest(man["unlabeled"]), vocab, batch_size=8,
                         bucket_boundaries=[8000], max_target_len=4)
    mcfg, pcfg = _pt_cfgs()
    import dataclasses
    pcfg = dataclasses.replace(pcfg, learning_rate=1e-3, mask_probability=0.3)
    tr = PretrainTrainer(mcfg, pcfg, feat_cfg)
    tr.init_state(seed=0)
    tr.train(ds, epochs=8)
    h = tr.history["pretrain_loss"]
    assert h[-1] < h[0], h


def test_trainer_with_shallow_fusion(rng, tmp_path):
    """Eval path composes LM shallow fusion (`asrnn.py:257-258`)."""
    import jax
    import jax.numpy as jnp

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.data.audio import make_synthetic_corpus
    from nn_conformer_for_speech_recognition_tpu.data.datasets import (
        BucketedDataset, load_manifest)
    from nn_conformer_for_speech_recognition_tpu.data.vocab import build_vocab
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.train.loop import Trainer

    man = make_synthetic_corpus(str(tmp_path), ["go", "stop"], 8, 0, 8, 0)
    utts = load_manifest(man["train"])
    vocab = build_vocab("word", [u.transcript for u in utts])
    ds = BucketedDataset(load_manifest(man["test"]), vocab, 8,
                         bucket_boundaries=[8000], max_target_len=2)
    lm = CausalWordLM(vocab=len(vocab), d=16, heads=2, ffn=32, layers=1, dropout=0.0)
    lm_params = lm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))

    enc = C.ConformerConfig(num_blocks=1, d_model=16, num_heads=2, ffn_dim=32,
                            conv_kernel_size=5, dropout=0.0)
    mcfg = C.ModelConfig(encoder=enc,
                         decoder=C.DecoderConfig(projection_dim=8, lstm_hidden=8),
                         n_mels=13)
    tcfg = C.TrainConfig(batch_size=8,
                         optimizer=C.OptimizerConfig(name="adam", learning_rate=1e-3),
                         use_specaugment=False, donate_state=False)
    feat = C.FeatureConfig(n_fft=256, hop_length=256, n_mels=13)
    model = ConformerCTC(mcfg, vocab_size=len(vocab))

    plain = Trainer(model, vocab, feat, tcfg)
    plain.init_state(seed=0)
    fused = Trainer(model, vocab, feat, tcfg,
                    lm_apply=lambda ids: lm.apply(lm_params, ids), lm_weight=1.0)
    fused.state = plain.state  # same ASR weights
    l1, _ = plain.evaluate(ds)
    l2, _ = fused.evaluate(ds)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) > 1e-6  # LM changed the scores
