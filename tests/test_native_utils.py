"""Native loader, prefetch, guards, profiling, checkpoint-manager tests."""

import os
import time

import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu.data import native_loader as NL
from nn_conformer_for_speech_recognition_tpu.data.audio import read_wav, write_wav


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        n = 4000 + i * 500
        x = (rng.standard_normal(n) * 0.1).astype(np.float32)
        p = str(root / f"{i}.wav")
        write_wav(p, x, 16000)
        paths.append((p, n))
    return paths


def test_native_extension_builds():
    assert NL.native_available(), "wavio extension failed to build with g++"


def test_native_decode_matches_python(wavs):
    paths = [p for p, _ in wavs]
    out = np.zeros((8, 8000), np.float32)
    lens = np.zeros((8,), np.int32)
    NL.decode_batch(paths, out, lens)
    for i, (p, n) in enumerate(wavs):
        assert lens[i] == min(n, 8000)
        ref, sr = read_wav(p)
        np.testing.assert_allclose(out[i, : lens[i]], ref[: lens[i]], atol=1e-6)
        # tail zeroed
        assert (out[i, lens[i]:] == 0).all()


def test_native_probe(wavs):
    w = NL._load_native()
    p, n = wavs[2]
    frames, sr = w.probe(p)
    assert frames == n and sr == 16000


def test_native_decode_missing_file_raises(wavs):
    out = np.zeros((1, 100), np.float32)
    lens = np.zeros((1,), np.int32)
    with pytest.raises(IOError):
        NL.decode_batch(["/nonexistent/file.wav"], out, lens)


def test_prefetch_iterator_overlaps():
    seen = []

    def slow_gen():
        for i in range(4):
            time.sleep(0.05)
            seen.append(i)
            yield i

    it = NL.PrefetchIterator(slow_gen(), depth=2)
    time.sleep(0.15)  # background thread should be ahead
    assert len(seen) >= 2
    assert list(it) == [0, 1, 2, 3]


def test_prefetch_iterator_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    it = NL.PrefetchIterator(bad_gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_guards():
    import jax
    import jax.numpy as jnp

    from nn_conformer_for_speech_recognition_tpu.utils.guards import (
        assert_all_finite, checkify_step, tree_finite_report)

    good = {"a": jnp.ones(3)}
    bad = {"a": jnp.array([1.0, np.nan, np.inf])}
    assert tree_finite_report(good) == {}
    assert tree_finite_report(bad)["a"] == (1, 1)
    with pytest.raises(FloatingPointError):
        assert_all_finite(bad)

    @checkify_step
    def div(x):
        return 1.0 / x

    err, out = jax.jit(div)(jnp.array(0.0))
    assert err.get() is not None  # division produced inf


def test_step_timer():
    from nn_conformer_for_speech_recognition_tpu.utils.profiling import StepTimer

    t = StepTimer(sample_rate=16000)
    time.sleep(0.01)
    t.data_ready()
    time.sleep(0.01)
    t.step_done(16000)
    s = t.summary()
    assert s["steps"] == 1
    assert s["data_wait_s"] > 0 and s["compute_s"] > 0
    assert s["audio_seconds_per_second"] > 0


def test_checkpoint_manager_rotation(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from nn_conformer_for_speech_recognition_tpu.train.checkpoint import (
        CheckpointManager)
    from nn_conformer_for_speech_recognition_tpu.train.state import TrainState

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((2, 2))}
    state = TrainState.create(params, {}, tx, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep=2)
    for step in (1, 2, 3):
        state = state.replace(step=jnp.asarray(step))
        mgr.save(state, metric=float(10 - step))
    dirs = [d for d in os.listdir(str(tmp_path / "ckpts")) if d.startswith("step_")]
    assert len(dirs) == 2  # rotated
    assert os.path.exists(str(tmp_path / "ckpts" / "best"))
    restored = mgr.restore_latest(state)
    assert int(restored.step) == 3


def test_trainer_checkpoint_manager_hook(tmp_path):
    """Trainer.train writes rotated checkpoints when given a manager."""
    import jax

    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.data.audio import make_synthetic_corpus
    from nn_conformer_for_speech_recognition_tpu.data.datasets import (
        BucketedDataset, load_manifest)
    from nn_conformer_for_speech_recognition_tpu.data.vocab import build_vocab
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.train.checkpoint import CheckpointManager
    from nn_conformer_for_speech_recognition_tpu.train.loop import Trainer

    man = make_synthetic_corpus(str(tmp_path / "c"), ["go", "stop"], 8, 8, 0, 0)
    utts = load_manifest(man["train"])
    vocab = build_vocab("word", [u.transcript for u in utts])
    ds = BucketedDataset(utts, vocab, 8, bucket_boundaries=[8000], max_target_len=2)
    val = BucketedDataset(load_manifest(man["validation"]), vocab, 8,
                          bucket_boundaries=[8000], max_target_len=2)
    enc = C.ConformerConfig(num_blocks=1, d_model=16, num_heads=2, ffn_dim=32,
                            conv_kernel_size=5, dropout=0.0)
    mcfg = C.ModelConfig(encoder=enc,
                         decoder=C.DecoderConfig(projection_dim=8, lstm_hidden=8),
                         n_mels=13)
    tcfg = C.TrainConfig(batch_size=8,
                         optimizer=C.OptimizerConfig(name="adam", learning_rate=1e-3),
                         use_specaugment=False, donate_state=False)
    tr = Trainer(ConformerCTC(mcfg, vocab_size=len(vocab)), vocab,
                 C.FeatureConfig(n_fft=256, hop_length=256, n_mels=13), tcfg)
    tr.init_state(seed=0)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    tr.train(ds, epochs=3, val_dataset=val, checkpoint_manager=mgr)
    assert mgr.latest() is not None
    assert os.path.exists(os.path.join(str(tmp_path / "ck"), "best"))
    restored = mgr.restore_latest(tr.state)
    assert int(restored.step) == int(tr.state.step)


def test_plot_curves_and_heatmap(tmp_path):
    from nn_conformer_for_speech_recognition_tpu.train.evals import (
        confusion_heatmap, plot_curves)

    plot_curves({"train_loss": [3.0, 2.0, 1.0], "val_wer": [0.9, 0.5]},
                str(tmp_path / "curves.pdf"))
    assert os.path.exists(str(tmp_path / "curves.pdf"))

    refs = ["go", "stop", "go", "yes"]
    hyps = ["go", "go", "go", "yes"]
    cm = confusion_heatmap(refs, hyps, ["go", "stop", "yes"],
                           str(tmp_path / "cm.png"))
    assert cm[0, 0] == 2 and cm[1, 0] == 1 and cm[2, 2] == 1
    cmn = confusion_heatmap(refs, hyps, ["go", "stop", "yes"],
                            str(tmp_path / "cmn.png"), normalize=True)
    assert abs(cmn[1, 0] - 100.0) < 1e-6  # row-normalised %
    assert os.path.exists(str(tmp_path / "cm.png"))
