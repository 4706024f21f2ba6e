"""NST loop integration test on a synthetic corpus (SURVEY.md §4:
"NST loop on a synthetic dataset where pseudo-labels are verifiable")."""

import os

import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu import config as C
from nn_conformer_for_speech_recognition_tpu.data.audio import make_synthetic_corpus
from nn_conformer_for_speech_recognition_tpu.data.datasets import (
    BucketedDataset,
    Utterance,
    load_manifest,
    mix_datasets,
)
from nn_conformer_for_speech_recognition_tpu.data.vocab import build_vocab
from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
from nn_conformer_for_speech_recognition_tpu.nst.driver import run_nst
from nn_conformer_for_speech_recognition_tpu.train.loop import Trainer

WORDS = ["yes", "no", "go", "stop"]


def test_pseudo_label_filtering():
    """with_pseudo_labels drops empties, too-long and high-unk labels
    (`speechcommands.py:221-224`, `librispeech.py:108-123`)."""

    class FakeVocab:
        pad_id, blank_id, unk_id = 1, 0, 2

        def parse(self, s):
            return [2 if w == "zzz" else 5 for w in s.split()]

    utts = [Utterance(f"/x/{i}.wav", "") for i in range(5)]
    ds = BucketedDataset.__new__(BucketedDataset)
    ds.utterances = utts
    ds.vocab = FakeVocab()
    ds.max_target_len = 3
    labels = {0: "go go", 1: "", 2: "a b c d e", 3: "zzz zzz go", 4: "stop"}
    kept = ds.with_pseudo_labels(labels, unk_tol=0.3)
    kept_texts = {u.transcript for u in kept}
    assert kept_texts == {"go go", "stop"}  # 1 empty, 2 too long, 3 unk-heavy


def test_mix_datasets_concat():
    a = [Utterance("a.wav", "x")]
    b = [Utterance("b.wav", "y")]
    assert [u.audio_path for u in mix_datasets(a, b)] == ["a.wav", "b.wav"]


@pytest.mark.slow
def test_nst_generations_run(tmp_path):
    root = str(tmp_path / "corpus")
    man = make_synthetic_corpus(root, WORDS, n_train=16, n_val=8, n_test=0,
                                n_unlabeled=8, seed=0)
    feat_cfg = C.FeatureConfig(n_fft=256, hop_length=256, n_mels=13)
    train_utts = load_manifest(man["train"])
    vocab = build_vocab("word", [u.transcript for u in train_utts])

    def mk_ds(split):
        return BucketedDataset(load_manifest(man[split]), vocab, batch_size=8,
                               bucket_boundaries=[8000], max_target_len=4)

    enc = C.ConformerConfig(num_blocks=1, d_model=32, num_heads=2, ffn_dim=64,
                            conv_kernel_size=7, dropout=0.0)
    dec = C.DecoderConfig(projection_dim=16, lstm_hidden=16, dropout=0.0)
    mcfg = C.ModelConfig(encoder=enc, decoder=dec, n_mels=13)
    tcfg = C.TrainConfig(batch_size=8,
                         optimizer=C.OptimizerConfig(name="adam", learning_rate=3e-3),
                         use_specaugment=False, donate_state=False)
    trainer = Trainer(ConformerCTC(mcfg, vocab_size=len(vocab)), vocab, feat_cfg, tcfg)
    trainer.init_state(seed=0)
    trainer.train(mk_ds("train"), epochs=6)

    nst_cfg = C.NSTConfig(generations=2, train_epochs_per_generation=1,
                          initial_supervised_finetune=True, max_target_len=4)
    work = str(tmp_path / "nst")
    results = run_nst(trainer, mk_ds("train"), mk_ds("unlabeled"), nst_cfg,
                      val_dataset=mk_ds("validation"), work_dir=work)

    assert len(results) == 2
    # every generation labeled the full U split
    assert all(r.num_pseudo_labels == 8 for r in results)
    # mix manifests + per-generation checkpoints written
    assert os.path.exists(os.path.join(work, "mix_gen0.tsv"))
    assert os.path.exists(os.path.join(work, "ckpt_gen0"))
    mixed = load_manifest(os.path.join(work, "mix_gen0.tsv"))
    assert len(mixed) >= 16  # supervised always present
    assert all(u.transcript for u in mixed)  # every mixed utt labeled
    assert results[-1].val_wer is not None


class _ScriptedTrainer:
    """Minimal Trainer stand-in: scripted per-train() val metrics, state that
    records how many trains ran, npz save/load — exercises run_nst's
    best-generation selection without real training."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0
        self.state = {"w": np.array([0.0])}
        self.history = {"val_loss": [], "val_wer": []}

    def train(self, ds, epochs, **kw):
        vl, vw = self.script[self.calls]
        self.calls += 1
        self.history["val_loss"].append(vl)
        self.history["val_wer"].append(vw)
        self.state = {"w": np.array([float(self.calls)])}

    def generate_labels(self, ds):
        return {i: "go" for i in range(len(ds.utterances))}

    def save(self, path):
        np.save(path + ".npy", np.asarray(self.state["w"]))

    def load(self, path):
        self.state = {"w": np.load(path + ".npy")}


def _fake_unlabeled(n=4):
    class FakeVocab:
        pad_id, blank_id, unk_id = 1, 0, 2

        def parse(self, s):
            return [5 for _ in s.split()]

    ds = BucketedDataset.__new__(BucketedDataset)
    ds.utterances = [Utterance(f"/x/{i}.wav", "") for i in range(n)]
    ds.vocab = FakeVocab()
    ds.max_target_len = 8
    ds.batch_size = 4
    ds.sample_rate = 16000
    ds.bucket_boundaries = []
    return ds


@pytest.mark.parametrize("use_work_dir", [True, False])
def test_nst_best_generation_selected(tmp_path, monkeypatch, use_work_dir):
    """VERDICT round-4 item 6: the driver must leave the trainer holding the
    BEST generation's state (val WER), not the last — gen-2 regresses here."""
    import nn_conformer_for_speech_recognition_tpu.nst.driver as D

    monkeypatch.setattr(D, "_mix_dataset_like", lambda sup, utts: _fake_unlabeled())
    sup = _fake_unlabeled()
    tr = _ScriptedTrainer(script=[(0.5, 50.0), (0.4, 30.0), (0.45, 60.0)])
    cfg = C.NSTConfig(generations=3, train_epochs_per_generation=1,
                      initial_supervised_finetune=False)
    work = str(tmp_path / "nst") if use_work_dir else None
    results = run_nst(tr, sup, _fake_unlabeled(), cfg,
                      val_dataset=object(), work_dir=work)
    assert [r.is_best for r in results] == [False, True, False]
    assert float(np.asarray(tr.state["w"])[0]) == 2.0  # gen-1's state restored
    if use_work_dir:
        import json
        hist = json.loads(open(os.path.join(work, "nst_history.json")).read())
        assert [h["generation"] for h in hist] == [0, 1, 2]
        assert hist[1]["val_wer"] == 30.0


def test_nst_best_generation_noop_without_val(monkeypatch):
    """No val_dataset → no candidates → selection must not touch the state."""
    import nn_conformer_for_speech_recognition_tpu.nst.driver as D

    monkeypatch.setattr(D, "_mix_dataset_like", lambda sup, utts: _fake_unlabeled())
    tr = _ScriptedTrainer(script=[(0.5, 50.0), (0.4, 30.0)])
    cfg = C.NSTConfig(generations=2, train_epochs_per_generation=1,
                      initial_supervised_finetune=False)
    results = run_nst(tr, _fake_unlabeled(), _fake_unlabeled(), cfg)
    assert all(not r.is_best for r in results)
    assert float(np.asarray(tr.state["w"])[0]) == 2.0  # last state kept
