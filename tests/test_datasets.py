"""Dataset layer tests: manifests, bucketing, filters, layout builders."""

import os

import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu.data.audio import (
    make_synthetic_corpus,
    synth_word_audio,
    write_wav,
)
from nn_conformer_for_speech_recognition_tpu.data.datasets import (
    BucketedDataset,
    Utterance,
    librispeech_manifests,
    load_manifest,
    save_manifest,
    shard_utterances,
)
from nn_conformer_for_speech_recognition_tpu.data.vocab import (
    WordPieceVocab,
    WordVocab,
)


def test_manifest_roundtrip(tmp_path):
    utts = [Utterance("/a.wav", "go stop"), Utterance("/b.wav", "")]
    p = str(tmp_path / "m.tsv")
    save_manifest(p, utts)
    back = load_manifest(p)
    assert back[0].transcript == "go stop"
    assert not back[1].labeled


def test_shard_utterances():
    utts = [Utterance(f"/{i}.wav", "x") for i in range(10)]
    s0 = shard_utterances(utts, 0, 3)
    s1 = shard_utterances(utts, 1, 3)
    s2 = shard_utterances(utts, 2, 3)
    assert len(s0) + len(s1) + len(s2) == 10
    assert {u.audio_path for u in s0}.isdisjoint({u.audio_path for u in s1})


@pytest.fixture(scope="module")
def varied_corpus(tmp_path_factory):
    """Wavs of varied lengths for bucketing tests."""
    root = tmp_path_factory.mktemp("varied")
    rng = np.random.default_rng(0)
    utts = []
    for i, n in enumerate([2000, 3000, 4000, 9000, 10000, 15000]):
        x = (rng.standard_normal(n) * 0.1).astype(np.float32)
        p = str(root / f"{i}.wav")
        write_wav(p, x, 16000)
        utts.append(Utterance(p, "go"))
    return utts


def test_bucketing_pads_to_bucket_not_global_max(varied_corpus):
    vocab = WordVocab(["<blank>", "<pad>", "<unk>", "go"])
    ds = BucketedDataset(varied_corpus, vocab, batch_size=2,
                         bucket_boundaries=[4000, 10000, 16000], max_target_len=2)
    shapes = {b.audio.shape[1] for b in ds.epoch(shuffle=False)}
    # short clips batch at 4000 samples, mid at 10000 — never all at 16000
    assert 4000 in shapes and 10000 in shapes
    for b in ds.epoch(shuffle=False):
        valid = b.audio_lengths[b.indices >= 0]
        assert (valid <= b.audio.shape[1]).all()


def test_max_samples_filter(varied_corpus):
    vocab = WordVocab(["<blank>", "<pad>", "<unk>", "go"])
    ds = BucketedDataset(varied_corpus, vocab, batch_size=2,
                         bucket_boundaries=[16000], max_samples=5000,
                         max_target_len=2)
    assert len(ds) == 3  # 2000/3000/4000 kept (`librilight.py:136-148`)


def test_drop_untolerable_uses_wpm_filter(varied_corpus):
    v = WordPieceVocab.build(["go stop yes"], ntokens=64, min_freq=1)
    utts = [Utterance(varied_corpus[0].audio_path, "go"),
            Utterance(varied_corpus[1].audio_path, "qqq zzz xxx")]
    ds = BucketedDataset(utts, v, batch_size=2, bucket_boundaries=[16000],
                         drop_untolerable=True, unk_tol=0.3, max_target_len=8)
    assert len(ds) == 1  # high-unk transcript dropped (`wordpiecemodel.py:112-124`)


def test_batch_padding_rows_marked(varied_corpus):
    vocab = WordVocab(["<blank>", "<pad>", "<unk>", "go"])
    ds = BucketedDataset(varied_corpus[:3], vocab, batch_size=4,
                         bucket_boundaries=[16000], max_target_len=2)
    b = next(ds.epoch(shuffle=False))
    assert b.size == 3
    assert (b.indices[3:] == -1).all()
    assert (b.audio_lengths[3:] == 0).all()


def test_librispeech_layout_builder(tmp_path):
    # fabricate root/split/spk/chap/{trans,wavs}
    split = "dev-clean"
    chap = tmp_path / split / "84" / "121123"
    chap.mkdir(parents=True)
    ids = ["84-121123-0000", "84-121123-0001"]
    texts = ["HELLO WORLD", "GOOD MORNING"]
    with open(chap / "84-121123.trans.txt", "w") as f:
        for i, t in zip(ids, texts):
            f.write(f"{i} {t}\n")
    for i in ids:
        write_wav(str(chap / f"{i}.wav"), synth_word_audio("x", duration=0.05), 16000)
    man = librispeech_manifests(str(tmp_path), str(tmp_path / "out"), [split])
    utts = load_manifest(man[split])
    assert len(utts) == 2
    assert utts[0].transcript == "hello world"
    assert os.path.exists(utts[0].audio_path)


def test_epoch_reshuffles_between_epochs(tmp_path):
    man = make_synthetic_corpus(str(tmp_path), ["go", "stop"], 16, 0, 0, 0)
    vocab = WordVocab(["<blank>", "<pad>", "<unk>", "go", "stop"])
    ds = BucketedDataset(load_manifest(man["train"]), vocab, batch_size=4,
                         bucket_boundaries=[8000], max_target_len=2)
    order1 = [tuple(b.indices) for b in ds.epoch(seed=1)]
    order2 = [tuple(b.indices) for b in ds.epoch(seed=2)]
    assert order1 != order2
    # deterministic given the seed
    order1b = [tuple(b.indices) for b in ds.epoch(seed=1)]
    assert order1 == order1b


def test_device_resident_dataset_matches_host(tmp_path):
    import jax
    from nn_conformer_for_speech_recognition_tpu.data.device_cache import (
        DeviceResidentDataset)

    man = make_synthetic_corpus(str(tmp_path), ["go", "stop"], 12, 0, 0, 0)
    vocab = WordVocab(["<blank>", "<pad>", "<unk>", "go", "stop"])
    host = BucketedDataset(load_manifest(man["train"]), vocab, batch_size=4,
                           bucket_boundaries=[8000], max_target_len=2)
    dev = DeviceResidentDataset(host)
    db = list(dev.epoch(seed=3))
    assert sum(b.size for b in db) == len(host)
    # every device batch row matches the host dataset's content for that index
    for d in db:
        for row, idx in enumerate(d.indices):
            if idx < 0:
                continue
            ref_audio = host._audio(int(idx))
            got = np.asarray(d.audio)[row]
            np.testing.assert_allclose(got[: len(ref_audio)], ref_audio, atol=1e-6)
            ids = host.vocab.parse(host.utterances[int(idx)].transcript)
            np.testing.assert_array_equal(
                np.asarray(d.targets)[row, : len(ids)], ids)


def test_device_resident_set_targets(tmp_path):
    from nn_conformer_for_speech_recognition_tpu.data.device_cache import (
        DeviceResidentDataset)

    man = make_synthetic_corpus(str(tmp_path), ["go", "stop"], 6, 0, 0, 0)
    vocab = WordVocab(["<blank>", "<pad>", "<unk>", "go", "stop"])
    host = BucketedDataset(load_manifest(man["train"]), vocab, batch_size=6,
                           bucket_boundaries=[8000], max_target_len=2)
    dev = DeviceResidentDataset(host)
    dev.set_targets({0: [4, 3]})
    b = next(dev.epoch(shuffle=False))
    row = list(b.indices).index(0)
    np.testing.assert_array_equal(np.asarray(b.targets)[row], [4, 3])
    assert int(np.asarray(b.target_lengths)[row]) == 2


def test_trainer_works_with_device_dataset(tmp_path):
    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.data.device_cache import (
        DeviceResidentDataset)
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.train.loop import Trainer

    man = make_synthetic_corpus(str(tmp_path), ["go", "stop"], 8, 0, 0, 0)
    vocab = WordVocab(["<blank>", "<pad>", "<unk>", "go", "stop"])
    host = BucketedDataset(load_manifest(man["train"]), vocab, batch_size=8,
                           bucket_boundaries=[8000], max_target_len=2)
    dev = DeviceResidentDataset(host)
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
    tr.train(dev, epochs=2)
    assert np.isfinite(tr.history["train_loss"][-1])
    loss, wer = tr.evaluate(dev)
    assert np.isfinite(loss)


# ---------------------------------------------------------------------------
# StreamingDataset (960h-scale pipeline, VERDICT round-1 item 5)
# ---------------------------------------------------------------------------


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * 4096 / 1e6


def test_streaming_matches_bucketed_order_and_content(tmp_path):
    """StreamingDataset yields the IDENTICAL batch sequence as
    BucketedDataset for the same seed (so resume cursors carry over)."""
    from nn_conformer_for_speech_recognition_tpu.data.audio import (
        make_synthetic_corpus,
    )
    from nn_conformer_for_speech_recognition_tpu.data.datasets import (
        BucketedDataset,
        load_manifest,
    )
    from nn_conformer_for_speech_recognition_tpu.data.streaming import (
        StreamingDataset,
    )
    from nn_conformer_for_speech_recognition_tpu.data.vocab import build_vocab

    man = make_synthetic_corpus(str(tmp_path), ["up", "down", "left"], 37, 2, 2)
    utts = load_manifest(man["train"])
    vocab = build_vocab("word", [u.transcript for u in utts])
    kw = dict(batch_size=8, bucket_boundaries=[8000, 16000], max_target_len=4)
    ref = BucketedDataset(utts, vocab, cache_audio=False, **kw)
    stream = StreamingDataset(utts, vocab, num_workers=3, queue_depth=2, **kw)

    ref_batches = list(ref.epoch(seed=5))
    got_batches = list(stream.epoch(seed=5))
    assert len(got_batches) == len(ref_batches) == ref.num_batches()
    for rb, gb in zip(ref_batches, got_batches):
        np.testing.assert_array_equal(gb.indices, rb.indices)
        np.testing.assert_array_equal(gb.audio, rb.audio)
        np.testing.assert_array_equal(gb.targets, rb.targets)
        np.testing.assert_array_equal(gb.audio_lengths, rb.audio_lengths)


def test_streaming_bounded_rss_10k_corpus(tmp_path):
    """Stream a 10k-utterance corpus: host RSS stays bounded by the queue
    depth (no whole-corpus RAM cache), and init header-probing is parallel
    (thread pool) — the 960h-scale requirements."""
    from nn_conformer_for_speech_recognition_tpu.data.audio import (
        make_synthetic_corpus,
    )
    from nn_conformer_for_speech_recognition_tpu.data.datasets import load_manifest
    from nn_conformer_for_speech_recognition_tpu.data.streaming import (
        StreamingDataset,
    )
    from nn_conformer_for_speech_recognition_tpu.data.vocab import build_vocab

    n = 10_000
    man = make_synthetic_corpus(str(tmp_path), ["a", "b"], n, 1, 1)
    utts = load_manifest(man["train"])
    vocab = build_vocab("word", ["a b"])
    ds = StreamingDataset(
        utts, vocab, batch_size=64, bucket_boundaries=[16000],
        max_target_len=2, num_workers=4, queue_depth=4,
    )
    assert len(ds) == n and ds.num_batches() == -(-n // 64)
    # corpus ≈ n·16000·4B ≈ 640 MB of f32 audio; bounded streaming must not
    # accumulate it (queue_depth·batch ≈ 4·64·16000·4B ≈ 16 MB + decode bufs)
    before = _rss_mb()
    count = 0
    for batch in ds.epoch(seed=0):
        count += 1
        assert batch.audio.shape == (64, 16000)
    after = _rss_mb()
    assert count == ds.num_batches()
    assert not ds._cache, "streaming dataset must not cache audio"
    assert after - before < 200, (before, after)


def test_streaming_no_deadlock_depth_smaller_than_workers(tmp_path):
    """Regression: workers must acquire a flow-control ticket BEFORE claiming
    a job — claiming first deadlocks when the lowest unconsumed job's worker
    starves for tickets (queue_depth < num_workers makes it near-certain)."""
    from nn_conformer_for_speech_recognition_tpu.data.audio import (
        make_synthetic_corpus,
    )
    from nn_conformer_for_speech_recognition_tpu.data.datasets import load_manifest
    from nn_conformer_for_speech_recognition_tpu.data.streaming import (
        StreamingDataset,
    )
    from nn_conformer_for_speech_recognition_tpu.data.vocab import build_vocab

    man = make_synthetic_corpus(str(tmp_path), ["a", "b"], 80, 1, 1)
    utts = load_manifest(man["train"])
    vocab = build_vocab("word", ["a b"])
    ds = StreamingDataset(
        utts, vocab, batch_size=2, bucket_boundaries=[16000],
        max_target_len=2, num_workers=6, queue_depth=1,
    )
    for seed in range(3):
        assert sum(1 for _ in ds.epoch(seed=seed)) == ds.num_batches()
