"""Lexicon / LM-corpus / LM-trainer tests."""

import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu.config import LMConfig
from nn_conformer_for_speech_recognition_tpu.data.lm_corpus import (
    Lexicon,
    LMCorpus,
    build_phoneme_vocab,
    clean_book_text,
)
from nn_conformer_for_speech_recognition_tpu.data.vocab import WordVocab

LEX = Lexicon({
    "go": ["G", "OW"],
    "stop": ["S", "T", "AA", "P"],
    "up": ["AH", "P"],
    "down": ["D", "AW", "N"],
    "a": ["AH"],
})


def test_lexicon_roundtrip(tmp_path):
    p = str(tmp_path / "lex.txt")
    LEX.save(p)
    l2 = Lexicon.load(p)
    assert l2.entries["stop"] == ["S", "T", "AA", "P"]


def test_lexicon_pronounce():
    assert LEX.pronounce("go") == ["G", "OW"]
    assert LEX.pronounce_sentence("go stop") == ["G", "OW", "S", "T", "AA", "P"]


def test_oov_segmentation():
    """OOV words split greedily into in-lexicon chunks (lmvocab.py:85-138)."""
    # 'goup' = 'go' + 'up'
    assert LEX.segment_word("goup") == ["go", "up"]
    # chars with no lexicon coverage are skipped
    assert LEX.segment_word("xgo") == ["go"]


def test_clean_book_text():
    lines = [
        "CHAPTER ONE",       # uppercase heading → dropped
        "XIV.",              # roman numeral → dropped
        "",                  # empty → dropped
        "Hello, World! This is a sentence.",
        " ".join(["word"] * 40),  # truncated to max_len
    ]
    out = clean_book_text(lines, max_len=20)
    assert out[0] == "hello world this is a sentence"
    assert len(out) == 2 and len(out[1].split()) == 20


def test_phoneme_vocab():
    pv = build_phoneme_vocab(LEX)
    assert pv.tokens[:3] == ["<blank>", "<pad>", "<unk>"]
    assert "OW" in pv.index


def test_corpus_batches():
    wv = WordVocab.build(["go stop", "up down", "go go"])
    corpus = LMCorpus(["go stop", "up down", "go go go"], LEX, wv,
                      max_src_len=12, max_tgt_len=4)
    assert len(corpus) == 3
    batches = list(corpus.batches(2, seed=0))
    assert len(batches) == 2
    src, slen, tgt, tlen = batches[0]
    assert src.shape == (2, 12) and tgt.shape == (2, 4)
    assert (slen > 0).all() and (tlen > 0).all()


def test_lm_trainer_loss_decreases():
    import jax

    wv = WordVocab.build(["go stop", "up down"])
    sentences = ["go stop", "up down", "go go", "stop up", "down go"] * 4
    corpus = LMCorpus(sentences, LEX, wv, max_src_len=16, max_tgt_len=4)
    from nn_conformer_for_speech_recognition_tpu.train.lm_loop import LMTrainer

    cfg = LMConfig(num_encoder_layers=1, num_decoder_layers=1, embed_dim=32,
                   num_heads=2, ffn_dim=64, dropout=0.0)
    tr = LMTrainer(cfg, src_vocab_size=len(corpus.phoneme_vocab),
                   tgt_vocab_size=len(wv), tgt_pad_id=wv.pad_id,
                   learning_rate=3e-3)
    tr.init_state(seed=0)
    tr.train(corpus, epochs=6, batch_size=8)
    h = tr.history["lm_loss"]
    assert h[-1] < h[0], h
    assert tr.history["lm_ppl"][-1] < tr.history["lm_ppl"][0]
    # eval path
    ppl_loss = tr.evaluate(corpus, batch_size=8)
    assert np.isfinite(ppl_loss)
