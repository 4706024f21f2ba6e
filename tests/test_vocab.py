"""Tokenizer tests: myVocab/WPM semantics, round-trips, file IO."""

import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu.data.vocab import (
    BLANK_TOKEN,
    PAD_TOKEN,
    UNK_TOKEN,
    WordPieceVocab,
    WordVocab,
    build_vocab,
    learn_wordpieces,
    load_any_vocab,
    normalize_text,
)

TRANSCRIPTS = [
    "yes no up down left",
    "yes yes stop go",
    "left right forward backward",
    "go go go stop",
]


def test_word_vocab_special_order():
    v = WordVocab.build(TRANSCRIPTS)
    # myvocab.py:94-99 ordering: blank, pad, unk at 0/1/2
    assert v.tokens[0] == BLANK_TOKEN and v.tokens[1] == PAD_TOKEN and v.tokens[2] == UNK_TOKEN
    assert v.blank_id == 0 and v.pad_id == 1 and v.unk_id == 2
    # frequency order: 'go' (4) before 'yes' (3)
    assert v.tokens[3] == "go" and v.tokens[4] == "yes"


def test_word_vocab_parse_decode_roundtrip():
    v = WordVocab.build(TRANSCRIPTS)
    ids = v.parse("yes stop go")
    assert v.decode_ids(ids) == "yes stop go"
    # unknown words → unk id; decode keeps the <unk> token text
    ids = v.parse("yes zzz")
    assert ids[1] == v.unk_id


def test_word_vocab_decode_drops_pad_blank_no_collapse():
    v = WordVocab.build(TRANSCRIPTS)
    go = v.index["go"]
    # word-level decode must NOT collapse repeats (myvocab.py:211-231)
    assert v.decode_ids([v.blank_id, go, go, v.pad_id, go]) == "go go go"


def test_word_vocab_truncation():
    v = WordVocab.build(TRANSCRIPTS, ntokens=2)
    assert len(v) == 5  # 3 specials + 2


def test_word_vocab_save_load(tmp_path):
    v = WordVocab.build(TRANSCRIPTS)
    p = str(tmp_path / "vocab.txt")
    v.save(p)
    v2 = load_any_vocab(p)
    assert isinstance(v2, WordVocab)
    assert v2.tokens == v.tokens


def test_normalize_text():
    assert normalize_text("Hello, World!  it's ME.") == "hello world it's me"


def test_wordpiece_learner_covers_corpus():
    pieces = learn_wordpieces(TRANSCRIPTS, vocab_size=64, min_freq=1)
    assert len(pieces) <= 64
    v = WordPieceVocab.build(TRANSCRIPTS, ntokens=64, min_freq=1)
    # every training word segments without unk
    for line in TRANSCRIPTS:
        ids = v.parse(line)
        assert v.unk_id not in ids, line


def test_wordpiece_special_order():
    v = WordPieceVocab.build(TRANSCRIPTS, ntokens=64, min_freq=1)
    # vocabs/wmp_vocab.txt head order: pad, blank, unk
    assert v.tokens[0] == PAD_TOKEN and v.tokens[1] == BLANK_TOKEN and v.tokens[2] == UNK_TOKEN


def test_wordpiece_roundtrip():
    v = WordPieceVocab.build(TRANSCRIPTS, ntokens=128, min_freq=1)
    for line in TRANSCRIPTS:
        ids = v.parse(line)
        assert v.decode_ids(ids) == normalize_text(line)


def test_wordpiece_ctc_collapse_decode():
    v = WordPieceVocab.build(TRANSCRIPTS, ntokens=128, min_freq=1)
    ids = v.parse("go stop")
    # interleave repeats + blanks: decode must collapse (wordpiecemodel.py:375-379)
    noisy = []
    for i in ids:
        noisy += [i, i, v.blank_id]
    assert v.decode_ids(noisy) == "go stop"


def test_wordpiece_repeat_without_blank_not_collapsed():
    """wordpiecemodel.py:376 collapses only when a blank is present."""
    v = WordPieceVocab.build(TRANSCRIPTS, ntokens=128, min_freq=1)
    ids = v.parse("go")
    assert v.decode_ids(ids + ids) == "go go"


def test_wordpiece_unk_tolerance():
    v = WordPieceVocab.build(TRANSCRIPTS, ntokens=128, min_freq=1)
    assert v.is_tolerable("go stop yes", unk_tol=0.3)
    assert not v.is_tolerable("qqq zzz xxx", unk_tol=0.3)


def test_wordpiece_save_load(tmp_path):
    v = WordPieceVocab.build(TRANSCRIPTS, ntokens=128, min_freq=1)
    p = str(tmp_path / "wpm.txt")
    v.save(p)
    v2 = load_any_vocab(p)
    assert isinstance(v2, WordPieceVocab)
    assert v2.tokens == v.tokens
    assert v2.parse("go stop") == v.parse("go stop")


def test_build_vocab_dispatch():
    assert isinstance(build_vocab("word", TRANSCRIPTS), WordVocab)
    assert isinstance(build_vocab("wordpiece", TRANSCRIPTS, 64), WordPieceVocab)
    with pytest.raises(ValueError):
        build_vocab("bpe", TRANSCRIPTS)
