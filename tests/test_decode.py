"""Decoding tests: greedy, collapse, and beam search vs. exhaustive search."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nn_conformer_for_speech_recognition_tpu.ops.decode import (
    collapse_repeats,
    ctc_beam_search,
    greedy_decode,
)


def test_greedy_decode_masks_padding(rng):
    lp = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))
    ids = greedy_decode(lp, jnp.array([6, 3]), pad_id=1)
    assert ids.shape == (2, 6)
    assert (np.asarray(ids)[1, 3:] == 1).all()


def test_collapse_repeats():
    ids = jnp.array([[0, 2, 2, 0, 3, 3, 3, 2, 1, 1]], dtype=jnp.int32)
    packed, lengths = collapse_repeats(ids, blank_id=0, pad_id=1)
    assert int(lengths[0]) == 3
    np.testing.assert_array_equal(np.asarray(packed)[0, :3], [2, 3, 2])
    assert (np.asarray(packed)[0, 3:] == 1).all()


def _exhaustive_ctc_best(log_probs, blank_id, max_len):
    """Brute-force best label sequence: sum path probs per collapsed label."""
    t, v = log_probs.shape
    from collections import defaultdict

    scores = defaultdict(lambda: -np.inf)

    def collapse(path):
        out, prev = [], -1
        for c in path:
            if c != prev and c != blank_id:
                out.append(c)
            prev = c
        return tuple(out)

    for path in itertools.product(range(v), repeat=t):
        lp = sum(log_probs[i, c] for i, c in enumerate(path))
        lab = collapse(path)
        if len(lab) > max_len:
            continue
        scores[lab] = np.logaddexp(scores[lab], lp)
    return max(scores.items(), key=lambda kv: kv[1])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_search_matches_exhaustive(seed):
    rng = np.random.default_rng(seed)
    t, v = 5, 4  # 4^5 = 1024 paths, enumerable
    logits = rng.standard_normal((1, t, v)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))

    best_lab, best_score = _exhaustive_ctc_best(lp[0], blank_id=0, max_len=8)

    toks, lens, scores = ctc_beam_search(
        jnp.asarray(lp), blank_id=0, beam=16, prune=3, max_label_len=8
    )
    got = tuple(np.asarray(toks)[0, 0, : int(lens[0, 0])])
    assert got == best_lab, (got, best_lab)
    # beam truncation loses a little path mass vs. the exhaustive sum, so the
    # score is a slight underestimate; the 1-best label must match exactly.
    assert best_score - 0.05 <= float(scores[0, 0]) <= best_score + 1e-3


def test_beam_search_respects_lengths(rng):
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((2, 10, 5)).astype(np.float32)), axis=-1
    )
    toks_a, lens_a, _ = ctc_beam_search(lp[:, :4], blank_id=0, beam=4, max_label_len=8)
    toks_b, lens_b, _ = ctc_beam_search(
        lp, jnp.array([4, 4]), blank_id=0, beam=4, max_label_len=8
    )
    np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))


def test_beam_search_beats_or_matches_greedy(rng):
    """Beam-1-best total score ≥ score of the greedy-collapsed hypothesis."""
    for seed in range(3):
        r = np.random.default_rng(seed)
        lp = np.asarray(
            jax.nn.log_softmax(jnp.asarray(r.standard_normal((1, 12, 6)).astype(np.float32)), axis=-1)
        )
        toks, lens, scores = ctc_beam_search(
            jnp.asarray(lp), blank_id=0, beam=8, prune=5, max_label_len=12
        )
        greedy_ids = np.argmax(lp[0], axis=-1)
        # greedy path prob is a lower bound on its collapsed label's score
        greedy_path_lp = lp[0][np.arange(12), greedy_ids].sum()
        assert float(scores[0, 0]) >= greedy_path_lp - 1e-4


def test_sharded_beam_matches_dense(rng):
    """Vocab-sharded TP beam (shard_map + all_gather/psum candidate
    exchange) returns the same hypotheses as the dense beam."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from nn_conformer_for_speech_recognition_tpu.ops.decode import (
        ctc_beam_search,
        ctc_beam_search_sharded,
    )

    B, T, V = 3, 12, 16  # V divisible by mp=4
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32)), -1
    )
    lens = jnp.asarray([12, 8, 5], jnp.int32)

    toks_d, lens_d, scores_d = ctc_beam_search(
        lp, lens, blank_id=0, beam=4, prune=4, max_label_len=12
    )

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("model",))
    f = shard_map(
        lambda x, n: ctc_beam_search_sharded(
            x, n, axis="model", blank_id=0, beam=4, prune=4, max_label_len=12
        ),
        mesh=mesh,
        in_specs=(P(None, None, "model"), P(None)),
        out_specs=(P(None), P(None), P(None)),
        check_vma=False,
    )
    toks_s, lens_s, scores_s = jax.jit(f)(lp, lens)

    np.testing.assert_allclose(
        np.asarray(scores_s), np.asarray(scores_d), rtol=1e-5, atol=1e-5
    )
    # compare best-hypothesis token sequences
    for b in range(B):
        n = int(lens_d[b, 0])
        assert int(lens_s[b, 0]) == n
        np.testing.assert_array_equal(
            np.asarray(toks_s[b, 0, :n]), np.asarray(toks_d[b, 0, :n])
        )
