"""Evaluation metrics: WER/CER and running means.

The reference computes WER with jiwer on greedy decodes, after padding the
shorter of (hyp words, ref words) with ``'_'`` to equal length
(`lib/standard/runner.py:149-160`).  jiwer is not a dependency here; WER is a
standard word-level Levenshtein distance (insertions+deletions+substitutions
over reference length).  Both the standard metric and the reference's padded
protocol are provided so parity runs can match the reference's numbers
exactly.
"""

from __future__ import annotations

from typing import Sequence


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance with O(min(len)) memory."""
    if len(ref) < len(hyp):
        ref, hyp = hyp, ref
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            cur[j] = min(
                prev[j] + 1,  # deletion
                cur[j - 1] + 1,  # insertion
                prev[j - 1] + (r != h),  # substitution
            )
        prev = cur
    return prev[-1]


def wer(refs: Sequence[str], hyps: Sequence[str]) -> float:
    """Corpus WER in [0, 1]: total edits / total reference words."""
    edits, n = 0, 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        edits += edit_distance(rw, hw)
        n += len(rw)
    return edits / max(n, 1)


def cer(refs: Sequence[str], hyps: Sequence[str]) -> float:
    edits, n = 0, 0
    for r, h in zip(refs, hyps):
        edits += edit_distance(list(r), list(h))
        n += len(r)
    return edits / max(n, 1)


def padded_wer(refs: Sequence[str], hyps: Sequence[str]) -> float:
    """The reference's protocol (`runner.py:149-160`): per batch, pad the
    shorter word list with '_' to equal length, then word error rate × 1
    (callers multiply by 100).  Padding turns length mismatches into
    substitutions against '_' instead of pure ins/del."""
    edits, n = 0, 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        if len(rw) < len(hw):
            rw = rw + ["_"] * (len(hw) - len(rw))
        elif len(hw) < len(rw):
            hw = hw + ["_"] * (len(rw) - len(hw))
        edits += edit_distance(rw, hw)
        n += len(rw)
    return edits / max(n, 1)


class Mean:
    """Running mean accumulator (loss/WER per epoch)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value: float, weight: int = 1) -> None:
        self.total += float(value) * weight
        self.count += weight

    def result(self) -> float:
        return self.total / max(self.count, 1)


def perplexity(mean_loss: float) -> float:
    """LM perplexity = exp(loss) (`runner.py:162`)."""
    import math

    return math.exp(min(mean_loss, 700.0))
