"""Multi-host coordination utilities.

On a pod slice every host runs the same program over its data shard
(`parallel/mesh.initialize_multihost` + `data/datasets.shard_utterances`);
these helpers gather host-local results globally (SURVEY.md §2.3 collective
comms row: "cross-host gather of NST pseudo-label strings via
multihost_utils", §5 metrics row: "WER on host from gathered decodes").

Everything degrades to identity in single-process runs, so the same code
path is exercised by the CPU-mesh tests.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np


def is_multihost() -> bool:
    return jax.process_count() > 1


def gather_metric(value: float, weight: float = 1.0) -> Tuple[float, float]:
    """Weighted-mean reduction of a host-local metric across processes.

    Returns (global_mean, global_weight).
    """
    if not is_multihost():
        return value, weight
    from jax.experimental import multihost_utils

    arr = np.asarray([value * weight, weight], np.float64)
    total = multihost_utils.process_allgather(arr)  # (P, 2)
    tw = float(total[:, 1].sum())
    return float(total[:, 0].sum() / max(tw, 1e-12)), tw


def gather_token_batches(
    ids: np.ndarray, lengths: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """All-gather decoded token-id tensors across hosts.

    Strings cannot cross jit/process boundaries (SURVEY.md §7 "NST label
    plumbing"), so pseudo-labels travel as (N, L) int32 + (N,) lengths and
    are decoded to strings on each host after the gather.
    """
    if not is_multihost():
        return ids, lengths
    from jax.experimental import multihost_utils

    ids_g = multihost_utils.process_allgather(ids)
    len_g = multihost_utils.process_allgather(lengths)
    return ids_g.reshape(-1, ids.shape[-1]), len_g.reshape(-1)


def gather_pseudo_labels(labels: Dict[int, str]) -> Dict[int, str]:
    """Merge host-local {global_utterance_index: text} pseudo-label maps.

    Indices are globally unique (static per-host sharding in
    ``shard_utterances``), so the merge is a union.  Texts are shipped as
    fixed-width uint8 arrays through process_allgather.
    """
    if not is_multihost():
        return labels
    from jax.experimental import multihost_utils

    items = sorted(labels.items())
    n = len(items)
    encoded = [text.encode("utf-8") for _, text in items]
    local_max = max((len(b) for b in encoded), default=0)
    # pad host counts AND text widths to the global max so allgather shapes
    # agree — no silent truncation of long-form transcripts (the round-1
    # 256-byte cap corrupted LibriSpeech-length pseudo-labels)
    dims = multihost_utils.process_allgather(np.asarray([n, local_max]))
    n_max = int(dims[:, 0].max())
    max_len = max(int(dims[:, 1].max()), 1)
    idx = np.full((n_max,), -1, np.int64)
    blen = np.zeros((n_max,), np.int32)
    txt = np.zeros((n_max, max_len), np.uint8)
    for row, ((i, _), b) in enumerate(zip(items, encoded)):
        idx[row] = i
        blen[row] = len(b)
        txt[row, : len(b)] = np.frombuffer(b, np.uint8)
    idx_g = multihost_utils.process_allgather(idx).reshape(-1)
    blen_g = multihost_utils.process_allgather(blen).reshape(-1)
    txt_g = multihost_utils.process_allgather(txt).reshape(-1, max_len)
    out: Dict[int, str] = {}
    for i, nb, row in zip(idx_g, blen_g, txt_g):
        if i < 0:
            continue
        out[int(i)] = bytes(row[: int(nb)]).decode("utf-8", errors="ignore")
    return out
