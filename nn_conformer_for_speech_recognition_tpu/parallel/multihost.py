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

    Hosts may hold different N (uneven utterance sharding) and different L
    (bucketed label widths): both dims are padded to the global max before
    the allgather (shape agreement), and the padding rows are dropped after.
    """
    if not is_multihost():
        return ids, lengths
    from jax.experimental import multihost_utils

    n, l = ids.shape
    dims = multihost_utils.process_allgather(np.asarray([n, l]))
    n_max, l_max = int(dims[:, 0].max()), int(dims[:, 1].max())
    ids_p = np.zeros((n_max, l_max), ids.dtype)
    ids_p[:n, :l] = ids
    len_p = np.full((n_max,), -1, np.int64)  # -1 marks a padding row
    len_p[:n] = lengths
    ids_g = multihost_utils.process_allgather(ids_p).reshape(-1, l_max)
    len_g = multihost_utils.process_allgather(len_p).reshape(-1)
    keep = len_g >= 0
    return ids_g[keep], len_g[keep]


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


# ---------------------------------------------------------------------------
# Per-host execution against a globally-trained state
# ---------------------------------------------------------------------------


def local_mesh(config=None):
    """Mesh over THIS process's devices (for per-host eval / pseudo-label
    passes: each host decodes its utterance shard independently, then the
    string/metric gathers above union the results — SURVEY §3.4 boundary
    note).  Pure DP over the local chips; the config's axis names are kept so
    Trainer sharding helpers work unchanged."""
    from jax.sharding import Mesh

    from nn_conformer_for_speech_recognition_tpu.config import MeshConfig

    config = config or MeshConfig()
    return Mesh(
        np.asarray(jax.local_devices()).reshape(-1, 1),
        (config.data_axis, config.model_axis),
    )


def host_local_state(state):
    """Pull a (replicated) global TrainState to host-local values so a
    local-mesh Trainer can run per-host inference with the globally-trained
    params.  Every leaf of a pure-DP state is fully replicated, so each
    host's addressable shard *is* the full value — no communication."""
    def pull(x):
        if isinstance(x, jax.Array):
            if not x.is_fully_addressable:
                assert x.is_fully_replicated, (
                    "host_local_state needs replicated leaves (pure-DP "
                    f"state); got sharding {x.sharding}"
                )
                return np.asarray(x.addressable_data(0))
            return np.asarray(x)
        return x

    import jax.numpy as jnp

    rng = jax.random.wrap_key_data(
        jnp.asarray(pull(jax.random.key_data(state.rng)))
    )
    return state.replace(
        step=pull(state.step),
        params=jax.tree.map(pull, state.params),
        batch_stats=jax.tree.map(pull, state.batch_stats),
        opt_state=jax.tree.map(pull, state.opt_state),
        rng=rng,
    )


def params_fingerprint(params) -> np.ndarray:
    """Order-stable 32-byte digest of every param leaf's exact bytes."""
    import hashlib

    h = hashlib.sha256()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        h.update("/".join(str(k) for k in path).encode())
        arr = leaf
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            arr = arr.addressable_data(0)
        h.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
    return np.frombuffer(h.digest(), np.uint8)


def assert_params_in_sync(params) -> None:
    """Cross-process assertion that every host holds bit-identical params
    (the DP invariant; no-op single-process)."""
    if not is_multihost():
        return
    from jax.experimental import multihost_utils

    digests = multihost_utils.process_allgather(params_fingerprint(params))
    if not (digests == digests[0]).all():
        raise AssertionError(
            f"params diverged across hosts: digests={digests.tolist()}"
        )
