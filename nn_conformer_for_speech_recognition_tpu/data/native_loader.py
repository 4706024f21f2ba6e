"""Native batch audio loader with background prefetch.

Host-side pipeline layer: decodes WAV batches with the C++ ``wavio``
extension (multithreaded, GIL-released — `native/wavio.cpp`) and overlaps
decode of batch N+1 with device compute of batch N via a double-buffered
prefetch thread, so the accelerator never waits on host IO (the reference's
pipeline is bound by its 125-clips/s host featurization loop, `main.ipynb`
cell 33; here featurization is on-device and decode is prefetched).

Falls back transparently to the pure-Python `data/audio.py` reader when the
extension cannot be built (no compiler).
"""

from __future__ import annotations

import os
import queue
import sys
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

_wavio = None
_tried = False


def _load_native():
    global _wavio, _tried
    if _tried:
        return _wavio
    _tried = True
    try:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        native_dir = os.path.join(repo_root, "native")
        sys.path.insert(0, native_dir)
        try:
            import importlib

            build = importlib.import_module("build")
            build.build()
            _wavio = importlib.import_module("wavio")
        finally:
            sys.path.remove(native_dir)
    except Exception:
        _wavio = None
    return _wavio


def native_available() -> bool:
    return _load_native() is not None


def decode_batch(
    paths: Sequence[str],
    out: np.ndarray,
    lengths: np.ndarray,
    num_threads: int = 8,
) -> None:
    """Fill ``out`` (B, S) f32 / ``lengths`` (B,) i32 from WAV files; rows
    beyond ``len(paths)`` are untouched."""
    w = _load_native()
    if w is not None:
        w.decode_batch(list(paths), out[: len(paths)], lengths[: len(paths)],
                       num_threads=num_threads)
        return
    from nn_conformer_for_speech_recognition_tpu.data.audio import read_wav

    for i, p in enumerate(paths):
        x, _sr = read_wav(p)
        n = min(len(x), out.shape[1])
        out[i, :n] = x[:n]
        out[i, n:] = 0.0
        lengths[i] = n


class PrefetchIterator:
    """Wrap a batch iterator: produce batches on a background thread so the
    next host-side batch build overlaps device compute."""

    _SENTINEL = object()

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None

        def run():
            try:
                for item in iterator:
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
