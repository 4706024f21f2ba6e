"""TPU-native Conformer ASR + Noisy Student Training framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
`icadriani/nn_conformer_for_speech_recognition` (see SURVEY.md).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: model-step compiles cost minutes on
# remote-compile TPU setups; the on-disk cache makes every process after the
# first start instantly.  Opt out with NN_CONFORMER_TPU_NO_CACHE=1.
if not _os.environ.get("NN_CONFORMER_TPU_NO_CACHE"):
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.jax_cache")),
        )
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache support missing → run without it
        pass

from nn_conformer_for_speech_recognition_tpu import config  # noqa: F401,E402
