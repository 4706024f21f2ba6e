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

# The image's sitecustomize pins jax_platforms to 'axon[,cpu]' (the TPU
# tunnel), but the tunnel's PJRT plugin sometimes registers under the name
# 'tpu' instead, making the pin fatal ("Unable to initialize backend
# 'axon'").  Remap a still-effective axon pin to auto-select, which resolves
# to the same chip under either plugin name.  Explicit choices made before
# this import (tests forcing 'cpu') are left alone, and this touches config
# only — no backend init happens here.
try:
    if (_jax.config.jax_platforms or "").split(",")[0] == "axon":
        _jax.config.update("jax_platforms", "")
except Exception:
    pass


def ensure_backend() -> None:
    """Initialize a usable JAX backend, surviving a stale platform pin.

    If the configured platform list fails to register (the tunnel plugin's
    name varies between images/sessions), fall back to auto-selection and
    retry.  Safe to call repeatedly; call before first device use in
    benches/drivers."""
    try:
        _jax.devices()
    except RuntimeError:
        _jax.config.update("jax_platforms", "")
        _jax.devices()

from nn_conformer_for_speech_recognition_tpu import config  # noqa: F401,E402
