"""TPU-native Conformer ASR + Noisy Student Training framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
`icadriani/nn_conformer_for_speech_recognition` (see SURVEY.md).
"""

__version__ = "0.1.0"

from nn_conformer_for_speech_recognition_tpu import config  # noqa: F401
