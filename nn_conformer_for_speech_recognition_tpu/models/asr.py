"""The flagship ASR model: Conformer encoder + BiLSTM CTC head.

Mirrors the reference ``ASRNN`` (`lib/standard/asrnn.py:22-260`) capability
surface — encoder: ConvSubsampling → Conformer → projection block
(Linear→SiLU→norm, `asrnn.py:73-89`); decoder: BiLSTM (1 layer, 512 hidden,
bidirectional per `lib/hparams.py:78-81`) → dropout → Linear → log_softmax
(`asrnn.py:250-256`) — with the TPU-native deviations documented in
SURVEY.md §7: time-preserving subsampling instead of the fixed-``max_len``
flatten+Linear (`asrnn.py:28,206-209`), mask-based length handling instead of
row-dropping (`asrnn.py:211-215`), and SpecAugment applied in the train step
(`ops/specaugment.py`) rather than buried in the forward pass.

Shallow LM fusion (``x += lm(...)`` at `asrnn.py:257-258`) is provided by
`models/lm.py` and composed in the eval path.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nn_conformer_for_speech_recognition_tpu.config import ModelConfig
from nn_conformer_for_speech_recognition_tpu.models.conformer import (
    ConformerEncoder,
    MaskedBatchNorm,
    length_mask,
)
from nn_conformer_for_speech_recognition_tpu.models.subsampling import ConvSubsampling


class BiLSTM(nn.Module):
    """Bidirectional LSTM over padded sequences.

    Two compute paths:
      * flax ``nn.RNN`` + ``OptimizedLSTMCell`` (lax.scan → XLA ``while``);
      * ``use_pallas``: the fused kernel (`ops/pallas/lstm.py`) with the
        input projection hoisted out of the recurrence — one kernel per
        direction instead of a per-step ``while`` (the while's launch +
        carry copies dominate the long-form train step, docs/STATUS.md).

    The Pallas path owns packed params (w_ih/w_hh/bias per direction), so
    checkpoints are NOT interchangeable across the flag; valid-region
    outputs of the two paths agree in distribution but not parameter-wise.
    """

    hidden: int
    num_layers: int = 1
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            from nn_conformer_for_speech_recognition_tpu.ops.pallas.lstm import (
                lstm_pallas,
            )

            dirs = [("fwd", False)] + ([("bwd", True)] if self.bidirectional else [])
            for i in range(self.num_layers):
                d = x.shape[-1]
                outs = []
                for name, rev in dirs:
                    w_ih = self.param(
                        f"lstm_{name}_{i}_w_ih",
                        nn.initializers.lecun_normal(), (d, 4 * self.hidden),
                    )
                    w_hh = self.param(
                        f"lstm_{name}_{i}_w_hh",
                        nn.initializers.orthogonal(), (self.hidden, 4 * self.hidden),
                    )
                    bias = self.param(
                        f"lstm_{name}_{i}_bias",
                        nn.initializers.zeros, (4 * self.hidden,),
                    )
                    xw = x.astype(self.dtype) @ w_ih.astype(self.dtype) + bias
                    outs.append(lstm_pallas(xw, w_hh, lengths, reverse=rev))
                x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
            return x.astype(self.dtype)
        for i in range(self.num_layers):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                name=f"lstm_fwd_{i}",
            )(x, seq_lengths=lengths)
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                    reverse=True,
                    keep_order=True,
                    name=f"lstm_bwd_{i}",
                )(x, seq_lengths=lengths)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x


class ConformerCTC(nn.Module):
    """features (B, T, n_mels) + lengths → log-probs (B, T', V) + lengths'."""

    config: ModelConfig
    vocab_size: int

    @property
    def dtype(self):
        return jnp.dtype(self.config.resolved_compute_dtype())

    def setup(self):
        cfg = self.config
        self.subsampling = ConvSubsampling(
            cfg.subsampling, cfg.encoder.d_model, dtype=self.dtype
        )
        self.encoder = ConformerEncoder(
            cfg.encoder,
            use_pallas=cfg.use_pallas,
            attention_impl=cfg.attention_impl if cfg.use_pallas else "xla",
            conv_impl=cfg.resolved_conv_impl(),
            remat=cfg.remat,
            dtype=self.dtype,
        )
        self.input_dropout = nn.Dropout(cfg.encoder.dropout)
        # projection block: Linear → SiLU → masked BN (`asrnn.py:73-89`)
        self.projection = nn.Dense(cfg.decoder.projection_dim, dtype=self.dtype)
        self.projection_norm = MaskedBatchNorm(dtype=self.dtype)
        self.decoder_lstm = BiLSTM(
            cfg.decoder.lstm_hidden,
            num_layers=cfg.decoder.lstm_layers,
            bidirectional=cfg.decoder.bidirectional,
            dtype=self.dtype,
            use_pallas=cfg.resolved_lstm_impl() == "pallas",
        )
        self.decoder_dropout = nn.Dropout(cfg.decoder.dropout)
        self.final_fc = nn.Dense(self.vocab_size, dtype=jnp.float32)

    def encode(
        self,
        features: jnp.ndarray,
        frame_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h, lengths = self.subsampling(features, frame_lengths)
        h = self.input_dropout(h, deterministic=deterministic)
        h = self.encoder(h, lengths, deterministic=deterministic)
        mask = length_mask(lengths, h.shape[1])
        h = nn.silu(self.projection(h))
        h = self.projection_norm(h, mask, use_running_average=deterministic)
        return h * mask[..., None].astype(h.dtype), lengths

    def __call__(
        self,
        features: jnp.ndarray,
        frame_lengths: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h, lengths = self.encode(features, frame_lengths, deterministic)
        h = self.decoder_lstm(h, lengths)
        h = self.decoder_dropout(h, deterministic=deterministic)
        logits = self.final_fc(h.astype(jnp.float32))
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, lengths


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
