"""Transformer encoder-decoder language model + ASR fusion.

Capability surface of `unused_lib/finetuning/languagemodel.py:6-111`: an
enc-dec transformer over pronunciation→word streams — embeddings with
sinusoidal positional encodings (`:102-106`), N=4 encoder self-attn+FFN
layers (`:57-73`), N=4 decoder blocks of causal self-attention + cross
attention + FFN (`:74-92`, causal mask builder `:41-56`), final projection
(`:108-111`).

Two fusion modes mirror the reference:
  * shallow fusion — ``logits += lm_logits(prev ngram)`` during decoding
    (`lib/standard/asrnn.py:257-258``, ``hp.ngram=2``);
  * weight fusion — additive merge of LM attention projections into the ASR
    Conformer MHSA weights (`lib/standard/runner.py:78-101` ``fuse_models``:
    input-LM layers → first conformer blocks, output-LM layers → mirrored
    last blocks), implemented shape-gated over the param pytrees.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_positions(t: int, d: int) -> np.ndarray:
    pos = np.arange(t, dtype=np.float32)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, d, 2, dtype=np.float32) / d))
    ang = pos[:, None] * inv_freq[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1).astype(np.float32)


class TransformerLayer(nn.Module):
    d: int
    heads: int
    ffn: int
    dropout: float
    causal_self: bool = False
    cross: bool = False

    @nn.compact
    def __call__(self, x, enc_out=None, mask=None, enc_mask=None, deterministic=True):
        t = x.shape[1]
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :]
        if self.causal_self:
            causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
            attn_mask = causal if attn_mask is None else (attn_mask & causal)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout, name="self_attn"
        )(x, x, mask=attn_mask, deterministic=deterministic)
        x = nn.LayerNorm()(x + h)
        if self.cross:
            cmask = None if enc_mask is None else enc_mask[:, None, None, :]
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dropout_rate=self.dropout, name="cross_attn"
            )(x, enc_out, mask=cmask, deterministic=deterministic)
            x = nn.LayerNorm()(x + h)
        h = nn.Dense(self.ffn)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d)(h)
        return nn.LayerNorm()(x + h)


class TransformerLM(nn.Module):
    """Pronunciation→word enc-dec LM (vocab ids in, next-word logits out)."""

    src_vocab: int
    tgt_vocab: int
    d: int = 320
    heads: int = 8
    ffn: int = 512
    enc_layers: int = 4
    dec_layers: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        src_ids: jnp.ndarray,  # (B, S) pronunciation stream
        tgt_ids: jnp.ndarray,  # (B, T) word stream (teacher-forced)
        src_mask: Optional[jnp.ndarray] = None,
        tgt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        s, t = src_ids.shape[1], tgt_ids.shape[1]
        enc = nn.Embed(self.src_vocab, self.d, name="src_embed")(src_ids)
        enc = enc + jnp.asarray(sinusoidal_positions(s, self.d))
        for i in range(self.enc_layers):
            enc = TransformerLayer(
                self.d, self.heads, self.ffn, self.dropout, name=f"enc_{i}"
            )(enc, mask=src_mask, deterministic=deterministic)

        dec = nn.Embed(self.tgt_vocab, self.d, name="tgt_embed")(tgt_ids)
        dec = dec + jnp.asarray(sinusoidal_positions(t, self.d))
        for i in range(self.dec_layers):
            dec = TransformerLayer(
                self.d, self.heads, self.ffn, self.dropout,
                causal_self=True, cross=True, name=f"dec_{i}",
            )(dec, enc_out=enc, mask=tgt_mask, enc_mask=src_mask,
              deterministic=deterministic)
        return nn.Dense(self.tgt_vocab, name="out_proj")(dec)


class CausalWordLM(nn.Module):
    """Decoder-only word LM used for shallow fusion over greedy ASR decodes:
    given the previous ``ngram`` tokens, produce next-token logits — the
    ``lm(ngram, argmax(x))`` hook of `asrnn.py:257-258`."""

    vocab: int
    d: int = 256
    heads: int = 4
    ffn: int = 512
    layers: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, ids: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        t = ids.shape[1]
        x = nn.Embed(self.vocab, self.d)(ids)
        x = x + jnp.asarray(sinusoidal_positions(t, self.d))
        for i in range(self.layers):
            x = TransformerLayer(
                self.d, self.heads, self.ffn, self.dropout,
                causal_self=True, name=f"layer_{i}",
            )(x, deterministic=deterministic)
        return nn.Dense(self.vocab, name="out_proj")(x)


def shallow_fusion(
    asr_log_probs: jnp.ndarray,
    lm_apply,
    lm_weight: float = 0.3,
    ngram: int = 2,
) -> jnp.ndarray:
    """Add LM next-token log-probs for the greedy prefix to ASR frame
    log-probs — the reference's shallow fusion (`asrnn.py:257-258`),
    formulated on-device: prefix = argmax over previous frames (ngram
    context window)."""
    ids = jnp.argmax(asr_log_probs, axis=-1)  # (B, T)
    # context for frame t = ids[t-ngram : t]; shift right by one
    ctx = jnp.pad(ids[:, :-1], ((0, 0), (1, 0)))
    lm_logits = lm_apply(ctx)  # (B, T, V)
    return asr_log_probs + lm_weight * jax.nn.log_softmax(lm_logits, axis=-1)


def fuse_lm_weights_into_asr(asr_params: Dict, lm_params: Dict, scale: float = 1.0) -> Dict:
    """Additively merge LM attention projection kernels into ASR MHSA
    kernels where shapes match (`runner.py:78-101`): encoder-LM layers fold
    into the first conformer blocks, decoder-LM layers into the mirrored
    last blocks.  Shape-gated — non-matching kernels pass through."""
    asr_params = jax.tree.map(lambda x: x, asr_params)  # copy

    def collect_attn_kernels(tree, out):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "self_attn" in k or "attention" in k:
                    for name in ("query", "key", "value", "out"):
                        sub = v.get(name)
                        if isinstance(sub, dict) and "kernel" in sub:
                            out.append(sub["kernel"])
                collect_attn_kernels(v, out)
        return out

    lm_kernels = collect_attn_kernels(lm_params, [])
    if not lm_kernels:
        return asr_params

    # target: qkv/out_proj kernels of conformer blocks, in block order
    enc = asr_params.get("encoder", asr_params)
    block_names = sorted([k for k in enc if k.startswith("block_")],
                         key=lambda s: int(s.split("_")[1]))
    i = 0
    for b in block_names:
        mhsa = enc[b].get("mhsa", {})
        for name in ("qkv", "out_proj"):
            node = mhsa.get(name)
            if not (isinstance(node, dict) and "kernel" in node):
                continue
            if i < len(lm_kernels):
                lk = lm_kernels[i]
                k = node["kernel"]
                flat_lk = jnp.reshape(lk, (-1,))
                if flat_lk.size >= k.size:
                    node["kernel"] = k + scale * jnp.reshape(
                        flat_lk[: k.size], k.shape
                    )
                i += 1
    return asr_params
