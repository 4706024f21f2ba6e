"""Fused STFT → power → mel → log Pallas kernel.

TPU-native replacement for librosa's host-side melspectrogram loop
(`lib/standard/speechcommands.py:103-124`, ~125 clips/s on CPU): one kernel
pass per (batch, frame-tile) computes

    frames = window ⊙ audio[t·hop : t·hop+n_fft]        (VMEM, DMA'd slice)
    re, im = frames @ DFT_real, frames @ DFT_imag       (MXU, rFFT-as-matmul)
    mel    = (re² + im²) @ mel_fb                       (MXU)
    out    = log(max(mel, floor))                       (VPU)

without materialising frames or the spectrogram in HBM.  rFFT is expressed
as two matmuls against a precomputed basis — there is no FFT primitive in
Pallas, and at n_fft ≤ 512 the (n_fft × n_bins) matmul rides the MXU at full
tilt (SURVEY.md §7 "Pallas STFT").  Bases are zero-padded to lane multiples
(257 bins → 384, n_mels → 128) so every matmul is tile-aligned.

Memory layout: Mosaic requires memref slices aligned to the (8, 128) f32
tile, so the padded audio is reshaped host-side to (B, R, 128) lane-rows and
each batch row is BlockSpec-pipelined into VMEM once (the index map is
constant across frame tiles, so Pallas reuses the resident row).
This constrains ``hop`` and ``n_fft`` to multiples of 128 (true for the
reference's hop=512, n_fft=512 — `lib/hparams.py:41`); other geometries fall
back to the jnp reference implementation.

Numerics parity is tested against `ops/features.log_mel_spectrogram`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nn_conformer_for_speech_recognition_tpu.config import FeatureConfig
from nn_conformer_for_speech_recognition_tpu.ops import features as F

from nn_conformer_for_speech_recognition_tpu.parallel.kernel_sharding import (
    shard_over_batch,
)

LANES = 128
SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _padded_bases(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float, htk: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """DFT real/imag (n_fft, bins_pad) and mel (bins_pad, mels_pad) bases."""
    n_bins = n_fft // 2 + 1
    bins_pad = _round_up(n_bins, LANES)
    mels_pad = _round_up(n_mels, LANES)
    real_b, imag_b = F.dft_basis(n_fft)
    real_p = np.zeros((n_fft, bins_pad), np.float32)
    imag_p = np.zeros((n_fft, bins_pad), np.float32)
    real_p[:, :n_bins] = real_b
    imag_p[:, :n_bins] = imag_b
    mel = F.mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax, htk)
    mel_p = np.zeros((bins_pad, mels_pad), np.float32)
    mel_p[:n_bins, :n_mels] = mel
    return real_p, imag_p, mel_p, bins_pad, mels_pad


def _stft_logmel_kernel(
    audio_ref,  # VMEM block: (BB, rows_per_batch, 128) whole batch rows when
    # time_tiled=False (index map constant in t → Pallas reuses it), or
    # (BB, tile_t*hop_rows, 128) per-frame-tile rows when time_tiled=True
    # (hop == n_fft ⇒ frames don't overlap ⇒ tiles partition the audio, so
    # VMEM stays bounded at any clip length — the whole-row layout OOMs
    # scoped vmem at ~300 s clips)
    window_ref,  # (8, n_fft) VMEM (row-broadcast copy)
    dft_real_ref,  # (n_fft, bins_pad) VMEM
    dft_imag_ref,  # (n_fft, bins_pad) VMEM
    mel_ref,  # (bins_pad, mels_pad) VMEM
    out_ref,  # (BB, tile_t, mels_pad) VMEM block
    *,
    hop: int,
    n_fft: int,
    tile_t: int,
    batch_tile: int,
    log_floor: float,
    time_tiled: bool,
):
    t0 = pl.program_id(1)

    # frame i of batch row b = rows [i*hop/128, +n_fft/128) flattened; all
    # batch_tile rows stack into one (BB*tile_t, n_fft) matrix so the DFT
    # matmuls run at full MXU tile height
    hop_rows, fft_rows = hop // LANES, n_fft // LANES
    base = 0 if time_tiled else t0 * tile_t * hop_rows
    rows = [
        audio_ref[b, pl.ds(base + i * hop_rows, fft_rows), :].reshape(1, n_fft)
        for b in range(batch_tile)
        for i in range(tile_t)
    ]
    frames = jnp.concatenate(rows, axis=0) * window_ref[0, :][None, :]

    re = jnp.dot(frames, dft_real_ref[:, :], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, dft_imag_ref[:, :], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[...] = jnp.log(jnp.maximum(mel, log_floor)).reshape(
        batch_tile, tile_t, mel.shape[-1]
    )


def pallas_geometry_supported(config: FeatureConfig) -> bool:
    return config.hop_length % LANES == 0 and config.n_fft % LANES == 0


@shard_over_batch(batched=(0,))
@functools.partial(jax.jit, static_argnames=("config", "tile_t", "batch_tile", "interpret"))
def stft_logmel_pallas(
    audio: jnp.ndarray,
    config: FeatureConfig,
    tile_t: int = 32,
    batch_tile: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S) float32 audio → (B, S//hop + 1, n_mels) log-mel features."""
    if not pallas_geometry_supported(config):
        import dataclasses

        # lane-alignment unsupported geometry → jnp reference path
        out, _ = F.log_mel_spectrogram(
            audio, dataclasses.replace(config, normalize="none")
        )
        return out

    bsz, s = audio.shape
    n_fft, hop = config.n_fft, config.hop_length
    num_frames = s // hop + 1
    pad = n_fft // 2
    batch_tile = min(batch_tile, bsz)
    b_pad = -(-bsz // batch_tile) * batch_tile

    real_p, imag_p, mel_p, bins_pad, mels_pad = _padded_bases(
        config.sample_rate, n_fft, config.n_mels, config.fmin, config.fmax_, config.htk
    )
    window = np.broadcast_to(
        F.hann_window(config.win_length_, n_fft).reshape(1, n_fft), (SUBLANES, n_fft)
    ).copy()

    t_tiles = -(-num_frames // tile_t)
    # hop == n_fft ⇒ consecutive frames (and frame tiles) do not overlap, so
    # the time axis can be block-partitioned: VMEM per grid cell stays
    # (batch_tile, tile_t·hop_rows, 128) regardless of clip length.  With
    # overlap (hop < n_fft) the tiles would need halo rows Pallas blocks
    # can't express, so the whole row rides VMEM — viable only while it fits.
    # hop==n_fft alone is not enough to time-tile: the audio block's row
    # count (tile_t*hop/LANES) must itself satisfy the Mosaic (8,128) tile
    # constraint, i.e. divide LANES exactly and be a multiple of SUBLANES —
    # a non-default tile_t (e.g. tile_t<8 with hop=128) would otherwise
    # produce a misaligned block; fall back to the whole-row layout there.
    time_tiled = (
        hop == n_fft
        and (tile_t * hop) % LANES == 0
        and (tile_t * hop // LANES) % SUBLANES == 0
    )
    span = (tile_t - 1) * hop + n_fft
    span_rows = _round_up(-(-span // LANES), SUBLANES)
    if time_tiled:
        rows_per_tile = tile_t * hop // LANES
        rows_per_batch = t_tiles * rows_per_tile
        audio_block_rows = rows_per_tile
        audio_index_map = lambda b, t: (b, t, 0)
    else:
        # rows per batch: cover last tile's span, multiple of 8 rows
        rows_per_batch = _round_up(
            (t_tiles - 1) * (tile_t * hop // LANES) + span_rows, SUBLANES
        )
        audio_block_rows = rows_per_batch
        audio_index_map = lambda b, t: (b, 0, 0)
        vmem_bytes = batch_tile * rows_per_batch * LANES * 4
        if vmem_bytes > 12 * 1024 * 1024:
            # whole-row layout would blow scoped VMEM — jnp reference path
            import dataclasses

            out, _ = F.log_mel_spectrogram(
                audio, dataclasses.replace(config, normalize="none")
            )
            return out
    needed = rows_per_batch * LANES
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    if padded.shape[1] < needed:
        padded = jnp.pad(padded, ((0, 0), (0, needed - padded.shape[1])))
    else:
        padded = padded[:, :needed]
    if b_pad > bsz:
        padded = jnp.pad(padded, ((0, b_pad - bsz), (0, 0)))
    audio_rows = padded.reshape(b_pad, rows_per_batch, LANES)

    kernel = functools.partial(
        _stft_logmel_kernel,
        hop=hop,
        n_fft=n_fft,
        tile_t=tile_t,
        batch_tile=batch_tile,
        log_floor=config.log_floor,
        time_tiled=time_tiled,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, t_tiles * tile_t, mels_pad), jnp.float32),
        grid=(b_pad // batch_tile, t_tiles),
        in_specs=[
            pl.BlockSpec(
                (batch_tile, audio_block_rows, LANES),
                audio_index_map,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (SUBLANES, n_fft), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft, bins_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft, bins_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bins_pad, mels_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, tile_t, mels_pad), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        audio_rows,
        jnp.asarray(window),
        jnp.asarray(real_p),
        jnp.asarray(imag_p),
        jnp.asarray(mel_p),
    )
    return out[:bsz, :num_frames, : config.n_mels]
