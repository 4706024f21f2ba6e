"""Noisy Student Training driver.

Semantics of `lib/finetuning/finetune.py:17-35` +
`lib/standard/speechcommands.py:211-226`:

  1. (optional) initial supervised finetune at ``ft_lr`` with SpecAugment
     (`finetune.py:29`);
  2. per generation: pseudo-label the unlabeled split U with the current
     model (sharded greedy inference — every chip decodes its shard), filter
     labels (empty / too-long `speechcommands.py:221-224` / high-unk
     `librispeech.py:108-123`), build the 'mix' manifest = supervised ∪
     pseudo-labeled U, and retrain with SpecAugment (`finetune.py:30-34`).

The reference deep-copies datasets in RAM; here mixing is a manifest merge
and every generation checkpoints, so the loop is resumable per generation
(SURVEY.md §5 failure-recovery note).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

from nn_conformer_for_speech_recognition_tpu.config import NSTConfig
from nn_conformer_for_speech_recognition_tpu.data.datasets import (
    BucketedDataset,
    mix_datasets,
    save_manifest,
)
from nn_conformer_for_speech_recognition_tpu.train.loop import Trainer


@dataclasses.dataclass
class GenerationResult:
    generation: int
    num_pseudo_labels: int
    num_kept: int
    val_loss: Optional[float] = None
    val_wer: Optional[float] = None


def run_nst(
    trainer: Trainer,
    supervised: BucketedDataset,
    unlabeled: BucketedDataset,
    cfg: NSTConfig,
    val_dataset: Optional[BucketedDataset] = None,
    work_dir: Optional[str] = None,
) -> List[GenerationResult]:
    """Run the NST loop with an already-initialised (trained) Trainer.

    The Trainer's optimizer should already be configured at ``cfg.ft_lr``
    (the reference builds a fresh Runner at ft_lr, `finetune.py:28`).
    """
    results: List[GenerationResult] = []

    if cfg.initial_supervised_finetune:
        # gen-0 supervised finetune with SpecAugment (`finetune.py:29`)
        trainer.train(
            supervised,
            cfg.train_epochs_per_generation,
            val_dataset=val_dataset,
            use_specaugment=True,
            add_noise=cfg.add_noise,
            noise_std=cfg.noise_std,
        )

    for gen in range(cfg.generations):
        labels: Dict[int, str] = trainer.generate_labels(unlabeled)
        pseudo = unlabeled.with_pseudo_labels(
            labels, unk_tol=cfg.unk_tolerance, max_target_len=cfg.max_target_len
        )
        mixed_utts = mix_datasets(supervised.utterances, pseudo)
        if work_dir:
            os.makedirs(work_dir, exist_ok=True)
            save_manifest(os.path.join(work_dir, f"mix_gen{gen}.tsv"), mixed_utts)

        mixed = BucketedDataset(
            mixed_utts,
            supervised.vocab,
            supervised.batch_size,
            sample_rate=supervised.sample_rate,
            bucket_boundaries=supervised.bucket_boundaries,
            max_target_len=supervised.max_target_len,
        )
        # student retrain: SpecAugment + (optional) waveform gaussian noise —
        # the "noisy" in noisy-student (`speechcommands.py:227-252`)
        trainer.train(
            mixed,
            cfg.train_epochs_per_generation,
            val_dataset=val_dataset,
            use_specaugment=True,
            epoch_offset=100 * (gen + 1),
            add_noise=cfg.add_noise,
            noise_std=cfg.noise_std,
        )

        res = GenerationResult(gen, len(labels), len(pseudo))
        if val_dataset is not None and trainer.history["val_loss"]:
            res.val_loss = trainer.history["val_loss"][-1]
            res.val_wer = trainer.history["val_wer"][-1]
        if work_dir:
            trainer.save(os.path.join(work_dir, f"ckpt_gen{gen}"))
        results.append(res)
    return results
