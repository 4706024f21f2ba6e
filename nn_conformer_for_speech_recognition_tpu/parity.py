"""WER-parity harness: reproduce the reference's SpeechCommands protocol
end-to-end and emit the BASELINE.md comparison table.

The reference's published numbers (`main.ipynb` cell 44, BASELINE.md):

    Base (supervised only)    val 17.02 / test 18.77
    NST (3 generations)       val 16.23 / test 18.08

Protocol reproduced here (one command: ``cli parity --manifest-dir ...``):
  * reference-parity model preset — 1 Conformer block, d=512, 8 heads,
    depthwise k=33, dropout .5 (`lib/standard/asrnn.py:29`);
  * features: 40 log-mels, hop 512, per-utterance MIN-MAX normalisation
    (`speechcommands.py:113-119`; FeatureConfig(normalize='minmax'));
  * word vocab with the reference's special-token head (`myvocab.py:94-99`);
  * Adafactor lr 2e-5, β1=0.9 (`runner.py:36`), batch 32, 15 epochs with
    SpecAugment (`hparams.py:36-38`), per-epoch validation;
  * '_'-padded WER protocol (`runner.py:149-160`; metrics.padded_wer);
  * NST: initial supervised finetune at ft_lr=3e-6 then 3 generations of
    {pseudo-label U → filter → mix → retrain 1 epoch}
    (`finetune.py:17-35`, `hparams.py:105-107`).

Real SpeechCommands audio is not present in this image (no network —
docs/STATUS.md); CI runs the harness end-to-end on the synthetic corpus
(tests/test_cli.py), and the real comparison is one ``prepare-data`` +
``parity`` invocation away once a dataset directory exists.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

REFERENCE_TABLE = {
    # main.ipynb cell 44 (WER %, val/test)
    "base": {"val": 17.02, "test": 18.77},
    "nst": {"val": 16.23, "test": 18.08},
}


def run_parity(
    manifest_dir: str,
    work_dir: str,
    epochs: int = 15,
    generations: int = 3,
    batch_size: int = 32,
    lr: float = 2e-5,
    ft_lr: float = 3e-6,
    max_target_len: int = 4,
    model_overrides: Optional[dict] = None,
    log=print,
) -> Dict:
    """Run Base then NST under the reference protocol; return the table."""
    from nn_conformer_for_speech_recognition_tpu import config as C
    from nn_conformer_for_speech_recognition_tpu.data.datasets import (
        BucketedDataset,
        load_manifest,
    )
    from nn_conformer_for_speech_recognition_tpu.data.vocab import build_vocab
    from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
    from nn_conformer_for_speech_recognition_tpu.nst.driver import run_nst
    from nn_conformer_for_speech_recognition_tpu.train.loop import Trainer

    os.makedirs(work_dir, exist_ok=True)
    feat_cfg = C.FeatureConfig(normalize="minmax")  # n_mels=40, hop=512 defaults
    manifests = {
        s: load_manifest(os.path.join(manifest_dir, f"{s}.tsv"))
        for s in ("train", "validation", "test", "unlabeled")
        if os.path.exists(os.path.join(manifest_dir, f"{s}.tsv"))
    }
    vocab = build_vocab(
        "word", [u.transcript for u in manifests["train"] if u.labeled]
    )

    def mk(utts):
        return BucketedDataset(
            utts, vocab, batch_size, max_target_len=max_target_len
        )

    dss = {s: mk(u) for s, u in manifests.items()}

    mcfg = C.reference_parity(**(model_overrides or {}))
    model = ConformerCTC(mcfg, vocab_size=len(vocab))
    train_cfg = C.TrainConfig(
        batch_size=batch_size,
        optimizer=C.OptimizerConfig(learning_rate=lr),  # Adafactor β1=.9
        use_specaugment=True,
        donate_state=False,  # state reused across eval calls
    )
    trainer = Trainer(model, vocab, feat_cfg, train_cfg, log_fn=log)
    trainer.init_state(seed=0)

    log(f"[parity] supervised training: {epochs} epochs (runner.py:102-182)")
    trainer.train(dss["train"], epochs, val_dataset=dss.get("validation"))
    results: Dict = {"protocol": "reference-parity", "epochs": epochs,
                     "generations": generations, "wer": {}}
    base = {}
    for split in ("validation", "test"):
        if split in dss:
            _, w = trainer.evaluate(dss[split], wer_protocol="padded")
            base["val" if split == "validation" else "test"] = round(100 * w, 2)
    results["wer"]["base"] = base
    trainer.save(os.path.join(work_dir, "base_ckpt"))

    if generations > 0 and "unlabeled" in dss:
        log(f"[parity] NST: {generations} generations at ft_lr={ft_lr} "
            "(finetune.py:17-35)")
        ncfg = C.NSTConfig(
            ft_lr=ft_lr, generations=generations,
            train_epochs_per_generation=1, max_target_len=max_target_len,
        )
        # the reference builds a fresh Runner at ft_lr (`finetune.py:28`)
        nst_trainer = Trainer(
            model, vocab, feat_cfg, train_cfg, learning_rate=ft_lr, log_fn=log
        )
        nst_trainer.state = trainer.state
        run_nst(nst_trainer, dss["train"], dss["unlabeled"], ncfg,
                val_dataset=dss.get("validation"), work_dir=work_dir)
        nst = {}
        for split in ("validation", "test"):
            if split in dss:
                _, w = nst_trainer.evaluate(dss[split], wer_protocol="padded")
                nst["val" if split == "validation" else "test"] = round(100 * w, 2)
        results["wer"]["nst"] = nst
        nst_trainer.save(os.path.join(work_dir, "nst_ckpt"))

    results["reference"] = REFERENCE_TABLE
    table = format_table(results)
    log(table)
    with open(os.path.join(work_dir, "parity.json"), "w") as f:
        f.write(json.dumps(results, indent=1) + "\n")
    with open(os.path.join(work_dir, "parity.md"), "w") as f:
        f.write(table + "\n")
    return results


def format_table(results: Dict) -> str:
    """BASELINE.md-style comparison table."""
    lines = [
        "| config | val WER % (ours) | test WER % (ours) | val (reference) | test (reference) |",
        "|---|---|---|---|---|",
    ]
    for key, label in (("base", "Base (supervised)"), ("nst", "NST")):
        ours = results["wer"].get(key, {})
        ref = REFERENCE_TABLE[key]
        lines.append(
            f"| {label} | {ours.get('val', '—')} | {ours.get('test', '—')} "
            f"| {ref['val']} | {ref['test']} |"
        )
    return "\n".join(lines)
