"""Long-form ASR demo on one TPU chip: word-piece CTC + beam decode + NST.

BASELINE.json configs[2-3] exercised on hardware: Conformer-M with the
true-flash Pallas kernels and per-block remat, multi-word utterances (4-8
words, ~2-4 s), a BPE word-piece vocabulary with CTC-collapse decoding,
on-device vectorized beam search, and one NST generation with beam-decoded
multi-token pseudo-labels.  Data is device-resident (corpus uploaded once).

Run: python examples/longform_tpu_demo.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from nn_conformer_for_speech_recognition_tpu import config as C
from nn_conformer_for_speech_recognition_tpu.data.audio import synth_utterance
from nn_conformer_for_speech_recognition_tpu.data.vocab import WordPieceVocab
from nn_conformer_for_speech_recognition_tpu.models.asr import ConformerCTC
from nn_conformer_for_speech_recognition_tpu.ops.decode import ctc_beam_search
from nn_conformer_for_speech_recognition_tpu.ops.features import log_mel_spectrogram
from nn_conformer_for_speech_recognition_tpu.train import metrics as M
from nn_conformer_for_speech_recognition_tpu.train.loop import make_train_step
from nn_conformer_for_speech_recognition_tpu.train.optim import make_optimizer
from nn_conformer_for_speech_recognition_tpu.train.state import TrainState

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliett", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu",
]
SR = 16000
MAX_S = 4 * SR  # 4 s
B = 32
TGT_LEN = 48
rng = np.random.default_rng(0)


def make_split(n, seed, noise=0.35):
    r = np.random.default_rng(seed)
    audio = np.zeros((n, MAX_S), np.float32)
    alen = np.zeros((n,), np.int32)
    texts = []
    for i in range(n):
        k = int(r.integers(4, 9))
        ws = [WORDS[int(r.integers(len(WORDS)))] for _ in range(k)]
        x = synth_utterance(ws, SR, rng=r, noise_std=noise)[:MAX_S]
        audio[i, : len(x)] = x
        alen[i] = len(x)
        texts.append(" ".join(ws))
    return audio, alen, texts


splits = {
    "train": make_split(256, 1),
    "val": make_split(128, 2),
    "unlab": make_split(512, 3),
}
vocab = WordPieceVocab.build([t for _, _, ts in [splits["train"]] for t in ts],
                             ntokens=256, min_freq=1)
log(f"wordpiece vocab: {len(vocab)} pieces")


def targets_of(texts):
    tgt = np.full((len(texts), TGT_LEN), vocab.pad_id, np.int32)
    tlen = np.zeros((len(texts),), np.int32)
    for i, t in enumerate(texts):
        ids = vocab.parse(t)[:TGT_LEN]
        tgt[i, : len(ids)] = ids
        tlen[i] = len(ids)
    return tgt, tlen


dev = {}
for name, (a, l, ts) in splits.items():
    tgt, tlen = targets_of(ts)
    dev[name] = dict(
        audio=jax.device_put(a), alen=jax.device_put(l),
        tgt=jax.device_put(tgt), tlen=jax.device_put(tlen), texts=ts,
    )
    jax.block_until_ready(dev[name]["audio"])
log("corpus on device")

feat = C.FeatureConfig()
mcfg = C.conformer_m(compute_dtype="float32", use_pallas=True, remat=True)
model = ConformerCTC(mcfg, vocab_size=len(vocab))

feats0, fl0 = jax.jit(
    lambda a, l: log_mel_spectrogram(a, feat, l)
)(dev["train"]["audio"][:2], dev["train"]["alen"][:2])
vs = jax.jit(model.init)(
    {"params": jax.random.key(0), "dropout": jax.random.key(1)}, feats0, fl0
)
tx = make_optimizer(C.OptimizerConfig(learning_rate=3e-4))
state = TrainState.create(vs["params"], vs.get("batch_stats", {}), tx, jax.random.key(0))
log("state initialized")

train_step = jax.jit(make_train_step(model, feat, C.SpecAugmentConfig(), vocab.blank_id))


@jax.jit
def forward(state, audio, alen):
    feats, fl = log_mel_spectrogram(audio, feat, alen)
    lp, ol = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        feats, fl, deterministic=True,
    )
    return lp, ol


@jax.jit
def beam_decode(state, audio, alen):
    lp, ol = forward(state, audio, alen)
    toks, lens, scores = ctc_beam_search(
        lp, ol, blank_id=vocab.blank_id, beam=4, prune=8, max_label_len=TGT_LEN
    )
    return toks[:, 0], lens[:, 0]


@jax.jit
def gather(audio, alen, tgt, tlen, idx):
    g = lambda x: jnp.take(x, idx, axis=0)
    return g(audio), g(alen), g(tgt), g(tlen)


def run_epochs(state, pool, epochs, seed0, tag=""):
    n = int(pool["audio"].shape[0])
    for e in range(epochs):
        perm = np.random.default_rng(seed0 + e).permutation(n)
        losses = []
        for s0 in range(0, n - B + 1, B):
            idx = jnp.asarray(perm[s0 : s0 + B])
            a, l, t, tl = gather(pool["audio"], pool["alen"], pool["tgt"],
                                 pool["tlen"], idx)
            state, m = train_step(state, a, l, t, tl)
            losses.append(m["loss"])
        if e % 10 == 0 or e == epochs - 1:
            log(f"  {tag}epoch {e}: loss={float(jnp.mean(jnp.stack(losses))):.4f}")
    return state


def evaluate(state, which, decode="beam"):
    d = dev[which]
    n = d["audio"].shape[0]
    hyps, refs = [], []
    for s0 in range(0, n, B):
        idx = jnp.arange(s0, min(s0 + B, n))
        if idx.shape[0] < B:
            idx = jnp.concatenate([idx, jnp.zeros((B - idx.shape[0],), jnp.int32)])
        a = jnp.take(d["audio"], idx, axis=0)
        l = jnp.take(d["alen"], idx, axis=0)
        if decode == "beam":
            toks, lens = beam_decode(state, a, l)
            toks, lens = np.asarray(toks), np.asarray(lens)
            for row in range(min(B, n - s0)):
                hyps.append(vocab.decode_ids(toks[row, : lens[row]].tolist()))
                refs.append(d["texts"][s0 + row])
        else:
            lp, ol = forward(state, a, l)
            ids = np.asarray(jnp.argmax(lp, axis=-1))
            from nn_conformer_for_speech_recognition_tpu.ops.decode import greedy_decode

            idsm = np.asarray(greedy_decode(lp, ol, pad_id=vocab.pad_id))
            for row in range(min(B, n - s0)):
                hyps.append(vocab.decode_ids(idsm[row].tolist()))
                refs.append(d["texts"][s0 + row])
    return M.wer(refs, hyps), hyps[:2], refs[:2]


log("== supervised (Conformer-M, pallas+remat, wordpiece) ==")
state = run_epochs(state, dev["train"], epochs=120, seed0=10)
base_beam, h2, r2 = evaluate(state, "val", "beam")
base_greedy, _, _ = evaluate(state, "val", "greedy")
log(f"BASE val WER: beam {100*base_beam:.2f} greedy {100*base_greedy:.2f}")
log(f"  sample hyp: {h2[0]!r}")
log(f"  sample ref: {r2[0]!r}")

log("== NST generation (beam pseudo-labels) ==")
d = dev["unlab"]
n = d["audio"].shape[0]
pl_tgt = np.array(d["tgt"])
pl_tlen = np.array(d["tlen"])
kept = 0
for s0 in range(0, n, B):
    idx = jnp.arange(s0, min(s0 + B, n))
    if idx.shape[0] < B:
        idx = jnp.concatenate([idx, jnp.zeros((B - idx.shape[0],), jnp.int32)])
    toks, lens = beam_decode(state, jnp.take(d["audio"], idx, axis=0),
                             jnp.take(d["alen"], idx, axis=0))
    toks, lens = np.asarray(toks), np.asarray(lens)
    for row in range(min(B, n - s0)):
        text = vocab.decode_ids(toks[row, : lens[row]].tolist())
        ids = vocab.parse(text)
        if 3 <= len(ids) <= TGT_LEN and vocab.unk_id not in ids:
            pl_tgt[s0 + row, : len(ids)] = ids
            pl_tgt[s0 + row, len(ids):] = vocab.pad_id
            pl_tlen[s0 + row] = len(ids)
            kept += 1
log(f"pseudo-labeled {kept}/{n} kept")

mix = dict(
    audio=jnp.concatenate([dev["train"]["audio"], d["audio"]]),
    alen=jnp.concatenate([dev["train"]["alen"], d["alen"]]),
    tgt=jnp.concatenate([dev["train"]["tgt"], jnp.asarray(pl_tgt)]),
    tlen=jnp.concatenate([dev["train"]["tlen"], jnp.asarray(pl_tlen)]),
)
ft_tx = make_optimizer(C.OptimizerConfig(learning_rate=5e-5))
state = TrainState.create(state.params, state.batch_stats, ft_tx, jax.random.key(7))
state = run_epochs(state, mix, epochs=30, seed0=100, tag="nst ")
nst_beam, _, _ = evaluate(state, "val", "beam")
nst_greedy, _, _ = evaluate(state, "val", "greedy")
log(f"NST  val WER: beam {100*nst_beam:.2f} greedy {100*nst_greedy:.2f}")

summary = {
    "vocab": "wordpiece", "model": "conformer_m pallas+remat f32",
    "base": {"beam_wer": 100 * base_beam, "greedy_wer": 100 * base_greedy},
    "nst": {"beam_wer": 100 * nst_beam, "greedy_wer": 100 * nst_greedy},
    "pseudo_kept": kept, "wall_s": round(time.time() - T0, 1),
}
with open("results/longform_demo_tpu.json", "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps(summary), flush=True)
