"""Opt-in compiled-Mosaic kernel parity on the REAL TPU chip.

All other Pallas tests run interpret-mode on CPU (tests/conftest.py forces
the CPU backend); compiled behaviour — Mosaic tiling, `pltpu.roll`
semantics, VMEM limits — is what the manual runs in docs/STATUS.md
validated.  This file makes that validation a repeatable test target
(VERDICT round-1 weak item 4):

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -m tpu -q

Each test shells out with JAX_PLATFORMS='' so the axon TPU tunnel is used
despite the conftest CPU pin (env gotcha 1).  First-compile through the
tunnel takes minutes; the persistent compile cache makes repeats fast.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

requires_tpu = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"),
    reason="opt-in: set RUN_TPU_TESTS=1 (needs the real TPU tunnel)",
)


def _run(args, timeout=2400):
    env = dict(os.environ, JAX_PLATFORMS="", PYTHONPATH=str(REPO))
    return subprocess.run(
        [sys.executable, *args], cwd=str(REPO), env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.tpu
@requires_tpu
def test_flash_relpos_backward_compiled_parity():
    """Blockwise flash bwd (dq/dkv/dband Mosaic kernels) vs f32 einsum bwd
    on-chip; asserts rel err < 2e-4 internally."""
    out = _run(["examples/flashbwd_tpu_check.py", "parity"])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert '"phase": "parity"' in out.stdout


@pytest.mark.tpu
@requires_tpu
def test_compiled_kernel_suite_parity():
    """Forward kernels (flash rel-pos attention, fused CTC, depthwise conv)
    compiled vs their jnp references on-chip."""
    script = r"""
import numpy as np, jax, jax.numpy as jnp
from nn_conformer_for_speech_recognition_tpu.ops.pallas.attention import (
    _flash_relpos_forward, flash_attention_reference)
from nn_conformer_for_speech_recognition_tpu.ops.pallas.ctc import ctc_loss_pallas
from nn_conformer_for_speech_recognition_tpu.ops.ctc import ctc_loss
from nn_conformer_for_speech_recognition_tpu.ops.pallas.depthwise_conv import (
    depthwise_conv1d_pallas, depthwise_conv1d_reference)

rng = np.random.default_rng(0)
b, t, h, dh = 2, 256, 2, 64
mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * .3)
qu, qv, k, v = (mk(b, t, h, dh) for _ in range(4))
p = mk(2 * t - 1, h, dh)
lengths = jnp.array([t, t - 37])
got = _flash_relpos_forward(qu, qv, k, v, p, lengths, 0.125)
idx = (jnp.arange(t)[None, :] - jnp.arange(t)[:, None]) + (t - 1)
bd = jnp.einsum("bihd,lhd->bhil", qv, p)
bias = jnp.take_along_axis(bd, jnp.broadcast_to(idx, (b, h, t, t)), axis=-1)
ref = flash_attention_reference(qu, k, v, bias, lengths, 0.125)
err = float(jnp.abs(got[0] - ref[0]).max())
assert err < 5e-3, ("attention", err)

lp = jax.nn.log_softmax(mk(4, 64, 128), axis=-1)
labels = jnp.asarray(rng.integers(1, 128, size=(4, 16)).astype(np.int32))
il = jnp.array([64, 50, 64, 40]); ll = jnp.array([16, 9, 0, 16])
ref_l = ctc_loss(lp, labels, il, ll, blank_id=0, reduction=None)
got_l = ctc_loss_pallas(lp, labels, il, ll, blank_id=0, reduction=None)
err = float(jnp.abs(got_l - ref_l).max())
assert err < 1e-3, ("ctc", err)

x = mk(4, 128, 256); w = mk(33, 256) * .1
err = float(jnp.abs(depthwise_conv1d_pallas(x, w)
                    - depthwise_conv1d_reference(x, w)).max())
assert err < 1e-4, ("depthwise", err)
print("compiled kernel parity OK")
"""
    out = _run(["-c", script])
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "compiled kernel parity OK" in out.stdout
