"""Real-TPU Mosaic lowering/correctness checks for the Pallas kernels.

Interpret mode (the default on the CPU-pinned suite) executes kernel
*math* but skips Mosaic lowering entirely, so TPU-only constraints (e.g.
"Cannot store scalars to VMEM", commit a7bf76e) go unseen. These tests
run the kernels through the real compiler and compare against the XLA
path on device.

Opt-in: the suite pins itself to CPU (tests/conftest.py), so these run
in a SUBPROCESS with the ambient TPU platform. Set AIR_TPU_TESTS=1 to
enable (default off: attaching a second client to the experimental axon
tunnel while a long training run holds the chip is not safe to do
implicitly).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import jax
ds = jax.devices()
assert ds and ds[0].platform == "tpu", ds
"""

_KERNEL_CHECK = """
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
import jax

from air_tpu.kernels.st_fused import fused_write_accumulate
from air_tpu.kernels.st_pallas import pallas_attention_read
from air_tpu.ops.transformer import attention_read, attention_write

rng = np.random.default_rng(0)
b, cs, ws = 8, 50, 28
canvas = jnp.asarray(rng.uniform(size=(b, cs * cs)).astype(np.float32))
windows = jnp.asarray(rng.uniform(size=(b, ws, ws)).astype(np.float32))
images = jnp.asarray(rng.uniform(size=(b, cs, cs)).astype(np.float32))
s = jnp.asarray(rng.uniform(0.2, 0.9, b).astype(np.float32))
x = jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32))
y = jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32))
coeff = jnp.asarray(rng.uniform(0.0, 1.0, b).astype(np.float32))

def xla_comp(canvas, windows, s, x, y, coeff):
    wr = attention_write(windows, s, x, y, cs)
    return canvas + coeff[:, None] * wr.reshape(b, cs * cs)

# forward value parity, compiled through Mosaic
got = jax.jit(lambda *a: fused_write_accumulate(*a, cs, interpret=False))(
    canvas, windows, s, x, y, coeff)
want = jax.jit(xla_comp)(canvas, windows, s, x, y, coeff)
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=2e-5, atol=2e-5)

# the all-Pallas VJP lowers and matches XLA cotangents on device
probe = jnp.asarray(rng.normal(size=(b, cs * cs)).astype(np.float32))
gp = jax.jit(jax.grad(
    lambda *a: jnp.sum(probe * fused_write_accumulate(
        *a, cs, interpret=False)), argnums=(0, 1, 2, 3, 4, 5)))(
    canvas, windows, s, x, y, coeff)
gx = jax.jit(jax.grad(
    lambda *a: jnp.sum(probe * xla_comp(*a)),
    argnums=(0, 1, 2, 3, 4, 5)))(canvas, windows, s, x, y, coeff)
for a_, b_ in zip(gp, gx):
    np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                               rtol=1e-3, atol=1e-4)

# read kernel lowers + matches
got = jax.jit(lambda *a: pallas_attention_read(*a, ws, interpret=False))(
    images, s, x, y)
want = jax.jit(lambda *a: attention_read(*a, ws))(images, s, x, y)
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=2e-5, atol=2e-5)
print("TPU_KERNELS_OK")
"""


def _tpu_reachable() -> bool:
    if os.environ.get("AIR_TPU_TESTS") != "1":
        return False
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE],
            env={k: v for k, v in os.environ.items()
                 if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
            capture_output=True, text=True, timeout=120)
        return proc.returncode == 0
    except Exception:
        return False


@pytest.mark.skipif(not _tpu_reachable(),
                    reason="opt-in: set AIR_TPU_TESTS=1 with a free TPU")
def test_pallas_kernels_lower_and_match_on_tpu():
    proc = subprocess.run(
        [sys.executable, "-c", _KERNEL_CHECK.format(repo=REPO)],
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "TPU_KERNELS_OK" in proc.stdout
