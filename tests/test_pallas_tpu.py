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
from air_tpu.kernels.st_inline import (
    inline_attention_read, inline_write_accumulate)
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

# the all-Pallas VJP lowers and matches XLA cotangents on device.
# Tolerance is SELF-CALIBRATED to the platform's default matmul
# precision: at DEFAULT the MXU rounds f32 operands to bf16, and XLA's
# own default-vs-highest spread on these cotangents (~0.013 abs here) is
# as large as any Pallas-vs-XLA difference — measured 2026-08-17 on v5e.
# Exact-math correctness is pinned at 1e-4 by the interpret-mode CPU
# tests (test_pallas.py / test_pallas_inline.py); this test checks that
# the kernels LOWER through Mosaic and sit inside the precision noise.
probe = jnp.asarray(rng.normal(size=(b, cs * cs)).astype(np.float32))

def grad_all(f):
    return jax.jit(jax.grad(
        lambda *a: jnp.sum(probe * f(*a)), argnums=(0, 1, 2, 3, 4, 5)))(
        canvas, windows, s, x, y, coeff)

gx = grad_all(xla_comp)
with jax.default_matmul_precision("float32"):
    ghi = grad_all(xla_comp)
noise = max(float(jnp.max(jnp.abs(a_ - b_))) for a_, b_ in zip(gx, ghi))
tol = max(1e-3, 3.0 * noise)

gp = grad_all(lambda *a: fused_write_accumulate(*a, cs, interpret=False))
for a_, b_ in zip(gp, ghi):
    np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                               rtol=0, atol=tol)

# read kernel lowers + matches
got = jax.jit(lambda *a: pallas_attention_read(*a, ws, interpret=False))(
    images, s, x, y)
want = jax.jit(lambda *a: attention_read(*a, ws))(images, s, x, y)
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=2e-5, atol=2e-5)

# in-kernel weight construction (st_inline): fwd + full VJP + read.
# Tolerance note: st_inline builds the hat weights INSIDE the kernel, so
# its weight values differ from the XLA-built ones by ~1 f32 ulp (linspace
# vs iota/(n-1) arithmetic); at the TPU's DEFAULT matmul precision the
# MXU rounds operands to bf16, which amplifies those ulps to one bf16 ulp
# (~2e-3 relative) on a handful of kink-adjacent elements. Interpret-mode
# CPU tests (tests/test_pallas_inline.py) verify the same math at 1e-4.
got = jax.jit(lambda *a: inline_write_accumulate(*a, cs, interpret=False))(
    canvas, windows, s, x, y, coeff)
np.testing.assert_allclose(np.asarray(got), np.asarray(jax.jit(
    xla_comp)(canvas, windows, s, x, y, coeff)), rtol=3e-3, atol=3e-3)
gi = grad_all(lambda *a: inline_write_accumulate(*a, cs, interpret=False))
for a_, b_ in zip(gi, ghi):
    np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                               rtol=0, atol=tol)
got = jax.jit(lambda *a: inline_attention_read(*a, ws, interpret=False))(
    images, s, x, y)
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=3e-3, atol=3e-3)
def grad_read(f):
    return jax.jit(jax.grad(
        lambda *a: jnp.sum(f(*a) ** 2), argnums=(0, 1, 2, 3)))(
        images, s, x, y)

gr = grad_read(lambda *a: inline_attention_read(*a, ws, interpret=False))
with jax.default_matmul_precision("float32"):
    gxr_hi = grad_read(lambda *a: attention_read(*a, ws))
gxr = grad_read(lambda *a: attention_read(*a, ws))
noise_r = max(float(jnp.max(jnp.abs(a_ - b_)))
              for a_, b_ in zip(gxr, gxr_hi))
tol_r = max(1e-3, 3.0 * noise_r)
for a_, b_ in zip(gr, gxr_hi):
    np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                               rtol=0, atol=tol_r)
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
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "TPU_KERNELS_OK" in proc.stdout
