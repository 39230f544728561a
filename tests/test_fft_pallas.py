"""Fused Pallas four-step half-band iFFT vs the XLA planar engine."""
import numpy as np
import jax.numpy as jnp
import pytest

from ssqueeze_rs_tpu.ops.fft_mxu import (ifft_mxu_halfband_planar,
                                         best_split)
from ssqueeze_rs_tpu.ops.fft_pallas import (ifft_halfband_planar_fused,
                                            fused_ok)


@pytest.mark.parametrize("keep", [None, (5001, 7777)])
def test_fused_matches_xla_planar(keep):
    M = 1 << 14
    assert fused_ok(M)
    M1, M2 = best_split(M)
    K1 = M1 // 2
    rng = np.random.default_rng(0)
    B = 5
    Zr = jnp.asarray(rng.standard_normal((B, K1, M2)), jnp.float32)
    Zi = jnp.asarray(rng.standard_normal((B, K1, M2)), jnp.float32)
    nyr = jnp.asarray(rng.standard_normal(B), jnp.float32)
    nyi = jnp.asarray(rng.standard_normal(B), jnp.float32)
    a = ifft_mxu_halfband_planar(Zr, Zi, keep=keep, nyq_r=nyr, nyq_i=nyi)
    b = ifft_halfband_planar_fused(Zr, Zi, keep=keep, nyq_r=nyr, nyq_i=nyi,
                                   interpret=True)
    for p, q in zip(a, b):
        rel = float(jnp.max(jnp.abs(p - q)) / jnp.max(jnp.abs(p)))
        assert rel < 2e-5, rel   # bf16x3 vs f32 XLA engine


def test_fused_ok_gate():
    assert not fused_ok(1 << 12)      # too small to tile
    assert not fused_ok(3 * 1024)     # not a power of 2
    assert fused_ok(1 << 18)
