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


@pytest.mark.parametrize("derivative", [False, True])
def test_cwt_fused_matches_zbuild_route(derivative):
    """cwt_halfband_fused (in-VMEM Z multiply) vs explicit Z build + XLA
    planar engine."""
    import numpy as np
    from ssqueeze_rs_tpu.ops.fft_pallas import cwt_halfband_fused
    M = 1 << 14
    M1, M2 = best_split(M)
    K1 = M1 // 2
    rng = np.random.default_rng(1)
    na = 6
    Pw = jnp.asarray(rng.standard_normal((na, K1, M2)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((K1, M2)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((K1, M2)), jnp.float32)
    xig = jnp.asarray(rng.uniform(0, 3, (K1, M2)), jnp.float32)
    znyq = jnp.asarray(rng.standard_normal(na), jnp.float32)
    zeros = jnp.zeros_like(znyq)
    dt = 0.5
    keep = (1000, 12000)

    wxr, wxi, dxr, dxi = cwt_halfband_fused(
        Pw, xr, xi, xig, 1.0 / dt, (znyq, zeros),
        (zeros, znyq * (np.pi / dt)), keep=keep, derivative=derivative,
        interpret=True)

    # reference: explicit Z build + XLA planar engine
    Zr = Pw * xr[None]
    Zi = Pw * xi[None]
    if derivative:
        Zr2 = jnp.concatenate([Zr, -Zi * xig[None] / dt], axis=0)
        Zi2 = jnp.concatenate([Zi, Zr * xig[None] / dt], axis=0)
        nr = jnp.concatenate([znyq, zeros])
        ni = jnp.concatenate([zeros, znyq * (np.pi / dt)])
    else:
        Zr2, Zi2, nr, ni = Zr, Zi, znyq, zeros
    ar, ai = ifft_mxu_halfband_planar(Zr2, Zi2, keep=keep, nyq_r=nr,
                                      nyq_i=ni)
    for got, want in [(wxr, ar[:na]), (wxi, ai[:na])] + (
            [(dxr, ar[na:]), (dxi, ai[na:])] if derivative else []):
        rel = float(jnp.max(jnp.abs(got - want)) /
                    (jnp.max(jnp.abs(want)) + 1e-30))
        assert rel < 5e-5, rel
