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


def test_fused_tiles_selection():
    """Headline sizes stay on the untiled fast path; big M picks the
    smallest tiling that fits the 100 MB VMEM budget."""
    from ssqueeze_rs_tpu.ops.fft_pallas import fused_tiles
    assert fused_tiles(1 << 18, 2) == 1      # headline ssq_cwt size
    assert fused_tiles(1 << 19, 2) == 1      # ~500k-sample cwt+deriv
    assert fused_tiles(1 << 20, 2) > 1       # ~1M-sample cwt+deriv
    assert fused_tiles(1 << 21, 1) > 1       # ~2M-sample batch iFFT
    # 2^21 with two pipelines exceeds VMEM even at tiles=8: cwt falls
    # back to the Z-build route + tiled single-pipeline iFFT kernel
    assert fused_tiles(1 << 21, 2) is None
    assert fused_tiles(1 << 22, 1) is None   # beyond tiles=8


def test_explicit_tiles_must_divide_m2():
    """tiles that don't divide M2 would silently drop k2 columns
    (measured 9.6% error before the guard)."""
    Zr = jnp.zeros((2, 64, 128), jnp.float32)   # M = 2^14, M2 = 128
    with pytest.raises(ValueError, match="must divide"):
        ifft_halfband_planar_fused(Zr, Zr, interpret=True, tiles=3)


@pytest.mark.parametrize("tiles", [2, 4])
@pytest.mark.parametrize("keep", [None, (777, 9000)])
def test_tiled_ifft_matches_untiled(tiles, keep):
    """k2-tiled kernel (scratch accumulation across grid steps) must
    reproduce the untiled kernel bit-for-bit up to f32 summation order."""
    M = 1 << 14
    M1, M2 = best_split(M)
    K1 = M1 // 2
    rng = np.random.default_rng(3)
    B = 3
    Zr = jnp.asarray(rng.standard_normal((B, K1, M2)), jnp.float32)
    Zi = jnp.asarray(rng.standard_normal((B, K1, M2)), jnp.float32)
    nyr = jnp.asarray(rng.standard_normal(B), jnp.float32)
    nyi = jnp.asarray(rng.standard_normal(B), jnp.float32)
    a = ifft_halfband_planar_fused(Zr, Zi, keep=keep, nyq_r=nyr, nyq_i=nyi,
                                   interpret=True, tiles=1)
    b = ifft_halfband_planar_fused(Zr, Zi, keep=keep, nyq_r=nyr, nyq_i=nyi,
                                   interpret=True, tiles=tiles)
    for p, q in zip(a, b):
        rel = float(jnp.max(jnp.abs(p - q)) / jnp.max(jnp.abs(p)))
        assert rel < 2e-6, rel


@pytest.mark.parametrize("derivative", [False, True])
def test_tiled_cwt_matches_untiled(derivative):
    from ssqueeze_rs_tpu.ops.fft_pallas import cwt_halfband_fused
    M = 1 << 14
    M1, M2 = best_split(M)
    K1 = M1 // 2
    rng = np.random.default_rng(4)
    na = 4
    Pw = jnp.asarray(rng.standard_normal((na, K1, M2)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((K1, M2)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((K1, M2)), jnp.float32)
    xig = jnp.asarray(rng.uniform(0, 3, (K1, M2)), jnp.float32)
    znyq = jnp.asarray(rng.standard_normal(na), jnp.float32)
    zeros = jnp.zeros_like(znyq)
    kw = dict(keep=(100, 9000), derivative=derivative, interpret=True)
    a = cwt_halfband_fused(Pw, xr, xi, xig, 2.0, (znyq, zeros),
                           (zeros, znyq), tiles=1, **kw)
    b = cwt_halfband_fused(Pw, xr, xi, xig, 2.0, (znyq, zeros),
                           (zeros, znyq), tiles=4, **kw)
    for p, q in zip(a, b):
        scale = float(jnp.max(jnp.abs(p))) + 1e-30
        rel = float(jnp.max(jnp.abs(p - q))) / scale
        assert rel < 2e-6, rel


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


@pytest.mark.parametrize("tiles,impl", [(1, "dot3"), (4, "dot3"),
                                        (1, "tmerged"), (1, "merged")])
def test_cwt_fused_batched_matches_per_signal(tiles, impl):
    """Batched (b, K1, M2) signal planes: kernel output rows (b-major)
    equal per-signal single-batch calls (VERDICT r1 #8: fused path
    beyond b == 1)."""
    from ssqueeze_rs_tpu.ops.fft_pallas import cwt_halfband_fused
    M = 1 << 14
    M1, M2 = best_split(M)
    K1 = M1 // 2
    rng = np.random.default_rng(7)
    na, b = 3, 2
    Pw = jnp.asarray(rng.standard_normal((na, K1, M2)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((b, K1, M2)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((b, K1, M2)), jnp.float32)
    xig = jnp.asarray(rng.uniform(0, 3, (K1, M2)), jnp.float32)
    znyq = jnp.asarray(rng.standard_normal(b * na), jnp.float32)
    zeros = jnp.zeros_like(znyq)
    kw = dict(keep=(100, 9000), derivative=True, interpret=True,
              tiles=tiles, impl=impl)
    got = cwt_halfband_fused(Pw, xr, xi, xig, 2.0, (znyq, zeros),
                             (zeros, znyq), **kw)
    for ib in range(b):
        sl = slice(ib * na, (ib + 1) * na)
        zb = znyq[sl]
        zz = jnp.zeros_like(zb)
        want = cwt_halfband_fused(Pw, xr[ib], xi[ib], xig, 2.0, (zb, zz),
                                  (zz, zb), **kw)
        for p, q in zip(got, want):
            assert np.allclose(np.asarray(p[sl]), np.asarray(q),
                               atol=1e-5), (ib, tiles)


@pytest.mark.parametrize("tiles", [1, 4])
@pytest.mark.parametrize("impl", ["dot1", "merged", "tmerged"])
@pytest.mark.parametrize("derivative", [False, True])
def test_cwt_fused_impl_variants_match_dot3(impl, derivative, tiles):
    """The stacked-contraction (dot1) and pipeline-merged (merged) MXU
    issue patterns compute the same bf16x3 products as dot3 — only the
    dot granularity and accumulation order differ."""
    from ssqueeze_rs_tpu.ops.fft_pallas import cwt_halfband_fused
    M = 1 << 14
    M1, M2 = best_split(M)
    K1 = M1 // 2
    rng = np.random.default_rng(11)
    na = 4
    Pw = jnp.asarray(rng.standard_normal((na, K1, M2)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((K1, M2)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((K1, M2)), jnp.float32)
    xig = jnp.asarray(rng.uniform(0, 3, (K1, M2)), jnp.float32)
    znyq = jnp.asarray(rng.standard_normal(na), jnp.float32)
    zeros = jnp.zeros_like(znyq)
    kw = dict(keep=(100, 9000), derivative=derivative, interpret=True)
    a = cwt_halfband_fused(Pw, xr, xi, xig, 2.0, (znyq, zeros),
                           (zeros, znyq), impl="dot3", tiles=1, **kw)
    b = cwt_halfband_fused(Pw, xr, xi, xig, 2.0, (znyq, zeros),
                           (zeros, znyq), impl=impl, tiles=tiles, **kw)
    n = 4 if derivative else 2
    for p, q in zip(a[:n], b[:n]):
        scale = float(jnp.max(jnp.abs(p))) + 1e-30
        rel = float(jnp.max(jnp.abs(p - q))) / scale
        assert rel < 5e-6, rel


@pytest.mark.parametrize("tiles", [1, 4])
def test_ifft_fused_impl_dot1_matches_dot3(tiles):
    from ssqueeze_rs_tpu.ops.fft_pallas import ifft_halfband_planar_fused
    M = 1 << 14
    M1, M2 = best_split(M)
    K1 = M1 // 2
    rng = np.random.default_rng(12)
    Zr = jnp.asarray(rng.standard_normal((3, K1, M2)), jnp.float32)
    Zi = jnp.asarray(rng.standard_normal((3, K1, M2)), jnp.float32)
    kw = dict(keep=(50, 12000), interpret=True)
    a = ifft_halfband_planar_fused(Zr, Zi, impl="dot3", tiles=1, **kw)
    b = ifft_halfband_planar_fused(Zr, Zi, impl="dot1", tiles=tiles, **kw)
    for p, q in zip(a, b):
        scale = float(jnp.max(jnp.abs(p))) + 1e-30
        assert float(jnp.max(jnp.abs(p - q))) / scale < 5e-6
