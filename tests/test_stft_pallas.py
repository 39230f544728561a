"""Fused Pallas windowed-DFT STFT kernel (interpret mode on CPU)."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssqueeze_rs_tpu import stft


def _clear():
    jax.clear_caches()
    sys.modules["ssqueeze_rs_tpu.ops.stft"]._stft_program.cache_clear()


def _ab(monkeypatch, fn):
    """Run fn with the fused kernel forced on, then off (env is read at
    program-build time; caches cleared between)."""
    monkeypatch.setenv("SSQ_TPU_KERNELS", "1")
    _clear()
    on = fn()
    monkeypatch.setenv("SSQ_TPU_KERNELS", "0")
    _clear()
    off = fn()
    monkeypatch.delenv("SSQ_TPU_KERNELS")
    _clear()
    return on, off


@pytest.mark.parametrize("N,n_fft", [(4000, 598), (4000, 256), (3000, 121)])
def test_fused_stft_matches_xla(monkeypatch, N, n_fft):
    """Kernel == XLA matmul path within the bf16x6 bound (~5e-7)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N).astype(np.float32)
    S1, S0 = _ab(monkeypatch, lambda: np.asarray(
        stft(x, n_fft=n_fft, hop_len=1, dtype="float32")))
    assert S1.shape == S0.shape
    rel = np.abs(S1 - S0).max() / np.abs(S0).max()
    assert rel < 2e-6, rel


def test_fused_stft_derivative_batched(monkeypatch):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2000)).astype(np.float32)
    f = lambda: [np.asarray(a) for a in stft(
        x, n_fft=256, hop_len=1, fs=500.0, dtype="float32",
        derivative=True)]
    (S1, dS1), (S0, dS0) = _ab(monkeypatch, f)
    for a, b in [(S1, S0), (dS1, dS0)]:
        rel = np.abs(a - b).max() / np.abs(b).max()
        assert rel < 2e-6, rel


def test_fused_stft_grad_matches_xla(monkeypatch):
    """custom_vjp (linear transpose, no residuals) == XLA autodiff."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(1000), jnp.float32)

    def loss():
        def f(x):
            S = stft(x, n_fft=128, hop_len=1, dtype="float32")
            return jnp.sum(jnp.abs(S) ** 2)
        return np.asarray(jax.grad(f)(x))

    g1, g0 = _ab(monkeypatch, loss)
    rel = np.abs(g1 - g0).max() / np.abs(g0).max()
    assert rel < 1e-4, rel


def test_fused_gate_conditions(monkeypatch):
    """hop > 1 and float64 stay on the XLA path (bitwise equality with
    the kernel flag flipped proves the kernel never engaged)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(2000)
    f = lambda: np.asarray(stft(x, n_fft=256, hop_len=4, dtype="float32"))
    S1, S0 = _ab(monkeypatch, f)
    assert np.array_equal(S1, S0)
    f = lambda: np.asarray(stft(x, n_fft=256, hop_len=1, dtype="float64"))
    S1, S0 = _ab(monkeypatch, f)
    assert np.array_equal(S1, S0)


@pytest.mark.parametrize("n_fft,win_exp", [(598, 1), (256, 0), (121, 2)])
def test_fused_istft_matches_xla(monkeypatch, n_fft, win_exp):
    """Fused irfft+OLA kernel == XLA matmul+scan path."""
    from ssqueeze_rs_tpu import istft

    rng = np.random.default_rng(4)
    N = 3000
    x = rng.standard_normal(N).astype(np.float32)
    monkeypatch.setenv("SSQ_TPU_KERNELS", "0")
    _clear()
    Sx = stft(x, n_fft=n_fft, hop_len=1, dtype="float32")
    f = lambda: np.asarray(istft(Sx, n_fft=n_fft, hop_len=1, N=N,
                                 win_exp=win_exp))
    x1, x0 = _ab(monkeypatch, f)
    assert x1.shape == x0.shape
    rel = np.abs(x1 - x0).max() / np.abs(x0).max()
    assert rel < 2e-6, rel


def test_fused_istft_round_trip_and_grad(monkeypatch):
    from ssqueeze_rs_tpu import istft, mad_rms

    rng = np.random.default_rng(5)
    N = 2000
    x = rng.standard_normal(N).astype(np.float32)
    monkeypatch.setenv("SSQ_TPU_KERNELS", "1")
    _clear()
    Sx = stft(x, n_fft=256, hop_len=1, dtype="float32")
    xr = np.asarray(istft(Sx, n_fft=256, hop_len=1, N=N))
    assert mad_rms(x, xr) < 1e-5

    def loss():
        def f(S):
            return jnp.sum(istft(S, n_fft=256, hop_len=1, N=N) ** 2)
        return np.asarray(jax.grad(f)(Sx).real)

    g1 = loss()
    monkeypatch.setenv("SSQ_TPU_KERNELS", "0")
    _clear()
    g0 = loss()
    monkeypatch.delenv("SSQ_TPU_KERNELS")
    _clear()
    rel = np.abs(g1 - g0).max() / np.abs(g0).max()
    assert rel < 1e-4, rel


@pytest.mark.parametrize("flipud", [False, True])
def test_mega_fused_ssq_stft_matches_two_kernel_path(monkeypatch, flipud):
    """The whole-pipeline fused ssq_stft kernel == the generic
    stft->reassign route (same planes, same binning math)."""
    from ssqueeze_rs_tpu import ssq_stft

    rng = np.random.default_rng(6)
    N = 3000
    t = np.arange(N) / 1000.0
    x = (np.cos(2 * np.pi * 97 * t) +
         0.2 * rng.standard_normal(N)).astype(np.float32)

    def run():
        Tx, Sx, fr, Sfs = ssq_stft(x, n_fft=256, fs=1000.0,
                                   dtype="float32", flipud=flipud)
        return [np.asarray(a) for a in (Tx, Sx, fr, Sfs)]

    (T1, S1, f1, sf1), (T0, S0, f0, sf0) = _ab(monkeypatch, run)
    assert T1.shape == T0.shape and S1.shape == S0.shape
    assert np.array_equal(f1, f0) and np.array_equal(sf1, sf0)
    # Sx: pure linear pipeline, tight
    rel = np.abs(S1 - S0).max() / np.abs(S0).max()
    assert rel < 2e-6, rel
    # Tx: ulp-level phase differences flip isolated bins between the
    # routes (and |.| marginals are not invariant under redistribution);
    # measured ~1.6e-4 on noise — bound at 1e-3
    col1 = np.abs(T1).sum(axis=0)
    col0 = np.abs(T0).sum(axis=0)
    assert np.abs(col1 - col0).max() / col0.max() < 1e-3
    assert np.isclose(np.abs(T1).sum(), np.abs(T0).sum(), rtol=1e-5)


def test_mega_fused_ssq_stft_grad(monkeypatch):
    """jax.grad through the mega-fused ssq_stft (custom_vjp backward via
    the two-kernel route) matches the XLA fallback (review r3 finding:
    the kernel initially had no AD rule)."""
    from ssqueeze_rs_tpu import ssq_stft

    rng = np.random.default_rng(8)
    N = 1500
    t = np.arange(N) / 500.0
    x = jnp.asarray(np.cos(2 * np.pi * 60 * t) +
                    0.1 * rng.standard_normal(N), jnp.float32)

    def run():
        def loss(x):
            Tx, Sx, *_ = ssq_stft(x, n_fft=128, fs=500.0, dtype="float32")
            return jnp.sum(jnp.abs(Tx) ** 2) + jnp.sum(jnp.abs(Sx) ** 2)
        return np.asarray(jax.grad(loss)(x))

    g1, g0 = _ab(monkeypatch, run)
    assert np.isfinite(g1).all() and np.isfinite(g0).all()
    rel = np.abs(g1 - g0).max() / np.abs(g0).max()
    # bin flips between routes move isolated gradient contributions
    assert rel < 5e-3, rel


# -- stacked-contraction ("dot1") impl variants -------------------------------
def test_stft_impl_dot1_matches_dot6():
    """One stacked 6x-contraction dot == the 6-dot sum (same products,
    MXU f32 accumulator vs sequential adds)."""
    from ssqueeze_rs_tpu.ops.stft_pallas import stft_dft_fused

    rng = np.random.default_rng(10)
    n_fft, n_out = 128, 700
    rows = 2 * (n_fft // 2 + 1)
    K = rng.standard_normal((rows, n_fft)).astype(np.float32)
    xp = jnp.asarray(rng.standard_normal((2, n_out + n_fft - 1)),
                     jnp.float32)
    a = np.asarray(stft_dft_fused(xp, K, n_fft, n_out, interpret=True,
                                  impl="dot6"))
    b = np.asarray(stft_dft_fused(xp, K, n_fft, n_out, interpret=True,
                                  impl="dot1"))
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 5e-6, rel

    # backward (dot1 cotangent shapes differ: stacked const + dummies)
    f = lambda impl: np.asarray(jax.grad(lambda x: jnp.sum(stft_dft_fused(
        x, K, n_fft, n_out, interpret=True, impl=impl) ** 2))(xp[0]))
    ga, gb = f("dot6"), f("dot1")
    rel = np.abs(ga - gb).max() / np.abs(ga).max()
    assert rel < 1e-5, rel


def test_istft_impl_dot1_matches_dot6():
    """[Fr6 | -Fs6] single 12x-contraction dot == the two acc6 passes."""
    from ssqueeze_rs_tpu.ops.stft_pallas import istft_ola_fused

    rng = np.random.default_rng(11)
    n_fft, n_segs = 121, 900
    nf = n_fft // 2 + 1
    Fr = rng.standard_normal((n_fft, nf)).astype(np.float32)
    Fs = rng.standard_normal((n_fft, nf)).astype(np.float32)
    Sx = jnp.asarray(rng.standard_normal((nf, n_segs)) +
                     1j * rng.standard_normal((nf, n_segs)), jnp.complex64)
    a = np.asarray(istft_ola_fused(Sx, Fr, Fs, n_fft, interpret=True,
                                   impl="dot6"))
    b = np.asarray(istft_ola_fused(Sx, Fr, Fs, n_fft, interpret=True,
                                   impl="dot1"))
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 5e-6, rel


def test_mega_ssq_stft_impl_dot1(monkeypatch):
    """Whole-pipeline kernel under SSQ_TPU_STFT_IMPL=dot1 == dot6."""
    from ssqueeze_rs_tpu import ssq_stft

    rng = np.random.default_rng(12)
    N = 2000
    t = np.arange(N) / 1000.0
    x = (np.cos(2 * np.pi * 80 * t) +
         0.1 * rng.standard_normal(N)).astype(np.float32)

    monkeypatch.setenv("SSQ_TPU_KERNELS", "1")

    def run(impl):
        monkeypatch.setenv("SSQ_TPU_STFT_IMPL", impl)
        _clear()
        Tx, Sx, *_ = ssq_stft(x, n_fft=256, fs=1000.0, dtype="float32")
        return np.asarray(Tx), np.asarray(Sx)
    T6, S6 = run("dot6")
    T1, S1 = run("dot1")
    monkeypatch.delenv("SSQ_TPU_STFT_IMPL")
    monkeypatch.delenv("SSQ_TPU_KERNELS")
    _clear()
    rel = np.abs(S1 - S6).max() / np.abs(S6).max()
    assert rel < 5e-6, rel
    # Tx: ulp-level phase differences can flip isolated bins; compare
    # the |.| column marginals like the two-kernel-path test does
    col1 = np.abs(T1).sum(axis=0)
    col6 = np.abs(T6).sum(axis=0)
    assert np.abs(col1 - col6).max() / col6.max() < 1e-3


@pytest.mark.parametrize("sig", ["tone", "noise"])
def test_mega_ssq_stft_banded_bitwise(monkeypatch, sig):
    """The mega kernel's banded scatter (r4, SSQ_TPU_REASSIGN_BAND
    default-on) is BITWISE-equal to the full loop — on a gamma-masked
    tone (banded branch FIRES: host detector replica bands 3/3 tiles
    at this exact config; at default gamma the off-bin leakage w
    scatter falls back everywhere) AND on noise (zero-out-of-band test
    fails -> full-loop fallback)."""
    from ssqueeze_rs_tpu import ssq_stft

    rng = np.random.default_rng(3)
    N = 2000
    t = np.arange(N) / 1000.0
    x = (np.cos(2 * np.pi * 97 * t) if sig == "tone"
         else rng.standard_normal(N)).astype(np.float32)
    gamma = 1e-3 if sig == "tone" else None

    monkeypatch.setenv("SSQ_TPU_KERNELS", "1")

    def run(band):
        monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", band)
        _clear()
        # n_fft=256 -> nf=129 >= STRIP+B+16: the banded gate is open
        kw = {} if gamma is None else {"gamma": gamma}
        Tx, Sx, *_ = ssq_stft(x, n_fft=256, fs=1000.0, dtype="float32",
                              **kw)
        return np.asarray(Tx), np.asarray(Sx)

    Tb, Sb = run("32,32")
    T0, S0 = run("off")
    monkeypatch.delenv("SSQ_TPU_REASSIGN_BAND")
    _clear()
    assert np.array_equal(Sb, S0)
    assert np.array_equal(Tb, T0)
    assert np.abs(Tb).sum() > 0


@pytest.mark.parametrize("sig", ["tone", "noise"])
def test_mega_ssq_stft_grouped_accumulate(monkeypatch, sig):
    """SSQ_TPU_REASSIGN_GROUP in the mega kernel (r5): grouped vs
    ungrouped is tight-allclose (in-group association only), and
    band-vs-full stays BITWISE at the same G — on both the banded-branch
    signal (gamma-masked tone) and the full-loop fallback (noise).
    nf=129, G=8 -> 16 groups + 1 tail row."""
    from ssqueeze_rs_tpu import ssq_stft

    rng = np.random.default_rng(4)
    N = 2000
    t = np.arange(N) / 1000.0
    x = (np.cos(2 * np.pi * 97 * t) if sig == "tone"
         else rng.standard_normal(N)).astype(np.float32)
    gamma = 1e-3 if sig == "tone" else None

    monkeypatch.setenv("SSQ_TPU_KERNELS", "1")

    def run(band, group):
        monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", band)
        monkeypatch.setenv("SSQ_TPU_REASSIGN_GROUP", group)
        _clear()
        kw = {} if gamma is None else {"gamma": gamma}
        Tx, Sx, *_ = ssq_stft(x, n_fft=256, fs=1000.0, dtype="float32",
                              **kw)
        return np.asarray(Tx), np.asarray(Sx)

    T1, S1 = run("off", "1")
    T8, S8 = run("off", "8")
    assert np.array_equal(S8, S1)            # Sx untouched by grouping
    bar = 1e-6 * np.abs(T1).max()
    assert np.allclose(T8, T1, atol=bar), np.abs(T8 - T1).max()

    T8b, _ = run("32,32", "8")
    assert np.array_equal(T8b, T8), (
        f"banded != full at G=8 (max {np.abs(T8b - T8).max():.3e})")
    monkeypatch.delenv("SSQ_TPU_REASSIGN_GROUP")
    monkeypatch.delenv("SSQ_TPU_REASSIGN_BAND")
    _clear()
