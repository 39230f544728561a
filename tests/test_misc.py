"""Ridge extraction, TKEO, test signals (mirrors
old/tests/ridge_extraction_test.py strategy)."""
import numpy as np
import pytest

from ssqueeze_rs_tpu import (ssq_cwt, cwt, extract_ridges, tkeo,
                             tkeo_modified, TestSignals, stft)


def test_ridge_pure_tone():
    """Ridge of a pure tone must be flat and at the tone's scale row."""
    N, fs, f0 = 1024, 1024.0, 64.0
    t = np.arange(N) / fs
    x = np.cos(2 * np.pi * f0 * t)
    Wx, scales = cwt(x, ("gmw", {"beta": 8.0}), scales="log", fs=fs,
                     dtype="float64")
    ridge = extract_ridges(Wx, scales, penalty=2.0, n_ridges=1)
    assert ridge.shape == (N, 1)
    interior = ridge[50:-50, 0]
    # flat ridge
    assert interior.std() < 1.0, interior.std()
    # at the row of max energy
    expect = np.abs(np.asarray(Wx)).mean(axis=1).argmax()
    assert abs(interior.mean() - expect) < 2


def test_ridge_two_tones():
    N, fs = 1024, 1024.0
    t = np.arange(N) / fs
    x = np.cos(2 * np.pi * 60 * t) + 0.8 * np.cos(2 * np.pi * 180 * t)
    Wx, scales = cwt(x, ("gmw", {"beta": 8.0}), scales="log", fs=fs,
                     dtype="float64")
    ridges, ridge_f, ridge_e = extract_ridges(Wx, scales, penalty=2.0,
                                              n_ridges=2, bw=10,
                                              get_params=True)
    assert ridges.shape == (N, 2)
    r0, r1 = ridges[100:-100, 0], ridges[100:-100, 1]
    assert abs(r0.mean() - r1.mean()) > 10  # distinct components
    assert ridge_e.shape == (N, 2)


def test_ridge_chirp_monotonic():
    ts = TestSignals(N=1024)
    x, t = ts.lchirp(1024, fmin=20, fmax=200, tmin=0, tmax=1)
    Tx, Wx, ssq_freqs, scales = ssq_cwt(x, ("gmw", {"beta": 8.0}),
                                        scales="log", t=t, dtype="float64")
    ridge = extract_ridges(Wx, scales, penalty=0.5, n_ridges=1)[:, 0]
    interior = ridge[100:-100].astype(float)
    # scales descend in frequency as index grows -> chirp up = ridge idx down
    slope = np.polyfit(np.arange(len(interior)), interior, 1)[0]
    assert slope < 0, slope


def test_tkeo():
    x = np.random.randn(100)
    y = np.asarray(tkeo(x))
    assert y.shape == (98,)
    ref = x[1:-1] ** 2 - x[:-2] * x[2:]
    assert np.allclose(y, ref)

    ym = np.asarray(tkeo_modified(x))
    assert ym.shape == (97,)
    # reference formula (test.rs:45-85): out[i-3] = x[i-1]x[i-2] - x[i]x[i-3]
    ref_m = np.array([x[i - 1] * x[i - 2] - x[i] * x[i - 3]
                      for i in range(3, 100)])
    assert np.allclose(ym, ref_m)

    # batched channels
    X = np.random.randn(4, 100)
    Yb = np.asarray(tkeo(X))
    for i in range(4):
        assert np.allclose(Yb[i], np.asarray(tkeo(X[i])))


def test_tkeo_pure_tone_energy():
    """TKEO of A*cos(w*n) ~= A^2 sin^2(w) (constant)."""
    n = np.arange(2000)
    w = 0.1
    x = 3.0 * np.cos(w * n)
    y = np.asarray(tkeo(x))
    expect = 9.0 * np.sin(w) ** 2
    assert np.allclose(y, expect, rtol=1e-6)


def test_signals_bank():
    ts = TestSignals(N=512)
    # reference return semantics: get_params=False -> list of signals
    # (bare x for one), get_params=True -> {name: (x, t, params)}
    out = ts.make_signals("all")
    assert isinstance(out, list) and len(out) == len(TestSignals.SUPPORTED)
    outp = ts.make_signals("all", get_params=True)
    assert set(outp) == set(TestSignals.SUPPORTED)
    for name, (x, t, _params) in outp.items():
        assert np.isfinite(x).all(), name
        assert len(x) >= 500, name
    x1 = ts.make_signals("sine")
    assert isinstance(x1, np.ndarray)
    # composition + bank defaults (reference DEFAULT_ARGS)
    xc = ts.make_signals("sine:am-cosine")
    assert isinstance(xc, np.ndarray) and np.isfinite(xc).all()


def test_signals_snr():
    ts_clean = TestSignals(N=2048)
    ts_noisy = TestSignals(N=2048, snr=10, seed=0)
    xc, _ = ts_clean.lchirp()
    xn, _ = ts_noisy.lchirp()
    noise = xn - xc
    snr_meas = 10 * np.log10(np.mean(xc**2) / np.mean(noise**2))
    assert abs(snr_meas - 10) < 1.5, snr_meas


def test_transforms_differentiable():
    """JAX-native bonus (not a reference feature): the XLA paths are
    end-to-end differentiable — usable as trainable front-ends."""
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import stft, istft, cwt, ssq_cwt

    x = jnp.asarray(np.random.default_rng(0).standard_normal(512),
                    jnp.float32)
    for fn in (
        lambda x: jnp.sum(jnp.abs(stft(x, n_fft=64, dtype="float32"))),
        lambda x: jnp.sum(jnp.abs(cwt(x, "gmw", dtype="float32")[0])),
        lambda x: jnp.sum(jnp.abs(istft(stft(x, n_fft=64,
                                             dtype="float32"),
                                        n_fft=64, N=512))),
        lambda x: jnp.sum(jnp.abs(ssq_cwt(x, "gmw", dtype="float32")[0])),
    ):
        g = jax.grad(fn)(x)
        assert jnp.isfinite(g).all()
        assert float(jnp.abs(g).sum()) > 0
