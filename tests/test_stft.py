"""STFT round-trip & equivalence tests (mirrors
old/tests/reconstruction_test.py:160-236)."""
import numpy as np
import pytest

from ssqueeze_rs_tpu import stft, istft
from ssqueeze_rs_tpu.utils import padsignal


def test_stft_roundtrip_grid():
    """Every even/odd combo of (N, n_fft) x hops x modulated inverts to
    float64 MAE < 1e-14 (reference: reconstruction_test.py:160-181)."""
    th = 1e-14
    rng = np.random.default_rng(0)
    for N in (128, 129):
        x = rng.standard_normal(N)
        for n_fft in (120, 121):
            for hop_len in (1, 2, 3):
                for modulated in (True, False):
                    kw = dict(hop_len=hop_len, n_fft=n_fft,
                              modulated=modulated)
                    Sx = stft(x, dtype="float64", **kw)
                    xr = np.asarray(istft(Sx, N=len(x), **kw))
                    txt = (f"(N, n_fft, hop_len, modulated) = "
                           f"({N}, {n_fft}, {hop_len}, {modulated})")
                    assert len(x) == len(xr), txt
                    mae = np.abs(x - xr).mean()
                    assert mae < th, f"MAE = {mae:.2e} > {th:.0e} {txt}"


def test_stft_matches_manual_dft():
    """Kernel equivalence: unmodulated STFT == hand-rolled numpy framing+rfft
    (the reference's buffer-vs-manual check, old/tests/fft_test.py:380-416)."""
    rng = np.random.default_rng(1)
    N, n_fft, hop = 200, 64, 4
    x = rng.standard_normal(N)
    window = np.hanning(n_fft + 1)[:-1]  # periodic hann

    Sx = np.asarray(stft(x, window=window, n_fft=n_fft, hop_len=hop,
                         modulated=False, dtype="float64"))

    xp = np.asarray(padsignal(x, "reflect", padlength=N + n_fft - 1))
    n_segs = (len(xp) - n_fft) // hop + 1
    ref = np.empty((n_fft // 2 + 1, n_segs), dtype=complex)
    for i in range(n_segs):
        ref[:, i] = np.fft.rfft(xp[i * hop:i * hop + n_fft] * window)
    assert np.allclose(Sx, ref), np.abs(Sx - ref).max()


def test_stft_modulated_is_ifftshifted_frames():
    rng = np.random.default_rng(2)
    N, n_fft = 64, 32
    x = rng.standard_normal(N)
    window = np.hanning(n_fft + 1)[:-1]
    Sm = np.asarray(stft(x, window=window, n_fft=n_fft, hop_len=1,
                         modulated=True, dtype="float64"))
    xp = np.asarray(padsignal(x, "reflect", padlength=N + n_fft - 1))
    ref = np.empty_like(Sm)
    for i in range(Sm.shape[1]):
        fr = xp[i:i + n_fft] * window
        ref[:, i] = np.fft.rfft(np.fft.ifftshift(fr))
    assert np.allclose(Sm, ref)


def test_stft_batched_equals_loop():
    rng = np.random.default_rng(3)
    X = rng.standard_normal((3, 150))
    S = np.asarray(stft(X, n_fft=64, hop_len=2, dtype="float64"))
    for i in range(3):
        Si = np.asarray(stft(X[i], n_fft=64, hop_len=2, dtype="float64"))
        assert np.allclose(S[i], Si)


def test_stft_default_n_fft_and_shapes():
    x = np.random.randn(1000)
    Sx = np.asarray(stft(x))
    assert Sx.shape[0] == 512 // 2 + 1
    assert Sx.shape[1] == (1000 - 1) // 1 + 1


def test_istft_batched():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((2, 128))
    kw = dict(n_fft=64, hop_len=2)
    S = stft(X, dtype="float64", **kw)
    xr = np.asarray(istft(S, N=128, **kw))
    assert xr.shape == X.shape
    assert np.abs(X - xr).mean() < 1e-13


def test_stft_matmul_matches_fft_path(monkeypatch):
    """float32 MXU-matmul DFT == float32 rfft path (within f32 accumulation
    error) and == float64 reference."""
    import importlib
    stft_mod = importlib.import_module("ssqueeze_rs_tpu.ops.stft")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(1000)
    for n_fft, hop, modulated in [(598, 1, True), (512, 4, True),
                                  (121, 3, False)]:
        kw = dict(window="hann", n_fft=n_fft, hop_len=hop,
                  modulated=modulated)
        S64 = np.asarray(stft(x, dtype="float64", **kw))
        S32m = np.asarray(stft(x, dtype="float32", derivative=True, **kw)[0])
        stft_mod._stft_program.cache_clear()
        monkeypatch.setattr(stft_mod, "MATMUL_NFFT_MAX", 0)
        S32f = np.asarray(stft(x, dtype="float32", **kw))
        stft_mod._stft_program.cache_clear()
        scale = np.abs(S64).max()
        assert np.abs(S32m - S64).max() / scale < 5e-6, (n_fft, hop)
        assert np.abs(S32m - S32f).max() / scale < 5e-6, (n_fft, hop)


def test_modulated_matmul_odd_nfft_matches_fft_path():
    """The matmul STFT/istft twiddle conventions for ODD n_fft (floor vs
    ceil shift — both were wrong, complementarily, before): f32 matmul
    branch vs f64 FFT branch on the same input."""
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import stft, istft
    rng = np.random.default_rng(0)
    x = rng.standard_normal(512)
    for n_fft in (9, 121, 255):
        S32 = np.asarray(stft(x, window="hann", n_fft=n_fft, hop_len=3,
                              dtype="float32"))
        S64 = np.asarray(stft(x, window="hann", n_fft=n_fft, hop_len=3,
                              dtype="float64"))
        rel = np.max(np.abs(S32 - S64)) / np.max(np.abs(S64))
        assert rel < 1e-4, (n_fft, rel)
        # inverse: feed the f64-branch spectrum into the f32 matmul istft
        xr = np.asarray(istft(jnp.asarray(S64.astype(np.complex64)),
                              window="hann", n_fft=n_fft, hop_len=3,
                              N=len(x)))
        err = np.mean(np.abs(x - xr)) / np.sqrt(np.mean(x ** 2))
        assert err < 1e-4, (n_fft, err)


def test_dtype_preservation():
    """Transforms preserve input precision: f32 -> c64, f64 -> c128
    (reference: old/tests/fft_test.py:474-512)."""
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import stft, istft, cwt, ssq_cwt, ssq_stft

    rng = np.random.default_rng(0)
    x = rng.standard_normal(1024)
    for dt, cdt, rdt in [("float32", jnp.complex64, jnp.float32),
                         ("float64", jnp.complex128, jnp.float64)]:
        S = stft(x, n_fft=128, dtype=dt)
        assert S.dtype == cdt, (dt, S.dtype)
        xr = istft(S, n_fft=128)
        assert xr.dtype == rdt, (dt, xr.dtype)
        Wx, _ = cwt(x, "gmw", scales="log", dtype=dt)
        assert Wx.dtype == cdt
        Tx, Wx2, *_ = ssq_cwt(x, ("gmw", {"beta": 8.0}), scales="log",
                              dtype=dt)
        assert Tx.dtype == cdt and Wx2.dtype == cdt
        Tx2, Sx2, *_ = ssq_stft(x, n_fft=128, dtype=dt)
        assert Tx2.dtype == cdt and Sx2.dtype == cdt


def test_stft_vs_scipy_cross_oracle():
    """External-library cross-check (restores the intent of the
    reference's librosa test, old/tests/reconstruction_test.py:209-236;
    librosa is not installed here, scipy is).

    Convention mapping (documented + asserted):
      * our stft(modulated=False, padtype='reflect') on x equals
        scipy.signal.stft on OUR reflect-padded xp (padlength =
        N + n_fft - 1) with boundary=None, padded=False — same frame
        grid, offset 0, same column count;
      * scipy scaling='spectrum' divides by win.sum(); multiply back;
      * the window is passed as an ARRAY to both sides (no name
        mapping): scipy.signal.get_window('hann') = periodic hann.

    Measured: bit-exact for even n_fft, ~4e-15 for odd (twiddle
    evaluation order).
    """
    import scipy.signal as sps

    rng = np.random.default_rng(0)
    for N in (512, 509):
        x = rng.standard_normal(N)
        for n_fft in (128, 129):
            win = sps.get_window("hann", n_fft)
            for hop in (1, 2, 4):
                Sx = np.asarray(stft(x, window=win, n_fft=n_fft,
                                     hop_len=hop, modulated=False,
                                     dtype="float64"))
                xp = np.asarray(padsignal(x, "reflect",
                                          padlength=N + n_fft - 1))
                _, _, Z = sps.stft(xp, window=win, nperseg=n_fft,
                                   noverlap=n_fft - hop, boundary=None,
                                   padded=False, detrend=False,
                                   return_onesided=True,
                                   scaling="spectrum")
                Z = Z * win.sum()
                txt = f"(N, n_fft, hop) = ({N}, {n_fft}, {hop})"
                assert Sx.shape == Z.shape, f"{Sx.shape} != {Z.shape} {txt}"
                assert np.allclose(Sx, Z, atol=1e-13, rtol=1e-12), (
                    f"max abs diff {np.abs(Sx - Z).max():.2e} {txt}")


def test_istft_inverts_scipy_spectra():
    """Inverse-direction cross-check: OUR istft applied to spectra
    produced by SCIPY's stft (converted per the mapping above) must
    reconstruct the signal — validates the inverse against an
    externally-generated input, not just our own forward transform.
    (scipy's istft OLA/boundary conventions don't map onto the
    Griffin-Lim win_exp semantics, so the forward direction is the
    shared oracle; reference librosa check was forward-only too.)"""
    import scipy.signal as sps

    rng = np.random.default_rng(1)
    N, n_fft = 512, 128
    x = rng.standard_normal(N)
    win = sps.get_window("hann", n_fft)
    xp = np.asarray(padsignal(x, "reflect", padlength=N + n_fft - 1))
    for hop in (1, 2, 4):
        _, _, Z = sps.stft(xp, window=win, nperseg=n_fft,
                           noverlap=n_fft - hop, boundary=None,
                           padded=False, detrend=False,
                           return_onesided=True, scaling="spectrum")
        xr = np.asarray(istft(Z * win.sum(), window=win, n_fft=n_fft,
                              hop_len=hop, N=N, modulated=False))
        mae = np.abs(x - xr).mean()
        assert mae < 1e-14, f"hop={hop}: MAE {mae:.2e}"
