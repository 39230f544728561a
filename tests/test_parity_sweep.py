"""Randomized (seeded) oracle-parity sweep: random configurations of the
main transforms compared against the vendored reference executed
pure-Python. Complements the targeted parity tests with breadth across
the (N, n_fft, hop, window, padtype, wavelet, scales, maprange,
squeezing) space.
"""
import sys
import types

import numpy as np
import pytest

_numba = types.ModuleType("numba")


def _jit(*a, **k):
    if a and callable(a[0]):
        return a[0]

    def deco(f):
        return f
    return deco


_numba.jit = _jit
_numba.njit = _jit
_numba.prange = range
sys.modules.setdefault("numba", _numba)
sys.path.insert(0, "/root/reference/old")

ssq_ref = pytest.importorskip("ssqueezepy")

import ssqueeze_rs_tpu as sq  # noqa: E402

RNG = np.random.default_rng(1234)


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-300))


@pytest.mark.parametrize("trial", range(8))
def test_stft_random_configs(trial):
    rng = np.random.default_rng(100 + trial)
    N = int(rng.integers(200, 1200))
    n_fft = int(rng.integers(16, min(N, 256)))
    hop = int(rng.integers(1, max(2, n_fft // 4)))
    window = rng.choice(["hann", "hamming", "blackman"])
    modulated = bool(rng.integers(0, 2))
    x = rng.standard_normal(N)

    ours = np.asarray(sq.stft(x, window=window, n_fft=n_fft, hop_len=hop,
                              modulated=modulated, dtype="float64"))
    ref = np.asarray(ssq_ref.stft(x, window=window, n_fft=n_fft,
                                  hop_len=hop, modulated=modulated,
                                  dtype="float64"))
    assert ours.shape == ref.shape, (trial, ours.shape, ref.shape)
    r = _rel(ours, ref)
    assert r < 1e-9, (trial, N, n_fft, hop, window, modulated, r)


@pytest.mark.parametrize("trial", range(6))
def test_ssq_cwt_random_configs(trial):
    rng = np.random.default_rng(200 + trial)
    N = int(rng.integers(256, 1024))
    wavelet = rng.choice(["gmw", "morlet"])
    scales = rng.choice(["log", "log-piecewise"])
    squeezing = rng.choice(["sum", "lebesgue"])
    maprange = rng.choice(["peak", "maximal"])
    if maprange == "maximal" and scales == "log-piecewise":
        scales = "log"   # invalid combo in both implementations
    x = rng.standard_normal(N)

    Tx, Wx, fr, sc = sq.ssq_cwt(x, wavelet, scales=scales,
                                squeezing=squeezing, maprange=maprange,
                                dtype="float64")
    Txr, Wxr, frr, scr = ssq_ref.ssq_cwt(
        x, (wavelet, {"dtype": "float64"}), scales=scales,
        squeezing=squeezing, maprange=maprange)
    assert np.asarray(Tx).shape == np.asarray(Txr).shape
    assert _rel(sc, scr) < 1e-10, trial
    assert _rel(fr, frr) < 1e-9, trial
    assert _rel(Wx, Wxr) < 1e-7, (trial, wavelet, scales, _rel(Wx, Wxr))
    assert _rel(Tx, Txr) < 1e-6, (trial, wavelet, scales, squeezing,
                                  maprange, _rel(Tx, Txr))


@pytest.mark.parametrize("trial", range(4))
def test_cwt_icwt_random_configs(trial):
    rng = np.random.default_rng(300 + trial)
    N = int(rng.integers(256, 1024))
    l1 = bool(rng.integers(0, 2))
    wavelet = rng.choice(["gmw", "morlet"])
    x = rng.standard_normal(N)

    Wx, sc = sq.cwt(x, wavelet, scales="log", l1_norm=l1, dtype="float64")
    Wxr, scr = ssq_ref.cwt(x, (wavelet, {"dtype": "float64"}),
                           scales="log", l1_norm=l1)
    assert _rel(Wx, Wxr) < 1e-7, (trial, wavelet, l1, _rel(Wx, Wxr))

    xo = np.asarray(ssq_ref.icwt(np.asarray(Wxr),
                                 (wavelet, {"dtype": "float64"}),
                                 scales="log", l1_norm=l1))
    xn = np.asarray(sq.icwt(Wx, wavelet, scales="log", x_len=N, l1_norm=l1))
    assert _rel(xn, xo) < 1e-5, (trial, wavelet, l1, _rel(xn, xo))


@pytest.mark.parametrize("trial", range(4))
def test_ssq_stft_random_configs(trial):
    rng = np.random.default_rng(400 + trial)
    N = int(rng.integers(300, 900))
    n_fft = int(rng.integers(32, 128))
    window = rng.choice(["hann", "hamming"])
    x = rng.standard_normal(N)

    Tx, Sx, fr, Sfs = sq.ssq_stft(x, window=window, n_fft=n_fft,
                                  dtype="float64")
    Txr, Sxr, frr, Sfsr = ssq_ref.ssq_stft(x, window=window, n_fft=n_fft,
                                           dtype="float64")
    assert np.asarray(Tx).shape == np.asarray(Txr).shape
    assert _rel(Sx, Sxr) < 1e-9, (trial, _rel(Sx, Sxr))
    assert _rel(Tx, Txr) < 1e-7, (trial, N, n_fft, window, _rel(Tx, Txr))


@pytest.mark.parametrize("maprange,squeezing", [("energy", "sum"),
                                                ("peak", "abs")])
def test_ssq_cwt_maprange_energy_and_abs(maprange, squeezing):
    """maprange='energy' grid + squeezing='abs' (the fused path derives
    phase from the transformed Wx — a reference quirk we reproduce,
    ssqueezing.py:197-205) vs the oracle."""
    rng = np.random.default_rng(77)
    x = rng.standard_normal(512)
    Tx, Wx, fr, sc = sq.ssq_cwt(x, "gmw", scales="log", maprange=maprange,
                                squeezing=squeezing, dtype="float64")
    Txr, Wxr, frr, scr = ssq_ref.ssq_cwt(
        x, ("gmw", {"dtype": "float64"}), scales="log", maprange=maprange,
        squeezing=squeezing)
    assert _rel(fr, frr) < 1e-9, _rel(fr, frr)
    assert _rel(Tx, Txr) < 1e-6, (maprange, squeezing, _rel(Tx, Txr))
