"""`ssqueeze_rs_tpu.algos` vs the reference kernel layer
(old/ssqueezepy/algos.py, run pure-Python via the numba no-op stub)."""
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

ref_algos = pytest.importorskip("ssqueezepy.algos")

from ssqueeze_rs_tpu import algos  # noqa: E402


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_nck():
    for n, k in [(5, 2), (10, 0), (10, 10), (12, 7)]:
        assert algos.nCk(n, k) == ref_algos.nCk(n, k)


def test_indexed_sum(rng):
    a = rng.standard_normal((40, 64))
    k = rng.integers(0, 40, size=(40, 64))
    ours = np.asarray(algos.indexed_sum(a, k))
    ref = ref_algos.indexed_sum(a, k, parallel=False)
    assert np.allclose(ours, ref, atol=1e-12)


@pytest.mark.parametrize("logscale,flipud", [(False, False), (True, False),
                                             (True, True)])
def test_indexed_sum_onfly(rng, logscale, flipud):
    na, n = 32, 128
    Wx = (rng.standard_normal((na, n)) +
          1j * rng.standard_normal((na, n)))
    if logscale:
        ssq_freqs = np.logspace(np.log10(0.01), np.log10(0.5), na)
    else:
        ssq_freqs = np.linspace(0.01, 0.5, na)
    w = np.abs(rng.standard_normal((na, n))) * 0.3 + 0.01
    w[rng.random((na, n)) < 0.05] = np.inf      # skipped entries
    const = np.abs(rng.standard_normal(na)) + 0.5

    ours = np.asarray(algos.indexed_sum_onfly(
        Wx, w, ssq_freqs, const=const, logscale=logscale, flipud=flipud))
    ref = ref_algos.indexed_sum_onfly(
        Wx.copy(), w.copy(), ssq_freqs, const=const, logscale=logscale,
        flipud=flipud, parallel=False)
    # banker's vs half-away rounding flips ties to adjacent bins on
    # synthetic grids; compare scatter-invariant marginals + near-equality
    assert np.allclose(np.asarray(ours).sum(axis=0), ref.sum(axis=0),
                       atol=1e-10)
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 5e-2


@pytest.mark.parametrize("transform", ["cwt", "stft"])
def test_ssqueeze_fast(rng, transform):
    na, n = 32, 128
    Wx = (rng.standard_normal((na, n)) +
          1j * rng.standard_normal((na, n)))
    dWx = (rng.standard_normal((na, n)) +
           1j * rng.standard_normal((na, n)))
    ssq_freqs = np.linspace(0.01, 0.5, na)
    Sfs = np.linspace(0, 0.5, na) if transform == "stft" else None
    const = 0.1

    ours = np.asarray(algos.ssqueeze_fast(
        Wx, dWx, ssq_freqs, const, gamma=1e-8, Sfs=Sfs))
    ref = ref_algos.ssqueeze_fast(
        Wx.copy(), dWx.copy(), ssq_freqs, const, gamma=1e-8, Sfs=Sfs,
        parallel=False)
    assert np.allclose(np.asarray(ours).sum(axis=0), ref.sum(axis=0),
                       atol=1e-10)
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 5e-2


def test_phase_kernels(rng):
    na, n = 16, 64
    Wx = (rng.standard_normal((na, n)) +
          1j * rng.standard_normal((na, n)))
    dWx = (rng.standard_normal((na, n)) +
           1j * rng.standard_normal((na, n)))
    Wx[0, 0] = 1e-12      # below gamma -> inf
    gamma = 1e-8
    ours = np.asarray(algos.phase_cwt_cpu(Wx, dWx, gamma))
    ref = ref_algos.phase_cwt_cpu(Wx, dWx, gamma, parallel=False)
    assert np.array_equal(np.isinf(ours), np.isinf(ref))
    m = ~np.isinf(ref)
    assert np.allclose(ours[m], ref[m], atol=1e-12)

    Sfs = np.linspace(0, 0.5, na)
    ours = np.asarray(algos.phase_stft_cpu(Wx, dWx, Sfs, gamma))
    ref = ref_algos.phase_stft_cpu(Wx, dWx, Sfs, gamma, parallel=False)
    assert np.array_equal(np.isinf(ours), np.isinf(ref))
    m = ~np.isinf(ref)
    assert np.allclose(ours[m], ref[m], atol=1e-12)


def test_zero_denormals():
    tiny = np.finfo(np.float32).tiny
    x = np.array([0.5, 100 * tiny, -100 * tiny, 1e-3, -2000 * tiny],
                 np.float32)
    ref = x.copy()
    ref_algos.zero_denormals(ref, parallel=False)
    ours_np = x.copy()
    out = algos.zero_denormals(ours_np)
    assert np.array_equal(out, ref) and np.array_equal(ours_np, ref)

    import jax.numpy as jnp
    out_j = np.asarray(algos.zero_denormals(jnp.asarray(x)))
    assert np.array_equal(out_j, ref)


# -- surrounding API-parity fills (audit r3) ----------------------------------
def test_psifn_matches_reference():
    """Wavelet.psifn == reference time-domain sampling (spectral
    reversal + ifft)."""
    from ssqueezepy.wavelets import Wavelet as RefWavelet
    from ssqueeze_rs_tpu import Wavelet

    for spec in [("gmw", {"beta": 12.0}), ("morlet", {"mu": 6.0})]:
        ref = RefWavelet(spec, dtype="float64").psifn(scale=10.0, N=256)
        ours = Wavelet.build(spec).psifn(scale=10.0, N=256)
        assert np.allclose(ours, ref, atol=1e-12), spec


def test_fft_name_parity():
    from ssqueeze_rs_tpu.utils import fft as F

    x = np.random.default_rng(0).standard_normal(64)
    assert np.allclose(np.asarray(F.fft(x)), np.fft.fft(x), atol=1e-6)
    assert np.allclose(np.asarray(F.rfft(x)), np.fft.rfft(x), atol=1e-6)
    assert np.allclose(np.asarray(F.ifft(F.fft(x))).real, x, atol=1e-6)
    assert np.allclose(np.asarray(F.irfft(F.rfft(x), n=64)), x, atol=1e-6)
    assert np.allclose(np.asarray(F.fftshift(x)), np.fft.fftshift(x))
    assert np.allclose(np.asarray(F.ifftshift(x)), np.fft.ifftshift(x))


def test_gdefaults():
    from ssqueeze_rs_tpu.config import gdefaults

    # fills None from the section, keeps explicit values
    out = gdefaults("wavelets.gmw", gamma=None, beta=5.0, as_dict=True)
    assert out["gamma"] == 3.0 and out["beta"] == 5.0
    # get_all pulls every section default
    out = gdefaults("gmw", get_all=True)
    assert out["norm"] == "bandpass" and out["order"] == 0
    # scalar return for a single kwarg
    assert gdefaults("morlet", mu=None) == 13.4


def test_find_closest_parallel_is_faster_smoke():
    from ssqueeze_rs_tpu.utils.common import find_closest_parallel_is_faster

    assert find_closest_parallel_is_faster((8, 16), trials=1,
                                           verbose=0) is False


def test_signal_comparison_methods_render():
    """wavcomp / cwt_vs_stft / ridgecomp render on Agg (smoke)."""
    import matplotlib
    matplotlib.use("Agg")
    from ssqueeze_rs_tpu import TestSignals

    ts = TestSignals(N=256)
    ts.wavcomp("gmw", signals=["lchirp"], N=256)
    ts.cwt_vs_stft("gmw", "hann", signals=["echirp"], N=256, n_fft=64)
    ts.ridgecomp(signals=["lchirp"], N=256, n_ridges=1)
