"""Direct numerical parity vs the vendored reference (ssqueezepy, running
pure-Python via a numba no-op stub — the reference's own coverage trick,
old/tests/z_all_test.py:8-51).

These tests import PUBLIC reference code read-only as an oracle; our
implementation is independent (JAX, batched tensor programs).
"""
import sys
import types

import numpy as np
import pytest

# -- numba stub + reference import (module scope) ---------------------------
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


@pytest.fixture(scope="module")
def x64():
    return np.random.RandomState(42).randn(1024)


def test_window_parity():
    from ssqueezepy._stft import get_window as ref_get_window
    for name, wl, nfft in [("hann", 128, 128), ("hamming", 100, 128),
                           (None, 128, 128)]:
        w_ref, dw_ref = ref_get_window(name, wl, nfft, derivative=True,
                                       dtype="float64")
        w_ours, dw_ours = sq.get_window(name, wl, nfft, derivative=True,
                                        dtype="float64")
        assert np.allclose(w_ours, w_ref, atol=1e-15), (name, wl)
        assert np.allclose(dw_ours, dw_ref, atol=1e-12), (name, wl)


def test_stft_parity(x64):
    for n_fft, hop, modulated in [(128, 1, True), (128, 4, True),
                                  (121, 3, False), (120, 2, True)]:
        ref = ssq_ref.stft(x64, n_fft=n_fft, hop_len=hop,
                           modulated=modulated, dtype="float64")
        ours = np.asarray(sq.stft(x64, n_fft=n_fft, hop_len=hop,
                                  modulated=modulated, dtype="float64"))
        assert ours.shape == ref.shape
        err = np.abs(ours - ref).max() / np.abs(ref).max()
        assert err < 1e-12, (n_fft, hop, modulated, err)


def test_istft_parity(x64):
    Sx = ssq_ref.stft(x64, n_fft=128, hop_len=2, dtype="float64")
    ref = ssq_ref.istft(Sx, n_fft=128, hop_len=2, N=len(x64))
    ours = np.asarray(sq.istft(np.asarray(Sx), n_fft=128, hop_len=2,
                               N=len(x64)))
    assert np.abs(ours - ref).max() < 1e-12


def test_scales_parity(x64):
    """Scale grids (bounds heuristics + log-piecewise downsampling) match."""
    from ssqueezepy.utils import process_scales as ref_process_scales
    from ssqueezepy import Wavelet as RefWavelet
    for scheme in ("log", "log-piecewise"):
        for beta in (8.0, 60.0):
            ref_wav = RefWavelet(("gmw", {"beta": beta, "dtype": "float64"}))
            ref_scales = ref_process_scales(scheme, 1024, ref_wav, nv=16)
            ours = sq.process_scales(scheme, 1024,
                                     ("gmw", {"beta": beta}), nv=16)
            assert ours.shape == ref_scales.shape, (scheme, beta)
            assert np.allclose(ours, ref_scales, rtol=1e-6), (scheme, beta)


def test_cwt_parity(x64):
    for scales in ("log", "log-piecewise"):
        for l1_norm in (True, False):
            Wr, sr = ssq_ref.cwt(x64, ("gmw", {"dtype": "float64"}),
                                 scales=scales, nv=16, l1_norm=l1_norm)
            Wo, so = sq.cwt(x64, "gmw", scales=scales, nv=16,
                            l1_norm=l1_norm, dtype="float64")
            assert Wo.shape == Wr.shape, (scales, l1_norm)
            assert np.allclose(so, sr.squeeze(), rtol=1e-6)
            err = np.abs(np.asarray(Wo) - Wr).max() / np.abs(Wr).max()
            assert err < 1e-10, (scales, l1_norm, err)


def test_cwt_derivative_parity(x64):
    Wr, sr, dWr = ssq_ref.cwt(x64, ("gmw", {"dtype": "float64"}),
                              scales="log", nv=16, derivative=True, fs=100.0)
    Wo, so, dWo = sq.cwt(x64, "gmw", scales="log", nv=16, derivative=True,
                         fs=100.0, dtype="float64")
    err = np.abs(np.asarray(dWo) - dWr).max() / np.abs(dWr).max()
    assert err < 1e-10, err


def test_icwt_parity(x64):
    Wr, sr = ssq_ref.cwt(x64, ("gmw", {"dtype": "float64"}), scales="log",
                         nv=16)
    ref = ssq_ref.icwt(Wr, ("gmw", {"dtype": "float64"}), scales="log",
                       nv=16)
    ours = np.asarray(sq.icwt(np.asarray(Wr), "gmw", scales="log", nv=16))
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-6


def test_phase_cwt_parity(x64):
    Wr, sr, dWr = ssq_ref.cwt(x64, ("gmw", {"dtype": "float64"}),
                              scales="log", nv=16, derivative=True)
    from ssqueezepy._ssq_cwt import phase_cwt as ref_phase
    gamma = 1e-8
    wr = ref_phase(Wr.copy(), dWr, "trig", gamma)
    wo = np.asarray(sq.phase_cwt(np.asarray(Wr), np.asarray(dWr), "trig",
                                 gamma))
    fin = np.isfinite(wr)
    assert np.array_equal(fin, np.isfinite(np.asarray(wo)))
    assert np.allclose(wo[fin], wr[fin], rtol=1e-10)


def test_ssq_cwt_parity(x64):
    """End-to-end Tx: same scales, ssq_freqs and (nearly) identical Tx."""
    kw = dict(scales="log", nv=16, fs=200.0)
    Tr, Wr, fr, sr = ssq_ref.ssq_cwt(x64, ("gmw", {"dtype": "float64"}),
                                     **kw)
    To, Wo, fo, so = sq.ssq_cwt(x64, "gmw", dtype="float64", **kw)
    assert To.shape == Tr.shape
    assert np.allclose(fo, fr, rtol=1e-6)
    assert np.allclose(so, sr.squeeze(), rtol=1e-6)
    # bin decisions may flip on exact boundaries; mass must match closely
    rel = np.abs(np.asarray(To) - Tr).sum() / np.abs(Tr).sum()
    assert rel < 1e-6, rel


def test_ssq_stft_parity(x64):
    Tr, Sr, fr, Sfsr = ssq_ref.ssq_stft(x64, n_fft=128, dtype="float64")
    To, So, fo, Sfso = sq.ssq_stft(x64, n_fft=128, dtype="float64")
    assert To.shape == Tr.shape
    assert np.allclose(np.asarray(So), Sr, atol=1e-12)
    assert np.allclose(fo, fr)
    rel = np.abs(np.asarray(To) - Tr).sum() / np.abs(Tr).sum()
    assert rel < 1e-6, rel


def test_issq_cwt_parity(x64):
    Tr, *_ = ssq_ref.ssq_cwt(x64, ("gmw", {"dtype": "float64"}),
                             scales="log", nv=16)
    ref = ssq_ref.issq_cwt(Tr, ("gmw", {"dtype": "float64"}))
    ours = np.asarray(sq.issq_cwt(np.asarray(Tr), "gmw"))
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-6


def test_center_frequency_and_adm_parity():
    from ssqueezepy import Wavelet as RefWavelet
    from ssqueezepy.utils import adm_ssq as ref_adm_ssq, adm_cwt as ref_adm_cwt
    from ssqueezepy.wavelets import center_frequency as ref_cf

    for beta in (8.0, 60.0):
        ref_wav = RefWavelet(("gmw", {"beta": beta, "dtype": "float64"}))
        our_wav = sq.Wavelet.build(("gmw", {"beta": beta}))
        for kind in ("peak", "energy"):
            r = ref_cf(ref_wav, scale=10.0, N=1024, kind=kind)
            o = sq.center_frequency(our_wav, scale=10.0, N=1024, kind=kind)
            assert np.isclose(o, r, rtol=1e-6), (beta, kind)
        assert np.isclose(sq.adm_ssq(our_wav), ref_adm_ssq(ref_wav),
                          rtol=1e-6), beta
        assert np.isclose(sq.adm_cwt(our_wav), ref_adm_cwt(ref_wav),
                          rtol=1e-6), beta


def test_ridge_parity():
    from ssqueezepy.ridge_extraction import extract_ridges as ref_extract
    N = 512
    t = np.linspace(0, 1, N, endpoint=False)
    x = np.cos(2 * np.pi * (20 * t + 40 * t**2))
    Wx, scales = sq.cwt(x, ("gmw", {"beta": 8.0}), scales="log", nv=16,
                        dtype="float64")
    Wx = np.asarray(Wx)
    ref = ref_extract(Wx, np.asarray(scales).reshape(-1, 1), penalty=2.0,
                      n_ridges=1, bw=15, parallel=False)
    ours = sq.extract_ridges(Wx, scales, penalty=2.0, n_ridges=1, bw=15)
    agree = (ref.squeeze() == ours.squeeze()).mean()
    assert agree > 0.95, agree


def test_stft_odd_nfft_parity(x64):
    """Odd n_fft exercises the (i)fftshift roll conventions (floor vs
    ceil) in the matmul DFT branches (reference: _stft.py:132-135)."""
    for n_fft in (9, 121):
        ours = np.asarray(sq.stft(x64, n_fft=n_fft, hop_len=3,
                                  window="hann", dtype="float64"))
        ref = np.asarray(ssq_ref.stft(x64, n_fft=n_fft, hop_len=3,
                                      window="hann", dtype="float64"))
        assert np.allclose(ours, ref, atol=1e-10), (
            n_fft, np.max(np.abs(ours - ref)))


def test_istft_odd_nfft_parity(x64):
    """Round-trip + direct comparison of istft for odd n_fft."""
    for n_fft in (9, 121):
        Sx = ssq_ref.stft(x64, n_fft=n_fft, hop_len=1, window="hann",
                          dtype="float64")
        ref = np.asarray(ssq_ref.istft(np.asarray(Sx), n_fft=n_fft,
                                       hop_len=1, window="hann",
                                       N=len(x64)))
        ours = np.asarray(sq.istft(np.asarray(Sx), n_fft=n_fft, hop_len=1,
                                   window="hann", N=len(x64)))
        assert np.allclose(ours, ref, atol=1e-10), (
            n_fft, np.max(np.abs(ours - ref)))


def test_ssq_cwt_difftype_variants_parity(x64):
    """End-to-end difftype='phase' and 'numeric' vs the oracle
    (reference: _ssq_cwt.py:205-220, 292-295)."""
    for difftype in ("phase", "numeric"):
        ours = sq.ssq_cwt(x64, ("gmw", {"dtype": "float64"}), scales="log",
                          nv=16, difftype=difftype, get_w=True,
                          dtype="float64")
        ref = ssq_ref.ssq_cwt(x64, ("gmw", {"dtype": "float64"}),
                              scales="log", nv=16, difftype=difftype,
                              get_w=True)
        Tx_o, Tx_r = np.asarray(ours[0]), np.asarray(ref[0])
        assert Tx_o.shape == Tx_r.shape, (difftype, Tx_o.shape, Tx_r.shape)
        err = np.abs(Tx_o - Tx_r).max() / np.abs(Tx_r).max()
        assert err < 1e-6, (difftype, err)
        w_o, w_r = np.asarray(ours[4]), np.asarray(ref[4])
        finite = np.isfinite(w_r)
        werr = np.abs(w_o[finite] - w_r[finite]).max()
        assert werr < 1e-8, (difftype, werr)


def test_scalebounds_presets_parity():
    """cwt_scalebounds presets minimal/maximal/naive vs the oracle
    (reference: utils/cwt_utils.py:66-190)."""
    from ssqueezepy.utils import cwt_scalebounds as ref_bounds
    from ssqueezepy import Wavelet as RefWavelet
    from ssqueeze_rs_tpu import cwt_scalebounds

    for preset in ("minimal", "maximal", "naive"):
        for beta in (8.0, 60.0):
            ref_wav = RefWavelet(("gmw", {"beta": beta, "dtype": "float64"}))
            mr, Mr = ref_bounds(ref_wav, 1024, preset=preset)
            mo, Mo = cwt_scalebounds(("gmw", {"beta": beta}), 1024,
                                     preset=preset)
            assert abs(mo / mr - 1) < 1e-6, (preset, beta, mo, mr)
            assert abs(Mo / Mr - 1) < 1e-6, (preset, beta, Mo, Mr)


def test_linear_scales_parity():
    """scales='linear' grid vs the oracle."""
    from ssqueezepy.utils import process_scales as ref_process_scales
    from ssqueezepy import Wavelet as RefWavelet
    ref_wav = RefWavelet(("gmw", {"dtype": "float64"}))
    ref_scales = ref_process_scales("linear", 512, ref_wav, nv=16)
    ours = sq.process_scales("linear", 512, "gmw", nv=16)
    assert ours.shape == ref_scales.shape
    assert np.allclose(ours, ref_scales, rtol=1e-6)


def test_wavelet_factory_parity():
    """Public factory API (morlet/bump/cmhat/hhhat/gmw_l1/gmw_l2/
    gmw_l1_k/gmw_l2_k/compute_gmw) matches the vendored reference
    factories pointwise (reference: wavelets.py:497-606, _gmw.py:22-397)."""
    from ssqueezepy import wavelets as ref_w
    from ssqueezepy import _gmw as ref_g
    from ssqueeze_rs_tpu import wavelets as our_w

    w = np.linspace(-2.0, 20.0, 501)
    f64 = dict(dtype="float64")   # the reference defaults to float32
    pairs = [
        (our_w.morlet(mu=9.0), ref_w.morlet(mu=9.0, **f64)),
        (our_w.bump(mu=4.0, s=1.5), ref_w.bump(mu=4.0, s=1.5, **f64)),
        (our_w.cmhat(mu=2.0, s=1.2), ref_w.cmhat(mu=2.0, s=1.2, **f64)),
        (our_w.hhhat(mu=5.0), ref_w.hhhat(mu=5.0, **f64)),
        (our_w.gmw_l1(gamma=3.0, beta=8.0), ref_g.gmw_l1(3.0, 8.0, **f64)),
        (our_w.gmw_l2(gamma=3.0, beta=8.0), ref_g.gmw_l2(3.0, 8.0, **f64)),
        (our_w.gmw_l1_k(gamma=3.0, beta=8.0, k=2),
         ref_g.gmw_l1_k(3.0, 8.0, k=2, **f64)),
        (our_w.gmw_l2_k(gamma=3.0, beta=8.0, k=2),
         ref_g.gmw_l2_k(3.0, 8.0, k=2, **f64)),
    ]
    for i, (ours, ref) in enumerate(pairs):
        a, b = np.asarray(ours(w.copy())), np.asarray(ref(w.copy()))
        assert np.allclose(a, b, atol=1e-10), i

    for norm in ("bandpass", "energy"):
        for time in (False, True):
            got = our_w.compute_gmw(256, 5.0, gamma=3.0, beta=8.0,
                                    time=time, norm=norm)
            want = ref_g.compute_gmw(256, 5.0, gamma=3.0, beta=8.0,
                                     time=time, norm=norm,
                                     dtype="float64")
            if time:
                assert np.allclose(got[0], want[0], atol=1e-10)
                assert np.allclose(got[1], want[1], atol=1e-10)
            else:
                assert np.allclose(got, want, atol=1e-10)


def test_morsemom_parity():
    """GMW moments -> cumulants + morsefreq(n_out=4) curvature vs the
    reference (_gmw.py:611-747) over a (gamma, beta) grid, 1e-10."""
    from ssqueezepy._gmw import _morsemom as ref_morsemom
    from ssqueezepy._gmw import morsefreq as ref_morsefreq
    from ssqueeze_rs_tpu.wavelets.gmw import _morsemom, morsefreq

    for gamma in (1.5, 2.0, 3.0, 4.5):
        for beta in (1.0, 5.0, 20.0, 60.0):
            for p in (0, 1, 2, 3):
                got = _morsemom(p, gamma, beta, n_out=4)
                want = ref_morsemom(p, gamma, beta, n_out=4)
                for g, w_ in zip(got, want):
                    assert np.allclose(g, w_, rtol=1e-10), \
                        (gamma, beta, p, got, want)
            got4 = morsefreq(gamma, beta, n_out=4)
            want4 = ref_morsefreq(gamma, beta, n_out=4)
            assert np.allclose(got4, want4, rtol=1e-10), (gamma, beta)

    # vectorized-p path (array moments / energy moments)
    p_arr = np.arange(4)
    got = _morsemom(p_arr, 3.0, 60.0, n_out=2)
    want = np.array([ref_morsemom(int(p), 3.0, 60.0, n_out=2)
                     for p in p_arr]).T
    assert np.allclose(got[0], want[0], rtol=1e-12)
    assert np.allclose(got[1], want[1], rtol=1e-12)
