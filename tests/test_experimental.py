"""Parity tests for experimental.py (scale<->freq conversions) vs the
vendored reference oracle, plus visuals render-smoke (Agg backend).

Reference: old/ssqueezepy/experimental.py:15-142, visuals.py.
"""
import sys
import types

import numpy as np
import pytest

# numba no-op stub (same trick as test_reference_parity.py)
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
from ssqueeze_rs_tpu.experimental import (freq_to_scale,  # noqa: E402
                                          scale_to_freq)


def test_scale_to_freq_parity():
    """(reference: experimental.py:85-142)"""
    N = 1024
    wav = sq.Wavelet.build("gmw")
    wav_ref = ssq_ref.Wavelet("gmw")
    scales = np.logspace(np.log10(2), np.log10(200), 24)
    ours = scale_to_freq(scales, wav, N, fs=250.0)
    theirs = ssq_ref.experimental.scale_to_freq(scales, wav_ref, N, fs=250.0)
    assert np.allclose(ours, np.asarray(theirs), rtol=1e-6), (
        np.max(np.abs(ours - theirs)))


def test_freq_to_scale_round_trip():
    """freq -> scale -> freq recovers the grid to a few percent
    (reference: experimental.py:15-82; exactness is search-grid-limited)."""
    N = 2048
    wav = sq.Wavelet.build("gmw")
    freqs = np.linspace(0.02, 0.5, 16)
    scales = freq_to_scale(freqs, wav, N)
    assert np.all(np.diff(scales) < 0)          # high freq -> small scale
    freqs_back = scale_to_freq(scales, wav, N, padtype=None)
    # freq_to_scale log-interpolates BETWEEN the endpoint scales
    # (reference: experimental.py:76-82) — only endpoints are anchored
    assert np.all(np.diff(freqs_back) > 0)
    assert abs(freqs_back[0] - freqs[0]) < 0.01, freqs_back[0]
    assert abs(freqs_back[-1] - freqs[-1]) < 0.01, freqs_back[-1]


def test_freq_to_scale_parity():
    """(reference: experimental.py:15-82)"""
    N = 1024
    wav = sq.Wavelet.build("gmw")
    wav_ref = ssq_ref.Wavelet("gmw")
    freqs = np.linspace(0.05, 0.5, 8)
    ours = freq_to_scale(freqs, wav, N, n_search_scales=200)
    theirs = ssq_ref.experimental.freq_to_scale(freqs, wav_ref, N,
                                                n_search_scales=200)
    assert np.allclose(ours, np.asarray(theirs), rtol=0.05), (
        ours / np.asarray(theirs))


# -- visuals render-smoke -----------------------------------------------------
def test_visuals_render():
    """Main viz entry points draw onto the Agg canvas without error."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ssqueeze_rs_tpu import visuals

    wav = sq.Wavelet.build("gmw")
    x = np.random.RandomState(0).randn(256)
    Wx, scales = sq.cwt(x, wav, dtype="float64")

    visuals.imshow(np.abs(np.asarray(Wx)), show=False)
    plt.close("all")
    visuals.plot(np.asarray(Wx)[4], show=False)
    plt.close("all")
    visuals.scat(np.arange(16), np.arange(16) ** 2, show=False)
    plt.close("all")
    visuals.hist(x, show=False)
    plt.close("all")
    visuals.wavelet_filterbank(wav, N=256, show=False)
    plt.close("all")
    visuals.wavelet_tf(wav, N=256, show=False)
    plt.close("all")
    visuals.wavelet_waveforms(wav, N=256, scale=8.0, show=False)
    plt.close("all")
    visuals.wavelet_heatmap(wav, N=256, show=False)
    plt.close("all")
    visuals.viz_gmw_orders(N=256, orders=(0, 1), show=False)
    plt.close("all")


def test_wavelet_viz_and_signal_demo():
    """Wavelet.viz dispatch + TestSignals.demo/test_transforms render
    (reference: wavelets.py:342-366, _test_signals.py:465-534)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ssqueeze_rs_tpu.signals import TestSignals

    wav = sq.Wavelet.build("gmw")
    for name in ("heatmap", "filterbank", "std_t", "std_w", "harea",
                 "time-frequency"):
        wav.viz(name, N=256, show=False)
        plt.close("all")
    with pytest.raises(ValueError):
        wav.viz("nope")

    ts = TestSignals(N=256)
    data = ts.make_signals(["sine", ("lchirp", dict(fmin=1, fmax=40))],
                           get_params=True)
    assert set(data) == {"sine", "lchirp"}
    x, t, (fp, ap) = data["lchirp"]
    assert fp == dict(fmin=1, fmax=40) and len(x) == 256

    ts.demo(["sine"], dft="rows")
    plt.close("all")

    seen = []

    def fn(x, t, params):
        seen.append(params[0])
        if params[0] == "sine":
            return None
        Wx, _ = sq.cwt(x, "gmw", dtype="float64")
        return np.abs(np.asarray(Wx)), dict(show=False)

    ts.test_transforms(fn, signals=["sine", "cosine"])
    plt.close("all")
    assert seen == ["sine", "cosine"]


def test_phase_ssqueeze_matches_ssq_cwt():
    """Standalone phase_ssqueeze on a raw CWT equals the fused ssq_cwt
    (reference: experimental.py:145-259)."""
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import cwt, ssq_cwt
    from ssqueeze_rs_tpu.experimental import phase_ssqueeze, phase_transform

    rng = np.random.default_rng(0)
    x = rng.standard_normal(512)
    Wx, scales, dWx = cwt(x, "gmw", scales="log", derivative=True,
                          fs=50.0, dtype="float64")
    Tx, *_ = phase_ssqueeze(Wx, dWx, scales=scales.reshape(-1, 1),
                            wavelet="gmw", fs=50.0, flipud=True)
    Tx_ref, *_ = ssq_cwt(x, "gmw", scales="log", fs=50.0, dtype="float64")
    rel = float(jnp.max(jnp.abs(Tx - Tx_ref)) / jnp.max(jnp.abs(Tx_ref)))
    assert rel < 1e-12, rel

    # dWx=None: derivative recomputed via trigdiff. Approximate by
    # construction (padding Wx != transforming padded x, reference
    # caveat at experimental.py:160-166) — so compare against the
    # REFERENCE's phase_ssqueeze(dWx=None) on the same Wx instead
    Tx2, *_ = phase_ssqueeze(Wx, None, scales=scales.reshape(-1, 1),
                             wavelet="gmw", fs=50.0, flipud=True,
                             padtype="reflect")
    Txr, *_ = ssq_ref.experimental.phase_ssqueeze(
        np.asarray(Wx), None, scales=np.asarray(scales).reshape(-1, 1),
        wavelet=ssq_ref.Wavelet(("gmw", {"dtype": "float64"})), fs=50.0,
        flipud=True, padtype="reflect")
    rel2 = float(np.max(np.abs(np.asarray(Tx2) - np.asarray(Txr))) /
                 np.max(np.abs(np.asarray(Txr))))
    assert rel2 < 1e-6, rel2

    w, _, dWx2, _, gamma = phase_transform(Wx, dWx, get_w=True, fs=50.0)
    assert np.isfinite(np.asarray(w)[np.isfinite(np.asarray(w))]).all()


def test_visuals_kwarg_surface(tmp_path):
    """Reference kwarg surface exercised by its tests/examples
    (z_all_test.py:192-193, reconstruction_test.py:249-251,
    ridge_extraction_test.py:48-65): complex panels, ridge markers,
    ticks/borders off, norm presets, vhlines tuples, plots grids,
    plotscat, hist stats, sweeps with get=True."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ssqueeze_rs_tpu import visuals

    g = np.random.RandomState(1).randn(24, 32)
    visuals.imshow(g * (1 + 2j), complex=1, show=False)
    plt.close("all")
    visuals.imshow(g, ridge=1, ticks=0, show=False)
    plt.close("all")
    visuals.imshow(g, abs=1, norm=(0, 2.0), cmap="turbo", borders=False,
                   norm_scaling=0.5, yticks=np.linspace(1, 24, 24),
                   xticks=np.arange(32), show=False)
    plt.close("all")
    visuals.plot(g[0] + 1j * g[1], complex=2, c_annot=True, show=False)
    plt.close("all")
    visuals.plot(g[0], vlines=([4, 8], {"color": "r"}),
                 hlines=(0.5, {"linestyle": "--"}), ticks=(1, 0),
                 xlims=(0, 30), w=0.5, h=0.5, show=False)
    plt.close("all")
    visuals.plots([None, None], [g[0], g[1]], nrows=2, show=False)
    plt.close("all")
    visuals.plotscat(g[0], show=False)
    plt.close("all")
    stats = visuals.hist(g, stats=True, show=False)
    assert len(stats) == 4 and np.isclose(stats[0], g.mean())
    plt.close("all")
    import ssqueeze_rs_tpu as _sq
    wav = _sq.Wavelet.build(("gmw", {"beta": 8.0}))
    sc, vals = visuals.sweep_std_t(wav, N=256, get=True, show=False)
    assert len(sc) == len(vals) > 0
    plt.close("all")
    visuals.viz_cwt_scalebounds(wav, N=256, show=False)
    plt.close("all")
    visuals.wavelet_filterbank(wav, N=256, skips=3,
                               title_append="(skips=3)", show=False)
    plt.close("all")


def test_wavelet_tf_anim_gif_export(tmp_path):
    """wavelet_tf_anim writes an actual gif (reference savepath semantics,
    visuals.py:131-301), with unique-path suffixing on collision."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ssqueeze_rs_tpu import visuals

    p = visuals.wavelet_tf_anim(("gmw", {"beta": 8.0}), N=128,
                                savepath=str(tmp_path / "anim.gif"),
                                testing=True)
    assert p.endswith("anim.gif")
    import os
    assert os.path.getsize(p) > 100
    with open(p, "rb") as f:
        assert f.read(3) == b"GIF"
    # collision -> suffixed
    p2 = visuals.wavelet_tf_anim(("gmw", {"beta": 8.0}), N=128,
                                 savepath=str(tmp_path / "anim.gif"),
                                 testing=True)
    assert p2.endswith("anim1.gif")
    plt.close("all")


def test_visuals_time_domain_centered_and_gates():
    """Time-domain wavelet plots center correctly (psi_time is already
    centered — the extra fftshift un-centered them), plot(abs=True)
    plots magnitude for complex input, imshow(ridge=0) draws no ridge,
    and gdefaults honors default_order (code-review r3)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ssqueeze_rs_tpu import visuals
    from ssqueeze_rs_tpu.config import gdefaults

    # plot(complex y, abs=True) -> ONE magnitude line, not real+imag
    y = np.exp(1j * np.linspace(0, 6, 64))
    plt.close("all")
    visuals.plot(y, abs=True, show=False)
    ax = plt.gcf().axes[0]
    assert len(ax.lines) == 1
    assert np.allclose(ax.lines[0].get_ydata(), np.abs(y))

    # imshow(ridge=0) leaves no scatter
    plt.close("all")
    from matplotlib.collections import PathCollection
    visuals.imshow(np.random.default_rng(0).standard_normal((8, 16)),
                   ridge=0, show=False)
    assert not any(isinstance(c, PathCollection)
                   for a in plt.gcf().axes for c in a.collections)
    plt.close("all")
    visuals.imshow(np.random.default_rng(0).standard_normal((8, 16)),
                   ridge=1, show=False)      # truthy scalar DOES mark maxima
    assert any(isinstance(c, PathCollection)
               for a in plt.gcf().axes for c in a.collections)

    # waveforms render without error after the centering fix
    plt.close("all")
    visuals.wavelet_waveforms("gmw", N=256, scale=8.0, show=False)

    out = gdefaults("gmw", beta=None, gamma=None, default_order=True,
                    as_dict=True)
    assert list(out)[:2] == ["gamma", "beta"]
