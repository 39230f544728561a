"""Visualization helpers (host-side matplotlib; lazy import).

Covers the reference's commonly-used visuals surface
(old/ssqueezepy/visuals.py): generic imshow/plot/scat/hist plus wavelet
introspection (filterbank, waveforms, heatmap, time-frequency summary).
Matplotlib is imported on first use so headless/TPU environments never pay
for it.
"""
from __future__ import annotations

import numpy as np

__all__ = ["imshow", "plot", "scat", "hist", "plots",
           "wavelet_filterbank", "wavelet_waveforms", "wavelet_heatmap",
           "wavelet_tf", "wavelet_tf_anim", "sweep_std_t", "sweep_std_w",
           "sweep_harea", "viz_gmw_orders"]


def _plt():
    import matplotlib
    import matplotlib.pyplot as plt
    return plt


def imshow(data, title=None, show=True, cmap=None, norm=None, abs=False,
           w=None, h=None, ridge=None, yticks=None, xticks=None,
           xlabel=None, ylabel=None, aspect="auto", **kw):
    """2D heatmap (reference: visuals.py imshow)."""
    plt = _plt()
    data = np.asarray(data)
    if abs:
        data = np.abs(data)
        cmap = cmap or "turbo"
    else:
        cmap = cmap or ("bwr" if np.isrealobj(data) else "turbo")
        if np.iscomplexobj(data):
            data = data.real
    if norm is None:
        mx = np.max(np.abs(data))
        vmin, vmax = (0, mx) if abs else (-mx, mx)
    else:
        vmin, vmax = norm
    fig, ax = plt.subplots(figsize=((w or 10), (h or 6)))
    im = ax.imshow(data, cmap=cmap, vmin=vmin, vmax=vmax, aspect=aspect,
                   **kw)
    fig.colorbar(im, ax=ax)
    if ridge is not None:
        ax.plot(np.arange(data.shape[1]), ridge, "r", linewidth=1)
    if title:
        ax.set_title(title, weight="bold", fontsize=14, loc="left")
    if xlabel:
        ax.set_xlabel(xlabel)
    if ylabel:
        ax.set_ylabel(ylabel)
    if show:
        plt.show()
    return fig, ax


def plot(x, y=None, title=None, show=False, vlines=None, hlines=None,
         xlims=None, ylims=None, color=None, **kw):
    """1D line plot (reference: visuals.py plot)."""
    plt = _plt()
    x = np.asarray(x)
    if y is None:
        if np.iscomplexobj(x):
            plt.plot(x.real, color=color or "tab:blue", **kw)
            plt.plot(x.imag, color="tab:orange", **kw)
        else:
            plt.plot(x, color=color, **kw)
    else:
        plt.plot(x, np.asarray(y), color=color, **kw)
    if vlines is not None:
        vl, vkw = vlines if isinstance(vlines, tuple) else (vlines, {})
        plt.axvline(vl, **(vkw if isinstance(vkw, dict) else {}))
    if hlines is not None:
        hl, hkw = hlines if isinstance(hlines, tuple) else (hlines, {})
        plt.axhline(hl, **(hkw if isinstance(hkw, dict) else {}))
    if title:
        plt.title(title, weight="bold", fontsize=14, loc="left")
    if xlims:
        plt.xlim(*xlims)
    if ylims:
        plt.ylim(*ylims)
    if show:
        plt.show()


def plots(xs, titles=None, show=True, **kw):
    for i, x in enumerate(xs):
        plot(x, title=(titles[i] if titles else None), show=False, **kw)
    if show:
        _plt().show()


def scat(x, y=None, title=None, show=False, color=None, s=10, **kw):
    plt = _plt()
    if y is None:
        plt.scatter(np.arange(len(np.asarray(x).squeeze())), x, s=s,
                    color=color, **kw)
    else:
        plt.scatter(x, y, s=s, color=color, **kw)
    if title:
        plt.title(title, weight="bold", fontsize=14, loc="left")
    if show:
        plt.show()


def hist(x, bins=100, title=None, show=True, **kw):
    plt = _plt()
    plt.hist(np.asarray(x).ravel(), bins=bins, **kw)
    if title:
        plt.title(title, weight="bold", fontsize=14, loc="left")
    if show:
        plt.show()


# -- wavelet visuals -------------------------------------------------------
def wavelet_filterbank(wavelet, N=1024, scales="log", show=True):
    """Overlay of freq-domain wavelets across scales
    (reference: visuals.py wavelet_filterbank)."""
    from .wavelets.base import Wavelet
    from .scales import process_scales
    plt = _plt()
    plt.figure()
    wavelet = Wavelet.build(wavelet)
    scales = process_scales(scales, N, wavelet)
    Psih = np.asarray(wavelet.sample(scales.squeeze(-1), N, xp=np))
    for p in Psih[::max(1, len(Psih) // 32)]:
        plt.plot(p[:N // 2])
    plt.title(f"{wavelet.name} filterbank | N={N}", weight="bold",
              loc="left")
    if show:
        plt.show()


def wavelet_waveforms(wavelet, N=1024, scale=10.0, show=True):
    """Time & freq domain waveforms at one scale
    (reference: visuals.py wavelet_waveforms)."""
    from .wavelets.base import Wavelet
    plt = _plt()
    wavelet = Wavelet.build(wavelet)
    psih = np.asarray(wavelet.sample(float(scale), N, xp=np))
    psi = np.asarray(wavelet.psi_time(float(scale), N, xp=np))
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    axes[0].plot(psih[:N // 2])
    axes[0].set_title("freq domain (pos half)")
    axes[1].plot(np.fft.fftshift(psi).real)
    axes[1].plot(np.fft.fftshift(psi).imag)
    axes[1].set_title("time domain")
    if show:
        plt.show()


def wavelet_heatmap(wavelet, N=1024, scales="log", show=True):
    """All-scales heatmaps (reference: visuals.py wavelet_heatmap)."""
    from .wavelets.base import Wavelet
    from .scales import process_scales
    wavelet = Wavelet.build(wavelet)
    scales = process_scales(scales, N, wavelet)
    Psih = np.asarray(wavelet.sample(scales.squeeze(-1), N, xp=np))
    imshow(Psih[:, :N // 2], abs=True, show=show,
           title=f"{wavelet.name} filterbank heatmap")


def wavelet_tf(wavelet, N=1024, scale=None, show=True):
    """Time-frequency joint summary of a wavelet
    (reference: visuals.py wavelet_tf)."""
    from .wavelets.base import Wavelet
    wavelet = Wavelet.build(wavelet)
    scale = scale or wavelet.scalec_ct
    wavelet_waveforms(wavelet, N, scale, show=show)


def _sweep(wavelet, prop, N=1024, scales="log", show=True):
    """Plot a wavelet property (std_t / std_w / harea) across scales
    (reference: visuals.py sweep_std_t/sweep_std_w/sweep_harea)."""
    from .wavelets.base import Wavelet
    from .scales import process_scales
    plt = _plt()
    wavelet = Wavelet.build(wavelet)
    plt.figure()
    sc_all = process_scales(scales, N, wavelet).squeeze(-1)
    sc, vals = [], []
    for s in sc_all[::max(1, len(sc_all) // 64)]:
        try:
            vals.append(getattr(wavelet, prop)(float(s), N))
            sc.append(float(s))
        except Exception:
            continue  # scale's support exceeds N: no decay span exists
    plt.plot(sc, vals)
    plt.xscale("log")
    plt.xlabel("scale")
    plt.title(f"{wavelet.name} {prop} vs scale | N={N}", weight="bold",
              loc="left")
    if show:
        plt.show()


def sweep_std_t(wavelet, N=1024, scales="log", show=True):
    """(reference: visuals.py sweep_std_t)"""
    _sweep(wavelet, "std_t", N, scales, show)


def sweep_std_w(wavelet, N=1024, scales="log", show=True):
    """(reference: visuals.py sweep_std_w)"""
    _sweep(wavelet, "std_w", N, scales, show)


def sweep_harea(wavelet, N=1024, scales="log", show=True):
    """(reference: visuals.py sweep_harea)"""
    _sweep(wavelet, "harea", N, scales, show)


def wavelet_tf_anim(wavelet, N=1024, scales=None, n_frames=5, show=True):
    """Frame-by-frame time-frequency views across scales (the reference's
    animation, visuals.py wavelet_tf_anim, rendered as static frames)."""
    from .wavelets.base import Wavelet
    wavelet = Wavelet.build(wavelet)
    if scales is None:
        sc = np.logspace(np.log10(2.0), np.log10(N / 8), n_frames)
    else:
        sc = np.asarray(scales).squeeze()[:: max(1, len(scales) // n_frames)]
    for s in sc:
        wavelet_waveforms(wavelet, N, float(s), show=show)


def viz_gmw_orders(N=1024, orders=(0, 1, 2), gamma=3.0, beta=60.0,
                   scale=10.0, show=True):
    """(reference: visuals.py viz_gmw_orders)"""
    from .wavelets.base import Wavelet
    plt = _plt()
    plt.figure()
    for k in orders:
        wav = Wavelet.build(("gmw", dict(gamma=gamma, beta=beta,
                                         order=int(k))))
        psih = np.asarray(wav.sample(float(scale), N, xp=np))
        plt.plot(psih[:N // 2], label=f"order {k}")
    plt.legend()
    plt.title("GMW orders", weight="bold", loc="left")
    if show:
        plt.show()
