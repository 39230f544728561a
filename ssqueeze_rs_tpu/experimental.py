"""Scale <-> frequency conversion utilities (host-side).

Reference parity: old/ssqueezepy/experimental.py:15-142.
"""
from __future__ import annotations

import warnings

import numpy as np

from .scales import cwt_scalebounds
from .utils.pad import p2up
from .wavelets.base import Wavelet
from .wavelets.props import center_frequency

__all__ = ["freq_to_scale", "scale_to_freq"]


def freq_to_scale(freqs, wavelet, N, fs=1, n_search_scales=None, kind="peak",
                  base=2):
    """Approximate frequencies -> scales via center-frequency search
    (reference: experimental.py:15-82)."""
    def log(x):
        return np.log(x) / np.log(base)

    freqs = np.asarray(freqs) / fs
    assert np.all(freqs >= 0), "frequencies must be positive"
    assert freqs.max() <= 0.5, "max frequency must be 0.5"
    assert freqs.max() == freqs[-1], "max frequency must be last sample"
    assert freqs.min() == freqs[0], "min frequency must be first sample"

    wavelet = Wavelet.build(wavelet)
    M = len(freqs)
    if n_search_scales is None:
        n_search_scales = 10 * M
    smin, smax = cwt_scalebounds(wavelet, N, preset="maximal",
                                 use_padded_N=False)
    search_scales = np.logspace(log(smin), log(smax), n_search_scales,
                                base=base)

    f_from_scales = np.array([
        min(max(center_frequency(wavelet, float(s), N, kind=kind), 0), np.pi)
        for s in search_scales]) / (2 * np.pi)

    fmin, fmax = freqs.min(), freqs.max()
    smax = search_scales[np.argmin(np.abs(f_from_scales - fmin))]
    smin = search_scales[np.argmin(np.abs(f_from_scales - fmax))]
    return np.logspace(log(smax), log(smin), M, base=base)


def scale_to_freq(scales, wavelet, N, fs=1, padtype="reflect"):
    """Scales -> frequencies via freq-domain wavelet peak bin
    (reference: experimental.py:85-142)."""
    if isinstance(scales, float):
        scales = np.array([scales])
    scales = np.asarray(scales).squeeze()
    if scales.ndim == 0:
        scales = scales[None]
    wavelet = Wavelet.build(wavelet)

    Npad = p2up(N)[0] if padtype is not None else N
    psis = np.asarray(wavelet.sample(scales, Npad, xp=np, nohalf=True))
    idxs = np.argmax(psis, axis=-1)

    if np.any(idxs > Npad // 2) or 0 in idxs:
        warnings.warn("found potentially ill-behaved wavelets (peak indices "
                      "at negative freqs or at dc); will round idxs to 1 or "
                      "N/2")
        n_psis = len(psis)
        for i, ix in enumerate(idxs):
            if ix > Npad // 2 or ix == 0:
                idxs[i] = 1 if i > n_psis // 2 else Npad // 2

    freqs = idxs / Npad
    assert freqs.min() >= 0, freqs.min()
    assert freqs.max() <= 0.5, freqs.max()
    return freqs * fs
