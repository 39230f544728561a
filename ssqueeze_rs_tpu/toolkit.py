"""Misc user toolkit (reference parity: old/ssqueezepy/toolkit.py)."""
from __future__ import annotations

import numpy as np

from .utils.common import mad_rms  # noqa: F401  (canonical error metric)

__all__ = ["lin_band", "cos_f", "sin_f", "mad_rms", "where_amax"]


def _t(tmin, tmax, N, endpoint=False):
    return np.linspace(tmin, tmax, N, endpoint=endpoint)


def lin_band(Tx, slope, offset, bw=0.025, viz=False, **kw):
    """Linear curve band (centers + widths) over the TF plane for component
    inversion (reference: toolkit.py:7-20; visuals optional here)."""
    Tx = np.asarray(Tx)
    na, N = Tx.shape[-2:]
    tcs = np.linspace(0, 1, N)
    Cs = slope * (tcs + offset) * na
    freqband = bw * na * np.ones(N)
    Cs, freqband = Cs.astype("int32"), freqband.astype("int32")
    if viz:
        from .visuals import imshow, plot
        imshow(Tx, abs=1, aspect="auto", show=0, **kw)
        plot(Cs + freqband, color="r")
        plot(Cs - freqband, color="r", show=1)
    return Cs, freqband


def cos_f(freqs, N=128, phi=0, endpoint=False):
    """Adjacent different-frequency cosines."""
    return np.concatenate(
        [np.cos(2 * np.pi * f * (_t(i, i + 1, N, endpoint) + phi))
         for i, f in enumerate(freqs)])


def sin_f(freqs, N=128, phi=0, endpoint=False):
    """Adjacent different-frequency sines."""
    return np.concatenate(
        [np.sin(2 * np.pi * f * (_t(i, i + 1, N, endpoint) + phi))
         for i, f in enumerate(freqs)])


def where_amax(x):
    """N-dim indices where |x| == max|x|."""
    x = np.asarray(x)
    return np.where(np.abs(x) == np.abs(x).max())
