"""Phase transforms (instantaneous frequency estimates).

Pure elementwise jnp — free on the VPU; the reference needed numba/CUDA
kernels for these (old/ssqueezepy/algos.py:706-857). The fused
phase+bin+scatter path lives in ssqueeze.py / reassign kernels; these
standalone versions exist for API parity (`get_w=True`) and testing.

    w_cwt[a,b]  = |Im(dWx/Wx) / 2pi|            (inf where |Wx| < gamma)
    w_stft[a,b] = |Sfs[a] - Im(dSx/Sx) / 2pi|   (inf where |Sx| < gamma)

computed as (B*C - A*D) / ((C^2 + D^2) * 2pi) with A,B = Re,Im(dWx),
C,D = Re,Im(Wx) — the reference's exact arithmetic.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import EPS32, EPS64

__all__ = ["phase_cwt", "phase_stft", "phase_cwt_num"]

_TWO_PI = 6.283185307179586


def _imag_ratio_over_2pi(Wx, dWx):
    A, B = dWx.real, dWx.imag
    C, D = Wx.real, Wx.imag
    return (B * C - A * D) / ((C**2 + D**2) * _TWO_PI)


def phase_cwt(Wx, dWx, difftype="trig", gamma=None):
    """CWT phase transform (reference parity: _ssq_cwt.py:420-509).

    `difftype='phase'` (forward-difference of unwrapped angle) is supported
    for parity but inferior; 'trig' recommended.
    """
    if gamma is None:
        gamma = np.sqrt(EPS64 if Wx.dtype == jnp.complex128 else EPS32)

    if difftype == "trig":
        w = jnp.abs(_imag_ratio_over_2pi(Wx, dWx))
        return jnp.where(jnp.abs(Wx) < gamma, jnp.inf, w)
    elif difftype == "phase":
        u = jnp.unwrap(jnp.angle(Wx), axis=-1)
        w = jnp.concatenate([jnp.diff(u, axis=-1),
                             (u[..., -1:] - u[..., :1])], axis=-1) / (2 * np.pi)
        w = jnp.abs(w)
        return jnp.where(jnp.abs(Wx) < gamma, jnp.inf, w)
    raise ValueError(f"unsupported `difftype` '{difftype}'; must be one of "
                     "'trig', 'phase'.")


def phase_stft(Sx, dSx, Sfs, gamma=None):
    """STFT phase transform (reference parity: _ssq_stft.py:201-246)."""
    if gamma is None:
        gamma = 10 * (EPS64 if Sx.dtype == jnp.complex128 else EPS32)
    Sfs = jnp.asarray(Sfs)
    w = jnp.abs(Sfs[:, None] - _imag_ratio_over_2pi(Sx, dSx))
    return jnp.where(jnp.abs(Sx) < gamma, jnp.inf, w)


def phase_cwt_num(Wx, dt, difforder=4, gamma=None):
    """Numerically-differentiated phase transform
    (reference parity: _ssq_cwt.py:512-589)."""
    if difforder not in (1, 2, 4):
        raise ValueError(f"`difforder` must be one of: 1, 2, 4 (got {difforder})")

    if difforder in (2, 4):
        Wxr = jnp.concatenate([Wx[..., -2:], Wx, Wx[..., :2]], axis=-1)

    if difforder == 1:
        w = jnp.concatenate([Wx[..., 1:] - Wx[..., :-1],
                             Wx[..., :1] - Wx[..., -1:]], axis=-1) / dt
    elif difforder == 2:
        w = (-Wxr[..., 4:] + 4 * Wxr[..., 3:-1] - 3 * Wxr[..., 2:-2]) / (2 * dt)
    else:
        w = (-Wxr[..., 4:] + 8 * Wxr[..., 3:-1]
             - 8 * Wxr[..., 1:-3] + Wxr[..., :-4]) / (12 * dt)

    w = jnp.real(-1j * w / Wx) / (2 * np.pi)
    # reference idiom is falsy `gamma or default` (gamma=0.0 -> default,
    # kept for parity) — but only for concrete scalars: a traced gamma
    # must not hit a Python bool
    if gamma is None or (isinstance(gamma, (int, float)) and not gamma):
        gamma = 10 * (EPS64 if Wx.dtype == jnp.complex128 else EPS32)
    w = jnp.where(jnp.abs(Wx) < gamma, jnp.inf, w)
    return jnp.abs(w)
