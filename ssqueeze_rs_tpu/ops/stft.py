"""Short-Time Fourier Transform, forward & inverse (TPU-native).

Design (vs reference old/ssqueezepy/_stft.py + utils/stft_utils.py):
  * framing is one strided gather -> (..., n_segs, n_fft) tensor; the whole
    transform is a single batched `rfft` (replaces Rayon frame loop,
    rust/src/spectral/stft.rs:47-78, and numba `buffer`),
  * the "modulated" (modified-STFT) variant is an `ifftshift` along the frame
    axis — per-hop DFT cisoid centering (reference: _stft.py:84-96),
  * inverse uses Griffin-Lim least-squares overlap-add with window^win_exp
    and the Sigma w^(exp+1) normalization (reference: _stft.py:184-256),
  * all shape-dependent planning is static; inner functions are jit-compiled
    per (shape, n_fft, hop) and cached by JAX.

Orientation matches the reference: rows = frequencies, cols = time
(Sx shape (..., n_fft//2+1, n_segs)).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULTS
from ..scales import process_fs_and_t
from ..utils.pad import pad_params, padsignal
from ..utils.windows import get_window, window_norm, check_nola

__all__ = ["stft", "istft", "stft_core", "get_window", "overlap_add"]


def frame_signal(xp, n_fft: int, hop_len: int):
    """Strided framing: (..., L) -> (..., n_segs, n_fft)."""
    L = xp.shape[-1]
    n_segs = (L - n_fft) // hop_len + 1
    starts = jnp.arange(n_segs) * hop_len
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return xp[..., idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_len", "modulated",
                                   "derivative"))
def stft_core(xp, window, diff_window, fs, *, n_fft, hop_len, modulated,
              derivative):
    """STFT of an already-padded signal (time = last axis).

    Returns Sx (and dSx if `derivative`) with shape (..., n_freqs, n_segs).
    """
    frames = frame_signal(xp, n_fft, hop_len)

    def _one(win, scale=None):
        fw = frames * win
        if modulated:
            fw = jnp.fft.ifftshift(fw, axes=-1)
        S = jnp.fft.rfft(fw, axis=-1)
        if scale is not None:
            S = S * scale
        return jnp.swapaxes(S, -1, -2)

    Sx = _one(window)
    if derivative:
        dSx = _one(diff_window, scale=fs)
        return Sx, dSx
    return Sx, None


def stft(x, window=None, n_fft=None, win_len=None, hop_len=1, fs=None, t=None,
         padtype="reflect", modulated=True, derivative=False, dtype=None):
    """Short-Time Fourier Transform (reference parity: _stft.py:13-181).

    `x`: array, time on last axis; arbitrary leading batch/channel dims.
    Returns `Sx` [(..., n_fft//2+1, n_hops)], plus `dSx` if `derivative`.
    """
    x = jnp.asarray(x)
    N = x.shape[-1]
    _, fs, _ = process_fs_and_t(fs, t, N)
    n_fft = int(n_fft or min(N // hop_len, 512))

    if win_len is None:
        win_len = (len(window) if isinstance(window, (np.ndarray, jnp.ndarray))
                   else n_fft)
    dtype = dtype or DEFAULTS["dtype"]
    window, diff_window = get_window(window, win_len, n_fft, derivative=True,
                                     dtype=dtype)
    check_nola(window, hop_len)

    x = x.astype(dtype)
    padlength = N + n_fft - 1
    xp = padsignal(x, padtype, padlength=padlength)

    Sx, dSx = stft_core(xp, jnp.asarray(window), jnp.asarray(diff_window),
                        jnp.asarray(fs, dtype=dtype), n_fft=n_fft,
                        hop_len=hop_len, modulated=modulated,
                        derivative=derivative)
    return (Sx, dSx) if derivative else Sx


def overlap_add(xbuf, window, hop_len: int, n_fft: int, out_len: int,
                win_exp: int = 1):
    """Overlap-add columns of xbuf (..., n_fft, n_segs) into (..., out_len).

    Deterministic scatter-add (XLA lowers to a single fused scatter);
    reference: utils/stft_utils.py:141-181.
    """
    if win_exp == 0:
        w = jnp.ones_like(window)
    elif win_exp == 1:
        w = window
    else:
        w = window ** win_exp
    n_segs = xbuf.shape[-1]
    vals = jnp.swapaxes(xbuf, -1, -2) * w  # (..., n_segs, n_fft)
    idx = (jnp.arange(n_segs) * hop_len)[:, None] + jnp.arange(n_fft)[None, :]
    out_shape = xbuf.shape[:-2] + (out_len,)
    return jnp.zeros(out_shape, vals.dtype).at[..., idx].add(vals)


@partial(jax.jit, static_argnames=("n_fft", "hop_len", "N", "modulated",
                                   "win_exp"))
def istft_core(Sx, window, wn, *, n_fft, hop_len, N, modulated, win_exp):
    xbuf = jnp.fft.irfft(Sx, n=n_fft, axis=-2)
    if modulated:
        xbuf = jnp.fft.fftshift(xbuf, axes=-2)

    x = overlap_add(xbuf, window, hop_len, n_fft, N + n_fft - 1, win_exp)

    tiny = jnp.finfo(x.dtype).tiny
    x = jnp.where(wn > tiny, x / jnp.where(wn > tiny, wn, 1), x)

    # unpad: x[n_fft//2 : -(n_fft-1)//2]
    return x[..., n_fft // 2: (N + n_fft - 1) - (n_fft - 1) // 2]


def istft(Sx, window=None, n_fft=None, win_len=None, hop_len=1, N=None,
          modulated=True, win_exp=1):
    """Inverse STFT, Griffin-Lim least-squares for win_exp=1
    (reference parity: _stft.py:184-256). Supports leading batch dims."""
    Sx = jnp.asarray(Sx)
    n_fft = int(n_fft or (Sx.shape[-2] - 1) * 2)
    win_len = int(win_len or n_fft)
    N = int(N or hop_len * Sx.shape[-1])
    dtype = "float32" if Sx.dtype == jnp.complex64 else "float64"

    window = get_window(window, win_len, n_fft=n_fft, dtype=dtype)
    check_nola(window, hop_len)
    wn = window_norm(window, hop_len, n_fft, N, win_exp)

    return istft_core(Sx, jnp.asarray(window), jnp.asarray(wn), n_fft=n_fft,
                      hop_len=hop_len, N=N, modulated=modulated,
                      win_exp=win_exp)
