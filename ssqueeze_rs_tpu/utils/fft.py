"""DFT frequency grids.

The radian DFT grid used throughout the reference, with the analytic-signal
convention of a *positive* Nyquist bin (reference: old/ssqueezepy/wavelets.py
``_xifn``, lines 472-483; rust/src/wavelets/base.rs:18-33):

    N=128: [0, 1, ..., 64, -63, ..., -1] * (2*pi/N) * scale
    N=129: [0, 1, ..., 64, -64, ..., -1] * (2*pi/N) * scale

Note this differs from ``fftfreq`` only in the sign of the Nyquist bin for
even N.
"""
from __future__ import annotations

import numpy as np


def xifn(scale, N, xp=None, dtype=None):
    """Radian frequency grid, `scale * 2*pi*k/N` with positive Nyquist.

    `xp` selects the array backend (numpy for host planning, jax.numpy for
    traced code). Returns a 1D array of length N.
    """
    if xp is None:
        xp = np
    if dtype is None:
        dtype = xp.float64 if xp is np else None
    i = xp.arange(N)
    k = xp.where(i <= N // 2, i, i - N)
    xi = k * (2 * np.pi / N)
    xi = xi * scale
    if dtype is not None:
        xi = xi.astype(dtype)
    return xi


def aifftshift_idx(N):
    """Analytic ifftshift as an index permutation: moves the left N//2+1 bins
    to the right (reference: old/ssqueezepy/wavelets.py:950-963). Turns the
    `xifn` grid into a monotonically ascending -pi..pi grid.

    For odd N equals np.fft.ifftshift's permutation; for even N differs
    because the Nyquist bin is filed as positive.
    """
    if N % 2 == 1:
        return np.fft.ifftshift(np.arange(N))
    return np.concatenate([np.arange(N // 2 + 1, N), np.arange(N // 2 + 1)])


def afftshift_idx(N):
    """Inverse of `aifftshift_idx`: moves the right N//2+1 bins to the left
    (reference: old/ssqueezepy/wavelets.py:931-947)."""
    if N % 2 == 1:
        return np.fft.fftshift(np.arange(N))
    return np.concatenate([np.arange(N // 2 - 1, N), np.arange(N // 2 - 1)])


def afftshift(xh, xp=np):
    """Analytic fftshift: moves the right N//2+1 bins (Nyquist filed
    POSITIVE, the analytic-wavelet convention) to the left
    (reference parity: wavelets.py:931-948)."""
    xh = xp.asarray(xh)
    return xh[..., afftshift_idx(xh.shape[-1])]


def aifftshift(xh, xp=np):
    """Inverse of `afftshift` (reference parity: wavelets.py:951-963)."""
    xh = xp.asarray(xh)
    return xh[..., aifftshift_idx(xh.shape[-1])]


# -- FFT entry points (reference fft_utils.py API parity) ---------------------
# The reference routes every transform through a global backend object
# (scipy / pyfftw-with-wisdom / torch, old/ssqueezepy/utils/
# fft_utils.py:26-133). Here there is ONE backend — XLA — so these are
# jnp.fft delegations under the reference's names; plan persistence is
# config.enable_persistent_cache (the wisdom analog). Kept thin so
# reference code importing `from ssqueezepy.utils import fft, ifft, ...`
# ports by renaming the package.
def fft(x, axis=-1, **kw):
    import jax.numpy as jnp
    return jnp.fft.fft(jnp.asarray(x), axis=axis)


def rfft(x, axis=-1, **kw):
    import jax.numpy as jnp
    return jnp.fft.rfft(jnp.asarray(x), axis=axis)


def ifft(x, axis=-1, **kw):
    import jax.numpy as jnp
    return jnp.fft.ifft(jnp.asarray(x), axis=axis)


def irfft(x, n=None, axis=-1, **kw):
    import jax.numpy as jnp
    return jnp.fft.irfft(jnp.asarray(x), n=n, axis=axis)


def fftshift(x, axes=-1):
    # reference default axes=-1 (fft_utils.py:210-216): shifting ALL
    # axes of a 2D transform would scramble the scale/frequency axis
    import jax.numpy as jnp
    return jnp.fft.fftshift(jnp.asarray(x), axes=axes)


def ifftshift(x, axes=-1):
    import jax.numpy as jnp
    return jnp.fft.ifftshift(jnp.asarray(x), axes=axes)
