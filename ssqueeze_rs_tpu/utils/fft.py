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


class FFT:
    """Stateful FFT backend object — reference `FFT`/`FFT_GLOBAL` parity
    (old/ssqueezepy/utils/fft_utils.py:40-216).

    The reference object selects scipy vs pyFFTW-with-wisdom by
    `patience` and persists FFTW plans ("wisdom") to `wisdom_dir`. This
    framework has ONE backend — XLA — whose analog of plan persistence
    is the compiled-executable cache, so:

      * `patience = 0` (default): plain jnp.fft calls; XLA still plans
        and caches per (shape, dtype) within the process.
      * `patience >= 1` (or `(patience, planning_timelimit)` tuple):
        enables the PERSISTENT compilation cache in `wisdom_dir`
        (config.enable_persistent_cache) so plans survive restarts —
        the wisdom analog. The FFTW_PATIENT/EXHAUSTIVE planning tiers
        have no XLA counterpart (documented divergence: values 1 and 2
        behave identically here).
      * `threads` / `cache_fft_objects` / `astensor` are accepted for
        signature parity and ignored (XLA owns threading; outputs are
        jax Arrays — the `astensor=True` sense — and numpy-convertible).
      * `load_wisdom`/`save_wisdom` map to enabling the cache / no-op
        (XLA writes its cache on compile, not on demand).
    """

    def __init__(self, planning_timelimit=120, wisdom_dir=None,
                 threads=None, patience=0, cache_fft_objects=False,
                 verbose=1):
        self.planning_timelimit = planning_timelimit
        self.wisdom_dir = wisdom_dir
        self._user_threads = threads
        self.cache_fft_objects = cache_fft_objects
        self.verbose = verbose
        self._cache_dir = None
        self._patience = 0
        self.patience = patience

    @property
    def threads(self):
        # XLA owns device threading; report the reference's "explicit or
        # all cores" convention for introspection parity
        if self._user_threads is None:
            import multiprocessing
            return multiprocessing.cpu_count()
        return self._user_threads

    @property
    def patience(self):
        return self._patience

    @patience.setter
    def patience(self, value):
        # reference semantics: a tuple also sets planning_timelimit
        # (fft_utils.py:146-153)
        if isinstance(value, tuple):
            if len(value) != 2 or value[0] == 0:
                raise ValueError("tuple `patience` must be "
                                 "(patience != 0, planning_timelimit); "
                                 f"got {value!r}")
            value, self.planning_timelimit = value
        if value not in (0, 1, 2):
            raise ValueError(f"`patience` must be 0, 1, or 2 (got "
                             f"{value!r})")
        self._patience = value
        if value:
            self.load_wisdom()

    def load_wisdom(self):
        """Enable the persistent XLA executable cache (wisdom analog)."""
        from ..config import enable_persistent_cache
        kw = {} if self.wisdom_dir is None else dict(
            directory=self.wisdom_dir)
        self._cache_dir = enable_persistent_cache(**kw)
        if self.verbose:
            print(f"[ssqueeze_rs_tpu] persistent XLA cache (wisdom "
                  f"analog) at {self._cache_dir}")
        return self._cache_dir

    def save_wisdom(self):
        """No-op: XLA writes its cache at compile time (the reference
        writes wisdom files after each pyFFTW use)."""
        return self._cache_dir

    def _patience_arg(self, patience):
        if patience is not None and patience != self._patience:
            self.patience = patience

    def fft(self, x, axis=-1, patience=None, astensor=False):
        self._patience_arg(patience)
        return fft(x, axis=axis)

    def rfft(self, x, axis=-1, patience=None, astensor=False):
        self._patience_arg(patience)
        return rfft(x, axis=axis)

    def ifft(self, x, axis=-1, patience=None, astensor=False):
        self._patience_arg(patience)
        return ifft(x, axis=axis)

    def irfft(self, x, axis=-1, patience=None, astensor=False, n=None):
        self._patience_arg(patience)
        return irfft(x, n=n, axis=axis)

    def fftshift(self, x, axes=-1, astensor=False):
        return fftshift(x, axes=axes)

    def ifftshift(self, x, axes=-1, astensor=False):
        return ifftshift(x, axes=axes)


FFT_GLOBAL = FFT()
