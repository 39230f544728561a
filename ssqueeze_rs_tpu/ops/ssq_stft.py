"""Synchrosqueezed STFT (forward + inverse).

Reference parity: old/ssqueezepy/_ssq_stft.py. The reassignment uses the
analytic linear-bin closed form (never the O(bins^2) argmin of
rust/src/spectral/ssq_stft.rs:280-289).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import EPS32, EPS64
from ..scales import process_fs_and_t, infer_scaletype
from ..utils.common import WARN
from ..utils.windows import get_window, check_nola
from .stft import stft
from .phase import phase_stft
from .ssqueeze import ssqueeze, check_ssqueezing_args
from .ssq_cwt import _process_component_inversion_args, _invert_components

__all__ = ["ssq_stft", "issq_stft", "make_Sfs"]


def make_Sfs(Sx, fs):
    """Row frequencies of Sx: linspace(0, fs/2, n_rows)
    (reference: _ssq_stft.py:249-257)."""
    n_rows = Sx.shape[-2]
    dtype = np.float32 if Sx.dtype == jnp.complex64 else np.float64
    return np.linspace(0, 0.5 * fs, n_rows, dtype=dtype)


def ssq_stft(x, window=None, n_fft=None, win_len=None, hop_len=1, fs=None,
             t=None, modulated=True, ssq_freqs=None, padtype="reflect",
             squeezing="sum", gamma=None, preserve_transform=None, dtype=None,
             astensor=True, flipud=False, get_w=False, get_dWx=False):
    """Synchrosqueezed STFT (reference parity: _ssq_stft.py:13-136).

    Returns (Tx, Sx, ssq_freqs, Sfs[, w][, dSx]).

    TPU perf note (banded scatter, default ON via
    SSQ_TPU_REASSIGN_BAND): signals whose phase estimates concentrate
    per time tile (long tones, chirps, denoised signals) take a banded
    fast path ~1.8x faster than the full scatter. SHORT OFF-BIN tones
    at the default gamma scatter w across leakage bins and silently
    take the (correct, full-speed-baseline) fallback — raising `gamma`
    to mask the leakage (e.g. ~1e-3 for unit-amplitude signals, the
    denoising regime) restores banding. Output is bitwise-identical
    either way.
    """
    _, fs, _ = process_fs_and_t(fs, t, jnp.shape(x)[-1])
    check_ssqueezing_args(squeezing)
    if (isinstance(ssq_freqs, (np.ndarray, jnp.ndarray)) and
            infer_scaletype(np.asarray(ssq_freqs))[0] != "linear"):
        raise ValueError("`ssq_freqs` must be linearly distributed for "
                         "`ssq_stft`")

    from ..config import DEFAULTS, use_pallas_kernels
    from .stft import MATMUL_NFFT_MAX
    from .stft_pallas import ssq_stft_fused_ok
    N = jnp.shape(x)[-1]
    n_fft_eff = int(n_fft or min(N // hop_len, 512))
    planar = (str(dtype or DEFAULTS["dtype"]) == "float32" and
              n_fft_eff <= MATMUL_NFFT_MAX and squeezing == "sum" and
              not get_w)
    import jax

    # whole-pipeline fused kernel: frames + DFT + phase + bin + scatter
    # in ONE Pallas kernel — the Sx/dSx planes never round-trip HBM
    # between the STFT and the squeezing (ops/stft_pallas.py)
    mega = (planar and hop_len == 1 and not get_dWx and ssq_freqs is None
            and use_pallas_kernels() and
            ssq_stft_fused_ok(n_fft_eff, N + n_fft_eff - 1))
    if mega:
        return _ssq_stft_mega(x, window, n_fft_eff, win_len, fs, modulated,
                              padtype, gamma, dtype, flipud)
    # keep the MXU matmul and the reassignment kernel in separate XLA
    # computations: fusing the matmul's output transforms into the Pallas
    # operand prep regresses the matmul ~10x
    if planar:
        # planes from the MXU matmul feed the Pallas kernel directly —
        # dSx is never materialized as complex64
        sxp, dsp = stft(x, window, n_fft=n_fft_eff, win_len=win_len,
                        hop_len=hop_len, fs=fs, padtype=padtype,
                        modulated=modulated, derivative=True, dtype=dtype,
                        planar_out=True)
        sxp, dsp = jax.lax.optimization_barrier((sxp, dsp))
        Sx = jax.lax.complex(*sxp)
        dSx = jax.lax.complex(*dsp) if get_dWx else dsp
    else:
        sxp = None
        Sx, dSx = stft(x, window, n_fft=n_fft_eff, win_len=win_len,
                       hop_len=hop_len, fs=fs, padtype=padtype,
                       modulated=modulated, derivative=True, dtype=dtype)
        Sx, dSx = jax.lax.optimization_barrier((Sx, dSx))

    Sfs = make_Sfs(Sx, fs)
    if gamma is None:
        gamma = 10 * (EPS64 if Sx.dtype == jnp.complex128 else EPS32)

    if get_w:
        w = phase_stft(Sx, dSx, Sfs, gamma)
        _dSx = None
    else:
        w = None
        _dSx = dSx

    if ssq_freqs is None:
        ssq_freqs = Sfs
    Tx, ssq_freqs = ssqueeze(Sx, w, squeezing=squeezing, ssq_freqs=ssq_freqs,
                             Sfs=Sfs, flipud=flipud, gamma=gamma, dWx=_dSx,
                             maprange="maximal", transform="stft",
                             wx_planes=sxp)

    if get_w and get_dWx:
        return Tx, Sx, ssq_freqs, Sfs, w, dSx
    elif get_w:
        return Tx, Sx, ssq_freqs, Sfs, w
    elif get_dWx:
        return Tx, Sx, ssq_freqs, Sfs, dSx
    return Tx, Sx, ssq_freqs, Sfs


def _ssq_stft_mega(x, window, n_fft, win_len, fs, modulated, padtype,
                   gamma, dtype, flipud):
    """Fully fused ssq_stft fast path (one Pallas kernel; hop=1, sum
    squeezing, default ssq_freqs). Host planning mirrors the generic
    path exactly: same window/DFT matrices, same plan_reassignment."""
    from ..utils.pad import padsignal
    from .stft import _dft_matrix
    from .stft_pallas import ssq_stft_fused
    from .ssqueeze import plan_reassignment

    N = jnp.shape(x)[-1]
    if win_len is None:
        win_len = (len(window)
                   if isinstance(window, (np.ndarray, jnp.ndarray))
                   else n_fft)
    window, diff_window = get_window(window, int(win_len), n_fft,
                                     derivative=True, dtype="float32")
    check_nola(window, 1)
    F1 = _dft_matrix(window, n_fft, modulated)
    F2 = _dft_matrix(diff_window, n_fft, modulated)
    K_T = np.ascontiguousarray(np.concatenate(
        [F1.real, F1.imag, F2.real, F2.imag], axis=1).T).astype(np.float32)

    nf = n_fft // 2 + 1
    # same grid rule as make_Sfs (planar mega path is f32)
    Sfs = make_Sfs(np.empty((nf, 0), dtype=np.complex64), fs)
    const_arr, mode, params = plan_reassignment(Sfs, nf, False,
                                                transform="stft")
    const_arr = np.broadcast_to(np.asarray(const_arr, np.float32), (nf,))
    if gamma is None:
        gamma = 10 * EPS32

    xx = jnp.asarray(x).astype("float32")
    xp = padsignal(xx, padtype, padlength=N + n_fft - 1)
    Tx, Sx = ssq_stft_fused(xp, K_T, n_fft, N, fs, Sfs, const_arr,
                            float(gamma), params, mode, bool(flipud))
    ssq_freqs_out = Sfs[::-1] if flipud else Sfs
    return Tx, Sx, ssq_freqs_out, Sfs


def issq_stft(Tx, window=None, cc=None, cw=None, n_fft=None, win_len=None,
              hop_len=1, modulated=True):
    """Inverse synchrosqueezed STFT (reference parity: _ssq_stft.py:139-198).

    x = (2 / window[center]) * sum_rows Re(Tx); requires hop_len=1 and
    modulated STFT.

    NOTE (reference quirk, faithfully reproduced): the forward ssq_stft's
    Tx scales with `fs` (its reassignment constant is the ssq-frequency
    spacing in Hz, ssqueezing.py:134), while this inversion assumes the
    fs=1 normalization — reconstruct from a transform taken with fs=1,
    or divide the result by `fs`.
    """
    if not modulated:
        raise ValueError("inversion with `modulated == False` is unsupported.")
    if hop_len != 1:
        raise ValueError("inversion with `hop_len != 1` is unsupported.")

    cc, cw, full_inverse = _process_component_inversion_args(cc, cw)
    n_fft = int(n_fft or (jnp.shape(Tx)[-2] - 1) * 2)
    win_len = int(win_len or n_fft)

    window = get_window(window, win_len, n_fft=n_fft)
    check_nola(window, hop_len)
    if abs(np.argmax(window) - len(window) // 2) > 1:
        WARN("`window` maximum not centered; results may be inaccurate.")

    if full_inverse:
        x = jnp.asarray(Tx).real.sum(axis=-2)
    else:
        x = _invert_components(Tx, cc, cw)
    return x * (2 / window[len(window) // 2])
