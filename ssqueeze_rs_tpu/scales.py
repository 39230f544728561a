"""CWT scale generation & scale<->frequency mapping (host-side planning).

Faithful re-implementation of the reference scales engine
(old/ssqueezepy/utils/cwt_utils.py:66-457,630-696) — these heuristics define
output compatibility. Everything here is numpy and runs once per
(wavelet, N, preset) thanks to caching; the resulting scale arrays feed the
traced JAX transforms as constants.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from .config import DEFAULTS
from .utils.common import WARN, assert_is_one_of
from .utils.pad import p2up
from .wavelets.base import Wavelet
from .wavelets.props import (find_maximum, find_first_occurrence,
                             center_frequency)

pi = np.pi


# -- scale bounds --------------------------------------------------------------
def find_min_scale(wavelet, cutoff=1):
    """Smallest well-behaved scale: freq-domain wavelet takes `cutoff` of max
    on the greatest bin (reference: cwt_utils.py:412-431)."""
    w_peak, peak = find_maximum(wavelet)
    if cutoff > 0:
        step_start, step_limit = w_peak, 10 * w_peak
    else:
        step_start, step_limit = 0, w_peak
    w_cutoff, _ = find_first_occurrence(wavelet, value=abs(cutoff) * peak,
                                        step_start=step_start,
                                        step_limit=step_limit)
    return w_cutoff / pi


def find_max_scale(wavelet, N, bin_loc=1, bin_amp=1):
    """Largest scale: wavelet amplitude is `bin_amp` of max at `bin_loc` bin
    (reference: cwt_utils.py:434-456)."""
    from .utils.fft import xifn

    wc_ct = center_frequency(wavelet, kind="peak-ct", N=N)
    scalec_ct = (4 / pi) * wc_ct

    psih = np.asarray(wavelet(scalec_ct * xifn(1, N)))[:N // 2 + 1]
    xi = xifn(scalec_ct, N)
    midx = np.argmax(psih)
    w_bin = xi[np.where(psih[:midx] < psih.max() * bin_amp)[0][-1]]
    return scalec_ct * (w_bin / xi[bin_loc])


def find_max_scale_alt(wavelet, N, min_cutoff=0.1, max_cutoff=0.8):
    """'minimal'-preset max scale via symmetric-bin search
    (reference: cwt_utils.py:630-695)."""
    if max_cutoff <= 0 or min_cutoff <= 0:
        raise ValueError("`max_cutoff` and `min_cutoff` must be positive "
                         f"(got {max_cutoff}, {min_cutoff})")
    elif max_cutoff <= min_cutoff:
        raise ValueError("must have `max_cutoff > min_cutoff` "
                         f"(got {max_cutoff}, {min_cutoff})")

    w_peak, peak = find_maximum(wavelet)
    w_cutoff, _ = find_first_occurrence(wavelet, value=min_cutoff * peak,
                                        step_start=0, step_limit=w_peak)
    w_ltp = np.arange(w_cutoff, w_peak, step=1 / N)

    div_size = (w_peak - w_ltp[:-1]) * 2
    n_divs = w_ltp[:-1] / div_size
    try:
        idx = np.where(np.diff(n_divs % 1) < -0.8)[0][0]
    except IndexError:
        raise Exception("Failed to find sufficiently-integer xi divisions; "
                        "try widening (min_cutoff, max_cutoff)")
    div_scale = div_size[idx + 1]
    w_1div = pi / (N / 2)
    return div_scale / w_1div


def cwt_scalebounds(wavelet, N, preset=None, min_cutoff=None,
                    max_cutoff=None, cutoff=None, bin_loc=None, bin_amp=None,
                    use_padded_N=True):
    """(min_scale, max_scale) for which `wavelet` is well-behaved
    (reference: cwt_utils.py:66-188). Accepts str / (str, dict) / Wavelet
    specs; results cached per frozen Wavelet."""
    from .wavelets.base import Wavelet
    return _cwt_scalebounds_cached(Wavelet.build(wavelet), N, preset,
                                   min_cutoff, max_cutoff, cutoff, bin_loc,
                                   bin_amp, use_padded_N)


@lru_cache(maxsize=1024)
def _cwt_scalebounds_cached(wavelet, N, preset=None, min_cutoff=None,
                            max_cutoff=None, cutoff=None, bin_loc=None,
                            bin_amp=None, use_padded_N=True):
    defaults = dict(min_cutoff=0.6, max_cutoff=0.8, cutoff=-0.5)

    if preset is not None:
        if any(v is not None for v in (min_cutoff, max_cutoff, cutoff)):
            WARN("`preset` will override `min_cutoff, max_cutoff, cutoff`")
        assert_is_one_of(preset, "preset", ("maximal", "minimal", "naive"))
        if preset in ("naive", "maximal"):
            min_cutoff, max_cutoff = None, None
            if preset == "maximal":
                cutoff = -0.5
        else:
            min_cutoff, max_cutoff, cutoff = defaults.values()
    else:
        if min_cutoff is None:
            min_cutoff = defaults["min_cutoff"]
        elif min_cutoff <= 0:
            raise ValueError(f"`min_cutoff` must be >0 (got {min_cutoff})")
        if max_cutoff is None:
            max_cutoff = defaults["max_cutoff"]
        elif max_cutoff < min_cutoff:
            raise ValueError("must have `max_cutoff > min_cutoff` "
                             f"(got {max_cutoff}, {min_cutoff})")

    bin_loc = bin_loc or (2 if preset == "maximal" else None)
    bin_amp = bin_amp or (1 if preset == "maximal" else None)
    cutoff = cutoff if (cutoff is not None) else defaults["cutoff"]

    if preset == "naive":
        return 1, N

    M = p2up(N)[0] if use_padded_N else N
    min_scale = find_min_scale(wavelet, cutoff=cutoff)
    if preset in ("minimal", None):
        max_scale = find_max_scale_alt(wavelet, M, min_cutoff=min_cutoff,
                                       max_cutoff=max_cutoff)
    else:
        max_scale = find_max_scale(wavelet, M, bin_loc=bin_loc,
                                   bin_amp=bin_amp)
    return min_scale, max_scale


# -- scale construction ---------------------------------------------------------
@lru_cache(maxsize=1024)
def _find_downsampling_scale_cached(wavelet, scales_key, span, tol, method,
                                    nonzero_th, nonzero_tol, N):
    scales = np.asarray(scales_key)
    return _find_downsampling_scale(wavelet, scales, span, tol, method,
                                    nonzero_th, nonzero_tol, N)


def find_downsampling_scale(wavelet, scales, span=5, tol=3, method="sum",
                            nonzero_th=0.02, nonzero_tol=4.0, N=None):
    """Scale index past which freq-domain wavelets are excessively redundant
    (reference: cwt_utils.py:459-580)."""
    scales = np.asarray(scales).squeeze()
    if isinstance(wavelet, Wavelet):
        return _find_downsampling_scale_cached(
            wavelet, tuple(scales.tolist()), span, tol, method, nonzero_th,
            nonzero_tol, N)
    return _find_downsampling_scale(wavelet, scales, span, tol, method,
                                    nonzero_th, nonzero_tol, N)


def _find_downsampling_scale(wavelet, scales, span, tol, method, nonzero_th,
                             nonzero_tol, N):
    assert_is_one_of(method, "method", ("any", "all", "sum"))
    N = N or 2048
    if isinstance(wavelet, np.ndarray):
        Psih = wavelet
    else:
        Psih = np.asarray(wavelet.sample(scales, N, xp=np, nohalf=True))
    if len(Psih) != len(scales):
        raise ValueError(f"len(Psih) != len(scales) "
                         f"({len(Psih)} != {len(scales)})")

    Psih = Psih[:, :Psih.shape[1] // 2]
    n_scales = len(Psih)
    n_groups = n_scales - span - 1

    i = 0
    for i in range(n_groups):
        psihs = Psih[i:i + span]
        psihs_nonzeros = psihs > nonzero_th * psihs.max(axis=1)[:, None]
        if psihs_nonzeros.sum() / span > nonzero_tol:
            continue

        psihs_peaks = np.where(psihs == psihs.max(axis=1)[:, None])
        joint_peak = np.argmax(np.prod(psihs, 0))
        distances = np.abs(psihs_peaks[1] - joint_peak)

        too_dense = (
            (method == "any" and distances.max() < tol) or
            (method == "all" and not np.all(distances > tol)) or
            (method == "sum" and distances.sum() < tol))
        if too_dense:
            break
    return i if (i < n_groups - 1) else None


def make_scales(N, min_scale=None, max_scale=None, nv=32, scaletype="log",
                wavelet=None, downsample=None):
    """Build the scales array (log / log-piecewise / linear)
    (reference: cwt_utils.py:301-372). Returns shape (na, 1)."""
    if scaletype == "log-piecewise" and wavelet is None:
        raise ValueError("must pass `wavelet` for `scaletype == 'log-piecewise'`")
    if min_scale is None and max_scale is None and wavelet is not None:
        min_scale, max_scale = cwt_scalebounds(wavelet, N, use_padded_N=True)
    else:
        min_scale = min_scale or 1
        max_scale = max_scale or N
    downsample = int(DEFAULTS["make_scales"]["downsample"]
                     if downsample is None else downsample)

    na = int(np.ceil(nv * np.log2(max_scale / min_scale)))
    mn_pow = int(np.floor(nv * np.log2(min_scale)))
    mx_pow = mn_pow + na

    if scaletype == "log":
        scales = 2 ** (np.arange(mn_pow, mx_pow) / nv)
    elif scaletype == "log-piecewise":
        scales = 2 ** (np.arange(mn_pow, mx_pow) / nv)
        idx = find_downsampling_scale(wavelet, scales)
        if idx is not None:
            scales1 = scales[:idx]
            scales2 = scales[idx + downsample - 1::downsample]
            scales = np.hstack([scales1, scales2])
    elif scaletype == "linear":
        min_scale, max_scale = 2 ** (mn_pow / nv), 2 ** (mx_pow / nv)
        na = int(np.ceil(max_scale / min_scale))
        scales = np.linspace(min_scale, max_scale, na)
    else:
        raise ValueError(f"`scaletype` must be 'log', 'log-piecewise' or "
                         f"'linear'; got: {scaletype}")
    return scales.reshape(-1, 1)


# -- scale introspection --------------------------------------------------------
def logscale_transition_idx(scales):
    """Index splitting a log-piecewise scales array, or None
    (reference: cwt_utils.py:375-394)."""
    scales = np.asarray(scales).reshape(-1, 1)
    scales_diff2 = np.abs(np.diff(np.log(scales), 2, axis=0))
    idx = int(np.argmax(scales_diff2)) + 2
    diff2_max = scales_diff2.max()
    scales_diff2[idx - 2] = 0
    th = 1e-14 if scales.dtype == np.float64 else 1e-6

    if not np.any(diff2_max > 100 * np.abs(scales_diff2).mean()):
        return None
    elif not np.all(np.abs(scales_diff2) < th):
        return None
    return idx


def infer_scaletype(scales):
    """('log' | 'linear' | 'log-piecewise', nv) from a scales array
    (reference: cwt_utils.py:264-298)."""
    scales = np.asarray(scales).reshape(-1, 1)
    if scales.dtype not in (np.float32, np.float64):
        raise TypeError("`scales.dtype` must be float32 or float64 "
                        f"(got {scales.dtype})")
    th_log = 4e-15 if scales.dtype == np.float64 else 8e-7
    th_lin = th_log * 1e3

    if np.mean(np.abs(np.diff(np.log(scales), 2, axis=0))) < th_log:
        scaletype = "log"
        nv = int(np.round(1 / np.diff(np.log2(scales), axis=0)[0].squeeze()))
    elif np.mean(np.abs(np.diff(scales, 2, axis=0))) < th_lin:
        scaletype = "linear"
        nv = None
    elif logscale_transition_idx(scales) is None:
        raise ValueError("could not infer `scaletype` from `scales`; must be "
                         "linear or exponential")
    else:
        scaletype = "log-piecewise"
        nv = nv_from_scales(scales)
    return scaletype, nv


def nv_from_scales(scales):
    """Infer per-scale nv (array for log-piecewise)
    (reference: cwt_utils.py:397-409)."""
    scales = np.asarray(scales).reshape(-1, 1)
    logdiffs = 1 / np.diff(np.log2(scales), axis=0)
    return np.vstack([logdiffs[:1], logdiffs])


def process_scales(scales, N, wavelet=None, nv=None, get_params=False,
                   use_padded_N=True):
    """Make or validate scales; optionally return (scales, scaletype, na, nv)
    (reference: cwt_utils.py:196-261)."""
    preset = None
    if isinstance(scales, str):
        if ":" in scales:
            scales, preset = scales.split(":")
        elif scales == "log-piecewise":
            preset = "maximal"
        assert_is_one_of(scales, "scales", ("log", "log-piecewise", "linear"))
        if nv is None:
            nv = 32
        if wavelet is None:
            raise ValueError("must set `wavelet` if `scales` isn't array")
        scaletype = scales
        wavelet = Wavelet.build(wavelet)
        min_scale, max_scale = cwt_scalebounds(wavelet, N=N, preset=preset,
                                               use_padded_N=use_padded_N)
        scales = make_scales(N, min_scale, max_scale, nv=nv,
                             scaletype=scaletype, wavelet=wavelet)
        if nv is not None and not isinstance(nv, np.ndarray):
            nv = int(nv)
        return (scales if not get_params else
                (scales, scaletype, len(scales), nv))

    scales = np.asarray(scales)
    if scales.squeeze().ndim != 1:
        raise ValueError("`scales`, if array, must be 1D "
                         f"(got shape {scales.shape})")
    scaletype, _nv = infer_scaletype(scales)
    if scaletype == "log":
        if nv is not None and _nv != nv:
            raise Exception(f"`nv` used in `scales` differs from `nv` passed "
                            f"({_nv} != {nv})")
        nv = _nv
    elif scaletype == "log-piecewise":
        nv = _nv
    scales = scales.reshape(-1, 1)
    return (scales if not get_params else
            (scales, scaletype, len(scales), nv))


def process_fs_and_t(fs, t, N):
    """(dt, fs, t) from fs or a uniform time vector
    (reference: cwt_utils.py:698-718)."""
    if fs is not None and t is not None:
        WARN("`t` will override `fs` (both were passed)")
    if t is not None:
        t = np.asarray(t)
        if len(t) != N:
            raise Exception(f"`t` must be of same length as `x` "
                            f"({len(t)} != {N})")
        elif not np.mean(np.abs(np.diff(t, 2, axis=0))) < 1e-7:
            raise Exception("Time vector `t` must be uniformly sampled.")
        fs = 1 / (t[1] - t[0])
    else:
        if fs is None:
            fs = 1
        elif fs <= 0:
            raise ValueError("`fs` must be > 0")
    return 1 / fs, fs, t
