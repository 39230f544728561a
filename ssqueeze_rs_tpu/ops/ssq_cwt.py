"""Synchrosqueezed CWT (forward + inverse).

Pipeline (reference parity: old/ssqueezepy/_ssq_cwt.py):
    cwt(derivative=True) -> gamma = 10*eps -> fused phase+bin+scatter
    (ops/ssqueeze.py) -> Tx, with the 'trig' / 'phase' / 'numeric' difftypes
    and 'peak'/'energy'/'maximal' mapranges.

One jit program per (shape, wavelet, scales-scheme): CWT, derivative,
phase transform and reassignment all fuse. Batched input supported on any
leading dims.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EPS32, EPS64
from ..scales import process_scales, process_fs_and_t
from ..utils.pad import p2up
from ..wavelets.base import Wavelet
from ..wavelets.adm import adm_ssq
from .cwt import cwt
from .phase import phase_cwt, phase_cwt_num
from .ssqueeze import ssqueeze, check_ssqueezing_args

__all__ = ["ssq_cwt", "issq_cwt"]


def _planar_ssq_ok(x, wavelet, padtype, squeezing, dtype):
    """Is the planar (f32 planes end-to-end) fused path applicable?"""
    from .fft_mxu import use_mxu_fft, best_split
    from .cwt import _psih_is_real
    from ..config import DEFAULTS
    if str(dtype or DEFAULTS["dtype"]) != "float32":
        return False
    N = jnp.asarray(x).shape[-1]
    M = p2up(N)[0] if padtype is not None else N
    return (use_mxu_fft() and best_split(M) is not None and
            _psih_is_real(wavelet) and squeezing == "sum")


def ssq_cwt(x, wavelet="gmw", scales="log-piecewise", nv=None, fs=None,
            t=None, ssq_freqs=None, padtype="reflect", squeezing="sum",
            maprange="peak", difftype="trig", difforder=None, gamma=None,
            vectorized=True, preserve_transform=None, astensor=True, order=0,
            nan_checks=None, patience=0, flipud=True, cache_wavelet=None,
            get_w=False, get_dWx=False, dtype=None):
    """Synchrosqueezed CWT (reference parity: _ssq_cwt.py:12-310).

    Returns (Tx, Wx, ssq_freqs, scales[, w][, dWx]).

    TPU perf note: the reassignment scatter is adaptively BANDED
    (SSQ_TPU_REASSIGN_BAND, default on; bitwise-identical output).
    Concentrated-phase signals (tones, denoised chirps) run ~1.2-1.5x
    faster; white noise / multi-component signals and short off-bin
    tones at default `gamma` take the full-loop fallback — for
    leakage-dominated signals, raising `gamma` (denoising regime)
    restores banding. See ops/ssq_stft.py's note and docs/DESIGN.md.
    """
    difforder = check_ssqueezing_args(squeezing, maprange, wavelet, difftype,
                                      difforder, get_w, transform="cwt")
    planes_w = planes_d = w_plane_arr = dwx_kernel = None
    x = jnp.asarray(x)
    N = x.shape[-1]
    dt, fs, _ = process_fs_and_t(fs, t, N)
    if nv is None and isinstance(scales, str):
        nv = 32

    wavelet = Wavelet.build(wavelet, l1_norm=True)

    # higher-order GMW path: averaged CWT, derivative via trig differentiation
    if isinstance(order, (tuple, list, range)) or order > 0:
        from .cwt import cwt_higher_order
        _, n1, _ = p2up(N)
        average = isinstance(order, (tuple, list, range))
        Wxp, scales_arr = cwt_higher_order(
            x, wavelet=wavelet, order=order, average=average, scales=scales,
            fs=fs, nv=nv, l1_norm=True, derivative=False, padtype=padtype,
            rpadded=True, nan_checks=nan_checks, dtype=dtype)
        # trigdiff on the padded transform (reference: _ssq_cwt.py:238,
        # utils/common.py:161-245) — the shared ops/diff.py helper
        from .diff import trigdiff
        dWx = trigdiff(Wxp, fs, rpadded=True, N=N, n1=n1)
        Wx = Wxp[..., n1:n1 + N]
        scales = np.asarray(scales_arr).reshape(-1, 1)
        cwt_scaletype = process_scales(scales, N, wavelet, nv=nv,
                                       get_params=True)[1]
    else:
        scales, cwt_scaletype, *_ = process_scales(scales, N, wavelet, nv=nv,
                                                   get_params=True)
        rpadded = (difftype == "numeric")
        if (not rpadded and not get_w and
                _planar_ssq_ok(x, wavelet, padtype, squeezing, dtype)):
            # planar fast path: CWT+derivative as f32 planes feeding the
            # Pallas kernel directly — dWx never becomes complex64 and
            # the kernel skips its .real/.imag split passes
            from .cwt import cwt_core
            from ..utils.pad import padsignal
            from ..config import DEFAULTS
            xx = jnp.asarray(x)
            if nan_checks is None or nan_checks:
                xx = jnp.nan_to_num(xx, nan=0.0, posinf=0.0, neginf=0.0)
            xx = xx.astype(dtype or DEFAULTS["dtype"])
            if padtype is not None:
                xp_, _, n1_, _ = padsignal(xx, padtype, get_params=True)
            else:
                xp_, n1_ = xx, 0
            sc = jnp.asarray(np.asarray(scales).squeeze(-1), xx.dtype)
            from ..utils.common import warn_hbm_budget
            warn_hbm_budget(
                N, sc.shape[0],
                batch=int(np.prod(xx.shape[:-1])) if xx.ndim > 1 else 1,
                derivative=True, what="ssq_cwt")
            from .fft_mxu import use_mxu_fft
            from ..config import use_pallas_kernels
            fb_token = None
            if cache_wavelet:
                from .cwt import _cache_filterbank
                fb_token = _cache_filterbank(
                    wavelet, np.asarray(scales).squeeze(-1),
                    xp_.shape[-1])
            from .cwt import cwt_phase_fusable, _WPlane
            import os as _os
            engines = (use_mxu_fft(), use_pallas_kernels())
            # r4 fused-phase gate: compute w INSIDE the cwt kernel (one
            # plane out instead of two dWx planes; ~1.2 ms HBM saved at
            # the headline shape). Needs a concrete host gamma and the
            # trig phase (the fused path's own difftype); get_dWx
            # requires the real dWx planes. SSQ_TPU_PHASE_FUSED=0
            # disables for A/B (read at call time, baked via this
            # python branch, so in-process flips are safe).
            phase_gamma = None
            if (not get_dWx and difftype == "trig" and
                    isinstance(gamma, (type(None), int, float)) and
                    _os.environ.get("SSQ_TPU_PHASE_FUSED", "1") == "1" and
                    cwt_phase_fusable(xp_.shape[-1], wavelet, xx.dtype,
                                      engines)):
                phase_gamma = float(gamma if gamma is not None
                                    else 10 * EPS32)
            # keep_align=512 (r5): planes come back (na, L2) with L2 the
            # next 512-multiple >= N, so the reassignment kernel's
            # columns are tile-divisible and its ragged-tile mask path
            # never builds (~1.3 ms at the headline shape). Column-local
            # scatter => slack columns only ever scatter into slack
            # output columns, which n_out slicing drops; everything the
            # user sees is sliced to N at a fused complexify.
            planes_w, planes_d = cwt_core(
                xp_, sc, jnp.asarray(dt, xx.dtype), wavelet=wavelet,
                derivative=True, l1_norm=True, N=N, n1=n1_, rpadded=False,
                planar_out=True, engines=engines,
                fb_token=fb_token, phase_gamma=phase_gamma, keep_align=512)
            Wx = jax.lax.complex(planes_w[0][..., :N],
                                 planes_w[1][..., :N])
            if isinstance(planes_d, _WPlane):
                w_plane_arr = planes_d.w
                dWx = planes_d = None
            else:
                dwx_kernel = planes_d       # full-width planes tuple
                dWx = (jax.lax.complex(planes_d[0][..., :N],
                                       planes_d[1][..., :N])
                       if get_dWx else None)
        else:
            Wx, scales_out, dWx = cwt(x, wavelet, scales=scales, fs=fs,
                                      nv=nv, l1_norm=True, derivative=True,
                                      padtype=padtype, rpadded=rpadded,
                                      nan_checks=nan_checks, dtype=dtype,
                                      cache_wavelet=cache_wavelet)

    if gamma is None:
        gamma = 10 * (EPS64 if Wx.dtype == jnp.complex128 else EPS32)
    # (w_plane_arr, when set, already folded THIS gamma into the kernel
    # epilogue: phase_gamma = float(gamma or 10*EPS32) above)

    # phase transform if requested explicitly
    if get_w:
        if difftype == "trig":
            w = phase_cwt(Wx, dWx, "trig", gamma)
        elif difftype == "phase":
            w = phase_cwt(Wx, None, "phase", gamma)
        else:  # numeric: Wx is rpadded; trim to N+8 window around signal
            if padtype is None or (isinstance(order, (tuple, list, range))
                                   or order > 0):
                # the N+8 window needs a p2up-PADDED first-order Wx; the
                # reference hits the same clamped slice silently and
                # returns truncated, misaligned output
                # (_ssq_cwt.py:230-262 + 303-306)
                raise ValueError(
                    "difftype='numeric' requires padtype != None and "
                    "order=0 (the phase window reads the padded CWT)")
            _, n1, _ = p2up(N)
            Wx = Wx[..., (n1 - 4):(n1 + N + 4)]
            w = phase_cwt_num(Wx, dt, difforder, gamma)
        _dWx = None
    else:
        w = None
        # kernel input: full-width planes tuple when the planar path
        # produced one (keep_align slack); user-facing dWx stays N-wide
        _dWx = dwx_kernel if dwx_kernel is not None else dWx

    if ssq_freqs is None:
        ssq_freqs = cwt_scaletype
    was_padded = bool(padtype is not None)

    Tx, ssq_freqs = ssqueeze(Wx, w, ssq_freqs, scales, fs=fs,
                             squeezing=squeezing, maprange=maprange,
                             wavelet=wavelet, gamma=gamma,
                             was_padded=was_padded, flipud=flipud, dWx=_dWx,
                             transform="cwt", wx_planes=planes_w,
                             w_plane=w_plane_arr)

    if difftype == "numeric":
        Wx = Wx[..., 4:-4]
        Tx = Tx[..., 4:-4]
        w = w[..., 4:-4] if w is not None else None

    scales = np.asarray(scales).squeeze()
    if get_w and get_dWx:
        return Tx, Wx, ssq_freqs, scales, w, dWx
    elif get_w:
        return Tx, Wx, ssq_freqs, scales, w
    elif get_dWx:
        return Tx, Wx, ssq_freqs, scales, dWx
    return Tx, Wx, ssq_freqs, scales


# -- inverse ----------------------------------------------------------------
def _process_component_inversion_args(cc, cw):
    # jnp (not numpy) so component inversion is trace-safe: it can run
    # under jit and inside shard_map (parallel.chunked_issq_cwt)
    if cc is None and cw is None:
        return None, None, True
    cc = jnp.asarray(cc, jnp.int32)
    cw = jnp.asarray(cw, jnp.int32)
    if cc.ndim == 1:
        cc = cc[:, None]
    if cw.ndim == 1:
        cw = cw[:, None]
    return cc, cw, False


def _invert_components(Tx, cc, cw):
    """Invert around curve bands in the TF plane; last output row is the
    residual (reference: _ssq_cwt.py:381-403).

    Device-side jnp (the reference loops components in numpy): all K
    component masks are built by one broadcast compare and applied by
    one einsum, so the inversion runs under jit, is differentiable, and
    supports leading batch dims on Tx (output (..., K+1, n_times))."""
    Tx = jnp.asarray(Tx)
    n_freqs = Tx.shape[-2]
    cc = jnp.asarray(cc, jnp.int32).T          # (K, n_times)
    cw = jnp.asarray(cw, jnp.int32).T
    rows = jnp.arange(n_freqs)[None, :, None]  # (1, n_freqs, 1)

    upper = jnp.clip(cc + cw, 0, n_freqs)
    lower = jnp.clip(cc - cw, 0, n_freqs)
    no_curve = cc == -1
    upper = jnp.where(no_curve, 0, upper)
    lower = jnp.where(no_curve, 1, lower)
    # (K, n_freqs, n_times) band masks
    mask = (rows >= lower[:, None, :]) & (rows <= upper[:, None, :])

    Txr = Tx.real
    comps = jnp.einsum("...fn,kfn->...kn", Txr, mask.astype(Txr.dtype))
    # residual: rows claimed by NO component (reference keeps &= ~mask)
    remainder = ~jnp.any(mask, axis=0)
    resid = jnp.sum(Txr * remainder.astype(Txr.dtype), axis=-2)
    return jnp.concatenate([comps, resid[..., None, :]], axis=-2)


def issq_cwt(Tx, wavelet="gmw", cc=None, cw=None):
    """Inverse synchrosqueezed CWT (reference parity: _ssq_cwt.py:313-417).

    Full inversion: x = (2/Css) * sum_rows Re(Tx). With `cc`/`cw`, inverts
    per-component over curve bands; output rows are components + residual.
    """
    cc, cw, full_inverse = _process_component_inversion_args(cc, cw)
    if full_inverse:
        x = jnp.asarray(Tx).real.sum(axis=-2)
    else:
        x = _invert_components(Tx, cc, cw)

    wavelet = Wavelet.build(wavelet)
    Css = adm_ssq(wavelet)
    return x * (2 / Css)
