"""Continuous Wavelet Transform, forward & inverse (TPU-native).

Design (vs reference old/ssqueezepy/_cwt.py, rust/src/spectral/cwt.rs):
  * the whole CWT is ONE batched tensor program:
        Wx = ifft(psih(scales[:,None]*xi) * fft(x_padded)[None,:])
    — a single (na, Npad) batched iFFT replaces the reference's Rayon
    per-scale loop (cwt.rs:228-310) and its thread-local FFT planners,
  * derivative CWT multiplies the same product by (i*xi/dt) — no extra
    wavelet sampling,
  * wavelet is a static (hashable) argument: psih sampling is traced into
    the jit program and fused by XLA,
  * scale planning (log/log-piecewise/linear grids, bounds) is host-side
    numpy, cached per (wavelet, N, preset).

Batched inputs: any leading dims; dim -1 is time (reference supports 1D/2D,
we support ND).
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULTS, complex_dtype
from ..scales import (process_scales, process_fs_and_t,
                      logscale_transition_idx)
from ..utils.fft import xifn
from ..utils.pad import padsignal, p2up
from ..wavelets.base import Wavelet
from ..wavelets.adm import adm_cwt, adm_ssq

__all__ = ["cwt", "icwt", "cwt_core", "cwt_higher_order"]


@lru_cache(maxsize=256)
def _psih_is_real(wavelet: Wavelet) -> bool:
    """Host probe: does this wavelet's psih evaluate real-valued?
    (Planar fast-path requirement; true for gmw/morlet/cmhat/hhhat and
    bump with om=0.)"""
    try:
        v = wavelet(np.array([0.31, 0.7, 1.3]))
        return bool(np.isrealobj(np.asarray(v)))
    except Exception as e:
        # A custom psih that only accepts jnp tracers lands here and is
        # legitimately routed to the complex path; but surface the probe
        # failure so a BUGGY callable doesn't silently degrade to the
        # slow path (VERDICT r1 weak #4).
        from ..utils.common import WARN
        WARN(f"host probe of wavelet '{wavelet.name}' psih raised "
             f"{type(e).__name__}: {e} — assuming complex-valued psih "
             "(planar fast path disabled for this wavelet)")
        return False


@lru_cache(maxsize=64)
def _xi_grid_np(M: int):
    """Positive-frequency radian grid for bins k < M/2, reshaped to the
    planar engine's (K1, M2) layout (k = M2*k1 + k2)."""
    from .fft_mxu import best_split
    M1, M2 = best_split(M)
    xi = xifn(1, M)[:M // 2].astype(np.float32)
    return xi.reshape(M1 // 2, M2)


# host-sampled filterbank cache (reference `cache_wavelet` / Psih cache,
# old/ssqueezepy/wavelets.py:135-159, _cwt.py:97-103). The arrays are
# kept as HOST numpy and converted to jnp INSIDE the traced function, so
# they fold into the compiled program as constants: no per-call psih
# evaluation (~2 ms at (300, 131072) on-chip) and no closure-captured
# device arrays (which the axon relay re-fetches — see CLAUDE.md).
from collections import OrderedDict

_FB_CACHE: "OrderedDict[str, tuple]" = OrderedDict()
_FB_CACHE_MAX = 8   # entries are ~na*M/2*4 bytes (~150 MB at (300, 2^18))


def _cache_filterbank(wavelet: Wavelet, scales_np, M: int):
    # the FULL tuple is the key (a truncated hash token could silently
    # alias two filterbanks on collision — ADVICE r2)
    token = (wavelet.name, wavelet.params, scales_np.tobytes(), M)
    if token in _FB_CACHE:
        _FB_CACHE.move_to_end(token)
    else:
        xig = _xi_grid_np(M)  # f32 grid — same operand the traced path uses
        sc = scales_np.astype(np.float32)
        Pw = wavelet.psih(sc[:, None, None] * xig[None], np).astype(
            np.float32)
        pnyq = (wavelet.psih(sc * np.float32(np.pi), np) / 2).astype(
            np.float32)
        _FB_CACHE[token] = (Pw, pnyq)
        while len(_FB_CACHE) > _FB_CACHE_MAX:
            _FB_CACHE.popitem(last=False)
    return token


class _WPlane:
    """Marker wrapper for cwt_core's planes_d slot: the dWx planes were
    replaced by the fused-phase w plane (fft_pallas phase_gamma mode).
    Registered as a pytree so it can cross the cwt_core jit boundary."""
    __slots__ = ("w",)

    def __init__(self, w):
        self.w = w


jax.tree_util.register_pytree_node(
    _WPlane, lambda p: ((p.w,), None), lambda _, ch: _WPlane(ch[0]))


def cwt_phase_fusable(M: int, wavelet: Wavelet, dtype, engines=None) -> bool:
    """True when cwt_core(phase_gamma=...) will take the fused-phase
    kernel (untiled cwt-mode fused path): the ssq_cwt gate."""
    from .fft_mxu import use_mxu_fft, best_split
    from ..config import use_pallas_kernels
    from .fft_pallas import fused_tiles
    if engines is None:
        engines = (use_mxu_fft(), use_pallas_kernels())
    return bool(np.dtype(dtype) == np.float32 and engines[0] and
                best_split(M) is not None and _psih_is_real(wavelet) and
                engines[1] and fused_tiles(M, 2) == 1)


@partial(jax.jit, static_argnames=("wavelet", "derivative", "l1_norm", "N",
                                   "n1", "rpadded", "planar_out",
                                   "engines", "fb_token", "phase_gamma",
                                   "keep_align"))
def cwt_core(xp, scales, dt, *, wavelet: Wavelet, derivative: bool,
             l1_norm: bool, N: int, n1: int, rpadded: bool,
             planar_out: bool = False, engines=None, fb_token=None,
             phase_gamma=None, keep_align=None):
    """CWT of an already-padded signal. xp: (..., M); returns (..., na, N).

    `planar_out=True` (fused ssq_cwt path; requires the MXU half-band
    route and a real-psih wavelet) returns f32 real/imag planes
    ((Wxr, Wxi), (dWxr, dWxi)) instead of complex arrays — the
    reassignment kernel consumes planes, so no c64 array is ever built
    for dWx.

    `phase_gamma` (r4): fuse the phase transform into the cwt kernel
    epilogue — planes_d comes back as a `_WPlane` wrapping the single
    w plane (+inf where |Wx| <= gamma) instead of the (dWxr, dWxi)
    pair. Caller must pre-gate with `cwt_phase_fusable`; honored only
    on the untiled fused cwt-mode path with derivative=True.

    `keep_align` (r5, planar path only): round the kept width UP to a
    multiple of this (clamped to the padded length), so planar_out
    planes come back (na, L2) with L2 = ceil(N/keep_align)*keep_align.
    The slack columns are real iFFT output of the padded signal's tail;
    downstream column-local consumers (the reassignment scatter) then
    see tile-divisible columns and skip their ragged-tile mask path
    (~1.3 ms at the 160k headline, measured). planar_out=False slices
    back to N before complexify (fused, free), so only the planes
    contract changes.
    """
    M = xp.shape[-1]
    from .fft_mxu import (ifft_mxu_halfband, ifft_mxu_halfband_planar,
                          use_mxu_fft, best_split)
    from ..config import use_pallas_kernels
    if engines is None:
        # NOTE: env flags read here are baked into the trace; pass
        # `engines=(use_mxu_fft(), use_pallas_kernels())` from the caller
        # so in-process flag flips don't hit a stale jit cache
        engines = (use_mxu_fft(), use_pallas_kernels())
    mxu = (xp.dtype == jnp.float32 and engines[0] and
           best_split(M) is not None)
    planar = mxu and _psih_is_real(wavelet)
    if planar_out and not planar:
        raise ValueError("planar_out requires the MXU half-band path and "
                         "a real-valued psih")

    if planar:
        # Planar path: analytic wavelets with REAL psih. Everything stays
        # as f32 real/imag planes (TPU has no complex tiles; planes feed
        # the Pallas reassignment kernel with no split/combine passes).
        M1, M2 = best_split(M)
        K1 = M1 // 2
        batch = xp.shape[:-1]
        b = int(np.prod(batch)) if batch else 1
        na = scales.shape[0]
        rdt = xp.dtype
        xh = jnp.fft.rfft(xp.reshape(b, M), axis=-1)      # (b, M/2+1) c64
        xig = _xi_grid_np(M)                              # (K1, M2) host
        if fb_token is not None:
            # cache_wavelet: host-sampled filterbank folded in as a
            # program constant — skips ~2 ms of per-call psih eval
            np_Pw, np_pnyq = _FB_CACHE[fb_token]
            Pw = jnp.asarray(np_Pw).astype(rdt)
            pnyq = jnp.asarray(np_pnyq).astype(rdt)
        else:
            Pw = wavelet.psih(scales[:, None, None] *
                              jnp.asarray(xig)[None, :, :], jnp).astype(rdt)
            # Nyquist bin: psih(scale*pi)/2 * real(xh[M/2])
            pnyq = (wavelet.psih(scales * np.float32(np.pi), jnp) /
                    2).astype(rdt)
        znyq = (xh[:, -1].real.astype(rdt)[:, None] *
                pnyq[None, :]).reshape(b * na)
        zeros = jnp.zeros_like(znyq)
        keep = (0, M) if rpadded else (n1, N)
        if keep_align and not rpadded:
            keep = (n1, min(-(-N // keep_align) * keep_align, M - n1))
        from .fft_pallas import (ifft_halfband_planar_fused,
                                 cwt_halfband_fused, fused_ok)
        fused = engines[1] and fused_ok(M, 1)
        fused_cwtmode = (engines[1] and
                         fused_ok(M, 2 if derivative else 1))

        from .fft_pallas import fused_tiles
        phase = (phase_gamma is not None and fused_cwtmode and derivative
                 and planar_out and fused_tiles(M, 2) == 1)
        wpl = None
        if phase:
            # fused kernel + fused PHASE epilogue: one w plane replaces
            # the two dWx planes (see fft_pallas._make_cwt_kernel_phase)
            xrg = xh.real[:, :M // 2].reshape(b, K1, M2)
            xig_im = xh.imag[:, :M // 2].reshape(b, K1, M2)
            wxr, wxi, wpl = cwt_halfband_fused(
                Pw, xrg, xig_im, jnp.asarray(xig), 1.0 / dt,
                (znyq, zeros), (zeros, znyq * (np.pi / dt)),
                keep=keep, derivative=True, phase_gamma=phase_gamma)
            planes = ((wxr, wxi), None)
        elif fused_cwtmode:
            # fully fused kernel: the Z = psih * xhat filterbank multiply
            # ALSO happens in VMEM, so the (B, K1, M2) Z planes never
            # round-trip HBM (~1.2 GB saved). Batched signals share the
            # filterbank; the kernel grids over b*na rows b-major.
            xrg = xh.real[:, :M // 2].reshape(b, K1, M2)
            xig_im = xh.imag[:, :M // 2].reshape(b, K1, M2)
            wxr, wxi, dxr, dxi = cwt_halfband_fused(
                Pw, xrg, xig_im, jnp.asarray(xig), 1.0 / dt,
                (znyq, zeros), (zeros, znyq * (np.pi / dt)),
                keep=keep, derivative=derivative)
            planes = ((wxr, wxi), (dxr, dxi) if derivative else None)
        else:
            xrh = xh.real[..., :M // 2].reshape(b, 1, K1, M2)
            xih = xh.imag[..., :M // 2].reshape(b, 1, K1, M2)
            Zr = (Pw[None] * xrh).reshape(b * na, K1, M2)
            Zi = (Pw[None] * xih).reshape(b * na, K1, M2)
            if derivative:
                xi_b = jnp.asarray(xig)[None, :, :] / dt
                Zr, Zi = (jnp.concatenate([Zr, -Zi * xi_b], axis=0),
                          jnp.concatenate([Zi, Zr * xi_b], axis=0))
                nyq_r = jnp.concatenate([znyq, zeros])
                nyq_i = jnp.concatenate([zeros, znyq * (np.pi / dt)])
            else:
                nyq_r, nyq_i = znyq, zeros
            engine = (ifft_halfband_planar_fused if fused
                      else ifft_mxu_halfband_planar)
            xr, xi_p = engine(Zr, Zi, keep=keep, nyq_r=nyq_r, nyq_i=nyq_i)
            planes = ((xr[:b * na], xi_p[:b * na]),
                      (xr[b * na:], xi_p[b * na:]) if derivative else None)

        L = keep[1]
        shp = batch + (na, L)
        if not l1_norm:
            # planes are (b*na, L), rows b-major: tile the per-scale root
            root = jnp.tile(jnp.sqrt(scales).astype(rdt), b)[:, None]
            pw, pd = planes
            pw = (pw[0] * root, pw[1] * root)
            pd = (pd[0] * root, pd[1] * root) if pd is not None else None
            planes = (pw, pd)
        planes_w = (planes[0][0].reshape(shp), planes[0][1].reshape(shp))
        planes_d = ((planes[1][0].reshape(shp), planes[1][1].reshape(shp))
                    if planes[1] is not None else None)
        if phase:
            # w = |Im(dWx/Wx)|/2pi is invariant under the per-row l2
            # rescale (same factor on Wx and dWx), so it needs no root
            planes_d = _WPlane(wpl.reshape(shp))
        if planar_out:
            return planes_w, planes_d
        if L > N and not rpadded:
            # keep_align slack: slice back to N pre-complexify (fuses)
            planes_w = tuple(p[..., :N] for p in planes_w)
            planes_d = (tuple(p[..., :N] for p in planes_d)
                        if planes_d is not None else None)
        Wx = jax.lax.complex(*planes_w)
        dWx = jax.lax.complex(*planes_d) if derivative else None
        return (Wx, dWx) if derivative else (Wx, None)
    elif mxu:
        # complex half-band path (non-real psih, e.g. bump with om != 0)
        xh = jnp.fft.rfft(xp, axis=-1)                    # (..., M/2+1)
        Psih = wavelet.sample(scales, M, xp=jnp, nohalf=False, half=True)
        Psih = Psih.astype(complex_dtype(xp.dtype))
        Psih_xh = Psih * xh[..., None, :]
        keep = None if rpadded else (n1, N)   # fuse unpad into stage 2
        if derivative:
            xi = xifn(1, M, xp=jnp)[:M // 2 + 1].astype(xp.dtype)
            both = jnp.concatenate(
                [Psih_xh, Psih_xh * (1j * xi / dt)], axis=-2)
            Wboth = ifft_mxu_halfband(both, keep=keep)
            na = Psih.shape[-2]
            Wx, dWx = Wboth[..., :na, :], Wboth[..., na:, :]
        else:
            Wx = ifft_mxu_halfband(Psih_xh, keep=keep)
    else:
        xh = jnp.fft.fft(xp, axis=-1)
        Psih = wavelet.sample(scales, M, xp=jnp, nohalf=False)
        Psih = Psih.astype(complex_dtype(xp.dtype))
        _ifft = lambda z: jnp.fft.ifft(z, axis=-1)

        Psih_xh = Psih * xh[..., None, :]
        if derivative:
            # one fused batched iFFT over [spectra; derivative spectra] —
            # the FFT amortizes its passes better over one larger batch
            xi = xifn(1, M, xp=jnp).astype(xp.dtype)
            both = jnp.concatenate([Psih_xh, Psih_xh * (1j * xi / dt)],
                                   axis=-2)
            Wboth = _ifft(both)
            na = Psih.shape[-2]
            Wx = Wboth[..., :na, :]
            dWx = Wboth[..., na:, :]
        else:
            Wx = _ifft(Psih_xh)

    if not rpadded and not mxu:   # mxu path already unpadded via `keep`
        Wx = Wx[..., n1:n1 + N]
        if derivative:
            dWx = dWx[..., n1:n1 + N]
    if not l1_norm:
        root = jnp.sqrt(scales).astype(Wx.real.dtype)[:, None]
        Wx = Wx * root
        if derivative:
            dWx = dWx * root
    return (Wx, dWx) if derivative else (Wx, None)


def cwt(x, wavelet="gmw", scales="log-piecewise", fs=None, t=None, nv=32,
        l1_norm=True, derivative=False, padtype="reflect", rpadded=False,
        vectorized=True, astensor=True, cache_wavelet=None, order=0,
        average=None, nan_checks=None, patience=0, dtype=None):
    """Continuous Wavelet Transform (reference parity: _cwt.py:12-318).

    `vectorized`, `astensor`, `patience` are accepted for API
    compatibility; on TPU the transform is always a single vectorized
    program and XLA owns planning/caching.

    `cache_wavelet=True` (reference Psih cache, wavelets.py:135-159;
    its published benchmarks run with it on) folds a HOST-sampled
    filterbank into the compiled program as a constant, skipping the
    per-call psih evaluation. Measured: ~2 ms standalone at
    (300, 131072) but only ~0.3 ms in situ — XLA overlaps the VPU
    sampling with the MXU stages. Effective on the planar MXU path;
    numerics may differ from in-trace sampling at ~1 ulp (host libm vs
    XLA transcendentals). Default None = off.

    Returns (Wx, scales) or (Wx, scales, dWx) if `derivative`.
    """
    if isinstance(order, (tuple, list, range)) or order > 0:
        return cwt_higher_order(
            x, wavelet=wavelet, order=order, average=average, scales=scales,
            fs=fs, t=t, nv=nv, l1_norm=l1_norm, derivative=derivative,
            padtype=padtype, rpadded=rpadded, nan_checks=nan_checks,
            dtype=dtype)

    x = jnp.asarray(x)
    if nan_checks is None or nan_checks:
        x = jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)
    dtype = dtype or DEFAULTS["dtype"]
    x = x.astype(dtype)

    N = x.shape[-1]
    dt, fs, _ = process_fs_and_t(fs, t, N)
    if not isinstance(scales, str):
        nv = None

    wavelet = Wavelet.build(wavelet, l1_norm=l1_norm)
    scales_arr = process_scales(scales, N, wavelet, nv=nv)

    if padtype is not None:
        xp, _, n1, _ = padsignal(x, padtype, get_params=True)
    else:
        xp, n1 = x, 0

    from ..utils.common import warn_hbm_budget
    warn_hbm_budget(N, len(scales_arr),
                    batch=int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1,
                    derivative=derivative, what="cwt")

    from .fft_mxu import use_mxu_fft, best_split
    from ..config import use_pallas_kernels
    fb_token = None
    if cache_wavelet:
        M = xp.shape[-1]
        if (str(dtype) == "float32" and use_mxu_fft() and
                best_split(M) is not None and _psih_is_real(wavelet)):
            fb_token = _cache_filterbank(
                wavelet, np.asarray(scales_arr).squeeze(-1), M)
    out = cwt_core(xp, jnp.asarray(scales_arr.squeeze(-1), dtype=dtype),
                   jnp.asarray(dt, dtype=dtype), wavelet=wavelet,
                   derivative=derivative, l1_norm=l1_norm, N=N, n1=n1,
                   rpadded=rpadded,
                   engines=(use_mxu_fft(), use_pallas_kernels()),
                   fb_token=fb_token)
    scales_out = scales_arr.squeeze()
    if derivative:
        return out[0], scales_out, out[1]
    return out[0], scales_out


def cwt_higher_order(x, wavelet="gmw", order=1, average=None, **kw):
    """CWT with higher-order GMWs; tuple `order` optionally averaged
    (reference parity: _cwt.py:515-608)."""
    if isinstance(order, (list, range)):
        order = tuple(order)
    single = not isinstance(order, tuple)
    orders = (order,) if single else order

    wavelet = Wavelet.build(wavelet, l1_norm=kw.get("l1_norm", True))
    if wavelet.name != "gmw":
        raise ValueError("`wavelet` must be GMW for higher-order transforms "
                         f"(got {wavelet.name})")
    wavopts = wavelet.config
    wavopts.pop("order", None)

    # fix scales from the zeroth-order wavelet so all orders share a grid
    scales = kw.pop("scales", "log-piecewise")
    if isinstance(scales, str):
        wav0 = Wavelet.build(("gmw", dict(order=0, **wavopts)))
        scales = process_scales(scales, np.asarray(x).shape[-1], wav0,
                                nv=kw.pop("nv", 32))
    else:
        kw.pop("nv", None)

    derivative = kw.get("derivative", False)
    Wx_all, dWx_all = [], []
    for k in orders:
        wav_k = Wavelet.build(("gmw", dict(order=int(k), **wavopts)))
        out = cwt(x, wav_k, scales=scales, **kw)
        Wx_all.append(out[0])
        if derivative:
            dWx_all.append(out[-1])

    if (average or (average is None and not single)) and len(Wx_all) > 1:
        Wx_all = jnp.mean(jnp.stack(Wx_all), axis=0)
        if derivative:
            dWx_all = jnp.mean(jnp.stack(dWx_all), axis=0)
    elif len(Wx_all) == 1:
        Wx_all = Wx_all[0]
        if derivative:
            dWx_all = dWx_all[0]

    scales_out = np.asarray(scales).squeeze()
    return ((Wx_all, scales_out, dWx_all) if derivative else
            (Wx_all, scales_out))


# -- inverse --------------------------------------------------------------------
def _icwt_norm(scaletype: str, l1_norm: bool):
    """(reference: _cwt.py:483-492)"""
    if l1_norm:
        return (lambda s: 1.0) if scaletype == "log" else (lambda s: s)
    if scaletype == "log":
        return lambda s: s**0.5
    return lambda s: s**1.5


def icwt(Wx, wavelet="gmw", scales="log-piecewise", nv=None, one_int=True,
         x_len=None, x_mean=0, padtype="reflect", rpadded=False, l1_norm=True):
    """Inverse CWT via one- or two-integral formula
    (reference parity: _cwt.py:321-492). Supports leading batch dims for
    both integral forms (the reference is 1D-only here, _cwt.py:344)."""
    Wx = jnp.asarray(Wx)
    *_, na, n = Wx.shape
    x_len = x_len or n
    if not isinstance(scales, (np.ndarray, jnp.ndarray)) and nv is None:
        nv = 32

    wavelet = Wavelet.build(wavelet, l1_norm=l1_norm)
    scales, scaletype, _, nv = process_scales(scales, x_len, wavelet, nv=nv,
                                              get_params=True)
    assert len(scales) == na, f"{len(scales)} != {na}"

    if scaletype == "log-piecewise":
        idx = logscale_transition_idx(scales)
        # x_mean added ONCE after combining the two log segments — the
        # reference passes it into both recursive calls and adds it
        # twice (_cwt.py:421-427); documented divergence (bug fix)
        kw = dict(wavelet=wavelet, one_int=one_int, x_len=x_len,
                  x_mean=0, padtype=padtype, rpadded=rpadded,
                  l1_norm=l1_norm)
        x = icwt(Wx[..., :idx, :], scales=scales[:idx], **kw)
        x = x + icwt(Wx[..., idx:, :], scales=scales[idx:], **kw)
        return x + x_mean

    scales_1d = jnp.asarray(scales.squeeze(-1), dtype=Wx.real.dtype)
    if one_int:
        x = _icwt_1int(Wx, scales_1d, scaletype, l1_norm)
    else:
        x = _icwt_2int(Wx, scales_1d, scaletype, l1_norm, wavelet, x_len,
                       padtype, rpadded)

    Cpsi = adm_ssq(wavelet) if one_int else adm_cwt(wavelet)
    if scaletype == "log":
        x = x * ((2 / Cpsi) * np.log(2 ** (1 / nv)))
    else:
        x = x * ((2 / Cpsi) * np.pi / 4)
    return x + x_mean


def _icwt_1int(Wx, scales, scaletype, l1_norm):
    """One-integral iCWT (analytic wavelets): sum over scales of
    Re(Wx)/norm (reference: _cwt.py:477-480)."""
    norm = _icwt_norm(scaletype, l1_norm)
    return (Wx.real / norm(scales[:, None])).sum(axis=-2)


def _icwt_2int(Wx, scales, scaletype, l1_norm, wavelet, x_len, padtype,
               rpadded):
    """Double-integral iCWT (reference: _cwt.py:454-474), vectorized over
    scales."""
    if not rpadded:
        Wx, n_up, n1, _ = padsignal(Wx, padtype=padtype, get_params=True)
    else:
        n_up, n1 = Wx.shape[-1], 0

    norm = _icwt_norm(scaletype, l1_norm)
    pn = (-1.0) ** jnp.arange(n_up)
    Psih = wavelet.sample(scales, n_up, xp=jnp, nohalf=True) * pn
    xa = jnp.fft.ifft(jnp.fft.fft(Wx, axis=-1) * Psih, axis=-1)
    xa = jnp.fft.ifftshift(xa, axes=-1)
    x = (xa.real / norm(scales[:, None])).sum(axis=-2)
    return x[..., n1:n1 + x_len]
