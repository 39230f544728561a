"""Sharded long-signal transforms with ICI halo exchange.

TPU-native replacement for the reference's dask `map_overlap` chunking
(tests/stft_test.py:262-269, tests/ssq_cwt_test.py:185-196; SURVEY §2.4 P9):
the time axis is sharded over a mesh axis, each shard fetches
window/wavelet halo samples from its neighbors via `lax.ppermute` (two
neighbor sends over ICI), transforms its extended segment, and trims the
halo. Global signal edges reflect-pad locally, matching
`boundary='reflect'`.

Exactness:
  * `chunked_stft` is BIT-EXACT vs the full-signal transform: a frame only
    needs n_fft-1 neighboring samples, all provided by the halo.
  * `chunked_cwt` / `chunked_ssq_cwt` are overlap-save approximations
    (wavelet support is infinite); error decays with `halo`. The reference
    dask scripts silently accept a fixed overlap — we size the halo from
    the wavelet's time support at the largest scale and let callers widen
    it (SURVEY §5 notes the reference's fixed-overlap approximation).
    Two inherent error sources bound the accuracy at any feasible halo:
    the largest scales' support, AND near-Nyquist scales whose psih is
    truncated at omega=pi — the truncation gives sinc-like ~1/t time
    tails, so the smallest scales of a high-Q wavelet (default gmw
    beta=60) carry ~1% segment error regardless of halo. Measured on
    N=4096/8 shards: max rel err 0.14 (halo=64) -> 0.055 (halo=448).

Reassignment is column-local (each time column scatters independently,
reference algos.py:183-192), so synchrosqueezing after halo-trim is exact
given the CWT columns.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: compiled pallas_call outputs carry no
        # varying-mesh-axes metadata, and the new checker rejects them
        # (TPU-only — interpret-mode Pallas lowers to jax ops and passes)
        try:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
        except TypeError:   # older jax without check_vma
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

from ..config import DEFAULTS, EPS32, EPS64
from ..scales import process_scales, process_fs_and_t
from ..utils.pad import pad_params
from ..utils.windows import get_window
from ..wavelets.base import Wavelet
from ..wavelets.props import time_resolution
from ..ops.stft import stft_core
from ..ops.cwt import cwt_core
from ..ops.ssqueeze import (ssqueeze, bin_params,
                            compute_associated_frequencies,
                            plan_reassignment)

__all__ = ["chunked_stft", "chunked_cwt", "chunked_ssq_cwt",
           "chunked_ssq_stft", "default_cwt_halo", "halo_extend"]


def halo_extend(xs, axis_name: str, n_shards: int, Hl: int, Hr: int):
    """Extend a local time shard with `Hl`/`Hr` halo samples from neighbors
    (reflect at global edges). xs: (..., S) -> (..., Hl + S + Hr)."""
    parts = [xs]
    idx = lax.axis_index(axis_name)
    if Hl > 0:
        right_perm = [(i, i + 1) for i in range(n_shards - 1)]
        left_recv = lax.ppermute(xs[..., -Hl:], axis_name, right_perm)
        refl_left = xs[..., 1:Hl + 1][..., ::-1]
        left = jnp.where(idx == 0, refl_left, left_recv)
        parts.insert(0, left)
    if Hr > 0:
        left_perm = [(i + 1, i) for i in range(n_shards - 1)]
        right_recv = lax.ppermute(xs[..., :Hr], axis_name, left_perm)
        refl_right = xs[..., -Hr - 1:-1][..., ::-1]
        right = jnp.where(idx == n_shards - 1, refl_right, right_recv)
        parts.append(right)
    return jnp.concatenate(parts, axis=-1)


def _specs(ndim_in, ndim_out, axis_name, batch_axis_name=None):
    in_spec = [None] * ndim_in
    in_spec[-1] = axis_name
    out_spec = [None] * ndim_out
    out_spec[-1] = axis_name
    if batch_axis_name is not None:
        in_spec[0] = batch_axis_name
        out_spec[0] = batch_axis_name
    return P(*in_spec), P(*out_spec)


def _check_divisible(N, n_shards, what="signal length"):
    if N % n_shards:
        raise ValueError(
            f"{what} ({N}) must be divisible by the time-mesh size "
            f"({n_shards}); pad or trim the signal")


# -- STFT ------------------------------------------------------------------
def chunked_stft(x, mesh: Mesh, window=None, n_fft=None, win_len=None,
                 hop_len=1, fs=None, modulated=True, derivative=False,
                 dtype=None, axis_name="time", batch_axis_name=None):
    """Time-sharded STFT, bit-exact vs `ops.stft` (reflect padtype).

    Halo = the global centered pad split: left n_fft//2, right
    n_fft-1-n_fft//2 — every frame sees exactly the samples the
    full-signal transform sees.
    """
    x = jnp.asarray(x)
    N = x.shape[-1]
    n_shards = mesh.shape[axis_name]
    _check_divisible(N, n_shards)
    S = N // n_shards
    if S % hop_len:
        raise ValueError(f"shard length ({S}) must be divisible by hop_len "
                         f"({hop_len})")
    _, fs, _ = process_fs_and_t(fs, None, N)
    n_fft = int(n_fft or min(N // hop_len, 512))
    if win_len is None:
        win_len = (len(window) if isinstance(window, np.ndarray) else n_fft)
    dtype = dtype or DEFAULTS["dtype"]
    window, diff_window = get_window(window, win_len, n_fft, derivative=True,
                                     dtype=dtype)
    x = x.astype(dtype)

    # global padlength = N + n_fft - 1 -> n1 = ceil((n_fft-1)/2)
    _, n1, n2 = pad_params(N, N + n_fft - 1)
    Hl, Hr = n1, n2
    if max(Hl, Hr) > S - 1:
        # the halo (reflect pad + frame overlap) would need samples from
        # beyond the NEIGHBOR shard; capping would break the bit-exactness
        # contract, so refuse loudly
        raise ValueError(
            f"n_fft={n_fft} needs a {max(Hl, Hr)}-sample halo but each of "
            f"the {n_shards} time shards holds only {S} samples; lower "
            f"n_fft, use fewer time shards, or process a longer signal")

    def shard_fn(xs):
        xe = halo_extend(xs, axis_name, n_shards, Hl, Hr)
        Sx, dSx = stft_core(xe, window, diff_window, float(fs), n_fft=n_fft,
                            hop_len=hop_len, modulated=modulated,
                            derivative=derivative)
        return (Sx, dSx) if derivative else Sx

    in_spec, out_spec = _specs(x.ndim, x.ndim + 1, axis_name,
                               batch_axis_name)
    out_specs = (out_spec, out_spec) if derivative else out_spec
    fn = shard_map(shard_fn, mesh, (in_spec,), out_specs)
    return fn(x)


# -- CWT ---------------------------------------------------------------------
def default_cwt_halo(wavelet: Wavelet, max_scale: float, n_std: float = 4.0,
                     N: int = 4096) -> int:
    """Halo sized from the wavelet's time std at the largest scale.

    std_t(scale) ~ scale * std_t(scale_ref)/scale_ref samples; the halo
    covers `n_std` standard deviations (the reference dask scripts use a
    fixed conservative overlap instead — SURVEY §5)."""
    sc = wavelet.scalec_ct
    std_ref = time_resolution(wavelet, scale=sc, N=N, nondim=False)
    return int(np.ceil(n_std * std_ref * max_scale / sc))


def _plan_cwt(x_shape, wavelet, scales, nv, fs, l1_norm=True):
    N = x_shape[-1]
    dt, fs, _ = process_fs_and_t(fs, None, N)
    wavelet = Wavelet.build(wavelet, l1_norm=l1_norm)
    scales_arr, scaletype, _, nv_out = process_scales(scales, N, wavelet,
                                                      nv=nv, get_params=True)
    return wavelet, scales_arr, scaletype, nv_out, dt, fs


def chunked_cwt(x, mesh: Mesh, wavelet="gmw", scales="log-piecewise", nv=32,
                fs=None, l1_norm=True, derivative=False, halo=None,
                dtype=None, axis_name="time", batch_axis_name=None):
    """Time-sharded CWT (overlap-save). Scales are planned from the GLOBAL
    signal length so rows match the full-signal transform (an improvement
    over the reference's per-chunk planning, tests/cwt_test.py:69-160)."""
    x = jnp.asarray(x)
    N = x.shape[-1]
    n_shards = mesh.shape[axis_name]
    _check_divisible(N, n_shards)
    S = N // n_shards
    dtype = dtype or DEFAULTS["dtype"]
    x = x.astype(dtype)

    wavelet, scales_arr, scaletype, nv, dt, fs = _plan_cwt(
        x.shape, wavelet, scales, nv, fs, l1_norm=l1_norm)
    if halo is None:
        halo = default_cwt_halo(wavelet, float(scales_arr.max()))
    H = int(min(halo, S - 1))

    Se = S + 2 * H
    n_up, p1, _ = pad_params(Se)  # p2up pad of the extended chunk
    scales_j = jnp.asarray(scales_arr.squeeze(-1), dtype=dtype)
    dt_j = jnp.asarray(dt, dtype=dtype)

    def shard_fn(xs):
        xe = halo_extend(xs, axis_name, n_shards, H, H)
        xp = jnp.pad(xe, [(0, 0)] * (xe.ndim - 1) + [(p1, n_up - Se - p1)],
                     mode="reflect")
        out = cwt_core(xp, scales_j, dt_j, wavelet=wavelet,
                       derivative=derivative, l1_norm=l1_norm, N=Se, n1=p1,
                       rpadded=False)
        Wx = out[0][..., H:H + S]
        if derivative:
            return Wx, out[1][..., H:H + S]
        return Wx

    in_spec, out_spec = _specs(x.ndim, x.ndim + 1, axis_name,
                               batch_axis_name)
    out_specs = (out_spec, out_spec) if derivative else out_spec
    fn = shard_map(shard_fn, mesh, (in_spec,), out_specs)
    out = fn(x)
    if derivative:
        return out[0], scales_arr.squeeze(), out[1]
    return out, scales_arr.squeeze()


# -- synchrosqueezed, chunked ---------------------------------------------------
def chunked_ssq_cwt(x, mesh: Mesh, wavelet="gmw", scales="log-piecewise",
                    nv=32, fs=None, maprange="peak", squeezing="sum",
                    gamma=None, flipud=True, halo=None, dtype=None,
                    axis_name="time", batch_axis_name=None):
    """Time-sharded synchrosqueezed CWT.

    CWT+derivative per shard with halo exchange; the reassignment scatter
    is per-time-column (reference algos.py:183-192), so squeezing the
    trimmed local columns is exact given local CWT columns. All planning
    (scales, ssq_freqs, const, gamma) is global so shards agree."""
    from ..ops.ssqueeze import reassign

    x = jnp.asarray(x)
    N = x.shape[-1]
    n_shards = mesh.shape[axis_name]
    _check_divisible(N, n_shards)
    S = N // n_shards
    dtype = dtype or DEFAULTS["dtype"]
    x = x.astype(dtype)

    wavelet, scales_arr, scaletype, nv, dt, fs = _plan_cwt(
        x.shape, wavelet, scales, nv, fs)
    if halo is None:
        halo = default_cwt_halo(wavelet, float(scales_arr.max()))
    H = int(min(halo, S - 1))
    Se = S + 2 * H
    n_up, p1, _ = pad_params(Se)

    # global ssq planning (reference: ssqueezing.py:124-188)
    ssq_freqs = compute_associated_frequencies(
        scales_arr, N, wavelet, scaletype, maprange, True, dt, "cwt")
    na = len(scales_arr)
    const_arr, mode, params = plan_reassignment(
        ssq_freqs, na, scaletype.startswith("log"), transform="cwt",
        cwt_scaletype=scaletype, nv=nv, scales=scales_arr)
    params = {k: (jnp.asarray(v) if k != "idx1" else
                  jnp.asarray(v, jnp.int32)) for k, v in params.items()}
    rdtype = jnp.float64 if dtype in ("float64", jnp.float64) else jnp.float32
    if gamma is None:
        gamma = 10 * (EPS64 if rdtype == jnp.float64 else EPS32)
    gamma_j = jnp.asarray(gamma, rdtype)
    const_j = jnp.asarray(const_arr, rdtype)
    Sfs_j = jnp.zeros((na,), rdtype)
    scales_j = jnp.asarray(scales_arr.squeeze(-1), dtype=dtype)
    dt_j = jnp.asarray(dt, dtype=dtype)
    nf = len(ssq_freqs)

    def shard_fn(xs):
        xe = halo_extend(xs, axis_name, n_shards, H, H)
        xp = jnp.pad(xe, [(0, 0)] * (xe.ndim - 1) + [(p1, n_up - Se - p1)],
                     mode="reflect")
        Wx, dWx = cwt_core(xp, scales_j, dt_j, wavelet=wavelet,
                           derivative=True, l1_norm=True, N=Se, n1=p1,
                           rpadded=False)
        Wx = Wx[..., H:H + S]
        dWx = dWx[..., H:H + S]
        Tx = reassign(Wx, dWx, const_j, gamma_j, Sfs_j, params, mode=mode,
                      flipud=flipud, fused=True, transform="cwt", nf=nf)
        return Tx, Wx

    in_spec, out_spec = _specs(x.ndim, x.ndim + 1, axis_name,
                               batch_axis_name)
    fn = shard_map(shard_fn, mesh, (in_spec,), (out_spec, out_spec))
    Tx, Wx = fn(x)
    ssq_freqs_out = ssq_freqs[::-1]  # cwt convention (ssqueezing.py:217-223)
    return Tx, Wx, ssq_freqs_out, scales_arr.squeeze()


def chunked_ssq_stft(x, mesh: Mesh, window=None, n_fft=None, win_len=None,
                     hop_len=1, fs=None, squeezing="sum", gamma=None,
                     flipud=False, dtype=None, axis_name="time",
                     batch_axis_name=None):
    """Time-sharded synchrosqueezed STFT (bit-exact STFT stage; column-local
    reassignment)."""
    from ..ops.ssqueeze import reassign
    from ..ops.ssq_stft import make_Sfs

    x = jnp.asarray(x)
    N = x.shape[-1]
    _, fs, _ = process_fs_and_t(fs, None, N)
    dtype = dtype or DEFAULTS["dtype"]
    n_fft = int(n_fft or min(N // hop_len, 512))
    nf = n_fft // 2 + 1

    Sfs = np.linspace(0, 0.5 * fs, nf,
                      dtype="float64" if dtype == "float64" else "float32")
    const_arr_stft, mode, params = plan_reassignment(Sfs, nf, False,
                                                     transform="stft")
    params = {k: jnp.asarray(v) for k, v in params.items()}
    const = float(const_arr_stft[0])
    rdtype = jnp.float64 if dtype in ("float64", jnp.float64) else jnp.float32
    if gamma is None:
        gamma = 10 * (EPS64 if rdtype == jnp.float64 else EPS32)

    n_shards = mesh.shape[axis_name]
    Sx, dSx = chunked_stft(x, mesh, window=window, n_fft=n_fft,
                           win_len=win_len, hop_len=hop_len, fs=fs,
                           modulated=True, derivative=True, dtype=dtype,
                           axis_name=axis_name,
                           batch_axis_name=batch_axis_name)

    # reassignment is column-local: shard_map over columns
    const_j = jnp.asarray(np.full(nf, const), rdtype)
    gamma_j = jnp.asarray(gamma, rdtype)
    Sfs_j = jnp.asarray(Sfs, rdtype)

    def squeeze_fn(Sx_l, dSx_l):
        return reassign(Sx_l, dSx_l, const_j, gamma_j, Sfs_j, params,
                        mode=mode, flipud=flipud, fused=True,
                        transform="stft", nf=nf)

    in_spec, out_spec = _specs(Sx.ndim, Sx.ndim, axis_name, batch_axis_name)
    fn = shard_map(squeeze_fn, mesh, (in_spec, in_spec), out_spec)
    Tx = fn(Sx, dSx)
    ssq_freqs = Sfs[::-1] if flipud else Sfs
    return Tx, Sx, ssq_freqs, Sfs
