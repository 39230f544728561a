"""Fused Pallas STFT-family kernels (hop=1 fast paths).

Three kernels, all built on the same trick — the tile's signal window
is copied to VMEM once and the Hankel frame matrix is built with n_fft
STATIC row slices (trace-time unrolled), so the (n_fft, n_out) frame
matrix never exists in HBM (383 MB at 598x160k on the XLA path, written
by a sequential scan and re-read by the HIGHEST dot's passes):

  * `stft_dft_fused` — framing + the stacked windowed-DFT matmuls.
    Measured: stft 21.0 -> 7.9 ms, stft+derivative 20.5 -> 14.3 ms.
  * `istft_ola_fused` — the mirror direction: irfft matmul +
    overlap-add in VMEM (two adjacent column blocks per tile cover the
    OLA window for n_fft <= 1025). Honest result: 18.2 -> 17.5 ms
    (istft is bounded by c64->plane conversion + inherent 2x block
    reads); round trip 27.6 -> 21.2 ms.
  * `ssq_stft_fused` — the WHOLE ssq_stft hot path in one kernel:
    frames + DFT + phase transform + analytic binning + one-hot
    reassignment; the Sx/dSx planes are produced and consumed in VMEM.
    ssq_stft end-to-end 38.2 -> 34.0 ms (4.68x vs the published GPU
    baseline). Possible because this family is column-tiled exactly
    like the reassignment kernel (the CWT path is row-tiled — no such
    fusion exists there; see docs/DESIGN.md).

Matmuls run in bf16x6 (Mosaic supports only DEFAULT dot precision;
3-way splits of both operands give ~5e-7 relative — 2-way splits cap at
~2^-18 ~ 5e-6, measured right AT the validation bar). All kernels are
linear in their data inputs; custom_vjp backwards are MANUAL adjoints
(transpose of framing = overlap-add and vice versa) on the production
scan helpers at HIGHEST precision.

Reference behavior covered: the modulated windowed rfft + derivative
window of old/ssqueezepy/_stft.py:127-147 (matrices folded host-side by
ops/stft._dft_matrix) and the fused phase+bin+scatter of
old/ssqueezepy/algos.py:859-984.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import interpret_mode

__all__ = ["stft_dft_fused", "stft_fused_ok", "istft_ola_fused",
           "istft_fused_ok", "ssq_stft_fused", "ssq_stft_fused_ok"]


def _pad8(n):
    return -(-n // 8) * 8


def _pad128(n):
    return -(-n // 128) * 128


def _tile() -> int:
    # measured at 598x160k: T=256 7.94 ms, 512 9.03, 1024 8.86 (T=128
    # compiles pathologically); env knob for A/B (trace-time read —
    # separate processes, like the other kernel flags)
    import os
    return int(os.environ.get("SSQ_TPU_STFT_TILE", "256"))


def _stft_fused_bytes(n_fft: int, Mp: int, kmats: int) -> int:
    """VMEM estimate: signal row + W consts + F scratch + outputs.
    Uses the SAME tile the kernel will use (env knob included), and
    charges the LARGER of the dot6/dot1 working sets (dot1's 6x-stacked
    W cat equals dot6's three splits in bytes, but its in-kernel
    _xcat6 concat adds a (6*nf_pad, T) bf16 operand — review r3)."""
    T = _tile()
    nf_pad = _pad128(n_fft)
    rows = _pad8(kmats * (n_fft // 2 + 1))
    return (2 * _pad128(Mp) * 4            # signal row (2x-buffered)
            + 3 * rows * nf_pad * 2 * 2    # W hi/mid/lo bf16 (const)
            + (T + nf_pad) * 4 * 2         # y window
            + nf_pad * T * 4 * 3           # F f32 + bf16 splits
            + 6 * nf_pad * T * 2           # dot1: _xcat6 concat operand
            + 3 * rows * T * 4             # live dot products
            + 2 * rows * T * 4 * 2)        # output block, 2x-buffered


def stft_fused_ok(n_fft: int, Mp: int, kmats: int) -> bool:
    return _stft_fused_bytes(n_fft, Mp, kmats) < 100 * 1024 * 1024


def _split3_bf16_np(a):
    """3-way bf16 split: a ~ hi + mid + lo to ~2^-27 relative."""
    import ml_dtypes
    a64 = a.astype(np.float64)
    hi = a.astype(ml_dtypes.bfloat16)
    r1 = a64 - hi.astype(np.float64)
    mid = r1.astype(ml_dtypes.bfloat16)
    lo = (r1 - mid.astype(np.float64)).astype(ml_dtypes.bfloat16)
    return hi, mid, lo


@functools.lru_cache(maxsize=64)
def _w_consts(k_bytes, rows, n_fft):
    """(rows_pad, nf_pad) bf16 hi/mid/lo W matrix from host K^T bytes."""
    K_T = np.frombuffer(k_bytes, np.float32).reshape(rows, n_fft)
    W = np.zeros((_pad8(rows), _pad128(n_fft)), np.float32)
    W[:rows, :n_fft] = K_T
    return _split3_bf16_np(W)


def _cat6_np(Wh, Wm, Wl):
    """Stacked-contraction ("dot1") constant: the bf16x6 6-dot sum is ONE
    dot with 6x contraction depth, [Wh|Wh|Wh|Wm|Wm|Wl] @
    [xh;xm;xl;xh;xm;xh] (same trick as fft_pallas._fused_consts_cat —
    the kernels are dot-issue-bound, not MAC-bound)."""
    return np.concatenate([Wh, Wh, Wh, Wm, Wm, Wl], axis=1)


def _xcat6(X, axis=0, f32=False):
    """In-kernel data side of _cat6_np: 3-way bf16 split concatenated as
    [xh;xm;xl;xh;xm;xh] along the contraction axis. f32=True casts the
    splits back up (identical values) for the CPU interpret path."""
    xh = X.astype(jnp.bfloat16)
    r1 = X - xh.astype(jnp.float32)
    xm = r1.astype(jnp.bfloat16)
    xl = (r1 - xm.astype(jnp.float32)).astype(jnp.bfloat16)
    cat = jnp.concatenate([xh, xm, xl, xh, xm, xh], axis=axis)
    return cat.astype(jnp.float32) if f32 else cat


_DUMMY_W = np.zeros((8, 128), np.float32)  # placeholder operand (stacked)


def stft_impl(default: str = "dot6") -> str:
    """MXU issue pattern for the STFT-family kernels — 'dot6' (6 dots
    per bf16x6 matmul) or 'dot1' (stacked-contraction single dot; same
    MACs, one MXU issue). Read at CALL time and threaded as a static
    jit arg (like fft_pallas.fft_impl), so in-process switching is safe.

    Per-kernel defaults from the r4 on-chip A/B (healthy relay, K=8,
    docs/DESIGN.md "dot-variant A/B results"): stft 7.82/7.90 and
    ssq-mega 33.27/33.25 are NEUTRAL (keep dot6); istft is 14.30 vs
    10.43 — dot1 wins 27%, so istft_ola_fused passes default='dot1'.
    The env var, when set, overrides every kernel."""
    import os
    v = os.environ.get("SSQ_TPU_STFT_IMPL", default)
    if v not in ("dot6", "dot1"):
        raise ValueError(f"SSQ_TPU_STFT_IMPL={v!r}: want dot6|dot1")
    return v


def _frames_dft_into(dst, x_ref, j, y_ref, f_ref, wh_ref, wm_ref, wl_ref,
                     n_fft, nf_pad, T, impl="dot6", interp=False):
    """Shared kernel block: Hankel frame build (one dynamic copy of the
    tile's signal window, then n_fft STATIC row slices — trace-time
    unrolled) followed by the bf16x6 stacked windowed-DFT dots,
    accumulated into `dst` one at a time ('dot6') or issued as ONE
    stacked-contraction dot ('dot1', wh_ref holds the _cat6_np constant
    and wm/wl hold dummies). bf16x6 = 3-way splits of both operands,
    dropping terms below 2^-27 (~1e-8 relative, well inside the 5e-6
    bar the HIGHEST XLA path was validated against; 2-way splits cap at
    ~2^-18 ~ 5e-6, measured right AT the bar)."""
    Y = T + nf_pad
    y_ref[0, :] = x_ref[0, 0, pl.ds(j * T, Y)]
    y = y_ref[0]
    for r in range(n_fft):
        f_ref[r, :] = y[r:r + T]
    if nf_pad > n_fft:   # zero pad rows once (W cols there are 0 too)
        f_ref[n_fft:, :] = jnp.zeros((nf_pad - n_fft, T), jnp.float32)

    X = f_ref[:]
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    if impl == "dot1":
        w = wh_ref[:].astype(jnp.float32) if interp else wh_ref[:]
        dst[:] = d(w, _xcat6(X, axis=0, f32=interp))
        return
    xh = X.astype(jnp.bfloat16)
    r1 = X - xh.astype(jnp.float32)
    xm = r1.astype(jnp.bfloat16)
    xl = (r1 - xm.astype(jnp.float32)).astype(jnp.bfloat16)
    dst[:] = d(wh_ref[:], xh)
    dst[:] += d(wh_ref[:], xm)
    dst[:] += d(wh_ref[:], xl)
    dst[:] += d(wm_ref[:], xh)
    dst[:] += d(wm_ref[:], xm)
    dst[:] += d(wl_ref[:], xh)


def _make_kernel(n_fft, nf_pad, T, impl, interp):
    def kernel(x_ref, wh_ref, wm_ref, wl_ref, out_ref, y_ref, f_ref):
        _frames_dft_into(out_ref.at[0], x_ref, pl.program_id(1), y_ref,
                         f_ref, wh_ref, wm_ref, wl_ref, n_fft, nf_pad, T,
                         impl, interp)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_fft", "rows", "n_out",
                                             "impl", "interpret"))
def _stft_fused_call(xp, Wh, Wm, Wl, *, n_fft, rows, n_out, impl,
                     interpret):
    """xp: (B, Mp) f32 padded signal; returns (B, rows, n_out) f32 —
    the stacked [Sr; Si(; dSr; dSi)] planes (hop = 1)."""
    B, Mp = xp.shape
    T = _tile()
    nT = -(-n_out // T)
    nf_pad = _pad128(n_fft)
    rows_pad = _pad8(rows)
    # every tile reads Y = T + nf_pad samples from j*T; pad the signal so
    # the last tile's window stays in range (tail columns are dropped)
    need = (nT - 1) * T + T + nf_pad
    Mp_pad = _pad128(max(need, Mp))
    # (B, 1, Mp_pad): the per-step block (1, 1, Mp_pad) then EQUALS the
    # trailing array dims (Mosaic's block rule rejects (1, Mp) blocks of
    # a (B, Mp) array for B > 1)
    xp = jnp.pad(xp, ((0, 0), (0, Mp_pad - Mp)))[:, None, :]

    kernel = _make_kernel(n_fft, nf_pad, T, impl, interpret)
    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, Mp_pad), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Wh.shape, lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Wm.shape, lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Wl.shape, lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_pad, T), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows_pad, nT * T), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, T + nf_pad), jnp.float32),
                        pltpu.VMEM((nf_pad, T), jnp.float32)],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))),
    )(xp, Wh, Wm, Wl)
    return out[:, :rows, :n_out]


@functools.lru_cache(maxsize=64)
def _w_consts_cat(k_bytes, rows, n_fft):
    """dot1 constant: _cat6_np of the bf16 splits (rows_pad, 6*nf_pad)."""
    return _cat6_np(*_w_consts(k_bytes, rows, n_fft))


def stft_dft_fused(xp, K_T_np, n_fft: int, n_out: int, interpret=None,
                   impl=None):
    """Fused framing + windowed-DFT matmuls for hop=1.

    xp: (..., Mp) f32 padded signal; K_T_np: HOST (rows, n_fft) f32
    stacked DFT matrices ([Sr; Si(; dSr; dSi)] rows). Returns
    (..., rows, n_out) f32. Linear in xp; differentiable via custom_vjp
    (transpose through the same XLA einsum the fallback path uses).
    """
    if interpret is None:
        interpret = interpret_mode()
    if impl is None:
        impl = stft_impl()
    rows = K_T_np.shape[0]
    k_bytes = K_T_np.astype(np.float32).tobytes()
    if impl == "dot1":
        Wh = _w_consts_cat(k_bytes, rows, n_fft)
        Wm = Wl = _DUMMY_W
    else:
        Wh, Wm, Wl = _w_consts(k_bytes, rows, n_fft)
    batch = xp.shape[:-1]
    Mp = xp.shape[-1]
    # contract required by the custom_vjp backward, which rebuilds the
    # input cotangent at exactly this length (ADVICE r2): a longer xp
    # would pass forward but break under jax.grad
    if Mp != n_out + n_fft - 1:
        raise ValueError(
            f"stft_dft_fused requires xp.shape[-1] == n_out + n_fft - 1 "
            f"(= {n_out + n_fft - 1}); got {Mp}")
    b = int(np.prod(batch)) if batch else 1
    out = _stft_fused_vjp(
        (n_fft, rows, n_out, impl, interpret, k_bytes),
        xp.reshape(b, Mp), jnp.asarray(Wh), jnp.asarray(Wm),
        jnp.asarray(Wl))
    return out.reshape(batch + (rows, n_out))


# -- autodiff: the kernel is LINEAR in xp -------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stft_fused_vjp(static, xp, Wh, Wm, Wl):
    n_fft, rows, n_out, impl, interpret, _ = static
    return _stft_fused_call(xp, Wh, Wm, Wl, n_fft=n_fft, rows=rows,
                            n_out=n_out, impl=impl, interpret=interpret)


def _stft_fused_fwd(static, xp, Wh, Wm, Wl):
    # no residuals: the kernel is linear in xp and every shape is
    # derivable from `static` + the cotangent
    return _stft_fused_vjp(static, xp, Wh, Wm, Wl), None


def _stft_fused_bwd(static, res, g):
    """Manual adjoint (the framing scan is not linear_transpose-able):
    the transpose of framing IS overlap-add — gx[n] = sum_t
    g_frames[t, n - t] — preceded by the transposed DFT matmul.
    Scan-based OLA (ops/stft.overlap_add) and HIGHEST precision so TPU
    gradients keep f32 accuracy (DEFAULT dots are single-pass bf16)."""
    n_fft, rows, n_out, impl, _, k_bytes = static
    wh_shape = (_pad8(rows), _pad128(n_fft))
    K_T = np.frombuffer(k_bytes, np.float32).reshape(rows, n_fft)

    g_frames = jnp.einsum("fk,bfn->bkn", jnp.asarray(K_T), g,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    from .stft import overlap_add
    ones = jnp.ones((n_fft,), jnp.float32)
    gx = overlap_add(g_frames, ones, 1, n_fft, n_out + n_fft - 1,
                     win_exp=0)
    if impl == "dot1":
        zc = jnp.zeros((wh_shape[0], 6 * wh_shape[1]), jnp.bfloat16)
        zd = jnp.zeros(_DUMMY_W.shape, jnp.float32)
        return (gx, zc, zd, zd)
    z = jnp.zeros(wh_shape, jnp.bfloat16)
    return (gx, z, z, z)


_stft_fused_vjp.defvjp(_stft_fused_fwd, _stft_fused_bwd)


# -- fused istft: irfft matmul + overlap-add in VMEM (hop=1) ------------------
def istft_fused_ok(n_fft: int) -> bool:
    """Gate: the OLA window (T + n_fft - 1 columns) must fit in two
    adjacent 1024-column blocks. VMEM at the cap (n_fft=1025), worst
    case impl=dot1: Fcat ~12.8 MB + X12 concat ~25.6 MB + v scratch
    ~8.5 MB + 4 column blocks ~8.5 MB ~= 55 MB — inside the 110 MB
    limit for BOTH impls, so no impl-dependent gate is needed."""
    return n_fft <= 1024 + 1


def _make_istft_kernel(n_fft, T, impl="dot6", interp=False):
    off = T - n_fft + 1           # window start inside the 2-block view
    Wd = n_fft - 1 + T            # window width
    Wd_pad = _pad128(Wd)
    # end-align the 128-padded slice inside the 2T view (off + Wd_pad
    # can overshoot 2T); the OLA shifts below absorb the delta
    off2 = 2 * T - Wd_pad
    delta = off - off2

    def kernel(sra_ref, srb_ref, sia_ref, sib_ref, frh_ref, frm_ref,
               frl_ref, fsh_ref, fsm_ref, fsl_ref, out_ref, v_ref):
        # 2-block column window of the Sx planes
        Sr = jnp.concatenate([sra_ref[0], srb_ref[0]], axis=-1)
        Si = jnp.concatenate([sia_ref[0], sib_ref[0]], axis=-1)
        Xr = jax.lax.slice_in_dim(Sr, off2, off2 + Wd_pad, axis=-1)
        Xi = jax.lax.slice_in_dim(Si, off2, off2 + Wd_pad, axis=-1)

        def split3(X):
            h = X.astype(jnp.bfloat16)
            r1 = X - h.astype(jnp.float32)
            m = r1.astype(jnp.bfloat16)
            l = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
            return h, m, l

        d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

        def acc6(wh, wm, wl, X, sgn):
            xh, xm, xl = split3(X)
            v_ref[:] += sgn * d(wh[:], xh)
            v_ref[:] += sgn * d(wh[:], xm)
            v_ref[:] += sgn * d(wh[:], xl)
            v_ref[:] += sgn * d(wm[:], xh)
            v_ref[:] += sgn * d(wm[:], xm)
            v_ref[:] += sgn * d(wl[:], xh)

        # v = (w^e * irfft(+fftshift)) per column: Fr'@Sr - Fs'@Si
        if impl == "dot1":
            # ONE stacked dot: [Fr6 | -Fs6] @ [Xr6; Xi6] (12x depth)
            X12 = jnp.concatenate([_xcat6(Xr, 0, interp),
                                   _xcat6(Xi, 0, interp)], axis=0)
            w = frh_ref[:].astype(jnp.float32) if interp else frh_ref[:]
            v_ref[:] = jnp.dot(w, X12,
                               preferred_element_type=jnp.float32)
        else:
            v_ref[:] = jnp.zeros_like(v_ref)
            acc6(frh_ref, frm_ref, frl_ref, Xr, 1.0)
            acc6(fsh_ref, fsm_ref, fsl_ref, Xi, -1.0)

        # overlap-add: out[c] = sum_t v[t, delta + (n_fft - 1 - t) + c]
        # — n_fft STATIC shifted row slices (trace-time unrolled)
        V = v_ref[:]
        acc = jax.lax.slice_in_dim(V[n_fft - 1], delta, delta + T)
        for t in range(n_fft - 1):
            s = delta + n_fft - 1 - t
            acc = acc + jax.lax.slice_in_dim(V[t], s, s + T)
        out_ref[0, 0, :] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("n_fft", "n_segs", "impl",
                                             "interpret"))
def _istft_fused_call(Sr, Si, Frh, Frm, Frl, Fsh, Fsm, Fsl, *, n_fft,
                      n_segs, impl, interpret):
    """Sr/Si: (B, n_freqs, n_segs) f32 planes; F*: (n_fft_pad,
    n_freqs_pad) bf16 splits of the w^e-scaled irfft matrices. Returns
    (B, n_segs + n_fft - 1) f32 overlap-added signal (pre-norm)."""
    B, n_freqs, _ = Sr.shape
    T = 1024
    L = n_segs + n_fft - 1
    nT = -(-L // T)
    n_freqs_pad = _pad8(n_freqs)
    # left-pad one full block (zero contributions for columns < 0),
    # right-pad so block j+1 of the last tile exists
    total = (nT + 1) * T
    pads = ((0, 0), (0, n_freqs_pad - n_freqs), (T, total - T - n_segs))
    Sr = jnp.pad(Sr, pads)
    Si = jnp.pad(Si, pads)

    n_fft_pad = _pad8(n_fft)
    kernel = _make_istft_kernel(n_fft, T, impl, interpret)
    blkA = pl.BlockSpec((1, n_freqs_pad, T), lambda b, j: (b, 0, j),
                        memory_space=pltpu.VMEM)
    blkB = pl.BlockSpec((1, n_freqs_pad, T), lambda b, j: (b, 0, j + 1),
                        memory_space=pltpu.VMEM)
    cspec = lambda W: pl.BlockSpec(W.shape, lambda b, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    Wd_pad = _pad128(n_fft - 1 + T)
    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[blkA, blkB, blkA, blkB,
                  cspec(Frh), cspec(Frm), cspec(Frl),
                  cspec(Fsh), cspec(Fsm), cspec(Fsl)],
        out_specs=pl.BlockSpec((1, 1, T), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, nT * T), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_fft_pad, Wd_pad), jnp.float32)],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))),
    )(Sr, Sr, Si, Si, Frh, Frm, Frl, Fsh, Fsm, Fsl)
    return out[:, 0, :L]


@functools.lru_cache(maxsize=64)
def _istft_consts(fr_bytes, fs_bytes, n_fft, n_freqs):
    """bf16 3-way splits of the (w^e-scaled) irfft matrices, padded to
    (n_fft_pad8, n_freqs_pad8)."""
    def prep(b):
        F = np.frombuffer(b, np.float32).reshape(n_fft, n_freqs)
        Fp = np.zeros((_pad8(n_fft), _pad8(n_freqs)), np.float32)
        Fp[:n_fft, :n_freqs] = F
        return _split3_bf16_np(Fp)
    return prep(fr_bytes), prep(fs_bytes)


@functools.lru_cache(maxsize=64)
def _istft_consts_cat(fr_bytes, fs_bytes, n_fft, n_freqs):
    """dot1 constant: [Fr6 | -Fs6] (n_fft_pad8, 12*n_freqs_pad8) — the
    acc6 signs folded into the stacked operand."""
    (FrS, FsS) = _istft_consts(fr_bytes, fs_bytes, n_fft, n_freqs)
    return np.concatenate([_cat6_np(*FrS), -_cat6_np(*FsS)], axis=1)


def istft_ola_fused(Sx, Fr_np, Fs_np, n_fft: int, interpret=None,
                    impl=None):
    """Fused irfft-matmul + overlap-add for hop=1 (the OLA window never
    exists in HBM; see module docstring). Sx: (..., n_freqs, n_segs)
    complex64; Fr/Fs: HOST (n_fft, n_freqs) f32 matrices with the
    window^win_exp factor already folded into their rows. Returns
    (..., n_segs + n_fft - 1) f32 pre-normalization OLA output.
    Linear in Sx (custom_vjp, transpose via the XLA path)."""
    if interpret is None:
        interpret = interpret_mode()
    if impl is None:
        impl = stft_impl(default="dot1")   # r4 A/B: 10.43 vs 14.30 ms
    batch = Sx.shape[:-2]
    n_freqs, n_segs = Sx.shape[-2:]
    b = int(np.prod(batch)) if batch else 1
    Sr = Sx.real.astype(jnp.float32).reshape(b, n_freqs, n_segs)
    Si = Sx.imag.astype(jnp.float32).reshape(b, n_freqs, n_segs)
    fr_bytes = Fr_np.astype(np.float32).tobytes()
    fs_bytes = Fs_np.astype(np.float32).tobytes()
    if impl == "dot1":
        Frh = _istft_consts_cat(fr_bytes, fs_bytes, n_fft, n_freqs)
        Frm = Frl = Fsh = Fsm = Fsl = _DUMMY_W
    else:
        (Frh, Frm, Frl), (Fsh, Fsm, Fsl) = _istft_consts(
            fr_bytes, fs_bytes, n_fft, n_freqs)
    out = _istft_fused_vjp(
        (n_fft, n_segs, impl, interpret, fr_bytes, fs_bytes),
        Sr, Si, jnp.asarray(Frh), jnp.asarray(Frm), jnp.asarray(Frl),
        jnp.asarray(Fsh), jnp.asarray(Fsm), jnp.asarray(Fsl))
    return out.reshape(batch + (n_segs + n_fft - 1,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _istft_fused_vjp(static, Sr, Si, Frh, Frm, Frl, Fsh, Fsm, Fsl):
    n_fft, n_segs, impl, interpret, _, _ = static
    return _istft_fused_call(Sr, Si, Frh, Frm, Frl, Fsh, Fsm, Fsl,
                             n_fft=n_fft, n_segs=n_segs, impl=impl,
                             interpret=interpret)


def _istft_fused_fwd(static, Sr, Si, *Fs):
    return _istft_fused_vjp(static, Sr, Si, *Fs), None


def _istft_fused_bwd(static, res, g):
    """Manual adjoint (the OLA scan is not linear_transpose-able):
    the transpose of overlap-add IS framing — g_xbuf[t, n] = g[n + t] —
    followed by the transposed irfft matmuls. Scan-based framing
    (frames_T_scan; an unrolled slice stack compiles for minutes) and
    HIGHEST precision so TPU gradients keep f32 accuracy."""
    n_fft, n_segs, impl, _, fr_bytes, fs_bytes = static
    n_freqs = len(np.frombuffer(fr_bytes, np.float32)) // n_fft
    Fr = np.frombuffer(fr_bytes, np.float32).reshape(n_fft, n_freqs)
    Fs = np.frombuffer(fs_bytes, np.float32).reshape(n_fft, n_freqs)

    from .stft import frames_T_scan
    g_xbuf = frames_T_scan(g, n_fft, 1)           # (B, n_fft, n_segs)
    hp = jax.lax.Precision.HIGHEST
    gSr = jnp.einsum("tk,btn->bkn", jnp.asarray(Fr), g_xbuf,
                     precision=hp, preferred_element_type=jnp.float32)
    gSi = -jnp.einsum("tk,btn->bkn", jnp.asarray(Fs), g_xbuf,
                      precision=hp, preferred_element_type=jnp.float32)
    if impl == "dot1":
        zc = jnp.zeros((_pad8(n_fft), 12 * _pad8(n_freqs)), jnp.bfloat16)
        zd = jnp.zeros(_DUMMY_W.shape, jnp.float32)
        return (gSr, gSi, zc, zd, zd, zd, zd, zd)
    zb = jnp.zeros((_pad8(n_fft), _pad8(n_freqs)), jnp.bfloat16)
    return (gSr, gSi, zb, zb, zb, zb, zb, zb)


_istft_fused_vjp.defvjp(_istft_fused_fwd, _istft_fused_bwd)


# -- fully fused ssq_stft: frames + DFT + phase + bin + scatter ---------------
def _make_ssq_stft_kernel(n_fft, nf_pad, T, nf, nf8, mode, params, gamma,
                          flipud, n_valid, impl="dot6", interp=False):
    """One kernel = the whole ssq_stft hot path per time tile: Hankel
    frame build, the 4 stacked windowed-DFT matmuls (Sx, dSx planes),
    the phase transform + analytic linear binning, and the one-hot
    reassignment accumulate — Sx/dSx planes never round-trip HBM
    between the STFT and the squeezing (they are produced AND consumed
    in VMEM)."""
    from .reassign_pallas import _band_mode, _bin_indices

    def kernel(x_ref, fs_ref, wh_ref, wm_ref, wl_ref, const_ref, sfs_ref,
               txr_ref, txi_ref, sxr_ref, sxi_ref, y_ref, f_ref, s_ref,
               k_ref, vr_ref, vi_ref):
        j = pl.program_id(1)
        _frames_dft_into(s_ref, x_ref, j, y_ref, f_ref, wh_ref, wm_ref,
                         wl_ref, n_fft, nf_pad, T, impl, interp)

        S = s_ref[:]
        fsv = fs_ref[0, 0, 0]
        sxr = S[0:nf8]
        sxi = S[nf8:2 * nf8]
        dsr = S[2 * nf8:3 * nf8] * fsv
        dsi = S[3 * nf8:] * fsv
        sxr_ref[0] = sxr
        sxi_ref[0] = sxi

        # reassignment (see reassign_pallas._make_kernel; rows beyond nf
        # come from zero-padded W rows -> mag2 = 0 -> masked out)
        k, mask = _bin_indices(mode, params, gamma, flipud, "stft", nf,
                               T, n_valid, sxr, sxi, dsr, dsi,
                               sfs_ref[:], tile_idx=j)
        cb = const_ref[:]
        k_ref[:] = k
        vr_ref[:] = jnp.where(mask, sxr * cb, 0.0)
        vi_ref[:] = jnp.where(mask, sxi * cb, 0.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nf8, T), 0)
        txr_ref[0] = jnp.zeros((nf8, T), jnp.float32)
        txi_ref[0] = jnp.zeros((nf8, T), jnp.float32)

        from .reassign_pallas import _group_mode
        G = _group_mode()

        def full_loop():
            def contrib(i):
                ki = k_ref[pl.ds(i, 1), :]
                onehot = rows == ki
                return (jnp.where(onehot, vr_ref[pl.ds(i, 1), :], 0.0),
                        jnp.where(onehot, vi_ref[pl.ds(i, 1), :], 0.0))

            if G > 1:
                # grouped accumulate (reassign_pallas._group_mode): G
                # rows summed in vregs, one output += per group — the
                # loop is output-RMW-bound (r5 ablation)
                def body(g, _):
                    i0 = g * G
                    pr, pi = contrib(i0)
                    for c in range(1, G):
                        nr, ni = contrib(i0 + c)
                        pr, pi = pr + nr, pi + ni
                    txr_ref[0] += pr
                    txi_ref[0] += pi
                    return 0

                jax.lax.fori_loop(0, nf // G, body, 0)
                for i in range((nf // G) * G, nf):
                    pr, pi = contrib(i)
                    txr_ref[0] += pr
                    txi_ref[0] += pi
            else:
                # interleave compute and store per plane: emitting both
                # where-values before either `+=` keeps two (nf8, T)
                # temps live across the RMW and Mosaic spills them to
                # VMEM (bisected on the cwt kernel's noise path, r5)
                def body(i, _):
                    ki = k_ref[pl.ds(i, 1), :]
                    onehot = rows == ki
                    txr_ref[0] += jnp.where(onehot,
                                            vr_ref[pl.ds(i, 1), :], 0.0)
                    txi_ref[0] += jnp.where(onehot,
                                            vi_ref[pl.ds(i, 1), :], 0.0)
                    return 0

                jax.lax.fori_loop(0, nf, body, 0)

        # banded fast path (r4; see reassign_pallas._band_mode and
        # DESIGN.md "Banded reassignment"): long STFT tones/chirps band
        # ~94-97% of tiles (host tile-stats, N=16k); short off-bin
        # tones at default gamma scatter leakage-bin w estimates and
        # fall back — gamma masking restores banding. Linear binning
        # clips junk w to the 0 / nf-1 EDGES, so the static strip
        # splits across BOTH edges (cwt puts it all at the flipud end).
        # BITWISE-equal on both branches — the banded loop performs the
        # same adds in the same row order, skipping only adds that are
        # identically zero.
        band = _band_mode()
        if band is not None:
            S_all, B0 = band
            SLO = ((S_all // 2) // 8) * 8        # bottom strip [0, SLO)
            SHI = S_all - SLO
            hi0 = (max(nf - SHI, 0) // 8) * 8    # top strip [hi0, nf8)
            Bp = B0 + 8
        if (band is not None and SLO >= 8
                and hi0 - Bp > SLO and nf >= S_all + B0 + 16):
            vr_all = vr_ref[:]
            vi_all = vi_ref[:]
            mag = vr_all * vr_all + vi_all * vi_all   # 0 where masked
            src = (k >= SLO) & (k < hi0)              # k=-1 excluded
            wts = jnp.where(src, mag, 0.0)
            tot = jnp.maximum(jnp.sum(wts), 1e-30)
            c = jnp.sum(wts * k.astype(wts.dtype)) / tot
            lo = jnp.clip(
                (jnp.floor(c - B0 / 2).astype(jnp.int32) // 8) * 8,
                SLO, hi0 - Bp)
            lo = pl.multiple_of(lo, 8)   # Mosaic can't prove clip((x//8)*8)
            oob = src & ((k < lo) | (k >= lo + Bp))
            nbad = jnp.sum(oob.astype(jnp.int32))
            # mag overflow -> c NaN -> all NaN compares false -> oob
            # empty with undefined lo; force the full loop then (see
            # reassign_pallas banded branch).
            banded_ok = (nbad == 0) & jnp.isfinite(c)

            @pl.when(banded_ok)
            def _():
                rows_b = (jax.lax.broadcasted_iota(
                    jnp.int32, (Bp, T), 0) + lo)
                rows_lo = jax.lax.broadcasted_iota(jnp.int32, (SLO, T), 0)
                rows_hi = (jax.lax.broadcasted_iota(
                    jnp.int32, (nf8 - hi0, T), 0) + hi0)

                def contrib_b(i):
                    ki = k_ref[pl.ds(i, 1), :]
                    vri = vr_ref[pl.ds(i, 1), :]
                    vii = vi_ref[pl.ds(i, 1), :]
                    ob = rows_b == ki
                    ol = rows_lo == ki
                    oh = rows_hi == ki
                    return (jnp.where(ob, vri, 0.0),
                            jnp.where(ob, vii, 0.0),
                            jnp.where(ol, vri, 0.0),
                            jnp.where(ol, vii, 0.0),
                            jnp.where(oh, vri, 0.0),
                            jnp.where(oh, vii, 0.0))

                def flush_b(p):
                    txr_ref[0, pl.ds(lo, Bp), :] += p[0]
                    txi_ref[0, pl.ds(lo, Bp), :] += p[1]
                    txr_ref[0, pl.ds(0, SLO), :] += p[2]
                    txi_ref[0, pl.ds(0, SLO), :] += p[3]
                    txr_ref[0, pl.ds(hi0, nf8 - hi0), :] += p[4]
                    txi_ref[0, pl.ds(hi0, nf8 - hi0), :] += p[5]

                if G > 1:
                    def body(g, _):
                        i0 = g * G
                        parts = contrib_b(i0)
                        for c in range(1, G):
                            nxt = contrib_b(i0 + c)
                            parts = tuple(a + b
                                          for a, b in zip(parts, nxt))
                        flush_b(parts)
                        return 0

                    jax.lax.fori_loop(0, nf // G, body, 0)
                    for i in range((nf // G) * G, nf):
                        flush_b(contrib_b(i))
                else:
                    # interleaved compute/store (see full_loop note)
                    def body(i, _):
                        ki = k_ref[pl.ds(i, 1), :]
                        vri = vr_ref[pl.ds(i, 1), :]
                        vii = vi_ref[pl.ds(i, 1), :]
                        ob = rows_b == ki
                        txr_ref[0, pl.ds(lo, Bp), :] += jnp.where(
                            ob, vri, 0.0)
                        txi_ref[0, pl.ds(lo, Bp), :] += jnp.where(
                            ob, vii, 0.0)
                        ol = rows_lo == ki
                        txr_ref[0, pl.ds(0, SLO), :] += jnp.where(
                            ol, vri, 0.0)
                        txi_ref[0, pl.ds(0, SLO), :] += jnp.where(
                            ol, vii, 0.0)
                        oh = rows_hi == ki
                        txr_ref[0, pl.ds(hi0, nf8 - hi0), :] += jnp.where(
                            oh, vri, 0.0)
                        txi_ref[0, pl.ds(hi0, nf8 - hi0), :] += jnp.where(
                            oh, vii, 0.0)
                        return 0

                    jax.lax.fori_loop(0, nf, body, 0)

            @pl.when(jnp.logical_not(banded_ok))
            def _():
                full_loop()
        else:
            full_loop()

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "n_fft", "nf", "n_out", "mode", "plan", "gamma_f", "flipud",
    "impl", "interpret"))
def _ssq_stft_fused_call(xp, fs, Wh, Wm, Wl, const_arr, Sfs, *, n_fft, nf,
                         n_out, mode, plan, gamma_f, flipud, impl,
                         interpret):
    """xp: (B, Mp) f32 padded signal. Returns (txr, txi, sxr, sxi) each
    (B, nf, n_out) f32. W consts are per-matrix padded to nf8 rows
    (4 * nf8 total, [Sr; Si; dSr; dSi] blocks)."""
    B, Mp = xp.shape
    T = _tile()
    nT = -(-n_out // T)
    nf_pad = _pad128(n_fft)
    nf8 = _pad8(nf)
    need = (nT - 1) * T + T + nf_pad
    Mp_pad = _pad128(max(need, Mp))
    xp = jnp.pad(xp, ((0, 0), (0, Mp_pad - Mp)))[:, None, :]

    kernel = _make_ssq_stft_kernel(n_fft, nf_pad, T, nf, nf8, mode,
                                   dict(plan), gamma_f, flipud,
                                   n_valid=n_out, impl=impl,
                                   interp=interpret)
    wspec = lambda W: pl.BlockSpec(W.shape, lambda b, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    colspec = pl.BlockSpec((nf8, 1), lambda b, j: (0, 0),
                           memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((1, nf8, T), lambda b, j: (b, 0, j),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, Mp_pad), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec(Wh), wspec(Wm), wspec(Wl), colspec, colspec,
        ],
        out_specs=(out3, out3, out3, out3),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, nf8, nT * T), jnp.float32)
            for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((1, T + nf_pad), jnp.float32),
                        pltpu.VMEM((nf_pad, T), jnp.float32),
                        pltpu.VMEM((4 * nf8, T), jnp.float32),
                        pltpu.VMEM((nf8, T), jnp.int32),
                        pltpu.VMEM((nf8, T), jnp.float32),
                        pltpu.VMEM((nf8, T), jnp.float32)],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))),
    )(xp, jnp.broadcast_to(jnp.asarray(fs, jnp.float32).reshape(1, 1, 1),
                           (1, 1, 128)),
      Wh, Wm, Wl,
      jnp.pad(const_arr.astype(jnp.float32), (0, nf8 - nf))[:, None],
      jnp.pad(Sfs.astype(jnp.float32), (0, nf8 - nf))[:, None])
    return tuple(o[:, :nf, :n_out] for o in outs)


@functools.lru_cache(maxsize=32)
def _ssq_w_consts(k_bytes, n_freqs, n_fft):
    """W consts for the fused ssq_stft kernel: the 4 stacked matrices
    each padded to nf8 rows so the in-kernel block slices stay
    8-aligned."""
    K_T = np.frombuffer(k_bytes, np.float32).reshape(4 * n_freqs, n_fft)
    nf8 = _pad8(n_freqs)
    W = np.zeros((4 * nf8, _pad128(n_fft)), np.float32)
    for m in range(4):
        W[m * nf8:m * nf8 + n_freqs, :n_fft] = \
            K_T[m * n_freqs:(m + 1) * n_freqs]
    return _split3_bf16_np(W)


def ssq_stft_fused_ok(n_fft: int, Mp: int) -> bool:
    """VMEM gate for the MEGA kernel: the stft-shaped estimate PLUS the
    mega extras (S scratch 4*nf8*T, k/vr/vi, one-hot temporaries),
    summed against the single kernel limit — gating the two pieces
    independently let 110-130 MB combinations through to a Mosaic
    compile error (review r3)."""
    T = _tile()
    nf8 = _pad8(n_fft // 2 + 1)
    extra = (4 * nf8 * T * 4          # S scratch
             + 3 * nf8 * T * 4        # k / vr / vi scratches
             + 14 * nf8 * T * 4)      # _bin_indices + one-hot + banded
                                      # detector temporaries (mag/wts/oob)
    return (_stft_fused_bytes(n_fft, Mp, 4) + extra) < 110 * 1024 * 1024


# -- autodiff: backward delegates to the differentiable two-kernel route ------
@functools.lru_cache(maxsize=32)
def _ssq_w_consts_cat(k_bytes, n_freqs, n_fft):
    """dot1 constant for the mega kernel (4*nf8, 6*nf_pad)."""
    return _cat6_np(*_ssq_w_consts(k_bytes, n_freqs, n_fft))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ssq_mega_vjp(static, xp, fs, Wh, Wm, Wl, const_arr, Sfs):
    (n_fft, nf, n_out, mode, plan, gamma_f, flipud, impl, interpret,
     _k_bytes) = static
    return _ssq_stft_fused_call(xp, fs, Wh, Wm, Wl, const_arr, Sfs,
                                n_fft=n_fft, nf=nf, n_out=n_out,
                                mode=mode, plan=plan, gamma_f=gamma_f,
                                flipud=flipud, impl=impl,
                                interpret=interpret)


def _ssq_mega_fwd(static, xp, fs, Wh, Wm, Wl, const_arr, Sfs):
    out = _ssq_mega_vjp(static, xp, fs, Wh, Wm, Wl, const_arr, Sfs)
    return out, (xp, fs, const_arr, Sfs)


def _ssq_mega_bwd(static, res, g):
    """Gradient via the two-kernel route (stft_dft_fused +
    reassign_pallas), whose custom VJPs define the piecewise-constant-bin
    semantics; same math, so cotangents match the fused forward."""
    (n_fft, nf, n_out, mode, plan, gamma_f, flipud, impl, interpret,
     k_bytes) = static
    xp, fs, const_arr, Sfs = res
    K_T = np.frombuffer(k_bytes, np.float32).reshape(4 * nf, n_fft)

    def ref(xp, fs):
        from .reassign_pallas import reassign_pallas
        planes = stft_dft_fused(xp, K_T, n_fft, n_out,
                                interpret=interpret, impl=impl)
        sxr, sxi = planes[:, :nf], planes[:, nf:2 * nf]
        dsr = planes[:, 2 * nf:3 * nf] * fs
        dsi = planes[:, 3 * nf:] * fs
        Tx = reassign_pallas((sxr, sxi), (dsr, dsi), const_arr, gamma_f,
                             Sfs, dict(plan), mode=mode, flipud=flipud,
                             transform="stft", nf=nf, interpret=interpret)
        return Tx.real, Tx.imag, sxr, sxi

    _, vjp = jax.vjp(ref, xp, fs)
    gxp, gfs = vjp(g)
    if impl == "dot1":
        zc = jnp.zeros((4 * _pad8(nf), 6 * _pad128(n_fft)), jnp.bfloat16)
        zd = jnp.zeros(_DUMMY_W.shape, jnp.float32)
        return (gxp, gfs, zc, zd, zd, jnp.zeros_like(const_arr),
                jnp.zeros_like(Sfs))
    zW = jnp.zeros((4 * _pad8(nf), _pad128(n_fft)), jnp.bfloat16)
    return (gxp, gfs, zW, zW, zW, jnp.zeros_like(const_arr),
            jnp.zeros_like(Sfs))


_ssq_mega_vjp.defvjp(_ssq_mega_fwd, _ssq_mega_bwd)


def ssq_stft_fused(xp, K_T_np, n_fft: int, n_out: int, fs, Sfs, const_arr,
                   gamma, plan_params, mode: str, flipud: bool,
                   interpret=None, impl=None):
    """Whole-pipeline fused ssq_stft (hop=1): returns complex
    (Tx, Sx) of shape (..., n_freqs, n_out). `K_T_np`: HOST
    (4*n_freqs, n_fft) stacked [Sr; Si; dSr; dSi] DFT matrices
    (fs NOT folded — passed as a runtime scalar). Differentiable
    (custom_vjp; backward runs the two-kernel route)."""
    if interpret is None:
        interpret = interpret_mode()
    if impl is None:
        impl = stft_impl()
    if xp.shape[-1] != n_out + n_fft - 1:
        # same custom_vjp shape contract as stft_dft_fused (ADVICE r2):
        # a longer xp passes the forward but breaks the backward
        raise ValueError(
            f"ssq_stft_fused requires xp.shape[-1] == n_out + n_fft - 1 "
            f"(= {n_out + n_fft - 1}); got {xp.shape[-1]}")
    n_freqs = K_T_np.shape[0] // 4
    k_bytes = K_T_np.astype(np.float32).tobytes()
    if impl == "dot1":
        Wh = _ssq_w_consts_cat(k_bytes, n_freqs, n_fft)
        Wm = Wl = _DUMMY_W
    else:
        Wh, Wm, Wl = _ssq_w_consts(k_bytes, n_freqs, n_fft)
    plan = tuple(sorted((k, float(v)) for k, v in plan_params.items()))
    batch = xp.shape[:-1]
    b = int(np.prod(batch)) if batch else 1
    txr, txi, sxr, sxi = _ssq_mega_vjp(
        (n_fft, n_freqs, n_out, mode, plan, float(gamma), bool(flipud),
         impl, interpret, k_bytes),
        xp.reshape(b, xp.shape[-1]), jnp.asarray(fs, jnp.float32),
        jnp.asarray(Wh), jnp.asarray(Wm), jnp.asarray(Wl),
        jnp.asarray(const_arr, jnp.float32),
        jnp.asarray(Sfs, jnp.float32))
    shp = batch + (n_freqs, n_out)
    Tx = jax.lax.complex(txr, txi).reshape(shp)
    Sx = jax.lax.complex(sxr, sxi).reshape(shp)
    return Tx, Sx
