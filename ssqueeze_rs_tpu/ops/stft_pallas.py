"""Fused Pallas windowed-DFT STFT kernel (hop=1 fast path).

The XLA matmul STFT materializes the (n_fft, n_out) frame matrix in HBM
(383 MB at 598x160k, written by a sequential scan, then re-read by the
dot's HIGHEST-precision passes). This kernel keeps framing entirely in
VMEM: per time tile it copies the tile's signal window (T + n_fft
samples) once, builds the Hankel frame matrix with n_fft STATIC row
slices (unrolled at trace time — no dynamic addressing in the loop),
and runs the windowed-DFT matmuls in bf16x6 (Mosaic supports only
DEFAULT dot precision; 3-way splits of both operands give ~5e-7
relative, well inside the 5e-6 bar the HIGHEST XLA path was validated
against). HBM traffic collapses to the signal (read once) + the output
planes. Measured at 598 x 160k hop=1: stft 21.0 -> 9.0 ms,
stft+derivative 20.5 -> 14.3 ms, ssq_stft end-to-end 46 -> 36.5 ms.

Reference behavior covered: the modulated windowed rfft + derivative
window of old/ssqueezepy/_stft.py:127-147 (matrices folded host-side by
ops/stft._dft_matrix).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import interpret_mode

__all__ = ["stft_dft_fused", "stft_fused_ok"]


def _pad8(n):
    return -(-n // 8) * 8


def _pad128(n):
    return -(-n // 128) * 128


def stft_fused_ok(n_fft: int, Mp: int, kmats: int) -> bool:
    """VMEM feasibility: signal row + W consts + F scratch + outputs."""
    T = 512
    nf_pad = _pad128(n_fft)
    rows = _pad8(kmats * (n_fft // 2 + 1))
    vmem = (2 * _pad128(Mp) * 4            # signal row (2x-buffered)
            + 3 * rows * nf_pad * 2 * 2    # W hi/mid/lo bf16 (const)
            + (T + nf_pad) * 4 * 2         # y window
            + nf_pad * T * 4 * 3           # F f32 + bf16 splits
            + 3 * rows * T * 4             # live dot products
            + 2 * rows * T * 4 * 2)        # output block, 2x-buffered
    return vmem < 100 * 1024 * 1024


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


def _make_kernel(n_fft, nf_pad, T, rows_pad):
    Y = T + nf_pad

    def kernel(x_ref, wh_ref, wm_ref, wl_ref, out_ref, y_ref, f_ref):
        j = pl.program_id(1)
        # one dynamic copy of the tile's signal window, then the Hankel
        # frame build is n_fft STATIC row slices (trace-time unrolled)
        y_ref[0, :] = x_ref[0, 0, pl.ds(j * T, Y)]
        y = y_ref[0]
        for r in range(n_fft):
            f_ref[r, :] = y[r:r + T]
        if nf_pad > n_fft:   # zero pad rows once (W cols there are 0 too,
            f_ref[n_fft:, :] = jnp.zeros((nf_pad - n_fft, T), jnp.float32)

        X = f_ref[:]
        xh = X.astype(jnp.bfloat16)
        r1 = X - xh.astype(jnp.float32)
        xm = r1.astype(jnp.bfloat16)
        xl = (r1 - xm.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
        # bf16x6: 3-way splits of both operands, dropping terms below
        # 2^-27 — ~1e-8 relative, well inside the 5e-6 bar the HIGHEST
        # XLA path was validated against (a 2-way split caps at ~2^-18
        # ~ 5e-6, measured right AT the bar). The extra dots are free
        # (the kernel's MXU share is negligible).
        out_ref[0] = d(wh_ref[:], xh)
        out_ref[0] += d(wh_ref[:], xm)
        out_ref[0] += d(wh_ref[:], xl)
        out_ref[0] += d(wm_ref[:], xh)
        out_ref[0] += d(wm_ref[:], xm)
        out_ref[0] += d(wl_ref[:], xh)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_fft", "rows", "n_out",
                                             "interpret"))
def _stft_fused_call(xp, Wh, Wm, Wl, *, n_fft, rows, n_out, interpret):
    """xp: (B, Mp) f32 padded signal; returns (B, rows, n_out) f32 —
    the stacked [Sr; Si(; dSr; dSi)] planes (hop = 1)."""
    B, Mp = xp.shape
    T = 512
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

    kernel = _make_kernel(n_fft, nf_pad, T, rows_pad)
    out = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, Mp_pad), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Wh.shape, lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Wh.shape, lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(Wh.shape, lambda b, j: (0, 0),
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


def stft_dft_fused(xp, K_T_np, n_fft: int, n_out: int, interpret=None):
    """Fused framing + windowed-DFT matmuls for hop=1.

    xp: (..., Mp) f32 padded signal; K_T_np: HOST (rows, n_fft) f32
    stacked DFT matrices ([Sr; Si(; dSr; dSi)] rows). Returns
    (..., rows, n_out) f32. Linear in xp; differentiable via custom_vjp
    (transpose through the same XLA einsum the fallback path uses).
    """
    if interpret is None:
        interpret = interpret_mode()
    rows = K_T_np.shape[0]
    Wh, Wm, Wl = _w_consts(K_T_np.astype(np.float32).tobytes(), rows,
                           n_fft)
    batch = xp.shape[:-1]
    Mp = xp.shape[-1]
    b = int(np.prod(batch)) if batch else 1
    out = _stft_fused_vjp(
        (n_fft, rows, n_out, interpret,
         K_T_np.astype(np.float32).tobytes()),
        xp.reshape(b, Mp), jnp.asarray(Wh), jnp.asarray(Wm),
        jnp.asarray(Wl))
    return out.reshape(batch + (rows, n_out))


# -- autodiff: the kernel is LINEAR in xp -------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stft_fused_vjp(static, xp, Wh, Wm, Wl):
    n_fft, rows, n_out, interpret, _ = static
    return _stft_fused_call(xp, Wh, Wm, Wl, n_fft=n_fft, rows=rows,
                            n_out=n_out, interpret=interpret)


def _stft_fused_fwd(static, xp, Wh, Wm, Wl):
    # no residuals: the kernel is linear in xp and every shape is
    # derivable from `static` + the cotangent
    return _stft_fused_vjp(static, xp, Wh, Wm, Wl), None


def _stft_fused_bwd(static, res, g):
    n_fft, rows, n_out, _, k_bytes = static
    B = g.shape[0]
    xp_shape = jax.ShapeDtypeStruct((B, n_out + n_fft - 1), g.dtype)
    wh_shape = (_pad8(rows), _pad128(n_fft))
    K_T = np.frombuffer(k_bytes, np.float32).reshape(rows, n_fft)

    def ref(xp):
        # XLA reference: frames einsum (same math; used only for the
        # transpose — jax.linear_transpose never runs it forward)
        L = xp.shape[-1]
        n_segs = L - n_fft + 1
        idx_frames = jnp.stack(
            [jax.lax.slice_in_dim(xp, r, r + n_segs, axis=-1)
             for r in range(n_fft)], axis=-2)
        out = jnp.einsum("fk,bkn->bfn", jnp.asarray(K_T), idx_frames,
                         preferred_element_type=jnp.float32)
        return out[..., :n_out]

    (gx,) = jax.linear_transpose(ref, xp_shape)(g)
    z = jnp.zeros(wh_shape, jnp.bfloat16)
    return (gx, z, z, z)


_stft_fused_vjp.defvjp(_stft_fused_fwd, _stft_fused_bwd)
