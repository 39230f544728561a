"""Fused Pallas four-step half-band iFFT (planar).

The XLA planar four-step (ops/fft_mxu.py::ifft_mxu_halfband_planar) is
MEMORY-bound: its two stage matmuls take <1 ms of MXU time but every
stage materializes a ~1.2 GB intermediate in HBM (~7.5 GB of passes for
a (586, 2^18) transform). This kernel runs the whole pipeline per
spectrum row inside VMEM:

    stage-1 dot -> twiddle -> stage-2 dot -> unpad slice -> Nyquist add

so HBM traffic collapses to inputs (Z planes) + final unpadded outputs
(~2 GB total). Math identical to the XLA engine: flat split
k = M2*k1 + k2, n = n1 + M1*n2, stacked-real [[r,-i],[i,r]] matmuls.

Used by cwt_core's planar path on TPU (gated like the reassignment
kernel: interpret mode on CPU for tests).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft_mxu import best_split, _planar_consts, _alt_sign, _check_nyq
from ..config import interpret_mode

__all__ = ["ifft_halfband_planar_fused", "fused_ok"]


def fused_ok(M: int) -> bool:
    """Kernel supports power-of-2 M with a near-square split and shapes
    big enough to tile the MXU (M >= 2^14)."""
    s = best_split(M)
    return s is not None and M >= (1 << 14)


@functools.lru_cache(maxsize=32)
def _fused_consts(M: int, r0: int, r1: int):
    """Kernel constants derived from the SHARED XLA-engine constants
    (fft_mxu._planar_consts — single source of truth for the stacked-real
    stage matrices): W2s transposed for the in-kernel dot orientation,
    and both stage matrices bf16 hi/lo split for the explicit 3-pass
    f32-accurate matmul (Mosaic supports neither Precision.HIGH nor
    DotAlgorithm presets)."""
    W1s, Tr, Ti, W2s = _planar_consts(M, r0, r1)
    W2sT = np.ascontiguousarray(W2s.T)

    def split(a):
        import ml_dtypes
        hi = a.astype(ml_dtypes.bfloat16)
        lo = (a.astype(np.float64) - hi.astype(np.float64)).astype(
            ml_dtypes.bfloat16)
        return hi, lo

    return split(W1s), Tr, Ti, split(W2sT), _alt_sign(M)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(wh, wl, x):
    """f32-class (bf16x3) matmul: const operand pre-split host-side, data
    operand split in-kernel. Mosaic supports only DEFAULT precision, so
    the 3-pass decomposition is explicit."""
    xh, xl = _split_bf16(x)
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return d(wh, xh) + d(wh, xl) + d(wl, xh)


def _dot3_r(x, wh, wl):
    xh, xl = _split_bf16(x)
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return d(xh, wh) + d(xl, wh) + d(xh, wl)


def _make_kernel(M1, M2, R, off, L):
    def kernel(zr_ref, zi_ref, nyqr_ref, nyqi_ref, w1h_ref, w1l_ref,
               tr_ref, ti_ref, w2h_ref, w2l_ref, alt_ref, outr_ref,
               outi_ref):
        # stage 1: (2M1, M1) @ (M1, M2) — contraction = 2*K1 = M1
        X = jnp.concatenate([zr_ref[0], zi_ref[0]], axis=0)   # (M1, M2)
        B1 = _dot3(w1h_ref[:], w1l_ref[:], X)                 # (2M1, M2)
        Br, Bi = B1[:M1], B1[M1:]
        # twiddle + plane pairing on the k2 axis
        Tr, Ti = tr_ref[:], ti_ref[:]
        C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                             axis=-1)                         # (M1, 2M2)
        # stage 2: (M1, 2M2) @ (2M2, 2R)
        OUT = _dot3_r(C2, w2h_ref[:], w2l_ref[:])             # (M1, 2R)
        OUT = OUT.T.reshape(2, R * M1)                        # (2,(n2,n1))
        alt = alt_ref[0]                                      # (L,)
        outr_ref[0, 0] = OUT[0, off:off + L] + nyqr_ref[0, 0, 0] * alt
        outi_ref[0, 0] = OUT[1, off:off + L] + nyqi_ref[0, 0, 0] * alt
    return kernel


@functools.partial(jax.jit, static_argnames=("M", "keep", "interpret"))
def _fused_call(Zr, Zi, nyq_r, nyq_i, *, M, keep, interpret):
    B, K1, M2 = Zr.shape
    M1 = 2 * K1
    start, length = keep
    r0 = start // M1
    r1 = -(-(start + length) // M1)
    R = r1 - r0
    off = start - r0 * M1
    (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(M, r0, r1)
    alt_keep = alt[start:start + length][None, :]

    kernel = _make_kernel(M1, M2, R, off, length)
    row = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)
    outr, outi = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K1, M2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1, M2), row, memory_space=pltpu.VMEM),
            # (B, 1, 128) lane-padded scalars: Mosaic constrains the last
            # two block dims to (8,128)-divisible or full-array-equal
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(W1h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W1h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(Tr.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(Ti.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W2h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W2h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, length), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, length), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, length), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, 1, length), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, length), jnp.float32)),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))),
    )(Zr, Zi, jnp.broadcast_to(nyq_r[:, None, None], (B, 1, 128)),
      jnp.broadcast_to(nyq_i[:, None, None], (B, 1, 128)),
      jnp.asarray(W1h), jnp.asarray(W1l), jnp.asarray(Tr), jnp.asarray(Ti),
      jnp.asarray(W2h), jnp.asarray(W2l), jnp.asarray(alt_keep))
    return outr[:, 0], outi[:, 0]


def ifft_halfband_planar_fused(Zr, Zi, keep=None, nyq_r=None, nyq_i=None,
                               interpret=None):
    """Drop-in for fft_mxu.ifft_mxu_halfband_planar (same contract):
    Zr/Zi (B, K1, M2) f32 planes of the half spectrum, keep=(start, len),
    nyq planes (B,). Returns (xr, xi) (B, len) f32."""
    if interpret is None:
        interpret = interpret_mode()
    B, K1, M2 = Zr.shape
    M = 2 * K1 * M2
    if keep is None:
        keep = (0, M)
    nyq_r, nyq_i = _check_nyq(nyq_r, nyq_i, B, Zr.dtype)
    return _fused_call(Zr, Zi, nyq_r, nyq_i, M=M, keep=tuple(keep),
                       interpret=interpret)
