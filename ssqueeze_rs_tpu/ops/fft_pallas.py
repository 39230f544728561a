"""Fused Pallas four-step half-band iFFT (planar).

The compute heart of the CWT path — what the reference does with
per-scale Rayon jobs + rustfft (rust/src/spectral/cwt.rs:228-310) and
batched scipy/pyfftw iFFTs (old/ssqueezepy/_cwt.py:165-175).

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

__all__ = ["ifft_halfband_planar_fused", "cwt_halfband_fused",
           "fused_ok"]


def _vmem_estimate(M: int, pipelines: int) -> int:
    """Rough per-grid-step VMEM footprint (bytes) of the fused kernel:
    stage operands/outputs (x pipelines) + shared constants + I/O blocks.
    The bench chip has 128 MB VMEM (measured: a 2^21 cwt-mode kernel
    was rejected at 150.5 MB)."""
    M1, M2 = best_split(M)
    per_pipe = (M1 * M2 * 4 * 2          # X f32 + bf16 splits (~half)
                + 2 * M1 * M2 * 4        # B1
                + M1 * 2 * M2 * 4 * 2    # C2 f32 + splits
                + M * 4)                 # OUT ~ (M1, 2R) ~ M f32
    consts = (2 * M1 * M1 * 2 * 2        # W1s hi/lo bf16
              + 2 * M1 * M2 * 4          # Tr, Ti f32
              + 2 * M * 2 * 2            # W2sT hi/lo ~ (2M2, 2R) bf16
              + M * 4 // 256)            # alt slice
    return pipelines * per_pipe + consts


def fused_ok(M: int, pipelines: int = 1) -> bool:
    """Kernel supports power-of-2 M with a near-square split, shapes big
    enough to tile the MXU (M >= 2^14), and a per-step working set that
    fits VMEM (128 MB on the bench chip; larger M falls back to the XLA
    planar engine)."""
    s = best_split(M)
    return (s is not None and M >= (1 << 14) and
            _vmem_estimate(M, pipelines) < 100 * 1024 * 1024)


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


# -- cwt-mode fused kernel: filterbank multiply + iFFT in one pass ------------
def _make_cwt_kernel(M1, M2, R, off, L, derivative):
    K1 = M1 // 2

    def pipeline(zr, zi, w1h, w1l, Tr, Ti, w2h, w2l):
        X = jnp.concatenate([zr, zi], axis=0)              # (2K1, M2)
        B1 = _dot3(w1h, w1l, X)                            # (2M1, M2)
        Br, Bi = B1[:M1], B1[M1:]
        C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                             axis=-1)                      # (M1, 2M2)
        OUT = _dot3_r(C2, w2h, w2l)                        # (M1, 2R)
        return OUT.T.reshape(2, R * M1)[:, off:off + L]

    def kernel(pw_ref, xr_ref, xi_ref, xig_ref, invdt_ref, nwr_ref,
               nwi_ref, ndr_ref, ndi_ref, w1h_ref, w1l_ref, tr_ref,
               ti_ref, w2h_ref, w2l_ref, alt_ref, owr_ref, owi_ref,
               odr_ref, odi_ref):
        p = pw_ref[0]                                      # (K1, M2)
        zr = p * xr_ref[:]
        zi = p * xi_ref[:]
        args = (w1h_ref[:], w1l_ref[:], tr_ref[:], ti_ref[:],
                w2h_ref[:], w2l_ref[:])
        alt = alt_ref[0]
        OW = pipeline(zr, zi, *args)
        owr_ref[0, 0] = OW[0] + nwr_ref[0, 0, 0] * alt
        owi_ref[0, 0] = OW[1] + nwi_ref[0, 0, 0] * alt
        if derivative:
            s = xig_ref[:] * invdt_ref[0, 0, 0]
            OD = pipeline(-zi * s, zr * s, *args)
            odr_ref[0, 0] = OD[0] + ndr_ref[0, 0, 0] * alt
            odi_ref[0, 0] = OD[1] + ndi_ref[0, 0, 0] * alt
        else:
            odr_ref[0, 0] = jnp.zeros((L,), jnp.float32)
            odi_ref[0, 0] = jnp.zeros((L,), jnp.float32)
    return kernel


@functools.partial(jax.jit, static_argnames=("M", "keep", "derivative",
                                             "interpret"))
def _cwt_fused_call(Pw, xr_g, xi_g, xig, inv_dt, nyq_w, nyq_d, *, M, keep,
                    derivative, interpret):
    na, K1, M2 = Pw.shape
    M1 = 2 * K1
    start, length = keep
    r0 = start // M1
    r1 = -(-(start + length) // M1)
    R = r1 - r0
    off = start - r0 * M1
    (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(M, r0, r1)
    alt_keep = alt[start:start + length][None, :]

    kernel = _make_cwt_kernel(M1, M2, R, off, length, derivative)
    row3 = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)
    constg = lambda i: (0, 0)
    lane = lambda v: jnp.broadcast_to(v[:, None, None], (na, 1, 128))
    scal = jnp.broadcast_to(inv_dt.reshape(1, 1, 1), (1, 1, 128))
    out3 = lambda: pl.BlockSpec((1, 1, length), row3,
                                memory_space=pltpu.VMEM)
    owr, owi, odr, odi = pl.pallas_call(
        kernel,
        grid=(na,),
        in_specs=[
            pl.BlockSpec((1, K1, M2), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, M2), constg, memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, M2), constg, memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, M2), constg, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec(W1h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W1h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(Tr.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(Ti.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W2h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W2h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, length), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(out3(), out3(), out3(), out3()),
        out_shape=tuple(jax.ShapeDtypeStruct((na, 1, length), jnp.float32)
                        for _ in range(4)),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))),
    )(Pw, xr_g, xi_g, xig, scal, lane(nyq_w[0]), lane(nyq_w[1]),
      lane(nyq_d[0]), lane(nyq_d[1]), jnp.asarray(W1h), jnp.asarray(W1l),
      jnp.asarray(Tr), jnp.asarray(Ti), jnp.asarray(W2h), jnp.asarray(W2l),
      jnp.asarray(alt_keep))
    return owr[:, 0], owi[:, 0], odr[:, 0], odi[:, 0]


def cwt_halfband_fused(Pw, xr_g, xi_g, xig, inv_dt, nyq_w, nyq_d,
                       keep=None, derivative=True, interpret=None):
    """Fully fused single-signal CWT core: filterbank multiply
    (Z = psih * xhat), the four-step half-band iFFT, unpad and Nyquist
    correction — one Pallas kernel, no Z materialization in HBM.

    Pw: (na, K1, M2) psih filterbank (transposed-grid layout,
    k = M2*k1 + k2); xr_g/xi_g: (K1, M2) signal spectrum planes;
    xig: (K1, M2) radian frequency grid; inv_dt: scalar 1/dt;
    nyq_w/nyq_d: ((na,), (na,)) Nyquist real/imag planes for Wx and dWx.
    Returns (Wxr, Wxi, dWxr, dWxi) each (na, L); the d planes are zeros
    when derivative=False.
    """
    if interpret is None:
        interpret = interpret_mode()
    na, K1, M2 = Pw.shape
    M = 2 * K1 * M2
    if keep is None:
        keep = (0, M)
    return _cwt_fused_call(Pw, xr_g, xi_g, xig, jnp.asarray(inv_dt),
                           nyq_w, nyq_d, M=M, keep=tuple(keep),
                           derivative=derivative, interpret=interpret)
