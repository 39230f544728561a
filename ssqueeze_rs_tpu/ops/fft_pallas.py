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
           "fused_ok", "fused_tiles"]


def _vmem_estimate(M: int, pipelines: int, tiles: int = 1) -> int:
    """Rough per-grid-step VMEM footprint (bytes) of the fused kernel.

    Mosaic DOUBLE-BUFFERS every input window whose index map varies
    across grid steps (measured: a tiles=2 2^21 kernel OOMed on
    2x-buffered bf16 W2 tile windows of 16 MB each); constants with a
    fixed index map are single-buffered. With tiles > 1 the k2 axis is
    split into M2/tiles columns per step and OUT accumulates in a VMEM
    scratch, so only the stage-1 matrix and the accumulator stay
    full-size. The bench chip has 128 MB VMEM; the untiled 2^21
    cwt-mode kernel was rejected at a measured 150.5 MB."""
    M1, M2 = best_split(M)
    Mt = M2 // tiles
    R2 = 2 * M2                          # worst-case 2R (keep ~ full M)
    # stage-2 live temporaries: the untiled kernel's single-expression
    # bf16x3 keeps 3 (M1, 2R) f32 products live (measured 52.9 MB of
    # kernel stack at 2R=3908); the tiled kernel adds dots into the
    # scratch one at a time, so 1 live temp + the accumulator.
    stage2 = (3 if tiles == 1 else 2) * M1 * R2 * 4
    per_pipe = (2 * M1 * Mt * 4 * 2      # zr/zi input windows, 2x-buffered
                + M1 * Mt * 6            # X f32 + bf16 splits
                + 2 * M1 * Mt * 4        # B1
                + M1 * 2 * Mt * 6        # C2 f32 + splits
                + stage2)
    buf_t = 2 if tiles > 1 else 1        # tile windows vary with t
    consts = (2 * M1 * M1 * 2 * 2        # W1s hi/lo bf16 (fixed map)
              + buf_t * 2 * M1 * Mt * 4  # Tr, Ti tiles f32
              + buf_t * 2 * 2 * Mt * R2 * 2   # W2 tile hi/lo bf16
              + M * 4)                   # alt row (1, L), L <= M
    # output windows: 2 planes per pipeline, (1, 1, L) f32, 2x-buffered
    # (measured: 2 x 8 MB per plane at L = 2e6 in the OOM dump)
    outs = 2 * pipelines * M * 4 * 2
    return pipelines * per_pipe + consts + outs


def fused_tiles(M: int, pipelines: int = 1):
    """Smallest power-of-2 k2-tiling factor that fits the fused kernel's
    working set in VMEM (100 MB estimator budget on a 128 MB chip —
    XLA reserves ~19 MB beyond the kernel's scoped allocation), or None
    when the shape is unsupported (non-power-of-2, too small to tile
    the MXU, or still too big at tiles=16). tiles=1 is the untiled
    fast path."""
    s = best_split(M)
    if s is None or M < (1 << 14):
        return None
    M2 = s[1]
    for t in (1, 2, 4, 8, 16):
        if M2 % t or (M2 // t) % 128:
            continue
        # untiled gets a higher budget: every admitted untiled config
        # (up to 2^19 x 2 pipelines, est 106 MB) is measured working on
        # hardware; tiled configs keep more headroom for XLA's ~19 MB
        # of non-kernel VMEM.
        budget = 108 if t == 1 else 100
        if _vmem_estimate(M, pipelines, t) < budget * 1024 * 1024:
            return t
    return None


def fused_ok(M: int, pipelines: int = 1) -> bool:
    """True when the fused kernel covers M (possibly k2-tiled)."""
    return fused_tiles(M, pipelines) is not None


@functools.lru_cache(maxsize=32)
def _fused_consts(M: int, r0: int, r1: int, tiles: int = 1):
    """Kernel constants derived from the SHARED XLA-engine constants
    (fft_mxu._planar_consts — single source of truth for the stacked-real
    stage matrices): W2s transposed for the in-kernel dot orientation,
    and both stage matrices bf16 hi/lo split for the explicit 3-pass
    f32-accurate matmul (Mosaic supports neither Precision.HIGH nor
    DotAlgorithm presets).

    With tiles > 1 the W2sT rows are reordered tile-major: C2 built from
    k2-column tile t is concat([real_t, imag_t]) along the contraction
    axis, so the matching W2sT rows (t-th real slice, then t-th imag
    slice) must be contiguous for the (t, 0)-indexed BlockSpec."""
    W1s, Tr, Ti, W2s = _planar_consts(M, r0, r1)
    W2sT = np.ascontiguousarray(W2s.T)
    if tiles > 1:
        M2 = W2sT.shape[0] // 2
        Mt = M2 // tiles
        order = np.concatenate(
            [np.r_[t * Mt:(t + 1) * Mt, M2 + t * Mt:M2 + (t + 1) * Mt]
             for t in range(tiles)])
        W2sT = np.ascontiguousarray(W2sT[order])

    def split(a):
        import ml_dtypes
        hi = a.astype(ml_dtypes.bfloat16)
        lo = (a.astype(np.float64) - hi.astype(np.float64)).astype(
            ml_dtypes.bfloat16)
        return hi, lo

    return split(W1s), Tr, Ti, split(W2sT), _alt_sign(M)


@functools.lru_cache(maxsize=32)
def _fused_consts_cat(M: int, r0: int, r1: int, tiles: int = 1):
    """Stacked-contraction ("dot1") stage constants: the bf16x3 3-dot sum
    wh@xh + wh@xl + wl@xh is ONE dot with 3x contraction depth,
    [wh | wh | wl] @ [xh; xl; xh].  Same MACs, one MXU issue instead of
    three, and a single f32 product temporary instead of three (the VMEM
    pressure that forced one-at-a-time accumulation in the tiled path).
    W1cat: (2M1, 3*2K1) bf16; W2cat: (3*2Mt*tiles..., 2R) stage-2 rows
    stacked [Wh; Wh; Wl] per-tile so the tiled BlockSpec still indexes
    contiguous row blocks."""
    (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(M, r0, r1, tiles)
    W1cat = np.concatenate([W1h, W1h, W1l], axis=1)
    if tiles == 1:
        W2cat = np.concatenate([W2h, W2h, W2l], axis=0)
    else:
        rows = W2h.shape[0] // tiles
        W2cat = np.concatenate(
            [np.concatenate([W2h[t * rows:(t + 1) * rows]] * 2
                            + [W2l[t * rows:(t + 1) * rows]], axis=0)
             for t in range(tiles)], axis=0)
    return W1cat, Tr, Ti, W2cat, alt


@functools.lru_cache(maxsize=32)
def _fused_consts_tcat(M: int, r0: int, r1: int):
    """Transposed stacked-contraction ("tmerged") constants. With every
    operand transposed the two stage dots produce OUT.T directly:

        B1T  = [xh|xl|xh] @ [W1h.T; W1h.T; W1l.T]        (M2, 2M1)
        OUTT = [W2h.T|W2h.T|W2l.T] @ [ch; cl; ch]        (2R, M1)

    so the kernel contains NO transposes — the per-row (M1, 2R) -> (2R,
    M1) VPU relayout of the dot3/dot1/merged epilogues disappears. The
    caller supplies Pw/x/xig in (.., M2, K1) layout (XLA fuses the
    transpose into the elementwise psih producer)."""
    (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(M, r0, r1, 1)
    W1Tcat = np.concatenate([W1h.T, W1h.T, W1l.T], axis=0)  # (3M1, 2M1)
    W2Tcat = np.concatenate([W2h.T, W2h.T, W2l.T], axis=1)  # (2R, 6M2)
    return (W1Tcat, np.ascontiguousarray(Tr.T),
            np.ascontiguousarray(Ti.T), W2Tcat, alt)


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


def _dot1(wcat, x, f32=False):
    """Single-dot bf16x3: wcat = [wh | wh | wl] host-stacked along the
    contraction axis; the data splits concat in-kernel as [xh; xl; xh].
    Numerically the same three products as _dot3, summed by the MXU's
    f32 accumulator instead of two VPU adds.  f32=True casts the bf16
    operands up before the dot (identical values — bf16 is exact in
    f32) for the CPU interpret path, whose DotThunk rejects some
    bf16 x bf16 -> f32 shapes."""
    xh, xl = _split_bf16(x)
    xcat = jnp.concatenate([xh, xl, xh], axis=0)
    if f32:
        wcat, xcat = wcat.astype(jnp.float32), xcat.astype(jnp.float32)
    return jnp.dot(wcat, xcat, preferred_element_type=jnp.float32)


def _dot1_r(x, wcat, f32=False):
    xh, xl = _split_bf16(x)
    xcat = jnp.concatenate([xh, xl, xh], axis=1)
    if f32:
        wcat, xcat = wcat.astype(jnp.float32), xcat.astype(jnp.float32)
    return jnp.dot(xcat, wcat, preferred_element_type=jnp.float32)


def _stage2_accumulate(acc_ref, zr, zi, t, w1h, w1l, Tr, Ti, w2h, w2l):
    """One k2 tile of the pipeline, accumulated into acc_ref (M1, 2R).
    The three bf16x3 stage-2 products are added into the scratch ONE AT
    A TIME: a single `a@b + a@c + d@b` expression keeps three (M1, 2R)
    f32 temporaries live at once (measured 52.9 MB of kernel stack at
    2R=3908), which dominated VMEM at large R."""
    X = jnp.concatenate([zr, zi], axis=0)                 # (M1, Mt)
    B1 = _dot3(w1h, w1l, X)                               # (2M1, Mt)
    M1 = X.shape[0]
    Br, Bi = B1[:M1], B1[M1:]
    C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                         axis=-1)                         # (M1, 2Mt)
    xh, xl = _split_bf16(C2)
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + d(xh, w2h)
    acc_ref[:] = acc_ref[:] + d(xl, w2h)
    acc_ref[:] = acc_ref[:] + d(xh, w2l)


def _stage2_accumulate1(acc_ref, zr, zi, t, w1c, Tr, Ti, w2c, interp):
    """dot1 variant of _stage2_accumulate: one stacked-contraction dot
    per stage (see _fused_consts_cat), one live f32 product."""
    X = jnp.concatenate([zr, zi], axis=0)                 # (M1, Mt)
    B1 = _dot1(w1c, X, f32=interp)                        # (2M1, Mt)
    M1 = X.shape[0]
    Br, Bi = B1[:M1], B1[M1:]
    C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                         axis=-1)                         # (M1, 2Mt)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + _dot1_r(C2, w2c, f32=interp)


def _make_kernel_tiled(M1, Mt, R, off, L, T, impl="dot3",
                       interp=False):
    """k2-tiled variant: grid=(B, T), t innermost. Each step processes
    Mt = M2/T spectrum columns and accumulates the partial stage-2
    product (M1, 2R) in a VMEM scratch; the transpose/unpad/Nyquist
    epilogue runs once at t == T-1. The output block index map is
    constant in t, so the block is revisited (stays in VMEM) until the
    batch row advances."""
    # (impl/interp threaded below — see _make_kernel for the variants)
    def kernel(zr_ref, zi_ref, nyqr_ref, nyqi_ref, *rest):
        t = pl.program_id(1)
        if impl == "dot3":
            (w1h_ref, w1l_ref, tr_ref, ti_ref, w2h_ref, w2l_ref,
             alt_ref, outr_ref, outi_ref, acc_ref) = rest
            _stage2_accumulate(acc_ref, zr_ref[0], zi_ref[0], t,
                               w1h_ref[:], w1l_ref[:], tr_ref[:],
                               ti_ref[:], w2h_ref[:], w2l_ref[:])
        else:
            (w1c_ref, tr_ref, ti_ref, w2c_ref,
             alt_ref, outr_ref, outi_ref, acc_ref) = rest
            _stage2_accumulate1(acc_ref, zr_ref[0], zi_ref[0], t,
                                w1c_ref[:], tr_ref[:], ti_ref[:],
                                w2c_ref[:], interp)

        @pl.when(t == T - 1)
        def _():
            OUT = acc_ref[:].T.reshape(2, R * M1)
            alt = alt_ref[0]
            outr_ref[0, 0] = OUT[0, off:off + L] + nyqr_ref[0, 0, 0] * alt
            outi_ref[0, 0] = OUT[1, off:off + L] + nyqi_ref[0, 0, 0] * alt
    return kernel


def _make_kernel(M1, M2, R, off, L, impl="dot3", interp=False):
    def kernel(zr_ref, zi_ref, nyqr_ref, nyqi_ref, *rest):
        # stage 1: (2M1, M1) @ (M1, M2) — contraction = 2*K1 = M1
        X = jnp.concatenate([zr_ref[0], zi_ref[0]], axis=0)   # (M1, M2)
        if impl == "dot3":
            (w1h_ref, w1l_ref, tr_ref, ti_ref, w2h_ref, w2l_ref,
             alt_ref, outr_ref, outi_ref) = rest
            B1 = _dot3(w1h_ref[:], w1l_ref[:], X)             # (2M1, M2)
        else:
            (w1c_ref, tr_ref, ti_ref, w2c_ref,
             alt_ref, outr_ref, outi_ref) = rest
            B1 = _dot1(w1c_ref[:], X, f32=interp)
        Br, Bi = B1[:M1], B1[M1:]
        # twiddle + plane pairing on the k2 axis
        Tr, Ti = tr_ref[:], ti_ref[:]
        C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                             axis=-1)                         # (M1, 2M2)
        # stage 2: (M1, 2M2) @ (2M2, 2R)
        if impl == "dot3":
            OUT = _dot3_r(C2, w2h_ref[:], w2l_ref[:])         # (M1, 2R)
        else:
            OUT = _dot1_r(C2, w2c_ref[:], f32=interp)
        OUT = OUT.T.reshape(2, R * M1)                        # (2,(n2,n1))
        alt = alt_ref[0]                                      # (L,)
        outr_ref[0, 0] = OUT[0, off:off + L] + nyqr_ref[0, 0, 0] * alt
        outi_ref[0, 0] = OUT[1, off:off + L] + nyqi_ref[0, 0, 0] * alt
    return kernel


@functools.partial(jax.jit, static_argnames=("M", "keep", "interpret",
                                              "tiles", "impl"))
def _fused_call(Zr, Zi, nyq_r, nyq_i, *, M, keep, interpret, tiles=1,
                impl="dot3"):
    B, K1, M2 = Zr.shape
    M1 = 2 * K1
    start, length = keep
    r0 = start // M1
    r1 = -(-(start + length) // M1)
    R = r1 - r0
    off = start - r0 * M1
    if impl in ("merged", "tmerged"):
        impl = "dot1"          # no second pipeline in the plain iFFT
    if impl == "dot3":
        (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(
            M, r0, r1, tiles)
        wmats = [W1h, W1l, Tr, Ti, W2h, W2l]
    else:
        W1c, Tr, Ti, W2c, alt = _fused_consts_cat(M, r0, r1, tiles)
        W1h, W2h = W1c, W2c
        wmats = [W1c, Tr, Ti, W2c]
    alt_keep = alt[start:start + length][None, :]
    T, Mt = tiles, M2 // tiles

    if T == 1:
        kernel = _make_kernel(M1, M2, R, off, length, impl, interpret)
        grid = (B,)
        row = lambda i: (i, 0, 0)
        const2 = lambda i: (0, 0)
        tile2 = const2
        zspec = pl.BlockSpec((1, K1, M2), row, memory_space=pltpu.VMEM)
        w2spec = pl.BlockSpec(W2h.shape, const2, memory_space=pltpu.VMEM)
        out_idx = lambda i: (i, 0, 0)
        scratch = []
    else:
        kernel = _make_kernel_tiled(M1, Mt, R, off, length, T, impl,
                                    interpret)
        grid = (B, T)
        row = lambda i, t: (i, 0, 0)
        const2 = lambda i, t: (0, 0)
        tile2 = lambda i, t: (0, t)
        zspec = pl.BlockSpec((1, K1, Mt), lambda i, t: (i, 0, t),
                             memory_space=pltpu.VMEM)
        w2spec = pl.BlockSpec((W2h.shape[0] // T, W2h.shape[1]),
                              lambda i, t: (t, 0),
                              memory_space=pltpu.VMEM)
        # accumulate in VMEM scratch; output block revisited across t
        out_idx = lambda i, t: (i, 0, 0)
        scratch = [pltpu.VMEM((M1, 2 * R), jnp.float32)]

    trspec = pl.BlockSpec((M1, Mt), tile2, memory_space=pltpu.VMEM)
    if impl == "dot3":
        w1spec = pl.BlockSpec(W1h.shape, const2, memory_space=pltpu.VMEM)
        wspecs = [w1spec, w1spec, trspec, trspec, w2spec, w2spec]
    else:
        wspecs = [pl.BlockSpec(W1h.shape, const2, memory_space=pltpu.VMEM),
                  trspec, trspec, w2spec]
    outr, outi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            zspec,
            zspec,
            # (B, 1, 128) lane-padded scalars: Mosaic constrains the last
            # two block dims to (8,128)-divisible or full-array-equal
            pl.BlockSpec((1, 1, 128), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row, memory_space=pltpu.VMEM),
        ] + wspecs + [
            pl.BlockSpec((1, length), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, length), out_idx,
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, length), out_idx,
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, 1, length), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, length), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024))),
    )(Zr, Zi, jnp.broadcast_to(nyq_r[:, None, None], (B, 1, 128)),
      jnp.broadcast_to(nyq_i[:, None, None], (B, 1, 128)),
      *[jnp.asarray(w) for w in wmats], jnp.asarray(alt_keep))
    return outr[:, 0], outi[:, 0]


# -- autodiff: custom VJPs ----------------------------------------------------
# The fused kernels are LINEAR in their array inputs, so their VJP is the
# transpose map. Rather than hand-writing a second Pallas kernel, the
# backward pass evaluates the transpose through the mathematically
# identical XLA planar engine (fft_mxu.ifft_mxu_halfband_planar + the
# explicit Z build) — pure MXU-matmul code that XLA differentiates
# exactly, so `jax.grad` of a pipeline using the fused kernels runs at
# matmul speed (VERDICT r1 #5: the fast path is differentiable
# end-to-end).

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_ifft_vjp(static, Zr, Zi, nyq_r, nyq_i):
    M, keep, interpret, tiles, impl = static
    return _fused_call(Zr, Zi, nyq_r, nyq_i, M=M, keep=keep,
                       interpret=interpret, tiles=tiles, impl=impl)


def _ifft_transpose(keep, shapes, g):
    """Transpose map of the (linear) XLA planar half-band iFFT applied to
    output cotangents `g` — no forward evaluation, no array residuals
    (`shapes` are ShapeDtypeStructs)."""
    from .fft_mxu import ifft_mxu_halfband_planar
    ref = lambda a, b, c, d: ifft_mxu_halfband_planar(
        a, b, keep=keep, nyq_r=c, nyq_i=d)
    return jax.linear_transpose(ref, *shapes)(g)


def _fused_ifft_fwd(static, Zr, Zi, nyq_r, nyq_i):
    # no residuals (ShapeDtypeStructs are not jit-legal residuals; every
    # shape derives from `static` + the cotangent)
    return _fused_ifft_vjp(static, Zr, Zi, nyq_r, nyq_i), None


def _fused_ifft_bwd(static, res, g):
    M, keep = static[:2]
    B = g[0].shape[0]
    M1, M2 = best_split(M)
    zshape = jax.ShapeDtypeStruct((B, M1 // 2, M2), jnp.float32)
    nshape = jax.ShapeDtypeStruct((B,), jnp.float32)
    return _ifft_transpose(keep, (zshape, zshape, nshape, nshape), g)


_fused_ifft_vjp.defvjp(_fused_ifft_fwd, _fused_ifft_bwd)


def ifft_halfband_planar_fused(Zr, Zi, keep=None, nyq_r=None, nyq_i=None,
                               interpret=None, tiles=None, impl=None):
    """Drop-in for fft_mxu.ifft_mxu_halfband_planar (same contract):
    Zr/Zi (B, K1, M2) f32 planes of the half spectrum, keep=(start, len),
    nyq planes (B,). Returns (xr, xi) (B, len) f32. Differentiable
    (custom_vjp; backward via the XLA planar engine transpose).

    tiles=None picks the k2-tiling factor automatically (1 = untiled
    fast path; >1 extends VMEM coverage up to M=2^21, i.e. ~1M-sample
    signals); pass an explicit power of 2 to force (tests)."""
    if interpret is None:
        interpret = interpret_mode()
    B, K1, M2 = Zr.shape
    M = 2 * K1 * M2
    if keep is None:
        keep = (0, M)
    if tiles is None:
        tiles = fused_tiles(M, 1)
        if tiles is None:
            raise ValueError(f"fused kernel does not support M={M}; "
                             "check fused_ok(M) before calling")
    elif M2 % tiles:
        raise ValueError(f"tiles={tiles} must divide M2={M2}")
    if impl is None:
        impl = fft_impl()
    nyq_r, nyq_i = _check_nyq(nyq_r, nyq_i, B, Zr.dtype)
    return _fused_ifft_vjp((M, tuple(keep), interpret, int(tiles), impl),
                           Zr, Zi, nyq_r, nyq_i)


# -- cwt-mode fused kernel: filterbank multiply + iFFT in one pass ------------
def _make_cwt_kernel_tiled(M1, Mt, R, off, L, derivative, T,
                           impl="dot3", interp=False):
    """k2-tiled cwt-mode kernel (see _make_kernel_tiled): grid=(na, T),
    Z = psih * xhat built per column tile in VMEM, partial stage-2
    products accumulated one dot at a time in per-pipeline scratches."""
    def kernel(pw_ref, xr_ref, xi_ref, xig_ref, invdt_ref, nwr_ref,
               nwi_ref, ndr_ref, ndi_ref, *rest):
        if impl == "dot3":
            (w1h_ref, w1l_ref, tr_ref, ti_ref, w2h_ref, w2l_ref,
             alt_ref, owr_ref, owi_ref, odr_ref, odi_ref,
             accw_ref, accd_ref) = rest
            acc = lambda ref, zr, zi, t: _stage2_accumulate(
                ref, zr, zi, t, w1h_ref[:], w1l_ref[:], tr_ref[:],
                ti_ref[:], w2h_ref[:], w2l_ref[:])
        else:
            (w1c_ref, tr_ref, ti_ref, w2c_ref,
             alt_ref, owr_ref, owi_ref, odr_ref, odi_ref,
             accw_ref, accd_ref) = rest
            acc = lambda ref, zr, zi, t: _stage2_accumulate1(
                ref, zr, zi, t, w1c_ref[:], tr_ref[:], ti_ref[:],
                w2c_ref[:], interp)
        t = pl.program_id(1)
        p = pw_ref[0]                                      # (K1, Mt)
        zr = p * xr_ref[0]
        zi = p * xi_ref[0]
        acc(accw_ref, zr, zi, t)
        if derivative:
            s = xig_ref[:] * invdt_ref[0, 0, 0]
            acc(accd_ref, -zi * s, zr * s, t)

        @pl.when(t == T - 1)
        def _():
            alt = alt_ref[0]
            OW = accw_ref[:].T.reshape(2, R * M1)[:, off:off + L]
            owr_ref[0, 0] = OW[0] + nwr_ref[0, 0, 0] * alt
            owi_ref[0, 0] = OW[1] + nwi_ref[0, 0, 0] * alt
            if derivative:
                OD = accd_ref[:].T.reshape(2, R * M1)[:, off:off + L]
                odr_ref[0, 0] = OD[0] + ndr_ref[0, 0, 0] * alt
                odi_ref[0, 0] = OD[1] + ndi_ref[0, 0, 0] * alt
            else:
                odr_ref[0, 0] = jnp.zeros((L,), jnp.float32)
                odi_ref[0, 0] = jnp.zeros((L,), jnp.float32)
    return kernel


def _make_cwt_kernel_t(M1, M2, R, off, L, derivative, interp=False):
    """Transpose-free cwt-mode kernel (impl='tmerged'): all operands in
    transposed layout — Pw/x (1, M2, K1), xig (M2, K1) — and the stage
    constants from _fused_consts_tcat. 1 stacked dot per stage with the
    Wx/dWx pipelines sharing dots (stacked along rows in stage 1,
    columns in stage 2); the epilogue is a slice + last-two-dims
    reshape, no relayout."""
    K1 = M1 // 2

    def kernel(pw_ref, xr_ref, xi_ref, xig_ref, invdt_ref, nwr_ref,
               nwi_ref, ndr_ref, ndi_ref, w1t_ref, trt_ref, tit_ref,
               w2t_ref, alt_ref, owr_ref, owi_ref, odr_ref, odi_ref):
        p = pw_ref[0]                                   # (M2, K1)
        zr = p * xr_ref[0]
        zi = p * xi_ref[0]
        XTw = jnp.concatenate([zr, zi], axis=1)         # (M2, M1)
        if derivative:
            s = xig_ref[:] * invdt_ref[0, 0, 0]
            XTd = jnp.concatenate([-zi * s, zr * s], axis=1)
            XT = jnp.concatenate([XTw, XTd], axis=0)    # (2M2, M1)
        else:
            XT = XTw
        xh, xl = _split_bf16(XT)
        xcat = jnp.concatenate([xh, xl, xh], axis=1)    # (pM2, 3M1)
        w1t = w1t_ref[:]
        if interp:
            xcat, w1t = xcat.astype(jnp.float32), w1t.astype(jnp.float32)
        B1T = jnp.dot(xcat, w1t,
                      preferred_element_type=jnp.float32)  # (pM2, 2M1)
        TrT, TiT = trt_ref[:], tit_ref[:]               # (M2, M1)

        def twiddle_cat(Bt):                            # (M2, 2M1)
            Br, Bi = Bt[:, :M1], Bt[:, M1:]
            C2T = jnp.concatenate([Br * TrT - Bi * TiT,
                                   Br * TiT + Bi * TrT], axis=0)
            ch, cl = _split_bf16(C2T)                   # (2M2, M1)
            return jnp.concatenate([ch, cl, ch], axis=0)   # (6M2, M1)

        if derivative:
            Ccat = jnp.concatenate([twiddle_cat(B1T[:M2]),
                                    twiddle_cat(B1T[M2:])], axis=1)
        else:
            Ccat = twiddle_cat(B1T)
        w2t = w2t_ref[:]
        if interp:
            Ccat, w2t = Ccat.astype(jnp.float32), w2t.astype(jnp.float32)
        OUTT = jnp.dot(w2t, Ccat,
                       preferred_element_type=jnp.float32)  # (2R, pM1)
        alt = alt_ref[0]
        OW = OUTT[:, :M1].reshape(2, R * M1)[:, off:off + L]
        owr_ref[0, 0] = OW[0] + nwr_ref[0, 0, 0] * alt
        owi_ref[0, 0] = OW[1] + nwi_ref[0, 0, 0] * alt
        if derivative:
            OD = OUTT[:, M1:].reshape(2, R * M1)[:, off:off + L]
            odr_ref[0, 0] = OD[0] + ndr_ref[0, 0, 0] * alt
            odi_ref[0, 0] = OD[1] + ndi_ref[0, 0, 0] * alt
        else:
            odr_ref[0, 0] = jnp.zeros((L,), jnp.float32)
            odi_ref[0, 0] = jnp.zeros((L,), jnp.float32)
    return kernel


def _make_cwt_kernel_rb(M1, M2, R, off, L, derivative, RB, interp=False):
    """Row-blocked untiled cwt-mode kernel (impl='rbN'): RB scale rows
    per grid step, each row's dot3 pipeline kept as an INDEPENDENT
    dependency chain (trace-time python loop, separate temporaries).

    Rationale (r4, tools/mxu_rate_probe.py --chains): in-kernel ops
    carry ~15-20 us dependency LATENCY — a single (1024,512,512) dot
    in a serialized accumulator chain costs 19.7 us, but 8 independent
    chains run at 5.5 us/dot. The single-row kernel is one serial
    ~15-stage chain per grid step, so it runs at latency, not
    throughput; RB independent row pipelines give the Mosaic scheduler
    overlap to hide it. (The r2 RB=8 experiment batched rows under ONE
    chain and measured neutral — independence is the active
    ingredient, not the blocking.)"""
    def pipeline3(zr, zi, w1h, w1l, Tr, Ti, w2h, w2l):
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
        args = (w1h_ref[:], w1l_ref[:], tr_ref[:], ti_ref[:],
                w2h_ref[:], w2l_ref[:])
        alt = alt_ref[0]
        xr = xr_ref[0]
        xi = xi_ref[0]
        if derivative:
            s = xig_ref[:] * invdt_ref[0, 0, 0]
        for r in range(RB):
            p = pw_ref[r]                                  # (K1, M2)
            zr = p * xr
            zi = p * xi
            OW = pipeline3(zr, zi, *args)
            owr_ref[r, 0] = OW[0] + nwr_ref[r, 0, 0] * alt
            owi_ref[r, 0] = OW[1] + nwi_ref[r, 0, 0] * alt
            if derivative:
                OD = pipeline3(-zi * s, zr * s, *args)
                odr_ref[r, 0] = OD[0] + ndr_ref[r, 0, 0] * alt
                odi_ref[r, 0] = OD[1] + ndi_ref[r, 0, 0] * alt
            else:
                odr_ref[r, 0] = jnp.zeros((L,), jnp.float32)
                odi_ref[r, 0] = jnp.zeros((L,), jnp.float32)
    return kernel


def _make_cwt_kernel_phase(M1, M2, R, off, L, gamma, interp=False):
    """Untiled dot3 cwt kernel with the PHASE TRANSFORM fused into the
    epilogue (r4; the 'held option' of docs/DESIGN.md r3): instead of
    the two dWx planes, emit ONE w plane

        w = |Im(dWx/Wx)| / 2pi = |(B*C - A*D)| / (mag2 * 2pi),
        w = +inf where mag2 <= gamma^2   (reference phase_cwt inf-mask,
                                          old/ssqueezepy/_ssq_cwt.py:272)

    computed AFTER the Nyquist correction, from exactly the same f32
    row values the reassignment kernel would otherwise rebuild the
    ratio from — bins and Tx are bitwise-identical to the 4-plane
    route. HBM saving: one plane write here + one plane read in the
    reassignment kernel (~2x190 MB at 160k x 293 ~ 1.2 ms at the
    measured ~300 GB/s effective).

    The phase is NOT differentiable-through by design: w only shapes
    bin indices, whose gradient is zero (reassign_pallas VJP
    convention), so the custom VJP routes a zero cotangent to the
    dropped dWx pipeline."""
    def pipeline3(zr, zi, w1h, w1l, Tr, Ti, w2h, w2l):
        X = jnp.concatenate([zr, zi], axis=0)
        B1 = _dot3(w1h, w1l, X)
        Br, Bi = B1[:M1], B1[M1:]
        C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                             axis=-1)
        OUT = _dot3_r(C2, w2h, w2l)
        return OUT.T.reshape(2, R * M1)[:, off:off + L]

    gamma2 = float(gamma) ** 2
    two_pi = 6.283185307179586

    def kernel(pw_ref, xr_ref, xi_ref, xig_ref, invdt_ref, nwr_ref,
               nwi_ref, ndr_ref, ndi_ref, w1h_ref, w1l_ref, tr_ref,
               ti_ref, w2h_ref, w2l_ref, alt_ref, owr_ref, owi_ref,
               ow_ref):
        args = (w1h_ref[:], w1l_ref[:], tr_ref[:], ti_ref[:],
                w2h_ref[:], w2l_ref[:])
        p = pw_ref[0]
        zr = p * xr_ref[0]
        zi = p * xi_ref[0]
        alt = alt_ref[0]
        OW = pipeline3(zr, zi, *args)
        C = OW[0] + nwr_ref[0, 0, 0] * alt
        D = OW[1] + nwi_ref[0, 0, 0] * alt
        s = xig_ref[:] * invdt_ref[0, 0, 0]
        OD = pipeline3(-zi * s, zr * s, *args)
        A = OD[0] + ndr_ref[0, 0, 0] * alt
        B = OD[1] + ndi_ref[0, 0, 0] * alt
        mag2 = C * C + D * D
        ratio = (B * C - A * D) / (mag2 * two_pi)
        w = jnp.where(mag2 > gamma2, jnp.abs(ratio), jnp.inf)
        owr_ref[0, 0] = C
        owi_ref[0, 0] = D
        ow_ref[0, 0] = w
    return kernel


def _make_cwt_kernel(M1, M2, R, off, L, derivative, impl="dot3",
                     interp=False):
    """Untiled cwt-mode kernel. impl selects the MXU issue pattern
    (identical math, different dot granularity — the kernel is
    dot-ISSUE-bound, not MAC-bound, at production shapes):

      dot3   : per-pipeline bf16x3 as 3 dots/stage (12 dots/row w/ deriv)
      dot1   : stacked-contraction single dot per stage (4 dots/row)
      merged : dot1 + the Wx/dWx pipelines share dots by stacking along
               the non-contracted axis (2 dots/row, 6x the MACs each)
    """
    def pipeline3(zr, zi, w1h, w1l, Tr, Ti, w2h, w2l):
        X = jnp.concatenate([zr, zi], axis=0)              # (2K1, M2)
        B1 = _dot3(w1h, w1l, X)                            # (2M1, M2)
        Br, Bi = B1[:M1], B1[M1:]
        C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                             axis=-1)                      # (M1, 2M2)
        OUT = _dot3_r(C2, w2h, w2l)                        # (M1, 2R)
        return OUT.T.reshape(2, R * M1)[:, off:off + L]

    def pipeline1(zr, zi, w1c, Tr, Ti, w2c):
        X = jnp.concatenate([zr, zi], axis=0)
        B1 = _dot1(w1c, X, f32=interp)
        Br, Bi = B1[:M1], B1[M1:]
        C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                             axis=-1)
        OUT = _dot1_r(C2, w2c, f32=interp)
        return OUT.T.reshape(2, R * M1)[:, off:off + L]

    def kernel(pw_ref, xr_ref, xi_ref, xig_ref, invdt_ref, nwr_ref,
               nwi_ref, ndr_ref, ndi_ref, *rest):
        if impl == "dot3":
            (w1h_ref, w1l_ref, tr_ref, ti_ref, w2h_ref, w2l_ref,
             alt_ref, owr_ref, owi_ref, odr_ref, odi_ref) = rest
            args = (w1h_ref[:], w1l_ref[:], tr_ref[:], ti_ref[:],
                    w2h_ref[:], w2l_ref[:])
            pipe = pipeline3
        else:
            (w1c_ref, tr_ref, ti_ref, w2c_ref,
             alt_ref, owr_ref, owi_ref, odr_ref, odi_ref) = rest
            args = (w1c_ref[:], tr_ref[:], ti_ref[:], w2c_ref[:])
            pipe = pipeline1
        p = pw_ref[0]                                      # (K1, M2)
        zr = p * xr_ref[0]
        zi = p * xi_ref[0]
        alt = alt_ref[0]

        if impl == "merged" and derivative:
            s = xig_ref[:] * invdt_ref[0, 0, 0]
            w1c, Tr, Ti, w2c = args
            Xw = jnp.concatenate([zr, zi], axis=0)          # (M1, M2)
            Xd = jnp.concatenate([-zi * s, zr * s], axis=0)
            X = jnp.concatenate([Xw, Xd], axis=1)           # (M1, 2M2)
            B1 = _dot1(w1c, X, f32=interp)                  # (2M1, 2M2)
            Br, Bi = B1[:M1], B1[M1:]
            Brw, Brd = Br[:, :M2], Br[:, M2:]
            Biw, Bid = Bi[:, :M2], Bi[:, M2:]
            C2w = jnp.concatenate([Brw * Tr - Biw * Ti,
                                   Brw * Ti + Biw * Tr], axis=-1)
            C2d = jnp.concatenate([Brd * Tr - Bid * Ti,
                                   Brd * Ti + Bid * Tr], axis=-1)
            C2 = jnp.concatenate([C2w, C2d], axis=0)        # (2M1, 2M2)
            OUT = _dot1_r(C2, w2c, f32=interp)              # (2M1, 2R)
            OW = OUT[:M1].T.reshape(2, R * M1)[:, off:off + L]
            OD = OUT[M1:].T.reshape(2, R * M1)[:, off:off + L]
            owr_ref[0, 0] = OW[0] + nwr_ref[0, 0, 0] * alt
            owi_ref[0, 0] = OW[1] + nwi_ref[0, 0, 0] * alt
            odr_ref[0, 0] = OD[0] + ndr_ref[0, 0, 0] * alt
            odi_ref[0, 0] = OD[1] + ndi_ref[0, 0, 0] * alt
            return

        OW = pipe(zr, zi, *args)
        owr_ref[0, 0] = OW[0] + nwr_ref[0, 0, 0] * alt
        owi_ref[0, 0] = OW[1] + nwi_ref[0, 0, 0] * alt
        if derivative:
            s = xig_ref[:] * invdt_ref[0, 0, 0]
            OD = pipe(-zi * s, zr * s, *args)
            odr_ref[0, 0] = OD[0] + ndr_ref[0, 0, 0] * alt
            odi_ref[0, 0] = OD[1] + ndi_ref[0, 0, 0] * alt
        else:
            odr_ref[0, 0] = jnp.zeros((L,), jnp.float32)
            odi_ref[0, 0] = jnp.zeros((L,), jnp.float32)
    return kernel


@functools.partial(jax.jit, static_argnames=("M", "keep", "derivative",
                                             "interpret", "tiles", "impl",
                                             "phase_gamma"))
def _cwt_fused_call(Pw, xr_g, xi_g, xig, inv_dt, nyq_w, nyq_d, *, M, keep,
                    derivative, interpret, tiles=1, impl="dot3",
                    phase_gamma=None):
    na, K1, M2 = Pw.shape
    b = xr_g.shape[0]           # xr_g/xi_g: (b, K1, M2)
    rows = b * na               # output rows, b-major (i = ib*na + ia)
    M1 = 2 * K1
    start, length = keep
    r0 = start // M1
    r1 = -(-(start + length) // M1)
    R = r1 - r0
    off = start - r0 * M1
    if phase_gamma is not None:
        if not (derivative and tiles == 1):
            raise ValueError("phase_gamma requires derivative=True and "
                             "an untiled kernel (caller gates on "
                             "fused_tiles(M, 2) == 1)")
        impl = "dot3"           # phase epilogue exists for dot3 only
    rb = 0
    if impl.startswith("rb"):
        # row-blocked independent-chain variant (see _make_cwt_kernel_rb):
        # untiled, single-signal only; falls back to dot3 otherwise
        if tiles == 1 and b == 1:
            rb = int(impl[2:])
        impl = "dot3"
    if tiles > 1 and impl in ("merged", "tmerged"):
        impl = "dot1"           # merged would double the VMEM scratches
    if impl == "dot3":
        (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(
            M, r0, r1, tiles)
        wmats = [W1h, W1l, Tr, Ti, W2h, W2l]
    elif impl == "tmerged":
        W1t, TrT, TiT, W2t, alt = _fused_consts_tcat(M, r0, r1)
        wmats = [W1t, TrT, TiT, W2t]
        # transposed operand layout; XLA fuses these into the
        # elementwise psih/Z producers (no extra HBM pass in practice)
        Pw = jnp.swapaxes(Pw, 1, 2)            # (na, M2, K1)
        xr_g = jnp.swapaxes(xr_g, 1, 2)
        xi_g = jnp.swapaxes(xi_g, 1, 2)
        xig = jnp.swapaxes(xig, 0, 1)          # (M2, K1)
    else:
        W1c, Tr, Ti, W2c, alt = _fused_consts_cat(M, r0, r1, tiles)
        W1h, W2h = W1c, W2c     # shapes referenced by the specs below
        wmats = [W1c, Tr, Ti, W2c]
    alt_keep = alt[start:start + length][None, :]
    T, Mt = tiles, M2 // tiles

    if rb:
        pad_r = (-rows) % rb
        if pad_r:
            Pw = jnp.pad(Pw, ((0, pad_r), (0, 0), (0, 0)))
        rows_pad = rows + pad_r
        kernel = _make_cwt_kernel_rb(M1, M2, R, off, length, derivative,
                                     rb, interpret)
        grid = (rows_pad // rb,)
        const2 = lambda i: (0, 0)
        const3 = lambda i: (0, 0, 0)
        rowb = lambda i: (i, 0, 0)
        pwspec = pl.BlockSpec((rb, K1, M2), rowb, memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, K1, M2), const3, memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((K1, M2), const2, memory_space=pltpu.VMEM)
        wspecs = [pl.BlockSpec(w.shape, const2, memory_space=pltpu.VMEM)
                  for w in wmats]
        lane = lambda v: jnp.broadcast_to(
            jnp.pad(v, (0, pad_r))[:, None, None], (rows_pad, 1, 128))
        scal = jnp.broadcast_to(inv_dt.reshape(1, 1, 1), (1, 1, 128))
        outb = lambda: pl.BlockSpec((rb, 1, length), rowb,
                                    memory_space=pltpu.VMEM)
        owr, owi, odr, odi = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pwspec, xspec, xspec, gspec,
                pl.BlockSpec((1, 1, 128), const3, memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((rb, 1, 128), rowb,
                              memory_space=pltpu.VMEM)] * 4
            + wspecs
            + [pl.BlockSpec((1, length), const2, memory_space=pltpu.VMEM)],
            out_specs=(outb(), outb(), outb(), outb()),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows_pad, 1, length), jnp.float32)
                for _ in range(4)),
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=127 * 1024 * 1024))),
        )(Pw, xr_g, xi_g, xig, scal, lane(nyq_w[0]), lane(nyq_w[1]),
          lane(nyq_d[0]), lane(nyq_d[1]),
          *[jnp.asarray(w) for w in wmats], jnp.asarray(alt_keep))
        return (owr[:rows, 0], owi[:rows, 0],
                odr[:rows, 0], odi[:rows, 0])

    if phase_gamma is not None:
        kernel = _make_cwt_kernel_phase(M1, M2, R, off, length,
                                        float(phase_gamma), interpret)
        row3 = lambda i: (i, 0, 0)
        const2 = lambda i: (0, 0)
        const3 = lambda i: (0, 0, 0)
        xmap = const3 if b == 1 else (lambda i: (i // na, 0, 0))
        pwspec = pl.BlockSpec((1, K1, M2), (row3 if b == 1 else
                                            (lambda i: (i % na, 0, 0))),
                              memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, K1, M2), xmap, memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((K1, M2), const2, memory_space=pltpu.VMEM)
        wspecs = [pl.BlockSpec(w.shape, const2, memory_space=pltpu.VMEM)
                  for w in wmats]
        lane = lambda v: jnp.broadcast_to(v[:, None, None], (rows, 1, 128))
        scal = jnp.broadcast_to(inv_dt.reshape(1, 1, 1), (1, 1, 128))
        out3p = lambda: pl.BlockSpec((1, 1, length), row3,
                                     memory_space=pltpu.VMEM)
        owr, owi, ow = pl.pallas_call(
            kernel,
            grid=(rows,),
            in_specs=[
                pwspec, xspec, xspec, gspec,
                pl.BlockSpec((1, 1, 128), const3, memory_space=pltpu.VMEM),
            ] + [pl.BlockSpec((1, 1, 128), row3,
                              memory_space=pltpu.VMEM)] * 4
            + wspecs
            + [pl.BlockSpec((1, length), const2, memory_space=pltpu.VMEM)],
            out_specs=(out3p(), out3p(), out3p()),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows, 1, length), jnp.float32)
                for _ in range(3)),
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=127 * 1024 * 1024))),
        )(Pw, xr_g, xi_g, xig, scal, lane(nyq_w[0]), lane(nyq_w[1]),
          lane(nyq_d[0]), lane(nyq_d[1]),
          *[jnp.asarray(w) for w in wmats], jnp.asarray(alt_keep))
        return owr[:, 0], owi[:, 0], ow[:, 0]

    if T == 1 and impl == "tmerged":
        kernel = _make_cwt_kernel_t(M1, M2, R, off, length, derivative,
                                    interpret)
        grid = (rows,)
        row3 = lambda i: (i, 0, 0)
        const2 = lambda i: (0, 0)
        const3 = lambda i: (0, 0, 0)
        xmap = const3 if b == 1 else (lambda i: (i // na, 0, 0))
        pwspec = pl.BlockSpec((1, M2, K1), (row3 if b == 1 else
                                            (lambda i: (i % na, 0, 0))),
                              memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, M2, K1), xmap, memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((M2, K1), const2, memory_space=pltpu.VMEM)
        wspecs = [pl.BlockSpec(w.shape, const2, memory_space=pltpu.VMEM)
                  for w in wmats]
        scratch = []
    elif T == 1:
        kernel = _make_cwt_kernel(M1, M2, R, off, length, derivative,
                                  impl, interpret)
        grid = (rows,)
        row3 = lambda i: (i, 0, 0)
        const2 = lambda i: (0, 0)
        const3 = lambda i: (0, 0, 0)
        tile2 = const2
        # b == 1: constant index map keeps the signal planes
        # single-buffered in VMEM; b > 1 revisits plane ib = i // na
        xmap = const3 if b == 1 else (lambda i: (i // na, 0, 0))
        pwspec = pl.BlockSpec((1, K1, M2), (row3 if b == 1 else
                                            (lambda i: (i % na, 0, 0))),
                              memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, K1, M2), xmap, memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((K1, M2), const2, memory_space=pltpu.VMEM)
        w2spec = pl.BlockSpec(W2h.shape, const2, memory_space=pltpu.VMEM)
        scratch = []
    else:
        kernel = _make_cwt_kernel_tiled(M1, Mt, R, off, length,
                                        derivative, T, impl, interpret)
        grid = (rows, T)
        row3 = lambda i, t: (i, 0, 0)
        const2 = lambda i, t: (0, 0)
        const3 = lambda i, t: (0, 0, 0)
        tile2 = lambda i, t: (0, t)
        xmap = ((lambda i, t: (0, 0, t)) if b == 1 else
                (lambda i, t: (i // na, 0, t)))
        pwspec = pl.BlockSpec((1, K1, Mt), (
            (lambda i, t: (i, 0, t)) if b == 1 else
            (lambda i, t: (i % na, 0, t))), memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, K1, Mt), xmap, memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((K1, Mt), tile2, memory_space=pltpu.VMEM)
        w2spec = pl.BlockSpec((W2h.shape[0] // T, W2h.shape[1]),
                              lambda i, t: (t, 0),
                              memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((M1, 2 * R), jnp.float32),
                   pltpu.VMEM((M1, 2 * R) if derivative else (8, 128),
                              jnp.float32)]

    lane = lambda v: jnp.broadcast_to(v[:, None, None], (rows, 1, 128))
    scal = jnp.broadcast_to(inv_dt.reshape(1, 1, 1), (1, 1, 128))
    out3 = lambda: pl.BlockSpec((1, 1, length), row3,
                                memory_space=pltpu.VMEM)
    if impl != "tmerged":
        trspec = pl.BlockSpec((M1, Mt), tile2, memory_space=pltpu.VMEM)
        if impl == "dot3":
            w1spec = pl.BlockSpec(W1h.shape, const2,
                                  memory_space=pltpu.VMEM)
            wspecs = [w1spec, w1spec, trspec, trspec, w2spec, w2spec]
        else:
            wspecs = [pl.BlockSpec(W1h.shape, const2,
                                   memory_space=pltpu.VMEM),
                      trspec, trspec, w2spec]
    owr, owi, odr, odi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pwspec,
            xspec,
            xspec,
            gspec,
            pl.BlockSpec((1, 1, 128), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM),
        ] + wspecs + [
            pl.BlockSpec((1, length), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(out3(), out3(), out3(), out3()),
        out_shape=tuple(jax.ShapeDtypeStruct((rows, 1, length), jnp.float32)
                        for _ in range(4)),
        scratch_shapes=scratch,
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024))),
    )(Pw, xr_g, xi_g, xig, scal, lane(nyq_w[0]), lane(nyq_w[1]),
      lane(nyq_d[0]), lane(nyq_d[1]),
      *[jnp.asarray(w) for w in wmats], jnp.asarray(alt_keep))
    return owr[:, 0], owi[:, 0], odr[:, 0], odi[:, 0]


def _cwt_fused_ref(Pw, xr_g, xi_g, xig, inv_dt, nyq_w, nyq_d, *, keep,
                   derivative):
    """XLA reference route of cwt_halfband_fused (explicit Z build + the
    planar four-step engine) — mathematically identical to the kernel;
    used as the transpose map in the kernel's VJP."""
    from .fft_mxu import ifft_mxu_halfband_planar
    b = xr_g.shape[0]
    na, K1, M2 = Pw.shape
    Zr = (Pw[None] * xr_g[:, None]).reshape(b * na, K1, M2)
    Zi = (Pw[None] * xi_g[:, None]).reshape(b * na, K1, M2)
    if derivative:
        s = xig[None] * inv_dt
        Zr2 = jnp.concatenate([Zr, -Zi * s], axis=0)
        Zi2 = jnp.concatenate([Zi, Zr * s], axis=0)
        nr = jnp.concatenate([nyq_w[0], nyq_d[0]])
        ni = jnp.concatenate([nyq_w[1], nyq_d[1]])
        xr_, xi_ = ifft_mxu_halfband_planar(Zr2, Zi2, keep=keep,
                                            nyq_r=nr, nyq_i=ni)
        return (xr_[:b * na], xi_[:b * na],
                xr_[b * na:], xi_[b * na:])
    xr_, xi_ = ifft_mxu_halfband_planar(Zr, Zi, keep=keep,
                                        nyq_r=nyq_w[0], nyq_i=nyq_w[1])
    z = jnp.zeros_like(xr_)
    return xr_, xi_, z, z


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _cwt_fused_vjp(static, Pw, xr_g, xi_g, xig, inv_dt, nyq_w, nyq_d):
    M, keep, derivative, interpret, tiles, impl = static[:6]
    phase_gamma = static[6] if len(static) > 6 else None
    return _cwt_fused_call(Pw, xr_g, xi_g, xig, inv_dt, nyq_w, nyq_d,
                           M=M, keep=keep, derivative=derivative,
                           interpret=interpret, tiles=tiles, impl=impl,
                           phase_gamma=phase_gamma)


def _cwt_fused_fwd(static, Pw, xr_g, xi_g, xig, inv_dt, nyq_w, nyq_d):
    out = _cwt_fused_vjp(static, Pw, xr_g, xi_g, xig, inv_dt, nyq_w,
                         nyq_d)
    return out, (Pw, xr_g, xi_g, xig, inv_dt)


def _cwt_fused_bwd(static, res, g):
    """Backward with NO wasted forward pass: one transpose of the linear
    iFFT stage, then the hand-written adjoint of the elementwise Z-build
    (Z = Pw * x; derivative pipe dZ = (-Zi, Zr) * xig * inv_dt).

    phase_gamma mode: the third output is the phase w, whose gradient
    is ZERO by the reassignment-VJP convention (w only shapes bin
    indices; round/where have zero derivative) — so the dropped dWx
    pipeline receives a zero cotangent and everything else is the
    standard path."""
    _, keep, derivative = static[:3]
    Pw, xr_g, xi_g, xig, inv_dt = res
    if len(static) > 6 and static[6] is not None:
        g_owr, g_owi, _ = g
        g_odr = jnp.zeros_like(g_owr)
        g_odi = jnp.zeros_like(g_owi)
    else:
        g_owr, g_owi, g_odr, g_odi = g
    b = xr_g.shape[0]
    na, K1, M2 = Pw.shape
    rows = b * na
    f32 = jnp.float32
    if derivative:
        gxr_ = jnp.concatenate([g_owr, g_odr], axis=0)   # (2rows, L)
        gxi_ = jnp.concatenate([g_owi, g_odi], axis=0)
        zshape = jax.ShapeDtypeStruct((2 * rows, K1, M2), f32)
        nshape = jax.ShapeDtypeStruct((2 * rows,), f32)
    else:
        gxr_, gxi_ = g_owr, g_owi
        zshape = jax.ShapeDtypeStruct((rows, K1, M2), f32)
        nshape = jax.ShapeDtypeStruct((rows,), f32)
    gZr2, gZi2, gnr, gni = _ifft_transpose(
        keep, (zshape, zshape, nshape, nshape), (gxr_, gxi_))

    if derivative:
        s = xig[None] * inv_dt                            # (1, K1, M2)
        gZr = gZr2[:rows] + s * gZi2[rows:]
        gZi = gZi2[:rows] - s * gZr2[rows:]
        g_nw = (gnr[:rows], gni[:rows])
        g_nd = (gnr[rows:], gni[rows:])
        # cotangents for the grid/scale constants (rarely used, cheap):
        # dZr = -Zi*s, dZi = Zr*s with Z = Pw*x
        Zr = (Pw[None] * xr_g[:, None]).reshape(rows, K1, M2)
        Zi = (Pw[None] * xi_g[:, None]).reshape(rows, K1, M2)
        g_s = jnp.sum(Zr * gZi2[rows:] - Zi * gZr2[rows:], axis=0)
        g_xig = g_s * inv_dt
        g_invdt = jnp.sum(g_s * xig)
    else:
        gZr, gZi = gZr2, gZi2
        g_nw = (gnr, gni)
        g_nd = (jnp.zeros((rows,), f32), jnp.zeros((rows,), f32))
        g_xig = jnp.zeros_like(xig)
        g_invdt = jnp.zeros_like(inv_dt)

    gZr4 = gZr.reshape(b, na, K1, M2)
    gZi4 = gZi.reshape(b, na, K1, M2)
    g_Pw = jnp.sum(gZr4 * xr_g[:, None] + gZi4 * xi_g[:, None], axis=0)
    g_xr = jnp.sum(gZr4 * Pw[None], axis=1)
    g_xi = jnp.sum(gZi4 * Pw[None], axis=1)
    return (g_Pw, g_xr, g_xi, g_xig, g_invdt, g_nw, g_nd)


_cwt_fused_vjp.defvjp(_cwt_fused_fwd, _cwt_fused_bwd)


def fft_impl(default: str = "dot3") -> str:
    """MXU issue pattern for the untiled fused kernels — 'dot3' (3 dots
    per bf16x3 stage), 'dot1' (stacked-contraction single dot) or
    'merged' (dot1 + shared Wx/dWx dots). Read at call time and threaded
    as a static arg, so in-process jit caching stays correct (unlike a
    trace-time env read). `default` (r4): callers with shape context
    pass their own default; `None` means "env unset" so the caller can
    pick (cwt_halfband_fused uses rb4 at M=2^14 — the small-N A/B)."""
    import os
    v = os.environ.get("SSQ_TPU_FFT_IMPL", default)
    if v is None:
        return None
    ok = v in ("dot3", "dot1", "merged", "tmerged") or (
        v.startswith("rb") and v[2:].isdigit() and int(v[2:]) > 0)
    if not ok:
        raise ValueError(
            f"SSQ_TPU_FFT_IMPL={v!r}: want dot3|dot1|merged|tmerged|rbN")
    return v


def cwt_halfband_fused(Pw, xr_g, xi_g, xig, inv_dt, nyq_w, nyq_d,
                       keep=None, derivative=True, interpret=None,
                       tiles=None, impl=None, phase_gamma=None):
    """Fully fused CWT core: filterbank multiply (Z = psih * xhat), the
    four-step half-band iFFT, unpad and Nyquist correction — one Pallas
    kernel, no Z materialization in HBM.

    Pw: (na, K1, M2) psih filterbank (transposed-grid layout,
    k = M2*k1 + k2); xr_g/xi_g: (K1, M2) signal spectrum planes, or
    (b, K1, M2) for a batch of signals sharing the filterbank;
    xig: (K1, M2) radian frequency grid; inv_dt: scalar 1/dt;
    nyq_w/nyq_d: ((b*na,), (b*na,)) Nyquist real/imag planes for Wx and
    dWx, rows b-major. Returns (Wxr, Wxi, dWxr, dWxi) each (b*na, L)
    b-major; the d planes are zeros when derivative=False.

    `phase_gamma` (r4): fuse the phase transform into the epilogue and
    return (Wxr, Wxi, w) — 3 planes instead of 4, w = +inf where
    |Wx| <= gamma (see _make_cwt_kernel_phase). Requires derivative and
    an untiled shape (fused_tiles(M, 2) == 1); dot3 only.
    """
    if interpret is None:
        interpret = interpret_mode()
    na, K1, M2 = Pw.shape
    if xr_g.ndim == 2:
        xr_g, xi_g = xr_g[None], xi_g[None]
    M = 2 * K1 * M2
    if keep is None:
        keep = (0, M)
    if tiles is None:
        tiles = fused_tiles(M, 2 if derivative else 1)
        if tiles is None:
            raise ValueError(f"fused kernel does not support M={M}; "
                             "check fused_ok(M, pipelines) before calling")
    elif M2 % tiles:
        raise ValueError(f"tiles={tiles} must divide M2={M2}")
    if impl is None:
        impl = fft_impl(default=None)
        if impl is None:
            # M-aware default (r4 small-N on-chip A/B, DESIGN.md): at
            # M=2^14 — the only fused size at/below 2^14 — the kernel
            # is per-grid-step latency-bound and rb4's 4 independent
            # per-row pipelines win ~13% (cwt 2.18 -> 1.89 ms at 10k);
            # at 160k rb measured SLOWER (VMEM pressure). rb falls
            # back to dot3 inside _cwt_fused_call for batched/tiled/
            # phase-fused shapes, so this stays safe for those.
            impl = "rb4" if M <= (1 << 14) else "dot3"
    pg = None if phase_gamma is None else float(phase_gamma)
    return _cwt_fused_vjp(
        (M, tuple(keep), bool(derivative), interpret, int(tiles), impl,
         pg),
        Pw, xr_g, xi_g, jnp.asarray(xig), jnp.asarray(inv_dt),
        tuple(nyq_w), tuple(nyq_d))
