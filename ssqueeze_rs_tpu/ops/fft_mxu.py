"""Mixed-radix Cooley-Tukey iFFT on the MXU for large power-of-2 sizes.

Replaces the reference's FFT backend layer (old/ssqueezepy/utils/
fft_utils.py:40-133 scipy/pyfftw/torch dispatch; rust thread-local
rustfft planners, rust/src/spectral/cwt.rs:228-310) with MXU matmul
decompositions. XLA's TPU FFT runs the classic ladder on the VPU at
~1.2 TFLOP/s effective;
for the CWT's batched iFFT (hundreds of rows x 2^18) a matmul decomposition
moves the work to the MXU at bf16_3x precision (~2^-22 relative error,
slightly better than a float32 FFT ladder).

Recursive split (classic four-step, applied recursively on the inner
transform): with M = M1*M2 and k = k1 + M1*k2,

    x[M2*n1 + n2] = sum_{k1} W1[k1,n1] * T[n2,k1] *
                    sum_{k2} W2[n2,k2] * X[k1 + M1*k2]

the inner sum is an M2-point iDFT, itself split again until the leaf fits
one DFT-matrix matmul. A 3-stage plan for 2^18 (128*64*32) does ~192*M
complex MACs/row vs 1024*M for the flat (512,512) split — the MXU
contraction is capped near 128 anyway, so small equal radices win.

Used by cwt_core for float32 when M decomposes into factors <= 2048
(config flag SSQ_TPU_MXU_FFT: auto = on TPU only; XLA fft elsewhere).
"""
from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ifft_mxu", "ifft_mxu_halfband", "fft_mxu", "use_mxu_fft",
           "best_split", "radix_plan"]


def use_mxu_fft() -> bool:
    v = os.environ.get("SSQ_TPU_MXU_FFT", "auto")
    if v == "1":
        return True
    if v == "0":
        return False
    return jax.default_backend() == "tpu"


def best_split(M: int):
    """M1*M2 = M with both factors powers of 2, as square as possible,
    both <= 2048. None if M isn't a power of 2 or factors too big."""
    if M & (M - 1) or M < 4:
        return None
    log = M.bit_length() - 1
    l1 = log // 2
    M1, M2 = 1 << l1, 1 << (log - l1)
    if max(M1, M2) > 2048:
        return None
    return M1, M2


def radix_plan(M: int):
    """Factor M (power of 2) into stage radices, outermost first.

    Default is the flat 2-stage near-square split: measured on v5e, the
    (512,512) split runs the stage matmuls at ~MXU peak, while deeper
    small-radix plans lose to transpose traffic (3-stage 64^3 measured 1.9x
    SLOWER on (586, 2^18)). Env SSQ_TPU_FFT_RADIX=deep enables the
    recursive ~128-radix plan for experimentation. None if M not a power
    of 2 or M < 4."""
    if M & (M - 1) or M < 4:
        return None
    if M <= 2048 or os.environ.get("SSQ_TPU_FFT_RADIX", "") != "deep":
        if M <= 512:
            return (M,)
        s = best_split(M)
        return None if s is None else (s[0], s[1])
    log = M.bit_length() - 1
    n_stages = (log + 6) // 7
    base, extra = divmod(log, n_stages)
    logs = [base + (1 if i < extra else 0) for i in range(n_stages)]
    logs.sort()            # leaf (largest) last, small outer radices first
    return tuple(1 << l for l in logs)


@lru_cache(maxsize=64)
def _leaf_const(M: int, inner_M: int):
    """Full iDFT matrix for the leaf: W[k,n] = exp(2i*pi*k*n/M) / inner_M.

    `inner_M` folds the global 1/M normalization into the deepest leaf."""
    k = np.arange(M)
    W = np.exp(2j * np.pi * np.outer(k, k) / M) / inner_M
    return W.astype(np.complex64)


@lru_cache(maxsize=64)
def _stage_consts(M1: int, M: int):
    """Outer-stage constants: W1[k1,n1] (M1-point DFT, +i sign) and
    twiddle T[k1,n2] = exp(2i*pi*k1*n2/M)."""
    M2 = M // M1
    k1 = np.arange(M1)
    n1 = np.arange(M1)
    W1 = np.exp(2j * np.pi * np.outer(k1, n1) / M1)          # (M1, M1)
    T = np.exp(2j * np.pi * np.outer(k1, np.arange(M2)) / M)  # (M1, M2)
    return W1.astype(np.complex64), T.astype(np.complex64)


def _ifft_rec(X, radices, inner_M, precision):
    """Normalized iDFT along the last axis; 1/`inner_M` folded into leaf."""
    M = X.shape[-1]
    batch = X.shape[:-1]
    if len(radices) == 1:
        W = jnp.asarray(_leaf_const(M, inner_M))
        return jnp.einsum("...k,kn->...n", X, W, precision=precision)
    M1 = radices[0]
    M2 = M // M1
    W1_np, T_np = _stage_consts(M1, M)
    # k = k1 + M1*k2: reshape -> [k2, k1], transpose -> [k1, k2]
    X2 = jnp.swapaxes(X.reshape(batch + (M2, M1)), -1, -2)
    A = _ifft_rec(X2, radices[1:], inner_M, precision)        # (k1, n2)
    A = A * jnp.asarray(T_np)                                 # twiddle
    # out[n2, n1] = sum_k1 A[k1,n2] W1[k1,n1]
    out = jnp.einsum("...kn,kl->...nl", A, jnp.asarray(W1_np),
                     precision=precision)
    # x[M2*n1 + n2] = out[n2,n1] -> (n1, n2) -> flat
    return jnp.swapaxes(out, -1, -2).reshape(batch + (M,))


def ifft_mxu(X, precision=jax.lax.Precision.HIGH):
    """Inverse FFT along the last axis via MXU matmul stages.

    X: (..., M) complex64, M a power of 2 (<= 2048 handled by one matmul).
    Matches jnp.fft.ifft to ~1e-6 relative (float32-class accuracy).
    """
    M = X.shape[-1]
    plan = radix_plan(M)
    if plan is None:
        raise ValueError(
            f"ifft_mxu requires a power-of-2 length with factors <= 2048 "
            f"(M <= 2^22); got M={M}. Use jnp.fft.ifft instead.")
    if len(plan) == 2 and os.environ.get("SSQ_TPU_FFT_RADIX", "") != "deep":
        M1, M2 = best_split(M)
        Xk = X.reshape(X.shape[:-1] + (M1, M2))
        return _ifft_flat(Xk, M, False, precision)
    return _ifft_rec(X, plan, M, precision)


@lru_cache(maxsize=64)
def _flat_consts(M: int, half: bool):
    """Constants for the transpose-free flat split with k = M2*k1 + k2,
    n = n1 + M1*n2: W1[n1,k1] (M1-point iDFT, k1 truncated to M1/2 when
    `half`), T[n1,k2] twiddle, W2[n2,k2] (M2-point, 1/M folded in)."""
    M1, M2 = best_split(M)
    K1 = M1 // 2 if half else M1
    n1 = np.arange(M1)
    W1 = np.exp(2j * np.pi * np.outer(n1, np.arange(K1)) / M1)
    T = np.exp(2j * np.pi * np.outer(n1, np.arange(M2)) / M)
    W2 = np.exp(2j * np.pi * np.outer(np.arange(M2), np.arange(M2)) / M2) / M
    c = np.complex64
    return W1.astype(c), T.astype(c), W2.astype(c)


@lru_cache(maxsize=64)
def _alt_sign(M: int):
    return ((-1.0) ** np.arange(M) / M).astype(np.float32)


def _ifft_flat(Xk, M, half, precision, keep=None):
    """Transpose-free flat four-step core. `Xk`: (..., K1, M2) reshaped
    spectrum rows (K1 = M1 or M1/2); returns (..., M) in natural order,
    or (..., length) when `keep=(start, length)`.

    Index split k = M2*k1 + k2, n = n1 + M1*n2 makes BOTH the input
    reshape and the output flatten row-major — no data transpose at
    either end (the (n2,n1)->flat reshape of the old k1-fast convention
    cost ~12 ms on (586, 2^18) once downstream slicing forced it to
    materialize).

    `keep` fuses the caller's unpad into stage 2: only the n2 output
    rows covering [start, start+length) are computed (39% fewer stage-2
    MACs and output bytes for the CWT's p2up padding).
    """
    M1, M2 = best_split(M)
    W1_np, T_np, W2_np = _flat_consts(M, half)
    # stage 1: B[n1,k2] = sum_k1 W1[n1,k1] Xk[k1,k2]
    B = jnp.einsum("nk,...km->...nm", jnp.asarray(W1_np), Xk,
                   precision=precision)
    B = B * jnp.asarray(T_np)
    if keep is not None:
        start, length = keep
        r0 = start // M1
        r1 = -(-(start + length) // M1)          # ceil
        W2_np = W2_np[r0:r1]
    # stage 2: OUT[n2,n1] = sum_k2 W2[n2,k2] B[n1,k2]
    out = jnp.einsum("nk,...mk->...nm", jnp.asarray(W2_np), B,
                     precision=precision)
    # x[n1 + M1*n2] = OUT[n2,n1] -> row-major flatten, no transpose
    flat = out.reshape(Xk.shape[:-2] + ((W2_np.shape[0]) * M1,))
    if keep is not None:
        flat = flat[..., start - r0 * M1: start - r0 * M1 + length]
    return flat


def ifft_mxu_halfband(Xh, precision=jax.lax.Precision.HIGH, keep=None):
    """Inverse FFT of a half-band spectrum: the full M-point spectrum is
    `concat([Xh, zeros(M/2-1)])` (bins k > M/2 all zero — the analytic-
    wavelet case: psih has positive-frequency support only).

    Xh: (..., M//2+1) complex; returns (..., M) with M = 2*(Mh-1), equal
    to jnp.fft.ifft of the zero-extended spectrum. Stage 1 contracts only
    M1/2 rows (power of 2 — MXU-aligned), ~25% fewer MACs than the full
    split; the Nyquist bin (k1 = M1/2, k2 = 0) contributes
    Xnyq * (-1)^n / M elementwise at the end.
    """
    Mh = Xh.shape[-1]
    M = 2 * (Mh - 1)
    M1, M2 = best_split(M)
    batch = Xh.shape[:-1]
    # k = M2*k1 + k2 <= M/2: k1 < M1/2 full rows (natural reshape)
    rows = Xh[..., :M // 2].reshape(batch + (M1 // 2, M2))
    x = _ifft_flat(rows, M, True, precision, keep=keep)
    alt = jnp.asarray(_alt_sign(M))                      # (-1)^n / M, f32
    if keep is not None:
        alt = alt[keep[0]:keep[0] + keep[1]]
    return x + Xh[..., -1:] * alt


def fft_mxu(X, precision=jax.lax.Precision.HIGH):
    """Forward FFT along the last axis (conjugate trick)."""
    M = X.shape[-1]
    return jnp.conj(ifft_mxu(jnp.conj(X), precision)) * M


# -- planar (real/imag planes) half-band engine ------------------------------
#
# TPU has no native complex tiles: XLA lowers a c64 einsum to 4 real dots
# plus combine passes, materializing intermediates. The planar engine keeps
# real/imag as separate f32 planes end-to-end and runs each stage as ONE
# stacked real matmul:
#     [Cr; Ci] = [[Wr, -Wi], [Wi, Wr]] @ [Xr; Xi]
# Downstream consumers (the Pallas reassignment kernel) want planes anyway.

@lru_cache(maxsize=64)
def _planar_consts(M: int, r0: int, r1: int):
    """Stacked-real stage constants for the half-band flat split
    (k = M2*k1 + k2, n = n1 + M1*n2):
      W1s (2*M1, M1): [[W1r, -W1i], [W1i, W1r]] for the K1 = M1/2
        truncated M1-point iDFT (contraction dim stacked),
      Tr, Ti (M1, M2): twiddle exp(2i*pi*n1*k2/M) planes,
      W2s (2*(r1-r0), 2*M2): [[W2r, -W2i], [W2i, W2r]] for output rows
        n2 in [r0, r1), 1/M folded in. Used as the einsum LHS so the
        output comes out (batch, plane, n2, n1) — flatten-ready, no
        transpose.
    """
    M1, M2 = best_split(M)
    K1 = M1 // 2
    n1 = np.arange(M1)
    W1 = np.exp(2j * np.pi * np.outer(n1, np.arange(K1)) / M1)
    W1s = np.block([[W1.real, -W1.imag], [W1.imag, W1.real]])
    T = np.exp(2j * np.pi * np.outer(n1, np.arange(M2)) / M)
    n2 = np.arange(r0, r1)
    W2 = np.exp(2j * np.pi * np.outer(n2, np.arange(M2)) / M2) / M
    W2s = np.block([[W2.real, -W2.imag], [W2.imag, W2.real]])
    return (W1s.astype(np.float32), T.real.astype(np.float32),
            T.imag.astype(np.float32), W2s.astype(np.float32))


def _check_nyq(nyq_r, nyq_i, B, dtype):
    # both-or-neither Nyquist planes; default zeros
    if (nyq_r is None) != (nyq_i is None):
        raise ValueError("provide both `nyq_r` and `nyq_i`, or neither")
    if nyq_r is None:
        z = jnp.zeros((B,), dtype)
        return z, z
    return nyq_r, nyq_i


def ifft_mxu_halfband_planar(Zr, Zi, keep=None, nyq_r=None, nyq_i=None,
                             precision=jax.lax.Precision.HIGH):
    """Planar half-band inverse FFT.

    Zr, Zi: (B, K1, M2) f32 — real/imag planes of the half spectrum in
    natural layout: plane[b, k1, k2] = spectrum[b, M2*k1 + k2] for
    k1 < K1 = M1/2 (bins k < M/2; bins > M/2 zero — the analytic case).

    Each stage is one batched stacked-real matmul — the [[r,-i],[i,r]]
    block trick does the complex combines inside the dot (XLA's c64
    einsum lowers to 4 dots + separate combine passes). Stage 2 uses the
    DFT matrix as the einsum LHS so the result lands in
    (B, plane, n2, n1) order: flattening n2*M1+n1 = n needs no transpose.

    keep=(start, length) fuses the caller's unpad: only output rows n2
    covering [start, start+length) are computed.
    nyq_r/nyq_i: optional (B,) planes of the Nyquist bin (k = M/2),
    added as Xnyq * (-1)^n / M elementwise.

    Returns (xr, xi): (B, length) f32 planes.
    """
    B, K1, M2 = Zr.shape
    M1 = 2 * K1
    M = M1 * M2
    if keep is None:
        keep = (0, M)
    nyq_r, nyq_i = _check_nyq(nyq_r, nyq_i, B, Zr.dtype)
    start, length = keep
    r0 = start // M1
    r1 = -(-(start + length) // M1)
    W1s_np, Tr_np, Ti_np, W2s_np = _planar_consts(M, r0, r1)

    # stage 1: B1[b, (p,n1), k2] = sum_{(q,k1)} W1s X  (contraction 2*K1)
    Z = jnp.concatenate([Zr, Zi], axis=-2)                 # (B, 2K1, M2)
    B1 = jnp.einsum("nk,bkm->bnm", jnp.asarray(W1s_np), Z,
                    precision=precision)                   # (B, 2M1, M2)
    Br, Bi = B1[:, :M1], B1[:, M1:]
    # twiddle + plane-pairing on the k2 axis (one fused elementwise pass)
    Tr, Ti = jnp.asarray(Tr_np), jnp.asarray(Ti_np)
    C = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                        axis=-1)                           # (B, M1, 2M2)
    # stage 2: OUT[b, (p,n2), n1] = sum_{(q,k2)} W2s C  (contraction 2*M2)
    OUT = jnp.einsum("nk,bmk->bnm", jnp.asarray(W2s_np), C,
                     precision=precision)                  # (B, 2R, M1)
    OUT = OUT.reshape(B, 2, (r1 - r0) * M1)
    off = start - r0 * M1
    xr = OUT[:, 0, off:off + length]
    xi = OUT[:, 1, off:off + length]
    alt = jnp.asarray(_alt_sign(M))[start:start + length]
    xr = xr + nyq_r[:, None] * alt
    xi = xi + nyq_i[:, None] * alt
    return xr, xi
