"""Four-step (Bailey) iFFT on the MXU for large power-of-2 sizes.

XLA's TPU FFT runs the classic ladder on the VPU at ~1.2 TFLOP/s effective;
for the CWT's batched iFFT (hundreds of rows x 2^18) the four-step
decomposition M = M1*M2 turns the transform into two batched 512-point DFT
matmuls + one twiddle multiply — MXU work at bf16_3x precision
(~2^-22 relative error, slightly better than a float32 FFT ladder).

    x[M2*n1 + n2] = sum_{k1} W1[k1,n1] * T[n2,k1] *
                    sum_{k2} W2[n2,k2] * X[k1 + M1*k2]

Used by cwt_core for float32 when M decomposes into factors <= 2048
(config flag SSQ_TPU_MXU_FFT: auto = on TPU only; XLA fft elsewhere).
"""
from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ifft_mxu", "use_mxu_fft", "best_split"]


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


@lru_cache(maxsize=32)
def _consts(M: int):
    M1, M2 = best_split(M)
    k2 = np.arange(M2)
    n2 = np.arange(M2)
    W2 = np.exp(2j * np.pi * np.outer(n2, k2) / M2)           # (M2, M2)
    k1 = np.arange(M1)
    n1 = np.arange(M1)
    W1 = np.exp(2j * np.pi * np.outer(k1, n1) / M1)           # (M1, M1)
    T = np.exp(2j * np.pi * np.outer(n2, k1) / M)             # (M2, M1)
    c = np.complex64
    return (W2 / M).astype(c), W1.astype(c), T.astype(c)


def ifft_mxu(X, precision=jax.lax.Precision.HIGH):
    """Inverse FFT along the last axis via two MXU matmul stages.

    X: (..., M) complex64, M a power of 2 with factors <= 2048.
    Matches jnp.fft.ifft to ~1e-6 relative (float32-class accuracy).
    """
    M = X.shape[-1]
    M1, M2 = best_split(M)
    W2_np, W1_np, T_np = _consts(M)
    W2 = jnp.asarray(W2_np)
    W1 = jnp.asarray(W1_np)
    T = jnp.asarray(T_np)

    batch = X.shape[:-1]
    X2 = X.reshape(batch + (M2, M1))            # [k2, k1]
    # stage 1: A[n2, k1] = sum_k2 W2[n2,k2] X2[k2,k1]  (+ twiddle folded in)
    A = jnp.einsum("nk,...km->...nm", W2, X2, precision=precision)
    A = A * T                                    # (..., M2=n2, M1=k1)
    # stage 2: out[n2, n1] = sum_k1 A[n2,k1] W1[k1,n1]
    out = jnp.einsum("...nm,ml->...nl", A, W1, precision=precision)
    # x[M2*n1 + n2] = out[n2, n1] -> transpose to (n1, n2)
    return jnp.swapaxes(out, -1, -2).reshape(batch + (M,))


def fft_mxu(X, precision=jax.lax.Precision.HIGH):
    """Forward FFT along the last axis (conjugate trick)."""
    M = X.shape[-1]
    return jnp.conj(ifft_mxu(jnp.conj(X), precision)) * M
