"""Teager-Kaiser Energy Operator (classic & modified), batched.

Reference behavior: /root/reference/test.rs:10-177 (Rayon channel-parallel
f32 kernels). Here: pure vectorized jnp over any leading channel dims —
the leading-batch-dim + mesh sharding replaces per-channel thread fan-out.

  classic:   psi[n] = x[n]^2 - x[n-1]*x[n+1]            (output len N-2)
  modified:  psi[n] = x[n-1]*x[n-2] - x[n]*x[n-3]       (output len N-3,
             Deburchgrave et al. 2008; l=1, p=2, q=0, s=3)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tkeo", "tkeo_modified"]


@jax.jit
def tkeo(x):
    """Classic TKEO along the last axis. (..., N) -> (..., N-2)."""
    if x.shape[-1] < 3:
        raise ValueError("Signal must have at least 3 points for TKEO")
    return x[..., 1:-1] ** 2 - x[..., :-2] * x[..., 2:]


@jax.jit
def tkeo_modified(x):
    """Modified TKEO along the last axis. (..., N) -> (..., N-3)."""
    if x.shape[-1] < 5:
        raise ValueError("Signal must have at least 5 points for modified "
                         "TKEO")
    # output[i-3] = x[i-1]*x[i-2] - x[i]*x[i-3], i = 3..N-1
    return x[..., 2:-1] * x[..., 1:-2] - x[..., 3:] * x[..., :-3]
