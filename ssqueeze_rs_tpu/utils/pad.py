"""Signal padding.

Centered padding semantics reproduce the reference exactly
(reference: old/ssqueezepy/utils/common.py:32-158):

  * `p2up(n)` pads to the power of 2 nearest in log2 (NOT next-higher):
    up = 2**(1 + round(log2(n))), left pad gets the extra sample.
  * `padsignal` with explicit `padlength`: left = right, or left = right + 1
    when the total pad is odd.

All pad parameters are static Python ints (shapes must be static under jit);
the pad itself is `jnp.pad` and traces cleanly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .common import assert_is_one_of

PAD_MODES = {
    "reflect": "reflect",
    "symmetric": "symmetric",
    "replicate": "edge",
    "wrap": "wrap",
    "zero": "constant",
}


def next_power_of_2(n: int) -> int:
    """Smallest power of 2 >= n (reference: rust/src/utils/array.rs:8-11)."""
    return 1 if n <= 1 else 2 ** int(np.ceil(np.log2(n)))


def p2up(n: int):
    """(up, n1, n2): power-of-2 target and left/right pad lengths
    (reference: old/ssqueezepy/utils/common.py:32-51)."""
    up = int(2 ** (1 + np.round(np.log2(n))))
    n2 = (up - n) // 2
    n1 = up - n - n2
    return up, n1, n2


def pad_params(N: int, padlength: int | None = None):
    """(n_up, n1, n2) for `padsignal` semantics
    (reference: old/ssqueezepy/utils/common.py:111-121)."""
    if padlength is None:
        return p2up(N)
    n_up = int(padlength)
    if abs(n_up - N) % 2 == 0:
        n1 = n2 = (n_up - N) // 2
    else:
        n2 = (n_up - N) // 2
        n1 = n2 + 1
    return n_up, n1, n2


def padsignal(x, padtype: str = "reflect", padlength: int | None = None,
              get_params: bool = False):
    """Pad `x` (time = last axis) to `padlength` (default: p2up), centered.

    Supports all five reference pad schemes on arbitrary leading batch dims.
    """
    assert_is_one_of(padtype, "padtype", tuple(PAD_MODES))
    N = x.shape[-1]
    n_up, n1, n2 = pad_params(N, padlength)
    pad_width = [(0, 0)] * (x.ndim - 1) + [(n1, n2)]
    xp = jnp.pad(x, pad_width, mode=PAD_MODES[padtype])
    return (xp, n_up, n1, n2) if get_params else xp


def unpad(xp, n1: int, N: int):
    """Trim the centered pad back off: `xp[..., n1:n1+N]`."""
    return xp[..., n1:n1 + N]
