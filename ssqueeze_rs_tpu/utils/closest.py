"""find_closest: nearest-bin search (host-side numpy).

Reference parity: old/ssqueezepy/algos.py:254-449. The transforms never
call this (they use the analytic closed forms in ops/ssqueeze.py); it is
exposed for API parity and as a test oracle.
"""
from __future__ import annotations

import numpy as np

__all__ = ["find_closest", "find_closest_brute", "find_closest_smart",
           "find_closest_log", "find_closest_lin"]


def find_closest_brute(a, v):
    """Exact exhaustive argmin(|a[i,j] - v|)."""
    a = np.asarray(a)
    v = np.asarray(v)
    return np.abs(a[..., None] - v).argmin(-1).astype(np.int32)


def find_closest_smart(a, v):
    """Exact via searchsorted (reference: algos.py:330-344)."""
    a, v = np.asarray(a), np.asarray(v)
    sidx = v.argsort()
    v_s = v[sidx]
    idx = np.searchsorted(v_s, a)
    idx[idx == len(v)] = len(v) - 1
    idx0 = (idx - 1).clip(min=0)
    m = np.abs(a - v_s[idx]) >= np.abs(v_s[idx0] - a)
    m[idx == 0] = 0
    idx[m] -= 1
    return sidx[idx]


def find_closest_log(a, v):
    """Analytic bin for log-distributed `v` (reference: algos.py:376-427)."""
    from ..ops.ssqueeze import bin_params
    mode, p = bin_params(v, True)
    a = np.asarray(a)
    omax = len(v) - 1
    if mode == "log":
        k = np.minimum(np.round(np.maximum(
            (np.log2(a) - p["vlmin"]) / p["dvl"], 0)), omax)
    else:
        al = np.log2(a)
        k_hi = np.minimum(np.round((al - p["vlmin1"]) / p["dvl1"])
                          + p["idx1"], omax)
        k_lo = np.maximum(np.round((al - p["vlmin0"]) / p["dvl0"]), 0)
        k = np.where(al > p["vlmin1"], k_hi, k_lo)
    return k.astype(np.int32)


def find_closest_lin(a, v):
    """Analytic bin for linearly-distributed `v`
    (reference: algos.py:430-443)."""
    vmin, dv = v[0], v[1] - v[0]
    omax = len(v) - 1
    k = np.minimum(np.round(np.maximum((np.asarray(a) - vmin) / dv, 0)), omax)
    return k.astype(np.int32)


def find_closest(a, v, logscale=False, smart=None):
    """Dispatch (reference: algos.py:254-317)."""
    if smart or smart is None:
        if logscale:
            return find_closest_smart(np.log2(a), np.log2(v))
        return find_closest_smart(a, v)
    return find_closest_log(a, v) if logscale else find_closest_lin(a, v)
