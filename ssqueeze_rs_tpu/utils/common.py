"""Small shared helpers (host-side).

Reference behaviors covered: old/ssqueezepy/utils/common.py (WARN, p2up, mad),
old/ssqueezepy/toolkit.py:38-42 (mad_rms).
"""
from __future__ import annotations

import logging

import numpy as np

logging.basicConfig(format="")
_logger = logging.getLogger("ssqueeze_rs_tpu")


def WARN(msg: str):
    _logger.warning("WARNING: %s", msg)


def NOTE(msg: str):
    _logger.warning("NOTE: %s", msg)


def assert_is_one_of(x, name, supported, e=ValueError):
    if x not in supported:
        raise e(f"`{name}` must be one of: {', '.join(map(str, supported))} (got {x})")


def mad(data, axis=None):
    """Mean absolute deviation. (reference: utils/common.py:297-300)"""
    data = np.asarray(data)
    return np.mean(np.abs(data - np.mean(data, axis)), axis)


def mad_rms(x, xrec):
    """Reconstruction error metric used by all inversion tests.

    mean|x - xrec| / rms(x)  (reference: old/ssqueezepy/toolkit.py:38-42)
    """
    x = np.asarray(x)
    xrec = np.asarray(xrec)
    return float(np.mean(np.abs(x - xrec)) / np.sqrt(np.mean(x**2)))


def est_riskshrink_thresh(Wx, nv):
    """RiskShrink hard-threshold estimate (reference: utils/common.py:248-276)."""
    Wx = np.asarray(Wx)
    N = Wx.shape[-1]
    Wx_fine = np.abs(Wx[..., :nv, :])
    return 1.4826 * np.sqrt(2 * np.log(N)) * mad(Wx_fine)
