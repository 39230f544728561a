"""Generalized Morse Wavelets.

Closed forms and higher-order (Laguerre) construction matching the reference
(old/ssqueezepy/_gmw.py). Constants are precomputed on host (scipy gamma
functions); the returned `fn(w, xp)` traces cleanly under jit.

  L1 (bandpass): psih(w) = 2*exp(-beta*ln(wc) + wc^gamma + beta*ln(w) - w^gamma)
  L2 (energy):   psih(w) = sqrt(2*pi*gamma*2^r / Gamma(r)) * w^beta * exp(-w^gamma),
                 r = (2*beta+1)/gamma
  order k > 0:   multiplied by generalized Laguerre polynomial in 2*w^gamma
                 with Gamma-ratio coefficients (reference _gmw.py:366-394).
"""
from __future__ import annotations

import numpy as np
from scipy.special import gammaln as gammaln_fn, gamma as gamma_fn

from .base import register_family
from ..utils.common import assert_is_one_of

pi = np.pi


def morsefreq(gamma: float, beta: float, n_out: int = 1):
    """GMW frequency measures (radian): peak, energy, instantaneous, and
    (n_out=4) the curvature of the instantaneous frequency at the wavelet
    center, from the 2nd/3rd frequency cumulants
    (reference: old/ssqueezepy/_gmw.py:611-657)."""
    wm = (beta / gamma) ** (1 / gamma)
    if n_out == 1:
        return wm
    we = (1 / 2 ** (1 / gamma)) * (gamma_fn((2 * beta + 2) / gamma) /
                                   gamma_fn((2 * beta + 1) / gamma))
    if n_out == 2:
        return wm, we
    wi = gamma_fn((beta + 2) / gamma) / gamma_fn((beta + 1) / gamma)
    if n_out == 3:
        return wm, we, wi
    k2 = _morsemom(2, gamma, beta, n_out=3)[-1]
    k3 = _morsemom(3, gamma, beta, n_out=3)[-1]
    cwi = -(k3 / k2 ** 1.5)
    return wm, we, wi, cwi


def _morsef(gamma, beta):
    """Normalized first frequency-domain moment of the order-1 GMW:
    f_{beta,gamma} = Gamma((beta+1)/gamma) / (2*pi*gamma)
    (reference: old/ssqueezepy/_gmw.py:690-694). Vectorized over `beta`."""
    return gamma_fn((np.asarray(beta) + 1) / gamma) / (2 * pi * gamma)


def _morsemom(p, gamma: float, beta: float, n_out: int = 4):
    """Frequency-domain p-th order (energy) moments and cumulants of the
    order-1 GMW under bandpass normalization
    (reference parity: old/ssqueezepy/_gmw.py:660-725):

        Mp = A(gamma,beta) * f_{beta+p,gamma}          (moment)
        Np = 2 / 2^((1+p)/gamma) * Mp[beta -> 2*beta]  (energy moment)
        Kp = p-th cumulant of [M0..Mp]
        Lp = p-th cumulant of [N0..Np]

    Returns Mp | (Mp, Np) | (Mp, Np, Kp) | (Mp, Np, Kp, Lp) per n_out.
    `p` may be an int or a 1D array (moments/energy-moments vectorize)."""
    mom = lambda q, b: morseafun(gamma, b, k=1) * _morsef(
        gamma, np.asarray(b) + q)
    Mp = mom(p, beta)
    if n_out == 1:
        return Mp
    Np = (2 / 2 ** ((1 + np.asarray(p, dtype=np.float64)) / gamma)
          ) * mom(p, 2 * beta)
    if n_out == 2:
        return Mp, Np
    prange = np.arange(int(np.max(p)) + 1)
    Kp = _moments_to_cumulants(mom(prange, beta))[p]
    if n_out == 3:
        return Mp, Np, Kp
    Lp = _moments_to_cumulants(
        (2 / 2 ** ((1 + prange) / gamma)) * mom(prange, 2 * beta))[p]
    return Mp, Np, Kp, Lp


def _moments_to_cumulants(moments):
    """First-N cumulants [K0..K{N-1}] from first-N raw moments
    [M0..M{N-1}] via the standard recurrence
    K0 = ln(M0);  Kn = Mn/M0 - sum_{k=1}^{n-1} C(n-1,k-1)*Kk*M_{n-k}/M0
    (reference parity: old/ssqueezepy/_gmw.py:727-747)."""
    from math import comb
    m = np.atleast_1d(np.asarray(moments, dtype=np.float64).squeeze())
    assert m.ndim == 1
    kc = np.zeros(len(m))
    kc[0] = np.log(m[0])
    for n in range(1, len(m)):
        acc = sum(comb(n - 1, k - 1) * kc[k] * (m[n - k] / m[0])
                  for k in range(1, n))
        kc[n] = m[n] / m[0] - acc
    return kc


def gmw_k_constants(gamma: float, beta: float, k: int, norm: str = "bandpass"):
    """Laguerre-polynomial + normalization constants for order-k GMWs
    (reference: old/ssqueezepy/_gmw.py:366-394)."""
    r = (2 * beta + 1) / gamma
    c = r - 1
    if norm == "bandpass":
        coeff = np.sqrt(np.exp(gammaln_fn(r) + gammaln_fn(k + 1) -
                               gammaln_fn(k + r)))
    else:
        coeff = np.sqrt(2 * pi * gamma * (2**r) *
                        np.exp(gammaln_fn(k + 1) - gammaln_fn(k + r)))
    L = np.zeros(k + 1)
    for m in range(k + 1):
        fact = np.exp(gammaln_fn(k + c + 1) - gammaln_fn(c + m + 1) -
                      gammaln_fn(k - m + 1))
        L[m] = (-1) ** m * fact / gamma_fn(m + 1)
    k_consts = L * coeff
    if norm == "bandpass":
        k_consts = k_consts * 2
    return k_consts


@register_family("gmw")
def _build_gmw(cfg):
    gamma = float(cfg.get("gamma", 3.0))
    beta = float(cfg.get("beta", 60.0))
    norm = cfg.get("norm", "bandpass")
    order = int(cfg.get("order", 0))
    centered_scale = bool(cfg.get("centered_scale", False))
    if gamma <= 0:
        raise ValueError(f"`gamma` must be positive (got {gamma})")
    if beta <= 0:
        raise ValueError(f"`beta` must be positive (got {beta}); "
                         "use morsewave for beta=0")
    if norm not in ("bandpass", "energy"):
        raise ValueError(f"`norm` must be 'bandpass' or 'energy' (got {norm})")

    wc = morsefreq(gamma, beta)
    wcl = np.log(wc)

    if order == 0:
        if norm == "bandpass":
            def fn(w, xp):
                if centered_scale:
                    w = w * wc
                wp = w * (w >= 0)
                wl = xp.log(xp.where(w > 0, wp, 1.0))
                return 2 * xp.exp(-beta * wcl + wc**gamma
                                  + beta * wl - wp**gamma) * (w > 0)
        else:
            r = (2 * beta + 1) / gamma
            A = np.sqrt(2.0 * pi * gamma * 2.0**r / gamma_fn(r))

            def fn(w, xp):
                if centered_scale:
                    w = w * wc
                wp = w * (w >= 0)
                return A * wp**beta * xp.exp(-(wp**gamma)) * (w >= 0)
    else:
        k_consts = gmw_k_constants(gamma, beta, order, norm)

        if norm == "bandpass":
            def fn(w, xp):
                if centered_scale:
                    w = w * wc
                wp = w * (w >= 0)
                C = k_consts[0] * xp.ones_like(wp)
                for m in range(1, len(k_consts)):
                    C = C + k_consts[m] * (2 * wp**gamma) ** m
                wl = xp.log(xp.where(w > 0, wp, 1.0))
                return C * xp.exp(-beta * wcl + wc**gamma
                                  + beta * wl - wp**gamma) * (w > 0)
        else:
            def fn(w, xp):
                if centered_scale:
                    w = w * wc
                wp = w * (w >= 0)
                C = k_consts[0] * xp.ones_like(wp)
                for m in range(1, len(k_consts)):
                    C = C + k_consts[m] * (2 * wp**gamma) ** m
                wl = xp.log(xp.where(w > 0, wp, 1.0))
                return C * xp.exp(beta * wl - wp**gamma) * (w > 0)

    return fn


# -- full K-family generator (jLab morsewave port-equivalent) ------------------
def laguerre(x, k: int, c: float):
    """Generalized Laguerre polynomial L_k^c(x)
    (reference: old/ssqueezepy/_gmw.py:592-608)."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64).squeeze())
    y = np.zeros(x.shape)
    for m in range(k + 1):
        fact = np.exp(gammaln_fn(k + c + 1) - gammaln_fn(c + m + 1) -
                      gammaln_fn(k - m + 1))
        y += (-1) ** m * fact * x**m / gamma_fn(m + 1)
    return y


def morseafun(gamma: float, beta: float, k: int = 1, norm: str = "bandpass"):
    """GMW peak amplitude (reference: old/ssqueezepy/_gmw.py:555-589)."""
    if norm == "energy":
        r = (2 * beta + 1) / gamma
        return np.sqrt(2 * pi * gamma * (2**r) *
                       np.exp(gammaln_fn(k) - gammaln_fn(k + r - 1)))
    if beta == 0:
        return 2.0
    wc = morsefreq(gamma, beta)
    return 2.0 / np.exp(beta * np.log(wc) - wc**gamma)


def morsewave(N: int, freqs, gamma: float = 3, beta: float = 60, K: int = 1,
              norm: str = "bandpass"):
    """First-K orthogonal GMWs at (radian) peak frequencies `freqs`.

    Host-side generator matching reference semantics
    (old/ssqueezepy/_gmw.py:398-552). Returns (psih, psi), each of shape
    (N, len(freqs), K) with length-1 dims squeezed.

    Quirk preserved: `beta=0` raises ZeroDivisionError (peak frequency is
    0) — the reference documents a beta-0 lowpass but its own
    `_morsewave1` crashes identically (`fact = f / fo`, _gmw.py:487).
    """
    if gamma <= 0:
        raise ValueError(f"`gamma` must be positive (got {gamma})")
    if beta < 0:
        raise ValueError(f"`beta` must be non-negative (got {beta})")
    assert_is_one_of(norm, "norm", ("bandpass", "energy"))
    if not isinstance(freqs, (list, tuple, np.ndarray)):
        freqs = [freqs]
    psi = np.zeros((N, len(freqs), K), dtype="complex128")
    psif = np.zeros((N, len(freqs), K))

    for n, f in enumerate(freqs):
        X, x = _morse_family(N, abs(f), gamma, beta, K, norm)
        psif[:, n:n + 1, :], psi[:, n:n + 1, :] = X, x
        if f < 0:
            # negative frequency: conjugate time wavelet / mirror spectrum
            psi[:, n:n + 1, :] = psi[:, n, :].conj()[:, None]
            psif[1:, n:n + 1, :] = np.flip(psif[1:, n, :], axis=0)[:, None]

    return psif.squeeze(), psi.squeeze()


def _morse_order_coeffs(gamma, beta, K, norm, fact):
    """Normalization coefficient per order k = 0..K-1 (vectorized)."""
    if norm == "energy":
        return np.array([np.sqrt(1.0 / fact) *
                         morseafun(gamma, beta, k + 1, norm="energy")
                         for k in range(K)])
    if beta == 0:
        return np.ones(K)
    r = (2 * beta + 1) / gamma
    ks = np.arange(K, dtype=np.float64)
    return np.sqrt(np.exp(gammaln_fn(r) + gammaln_fn(ks + 1) -
                          gammaln_fn(ks + r)))


def _morse_family(N, f, gamma, beta, K, norm):
    """Spectrum + centered time wavelets of the first K orders at peak
    frequency `f`. The spectrum is analytic: only bins 0..N//2 are
    nonzero, so everything is computed on the half grid and placed into
    a zero full-length array (the reference computes full-length and
    masks, _gmw.py:485-552 — same values, different organization)."""
    fo = morsefreq(gamma, beta)
    fact = f / fo
    nhalf = N // 2 + 1
    # digital radian grid, peak moved to bin index N*f/(2*pi*fact)
    w = (2 * pi * np.linspace(0, 1, N, endpoint=False)[:nhalf] / fact)

    with np.errstate(divide="ignore", invalid="ignore"):
        if beta == 0:
            envelope = np.exp(-(w ** gamma))
            base = envelope if norm == "energy" else 2 * envelope
        elif norm == "energy":
            base = np.exp(beta * np.log(w) - w ** gamma)
        else:
            # log-domain form, cancels the wc**beta blowup
            base = 2 * np.exp(-beta * np.log(fo) + fo ** gamma
                              + beta * np.log(w) - w ** gamma)
    if beta == 0:
        base[0] /= 2            # unit-step halving for the lowpass
    base[~np.isfinite(base)] = 0.0

    coeffs = _morse_order_coeffs(gamma, beta, K, norm, fact)
    c = (2 * beta + 1) / gamma - 1
    lag = np.stack([laguerre(2 * (w ** gamma), k, c) for k in range(K)],
                   axis=-1)                                   # (nhalf, K)
    half = coeffs * base[:, None] * lag
    half[np.isinf(half)] = 0.0

    psif = np.zeros((N, 1, K))
    psif[:nhalf, 0, :] = half

    # time domain: alternate spectral signs (= centering shift by N/2),
    # halve the even-N Nyquist bin, invert
    spec = psif.copy()
    spec[1::2] = -spec[1::2]
    if N % 2 == 0:
        spec[N // 2] /= 2
    return psif, np.fft.ifft(spec, axis=0)


# -- factory / array API (reference parity: _gmw.py:22-264) -------------------
def gmw(gamma=3.0, beta=60.0, norm="bandpass", order=0,
        centered_scale=False, dtype="float64"):
    """`lambda w: psih(w)` factory (reference: _gmw.py:22-133)."""
    if norm == "energy" and str(np.dtype(dtype)) == "float32":
        # reference guard (_gmw.py:122-124): wp**beta overflows f32 ->
        # inf*0 NaNs across entire Wx rows
        raise ValueError("`norm='energy'` w/ `dtype='float32'` is "
                         "unsupported; use 'float64' instead.")
    fn = _build_gmw(dict(gamma=gamma, beta=beta, norm=norm, order=order,
                         centered_scale=centered_scale))
    return lambda w: fn(np.atleast_1d(np.asarray(w, dtype)), np)


def gmw_l1(gamma=3.0, beta=60.0, centered_scale=False, dtype="float64"):
    """First-order L1(bandpass) GMW factory (reference: _gmw.py:187-225)."""
    return gmw(gamma, beta, "bandpass", 0, centered_scale, dtype)


def gmw_l2(gamma=3.0, beta=60.0, centered_scale=False, dtype="float64"):
    """First-order L2(energy) GMW factory (reference: _gmw.py:226-264)."""
    return gmw(gamma, beta, "energy", 0, centered_scale, dtype)


def gmw_l1_k(gamma=3.0, beta=60.0, k=1, centered_scale=False,
             dtype="float64"):
    """k-th order L1 GMW factory (reference: _gmw.py:267-330)."""
    return gmw(gamma, beta, "bandpass", k, centered_scale, dtype)


def gmw_l2_k(gamma=3.0, beta=60.0, k=1, centered_scale=False,
             dtype="float64"):
    """k-th order L2 GMW factory (reference: _gmw.py:331-397)."""
    return gmw(gamma, beta, "energy", k, centered_scale, dtype)


def compute_gmw(N, scale, gamma=3.0, beta=60.0, time=False,
                norm="bandpass", order=0, centered_scale=False,
                norm_scale=True, dtype="float64"):
    """Sampled GMW arrays: psih [N] (+ psi [N] if `time`)
    (reference: _gmw.py:134-186)."""
    from ..utils.fft import xifn

    fn = gmw(gamma, beta, norm, order, centered_scale, dtype)
    w = xifn(scale, N)
    X = np.zeros(N, dtype)
    X[:N // 2 + 1] = fn(w[:N // 2 + 1])
    if norm == "energy" and norm_scale:
        wc = float(np.atleast_1d(morsefreq(gamma, beta))[0])
        X *= np.sqrt(wc * scale) if centered_scale else np.sqrt(scale)
    X[np.isinf(X) | np.isnan(X)] = 0.0
    if time:
        Xr = X.copy()
        if N % 2 == 0:
            Xr[N // 2] /= 2  # jLab issue #13 (reference _gmw.py:176-178)
        x = np.fft.ifft(Xr * (-1.0) ** np.arange(N))
        return X, x
    return X
