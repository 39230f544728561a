"""Randomized on-chip config fuzz: random (N, n_fft, hop, wavelet,
scales) combinations driven under jit with scalar-only checks. Complements
tools/tpu_smoke.py (fixed flows) and the CPU oracle-parity sweep.

Run from the repo root:  python tools/tpu_fuzz.py [n_trials] [seed]
Exit code 0 = all trials passed.
"""
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(n_trials=6, seed=42):
    import jax
    import jax.numpy as jnp
    import ssqueeze_rs_tpu as ssq

    print(f"backend: {jax.default_backend()}  trials={n_trials} seed={seed}")
    rng = np.random.default_rng(seed)
    fails = []

    @partial(jax.jit, static_argnames=("n_fft", "hop", "wavelet", "scales"))
    def drive(x, n_fft, hop, wavelet, scales):
        Sx = ssq.stft(x, n_fft=n_fft, hop_len=hop, dtype="float32")
        Tx, Wx, fr, sc = ssq.ssq_cwt(x, wavelet, scales=scales,
                                     dtype="float32")
        xr = ssq.istft(Sx, n_fft=n_fft, hop_len=hop, N=x.shape[-1])
        return (jnp.sum(jnp.abs(Sx)), jnp.sum(jnp.abs(Tx)),
                jnp.mean(jnp.abs(x - xr)) / jnp.sqrt(jnp.mean(x ** 2)))

    for trial in range(n_trials):
        N = int(rng.integers(2000, 40000))
        n_fft = int(rng.integers(33, 512))
        hop = int(rng.integers(1, 8))
        wavelet = str(rng.choice(["gmw", "morlet"]))
        scales = str(rng.choice(["log", "log-piecewise"]))
        x = jnp.asarray(rng.standard_normal(N), jnp.float32)
        cfg = f"N={N} n_fft={n_fft} hop={hop} {wavelet}/{scales}"
        try:
            s1, s2, e = drive(x, n_fft=n_fft, hop=hop, wavelet=wavelet,
                              scales=scales)
            ok = (np.isfinite(float(s1)) and np.isfinite(float(s2)) and
                  float(e) < 1e-4)
            print(f"  {'PASS' if ok else 'FAIL'}  {cfg}  "
                  f"istft_err={float(e):.1e}")
            if not ok:
                fails.append(cfg)
        except Exception as ex:
            print(f"  FAIL  {cfg}  {type(ex).__name__}: {str(ex)[:60]}")
            fails.append(cfg)

    # pinned regression (r5, VERDICT r4 weak #6): SHORT OFF-BIN tone at
    # DEFAULT gamma — leakage-dominated w estimates scatter across bins,
    # so the banded ssq_stft mega kernel must take its full-loop
    # fallback and stay CORRECT (the fallback is the unchanged full
    # kernel, ~1.8x slower than the banded branch; raising gamma to
    # ~1e-3 masks the leakage and restores banding — see the ssq_stft
    # docstring perf note).
    N, fs, n_fft = 16000, 1000.0, 256
    f0 = 117.37                      # between STFT bins (off-bin)
    tt = np.arange(N) / fs
    x = jnp.asarray(np.cos(2 * np.pi * f0 * tt), jnp.float32)

    @jax.jit
    def drive_offbin(x):
        Tx, Sx, *_ = ssq.ssq_stft(x, n_fft=n_fft, fs=fs, dtype="float32")
        row = jnp.argmax(jnp.sum(jnp.abs(Tx), axis=-1))
        return jnp.sum(jnp.abs(Tx)), row

    cfg = f"pinned off-bin tone N={N} n_fft={n_fft} f0={f0}"
    try:
        s, row = drive_offbin(x)
        nf = n_fft // 2 + 1
        fpk = float(row) / (nf - 1) * fs / 2
        ok = np.isfinite(float(s)) and abs(fpk - f0) <= 2 * fs / n_fft
        print(f"  {'PASS' if ok else 'FAIL'}  {cfg}  peak={fpk:.1f} Hz")
        if not ok:
            fails.append(cfg)
    except Exception as ex:
        print(f"  FAIL  {cfg}  {type(ex).__name__}: {str(ex)[:60]}")
        fails.append(cfg)

    print("ALL PASS" if not fails else f"FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    sys.exit(main(n, s))
