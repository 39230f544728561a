"""A/B the STFT-family kernel MXU issue patterns on the real chip.

Headline configs (N=160k, n_fft=598, hop=1, f32) for the three fused
kernels, with impl threaded EXPLICITLY (static jit arg — one process
times both patterns correctly, like tools/bench_fft_impl.py):

  stft   : stft_dft_fused, rows=600 (Sr;Si), 6 dots/tile vs 1
  istft  : istft_ola_fused, 12 dots/tile vs 1 (12x contraction)
  ssq    : ssq_stft_fused mega kernel, rows=4*nf8=1208, 6 dots vs 1

Expectation (docs/DESIGN.md r3 dot-issue analysis): back-to-back small
dots sustain ~70 T MAC/s; stacking multiplies per-dot depth by 6 (12)
at the same MAC count, so if the kernels are dot-issue-bound the DFT
share (~5 ms of stft's 8.5) compresses toward its MAC floor.

Run: python tools/bench_stft_impl.py [K reps]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from ssqueeze_rs_tpu.ops.stft import _dft_matrix, _irfft_mats
from ssqueeze_rs_tpu.ops import stft_pallas as sp
from ssqueeze_rs_tpu.utils.windows import get_window

N, N_FFT, FS = 160000, 598, 1.0
MP = N + N_FFT - 1


def timed(f, args, K, reps=3):
    out = f(*args)
    chk = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    return best, chk


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"device {jax.devices()} K={K}", file=sys.stderr, flush=True)
    window, diff_window = get_window(None, N_FFT, derivative=True)

    F1 = _dft_matrix(window, N_FFT, True)
    F2 = _dft_matrix(diff_window, N_FFT, True)
    nf = N_FFT // 2 + 1

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (MP,), jnp.float32)

    xp = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    # -- stft (Sr; Si rows) --------------------------------------------------
    K_T = np.ascontiguousarray(
        np.concatenate([F1.real, F1.imag], axis=1).T).astype(np.float32)

    def make_stft(impl):
        @jax.jit
        def f(xp):
            o = sp.stft_dft_fused(xp, K_T, N_FFT, N, interpret=False,
                                  impl=impl)
            return jnp.sum(jnp.abs(o))
        return f

    for impl in ("dot6", "dot1"):
        try:
            ms, chk = timed(make_stft(impl), (xp,), K)
            print(f"stft  {impl:5s} {ms*1e3:8.3f} ms  chk {chk:.6e}",
                  flush=True)
        except Exception as e:
            print(f"stft  {impl:5s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # -- istft ---------------------------------------------------------------
    Fr_np, Fs_np = _irfft_mats(N_FFT, True)

    @jax.jit
    def genS(key):
        ks = jax.random.split(key, 2)
        return (jax.random.normal(ks[0], (nf, N), jnp.float32),
                jax.random.normal(ks[1], (nf, N), jnp.float32))

    SrS, SiS = jax.block_until_ready(genS(jax.random.PRNGKey(1)))

    def make_istft(impl):
        @jax.jit
        def f(Sr, Si):
            Sx = jax.lax.complex(Sr, Si)
            o = sp.istft_ola_fused(Sx, Fr_np, Fs_np, N_FFT,
                                   interpret=False, impl=impl)
            return jnp.sum(jnp.abs(o))
        return f

    for impl in ("dot6", "dot1"):
        try:
            ms, chk = timed(make_istft(impl), (SrS, SiS), K)
            print(f"istft {impl:5s} {ms*1e3:8.3f} ms  chk {chk:.6e}",
                  flush=True)
        except Exception as e:
            print(f"istft {impl:5s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # -- mega ssq_stft -------------------------------------------------------
    from ssqueeze_rs_tpu.ops.ssqueeze import plan_reassignment
    K_T4 = np.ascontiguousarray(np.concatenate(
        [F1.real, F1.imag, F2.real, F2.imag], axis=1).T).astype(np.float32)
    Sfs = np.linspace(0, 0.5 * FS, nf, dtype=np.float32)
    const_arr, mode, params = plan_reassignment(Sfs, nf, False,
                                                transform="stft")
    const_arr = np.broadcast_to(np.asarray(const_arr, np.float32), (nf,))

    def make_ssq(impl):
        @jax.jit
        def f(xp):
            Tx, Sx = sp.ssq_stft_fused(
                xp, K_T4, N_FFT, N, FS, Sfs, const_arr, 1e-8, params,
                mode=mode, flipud=False, interpret=False, impl=impl)
            return (jnp.sum(jnp.abs(Tx.real)) + jnp.sum(jnp.abs(Tx.imag))
                    + jnp.sum(jnp.abs(Sx.real)))
        return f

    for impl in ("dot6", "dot1"):
        try:
            ms, chk = timed(make_ssq(impl), (xp,), K)
            print(f"ssq   {impl:5s} {ms*1e3:8.3f} ms  chk {chk:.6e}",
                  flush=True)
        except Exception as e:
            print(f"ssq   {impl:5s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
