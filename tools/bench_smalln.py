"""Small-N (10k) latency decomposition + kernel-variant A/B (VERDICT r3 #7).

BENCH_TABLE's 10k single-shot cells (3.7-5.4 ms) sit near the measured
~1.7 ms per-program dispatch floor; this harness separates dispatch from
compute at N=10_000 and A/Bs the rbN row-blocked cwt kernel (a measured
kill at 160k from VMEM pressure, but at M=2^14 the working set is ~16x
smaller and per-grid-step latency dominates instead).

SSQ_TPU_FFT_IMPL is read at CALL time (fft_pallas.fft_impl), so each
variant's jit wrapper is a DISTINCT function object traced with the env
already set — in-process switching is safe (CLAUDE.md), unlike the
trace-time flags.

Run: python tools/bench_smalln.py   (real chip; ~2 min)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, args, K=16, reps=3, tag=""):
    out = fn(*args, 0)
    _ = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag:22s} {best * 1e3:8.3f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_cwt, cwt, Wavelet
    from ssqueeze_rs_tpu.scales import process_scales

    N = 10_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    wavelet = Wavelet.build("gmw")
    scales = process_scales("log-piecewise", N, wavelet)
    print(f"N={N} na={len(np.asarray(scales))}", flush=True)

    @jax.jit
    def null_fn(x, i):
        return jnp.sum(x[:8]) + i

    timed(null_fn, (x,), tag="null (dispatch)")

    def make_ssq(impl):
        os.environ["SSQ_TPU_FFT_IMPL"] = impl

        @jax.jit
        def fn(x, i):
            Tx = ssq_cwt(x + i * 1e-12, wavelet, scales=scales, fs=1.0,
                         dtype="float32")[0]
            return jnp.sum(jnp.abs(Tx))

        fn(x, 0)  # trace with env set
        return fn

    def make_cwt(impl):
        os.environ["SSQ_TPU_FFT_IMPL"] = impl

        @jax.jit
        def fn(x, i):
            Wx = cwt(x + i * 1e-12, wavelet, scales=scales, fs=1.0,
                     dtype="float32")[0]
            return jnp.sum(jnp.abs(Wx))

        fn(x, 0)
        return fn

    for impl in ("dot3", "rb2", "rb4", "rb8"):
        timed(make_cwt(impl), (x,), tag=f"cwt[{impl}]")
    for impl in ("dot3", "rb2", "rb4", "rb8"):
        timed(make_ssq(impl), (x,), tag=f"ssq_cwt[{impl}]")
    os.environ.pop("SSQ_TPU_FFT_IMPL", None)
    # slice decomposition at this N: python tools/profile_ssq.py 10000


if __name__ == "__main__":
    main()
