"""Replicate the reference benchmark table on TPU.

Reference configs (old/examples/benchmarks.py:80-126, old/README.md:40-54):
output (300, len(x)) rows, float32, padding on, N in {10k, 160k}, for
cwt / stft / ssq_cwt / ssq_stft. Reference numbers below are the
published GTX 1070 GPU column (old/README.md:47-54).

Timing uses the axon-relay-safe pattern (see CLAUDE.md): enqueue K calls
back-to-back, fetch one device scalar, divide wall time by K.

NOTE: each dispatched program carries ~5 ms fixed relay overhead, which
dominates the 10k configs (device time there is ~2 ms) — a directly
attached chip would not pay it.

Run: python examples/benchmarks.py   (from the repo root)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REF_GPU_S = {  # old/README.md:47-54
    (10_000, "cwt"): 0.00393,
    (10_000, "stft"): 0.00534,
    (10_000, "ssq_cwt"): 0.00941,
    (10_000, "ssq_stft"): 0.0278,
    (160_000, "cwt"): 0.0367,
    (160_000, "stft"): 0.0643,
    (160_000, "ssq_cwt"): 0.0856,
    (160_000, "ssq_stft"): 0.159,
}


def timed(fn, args, K=8):
    out = fn(*args, 0)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*args, i + 1) for i in range(K)]
    float(outs[-1])
    return (time.perf_counter() - t0) / K


def main():
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_cwt, cwt, stft, ssq_stft, Wavelet
    from ssqueeze_rs_tpu.scales import process_scales

    n_rows = 300
    n_fft = n_rows * 2 - 2
    wavelet = Wavelet.build("gmw")
    rng = np.random.default_rng(0)

    rows = []
    for N in (10_000, 160_000):
        x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
        scales = process_scales("log-piecewise", N, wavelet)[:n_rows]

        @jax.jit
        def cwt_fn(x, i, scales=scales):
            return jnp.sum(jnp.abs(
                cwt(x + i * 1e-12, wavelet, scales=scales,
                    dtype="float32")[0]))

        @jax.jit
        def stft_fn(x, i):
            return jnp.sum(jnp.abs(
                stft(x + i * 1e-12, n_fft=n_fft, hop_len=1,
                     dtype="float32")))

        @jax.jit
        def ssq_cwt_fn(x, i, scales=scales):
            return jnp.sum(jnp.abs(
                ssq_cwt(x + i * 1e-12, wavelet, scales=scales, fs=1.0,
                        dtype="float32")[0]))

        @jax.jit
        def ssq_stft_fn(x, i):
            return jnp.sum(jnp.abs(
                ssq_stft(x + i * 1e-12, n_fft=n_fft, dtype="float32")[0]))

        for name, fn in (("cwt", cwt_fn), ("stft", stft_fn),
                         ("ssq_cwt", ssq_cwt_fn), ("ssq_stft", ssq_stft_fn)):
            t = timed(fn, (x,), K=8 if N == 10_000 else 4)
            ref = REF_GPU_S[(N, name)]
            rows.append((N, name, t, ref, ref / t))
            print(f"{N // 1000}k-{name}: {t * 1e3:8.2f} ms   "
                  f"(ref GPU {ref * 1e3:7.2f} ms, speedup {ref / t:5.2f}x)",
                  flush=True)

    print("\n| N | transform | TPU (ms) | ref GPU (ms) | speedup |")
    print("|---|---|---|---|---|")
    for N, name, t, ref, sp in rows:
        print(f"| {N // 1000}k | {name} | {t * 1e3:.2f} | {ref * 1e3:.2f} "
              f"| {sp:.2f}x |")


if __name__ == "__main__":
    main()
