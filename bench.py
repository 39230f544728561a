"""Benchmark: ssq_cwt throughput on one chip, replicating the reference's
headline config (old/examples/benchmarks.py:80-126): N=160000 float32,
300 log-piecewise scales, default GMW, maprange='peak'.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "MSamples/s", "vs_baseline": ...}

Baseline: reference GPU (GTX 1070) 160k-ssq_cwt = 0.0856 s
          -> 1.869 MSamples/s (old/README.md:53; BASELINE.md).
"""
import json
import sys
import time

import numpy as np

BASELINE_MSPS = 160000 / 0.0856 / 1e6  # reference GPU ssq_cwt


def _time(fn, n_warmup=2, n_runs=10):
    import jax
    for _ in range(n_warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.mean(ts)), float(np.min(ts))


def main():
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_cwt, cwt, stft, ssq_stft, Wavelet
    from ssqueeze_rs_tpu.scales import process_scales

    N = 160000
    n_rows = 300
    n_fft = n_rows * 2 - 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)

    wavelet = Wavelet.build("gmw")
    scales = process_scales("log-piecewise", N, wavelet)[:n_rows]

    ssq = jax.jit(lambda x: ssq_cwt(x, wavelet, scales=scales, fs=1.0,
                                    dtype="float32")[0])
    t_ssq_cwt, t_ssq_cwt_min = _time(lambda: ssq(x))

    cwt_fn = jax.jit(lambda x: cwt(x, wavelet, scales=scales,
                                   dtype="float32")[0])
    t_cwt, _ = _time(lambda: cwt_fn(x))

    stft_fn = jax.jit(lambda x: stft(x, n_fft=n_fft, hop_len=1,
                                     dtype="float32"))
    t_stft, _ = _time(lambda: stft_fn(x), n_runs=5)

    ssq_stft_fn = jax.jit(lambda x: ssq_stft(x, n_fft=n_fft,
                                             dtype="float32")[0])
    t_ssq_stft, _ = _time(lambda: ssq_stft_fn(x), n_runs=5)

    msps = N / t_ssq_cwt / 1e6
    extras = {
        "160k-cwt_s": round(t_cwt, 5),
        "160k-stft_s": round(t_stft, 5),
        "160k-ssq_cwt_s": round(t_ssq_cwt, 5),
        "160k-ssq_cwt_s_min": round(t_ssq_cwt_min, 5),
        "160k-ssq_stft_s": round(t_ssq_stft, 5),
        "device": str(jax.devices()[0]),
        "n_rows": n_rows,
    }
    print(json.dumps(extras), file=sys.stderr)
    print(json.dumps({
        "metric": "ssq_cwt_160k_throughput",
        "value": round(msps, 3),
        "unit": "MSamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 3),
    }))


if __name__ == "__main__":
    main()
