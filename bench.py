"""Benchmark: ssq_cwt throughput on one chip, replicating the reference's
headline config (old/examples/benchmarks.py:80-126): N=160000 float32,
~300 scale rows, default GMW, maprange='peak'.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "MSamples/s", "vs_baseline": ...}

Baseline: reference GPU (GTX 1070) 160k-ssq_cwt = 0.0856 s
          -> 1.869 MSamples/s (old/README.md:53; BASELINE.md).

Timing notes: on the axon relay, `block_until_ready` does not reliably
block and large host<->device transfers are unavailable, so each timed
function reduces its output to a scalar on device; we enqueue K executions
back-to-back and fetch the last scalar, dividing total wall time by K
(device executes in order, so this amortizes dispatch latency).
"""
import os
import json
import sys
import time

import numpy as np

BASELINE = {  # seconds, reference GPU (old/README.md:47-54)
    "160k-cwt": 0.0367,
    "160k-stft": 0.0643,
    "160k-ssq_cwt": 0.0856,
    "160k-ssq_stft": 0.159,
}
BASELINE_MSPS = 160000 / BASELINE["160k-ssq_cwt"] / 1e6


def timed(fn, args, K=8, reps=3):
    """fn(*args, i) -> device scalar. Returns the best (min) of `reps`
    K-call means — the relay/chip shows occasional ~40% slow phases, and
    min-of-means is the standard noise-robust estimator."""
    out = fn(*args, 0)          # compile + run once
    _ = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def _probe_once(timeout_s=120):
    """One relay probe in a daemon thread: a HARD-down relay HANGS the
    matmul fetch (not just slows it), and a hung jnp op cannot be
    cancelled in-process — the thread lets the caller time out and keep
    control. Returns the probe seconds, or None if hung/failed."""
    import threading

    res = {}

    def run():
        try:
            import jax.numpy as jnp
            a = jnp.ones((512, 512), jnp.float32)
            t0 = time.time()
            _ = float((a @ a).sum())
            res["dt"] = time.time() - t0
        except Exception as e:      # noqa: BLE001 — report, don't hang
            res["err"] = str(e)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout_s)
    return res.get("dt")


def _wait_relay_healthy(max_wait_s=480):
    """The axon relay has documented degraded phases (trivial matmul
    taking ~100 s) and hard outages (probe hangs). Sleep-retry while
    degraded so a one-shot driver capture doesn't record a degraded
    phase as the framework's speed; if the relay is hard-down past the
    deadline, emit an honest failure JSON line and exit — a silent hang
    gives the driver nothing at all."""
    deadline = time.time() + max_wait_s
    while True:
        dt = _probe_once()
        if dt is not None and dt < 2.0:
            return True
        state = "hung" if dt is None else f"{dt:.1f}s (degraded)"
        print(f"relay probe {state}; retrying...", file=sys.stderr,
              flush=True)
        if time.time() > deadline:
            if dt is None:
                print(json.dumps({
                    "metric": "160k-ssq_cwt_ms", "value": -1, "unit": "ms",
                    "vs_baseline": 0,
                    "error": "tpu_relay_down: probe hung past deadline"}),
                    flush=True)
                os._exit(3)
            print("relay still degraded; benching anyway",
                  file=sys.stderr, flush=True)
            return False
        time.sleep(45)


def _guarded_backend(timeout_s=300):
    """Backend NAME via a daemon thread: with the relay hard-down, the
    axon client INIT itself hangs (before any probe can run)."""
    import threading

    res = {}

    def run():
        try:
            import jax
            res["backend"] = jax.default_backend()
        except Exception as e:      # noqa: BLE001
            res["err"] = str(e)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout_s)
    if "backend" not in res:
        print(json.dumps({
            "metric": "160k-ssq_cwt_ms", "value": -1, "unit": "ms",
            "vs_baseline": 0,
            "error": "tpu_relay_down: backend init hung/failed "
                     f"({res.get('err', 'timeout')})"}), flush=True)
        os._exit(3)
    return res["backend"]


def main():
    backend = _guarded_backend()
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_cwt, cwt, stft, ssq_stft, Wavelet
    from ssqueeze_rs_tpu.scales import process_scales

    if backend == "tpu":
        _wait_relay_healthy()

    N = 160000
    n_rows = 300
    n_fft = n_rows * 2 - 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)

    wavelet = Wavelet.build("gmw")
    scales = process_scales("log-piecewise", N, wavelet)[:n_rows]
    n_rows_eff = len(scales)

    @jax.jit
    def ssq_fn(x, i):
        Tx = ssq_cwt(x + i * 1e-12, wavelet, scales=scales, fs=1.0,
                     dtype="float32")[0]
        return jnp.sum(jnp.abs(Tx))

    @jax.jit
    def cwt_fn(x, i):
        Wx = cwt(x + i * 1e-12, wavelet, scales=scales, dtype="float32")[0]
        return jnp.sum(jnp.abs(Wx))

    @jax.jit
    def stft_fn(x, i):
        return jnp.sum(jnp.abs(stft(x + i * 1e-12, n_fft=n_fft, hop_len=1,
                                    dtype="float32")))

    @jax.jit
    def ssq_stft_fn(x, i):
        return jnp.sum(jnp.abs(ssq_stft(x + i * 1e-12, n_fft=n_fft,
                                        dtype="float32")[0]))

    # real-signal cell: gamma-masked tone — the banded-reassignment
    # regime (r4; noise above is its worst case / full-loop fallback)
    x_tone = jnp.asarray(np.cos(2 * np.pi * (N / 64) * np.arange(N) / N),
                         dtype=jnp.float32)

    @jax.jit
    def ssq_tone_fn(x, i):
        Tx = ssq_cwt(x + i * 1e-12, wavelet, scales=scales, fs=1.0,
                     gamma=1e-3, dtype="float32")[0]
        return jnp.sum(jnp.abs(Tx))

    # K=16 for EVERY cell (r5): at K=8 the ~12 ms relay round-trip
    # leaks ~1.5 ms into each — the r4 stft/ssq_stft/tone cells carried
    # exactly that vs the K=16 BENCH_TABLE methodology
    t_ssq_cwt = timed(ssq_fn, (x,), K=16)
    t_cwt = timed(cwt_fn, (x,), K=16)
    t_stft = timed(stft_fn, (x,), K=16)
    t_ssq_stft = timed(ssq_stft_fn, (x,), K=16)
    t_ssq_tone = timed(ssq_tone_fn, (x_tone,), K=16)

    msps = N / t_ssq_cwt / 1e6
    extras = {
        "160k-cwt_s": round(t_cwt, 5),
        "160k-stft_s": round(t_stft, 5),
        "160k-ssq_cwt_s": round(t_ssq_cwt, 5),
        "160k-ssq_stft_s": round(t_ssq_stft, 5),
        "160k-ssq_cwt_tone_g1e3_s": round(t_ssq_tone, 5),
        "speedup_vs_ref_gpu": {
            k: round(BASELINE[k] / t, 2)
            for k, t in [("160k-cwt", t_cwt), ("160k-stft", t_stft),
                         ("160k-ssq_cwt", t_ssq_cwt),
                         ("160k-ssq_stft", t_ssq_stft)]},
        "n_rows": n_rows_eff,
        "device": str(jax.devices()[0]),
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
