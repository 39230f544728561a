"""Replicate the reference benchmark table on TPU, plus batched configs.

Reference configs (old/examples/benchmarks.py:80-126, old/README.md:40-54):
output (300, len(x)) rows, float32, padding on, N in {10k, 160k}, for
cwt / stft / ssq_cwt / ssq_stft. Reference numbers below are the
published GTX 1070 GPU column (old/README.md:47-54).

Beyond the reference table, two batched sections (the reference has no
batched numbers; BASELINE.json's north star is 64-channel throughput):
  * amortized small-N: a batch of 16 10k-signals in ONE dispatched
    program — the honest mitigation for the ~4-5 ms fixed relay dispatch
    overhead that dominates single-request 10k latency on this setup
    (a directly-attached chip would not pay it),
  * batched 160k ssq_cwt/cwt at batch 4/8 -> MSamples/s.

Timing uses the axon-relay-safe pattern (see CLAUDE.md): enqueue K calls
back-to-back, fetch one device scalar, divide wall time by K; min of
`reps` repetitions.

Run: python examples/benchmarks.py   (from the repo root)
Writes BENCH_TABLE.json at the repo root.
"""
import json
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


def timed(fn, args, K=8, reps=3):
    out = fn(*args, 0)
    float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_cwt, cwt, stft, ssq_stft, Wavelet
    from ssqueeze_rs_tpu.scales import process_scales

    n_rows = 300
    n_fft = n_rows * 2 - 2
    wavelet = Wavelet.build("gmw")
    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "n_rows": n_rows,
               "single": {}, "amortized_batch16_10k": {},
               "batched_160k": {}}

    # -- reference table: single-signal latency ----------------------------
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
            # DEEP enqueue at every size (K=16, the bench.py
            # steady-state methodology): at K=4 the ~35 ms relay RTT
            # leaks ~RTT/4 ~ 4.5 ms into every 160k cell — the r4
            # "mixed-vintage" table was really this methodology skew
            # (r5: regenerated K=4 reproduced the "stale" numbers
            # exactly; K=16 matches the driver record).
            t = timed(fn, (x,), K=16)
            ref = REF_GPU_S[(N, name)]
            rows.append((N, name, t, ref, ref / t))
            results["single"][f"{N // 1000}k-{name}"] = {
                "tpu_s": round(t, 6), "ref_gpu_s": ref,
                "speedup": round(ref / t, 2)}
            print(f"{N // 1000}k-{name}: {t * 1e3:8.2f} ms   "
                  f"(ref GPU {ref * 1e3:7.2f} ms, speedup {ref / t:5.2f}x)",
                  flush=True)

    # -- amortized small-N: batch-16 10k signals, one dispatch -------------
    N, B = 10_000, 16
    X = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    scales = process_scales("log-piecewise", N, wavelet)[:n_rows]

    @jax.jit
    def cwt_b(X, i):
        return jnp.sum(jnp.abs(
            cwt(X + i * 1e-12, wavelet, scales=scales, dtype="float32")[0]))

    @jax.jit
    def stft_b(X, i):
        return jnp.sum(jnp.abs(
            stft(X + i * 1e-12, n_fft=n_fft, hop_len=1, dtype="float32")))

    @jax.jit
    def ssq_cwt_b(X, i):
        return jnp.sum(jnp.abs(
            ssq_cwt(X + i * 1e-12, wavelet, scales=scales, fs=1.0,
                    dtype="float32")[0]))

    @jax.jit
    def ssq_stft_b(X, i):
        return jnp.sum(jnp.abs(
            ssq_stft(X + i * 1e-12, n_fft=n_fft, dtype="float32")[0]))

    for name, fn in (("cwt", cwt_b), ("stft", stft_b),
                     ("ssq_cwt", ssq_cwt_b), ("ssq_stft", ssq_stft_b)):
        t = timed(fn, (X,), K=4)
        per = t / B
        ref = REF_GPU_S[(N, name)]
        results["amortized_batch16_10k"][f"10k-{name}"] = {
            "tpu_per_transform_s": round(per, 6),
            "batch_total_s": round(t, 6),
            "ref_gpu_s": ref, "speedup": round(ref / per, 2)}
        print(f"10k-{name} x16-batch: {per * 1e3:7.3f} ms/transform "
              f"(speedup {ref / per:5.2f}x)", flush=True)

    # -- batched 160k: throughput at batch 4 / 8 ---------------------------
    N = 160_000
    scales = process_scales("log-piecewise", N, wavelet)[:n_rows]
    for B in (4, 8):
        X = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)

        @jax.jit
        def cwt_b160(X, i):
            return jnp.sum(jnp.abs(
                cwt(X + i * 1e-12, wavelet, scales=scales,
                    dtype="float32")[0]))

        @jax.jit
        def ssq_b160(X, i):
            return jnp.sum(jnp.abs(
                ssq_cwt(X + i * 1e-12, wavelet, scales=scales, fs=1.0,
                        dtype="float32")[0]))

        for name, fn in (("cwt", cwt_b160), ("ssq_cwt", ssq_b160)):
            try:
                # K=8: at K=3 the relay RTT leaks ~1.5 ms/transform
                # into the b8 per-transform number
                t = timed(fn, (X,), K=8, reps=2)
            except Exception as e:  # OOM at this batch: record honestly
                results["batched_160k"][f"{name}-b{B}"] = {
                    "error": f"{type(e).__name__}"}
                print(f"160k-{name} x{B}: FAILED ({type(e).__name__})",
                      flush=True)
                continue
            msps = B * N / t / 1e6
            results["batched_160k"][f"{name}-b{B}"] = {
                "batch_total_s": round(t, 6),
                "per_transform_s": round(t / B, 6),
                "msamples_per_s": round(msps, 2)}
            print(f"160k-{name} x{B}: {t / B * 1e3:7.2f} ms/transform, "
                  f"{msps:7.2f} MSamples/s", flush=True)

    # -- real-signal 160k ssq_cwt: the banded-reassignment regime ----------
    # The table above uses white noise (worst case for the adaptive
    # banded kernel: full-loop fallback + ~1.2% detector tax). Structured
    # signals — the transform's actual use case — band 94-97% of tiles
    # (docs/DESIGN.md "Banded reassignment"); these cells publish that.
    N = 160_000
    tt = np.arange(N) / N
    sigs = {
        "tone": (np.cos(2 * np.pi * (N / 64) * tt), None),
        "tone-g1e3": (np.cos(2 * np.pi * (N / 64) * tt), 1e-3),
        "chirp-g1e3": (np.cos(2 * np.pi * ((N / 1024) * tt + (N / 8 - N
                       / 1024) / 2 * tt * tt)), 1e-3),
    }
    results["realsig_160k_ssq_cwt"] = {}
    results["realsig_160k_ssq_stft"] = {}
    ref = REF_GPU_S[(N, "ssq_cwt")]
    ref_st = REF_GPU_S[(N, "ssq_stft")]
    for name, (sig, gamma) in sigs.items():
        x = jnp.asarray(sig, dtype=jnp.float32)
        kw = {} if gamma is None else {"gamma": gamma}

        @jax.jit
        def ssq_real(x, i, kw=kw):
            return jnp.sum(jnp.abs(
                ssq_cwt(x + i * 1e-12, wavelet, scales=scales, fs=1.0,
                        dtype="float32", **kw)[0]))

        # K=8 matches bench.py's tone-cell enqueue depth; K=4 leaks
        # ~RTT/4 of relay round-trip into a ~25-35 ms cell
        t = timed(ssq_real, (x,), K=8)
        results["realsig_160k_ssq_cwt"][name] = {
            "tpu_s": round(t, 6), "ref_gpu_s": ref,
            "speedup": round(ref / t, 2),
            "gamma": gamma}
        print(f"160k-ssq_cwt[{name}]: {t * 1e3:8.2f} ms   "
              f"(ref GPU {ref * 1e3:7.2f} ms, speedup {ref / t:5.2f}x)",
              flush=True)

        # ssq_stft bands harder (column-local phase): no gamma needed
        @jax.jit
        def ssq_st_real(x, i):
            return jnp.sum(jnp.abs(
                ssq_stft(x + i * 1e-12, n_fft=n_fft, dtype="float32")[0]))

        t = timed(ssq_st_real, (x,), K=8)
        results["realsig_160k_ssq_stft"][name] = {
            "tpu_s": round(t, 6), "ref_gpu_s": ref_st,
            "speedup": round(ref_st / t, 2)}
        print(f"160k-ssq_stft[{name}]: {t * 1e3:8.2f} ms   "
              f"(ref GPU {ref_st * 1e3:7.2f} ms, speedup "
              f"{ref_st / t:5.2f}x)", flush=True)

    with open("BENCH_TABLE.json", "w") as f:
        json.dump(results, f, indent=1)
    print("\n| N | transform | TPU (ms) | ref GPU (ms) | speedup |")
    print("|---|---|---|---|---|")
    for N, name, t, ref, sp in rows:
        print(f"| {N // 1000}k | {name} | {t * 1e3:.2f} | {ref * 1e3:.2f} "
              f"| {sp:.2f}x |")


if __name__ == "__main__":
    main()
