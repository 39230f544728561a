"""A/B bench of the mega ssq_stft kernel's banded scatter (r4).

SSQ_TPU_REASSIGN_BAND is read at TRACE time — run each variant in its
own process:

    for b in "32,32" off; do for s in tone noise chirp; do
      SSQ_TPU_REASSIGN_BAND=$b python tools/bench_ssq_stft_band.py $s
    done; done
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_stft

    sig = sys.argv[1] if len(sys.argv) > 1 else "tone"
    N = 160_000
    n_fft = 598                       # nf = 300, the headline geometry
    rng = np.random.default_rng(0)
    t = np.arange(N) / N
    if sig == "noise":
        x = rng.standard_normal(N)
    elif sig == "chirp":
        f0, f1 = N / 1024, N / 8
        x = np.cos(2 * np.pi * (f0 * t + (f1 - f0) / 2 * t * t))
    else:
        x = np.cos(2 * np.pi * (N / 64) * t)
    xj = jnp.asarray(x, jnp.float32)

    @jax.jit
    def fn(x, i):
        Tx = ssq_stft(x + i * 1e-12, n_fft=n_fft, dtype="float32")[0]
        return jnp.sum(jnp.abs(Tx))

    out = float(fn(xj, 0))
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        outs = [fn(xj, r * 8 + i + 1) for i in range(8)]
        float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"band={os.environ.get('SSQ_TPU_REASSIGN_BAND', '-(default)')} "
          f"group={os.environ.get('SSQ_TPU_REASSIGN_GROUP', '1')} "
          f"sig={sig}: {best * 1e3:.2f} ms  (checksum {out:.6g})")


if __name__ == "__main__":
    main()
