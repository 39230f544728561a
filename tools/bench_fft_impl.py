"""A/B the fused cwt-kernel MXU issue patterns on the real chip.

Production headline config (M=2^18, na=293, L=160k, derivative) via
cwt_halfband_fused with impl threaded EXPLICITLY (static jit arg, so
one process can time all three correctly — unlike env-flag A/Bs).

Expectation from the dot-issue-bound analysis (docs/DESIGN.md r3):
dot3 ~13.4 ms (12 small dots/row at ~78 T MAC/s); dot1 4 dots/row;
merged 2 dots/row at 6x size — if throughput scales with dot size the
kernel approaches the ~1 ms MAC floor + VPU glue.

Run: python tools/bench_fft_impl.py [K reps]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from ssqueeze_rs_tpu.ops.fft_pallas import cwt_halfband_fused
from ssqueeze_rs_tpu.ops.fft_mxu import best_split

NA, L = 293, 160000
M = 1 << 18
M1, M2 = best_split(M)
K1 = M1 // 2
START = (M - L) // 2
KEEP = (START, L)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"device {jax.devices()} K={K}", file=sys.stderr, flush=True)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        Pw = jax.random.normal(ks[0], (NA, K1, M2), jnp.float32)
        xr = jax.random.normal(ks[1], (1, K1, M2), jnp.float32)
        xi = jax.random.normal(ks[2], (1, K1, M2), jnp.float32)
        xig = jax.random.uniform(ks[3], (K1, M2), jnp.float32, 0, 3)
        nyq = jax.random.normal(ks[0], (NA,), jnp.float32)
        return Pw, xr, xi, xig, nyq

    Pw, xr, xi, xig, nyq = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    zeros = jnp.zeros_like(nyq)

    def make(impl, deriv):
        @jax.jit
        def f(Pw, xr, xi, xig, i):
            Pw = Pw + jnp.asarray(i, jnp.float32) * 0
            o = cwt_halfband_fused(Pw, xr, xi, xig, 2.0, (nyq, zeros),
                                   (zeros, nyq), keep=KEEP,
                                   derivative=deriv, interpret=False,
                                   tiles=1, impl=impl)
            return sum(jnp.sum(jnp.abs(p)) for p in o)
        return f

    sums = {}
    # derivative=True = the ssq_cwt production shape; derivative=False
    # informs whether standalone cwt should switch off the c64 einsum
    for deriv in (True, False):
        for impl in ("dot3", "dot1", "merged", "tmerged",
                     "rb2", "rb4", "rb8"):
            tag = f"{'wd' if deriv else 'w '}:{impl}"
            try:
                f = make(impl, deriv)
                out = f(Pw, xr, xi, xig, 0)
                if deriv:
                    sums[impl] = float(out)  # compile + correctness probe
                best = float("inf")
                for r in range(3):
                    t0 = time.perf_counter()
                    outs = [f(Pw, xr, xi, xig, r * K + i + 1)
                            for i in range(K)]
                    _ = float(outs[-1])
                    best = min(best, (time.perf_counter() - t0) / K)
                print(f"{tag:12s} {best*1e3:8.3f} ms", flush=True)
            except Exception as e:
                print(f"{tag:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)

    if len(sums) > 1:
        ref = sums.get("dot3")
        for impl, s in sums.items():
            if ref and impl != "dot3":
                rel = abs(s - ref) / max(abs(ref), 1e-30)
                print(f"checksum {impl} vs dot3: rel {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
