"""XLA-planar-path twin of tools/bench_fft_impl.py (r4).

Same production shape, same framing (Pw + i*0 defeat, abs-sum reduce),
but the route is the explicit HBM Z build + ifft_mxu_halfband_planar —
the stage matmuls run as XLA einsums. Motivation: the r4 latency probes
put the in-Pallas effective MXU rate at ~40-60 TMAC/s while XLA
einsums sustain ~1.6 P MAC/s (f32 HIGHEST) on this chip; if the 25x
dot-rate gap is real end-to-end, XLA's extra ~6 GB of HBM passes may
still be the better trade, and the fused kernel's win needs re-litigating.

Run: python tools/bench_fft_xla.py [K reps]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from ssqueeze_rs_tpu.ops.fft_mxu import best_split, ifft_mxu_halfband_planar

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

    def make(deriv):
        @jax.jit
        def f(Pw, xr, xi, xig, i):
            Pw = Pw + jnp.asarray(i, jnp.float32) * 0
            Zr = (Pw * xr)
            Zi = (Pw * xi)
            if deriv:
                s = xig[None] * 2.0
                Zr2 = jnp.concatenate([Zr, -Zi * s], axis=0)
                Zi2 = jnp.concatenate([Zi, Zr * s], axis=0)
                nr = jnp.concatenate([nyq, zeros])
                ni = jnp.concatenate([zeros, nyq])
            else:
                Zr2, Zi2, nr, ni = Zr, Zi, nyq, zeros
            a, b = ifft_mxu_halfband_planar(Zr2, Zi2, keep=KEEP,
                                            nyq_r=nr, nyq_i=ni)
            return jnp.sum(jnp.abs(a)) + jnp.sum(jnp.abs(b))
        return f

    for deriv in (True, False):
        tag = f"{'wd' if deriv else 'w '}:xla"
        try:
            f = make(deriv)
            out = f(Pw, xr, xi, xig, 0)
            chk = float(out)
            best = float("inf")
            for r in range(3):
                t0 = time.perf_counter()
                outs = [f(Pw, xr, xi, xig, r * K + i + 1) for i in range(K)]
                _ = float(outs[-1])
                best = min(best, (time.perf_counter() - t0) / K)
            print(f"{tag:12s} {best*1e3:8.3f} ms  chk {chk:.6e}",
                  flush=True)
        except Exception as e:
            print(f"{tag:12s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
