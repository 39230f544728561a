"""On-chip validation of the k2-tiled fused kernels: tiled-vs-untiled
checksums at a size both support, auto-tiled big-M coverage, and an
end-to-end large-N cwt that lands on the tiled path. Scalar fetches only
(axon relay). Run: python tools/check_tiled.py [check-numbers...]
(default: all five; each Mosaic compile costs ~60 s over the relay, so
run subsets when iterating)."""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(which=(1, 2, 3, 4, 5)):
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu.ops.fft_mxu import best_split
    from ssqueeze_rs_tpu.ops.fft_pallas import (
        ifft_halfband_planar_fused, cwt_halfband_fused, fused_tiles)
    import ssqueeze_rs_tpu as ssq

    print(f"backend: {jax.default_backend()}  checks={which}", flush=True)
    failures = []

    def check(name, ok, detail=""):
        print(f"  {'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
        if not ok:
            failures.append(name)

    if 1 in which:
        # 1. ifft kernel: forced tiles vs untiled, M=2^18
        M = 1 << 18
        M1, M2 = best_split(M)
        K1 = M1 // 2

        @partial(jax.jit, static_argnames=("tiles",))
        def ifft_sum(seed, tiles):
            k = jax.random.PRNGKey(seed)
            Zr = jax.random.normal(k, (4, K1, M2), jnp.float32)
            Zi = jax.random.normal(jax.random.fold_in(k, 1), (4, K1, M2),
                                   jnp.float32)
            xr, xi = ifft_halfband_planar_fused(
                Zr, Zi, keep=(1000, 200000), interpret=False, tiles=tiles)
            return jnp.sum(jnp.abs(xr)) + jnp.sum(jnp.abs(xi))

        s1 = float(ifft_sum(0, 1))
        for T in (2, 4):
            sT = float(ifft_sum(0, T))
            rel = abs(sT - s1) / abs(s1)
            check(f"ifft tiled T={T} matches untiled (M=2^18)", rel < 1e-5,
                  f"rel={rel:.2e}")

    if 2 in which:
        # 2. cwt-mode kernel: forced tiles vs untiled, M=2^19, derivative
        M = 1 << 19
        M1, M2 = best_split(M)
        K1 = M1 // 2

        @partial(jax.jit, static_argnames=("tiles",))
        def cwt_sum(seed, tiles):
            k = jax.random.PRNGKey(seed)
            Pw = jax.random.normal(k, (8, K1, M2), jnp.float32)
            xr = jax.random.normal(jax.random.fold_in(k, 1), (K1, M2),
                                   jnp.float32)
            xi = jax.random.normal(jax.random.fold_in(k, 2), (K1, M2),
                                   jnp.float32)
            xig = jax.random.normal(jax.random.fold_in(k, 3), (K1, M2),
                                    jnp.float32)
            z = jnp.zeros(8, jnp.float32)
            outs = cwt_halfband_fused(Pw, xr, xi, xig, 0.5, (z, z), (z, z),
                                      keep=(777, 400000), derivative=True,
                                      interpret=False, tiles=tiles)
            return sum(jnp.sum(jnp.abs(o)) for o in outs)

        c1 = float(cwt_sum(7, 1))
        for T in (2, 4):
            cT = float(cwt_sum(7, T))
            rel = abs(cT - c1) / abs(c1)
            check(f"cwt tiled T={T} matches untiled (M=2^19)", rel < 1e-5,
                  f"rel={rel:.2e}")

    if 3 in which:
        # 3. auto-tiled big-M ifft (M=2^21): compiles + finite
        M = 1 << 21
        auto = fused_tiles(M, 1)
        M1, M2 = best_split(M)
        K1 = M1 // 2

        @jax.jit
        def big(seed):
            k = jax.random.PRNGKey(seed)
            Zr = jax.random.normal(k, (2, K1, M2), jnp.float32)
            Zi = jax.random.normal(jax.random.fold_in(k, 1), (2, K1, M2),
                                   jnp.float32)
            xr, xi = ifft_halfband_planar_fused(Zr, Zi, keep=(0, 2000000),
                                                interpret=False)
            return jnp.sum(jnp.abs(xr)) + jnp.sum(jnp.abs(xi))

        t0 = time.perf_counter()
        v = float(big(3))
        dt = time.perf_counter() - t0
        check(f"ifft M=2^21 auto tiles={auto} runs",
              np.isfinite(v) and v > 0, f"sum={v:.3e} ({dt:.1f}s)")

    N = 980_000   # pads to M=2^20
    if 4 in which:
        # 4. end-to-end: large-N cwt derivative path hits tiled kernel
        auto = fused_tiles(1 << 20, 2)

        @jax.jit
        def e2e(seed):
            x = jax.random.normal(jax.random.PRNGKey(seed), (N,),
                                  jnp.float32)
            Wx, dWx, sc = ssq.cwt(x, "gmw", scales="log", nv=8,
                                  derivative=True, dtype="float32")
            return (jnp.sum(jnp.abs(Wx)), jnp.sum(jnp.abs(dWx)))

        t0 = time.perf_counter()
        a, b = e2e(11)
        a, b = float(a), float(b)
        dt = time.perf_counter() - t0
        check(f"cwt N=980k derivative (auto tiles={auto})",
              np.isfinite(a) and np.isfinite(b) and a > 0 and b > 0,
              f"sums=({a:.3e},{b:.3e}) ({dt:.1f}s)")

    if 5 in which:
        # 5. accuracy at big N (M=2^20): two-tone icwt round trip on-chip
        @jax.jit
        def rt(f1, f2):
            t = jnp.arange(N, dtype=jnp.float32) / 1000.0
            x = (jnp.sin(2 * jnp.pi * f1 * t) +
                 0.5 * jnp.sin(2 * jnp.pi * f2 * t))
            Wx, sc = ssq.cwt(x, "gmw", scales="log", derivative=False,
                             dtype="float32")
            xr = ssq.icwt(Wx, "gmw", scales="log", x_len=N)
            return jnp.mean(jnp.abs(x - xr)) / jnp.sqrt(jnp.mean(x ** 2))

        e = float(rt(100.0, 333.0))
        check("icwt round trip N=980k", e < 5e-3, f"mad_rms={e:.2e}")

    print("ALL PASS" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sel = tuple(int(a) for a in sys.argv[1:]) or (1, 2, 3, 4, 5)
    sys.exit(main(sel))
