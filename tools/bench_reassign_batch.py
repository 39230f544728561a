"""Batched reassignment: vmap-grid vs column-flattened (VERDICT r4 #3).

The r5 batch profile isolated the batch-8 ssq_cwt regression to the
vmapped reassignment pallas call (+9% per transform; the cwt kernel and
dispatch amortize as expected). Reassignment is COLUMN-LOCAL, so a
(B, na, n) batch is mathematically a (na, B*n) column concatenation —
if the flat call is faster per byte, the cost is the vmap-added batch
grid axis (and a production fix is worth a data-movement analysis); if
equal, the 9% is inherent working-set scaling and gets documented.

Run on chip: python tools/bench_reassign_batch.py [K] [B]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


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
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    na, n = 293, 160000
    print(f"device {jax.devices()} K={K} B={B} na={na} n={n}",
          file=sys.stderr, flush=True)

    from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas

    params = dict(vlmin=-9.0, dvl=0.035)
    const = jnp.ones((na,), jnp.float32)
    sfs = jnp.zeros((na,), jnp.float32)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        mk = lambda kk: jax.random.normal(kk, (B, na, n), jnp.float32)
        return mk(ks[0]), mk(ks[1]), mk(ks[2]), mk(ks[3])

    wr, wi, dr, di = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    def call(planes):
        return reassign_pallas((planes[0], planes[1]),
                               (planes[2], planes[3]), const, 1e-8, sfs,
                               params, mode="log", flipud=True,
                               transform="cwt", nf=na)

    @jax.jit
    def vmapped(wr, wi, dr, di, i):
        Tx = call((wr + i * 1e-30, wi, dr, di))
        return jnp.sum(jnp.abs(Tx))

    @jax.jit
    def flat(wr, wi, dr, di, i):
        # column concatenation: (B, na, n) -> (na, B*n) via transpose;
        # timed INSIDE so the comparison includes the relayout the
        # production path would have to pay
        pl = [jnp.swapaxes(z, 0, 1).reshape(na, B * n)
              for z in (wr + i * 1e-30, wi, dr, di)]
        Tx = call(pl)
        return jnp.sum(jnp.abs(Tx))

    @jax.jit
    def flat_pre(wrf, wif, drf, dif, i):
        # flat planes already materialized (isolates the kernel cost)
        Tx = call((wrf + i * 1e-30, wif, drf, dif))
        return jnp.sum(jnp.abs(Tx))

    t_v = timed(vmapped, (wr, wi, dr, di), K=K)
    print(f"vmapped  {t_v*1e3:8.2f} ms  ({t_v/B*1e3:6.2f} /transform)",
          flush=True)

    flats = [jax.block_until_ready(jnp.swapaxes(z, 0, 1).reshape(na, B * n))
             for z in (wr, wi, dr, di)]
    t_fp = timed(flat_pre, tuple(flats), K=K)
    print(f"flat_pre {t_fp*1e3:8.2f} ms  ({t_fp/B*1e3:6.2f} /transform)",
          flush=True)

    t_f = timed(flat, (wr, wi, dr, di), K=K)
    print(f"flat+T   {t_f*1e3:8.2f} ms  ({t_f/B*1e3:6.2f} /transform)",
          flush=True)


if __name__ == "__main__":
    main()
