"""Minimal DMA/compute overlap probe (VERDICT r4->r5 #1, step 2).

The grid-level probe (ablate_cwt_kernel --overlap) measured that even a
DEPENDENCY-FREE dot chain does not overlap the automatic BlockSpec
streaming (overlap 17.3 ~ full 17.5 = dmaonly 7.7 + dots 9.8). Two
readings remain possible:

  (a) hardware: MXU/VPU VMEM traffic starves the DMA engine's VMEM
      ports — no kernel structure can overlap them;
  (b) scheduling: Mosaic issues the next window's DMA too late (or
      fences it), and an EXPLICIT eagerly-issued async copy would
      overlap fine.

This kernel discriminates with the smallest possible structure:
grid=(), one loop, per iteration an explicit `make_async_copy` of a
CH-byte HBM chunk into a VMEM scratch slot racing a serial chain of D
bf16 dots on constant VMEM operands, `.wait()` only at the end of the
iteration. No outputs besides a scalar checksum row.

  copies : DMA only        -> floor_dma
  dots   : compute only    -> floor_mxu
  both   : if ~max(floors) -> (b): explicit DMA does overlap; the fused
           kernel should move to manual DMA.
           if ~sum(floors) -> (a): physical — close out the additivity
           gap as a hardware floor.

Run on chip: python tools/dma_overlap_probe.py [K]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 64            # loop iterations
CH = 4096         # chunk rows: (CH, 512) f32 = 8 MB per iteration copy
D = 3             # serial dots per iteration, (512,512)x(512,512) bf16
M = 512


def _make_kernel(variant):
    def kernel(src_ref, a_ref, b_ref, out_ref):
        def body(buf, sem):
            def dma(slot, r):
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(r * CH, CH)], buf.at[slot],
                    sem.at[slot])

            a0 = a_ref[:].astype(jnp.bfloat16)
            b0 = b_ref[:].astype(jnp.bfloat16)

            def loop(r, acc):
                slot = r % 2
                if variant in ("copies", "both"):
                    dma(slot, r).start()
                x = acc
                if variant in ("dots", "both"):
                    for _ in range(D):   # serial chain: x feeds x
                        x = jnp.dot(
                            x.astype(jnp.bfloat16), b0,
                            preferred_element_type=jnp.float32) * 1e-3
                if variant in ("copies", "both"):
                    dma(slot, r).wait()
                    x = x + buf[slot, 0, 0] * 1e-30
                return x

            acc = jax.lax.fori_loop(
                0, R, loop, a0.astype(jnp.float32))
            out_ref[:] = acc[:8]

        pl.run_scoped(
            body,
            buf=pltpu.VMEM((2, CH, M), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(src, a, b, variant):
    out = pl.pallas_call(
        _make_kernel(variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(src, a, b)
    return jnp.sum(out)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"device {jax.devices()} K={K}  copy {R} x {CH}x{M} f32 "
          f"({R * CH * M * 4 / 1e6:.0f} MB), dots {R} x {D} serial "
          f"(512,512,512) bf16", file=sys.stderr, flush=True)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 3)
        return (jax.random.normal(ks[0], (R * CH, M), jnp.float32),
                jax.random.normal(ks[1], (M, M), jnp.float32),
                jax.random.normal(ks[2], (M, M), jnp.float32))

    src, a, b = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    res = {}
    for v in ("copies", "dots", "both"):
        try:
            f = lambda i, v=v: run(src, a + jnp.float32(i) * 0, b, v)
            _ = float(f(0))
            best = float("inf")
            for r in range(3):
                t0 = time.perf_counter()
                outs = [f(r * K + i + 1) for i in range(K)]
                _ = float(outs[-1])
                best = min(best, (time.perf_counter() - t0) / K)
            res[v] = best
            print(f"{v:8s} {best * 1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{v:8s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if len(res) == 3:
        s = res["copies"] + res["dots"]
        m = max(res["copies"], res["dots"])
        print(f"sum(floors) {s*1e3:.3f} ms, max(floors) {m*1e3:.3f} ms, "
              f"both {res['both']*1e3:.3f} ms -> "
              f"{'OVERLAPPABLE (b)' if res['both'] < 0.75 * s else 'ADDITIVE (a)'}",
              flush=True)


if __name__ == "__main__":
    main()
