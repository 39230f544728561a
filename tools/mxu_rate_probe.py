"""In-kernel MXU rate vs dot shape + VMEM copy bandwidth (r4).

The r4 ablation of the fused cwt kernel (tools/ablate_cwt_kernel.py)
shows the bf16x3 split tax is ~7.5 ms of the 17.4 ms total — i.e. the
marginal cost of extra in-kernel MACs is ~90 T MAC/s, 100x below the
XLA-path MXU rate. Two hypotheses fit the A/B data (dot1/merged
neutral): a flat in-kernel sustained MXU rate, or a VMEM operand-feed
bandwidth ceiling (operand bytes are invariant across those variants).
They predict DIFFERENT rate-vs-shape curves:

  * flat MXU rate     -> MAC/s constant as (m, k, n) grow
  * VMEM feed ceiling -> MAC/s grows ~linearly with the MAC/byte ratio
                         (bigger square dots = more MACs per operand
                         byte)

This probe times a bare dot of each shape inside a Pallas kernel
(operands resident in VMEM scratch, hoisting defeated by a 2-slot
dynamic operand slice), plus a pure VMEM read+add+write loop for the
copy bandwidth. Run on chip: python tools/mxu_rate_probe.py
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

GRID = 32
R = 8          # inner dots per grid step


@functools.partial(jax.jit, static_argnames=("m", "k", "n", "dt"))
def dot_probe(A, B, seed, *, m, k, n, dt):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, acc):
            a = a_ref[pl.ds((i % 2) * m, m), :]
            return acc + jnp.dot(a, b_ref[:],
                                 preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(
            0, R, body, jnp.zeros((m, n), jnp.float32))

    out = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((2 * m, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(A + seed * 0, B)
    return jnp.sum(out)


@functools.partial(jax.jit, static_argnames=("m", "n"))
def copy_probe(A, seed, *, m, n):
    def kernel(a_ref, o_ref):
        def body(i, acc):
            return acc + a_ref[pl.ds((i % 2) * m, m), :]
        o_ref[:] = jax.lax.fori_loop(
            0, R, body, jnp.zeros((m, n), jnp.float32))

    out = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((2 * m, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(A + seed * 0)
    return jnp.sum(out)


def timed(f, K=8, reps=3):
    _ = float(f(0))
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [f(r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    return best / (GRID * R)      # seconds per single op


def main():
    print(f"device {jax.devices()}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)

    shapes = [
        (256, 256, 256), (512, 512, 512), (1024, 1024, 1024),
        (1024, 512, 512),     # cwt stage-1
        (512, 1024, 640),     # cwt stage-2 (2R~626 padded)
        (1024, 1536, 512),    # dot1 stage-1 (3x contraction)
        (1024, 512, 1536),    # wide-n variant
        (128, 512, 512), (2048, 512, 512),
    ]
    for (m, k, n) in shapes:
        for dt in ("bf16", "f32"):
            dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
            A = jax.random.normal(key, (2 * m, k), jnp.float32).astype(dtype)
            B = jax.random.normal(key, (k, n), jnp.float32).astype(dtype)
            try:
                s = timed(lambda i: dot_probe(A, B, jnp.float32(i),
                                              m=m, k=k, n=n, dt=dt))
                macs = m * k * n
                byts = (m * k + k * n) * A.dtype.itemsize + m * n * 4
                print(f"dot {dt} ({m:5d},{k:5d},{n:5d}): {s*1e6:9.3f} us  "
                      f"{macs/s/1e12:8.1f} TMAC/s  "
                      f"{byts/s/1e12:6.2f} TB/s-operands", flush=True)
            except Exception as e:
                print(f"dot {dt} ({m},{k},{n}): FAILED "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)

    for (m, n) in ((512, 512), (1024, 512), (512, 4096), (1024, 4096)):
        A = jax.random.normal(key, (2 * m, n), jnp.float32)
        s = timed(lambda i: copy_probe(A, jnp.float32(i), m=m, n=n))
        byts = 3 * m * n * 4          # read + acc-read + write per iter
        print(f"copy f32 ({m:5d},{n:5d}): {s*1e6:9.3f} us  "
              f"{byts/s/1e12:6.2f} TB/s", flush=True)




# -- latency-vs-throughput disambiguation: C independent chains ---------------
@functools.partial(jax.jit, static_argnames=("m", "k", "n", "C"))
def dot_probe_chains(A, B, seed, *, m, k, n, C):
    """R iterations x C INDEPENDENT dots per iteration (separate
    accumulators, different operand slices). If per-op cost drops ~Cx
    vs dot_probe, the 15 us floor is dependency LATENCY (overlappable);
    if flat, it's true throughput."""
    def kernel(a_ref, b_ref, *o_refs):
        def body(i, accs):
            return tuple(
                acc + jnp.dot(a_ref[pl.ds(((i + c) % (C + 1)) * m, m), :],
                              b_ref[:],
                              preferred_element_type=jnp.float32)
                for c, acc in enumerate(accs))
        accs = jax.lax.fori_loop(
            0, R, body, tuple(jnp.zeros((m, n), jnp.float32)
                              for _ in range(C)))
        for o_ref, acc in zip(o_refs, accs):
            o_ref[:] = acc

    outs = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec(((C + 1) * m, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((m, n), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
                        for _ in range(C)),
        out_shape=tuple(jax.ShapeDtypeStruct((m, n), jnp.float32)
                        for _ in range(C)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(A + seed * 0, B)
    return sum(jnp.sum(o) for o in outs)


def main_chains():
    print(f"device {jax.devices()}", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(0)
    for (m, k, n) in ((512, 512, 512), (1024, 512, 512)):
        for C in (1, 2, 4, 8, 16, 24):
            A = jax.random.normal(key, ((C + 1) * m, k),
                                  jnp.float32).astype(jnp.bfloat16)
            B = jax.random.normal(key, (k, n),
                                  jnp.float32).astype(jnp.bfloat16)
            try:
                s = timed(lambda i: dot_probe_chains(
                    A, B, jnp.float32(i), m=m, k=k, n=n, C=C))
                per_op = s / C
                macs = m * k * n
                print(f"chains C={C} ({m},{k},{n}): {per_op*1e6:9.3f} "
                      f"us/dot  {macs/per_op/1e12:8.1f} TMAC/s",
                      flush=True)
            except Exception as e:
                print(f"chains C={C} ({m},{k},{n}): FAILED "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    if "--chains" in sys.argv:
        main_chains()
    else:
        main()
