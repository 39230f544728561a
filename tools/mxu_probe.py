"""Mosaic codegen probes for the MXU reassignment rewrite (round 3).

Questions, each answered by a tiny standalone kernel timed on-chip:

  q_dots   : throughput of back-to-back SMALL dots at the digit-split
             shapes — per j-group dot (152, 296) @ (296, 768), 64 groups
             per grid step. Fill-bound or compute-bound?
  q_trans  : cost of one (293, 512) int32 transpose per grid step.
  q_build  : cost of the indicator builds (tile + iota compares).
  q_batch  : does Mosaic accept jax.lax.dot_general with a batch dim?

Run: python tools/mxu_probe.py
"""
import sys
import time
import functools

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NA, T, NG, G = 293, 512, 64, 8
F1, F0 = 19, 16
M = F1 * G          # 152 dot rows
NLANES = 768        # 6 concatenated 128-lane B planes


def timed(fn, args, K=8, reps=3, tag=""):
    out = fn(*args, 0)
    _ = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag:10s} {best*1e3:8.3f} ms/step-set", flush=True)
    return best


GRID = 16   # steps per call; report per-step-set time = per GRID steps


def run_kernel(kernel, inputs, out_shape, scratches, tag, K=8):
    f = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                               memory_space=pltpu.VMEM) for a in inputs],
        out_specs=pl.BlockSpec(out_shape, lambda i: tuple(
            0 for _ in out_shape), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=scratches,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def wrapped(*args):
        *ins, i = args
        first = ins[0] + jnp.asarray(i, ins[0].dtype) * 0
        return jnp.sum(f(first, *ins[1:]))

    return timed(wrapped, inputs, K=K, tag=tag)


def main():
    print(f"device {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    A_host = jnp.asarray((rng.random((M, NA)) < 0.05), jnp.bfloat16)
    B_host = jnp.asarray(rng.standard_normal((NA, NLANES)), jnp.bfloat16)

    # -- q_dots: NG back-to-back (152, 296)@(296, 768) dots per grid step
    def dots_kernel(a_ref, b_ref, o_ref, acc):
        def body(g, _):
            acc[:] = acc[:] + jnp.dot(
                a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(dots_kernel, [A_host, B_host], (M, NLANES),
               [pltpu.VMEM((M, NLANES), jnp.float32)], "q_dots")

    # -- q_dots_big: one (152, 296*64)@(296*64, 768) dot per grid step
    #    (same MACs as 64 small dots — isolates fill overhead)
    A2 = jnp.asarray((rng.random((M, NA * NG)) < 0.05), jnp.bfloat16)
    B2 = jnp.asarray(rng.standard_normal((NA * NG, NLANES)), jnp.bfloat16)

    def bigdot_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    run_kernel(bigdot_kernel, [A2, B2], (M, NLANES), [], "q_bigdot")

    # -- q_trans: one (NA, T) int32 transpose per grid step
    K32 = jnp.asarray(rng.integers(0, 293, (NA, T)), jnp.int32)

    def trans_kernel(k_ref, o_ref):
        kt = k_ref[:].T            # (T, NA)
        o_ref[:] = kt.astype(jnp.float32)

    run_kernel(trans_kernel, [K32], (T, NA), [], "q_trans")

    # -- q_build: indicator builds for one tile (64 groups):
    #    B-plane: tile klo 16x on lanes, compare vs lane-iota>>3, select v
    KLO = jnp.asarray(rng.integers(0, 16, (NA, T)), jnp.int32)
    V = jnp.asarray(rng.standard_normal((NA, T)), jnp.float32)

    def build_kernel(klo_ref, v_ref, o_ref, acc):
        f0_of_lane = jax.lax.broadcasted_iota(
            jnp.int32, (NA, 16 * G), 1) // G

        def body(g, _):
            kl = klo_ref[:, pl.ds(g * G, G)]
            vv = v_ref[:, pl.ds(g * G, G)]
            klt = jnp.tile(kl, (1, 16))          # (NA, 128)
            vvt = jnp.tile(vv, (1, 16))
            Bm = jnp.where(klt == f0_of_lane, vvt, 0.0)
            acc[:] = acc[:] + Bm
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(build_kernel, [KLO, V], (NA, 16 * G),
               [pltpu.VMEM((NA, 16 * G), jnp.float32)], "q_build")

    # -- q_batch: Mosaic batched dot_general support
    try:
        Ab = jnp.asarray(rng.standard_normal((G, 32, NA)), jnp.bfloat16)
        Bb = jnp.asarray(rng.standard_normal((G, NA, 128)), jnp.bfloat16)

        def batch_kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        run_kernel(batch_kernel, [Ab, Bb], (G, 32, 128), [], "q_batch")
    except Exception as e:
        print(f"q_batch   UNSUPPORTED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
