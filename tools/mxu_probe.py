"""Mosaic codegen probes for the MXU reassignment rewrite (round 3).

Each question runs as its own tiny standalone kernel, timed on-chip,
wrapped in try/except so one unsupported primitive doesn't kill the rest:

  q_dots    : 64 back-to-back (152, 296)@(296, 768) dots per grid step
              (the per-j-group digit-split dot shape). Fill-bound?
  q_bigdot  : one (152, 296*64)@(296*64, 768) dot per step (same MACs).
  q_trans   : one (296, 512) int32 transpose per grid step.
  q_repeat  : jnp.repeat(klo, 16, axis=1) lane-expand + masked select
              (the B-operand build, all groups at once).
  q_slice128: dynamic 128-lane slice from a VMEM scratch per group.
  q_slice8s : dynamic 8-SUBLANE slice + 19x sublane tile + iota compare
              (the A-operand build).
  q_strided : strided sublane slice (stride 8) for diagonal extraction.
  q_batch   : batched dot_general (j as batch dim).

Run: python tools/mxu_probe.py 2>&1 | tee /tmp/mxu_probe.log
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NA, T, NG, G = 296, 512, 64, 8     # NA padded to 8-multiple
F1, F0 = 19, 16
M = F1 * G          # 152 dot rows
NL = 768            # 6 concatenated 128-lane B planes


def timed(fn, args, K=8, reps=2, tag=""):
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


GRID = 16   # grid steps per call; times are per GRID-step set


def run_kernel(kernel, inputs, out_shape, scratches, tag, K=8):
    try:
        f = pl.pallas_call(
            kernel, grid=(GRID,),
            in_specs=[pl.BlockSpec(a.shape,
                                   lambda i, nd=len(a.shape): (0,) * nd,
                                   memory_space=pltpu.VMEM)
                      for a in inputs],
            out_specs=pl.BlockSpec(out_shape,
                                   lambda i, nd=len(out_shape): (0,) * nd,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=scratches,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        @jax.jit
        def wrapped(*args):
            *ins, i = args
            first = ins[0] + jnp.asarray(i, ins[0].dtype) * 0
            return jnp.sum(f(first, *ins[1:]).astype(jnp.float32))

        return timed(wrapped, inputs, K=K, tag=tag)
    except Exception as e:
        print(f"{tag:10s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    print(f"device {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # -- q_dots
    A_host = jnp.asarray((rng.random((M, NA)) < 0.05), jnp.bfloat16)
    B_host = jnp.asarray(rng.standard_normal((NA, NL)), jnp.bfloat16)

    def dots_kernel(a_ref, b_ref, o_ref, acc):
        def body(g, _):
            acc[:] = acc[:] + jnp.dot(
                a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(dots_kernel, [A_host, B_host], (M, NL),
               [pltpu.VMEM((M, NL), jnp.float32)], "q_dots")

    # -- q_bigdot
    A2 = jnp.asarray((rng.random((M, NA * NG)) < 0.05), jnp.bfloat16)
    B2 = jnp.asarray(rng.standard_normal((NA * NG, NL)), jnp.bfloat16)

    def bigdot_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    run_kernel(bigdot_kernel, [A2, B2], (M, NL), [], "q_bigdot")

    # -- q_trans
    K32 = jnp.asarray(rng.integers(0, 293, (NA, T)), jnp.int32)

    def trans_kernel(k_ref, o_ref):
        o_ref[:] = k_ref[:].T.astype(jnp.float32)

    run_kernel(trans_kernel, [K32], (T, NA), [], "q_trans")

    # -- q_repeat: B_all build, all groups at once (na, T*16)
    KLO = jnp.asarray(rng.integers(0, 16, (NA, T)), jnp.int32)
    V = jnp.asarray(rng.standard_normal((NA, T)), jnp.float32)

    def repeat_kernel(klo_ref, v_ref, o_ref):
        kr = jnp.repeat(klo_ref[:], 16, axis=1)          # (NA, 16T)
        vr = jnp.repeat(v_ref[:], 16, axis=1)
        f0 = jax.lax.broadcasted_iota(jnp.int32, (NA, 16 * T), 1) % 16
        o_ref[:] = jnp.where(kr == f0, vr, 0.0)

    run_kernel(repeat_kernel, [KLO, V], (NA, 16 * T), [], "q_repeat", K=4)

    # -- q_slice128: dynamic 128-lane slices from a VMEM scratch
    BALL = jnp.asarray(rng.standard_normal((NA, 16 * T)), jnp.float32)

    def slice_kernel(ball_ref, o_ref, acc):
        def body(g, _):
            acc[:] = acc[:] + ball_ref[:, pl.ds(g * 128, 128)]
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(slice_kernel, [BALL], (NA, 128),
               [pltpu.VMEM((NA, 128), jnp.float32)], "q_slice128")

    # -- q_slice8s: dynamic 8-sublane slice from (T, NA) + 19x tile +
    #    compare (the A build)
    KHT = jnp.asarray(rng.integers(0, 19, (T, NA)), jnp.int32)

    def a_build_kernel(kht_ref, o_ref, acc):
        f1 = jax.lax.broadcasted_iota(jnp.int32, (M, NA), 0) // G

        def body(g, _):
            kh = kht_ref[pl.ds(g * G, G), :]             # (8, NA)
            At = jnp.tile(kh, (F1, 1))                   # (152, NA)
            acc[:] = acc[:] + jnp.where(At == f1, 1.0, 0.0)
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(a_build_kernel, [KHT], (M, NA),
               [pltpu.VMEM((M, NA), jnp.float32)], "q_slice8s")

    # -- q_strided: stride-8 sublane slices of a (152, 128) block
    D = jnp.asarray(rng.standard_normal((M, 128)), jnp.float32)

    def strided_kernel(d_ref, o_ref, acc):
        def body(g, _):
            d = d_ref[:]
            s = sum(jax.lax.slice(d, (r, 0), (M, 128), (G, 1))
                    for r in range(G))                   # (19, 128)
            acc[:] = acc[:] + s
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(strided_kernel, [D], (F1, 128),
               [pltpu.VMEM((F1, 128), jnp.float32)], "q_strided")

    # -- q_batch
    Ab = jnp.asarray(rng.standard_normal((G, 32, NA)), jnp.bfloat16)
    Bb = jnp.asarray(rng.standard_normal((G, NA, 128)), jnp.bfloat16)

    def batch_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run_kernel(batch_kernel, [Ab, Bb], (G, 32, 128), [], "q_batch")


if __name__ == "__main__":
    main()
