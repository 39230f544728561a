"""MXU probe round 2: resolve per-op cost above the dispatch floor.

GRID=128 steps per call (8x the v1 probe, whose ~3.8 ms floor hid the
work); q_floor calibrates the floor to subtract. Also tests the
broadcast_to+reshape lane replication (jnp.repeat hit a Mosaic
remote-compile 500 in v1).

Run: python tools/mxu_probe2.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NA, T, NG, G = 296, 512, 64, 8
F1 = 19
M = F1 * G
NL = 768
GRID = 128


def timed(fn, args, K=8, reps=3, tag=""):
    out = fn(*args, 0)
    _ = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag:10s} {best*1e3:8.3f} ms per {GRID}-step call", flush=True)
    return best


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

    # -- floor: near-empty kernel
    X = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)

    def floor_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    run_kernel(floor_kernel, [X], (8, 128), [], "q_floor")

    # -- dots: 64 back-to-back (152,296)@(296,768) per step
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

    # -- dots at bf16x2 volume: 512-lane B
    B4 = jnp.asarray(rng.standard_normal((NA, 512)), jnp.bfloat16)

    def dots4_kernel(a_ref, b_ref, o_ref, acc):
        def body(g, _):
            acc[:] = acc[:] + jnp.dot(
                a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(dots4_kernel, [A_host, B4], (M, 512),
               [pltpu.VMEM((M, 512), jnp.float32)], "q_dots4")

    # -- trans: one (NA, T) i32 transpose per step
    K32 = jnp.asarray(rng.integers(0, 293, (NA, T)), jnp.int32)

    def trans_kernel(k_ref, o_ref):
        o_ref[:] = k_ref[:].T.astype(jnp.float32)

    run_kernel(trans_kernel, [K32], (T, NA), [], "q_trans")

    # -- bcast: block-tile lane replication via broadcast_to + reshape
    #    (na, T) -> (na, NG, 1, 8) -> (na, NG, 16, 8) -> (na, 16T)
    V = jnp.asarray(rng.standard_normal((NA, T)), jnp.float32)

    def bcast_kernel(v_ref, o_ref):
        v4 = v_ref[:].reshape(NA, NG, 1, G)
        vb = jnp.broadcast_to(v4, (NA, NG, 16, G))
        o_ref[:] = vb.reshape(NA, NG * 128)

    run_kernel(bcast_kernel, [V], (NA, 16 * T), [], "q_bcast", K=4)

    # -- A build: dyn 8-sublane slice + 19x tile + compare, 64/step
    KHT = jnp.asarray(rng.integers(0, 19, (T, NA)), jnp.int32)

    def a_build_kernel(kht_ref, o_ref, acc):
        f1 = jax.lax.broadcasted_iota(jnp.int32, (M, NA), 0) // G

        def body(g, _):
            kh = kht_ref[pl.ds(g * G, G), :]
            At = jnp.tile(kh, (F1, 1))
            acc[:] = acc[:] + jnp.where(At == f1, 1.0, 0.0)
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(a_build_kernel, [KHT], (M, NA),
               [pltpu.VMEM((M, NA), jnp.float32)], "q_abuild")

    # -- B build from pre-replicated operands: slice + compare + select +
    #    3-way bf16 split + concat, 64/step (the full per-group B cost)
    KLR = jnp.asarray(rng.integers(0, 16, (NA, 16 * T)), jnp.int32)
    VRR = jnp.asarray(rng.standard_normal((NA, 16 * T)), jnp.float32)

    def b_build_kernel(klr_ref, vrr_ref, o_ref, acc):
        f0 = jax.lax.broadcasted_iota(jnp.int32, (NA, 128), 1) // G

        def split3(x):
            h = x.astype(jnp.bfloat16)
            r1 = x - h.astype(jnp.float32)
            m = r1.astype(jnp.bfloat16)
            return (h, m, (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16))

        def body(g, _):
            kl = klr_ref[:, pl.ds(g * 128, 128)]
            sel = kl == f0
            Br = jnp.where(sel, vrr_ref[:, pl.ds(g * 128, 128)], 0.0)
            Bi = jnp.where(sel, vrr_ref[:, pl.ds(g * 128, 128)] * 0.5, 0.0)
            B = jnp.concatenate(split3(Br) + split3(Bi), axis=1)
            acc[:] = acc[:] + B.astype(jnp.float32)
            return 0
        jax.lax.fori_loop(0, NG, body, 0)
        o_ref[:] = acc[:]

    run_kernel(b_build_kernel, [KLR, VRR], (NA, NL),
               [pltpu.VMEM((NA, NL), jnp.float32)], "q_bbuild", K=4)


if __name__ == "__main__":
    main()
