"""Ablation roofline of the reassignment Pallas kernel (VERDICT r4 #2).

The r2 close-out argued the one-hot loop runs at ~64% of the measured
VPU peak (ALU-bound); round 4 then proved the sibling cwt kernel's
neutral A/Bs were all dependency LATENCY, not throughput — so the
missing 36% here was never attributed. This harness applies the r4
methodology (tools/ablate_cwt_kernel.py) to the reassignment kernel at
the production shape (na=nf=293, n=160k, TILE=512, log-piecewise bins,
4-plane contract, band detector OFF — the white-noise/full-loop path
banding cannot help):

  full    : the production loop body (bin + stage + na-row one-hot loop)
  dmaonly : empty body — 4 input planes in + 2 output planes out
            (~1.1 GB; does the plane DMA hide under compute or add on
            top like the cwt kernel's did?)
  binonly : phase transform + binning + staging, loop removed
  cmponly : loop keeps compare + convert + accumulate, drops the two
            where-selects (select's share)
  addonly : loop keeps the two accumulates of staged values (no
            compare/select) — pure VPU add + VMEM write throughput
  chains2/4: C independent (nf, TILE) accumulators, rows interleaved
            c = i % C, summed once at the end — if the missing 36% is
            loop-carried accumulate latency, C chains recover it; if
            it is ALU throughput, they measure neutral (each iteration
            is already ~146 independent vregs deep)
  overlap : full compute on CONSTANT staged data (one scalar consumes
            each streamed plane window) — discriminates DMA/compute
            overlap from VMEM-bandwidth contention, as in the cwt
            kernel's r5 probe

All ablated variants compute WRONG math by design; each preserves the
memory-movement shape of everything it does not remove. Reference
anchor: the numba scatter loop this kernel replaces,
old/ssqueezepy/algos.py:859-984.

Run on chip: python tools/ablate_reassign.py [K reps] [--quick]
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

NA = 293          # scale rows
NF = 293          # output bins
N = 160000        # time samples
TILE = 512

# log-piecewise plan constants of the production ssq_cwt grid (values
# representative; binning math identical to reassign_pallas._bin_indices)
PARAMS = dict(vlmin=-9.0, dvl=0.035, vlmin0=-9.0, dvl0=0.02,
              vlmin1=-5.0, dvl1=0.05, idx1=160.0)
GAMMA2 = 1e-16
_TWO_PI = 6.283185307179586


def _round_half_even(x):
    f = jnp.floor(x)
    r = x - f
    up = f + 1.0
    even_dn = jnp.floor(f / 2.0) * 2.0 == f
    return jnp.where(r > 0.5, up, jnp.where(r < 0.5, f,
                                            jnp.where(even_dn, f, up)))


def _bins(C, D, A, B, tile_idx):
    mag2 = C * C + D * D
    ratio = (B * C - A * D) / (mag2 * _TWO_PI)
    w = jnp.abs(ratio)
    mask = mag2 > GAMMA2
    if N % TILE:
        cols = (jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
                + tile_idx * TILE)
        mask = mask & (cols < N)
    wsafe = jnp.where(mask & (w > 0), w, 1.0)
    wl = jnp.log2(wsafe)
    k_hi = jnp.minimum(_round_half_even(
        (wl - PARAMS["vlmin1"]) / PARAMS["dvl1"]) + PARAMS["idx1"],
        float(NF - 1))
    k_lo = jnp.maximum(_round_half_even(
        (wl - PARAMS["vlmin0"]) / PARAMS["dvl0"]), 0.0)
    k = jnp.where(wl > PARAMS["vlmin1"], k_hi, k_lo)
    k = jnp.where(w > 0, k, 0.0).astype(jnp.int32)
    return jnp.where(mask, k, -1), mask


def _make_kernel(ablate):
    chains = int(ablate[6:]) if ablate.startswith("chains") else 0
    group = int(ablate[5:]) if ablate.startswith("group") else 0

    def kernel(wr_ref, wi_ref, dr_ref, di_ref, const_ref,
               outr_ref, outi_ref, k_ref, vr_ref, vi_ref, *acc_refs):
        if ablate == "dmaonly":
            outr_ref[:] = jnp.zeros((NF, TILE), jnp.float32)
            outi_ref[:] = jnp.zeros((NF, TILE), jnp.float32)
            return

        if ablate == "overlap":
            # constant staged data: one scalar read keeps each streamed
            # plane window live, but no loop value depends on it
            dep = (wr_ref[0, 0] + wi_ref[0, 0] + dr_ref[0, 0]
                   + di_ref[0, 0])
            k_ref[:] = (jax.lax.broadcasted_iota(
                jnp.int32, (NA, TILE), 0) * 7) % NF
            vr_ref[:] = jnp.full((NA, TILE), 0.5, jnp.float32)
            vi_ref[:] = jnp.full((NA, TILE), 0.25, jnp.float32)
        else:
            C = wr_ref[:]
            D = wi_ref[:]
            k, mask = _bins(C, D, dr_ref[:], di_ref[:], pl.program_id(0))
            cb = const_ref[:]
            k_ref[:] = k
            vr_ref[:] = jnp.where(mask, C * cb, 0.0)
            vi_ref[:] = jnp.where(mask, D * cb, 0.0)
            dep = jnp.float32(0.0)

        rows = jax.lax.broadcasted_iota(jnp.int32, (NF, TILE), 0)
        outr_ref[:] = jnp.zeros((NF, TILE), jnp.float32)
        outi_ref[:] = jnp.zeros((NF, TILE), jnp.float32)
        if ablate == "overlap":
            outr_ref[pl.ds(0, 1), :] += dep

        if ablate == "binonly":
            outr_ref[pl.ds(0, 1), :] = vr_ref[pl.ds(0, 1), :]
            outi_ref[pl.ds(0, 1), :] = vi_ref[pl.ds(0, 1), :]
            return

        if chains:
            for a in acc_refs:
                a[:] = jnp.zeros((NF, TILE), jnp.float32)

            def body(i, _):
                ki = k_ref[pl.ds(i, 1), :]
                onehot = rows == ki
                c = i % chains
                for cc in range(chains):   # static branch on c
                    @pl.when(c == cc)
                    def _(cc=cc):
                        acc_refs[2 * cc][:] += jnp.where(
                            onehot, vr_ref[pl.ds(i, 1), :], 0.0)
                        acc_refs[2 * cc + 1][:] += jnp.where(
                            onehot, vi_ref[pl.ds(i, 1), :], 0.0)
                return 0

            jax.lax.fori_loop(0, NA, body, 0)
            for cc in range(chains):
                outr_ref[:] += acc_refs[2 * cc][:]
                outi_ref[:] += acc_refs[2 * cc + 1][:]
            return

        if group:
            # THE RMW FIX (r5, from addonly ~ full): sum G rows' one-hot
            # contributions in vregs, ONE output += per group — the
            # output-block read-modify-write volume drops G-fold. (The
            # r2 "4x unroll" kept 4 separate +=, saving nothing.)
            def body(g, _):
                i0 = g * group
                tr = jnp.zeros((NF, TILE), jnp.float32)
                ti = jnp.zeros((NF, TILE), jnp.float32)
                for c in range(group):
                    ki = k_ref[pl.ds(i0 + c, 1), :]
                    onehot = rows == ki
                    tr = tr + jnp.where(onehot,
                                        vr_ref[pl.ds(i0 + c, 1), :], 0.0)
                    ti = ti + jnp.where(onehot,
                                        vi_ref[pl.ds(i0 + c, 1), :], 0.0)
                outr_ref[:] += tr
                outi_ref[:] += ti
                return 0

            jax.lax.fori_loop(0, NA // group, body, 0)
            # ragged tail rows, one at a time
            for i in range((NA // group) * group, NA):
                ki = k_ref[pl.ds(i, 1), :]
                onehot = rows == ki
                outr_ref[:] += jnp.where(onehot, vr_ref[pl.ds(i, 1), :],
                                         0.0)
                outi_ref[:] += jnp.where(onehot, vi_ref[pl.ds(i, 1), :],
                                         0.0)
            return

        def body(i, _):
            ki = k_ref[pl.ds(i, 1), :]
            onehot = rows == ki
            if ablate == "cmponly":
                outr_ref[:] += onehot.astype(jnp.float32)
                outi_ref[:] += onehot.astype(jnp.float32)
            elif ablate == "addonly":
                outr_ref[:] += vr_ref[pl.ds(i, 1), :]
                outi_ref[:] += vi_ref[pl.ds(i, 1), :]
            else:
                outr_ref[:] += jnp.where(onehot, vr_ref[pl.ds(i, 1), :],
                                         0.0)
                outi_ref[:] += jnp.where(onehot, vi_ref[pl.ds(i, 1), :],
                                         0.0)
            return 0

        jax.lax.fori_loop(0, NA, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("ablate",))
def run(wr, wi, dr, di, ablate):
    chains = int(ablate[6:]) if ablate.startswith("chains") else 0
    grid_n = -(-N // TILE)
    const = jnp.ones((NA, 1), jnp.float32)
    bspec_in = pl.BlockSpec((NA, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    bspec_col = pl.BlockSpec((NA, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    bspec_out = pl.BlockSpec((NF, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((NA, TILE), jnp.int32),
               pltpu.VMEM((NA, TILE), jnp.float32),
               pltpu.VMEM((NA, TILE), jnp.float32)]
    scratch += [pltpu.VMEM((NF, TILE), jnp.float32)
                for _ in range(2 * chains)]
    outr, outi = pl.pallas_call(
        _make_kernel(ablate),
        grid=(grid_n,),
        in_specs=[bspec_in] * 4 + [bspec_col],
        out_specs=(bspec_out, bspec_out),
        out_shape=(jax.ShapeDtypeStruct((NF, grid_n * TILE), jnp.float32),
                   jax.ShapeDtypeStruct((NF, grid_n * TILE), jnp.float32)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(wr, wi, dr, di, const)
    return jnp.sum(outr) + jnp.sum(outi)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 8
    print(f"device {jax.devices()} K={K} shape na={NA} nf={NF} N={N}",
          file=sys.stderr, flush=True)
    grid_n = -(-N // TILE)
    npad = grid_n * TILE

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        mk = lambda kk: jax.random.normal(kk, (NA, npad), jnp.float32)
        return mk(ks[0]), mk(ks[1]), mk(ks[2]), mk(ks[3])

    wr, wi, dr, di = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    variants = ("full", "dmaonly", "binonly", "cmponly", "addonly",
                "chains2", "chains4", "overlap")
    if "--quick" in sys.argv:
        variants = ("full", "dmaonly", "overlap")
    if "--group" in sys.argv:
        # r5 follow-up: grouped-accumulate RMW reduction
        variants = ("full", "group2", "group4", "group8", "group16")
    for ab in variants:
        try:
            f = lambda i, ab=ab: run(wr + jnp.float32(i) * 0, wi, dr, di,
                                     ab)
            _ = float(f(0))
            best = float("inf")
            for r in range(3):
                t0 = time.perf_counter()
                outs = [f(r * K + i + 1) for i in range(K)]
                _ = float(outs[-1])
                best = min(best, (time.perf_counter() - t0) / K)
            print(f"{ab:10s} {best * 1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{ab:10s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
