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

    # grid3d: the SAME (B, na, n) layout and production kernel, but a
    # flattened 1D grid of B*nT steps with 3D index maps instead of
    # vmap's (B, nT) grid — discriminates "vmap batching machinery"
    # from "batch-boundary streaming" as the +8% source, and is the
    # candidate production fix (no relayout needed).
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ssqueeze_rs_tpu.ops.reassign_pallas import _make_kernel

    na8 = -(-na // 8) * 8

    @partial(jax.jit, static_argnames=("nf",))
    def grid3d(wr, wi, dr, di, i, nf=None):
        # inputs PRE-PADDED on BOTH trailing dims: (a) tile-divisible
        # columns — the kernel's ragged-tile mask reads
        # pl.program_id(0) as the time-tile index, which a flattened
        # (B*nT,) grid breaks for b >= 1; (b) 8-aligned na — a
        # (1, 293, T) block view of the sublane-padded (1, 296, T)
        # VMEM memref is an illegal 293-slice, so rows pad to na8 with
        # zeros (gamma-masked, contribute nothing; bins shift by
        # na8-na under flipud so the vmap cross-checksum is
        # approximate). +1% rows +0.16% cols of extra work vs the
        # vmapped cell — conservative.
        wr = wr + i * 1e-30
        nf = na8 if nf is None else nf
        TILE = 512
        n2 = wr.shape[-1]
        assert n2 % TILE == 0 and wr.shape[-2] == na8
        nT = n2 // TILE
        kernel2 = _make_kernel("log", dict(params), 1e-8, True, "cwt",
                               nf, na8, TILE, n_valid=n2)

        def kernel(*refs):
            ins = [r.at[0] for r in refs[:4]]
            cb, sb = refs[4], refs[5]
            outs = [r.at[0] for r in refs[6:8]]
            kernel2(*ins, cb, sb, *outs, *refs[8:])

        constb = jnp.broadcast_to(
            jnp.pad(const, (0, na8 - na))[:, None], (na8, 1))
        sfsb = jnp.broadcast_to(
            jnp.pad(sfs, (0, na8 - na))[:, None], (na8, 1))
        bspec_in = pl.BlockSpec(
            (1, na8, TILE), lambda idx: (idx // nT, 0, idx % nT),
            memory_space=pltpu.VMEM)
        bspec_col = pl.BlockSpec((na8, 1), lambda idx: (0, 0),
                                 memory_space=pltpu.VMEM)
        bspec_out = pl.BlockSpec(
            (1, nf, TILE), lambda idx: (idx // nT, 0, idx % nT),
            memory_space=pltpu.VMEM)
        outr, outi = pl.pallas_call(
            kernel,
            grid=(B * nT,),
            in_specs=[bspec_in] * 4 + [bspec_col, bspec_col],
            out_specs=(bspec_out, bspec_out),
            out_shape=(jax.ShapeDtypeStruct((B, nf, n2), jnp.float32),
                       jax.ShapeDtypeStruct((B, nf, n2), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((na8, TILE), jnp.int32),
                            pltpu.VMEM((na8, TILE), jnp.float32),
                            pltpu.VMEM((na8, TILE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(wr, wi, dr, di, constb, sfsb)
        # same reduction as the vmapped cells (checksum-comparable)
        return jnp.sum(jnp.sqrt(outr * outr + outi * outi))

    t_v = timed(vmapped, (wr, wi, dr, di), K=K)
    print(f"vmapped  {t_v*1e3:8.2f} ms  ({t_v/B*1e3:6.2f} /transform)",
          flush=True)

    flats = [jax.block_until_ready(jnp.swapaxes(z, 0, 1).reshape(na, B * n))
             for z in (wr, wi, dr, di)]
    t_fp = timed(flat_pre, tuple(flats), K=K)
    print(f"flat_pre {t_fp*1e3:8.2f} ms  ({t_fp/B*1e3:6.2f} /transform)",
          flush=True)

    try:
        t_f = timed(flat, (wr, wi, dr, di), K=K)
        print(f"flat+T   {t_f*1e3:8.2f} ms  ({t_f/B*1e3:6.2f} /transform)",
              flush=True)
    except Exception as e:   # RESOURCE_EXHAUSTED at B=8 (4x1.5 GB xposes)
        print(f"flat+T   FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
    del flats

    # grid3d vs vmapped on the SAME padded arrays (tile-divisible cols
    # + 8-aligned rows; maskless kernel on both sides)
    TILE = 512
    npad = -(-n // TILE) * TILE
    pads = [jax.block_until_ready(
        jnp.pad(z, ((0, 0), (0, na8 - na), (0, npad - n))))
        for z in (wr, wi, dr, di)]
    del wr, wi, dr, di

    const8 = jnp.pad(const, (0, na8 - na))
    sfs8 = jnp.pad(sfs, (0, na8 - na))

    @jax.jit
    def vmapped_pad(wr, wi, dr, di, i):
        Tx = reassign_pallas((wr + i * 1e-30, wi), (dr, di), const8,
                             1e-8, sfs8, params, mode="log", flipud=True,
                             transform="cwt", nf=na)
        return jnp.sum(jnp.abs(Tx))

    c_vp = float(vmapped_pad(*pads, 0))
    c_g = float(grid3d(*pads, 0))
    print(f"checksums vmap_pad {c_vp:.8g} grid3d {c_g:.8g} "
          f"(rel {abs(c_vp - c_g) / max(abs(c_vp), 1e-30):.1e})",
          flush=True)
    t_vp = timed(vmapped_pad, tuple(pads), K=K)
    print(f"vmap_pad {t_vp*1e3:8.2f} ms  ({t_vp/B*1e3:6.2f} /transform)",
          flush=True)
    t_g = timed(grid3d, tuple(pads), K=K)
    print(f"grid3d   {t_g*1e3:8.2f} ms  ({t_g/B*1e3:6.2f} /transform)",
          flush=True)


if __name__ == "__main__":
    main()
