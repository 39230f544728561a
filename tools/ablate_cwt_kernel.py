"""Ablation roofline of the fused cwt-deriv kernel (VERDICT r3 #3).

The r4 dot-variant A/B disproved the dot-issue-bound hypothesis (dot3 ~
dot1 ~ merged ~ tmerged at ~16.8 ms), yet paper rooflines say the kernel
should run at ~2.4 ms (MXU ~0.7 + HBM ~1.1 + VPU ~1.0, overlapped). This
harness times STRIPPED variants of the same Pallas kernel at the
production shape to locate where the 16.8 ms actually goes:

  full     : the production dot3 kernel (baseline)
  nosplit  : bf16x1 dots (1 dot/stage instead of 3; wrong precision,
             measures the bf16-split + extra-dot cost)
  nostage1 : stage-1 dot replaced by a concat (keeps shapes/memory)
  nostage2 : stage-2 dot replaced by a slice
  nodots   : both dots removed (pure VPU + memory movement)
  notwiddle: twiddle 6-op complex multiply removed
  nolayout : final (M1, 2R) -> (2, R*M1) transpose-relayout removed
             (reads the same elements in a layout-preserving order)
  dmaonly  : empty body — the grid + BlockSpec DMA floor (Pw rows in,
             4 output rows out; Mosaic still streams every block)

r5 additivity-gap discriminators (--overlap; VERDICT r4->r5 #1):

  overlap  : full dot chain on the CONSTANT x planes (no dependency on
             the streamed Pw window, which one scalar read keeps live).
             max(dmaonly, dots) => overlap is schedulable and the full
             kernel's serial chain is the defect; ~additive => DMA and
             MXU/VPU contend for VMEM bandwidth (physical floor).
  noout    : full compute, 128-wide outputs (output stream's share)
  ksplitC  : bf16x3 dots contraction-split into C independent partial
             chains per stage (same MACs/bytes/windows; C-1 extra f32
             partials live) — the VERDICT's (a) prescription

All ablated variants compute WRONG math by design; each preserves the
memory-movement shape of everything it does not remove, so
full - variant isolates that component's cost.

Run on chip: python tools/ablate_cwt_kernel.py [K reps]
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

from ssqueeze_rs_tpu.ops.fft_mxu import best_split
from ssqueeze_rs_tpu.ops.fft_pallas import (_fused_consts, _dot3, _dot3_r,
                                            _split_bf16)

NA, L = 293, 160000
M = 1 << 18
M1, M2 = best_split(M)
K1 = M1 // 2
START = (M - L) // 2


def _make_kernel(R, off, ablate):
    ksplit = int(ablate[6:]) if ablate.startswith("ksplit") else 0

    def _dot3_ks(wh, wl, x, C):
        """Contraction-split bf16x3: C independent partial chains over
        contraction ranges (VERDICT r4->r5 #1a). Same MACs and operand
        bytes as _dot3; 3C smaller dots with NO serial dependency until
        the final add tree — same input windows, only C-1 extra (m, n)
        f32 partials live."""
        xh, xl = _split_bf16(x)
        k = x.shape[0] // C
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
        parts = []
        for c in range(C):
            s = slice(c * k, (c + 1) * k)
            parts.append(d(wh[:, s], xh[s]) + d(wh[:, s], xl[s])
                         + d(wl[:, s], xh[s]))
        return functools.reduce(lambda a, b: a + b, parts)

    def _dot3_r_ks(x, wh, wl, C):
        xh, xl = _split_bf16(x)
        k = x.shape[1] // C
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
        parts = []
        for c in range(C):
            s = slice(c * k, (c + 1) * k)
            parts.append(d(xh[:, s], wh[s]) + d(xl[:, s], wh[s])
                         + d(xh[:, s], wl[s]))
        return functools.reduce(lambda a, b: a + b, parts)

    def pipeline(zr, zi, w1h, w1l, Tr, Ti, w2h, w2l):
        X = jnp.concatenate([zr, zi], axis=0)              # (M1, M2)
        if ablate in ("nostage1", "nodots"):
            B1 = jnp.concatenate([X, X], axis=0)           # (2M1, M2)
        elif ablate == "nosplit":
            B1 = jnp.dot(w1h, X.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        elif ksplit:
            B1 = _dot3_ks(w1h, w1l, X, ksplit)
        else:
            B1 = _dot3(w1h, w1l, X)                        # (2M1, M2)
        Br, Bi = B1[:M1], B1[M1:]
        if ablate == "notwiddle":
            C2 = jnp.concatenate([Br, Bi], axis=-1)        # (M1, 2M2)
        else:
            C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                                 axis=-1)
        if ablate in ("nostage2", "nodots"):
            OUT = C2[:, :2 * R]                            # (M1, 2R)
        elif ablate == "nosplit":
            OUT = jnp.dot(C2.astype(jnp.bfloat16),
                          w2h.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        elif ksplit:
            OUT = _dot3_r_ks(C2, w2h, w2l, ksplit)
        else:
            OUT = _dot3_r(C2, w2h, w2l)
        if ablate == "nolayout":
            # same element count, layout-preserving read order
            return OUT.reshape(2, R * M1)[:, off:off + L]
        return OUT.T.reshape(2, R * M1)[:, off:off + L]

    def kernel(pw_ref, xr_ref, xi_ref, xig_ref, invdt_ref, nwr_ref,
               nwi_ref, ndr_ref, ndi_ref, w1h_ref, w1l_ref, tr_ref,
               ti_ref, w2h_ref, w2l_ref, alt_ref, owr_ref, owi_ref,
               odr_ref, odi_ref):
        if ablate == "dmaonly":
            z = jnp.zeros((L,), jnp.float32)
            owr_ref[0, 0] = z
            owi_ref[0, 0] = z
            odr_ref[0, 0] = z
            odi_ref[0, 0] = z
            return
        if ablate == "noout":
            # full compute, 128-wide output windows: isolates the OUTPUT
            # stream's share of the non-overlap (outputs are ~750 MB of
            # the ~0.9 GB per-call traffic)
            args = (w1h_ref[:], w1l_ref[:], tr_ref[:], ti_ref[:],
                    w2h_ref[:], w2l_ref[:])
            p = pw_ref[0]
            zr = p * xr_ref[0]
            zi = p * xi_ref[0]
            OW = pipeline(zr, zi, *args)
            s = xig_ref[:] * invdt_ref[0, 0, 0]
            OD = pipeline(-zi * s, zr * s, *args)
            owr_ref[0, 0] = OW[0, :128] + nwr_ref[0, 0, 0]
            owi_ref[0, 0] = OW[1, :128] + nwi_ref[0, 0, 0]
            odr_ref[0, 0] = OD[0, :128] + ndr_ref[0, 0, 0]
            odi_ref[0, 0] = OD[1, :128] + ndi_ref[0, 0, 0]
            return
        args = (w1h_ref[:], w1l_ref[:], tr_ref[:], ti_ref[:],
                w2h_ref[:], w2l_ref[:])
        alt = alt_ref[0]
        if ablate == "overlap":
            # THE DISCRIMINATOR (VERDICT r4->r5 #1): the full 2-pipeline
            # dot chain computed on the CONSTANT single-buffered x planes
            # only — the streamed Pw window is consumed by one scalar (so
            # Mosaic cannot drop its per-row DMA) but feeds no dot. The
            # per-step compute has NO data dependency on the per-step
            # input DMA. If the machine can overlap DMA with MXU work,
            # this times at max(dmaonly, dots) ~ 10-11 ms; if input/output
            # streaming and compute contend for VMEM bandwidth, it stays
            # at the additive ~17 ms and the gap is physical, not a
            # scheduling defect.
            zr = xr_ref[0]
            zi = xi_ref[0]
            dep = pw_ref[0, 0, 0] * invdt_ref[0, 0, 0]   # scalar consume
            OW = pipeline(zr, zi, *args)
            owr_ref[0, 0] = OW[0] + nwr_ref[0, 0, 0] * alt + dep
            owi_ref[0, 0] = OW[1] + nwi_ref[0, 0, 0] * alt
            s = xig_ref[:] * invdt_ref[0, 0, 0]
            OD = pipeline(-zi * s, zr * s, *args)
            odr_ref[0, 0] = OD[0] + ndr_ref[0, 0, 0] * alt
            odi_ref[0, 0] = OD[1] + ndi_ref[0, 0, 0] * alt
            return
        p = pw_ref[0]
        zr = p * xr_ref[0]
        zi = p * xi_ref[0]
        OW = pipeline(zr, zi, *args)
        owr_ref[0, 0] = OW[0] + nwr_ref[0, 0, 0] * alt
        owi_ref[0, 0] = OW[1] + nwi_ref[0, 0, 0] * alt
        s = xig_ref[:] * invdt_ref[0, 0, 0]
        OD = pipeline(-zi * s, zr * s, *args)
        odr_ref[0, 0] = OD[0] + ndr_ref[0, 0, 0] * alt
        odi_ref[0, 0] = OD[1] + ndi_ref[0, 0, 0] * alt

    return kernel


NA8 = -(-NA // 8) * 8      # 296: HBM refs are (8,128)-tiled — DMA row
NB8 = NA8 // 8             # slices must be 8-row blocks


def _make_manual_kernel(R, off):
    """VERDICT r4->r5 #1b: grid=() kernel with EXPLICIT double-buffered
    DMA — Pw rows streamed HBM->VMEM in 8-row blocks two slots deep,
    outputs copied VMEM->HBM asynchronously, the dot pipelines of block
    b overlapping the input DMA of block b+1 and the output DMA of
    block b-2 by construction. If Mosaic's automatic grid pipelining is
    what fails to overlap (the additive ablation), this variant times
    near max(dmaonly, dots); if VMEM-port contention is physical, it
    stays additive too.

    Mosaic DMA slice rules (learned here): a 1-row slice of a tiled
    ref is ILLEGAL on BOTH sides — VMEM buffers (2, L) are (2,128)-
    tiled and HBM outputs (NA, L) are (8,128)-tiled, so the stream
    granularity must be 8 output rows (hence the 8-row blocks and the
    NA8 pad).

    Wrong math by design at the epilogue margins (the per-row Nyquist
    lane add uses a constant scalar instead of the per-row value) —
    memory shape preserved."""
    def pipeline(zr, zi, w1h, w1l, Tr, Ti, w2h, w2l):
        X = jnp.concatenate([zr, zi], axis=0)
        B1 = _dot3(w1h, w1l, X)
        Br, Bi = B1[:M1], B1[M1:]
        C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                             axis=-1)
        OUT = _dot3_r(C2, w2h, w2l)
        return OUT.T.reshape(2, R * M1)[:, off:off + L]

    def kernel(pw_ref, xr_ref, xi_ref, xig_ref, invdt_ref,
               w1h_ref, w1l_ref, tr_ref, ti_ref, w2h_ref, w2l_ref,
               alt_ref, owr_ref, owi_ref, odr_ref, odi_ref):
        o_hbm = (owr_ref, owi_ref, odr_ref, odi_ref)

        def body(pw_buf, ob, in_sem, out_sem):
            def in_dma(slot, b):
                return pltpu.make_async_copy(
                    pw_ref.at[pl.ds(b * 8, 8)], pw_buf.at[slot],
                    in_sem.at[slot])

            def out_dma(p, slot, b):
                return pltpu.make_async_copy(
                    ob[p].at[slot], o_hbm[p].at[pl.ds(b * 8, 8)],
                    out_sem.at[slot, p])

            in_dma(0, 0).start()
            args = (w1h_ref[:], w1l_ref[:], tr_ref[:], ti_ref[:],
                    w2h_ref[:], w2l_ref[:])
            alt = alt_ref[0]
            s = xig_ref[:] * invdt_ref[0, 0]
            nyq = invdt_ref[0, 1]          # constant stand-in scalar

            def loop(b, _):
                slot = b % 2

                @pl.when(b + 1 < NB8)
                def _():
                    in_dma((b + 1) % 2, b + 1).start()

                in_dma(slot, b).wait()
                # the output buffers of this slot were last used by
                # block b-2; their copies must land before we overwrite
                @pl.when(b >= 2)
                def _():
                    for p in range(4):
                        out_dma(p, slot, b - 2).wait()

                rows = ([], [], [], [])
                for j in range(8):
                    p8 = pw_buf[slot, j]
                    zr = p8 * xr_ref[0]
                    zi = p8 * xi_ref[0]
                    OW = pipeline(zr, zi, *args)
                    OD = pipeline(-zi * s, zr * s, *args)
                    rows[0].append(OW[0] + nyq * alt)
                    rows[1].append(OW[1] + nyq * alt)
                    rows[2].append(OD[0] + nyq * alt)
                    rows[3].append(OD[1] + nyq * alt)
                for p_i in range(4):
                    ob[p_i][pl.ds(slot, 1)] = jnp.stack(rows[p_i])[None]
                    out_dma(p_i, slot, b).start()
                return 0

            jax.lax.fori_loop(0, NB8, loop, 0)
            # drain the last two blocks' output copies
            for b in (NB8 - 2, NB8 - 1):
                for p in range(4):
                    out_dma(p, b % 2, b).wait()

        pl.run_scoped(
            body,
            pw_buf=pltpu.VMEM((2, 8, K1, M2), jnp.float32),
            ob=[pltpu.VMEM((2, 8, L), jnp.float32) for _ in range(4)],
            in_sem=pltpu.SemaphoreType.DMA((2,)),
            out_sem=pltpu.SemaphoreType.DMA((2, 4)),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=())
def run_manual(Pw, xr_g, xi_g, xig):
    start, length = START, L
    r0 = start // M1
    r1 = -(-(start + length) // M1)
    R = r1 - r0
    off = start - r0 * M1
    (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(M, r0, r1, 1)
    alt_keep = alt[start:start + length][None, :]
    kernel = _make_manual_kernel(R, off)
    scal = jnp.ones((1, 128), jnp.float32)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
    # 8-row block streaming needs NA8 rows (HBM tiling); the pad copy
    # (~0.6 GB/s worth, ~1 ms) is counted against the variant — a
    # production kernel would emit NA8 rows natively
    Pw8 = jnp.concatenate(
        [Pw, jnp.zeros((NA8 - NA, K1, M2), Pw.dtype)], axis=0)
    outs = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),      # Pw stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # xr
            pl.BlockSpec(memory_space=pltpu.VMEM),     # xi
            pl.BlockSpec(memory_space=pltpu.VMEM),     # xig
            pl.BlockSpec(memory_space=pltpu.VMEM),     # invdt scalars
        ] + wspecs
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],     # alt
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.HBM)
                        for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((NA8, L), jnp.float32)
                        for _ in range(4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(Pw8, xr_g[0], xi_g[0], xig, scal,
      *[jnp.asarray(w) for w in (W1h, W1l, Tr, Ti, W2h, W2l)],
      jnp.asarray(alt_keep))
    return sum(jnp.sum(o) for o in outs)


@functools.partial(jax.jit, static_argnames=("ablate", "interpret"))
def run(Pw, xr_g, xi_g, xig, ablate, interpret=False):
    if ablate == "manual":
        return run_manual(Pw, xr_g, xi_g, xig)
    if ablate.startswith("dma"):
        return run_dma(Pw, ablate)

    start, length = START, L
    r0 = start // M1
    r1 = -(-(start + length) // M1)
    R = r1 - r0
    off = start - r0 * M1
    (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(M, r0, r1, 1)
    alt_keep = alt[start:start + length][None, :]
    kernel = _make_kernel(R, off, ablate)
    rows = NA
    row3 = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    lane = jnp.zeros((rows, 1, 128), jnp.float32)
    scal = jnp.ones((1, 1, 128), jnp.float32)
    Lout = 128 if ablate == "noout" else L
    out3 = lambda: pl.BlockSpec((1, 1, Lout), row3,
                                memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(w.shape, const2, memory_space=pltpu.VMEM)
              for w in (W1h, W1l, Tr, Ti, W2h, W2l)]
    outs = pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((1, K1, M2), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1, M2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1, M2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, M2), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), const3, memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, 1, 128), row3, memory_space=pltpu.VMEM)] * 4
        + wspecs
        + [pl.BlockSpec((1, L), const2, memory_space=pltpu.VMEM)],
        out_specs=(out3(), out3(), out3(), out3()),
        out_shape=tuple(jax.ShapeDtypeStruct((rows, 1, Lout), jnp.float32)
                        for _ in range(4)),
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024))),
    )(Pw, xr_g, xi_g, xig, scal, lane, lane, lane, lane,
      *[jnp.asarray(w) for w in (W1h, W1l, Tr, Ti, W2h, W2l)],
      jnp.asarray(alt_keep))
    return sum(jnp.sum(o) for o in outs)


@functools.partial(jax.jit, static_argnames=("ablate",))
def run_dma(Pw, ablate):
    """DMA-floor structure probes:
    dmaonly : 4 output planes, Pw streamed per row (the baseline floor)
    dma1    : 1 output plane  (bytes ∝ planes? -> bandwidth-bound)
    dmanoin : 4 planes, Pw block constant (no input streaming)
    dmarb8  : 4 planes, 8 rows per grid step (37 steps, same bytes)
    """
    rb = 8 if ablate == "dmarb8" else 1
    nplanes = 1 if ablate == "dma1" else 4
    rows = NA - (NA % rb) if rb > 1 else NA   # 288 for rb=8 (drop ragged)

    def kernel(pw_ref, *o_refs):
        z = jnp.zeros((L,), jnp.float32)
        for o_ref in o_refs:
            for r in range(rb):
                o_ref[r, 0] = z

    row3 = lambda i: (i, 0, 0)
    const3 = lambda i: (0, 0, 0)
    pw_map = const3 if ablate == "dmanoin" else row3
    outs = pl.pallas_call(
        kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec((rb, K1, M2), pw_map,
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec((rb, 1, L), row3,
                                     memory_space=pltpu.VMEM)
                        for _ in range(nplanes)),
        out_shape=tuple(jax.ShapeDtypeStruct((rows, 1, L), jnp.float32)
                        for _ in range(nplanes)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(Pw[:rows])
    return sum(jnp.sum(o) for o in outs)


def main():
    import os
    interp = bool(int(os.environ.get("SSQ_ABLATE_INTERPRET", "0")))
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"device {jax.devices()} K={K}", file=sys.stderr, flush=True)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        Pw = jax.random.normal(ks[0], (NA, K1, M2), jnp.float32)
        xr = jax.random.normal(ks[1], (1, K1, M2), jnp.float32)
        xi = jax.random.normal(ks[2], (1, K1, M2), jnp.float32)
        xig = jax.random.uniform(ks[3], (K1, M2), jnp.float32, 0, 3)
        return Pw, xr, xi, xig

    Pw, xr, xi, xig = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    variants = ("full", "nosplit", "nostage1", "nostage2", "nodots",
                "notwiddle", "nolayout", "dmaonly")
    if "--dma" in sys.argv:
        variants = ("dmaonly", "dma1", "dmanoin", "dmarb8")
    if "--overlap" in sys.argv:
        # r5 VERDICT #1 set: the additivity-gap discriminators
        variants = ("full", "dmaonly", "overlap", "noout",
                    "ksplit2", "ksplit4", "manual")
    if "--manual" in sys.argv:
        variants = ("full", "dmaonly", "manual")
    for ab in variants:
        try:
            f = lambda i, ab=ab: run(Pw + jnp.float32(i) * 0, xr, xi, xig,
                                     ab, interpret=interp)
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
            if "--manual" in sys.argv:
                import traceback
                traceback.print_exc()


if __name__ == "__main__":
    main()
