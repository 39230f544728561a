"""Pallas TPU kernel: fused phase transform + analytic binning + reassignment.

The reassignment scatter is the one op XLA does poorly (data-dependent
indices -> serialized scatter-adds). This kernel keeps everything on-chip:

  grid over time tiles; per tile, the phase transform w, the analytic bin
  index k (log / log-piecewise / linear closed forms, reference
  algos.py:859-984) and the accumulation Tx[k[i,j], j] += Wx[i,j]*const[i]
  are computed in VMEM. The accumulation is a row loop with a one-hot
  compare against a resident (nf, T) accumulator — columns are
  embarrassingly parallel (the reference's column-parallel invariant,
  algos.py:183-192), rows accumulate in fixed order => deterministic.

Plan constants (vlmin, dvl, gamma, flipud, ...) are baked into the traced
kernel as Python floats — they are host-side planning outputs, so each
(plan, shape) pair compiles once.

Complex data is carried as separate real/imag f32 planes (TPU has no
native complex tiles).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import interpret_mode

__all__ = ["reassign_pallas"]

_TWO_PI = 6.283185307179586


def _round_half_even(x):
    # jnp.round is round-half-even, matching numba/np.round in the reference
    return jnp.round(x)


def _bin_indices(mode, params, gamma, flipud, transform, nf, tile, n_valid,
                 wr, wi, dr, di, sfs, tile_idx=None, w_pre=None):
    """Shared fwd/bwd binning: (k, mask) from the phase transform and the
    analytic closed forms (reference algos.py:859-984). k = -1 where
    masked (matches no bin). `tile_idx`: traced grid position of this
    time tile (defaults to pl.program_id(0), the reassignment kernels'
    grid layout; the fused ssq_stft kernel passes its own).
    `w_pre`: phase transform PRECOMPUTED upstream (the cwt kernel's
    fused phase epilogue, fft_pallas._make_cwt_kernel_phase), +inf
    where gamma-masked — dr/di are unused then (pass None)."""
    omax_f = float(nf - 1)
    if w_pre is not None:
        w = w_pre
        mask = w < jnp.inf
    else:
        gamma2 = float(gamma) ** 2
        C, D, A, B = wr, wi, dr, di
        mag2 = C * C + D * D
        ratio = (B * C - A * D) / (mag2 * _TWO_PI)
        if transform == "stft":
            w = jnp.abs(sfs - ratio)
        else:
            w = jnp.abs(ratio)
        mask = mag2 > gamma2
    if n_valid % tile:
        # ragged last tile: inputs are NOT padded (saves 4 full-array
        # pad copies); columns past n_valid may hold garbage -> mask
        if tile_idx is None:
            tile_idx = pl.program_id(0)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) +
                tile_idx * tile)
        mask = mask & (cols < n_valid)

    wsafe = jnp.where(mask & (w > 0), w, 1.0)
    if mode == "log":
        k = jnp.minimum(_round_half_even(jnp.maximum(
            (jnp.log2(wsafe) - params["vlmin"]) / params["dvl"], 0.0)),
            omax_f)
    elif mode == "log-piecewise":
        wl = jnp.log2(wsafe)
        k_hi = jnp.minimum(_round_half_even(
            (wl - params["vlmin1"]) / params["dvl1"]) + params["idx1"],
            omax_f)
        k_lo = jnp.maximum(_round_half_even(
            (wl - params["vlmin0"]) / params["dvl0"]), 0.0)
        k = jnp.where(wl > params["vlmin1"], k_hi, k_lo)
    else:  # lin
        k = jnp.minimum(_round_half_even(jnp.maximum(
            (w - params["vmin"]) / params["dv"], 0.0)), omax_f)
    # w == 0 with log binning: log2 -> -inf -> bin 0 (reference numba
    # semantics); wsafe replaced those with 1.0, so force k=0 there
    if mode.startswith("log"):
        k = jnp.where(w > 0, k, 0.0)
    k = k.astype(jnp.int32)
    if flipud:
        k = (nf - 1) - k
    return jnp.where(mask, k, -1), mask  # masked rows match no bin


def _skip_mode() -> str:
    """gamma-sparsity skip strategy (measured on-chip; see DESIGN.md):
    '0' = none, 'row' = per-row @pl.when (skip rows whose tile columns
    are all masked), 'tile' = whole-tile skip only. Read at trace time —
    A/B only in separate processes."""
    import os
    return os.environ.get("SSQ_TPU_REASSIGN_SKIP", "0")


def _band_mode():
    """Banded-reassignment config (r4, VERDICT r3 #2): 'STRIP,B',
    'off'/'0' to disable, unset = the default '32,32'.

    DEFAULT ON since the on-chip A/B (DESIGN.md "Banded reassignment"):
    at 160k x 296 rows, band 32,32 cuts ssq_cwt 36.6 -> 29.3 ms on a
    tone, 37.0 -> 24.4 ms on a gamma-masked tone, 37.3 -> 26.9 ms on a
    denoised chirp, and costs ~1.2% on white noise (detector tax; the
    fallback loop is the unchanged full kernel). Output is BITWISE
    equal to the unbanded kernel on every branch.

    Rationale (measured, tools band stats r4): on single-component
    signals the unmasked bin indices of a 512-column tile concentrate
    in ONE narrow band around the local instantaneous frequency, PLUS
    the static low-frequency strip (flipud high-k rows — sub-Nyquist
    scales ring across the whole segment). A per-tile dynamic band of
    B bins + a static strip of STRIP bins covers 94-97% of tiles for
    tones (any gamma) and denoised chirps; white noise and
    multi-component signals fail the zero-out-of-band test and take
    the full loop (phase estimates of noise have algebraic tails —
    the close-out floor argument stands for them).

    The banded branch does (STRIP + B + 8)/nf of the full loop's work
    and is BITWISE-equal (same adds, same row order — it only skips
    adds that are identically zero). Detection is ~6 vectorized ops
    per element (<1% of the full loop). Read at trace time — A/B in
    separate processes."""
    import os
    v = os.environ.get("SSQ_TPU_REASSIGN_BAND", "32,32")
    if not v or v in ("off", "0"):
        return None
    s, b = (int(p) for p in v.split(","))
    if s % 8 or b % 8 or s <= 0 or b <= 0:
        raise ValueError(f"SSQ_TPU_REASSIGN_BAND={v!r}: want 'STRIP,B' "
                         "with both multiples of 8")
    return s, b


def _group_mode() -> int:
    """Grouped-accumulate width G (r5, from the ablation roofline):
    the scatter loop is output-RMW-bound — removing ALL compare/select
    work saves ~1 ms of 24.6 (addonly ablation) while the na x 2-plane
    read-modify-write of the (nf, T) output block is the cost. Summing
    G rows' one-hot contributions in vregs and doing ONE `+=` per group
    divides that RMW volume by G. (The r2 4x-unroll kept 4 separate
    `+=` — same RMW volume — which is why it measured neutral.)

    Within a group the FP association changes ((acc+a)+b -> acc+(a+b)),
    so results differ at ulp level from G=1; the banded and full
    branches are grouped IDENTICALLY (same row partition, same in-group
    order), so band-vs-full stays bitwise-equal at any fixed G, and
    run-to-run determinism is unaffected. Read at trace time — A/B in
    separate processes. '1'/'0' disables.

    r5 on-chip A/B: **measured KILL** — micro 25.0 (G=1) vs 32.4-34.2
    (G=2..16); production noise/tone_g neutral. Mosaic materializes
    each (nf, T) tree operand in VMEM (the r2 2-row-vreg-group lesson),
    so grouping ADDS traffic instead of cutting RMW. Default stays 1;
    kept as a documented variant (docs/DESIGN.md round-5 roofline)."""
    import os
    g = int(os.environ.get("SSQ_TPU_REASSIGN_GROUP", "1"))
    return max(g, 1)


def _make_kernel(mode, params, gamma, flipud, transform, nf, na, tile,
                 n_valid, skip="0", phase_in=False):
    def kernel(*refs):
        if phase_in:
            # 3-plane contract (fused phase epilogue upstream): the w
            # plane replaces both dWx planes — one fewer HBM read here
            (wr_ref, wi_ref, w_ref, const_ref, sfs_ref,
             outr_ref, outi_ref, k_ref, vr_ref, vi_ref) = refs
            C = wr_ref[:]
            D = wi_ref[:]
            k, mask = _bin_indices(mode, params, gamma, flipud, transform,
                                   nf, tile, n_valid, C, D, None, None,
                                   sfs_ref[:], w_pre=w_ref[:])
        else:
            (wr_ref, wi_ref, dr_ref, di_ref, const_ref, sfs_ref,
             outr_ref, outi_ref, k_ref, vr_ref, vi_ref) = refs
            C = wr_ref[:]
            D = wi_ref[:]
            k, mask = _bin_indices(mode, params, gamma, flipud, transform,
                                   nf, tile, n_valid, C, D, dr_ref[:],
                                   di_ref[:], sfs_ref[:])

        cb = const_ref[:]
        # stage per-row (k, vals) in VMEM scratch; Mosaic supports dynamic
        # ref slicing but not dynamic_slice of loop values
        k_ref[:] = k
        vr_ref[:] = jnp.where(mask, C * cb, 0.0)
        vi_ref[:] = jnp.where(mask, D * cb, 0.0)

        rows = jax.lax.broadcasted_iota(jnp.int32, (nf, tile), 0)

        outr_ref[:] = jnp.zeros((nf, tile), outr_ref.dtype)
        outi_ref[:] = jnp.zeros((nf, tile), outi_ref.dtype)

        band = _band_mode()
        if (band is not None and skip == "0" and
                nf >= band[0] + band[1] + 16):
            # banded fast path (see _band_mode): per-tile dynamic band
            # + static low-freq strip when the zero-out-of-band test
            # passes, else the full loop. BITWISE-equal to the full
            # loop either way.
            STRIP, B0 = band
            Bp = B0 + 8                  # pad for the 8-aligned start
            # 8-align the strip start DOWN so the clip upper bound
            # sk - Bp is a provable multiple of 8 for EVERY nf (the r4
            # code used sk = nf - STRIP, whose clamp bound was
            # misaligned whenever nf % 8 != 0 — e.g. the bench's
            # nf=293 — making pl.multiple_of assert a falsehood when
            # the band center sat within ~B0/2 of the strip). The
            # strip widens by nf - STRIP - sk <= 7 rows to cover the
            # remainder.
            sk = ((nf - STRIP) // 8) * 8   # strip rows = [sk, nf)
            strip = nf - sk
            vr_all = vr_ref[:]
            vi_all = vi_ref[:]
            mag = vr_all * vr_all + vi_all * vi_all   # 0 where masked
            src = (k >= 0) & (k < sk)
            wts = jnp.where(src, mag, 0.0)
            tot = jnp.maximum(jnp.sum(wts), 1e-30)
            c = jnp.sum(wts * k.astype(wts.dtype)) / tot
            lo = jnp.clip(
                (jnp.floor(c - B0 / 2).astype(jnp.int32) // 8) * 8,
                0, sk - Bp)
            # Mosaic's divisibility analysis can't see through clip of
            # (x//8)*8 ("cannot statically prove index is a multiple of
            # 8" on chip) — assert it via the Pallas hint (both clip
            # bounds are multiples of 8 now, so the hint is true).
            lo = pl.multiple_of(lo, 8)
            oob = src & ((k < lo) | (k >= lo + Bp))
            nbad = jnp.sum(oob.astype(jnp.int32))
            # mag overflow (|v|^2 -> inf) makes c NaN; NaN compares are
            # all-false so oob would be empty and the banded branch
            # would run with an undefined lo, silently dropping valid
            # adds — take the full loop unless c is finite.
            banded_ok = (nbad == 0) & jnp.isfinite(c)

            G = _group_mode()

            @pl.when(banded_ok)
            def _():
                rows_b = (jax.lax.broadcasted_iota(
                    jnp.int32, (Bp, tile), 0) + lo)
                rows_s = (jax.lax.broadcasted_iota(
                    jnp.int32, (strip, tile), 0) + sk)

                def contrib(i):
                    ki = k_ref[pl.ds(i, 1), :]
                    vri = vr_ref[pl.ds(i, 1), :]
                    vii = vi_ref[pl.ds(i, 1), :]
                    ob = rows_b == ki
                    osm = rows_s == ki
                    return (jnp.where(ob, vri, 0.0),
                            jnp.where(ob, vii, 0.0),
                            jnp.where(osm, vri, 0.0),
                            jnp.where(osm, vii, 0.0))

                def flush(parts):
                    br, bi, sr, si = parts
                    outr_ref[pl.ds(lo, Bp), :] += br
                    outi_ref[pl.ds(lo, Bp), :] += bi
                    outr_ref[pl.ds(sk, strip), :] += sr
                    outi_ref[pl.ds(sk, strip), :] += si

                if G > 1:
                    def body(g, _):
                        i0 = g * G
                        parts = contrib(i0)
                        for c in range(1, G):
                            nxt = contrib(i0 + c)
                            parts = tuple(a + b
                                          for a, b in zip(parts, nxt))
                        flush(parts)
                        return 0

                    jax.lax.fori_loop(0, na // G, body, 0)
                    for i in range((na // G) * G, na):
                        flush(contrib(i))
                else:
                    # interleave compute and store per plane: emitting
                    # all of a row's where-values before ANY `+=` (the
                    # r5 contrib/flush shape) keeps multi-block temps
                    # live across the RMW and Mosaic spills them to
                    # VMEM — +~15 ms on the 160k noise path (bisected)
                    def body(i, _):
                        ki = k_ref[pl.ds(i, 1), :]
                        vri = vr_ref[pl.ds(i, 1), :]
                        vii = vi_ref[pl.ds(i, 1), :]
                        ob = rows_b == ki
                        outr_ref[pl.ds(lo, Bp), :] += jnp.where(ob, vri,
                                                                0.0)
                        outi_ref[pl.ds(lo, Bp), :] += jnp.where(ob, vii,
                                                                0.0)
                        osm = rows_s == ki
                        outr_ref[pl.ds(sk, strip), :] += jnp.where(
                            osm, vri, 0.0)
                        outi_ref[pl.ds(sk, strip), :] += jnp.where(
                            osm, vii, 0.0)
                        return 0

                    jax.lax.fori_loop(0, na, body, 0)

            @pl.when(jnp.logical_not(banded_ok))
            def _():
                def contrib(i):
                    ki = k_ref[pl.ds(i, 1), :]
                    onehot = rows == ki
                    return (jnp.where(onehot, vr_ref[pl.ds(i, 1), :], 0.0),
                            jnp.where(onehot, vi_ref[pl.ds(i, 1), :], 0.0))

                def flush(parts):
                    outr_ref[:] += parts[0]
                    outi_ref[:] += parts[1]

                if G > 1:
                    def body(g, _):
                        i0 = g * G
                        parts = contrib(i0)
                        for c in range(1, G):
                            nxt = contrib(i0 + c)
                            parts = tuple(a + b
                                          for a, b in zip(parts, nxt))
                        flush(parts)
                        return 0

                    jax.lax.fori_loop(0, na // G, body, 0)
                    for i in range((na // G) * G, na):
                        flush(contrib(i))
                else:
                    # interleaved compute/store (see banded branch note)
                    def body(i, _):
                        ki = k_ref[pl.ds(i, 1), :]
                        onehot = rows == ki
                        outr_ref[:] += jnp.where(
                            onehot, vr_ref[pl.ds(i, 1), :], 0.0)
                        outi_ref[:] += jnp.where(
                            onehot, vi_ref[pl.ds(i, 1), :], 0.0)
                        return 0

                    jax.lax.fori_loop(0, na, body, 0)
            return

        # where-select accumulation measured fastest on v5e (vs
        # compare->convert->FMA, 2-row groups in vregs, dual accumulator
        # chains, 4x unroll — all within noise or slower; the loop is at
        # the VPU's one-hot throughput floor ~na*nf*tile*5 ops)
        if skip == "row":
            # gamma-sparsity: rows fully below gamma in this tile (k all
            # -1) contribute nothing — branch them out. Wins when the
            # signal has silent/sub-gamma scale bands; costs one scalar
            # reduce + branch per row when dense.
            def body(i, _):
                ki = k_ref[pl.ds(i, 1), :]    # (1, T)

                @pl.when(jnp.max(ki) >= 0)
                def _():
                    onehot = rows == ki
                    outr_ref[:] += jnp.where(onehot,
                                             vr_ref[pl.ds(i, 1), :], 0.0)
                    outi_ref[:] += jnp.where(onehot,
                                             vi_ref[pl.ds(i, 1), :], 0.0)
                return 0

            jax.lax.fori_loop(0, na, body, 0)
        else:
            G = _group_mode()

            def contrib(i):
                ki = k_ref[pl.ds(i, 1), :]    # (1, T)
                onehot = rows == ki
                return (jnp.where(onehot, vr_ref[pl.ds(i, 1), :], 0.0),
                        jnp.where(onehot, vi_ref[pl.ds(i, 1), :], 0.0))

            if G > 1:
                # grouped accumulate (see _group_mode): G rows summed in
                # vregs, one output-block += per group
                def body(g, _):
                    i0 = g * G
                    pr, pi = contrib(i0)
                    for c in range(1, G):
                        nr, ni = contrib(i0 + c)
                        pr, pi = pr + nr, pi + ni
                    outr_ref[:] += pr
                    outi_ref[:] += pi
                    return 0

                def loop():
                    jax.lax.fori_loop(0, na // G, body, 0)
                    for i in range((na // G) * G, na):
                        pr, pi = contrib(i)
                        outr_ref[:] += pr
                        outi_ref[:] += pi
            else:
                # interleaved compute/store (see banded branch note)
                def body(i, _):
                    ki = k_ref[pl.ds(i, 1), :]
                    onehot = rows == ki
                    outr_ref[:] += jnp.where(onehot,
                                             vr_ref[pl.ds(i, 1), :], 0.0)
                    outi_ref[:] += jnp.where(onehot,
                                             vi_ref[pl.ds(i, 1), :], 0.0)
                    return 0

                loop = lambda: jax.lax.fori_loop(0, na, body, 0)
            if skip == "tile":
                @pl.when(jnp.max(k_ref[:]) >= 0)
                def _():
                    loop()
            else:
                loop()

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "flipud", "transform",
                                             "nf", "plan", "gamma_f",
                                             "interpret", "phase_in"))
def _reassign_pallas_2d(wr, wi, dr, di, const_arr, Sfs, *, mode, flipud,
                        transform, nf, plan, gamma_f, interpret,
                        phase_in=False):
    """wr/wi/dr/di: (na, n) real planes; returns (Txr, Txi) (nf, n).
    phase_in: dr is the PRECOMPUTED w plane (di unused) — 3 input
    planes instead of 4."""
    na, n = wr.shape
    rdtype = wr.dtype

    import os
    TILE = int(os.environ.get("SSQ_TPU_REASSIGN_TILE", "512"))
    grid_n = -(-n // TILE)
    # inputs stay UNPADDED: the kernel masks the ragged last tile by
    # column index (saves 4 full-array pad copies); in interpret mode
    # (CPU tests) Pallas requires divisible shapes, so pad there.
    pad = grid_n * TILE - n if interpret else 0
    planes = (wr, wi, dr) if phase_in else (wr, wi, dr, di)
    if pad:
        planes = tuple(jnp.pad(z, ((0, 0), (0, pad))) for z in planes)

    constb = jnp.broadcast_to(const_arr.astype(rdtype)[:, None], (na, 1))
    sfsb = jnp.broadcast_to(Sfs.astype(rdtype)[:, None], (na, 1))

    params = dict(plan)
    kernel = _make_kernel(mode, params, gamma_f, flipud, transform, nf, na,
                          TILE, n_valid=n, skip=_skip_mode(),
                          phase_in=phase_in)

    grid = (grid_n,)
    bspec_in = pl.BlockSpec((na, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    bspec_col = pl.BlockSpec((na, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    bspec_out = pl.BlockSpec((nf, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)

    outr, outi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec_in] * len(planes) + [bspec_col, bspec_col],
        out_specs=(bspec_out, bspec_out),
        out_shape=(jax.ShapeDtypeStruct((nf, n + pad), rdtype),
                   jax.ShapeDtypeStruct((nf, n + pad), rdtype)),
        scratch_shapes=[pltpu.VMEM((na, TILE), jnp.int32),
                        pltpu.VMEM((na, TILE), rdtype),
                        pltpu.VMEM((na, TILE), rdtype)],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))),
    )(*planes, constb, sfsb)

    return outr[:, :n], outi[:, :n]


def _make_bwd_kernel(mode, params, gamma, flipud, transform, nf, na, tile,
                     n_valid, phase_in=False):
    """Backward: gw[i, j] = const[i] * g[k(i, j), j] for unmasked
    entries — a data-dependent GATHER, mirrored from the forward's
    one-hot scatter (bins recomputed; residuals stay small).
    phase_in: k recomputed from the single precomputed w plane (the
    Wx planes are not even read)."""
    def kernel(*refs):
        if phase_in:
            (w_ref, const_ref, sfs_ref, gr_ref, gi_ref,
             gwr_ref, gwi_ref, k_ref) = refs
            k, _ = _bin_indices(mode, params, gamma, flipud, transform,
                                nf, tile, n_valid, None, None, None, None,
                                sfs_ref[:], w_pre=w_ref[:])
        else:
            (wr_ref, wi_ref, dr_ref, di_ref, const_ref, sfs_ref,
             gr_ref, gi_ref, gwr_ref, gwi_ref, k_ref) = refs
            k, _ = _bin_indices(mode, params, gamma, flipud, transform, nf,
                                tile, n_valid, wr_ref[:], wi_ref[:],
                                dr_ref[:], di_ref[:], sfs_ref[:])
        k_ref[:] = k
        rows = jax.lax.broadcasted_iota(jnp.int32, (nf, tile), 0)
        GR = gr_ref[:]
        GI = gi_ref[:]

        def body(i, _):
            ki = k_ref[pl.ds(i, 1), :]            # (1, T); -1 if masked
            onehot = rows == ki                   # (nf, T)
            gwr_ref[pl.ds(i, 1), :] = jnp.sum(
                jnp.where(onehot, GR, 0.0), axis=0, keepdims=True)
            gwi_ref[pl.ds(i, 1), :] = jnp.sum(
                jnp.where(onehot, GI, 0.0), axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(0, na, body, 0)
        cb = const_ref[:]
        gwr_ref[:] = gwr_ref[:] * cb
        gwi_ref[:] = gwi_ref[:] * cb

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "flipud", "transform",
                                             "nf", "plan", "gamma_f",
                                             "interpret", "phase_in"))
def _reassign_bwd_2d(wr, wi, dr, di, const_arr, Sfs, gr, gi, *, mode,
                     flipud, transform, nf, plan, gamma_f, interpret,
                     phase_in=False):
    """VJP planes: (gwr, gwi) (na, n) from cotangents (gr, gi) (nf, n).
    phase_in: dr is the precomputed w plane; wr/wi/di are not read."""
    na, n = (dr if phase_in else wr).shape
    rdtype = (dr if phase_in else wr).dtype

    import os
    TILE = int(os.environ.get("SSQ_TPU_REASSIGN_TILE", "512"))
    grid_n = -(-n // TILE)
    pad = grid_n * TILE - n if interpret else 0
    planes = (dr,) if phase_in else (wr, wi, dr, di)
    if pad:
        planes = tuple(jnp.pad(z, ((0, 0), (0, pad))) for z in planes)
        gr, gi = (jnp.pad(z, ((0, 0), (0, pad))) for z in (gr, gi))

    constb = jnp.broadcast_to(const_arr.astype(rdtype)[:, None], (na, 1))
    sfsb = jnp.broadcast_to(Sfs.astype(rdtype)[:, None], (na, 1))

    kernel = _make_bwd_kernel(mode, dict(plan), gamma_f, flipud, transform,
                              nf, na, TILE, n_valid=n, phase_in=phase_in)
    bspec_in = pl.BlockSpec((na, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    bspec_col = pl.BlockSpec((na, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    bspec_g = pl.BlockSpec((nf, TILE), lambda i: (0, i),
                           memory_space=pltpu.VMEM)

    gwr, gwi = pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=[bspec_in] * len(planes) + [bspec_col, bspec_col,
                                             bspec_g, bspec_g],
        out_specs=(bspec_in, bspec_in),
        out_shape=(jax.ShapeDtypeStruct((na, n + pad), rdtype),
                   jax.ShapeDtypeStruct((na, n + pad), rdtype)),
        scratch_shapes=[pltpu.VMEM((na, TILE), jnp.int32)],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))),
    )(*planes, constb, sfsb, gr, gi)
    return gwr[:, :n], gwi[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _reassign_with_vjp(static, wr, wi, dr, di, const_arr, Sfs):
    """Differentiable fused reassignment (2D planes).

    Gradient semantics match JAX autodiff of the XLA scatter fallback:
    the bin index k is piecewise-constant in the inputs (round/where
    have zero derivative), so cotangents flow only through the
    accumulated VALUES: dL/dWx[i,j] = const[i] * gTx[k(i,j), j], and
    dWx receives zero (it only shapes k). The backward is the mirrored
    Pallas gather kernel — fast path differentiable end-to-end.

    `static[7]` selects the forward implementation: 'vpu' (one-hot row
    loop) or 'mxu' (digit-split matmul accumulation); both produce the
    same binning decisions, so the shared backward applies to either.
    `static[9]` (phase_in, r4): dr is the PRECOMPUTED w plane from the
    cwt kernel's fused phase epilogue and di is an unused placeholder —
    the kernel reads 3 planes instead of 4."""
    (mode, flipud, transform, nf, plan, gamma_f, interpret, impl,
     splits) = static[:9]
    phase_in = bool(static[9]) if len(static) > 9 else False
    if impl == "mxu" and wr.dtype == jnp.float32 and not phase_in:
        return _reassign_mxu_2d(wr, wi, dr, di, const_arr, Sfs, mode=mode,
                                flipud=flipud, transform=transform, nf=nf,
                                plan=plan, gamma_f=gamma_f,
                                interpret=interpret, splits=splits)
    return _reassign_pallas_2d(wr, wi, dr, di, const_arr, Sfs, mode=mode,
                               flipud=flipud, transform=transform, nf=nf,
                               plan=plan, gamma_f=gamma_f,
                               interpret=interpret, phase_in=phase_in)


def _reassign_fwd(static, wr, wi, dr, di, const_arr, Sfs):
    out = _reassign_with_vjp(static, wr, wi, dr, di, const_arr, Sfs)
    return out, (wr, wi, dr, di, const_arr, Sfs)


def _reassign_bwd(static, res, g):
    mode, flipud, transform, nf, plan, gamma_f, interpret = static[:7]
    phase_in = bool(static[9]) if len(static) > 9 else False
    wr, wi, dr, di, const_arr, Sfs = res
    gr, gi = g
    gwr, gwi = _reassign_bwd_2d(wr, wi, dr, di, const_arr, Sfs,
                                gr.astype(wr.dtype), gi.astype(wr.dtype),
                                mode=mode, flipud=flipud,
                                transform=transform, nf=nf, plan=plan,
                                gamma_f=gamma_f, interpret=interpret,
                                phase_in=phase_in)
    zeros = jnp.zeros_like
    return (gwr, gwi, zeros(dr), zeros(di), zeros(const_arr), zeros(Sfs))


_reassign_with_vjp.defvjp(_reassign_fwd, _reassign_bwd)


# -- MXU digit-split variant --------------------------------------------------
# The one-hot row loop above is VPU-bound: 5 ops x na x nf x T per tile
# (~22 ms at (293, 293, 160k) — the measured floor across 6 scheduling
# variants). This variant moves the accumulation to the MXU by splitting
# the bin index into digits k = 16*khi + klo (khi < F1 = ceil(nf/16),
# klo < 16) and using the product-of-indicators identity
#
#   Tx[16*f1+f0, j] = sum_i [khi[i,j]==f1] * (v[i,j] * [klo[i,j]==f0])
#
# Per 8-column group g the right factor forms B (na, 16*8 = 128 lanes,
# lane = 8*0.. j-major l = j*16+f0) and the left factor forms
# A (F1*8 rows, na) with row r = 8*f1 + jg; D = A @ B computes ALL
# (f1, jg) x (f0, j') pairs and the jg == j' diagonal is extracted by a
# constant mask + a second tiny matmul (P8 @ (D .* M8)). The 8x
# cross-term MAC waste is the price of lane-aligned operands; the MXU
# has orders of magnitude of headroom over the VPU loop. v is bf16x3
# split (Mosaic dots are DEFAULT-precision only); A and the masks are
# EXACT in bf16 (0/1). Deterministic: pure matmul accumulation.
#
# Output rows leave the kernel DIGIT-ORDERED as (f1, l%16-interleaved):
# out[f1, j*16 + f0] — a (F1, 16n) plane per part; the host-side
# wrapper undoes the interleave with one XLA reshape+transpose pass
# (cheap, fuses with the complexify). Gated behind
# SSQ_TPU_REASSIGN_IMPL=mxu until measured on-chip.

def _mxu_consts(F1: int, G: int = 8):
    """Host constants: the jg==j' diagonal mask M8 (F1*G, 16*G) and the
    row-group sum matrix P8 (F1, F1*G)."""
    M = F1 * G
    r = np.arange(M)[:, None]
    l = np.arange(16 * G)[None, :]
    M8 = ((r % G) == (l // 16)).astype(np.float32)
    P8 = (np.arange(F1)[:, None] == (np.arange(M)[None, :] // G)).astype(
        np.float32)
    return M8, P8


def _make_mxu_kernel(mode, params, gamma, flipud, transform, nf, na, tile,
                     n_valid, splits: int):
    F1 = -(-nf // 16)
    G = 8
    NG = tile // G
    Mrows = F1 * G

    def kernel(wr_ref, wi_ref, dr_ref, di_ref, const_ref, sfs_ref,
               m8_ref, p8_ref, outr_ref, outi_ref,
               kht_ref, klr_ref, vrr_ref, vir_ref):
        C = wr_ref[:]
        D = wi_ref[:]
        k, mask = _bin_indices(mode, params, gamma, flipud, transform, nf,
                               tile, n_valid, C, D, dr_ref[:], di_ref[:],
                               sfs_ref[:])
        cb = const_ref[:]
        vr = jnp.where(mask, C * cb, 0.0)
        vi = jnp.where(mask, D * cb, 0.0)
        khi = k >> 4                      # -1 stays -1: matches no f1
        klo = k & 15

        # staged tile-wide operands:
        #   kht: transposed high digits (tile, na) — A-side source
        #   klr/vrr/vir: lane-replicated (x16, j-major) low digits and
        #   values — B-side sources, 128-lane-sliceable per group
        kht_ref[:] = khi.T
        rep = lambda z: jnp.repeat(z, 16, axis=1)
        klr_ref[:] = rep(klo)
        vrr_ref[:] = rep(vr)
        vir_ref[:] = rep(vi)

        f1_of_row = jax.lax.broadcasted_iota(jnp.int32, (Mrows, na), 0) // G
        f0_of_lane = jax.lax.broadcasted_iota(jnp.int32, (na, 16 * G),
                                              1) % 16
        M8 = m8_ref[:]
        P8 = p8_ref[:]

        def split3(x):
            h = x.astype(jnp.bfloat16)
            r1 = x - h.astype(jnp.float32)
            m = r1.astype(jnp.bfloat16)
            if splits == 2:
                return (h, m)
            r2 = r1 - m.astype(jnp.float32)
            return (h, m, r2.astype(jnp.bfloat16))

        def body(g, _):
            kh_g = kht_ref[pl.ds(g * G, G), :]            # (G, na)
            A = (jnp.tile(kh_g, (F1, 1)) == f1_of_row).astype(jnp.bfloat16)
            kl_g = klr_ref[:, pl.ds(g * 128, 128)]        # (na, 128)
            sel = kl_g == f0_of_lane
            Br = jnp.where(sel, vrr_ref[:, pl.ds(g * 128, 128)], 0.0)
            Bi = jnp.where(sel, vir_ref[:, pl.ds(g * 128, 128)], 0.0)
            B = jnp.concatenate(split3(Br) + split3(Bi), axis=1)
            D6 = jnp.dot(A, B, preferred_element_type=jnp.float32)
            half = splits * 128
            Dr = sum(D6[:, s * 128:(s + 1) * 128] for s in range(splits))
            Di = sum(D6[:, half + s * 128:half + (s + 1) * 128]
                     for s in range(splits))
            # diagonal extraction + row-group sum on the MXU. P8/M8
            # are exact in bf16, but Dr/Di are f32 accumulations — a
            # single DEFAULT-precision dot would bf16-quantize them
            # (~3e-3); split the data operand like every other kernel
            Sr = sum(jnp.dot(P8, part * M8,
                             preferred_element_type=jnp.float32)
                     for part in split3(Dr))
            Si = sum(jnp.dot(P8, part * M8,
                             preferred_element_type=jnp.float32)
                     for part in split3(Di))
            outr_ref[:, pl.ds(g * 128, 128)] = Sr
            outi_ref[:, pl.ds(g * 128, 128)] = Si
            return 0

        jax.lax.fori_loop(0, NG, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "flipud", "transform",
                                             "nf", "plan", "gamma_f",
                                             "interpret", "splits"))
def _reassign_mxu_2d(wr, wi, dr, di, const_arr, Sfs, *, mode, flipud,
                     transform, nf, plan, gamma_f, interpret, splits=3):
    """MXU digit-split forward; same contract as _reassign_pallas_2d."""
    na, n = wr.shape
    rdtype = wr.dtype
    import os
    TILE = int(os.environ.get("SSQ_TPU_REASSIGN_TILE", "512"))
    grid_n = -(-n // TILE)
    pad = grid_n * TILE - n if interpret else 0
    if pad:
        wr, wi, dr, di = (jnp.pad(z, ((0, 0), (0, pad)))
                          for z in (wr, wi, dr, di))

    F1 = -(-nf // 16)
    constb = jnp.broadcast_to(const_arr.astype(rdtype)[:, None], (na, 1))
    sfsb = jnp.broadcast_to(Sfs.astype(rdtype)[:, None], (na, 1))
    M8_np, P8_np = _mxu_consts(F1)

    kernel = _make_mxu_kernel(mode, dict(plan), gamma_f, flipud, transform,
                              nf, na, TILE, n_valid=n, splits=splits)
    bspec_in = pl.BlockSpec((na, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    bspec_col = pl.BlockSpec((na, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    bspec_c2 = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    bspec_out = pl.BlockSpec((F1, 16 * TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)

    outr, outi = pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=[bspec_in, bspec_in, bspec_in, bspec_in, bspec_col,
                  bspec_col, bspec_c2(M8_np), bspec_c2(P8_np)],
        out_specs=(bspec_out, bspec_out),
        out_shape=(jax.ShapeDtypeStruct((F1, 16 * (n + pad)), rdtype),
                   jax.ShapeDtypeStruct((F1, 16 * (n + pad)), rdtype)),
        scratch_shapes=[pltpu.VMEM((TILE, na), jnp.int32),
                        pltpu.VMEM((na, 16 * TILE), jnp.int32),
                        pltpu.VMEM((na, 16 * TILE), rdtype),
                        pltpu.VMEM((na, 16 * TILE), rdtype)],
        interpret=interpret,
        **({} if interpret else dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))),
    )(wr, wi, dr, di, constb, sfsb, jnp.asarray(M8_np), jnp.asarray(P8_np))

    # un-interleave the digit-ordered output: out[f1, j*16 + f0] ->
    # Tx[16*f1 + f0, j] (one XLA pass; fuses with the complexify)
    def fix(o):
        o = o.reshape(F1, n + pad, 16)
        o = jnp.moveaxis(o, -1, 1).reshape(F1 * 16, n + pad)
        return o[:nf, :n]

    return fix(outr), fix(outi)


def _planes(z, rdtype):
    if isinstance(z, tuple):
        return z[0].astype(rdtype), z[1].astype(rdtype)
    return z.real.astype(rdtype), z.imag.astype(rdtype)


def reassign_pallas(Wx, dWx, const_arr, gamma, Sfs, plan_params, *, mode,
                    flipud, transform, nf, interpret=None, w_plane=None,
                    n_out=None):
    """Fused reassignment via the Pallas kernel.

    Wx/dWx: (..., na, n) complex arrays OR (real, imag) plane tuples —
    the planar CWT path feeds planes directly, skipping the
    complexify/split round-trip. Returns complex Tx (..., nf, n).

    `w_plane` (r4): phase transform PRECOMPUTED by the cwt kernel's
    fused epilogue (fft_pallas phase_gamma mode; +inf where
    gamma-masked) — dWx is ignored (pass None) and the kernel reads 3
    planes instead of 4, saving one full HBM plane read.

    `n_out` (r5): slice Tx to its first n_out columns, fused into the
    output complexify (free). Used with keep_align'd planes: inputs
    carry tile-alignment slack columns so the kernel skips its
    ragged-tile mask, and the scatter being column-local means the
    slack can only ever land in the sliced-off columns.

    `plan_params`: dict of host floats (vlmin/dvl/... per `mode`).
    Falls back to interpreter mode off-TPU (CPU tests).
    """
    if interpret is None:
        interpret = interpret_mode()
    plan = tuple(sorted((k, float(v)) for k, v in plan_params.items()))
    import os
    impl = os.environ.get("SSQ_TPU_REASSIGN_IMPL", "vpu")
    splits = int(os.environ.get("SSQ_TPU_REASSIGN_SPLITS", "3"))
    if splits not in (2, 3):
        raise ValueError("SSQ_TPU_REASSIGN_SPLITS must be 2 or 3 "
                         f"(got {splits}) — other values silently "
                         "mis-partition the stacked dot output")

    planar_in = isinstance(Wx, tuple)
    cdtype = (Wx[0] if planar_in else Wx).dtype
    rdtype = (jnp.float64 if cdtype in (jnp.complex128, jnp.float64)
              else jnp.float32)
    wr, wi = _planes(Wx, rdtype)
    phase_in = w_plane is not None
    if phase_in:
        dr = w_plane.astype(rdtype)
        di = dr                    # placeholder, never read (phase_in)
    else:
        dr, di = _planes(dWx, rdtype)
    out_cdtype = (jnp.complex128 if rdtype == jnp.float64 else jnp.complex64)

    batch_shape = wr.shape[:-2]
    na, n = wr.shape[-2:]
    wr, wi, dr, di = (z.reshape((-1, na, n)) for z in (wr, wi, dr, di))

    static = (mode, flipud, transform, nf, plan, float(gamma), interpret,
              impl, splits, phase_in)
    f = functools.partial(_reassign_with_vjp, static)
    if wr.shape[0] == 1:
        txr, txi = f(wr[0], wi[0], dr[0], di[0], const_arr, Sfs)
        txr, txi = txr[None], txi[None]
    else:
        txr, txi = jax.vmap(
            lambda a, b, c, d: f(a, b, c, d, const_arr, Sfs))(wr, wi, dr, di)
    if n_out is not None and n_out != n:
        txr, txi = txr[..., :n_out], txi[..., :n_out]
        n = n_out
    Tx = jax.lax.complex(txr, txi).astype(out_cdtype)
    return Tx.reshape(batch_shape + (nf, n))
