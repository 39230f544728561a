"""Decompose the cwt+deriv fused kernel's ~13.4 ms (160k headline).

Four variants of the REAL kernel body at the production config
(M=2^18, M1=M2=512, na=293, L=160000, derivative pipelines, untiled),
all with the production BlockSpecs and output pattern:

  dma    : no compute — per-step sequencing + output DMA floor
  glue   : full VPU chain (Z build, concats, bf16 splits, twiddle,
           epilogue transpose) but NO MXU dots (stage outputs faked
           from the splits with 2 cheap ops)
  dots4  : full glue + 1-dot _dot3 stages (4 dots/row instead of 12 —
           the bf16x1 kernel, numerically wrong but structurally real)
  full   : the production body (12 dots/row)

glue - dma = VPU cost; dots4 - glue = 4-dot cost; full - dots4 = the
8 extra bf16x3 dots. Run: python tools/cwt_kernel_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssqueeze_rs_tpu.ops.fft_pallas import (_fused_consts, _split_bf16,
                                            _dot3, _dot3_r)

NA, K1, M2 = 293, 256, 512
M1, M = 2 * K1, 2 * K1 * M2
L = 160000
START = (M - L) // 2


def timed(fn, args, K=8, reps=3, tag=""):
    out = fn(*args, 0)
    _ = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag:8s} {best*1e3:8.3f} ms", flush=True)
    return best


def make_kernel(mode, R, off):
    def fake_stage(x, ncols):
        h, l = _split_bf16(x)
        return (h[:, :ncols].astype(jnp.float32)
                + l[:, :ncols].astype(jnp.float32))

    def pipeline(zr, zi, w1h, w1l, Tr, Ti, w2h, w2l):
        X = jnp.concatenate([zr, zi], axis=0)
        if mode == "glue":
            B1 = jnp.concatenate([fake_stage(X, M2), fake_stage(X, M2)],
                                 axis=0)
        elif mode == "dots4":
            xh, _ = _split_bf16(X)
            B1 = jnp.dot(w1h, xh, preferred_element_type=jnp.float32)
        else:
            B1 = _dot3(w1h, w1l, X)
        Br, Bi = B1[:M1], B1[M1:]
        C2 = jnp.concatenate([Br * Tr - Bi * Ti, Br * Ti + Bi * Tr],
                             axis=-1)
        if mode == "glue":
            OUT = fake_stage(C2, 2 * R)
        elif mode == "dots4":
            ch, _ = _split_bf16(C2)
            OUT = jnp.dot(ch, w2h, preferred_element_type=jnp.float32)
        else:
            OUT = _dot3_r(C2, w2h, w2l)
        return OUT.T.reshape(2, R * M1)[:, off:off + L]

    def kernel(pw_ref, xr_ref, xi_ref, xig_ref, w1h_ref, w1l_ref, tr_ref,
               ti_ref, w2h_ref, w2l_ref, alt_ref, owr_ref, owi_ref,
               odr_ref, odi_ref):
        alt = alt_ref[0]
        if mode == "dma":
            p = pw_ref[0][0, 0]
            owr_ref[0, 0] = alt * p
            owi_ref[0, 0] = alt * p
            odr_ref[0, 0] = alt * p
            odi_ref[0, 0] = alt * p
            return
        p = pw_ref[0]
        zr = p * xr_ref[0]
        zi = p * xi_ref[0]
        args = (w1h_ref[:], w1l_ref[:], tr_ref[:], ti_ref[:],
                w2h_ref[:], w2l_ref[:])
        OW = pipeline(zr, zi, *args)
        owr_ref[0, 0] = OW[0]
        owi_ref[0, 0] = OW[1]
        s = xig_ref[:]
        OD = pipeline(-zi * s, zr * s, *args)
        odr_ref[0, 0] = OD[0]
        odi_ref[0, 0] = OD[1]
    return kernel


def build(mode):
    r0 = START // M1
    r1 = -(-(START + L) // M1)
    R = r1 - r0
    off = START - r0 * M1
    (W1h, W1l), Tr, Ti, (W2h, W2l), alt = _fused_consts(M, r0, r1, 1)
    alt_keep = np.asarray(alt[START:START + L][None, :])

    kernel = make_kernel(mode, R, off)
    row3 = lambda i: (i, 0, 0)
    const2 = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    out3 = lambda: pl.BlockSpec((1, 1, L), row3, memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(NA,),
        in_specs=[
            pl.BlockSpec((1, K1, M2), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1, M2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K1, M2), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, M2), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W1h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W1h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((M1, M2), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((M1, M2), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W2h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(W2h.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(out3(), out3(), out3(), out3()),
        out_shape=tuple(jax.ShapeDtypeStruct((NA, 1, L), jnp.float32)
                        for _ in range(4)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )

    @jax.jit
    def wrapped(Pw, xr, xi, xig, i):
        Pw = Pw + jnp.asarray(i, jnp.float32) * 0
        outs = f(Pw, xr, xi, xig, jnp.asarray(W1h), jnp.asarray(W1l),
                 jnp.asarray(Tr), jnp.asarray(Ti), jnp.asarray(W2h),
                 jnp.asarray(W2l), jnp.asarray(alt_keep))
        return sum(jnp.sum(o) for o in outs)

    return wrapped


def main():
    print(f"device {jax.devices()}", flush=True)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        Pw = jax.random.normal(ks[0], (NA, K1, M2), jnp.float32)
        xr = jax.random.normal(ks[1], (1, K1, M2), jnp.float32)
        xi = jax.random.normal(ks[2], (1, K1, M2), jnp.float32)
        xig = jax.random.normal(ks[3], (K1, M2), jnp.float32)
        return Pw, xr, xi, xig

    args = jax.block_until_ready(gen(jax.random.PRNGKey(0)))
    for mode in ("dma", "glue", "dots4", "full"):
        try:
            timed(build(mode), args, tag=mode)
        except Exception as e:
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
