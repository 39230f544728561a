"""On-chip decomposition of the 160k ssq_cwt budget (round 3).

Times each pipeline slice as its own jit program, K back-to-back
(relay-safe scalar-fetch timing, same scheme as bench.py):

  p_null     : trivial program               -> pure dispatch overhead
  p_front    : pad + rfft + psih sampling    -> front-end glue
  p_cwt      : front + cwt-fused kernel      -> + kernel (planes reduced)
  p_reassign : reassign kernel alone         -> planes passed as args
  p_full     : full ssq_cwt (bench program)

Run:  python tools/profile_ssq.py [N] [n_rows] [--batch B]

--batch B (r5, VERDICT r4 #3): run the same decomposition on a (B, N)
batch — per-transform times printed alongside — to locate where
batch-8 ssq_cwt loses its ~2 ms dispatch amortization (38.0 vs 35.3
ms/transform in BENCH_TABLE r4): the cwt kernel's b>1 window maps, the
vmapped reassignment grid, or the glue.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, args, K=8, reps=3, tag="", per=1):
    out = fn(*args, 0)
    _ = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    extra = f"  ({best*1e3/per:8.2f} ms/transform)" if per > 1 else ""
    print(f"{tag:12s} {best*1e3:8.2f} ms{extra}", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_cwt, Wavelet
    from ssqueeze_rs_tpu.scales import process_scales
    from ssqueeze_rs_tpu.utils.pad import padsignal, p2up

    argv = sys.argv[1:]
    B = 1
    if "--batch" in argv:
        bi = argv.index("--batch")
        B = int(argv[bi + 1])
        argv = argv[:bi] + argv[bi + 2:]   # drop the flag AND its value
    args_pos = [a for a in argv if not a.startswith("--")]
    N = int(args_pos[0]) if len(args_pos) > 0 else 160000
    n_rows = int(args_pos[1]) if len(args_pos) > 1 else 300
    # generate on device (a (B, N) f32 upload can exceed the relay's
    # comfortable transfer size at B >= 8)
    x = jax.jit(lambda k: jax.random.normal(
        k, ((B, N) if B > 1 else (N,)), jnp.float32))(jax.random.PRNGKey(0))
    x = jax.block_until_ready(x)

    wavelet = Wavelet.build("gmw")
    scales = process_scales("log-piecewise", N, wavelet)[:n_rows]
    sc_np = np.asarray(scales).squeeze(-1)
    na = len(sc_np)
    print(f"na={na} N={N}", flush=True)

    # -- p_null: dispatch overhead
    @jax.jit
    def null_fn(x, i):
        return jnp.sum(x[..., :8]) + i

    timed(null_fn, (x,), K=16, tag="p_null")

    # -- p_front: pad + rfft + psih sample (no kernels)
    from ssqueeze_rs_tpu.ops.cwt import _xi_grid_np

    @jax.jit
    def front_fn(x, i):
        xp, _, n1, _ = padsignal(x + i * 1e-12, "reflect", get_params=True)
        M = xp.shape[-1]
        xh = jnp.fft.rfft(xp)
        xig = _xi_grid_np(M)
        sc = jnp.asarray(sc_np)
        Pw = wavelet.psih(sc[:, None, None] * jnp.asarray(xig)[None], jnp)
        return jnp.sum(Pw) + jnp.sum(jnp.abs(xh))

    timed(front_fn, (x,), K=16, tag="p_front", per=B)

    # -- p_cwt: front + fused cwt kernel, reduce planes (no reassign)
    from ssqueeze_rs_tpu.ops.cwt import cwt_core

    @jax.jit
    def cwt_fn(x, i):
        xx = x + i * 1e-12
        xp, _, n1, _ = padsignal(xx, "reflect", get_params=True)
        (wr, wi), (dr, di) = cwt_core(
            xp, jnp.asarray(sc_np, jnp.float32), jnp.asarray(1.0),
            wavelet=wavelet, derivative=True, l1_norm=True, N=N, n1=n1,
            rpadded=False, planar_out=True, engines=(True, True))
        return (jnp.sum(wr) + jnp.sum(wi) + jnp.sum(dr) + jnp.sum(di))

    timed(cwt_fn, (x,), K=16, tag="p_cwt", per=B)

    # -- precompute planes on device for reassign-alone timing
    xp, _, n1, _ = padsignal(x, "reflect", get_params=True)
    planes = jax.jit(lambda xp: cwt_core(
        xp, jnp.asarray(sc_np, jnp.float32), jnp.asarray(1.0),
        wavelet=wavelet, derivative=True, l1_norm=True, N=N, n1=n1,
        rpadded=False, planar_out=True, engines=(True, True)))(xp)
    (wr, wi), (dr, di) = planes
    wr, wi, dr, di = (jnp.asarray(z) for z in (wr, wi, dr, di))

    # reassignment plan (mirrors ssqueeze() internals for the bench config)
    from ssqueeze_rs_tpu.ops.ssqueeze import (
        plan_reassignment, compute_associated_frequencies)
    from ssqueeze_rs_tpu.config import EPS32
    ssq_freqs = compute_associated_frequencies(
        sc_np.reshape(-1, 1), N, wavelet, "log-piecewise", "peak", True,
        1.0, "cwt")
    const_arr, mode, params_host = plan_reassignment(
        ssq_freqs, na, True, transform="cwt", cwt_scaletype="log-piecewise",
        nv=32, scales=sc_np.reshape(-1, 1))
    gamma = float(10 * EPS32)
    print(f"mode={mode}", flush=True)

    from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas

    @jax.jit
    def reassign_fn(wr, wi, dr, di, i):
        Tx = reassign_pallas((wr + i * 1e-30, wi), (dr, di),
                             jnp.asarray(const_arr, jnp.float32), gamma,
                             jnp.zeros((na,), jnp.float32), params_host,
                             mode=mode, flipud=True, transform="cwt", nf=na)
        return jnp.sum(jnp.abs(Tx))

    timed(reassign_fn, (wr, wi, dr, di), K=16, tag="p_reassign",
          per=B)

    # -- reassign + abs-sum WITHOUT the complexify (planes reduced raw)
    from ssqueeze_rs_tpu.ops.reassign_pallas import (_reassign_with_vjp)
    plan = tuple(sorted((k, float(v)) for k, v in params_host.items()))
    static = (mode, True, "cwt", na, plan, gamma, False, "vpu", 3, False)

    @jax.jit
    def reassign_planes_fn(wr, wi, dr, di, i):
        ca = jnp.asarray(const_arr, jnp.float32)
        zf = jnp.zeros((na,), jnp.float32)
        if B > 1:
            txr, txi = jax.vmap(lambda a, b, c, d: _reassign_with_vjp(
                static, a, b, c, d, ca, zf))(wr + i * 1e-30, wi, dr, di)
        else:
            txr, txi = _reassign_with_vjp(static, wr + i * 1e-30, wi,
                                          dr, di, ca, zf)
        return jnp.sum(jnp.sqrt(txr * txr + txi * txi))

    timed(reassign_planes_fn, (wr, wi, dr, di), K=16,
          tag="p_reasg_pl", per=B)

    # -- p_full: the bench program
    @jax.jit
    def full_fn(x, i):
        Tx = ssq_cwt(x + i * 1e-12, wavelet, scales=scales, fs=1.0,
                     dtype="float32")[0]
        return jnp.sum(jnp.abs(Tx))

    timed(full_fn, (x,), K=16, tag="p_full", per=B)


if __name__ == "__main__":
    main()
