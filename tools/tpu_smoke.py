"""Real-TPU smoke suite: drives the main flows on the attached chip and
checks behavioral invariants with scalar fetches only (pytest forces the
CPU backend; this catches Mosaic/TPU-only issues).

Run from the repo root:  python tools/tpu_smoke.py
Exit code 0 = all checks passed. See .claude/skills/verify/SKILL.md for
the relay quirks this script is written around (scalar fetches, jit
everywhere, env A/B needs separate processes).
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import ssqueeze_rs_tpu as ssq

    print(f"backend: {jax.default_backend()} {jax.devices()[0]}")
    failures = []

    def check(name, ok, detail=""):
        print(f"  {'PASS' if ok else 'FAIL'}  {name}  {detail}")
        if not ok:
            failures.append(name)

    fs, N = 1000.0, 16384
    t = np.arange(N) / fs
    x = jnp.asarray(np.sin(2 * np.pi * 100.0 * t) +
                    0.5 * np.sin(2 * np.pi * 333.0 * t), jnp.float32)

    # 1. ssq_cwt energy lands at the right frequencies
    @jax.jit
    def ssq_peaks(x):
        Tx, Wx, fr, sc = ssq.ssq_cwt(x, "gmw", fs=fs, dtype="float32")
        mag = jnp.abs(Tx)[:, 200:-200]
        order = jnp.argsort(mag.sum(axis=1))[-6:]
        return jnp.asarray(fr)[order], jnp.sum(jnp.abs(Tx))

    fr6, tot = ssq_peaks(x)
    fr6 = np.sort(np.asarray(fr6))
    near = lambda f: bool(np.any(np.abs(fr6 - f) < 12))
    check("ssq_cwt peaks at 100/333 Hz", near(100) and near(333),
          f"top bins {np.round(fr6, 1)}")
    check("ssq_cwt finite energy", np.isfinite(float(tot)), f"{float(tot):.1f}")

    # 2. istft round trip (even & odd n_fft, matmul + FFT branches)
    @partial(jax.jit, static_argnames=("n_fft", "hop"))
    def rt(x, n_fft, hop):
        Sx = ssq.stft(x, window="hann", n_fft=n_fft, hop_len=hop,
                      dtype="float32")
        xr = ssq.istft(Sx, window="hann", n_fft=n_fft, hop_len=hop, N=N)
        return jnp.mean(jnp.abs(x - xr)) / jnp.sqrt(jnp.mean(x ** 2))

    for n_fft, hop in [(256, 64), (598, 1), (121, 3)]:
        e = float(rt(x, n_fft=n_fft, hop=hop))
        check(f"istft round trip n_fft={n_fft} hop={hop}", e < 1e-5,
              f"mad_rms={e:.2e}")

    # 3. icwt round trip through the fused kernel path
    @jax.jit
    def icwt_rt(x):
        Wx, sc = ssq.cwt(x, "gmw", scales="log", dtype="float32")
        xr = ssq.icwt(Wx, "gmw", scales="log", x_len=N)
        return jnp.mean(jnp.abs(x - xr)) / jnp.sqrt(jnp.mean(x ** 2))

    e = float(icwt_rt(x))
    check("icwt round trip (fused path)", e < 5e-3, f"mad_rms={e:.2e}")

    # 4. batched == single channel (Z-build route vs cwt-fused route)
    @jax.jit
    def batch_diff(x):
        xb = jnp.stack([x, 0.5 * x])
        Txb = ssq.ssq_cwt(xb, "gmw", fs=fs, dtype="float32")[0]
        Tx1 = ssq.ssq_cwt(x, "gmw", fs=fs, dtype="float32")[0]
        return (jnp.max(jnp.abs(Txb[0] - Tx1)) /
                jnp.max(jnp.abs(Tx1)))

    d = float(batch_diff(x))
    check("batched matches single channel", d < 5e-3, f"rel={d:.1e}")

    # 5. ssq_stft tracks a chirp
    from ssqueeze_rs_tpu.signals import TestSignals
    xc, _ = TestSignals(N).lchirp(N, fmin=0, fmax=400, tmax=N / fs)
    xc = jnp.asarray(xc, jnp.float32)

    @jax.jit
    def chirp_err(xc):
        Tx, Sx, fr, Sfs = ssq.ssq_stft(xc, n_fft=256, fs=fs,
                                       dtype="float32")
        mag = jnp.abs(Tx)
        cols = jnp.arange(200, N - 200, 50)
        f_peak = jnp.asarray(fr)[mag[:, cols].argmax(axis=0)]
        f_true = 400.0 * cols / N
        return jnp.median(jnp.abs(f_peak - f_true))

    e = float(chirp_err(xc))
    check("ssq_stft chirp tracking", e < 10.0, f"median |df|={e:.2f} Hz")

    # 6. shard_map + Pallas composition (1-device mesh on the chip)
    from ssqueeze_rs_tpu.parallel import make_mesh, chunked_stft
    mesh = make_mesh((1, 1), ("data", "time"))
    S = chunked_stft(x[None], mesh, n_fft=256)
    check("chunked_stft on-chip (shard_map+Pallas module)",
          S.shape == (1, 129, N) and np.isfinite(float(jnp.sum(jnp.abs(S)))),
          f"{S.shape}")

    # 6b. batched planar fused kernel (b > 1 grid) on hardware
    @jax.jit
    def batched_cwt_diff(x):
        xb = jnp.stack([x, 2.0 * x, -x, 0.25 * x])
        Wxb = ssq.cwt(xb, "gmw", scales="log", dtype="float32")[0]
        Wx1 = ssq.cwt(x, "gmw", scales="log", dtype="float32")[0]
        return (jnp.max(jnp.abs(Wxb[0] - Wx1)) /
                jnp.max(jnp.abs(Wx1)))

    d = float(batched_cwt_diff(x))
    check("batched fused cwt kernel (b=4 grid)", d < 1e-4, f"rel={d:.1e}")

    # 6c. jax.grad through the Pallas fast path compiles + runs on chip
    @jax.jit
    def ssq_grad_norm(x):
        def loss(x):
            Tx, Wx, *_ = ssq.ssq_cwt(x, "gmw", fs=fs, dtype="float32")
            return jnp.sum(jnp.abs(Tx) ** 2)
        g = jax.grad(loss)(x)
        return jnp.sqrt(jnp.sum(g * g))

    gn = float(ssq_grad_norm(x))
    check("grad through fused kernels on-chip", np.isfinite(gn) and gn > 0,
          f"|g|={gn:.3e}")

    # 6e. banded-reassign clamp geometry on hardware (ADVICE r4 high):
    # nf = 293 (% 8 != 0) with every unmasked element binned just BELOW
    # the static strip, so the dynamic band start hits its clamp bound
    # (pre-fix this bound was misaligned -> pl.multiple_of asserted a
    # falsehood -> UB only visible on chip, never in interpret mode).
    # Pallas banded output must match the jnp scatter oracle.
    from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas
    from ssqueeze_rs_tpu.ops.ssqueeze import reassign as reassign_jnp
    na_b, n_b = 293, 4096
    kb = np.full((na_b, n_b), 250.0, np.float32)     # near strip sk=256
    kb[:40] = 270.0                                  # some strip rows
    wr_b = np.ones((na_b, n_b), np.float32)
    wr_b[48:56] = 0.0                                # masked (mag < gamma)
    dib = 2 * np.pi * kb                             # ratio == target bin
    params_b = dict(vmin=0.0, dv=1.0)
    cb = jnp.asarray(np.full(na_b, 1.0, np.float32))
    sfs_b = jnp.zeros((na_b,), jnp.float32)

    @jax.jit
    def band_clamp_diff(wr, di):
        Wx = jax.lax.complex(wr, jnp.zeros_like(wr))
        dWx = jax.lax.complex(jnp.zeros_like(di), di)
        tx_p = reassign_pallas(Wx, dWx, cb, 1e-6, sfs_b, params_b,
                               mode="lin", flipud=False, transform="cwt",
                               nf=na_b)
        pj = {k: jnp.asarray(v) for k, v in params_b.items()}
        tx_o = reassign_jnp(Wx, dWx, cb, jnp.float32(1e-6), sfs_b, pj,
                            mode="lin", flipud=False, fused=True,
                            transform="cwt", nf=na_b)
        num = jnp.sum(jnp.abs(tx_p - tx_o))
        den = jnp.sum(jnp.abs(tx_o))
        return num / den, den

    rel_b, den_b = (float(v) for v in
                    band_clamp_diff(jnp.asarray(wr_b), jnp.asarray(dib)))
    check("banded clamp geometry vs oracle (nf%8!=0)",
          rel_b < 1e-6 and den_b > 0, f"rel={rel_b:.1e}")

    # 6f. grouped-accumulate scatter on hardware (r5): G rows' one-hot
    # contributions summed in vregs, one output += per group — the
    # association change is ulp-level vs the jnp oracle but the Mosaic
    # lowering of the grouped fused tree only exists on chip. Trace-time
    # env flag: set + clear_caches forces a retrace in-process.
    gprev = os.environ.get("SSQ_TPU_REASSIGN_GROUP")
    os.environ["SSQ_TPU_REASSIGN_GROUP"] = "8"
    jax.clear_caches()
    try:
        rel_g, den_g = (float(v) for v in
                        band_clamp_diff(jnp.asarray(wr_b), jnp.asarray(dib)))
        check("grouped accumulate (G=8, banded branch) vs oracle",
              rel_g < 1e-6 and den_g > 0, f"rel={rel_g:.1e}")
        # scattered targets -> zero-out-of-band test fails -> the
        # grouped FULL loop (the noise path the flag is aimed at)
        rng_g = np.random.default_rng(5)
        kb_f = rng_g.uniform(0, na_b - 1, (na_b, n_b)).astype(np.float32)
        rel_f, den_f = (float(v) for v in band_clamp_diff(
            jnp.asarray(wr_b), jnp.asarray(2 * np.pi * kb_f)))
        check("grouped accumulate (G=8, full loop) vs oracle",
              rel_f < 1e-6 and den_f > 0, f"rel={rel_f:.1e}")
    finally:
        if gprev is None:
            os.environ.pop("SSQ_TPU_REASSIGN_GROUP", None)
        else:
            os.environ["SSQ_TPU_REASSIGN_GROUP"] = gprev
        jax.clear_caches()

    # 6d. exact hybrid chunked ssq_cwt on the 1-device mesh (all_gather +
    # all_to_all lowering on hardware)
    from ssqueeze_rs_tpu.parallel import chunked_ssq_cwt
    Txc, Wxc, frc, scc = chunked_ssq_cwt(x[None], mesh, wavelet="gmw",
                                         scales="log", fs=fs,
                                         dtype="float32")
    check("hybrid chunked_ssq_cwt on-chip",
          Txc.shape[-1] == N and np.isfinite(float(jnp.sum(jnp.abs(Txc)))),
          f"{Txc.shape}")

    # 7. timing sanity (not a hard gate; relay adds ~4-5 ms per dispatch)
    @jax.jit
    def ssq_fn(x, i):
        return jnp.sum(jnp.abs(ssq.ssq_cwt(x + i * 1e-12, "gmw", fs=fs,
                                           dtype="float32")[0]))
    float(ssq_fn(x, 0))
    t0 = time.perf_counter()
    outs = [ssq_fn(x, i + 1) for i in range(4)]
    float(outs[-1])
    dt_ms = (time.perf_counter() - t0) / 4 * 1e3
    print(f"  INFO  ssq_cwt 16k: {dt_ms:.1f} ms/call")

    print(("ALL PASS" if not failures else f"FAILURES: {failures}"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
