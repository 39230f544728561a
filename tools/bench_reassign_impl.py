"""On-chip A/B: VPU one-hot loop vs MXU digit-split reassignment.

Times the full 160k ssq_cwt bench program under each implementation
(SSQ_TPU_REASSIGN_IMPL is part of the kernel's static config, so
in-process switching is safe — each impl traces its own program), plus
the reassignment stage alone on precomputed planes, and cross-checks
on-chip checksums between implementations.

Run: python tools/bench_reassign_impl.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, args, K=8, reps=3, tag=""):
    out = fn(*args, 0)
    _ = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag:24s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_cwt, Wavelet
    from ssqueeze_rs_tpu.scales import process_scales

    N = 160000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    wavelet = Wavelet.build("gmw")
    scales = process_scales("log-piecewise", N, wavelet)[:300]
    print(f"device {jax.devices()} na={len(scales)}", flush=True)

    sums = {}

    def make_fn(impl, splits=3):
        os.environ["SSQ_TPU_REASSIGN_IMPL"] = impl
        os.environ["SSQ_TPU_REASSIGN_SPLITS"] = str(splits)

        @jax.jit
        def fn(x, i):
            Tx = ssq_cwt(x + i * 1e-12, wavelet, scales=scales, fs=1.0,
                         dtype="float32")[0]
            return jnp.sum(jnp.abs(Tx))
        return fn

    for tag, impl, splits in [("ssq_cwt vpu", "vpu", 3),
                              ("ssq_cwt mxu x3", "mxu", 3),
                              ("ssq_cwt mxu x2", "mxu", 2)]:
        try:
            fn = make_fn(impl, splits)
            s0 = float(fn(x, 0))
            sums[tag] = s0
            timed(fn, (x,), K=16, tag=tag)
        except Exception as e:
            print(f"{tag:24s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    if "ssq_cwt vpu" in sums:
        ref = sums["ssq_cwt vpu"]
        for tag, v in sums.items():
            print(f"checksum {tag:18s} {v:.6f}  rel dev "
                  f"{abs(v - ref) / ref:.2e}", flush=True)

    os.environ["SSQ_TPU_REASSIGN_IMPL"] = "vpu"


if __name__ == "__main__":
    main()
