"""On-chip streaming-transform benchmark (real TPU via the axon relay).

Measures the sustained per-block STEP latency of the streamers — the
device-side serving capacity — by enqueueing K steps back-to-back and
fetching one scalar (relay-safe timing, same as bench.py), plus one real
feed/flush round to verify the end-to-end path (host fetches included,
which over the relay are bandwidth-bound and reported separately).

Run: python tools/bench_streaming.py [block]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu.streaming import StreamingSSQSTFT, StreamingSSQCWT

    block = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    fs = 1000.0
    rng = np.random.default_rng(0)
    res = {}

    for name, mk in (
        ("ssq_stft", lambda: StreamingSSQSTFT(block=block, n_fft=512,
                                              fs=fs, dtype="float32")),
        ("ssq_cwt", lambda: StreamingSSQCWT(block=block, fs=fs, nv=32,
                                            halo=2048, dtype="float32")),
    ):
        s = mk()
        xe = jnp.asarray(rng.standard_normal(s._E).astype(np.float32))

        def dev_step(x, i):
            outs = s._step(x + 0.0 * i)     # vary input: defeat caching
            return sum(jnp.sum(jnp.abs(o)) for o in outs)

        dev_step_j = jax.jit(dev_step)
        _ = float(dev_step_j(xe, 0))        # compile
        K, reps, best = 8, 3, float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            outs = [dev_step_j(xe, r * K + i + 1) for i in range(K)]
            _ = float(outs[-1])
            best = min(best, (time.perf_counter() - t0) / K)
        res[f"stream_{name}_step_ms"] = round(best * 1e3, 3)
        res[f"stream_{name}_MSps"] = round(block / best / 1e6, 3)

        # end-to-end (host fetches included): one block round
        s2 = mk()
        xb = rng.standard_normal(block).astype(np.float32)
        s2.feed(xb)                          # prime: prefix + compile
        t0 = time.perf_counter()
        n = 4
        for _ in range(n):
            s2.feed(xb)
        e2e = (time.perf_counter() - t0) / n
        res[f"stream_{name}_e2e_ms"] = round(e2e * 1e3, 3)
        print(f"{name}: step {best*1e3:.2f} ms "
              f"({block/best/1e6:.2f} MS/s device), e2e {e2e*1e3:.1f} ms "
              f"(relay fetch included), E={s._E}, "
              f"latency={s.latency_samples} samples", file=sys.stderr)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
