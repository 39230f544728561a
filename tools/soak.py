"""Determinism soak: repeated headline-config transforms must produce
BITWISE-identical checksums (fixed-order Pallas accumulation claim;
the r2 soak was ad-hoc — this checks it in).

Each call reduces its outputs to f32 scalars ON DEVICE (relay rule:
fetch scalars only) and the exact bit patterns are compared across
calls. Any nondeterministic accumulation order (or a racy scatter)
flips low bits and fails the run.

Run: python tools/soak.py [n_calls=50] [transform=ssq_cwt|ssq_stft|cwt|stft]
Exit 0 = all identical.
"""
import struct
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    which = sys.argv[2] if len(sys.argv) > 2 else "ssq_cwt"

    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import ssq_cwt, ssq_stft, cwt, stft, Wavelet
    from ssqueeze_rs_tpu.scales import process_scales

    print(f"backend {jax.default_backend()} K={K} transform={which}",
          file=sys.stderr, flush=True)
    N, n_rows = 160000, 300
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    wavelet = Wavelet.build("gmw")
    scales = process_scales("log-piecewise", N, wavelet)[:n_rows]

    @jax.jit
    def f(x):
        if which == "ssq_cwt":
            Tx, Wx, *_ = ssq_cwt(x, wavelet, scales=scales, fs=1.0,
                                 dtype="float32")
            return (jnp.sum(jnp.abs(Tx)), jnp.sum(Tx.real),
                    jnp.sum(jnp.abs(Wx)))
        if which == "ssq_stft":
            Tx, Sx, *_ = ssq_stft(x, n_fft=598, dtype="float32")
            return (jnp.sum(jnp.abs(Tx)), jnp.sum(Tx.real),
                    jnp.sum(jnp.abs(Sx)))
        if which == "cwt":
            Wx = cwt(x, wavelet, scales=scales, dtype="float32")[0]
            return (jnp.sum(jnp.abs(Wx)), jnp.sum(Wx.real),
                    jnp.sum(Wx.imag))
        Sx = stft(x, n_fft=598, hop_len=1, dtype="float32")
        return (jnp.sum(jnp.abs(Sx)), jnp.sum(Sx.real), jnp.sum(Sx.imag))

    def bits(vals):
        return tuple(struct.pack("<f", float(v)).hex() for v in vals)

    t0 = time.time()
    ref = bits(f(x))
    bad = 0
    for i in range(K - 1):
        b = bits(f(x))
        if b != ref:
            bad += 1
            print(f"call {i + 2}: checksum bits differ: {b} != {ref}",
                  flush=True)
    dt = time.time() - t0
    print(f"{which}: {K} calls, {bad} mismatches, checksums {ref} "
          f"({dt / K * 1e3:.1f} ms/call incl. fetch)", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
