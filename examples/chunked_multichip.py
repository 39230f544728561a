"""Sharded long-recording demo on a virtual device mesh.

Run on CPU with 8 virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/chunked_multichip.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax

from ssqueeze_rs_tpu.parallel import (make_mesh, shard_batch, chunked_stft,
                                      chunked_ssq_cwt)

n_dev = len(jax.devices())
mesh = make_mesh((1, n_dev), ("data", "time"))
print(f"mesh: {mesh}")

fs = 1000.0
N = 4096 * n_dev
t = np.arange(N) / fs
x = np.cos(2 * np.pi * 50 * t) + 0.5 * np.cos(2 * np.pi * 160 * t)

Sx = chunked_stft(x, mesh, window="hann", n_fft=256, hop_len=32)
print("sharded STFT:", Sx.shape)

Tx, Wx, ssq_freqs, scales = chunked_ssq_cwt(x, mesh, wavelet=("gmw", {"beta": 8.0}),
                                            scales="log", fs=fs)
print("sharded ssq_cwt:", Tx.shape)

# round 3: sharded INVERSE transforms — full round trips on the mesh
from ssqueeze_rs_tpu.parallel import (chunked_istft, chunked_icwt,
                                      chunked_issq_cwt)
from ssqueeze_rs_tpu.toolkit import mad_rms

Sx1 = chunked_stft(x, mesh, window="hann", n_fft=256, hop_len=1)
xr = chunked_istft(Sx1, mesh, window="hann", n_fft=256, hop_len=1)
print(f"sharded istft round trip: mad_rms = "
      f"{mad_rms(x, np.asarray(xr)):.2e} (bit-exact vs unsharded istft)")

from ssqueeze_rs_tpu.parallel import chunked_cwt
Wx2, sc2 = chunked_cwt(x, mesh, wavelet=("gmw", {"beta": 8.0}),
                       scales="log", fs=fs)
xr2 = chunked_icwt(Wx2, mesh, wavelet=("gmw", {"beta": 8.0}), scales="log")
print(f"sharded icwt round trip:  mad_rms = "
      f"{mad_rms(x, np.asarray(xr2)):.2e}")

xr3 = chunked_issq_cwt(Tx, mesh, wavelet=("gmw", {"beta": 8.0}))
print(f"sharded issq_cwt:         mad_rms = "
      f"{mad_rms(x, np.asarray(xr3)):.2e}")
