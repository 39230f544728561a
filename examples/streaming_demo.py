"""Streaming transforms demo: feed an 'infinite' signal in ragged chunks.

StreamingSSQSTFT emits columns identical to the offline transform as soon
as their lookahead arrives; StreamingCWT carries a halo and reports a
per-row error bound (`row_tail_mass`).

Run: JAX_PLATFORMS=cpu python examples/streaming_demo.py
"""
import numpy as np

from ssqueeze_rs_tpu import ssq_stft, StreamingSSQSTFT, StreamingCWT

fs = 1000.0
N = 4096
t = np.arange(N) / fs
x = np.cos(2 * np.pi * (50 + 30 * t) * t)          # linear chirp

# -- exact streaming synchrosqueezed STFT ---------------------------------
s = StreamingSSQSTFT(block=1024, n_fft=256, fs=fs)
print(f"latency: {s.latency_samples} samples "
      f"({1e3 * s.latency_samples / fs:.0f} ms at fs={fs:.0f})")

rng = np.random.default_rng(0)
cols = []
i = 0
while i < N:                                        # ragged chunk sizes
    n = int(rng.integers(100, 900))
    Tx_c, Sx_c = s.feed(x[i:i + n])
    cols.append(Tx_c)
    i += n
Tx_c, _ = s.flush()
cols.append(Tx_c)
Tx_stream = np.concatenate(cols, axis=-1)

Tx_ref, *_ = ssq_stft(x, n_fft=256, fs=fs)
err = np.abs(Tx_stream - np.asarray(Tx_ref)).max()
print(f"streamed ssq_stft vs offline: shape={Tx_stream.shape}, "
      f"max abs diff={err:.2e} (exact)")

# -- halo-bounded streaming CWT -------------------------------------------
c = StreamingCWT(block=1024, fs=fs, nv=16, halo=512)
tight = (c.row_tail_mass < 1e-8).sum()
print(f"StreamingCWT: step={c._E} samples, halo={c.halo}; "
      f"{tight}/{len(c.row_tail_mass)} rows within 1e-8 tail mass")
W = [c.feed(x[j:j + 1024]) for j in range(0, N, 1024)] + [c.flush()]
Wx = np.concatenate(W, axis=-1)
print(f"streamed cwt: {Wx.shape} columns emitted")
