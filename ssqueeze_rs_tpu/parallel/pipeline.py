"""Streaming long-recording pipeline: native mmap reader -> sharded TPU
transforms -> stacked TF outputs.

TPU-native analog of the reference's dask orchestration scripts
(tests/stft_test.py:163-269, tests/ssq_cwt_test.py:66-196): the recording
is streamed in halo-overlapped chunks (host-side C++ reader or numpy
slices), each chunk is transformed on-device with channels batched in one
tensor program (the reference loops channels in Python,
tests/ssq_cwt_test.py:125-160), halos are trimmed, and chunk outputs are
concatenated along time.

For data already resident in device memory, prefer
`parallel.chunked_*` (pure on-device halo exchange). This pipeline is for
recordings larger than HBM.
"""
from __future__ import annotations

import numpy as np

from ..utils.common import assert_is_one_of

__all__ = ["process_recording"]


def _chunk_iter_array(x, chunk_len, halo):
    """Reflect-padded halo chunks from an in-memory (C, N) array."""
    C, N = x.shape
    start = 0
    while start < N:
        cl = min(chunk_len, N - start)
        idx = np.arange(start - halo, start + cl + halo)
        idx = np.abs(idx)                      # reflect left
        idx = np.where(idx >= N, 2 * N - 2 - idx, idx)
        idx = np.clip(idx, 0, N - 1)
        yield start, cl, x[:, idx]
        start += chunk_len


def process_recording(source, transform="ssq_cwt", fs=1.0, n_channels=None,
                      chunk_len=1_000_000, halo=None, hop_len=1, n_fft=None,
                      window=None, wavelet="gmw", scales="log-piecewise",
                      nv=32, dtype="float32", out="numpy", **kw):
    """Stream a long multichannel recording through a TF transform.

    `source`: path to a raw channel-major float32 file (uses the native
    mmap reader) or a (n_channels, n_samples) array.

    Returns (result, meta): result has shape (C, n_rows, ~N/hop) stacked
    along time; meta holds frequencies/scales.
    """
    assert_is_one_of(transform, "transform", ("stft", "cwt", "ssq_cwt",
                                              "ssq_stft"))
    import jax.numpy as jnp
    from ..ops.stft import stft
    from ..ops.cwt import cwt
    from ..ops.ssq_cwt import ssq_cwt
    from ..ops.ssq_stft import ssq_stft
    from ..scales import process_scales
    from ..wavelets.base import Wavelet

    if isinstance(source, (str, bytes)) or hasattr(source, "__fspath__"):
        from ..native import MappedRecording
        if n_channels is None:
            raise ValueError("n_channels required for file sources")
        rec = MappedRecording(source, n_channels=n_channels, dtype="float32")
        N = rec.n_samples
        def chunks():
            start = 0
            while start < N:
                cl = min(chunk_len, N - start)
                yield start, cl, rec.read_chunk(start, cl, halo_eff,
                                                halo_eff)
                start += chunk_len
    else:
        x = np.atleast_2d(np.asarray(source))
        N = x.shape[-1]
        def chunks():
            yield from _chunk_iter_array(x, chunk_len, halo_eff)

    # halo: n_fft for STFT paths (the dask scripts' depth, stft_test.py:263),
    # wavelet support for CWT paths
    if transform in ("stft", "ssq_stft"):
        n_fft_eff = int(n_fft or 512)
        halo_eff = int(halo if halo is not None else n_fft_eff)
        halo_eff = (halo_eff // hop_len) * hop_len  # keep frame grid aligned
    else:
        ext_guess = min(chunk_len, N)
        wav = Wavelet.build(wavelet, l1_norm=kw.get("l1_norm", True))
        scales_arr = process_scales(scales, ext_guess + 0, wav, nv=nv)
        if halo is None:
            from .chunked import default_cwt_halo
            halo_eff = default_cwt_halo(wav, float(scales_arr.max()))
        else:
            halo_eff = int(halo)

    outs, meta = [], {}
    for start, cl, chunk in chunks():
        Hl = halo_eff
        if transform == "stft":
            S = stft(chunk, window=window, n_fft=n_fft_eff, hop_len=hop_len,
                     fs=fs, dtype=dtype, **kw)
            lo, hi = Hl // hop_len, Hl // hop_len + (cl - 1) // hop_len + 1
            outs.append(np.asarray(S)[..., lo:hi])
            meta["freqs"] = np.linspace(0, fs / 2, S.shape[-2])
        elif transform == "ssq_stft":
            Tx, Sx, ssq_freqs, Sfs = ssq_stft(chunk, window=window,
                                              n_fft=n_fft_eff,
                                              hop_len=hop_len, fs=fs,
                                              dtype=dtype, **kw)
            lo, hi = Hl // hop_len, Hl // hop_len + (cl - 1) // hop_len + 1
            outs.append(np.asarray(Tx)[..., lo:hi])
            meta["ssq_freqs"] = np.asarray(ssq_freqs)
        elif transform == "cwt":
            Wx, sc = cwt(chunk, wavelet, scales=scales_arr, fs=fs, nv=None,
                         dtype=dtype, **kw)
            outs.append(np.asarray(Wx)[..., Hl:Hl + cl])
            meta["scales"] = np.asarray(sc)
        else:  # ssq_cwt
            Tx, Wx, ssq_freqs, sc = ssq_cwt(chunk, wavelet,
                                            scales=scales_arr, fs=fs,
                                            nv=None, dtype=dtype, **kw)
            outs.append(np.asarray(Tx)[..., Hl:Hl + cl])
            meta["ssq_freqs"] = np.asarray(ssq_freqs)
            meta["scales"] = np.asarray(sc)

    result = np.concatenate(outs, axis=-1)
    return result, meta
