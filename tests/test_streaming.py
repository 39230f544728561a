"""Streaming transforms: block-fed outputs vs the offline transforms.

STFT family must be column-EXACT (the carried context reproduces the
offline reflect-pad + framing, ops/stft.py:235-262); the CWT family is
halo-bounded like parallel.chunked (interior columns tight, documented
tail-mass approximation).
"""
import numpy as np
import pytest

from ssqueeze_rs_tpu import stft, ssq_stft, cwt
from ssqueeze_rs_tpu.streaming import (StreamingSTFT, StreamingSSQSTFT,
                                       StreamingCWT, StreamingSSQCWT)


def _chirp(N, fs=1000.0, seed=0):
    t = np.arange(N) / fs
    rng = np.random.default_rng(seed)
    x = (np.cos(2 * np.pi * (20 + 80 * t) * t)
         + 0.5 * np.sin(2 * np.pi * 140 * t)
         + 0.01 * rng.standard_normal(N))
    return x.astype(np.float64), t


def _stream(s, x, sizes):
    """Feed `x` in ragged chunks of the given sizes (cycled), collect."""
    outs, i, k = [], 0, 0
    while i < len(x):
        n = sizes[k % len(sizes)]
        outs.append(s.feed(x[i:i + n]))
        i += n
        k += 1
    outs.append(s.flush())
    if isinstance(outs[0], tuple):
        return tuple(np.concatenate(p, axis=-1) for p in zip(*outs))
    return np.concatenate(outs, axis=-1)


@pytest.mark.parametrize("hop,n_fft", [(1, 64), (4, 128), (16, 256)])
def test_streaming_stft_exact(hop, n_fft):
    N = 3000
    x, _ = _chirp(N)
    ref = np.asarray(stft(x, n_fft=n_fft, hop_len=hop, dtype="float64"))

    s = StreamingSTFT(block=512, n_fft=n_fft, hop_len=hop, dtype="float64")
    got = _stream(s, x, sizes=[173, 512, 64, 1000])
    assert got.shape == ref.shape
    assert np.allclose(got, ref, rtol=0, atol=5e-14 * np.abs(ref).max())


def test_streaming_stft_derivative_and_reuse():
    N = 1500
    x, _ = _chirp(N, seed=1)
    ref_S, ref_dS = stft(x, n_fft=128, derivative=True, dtype="float64")
    s = StreamingSTFT(block=256, n_fft=128, derivative=True,
                      dtype="float64")
    S, dS = _stream(s, x, sizes=[256])
    bar = 5e-14 * np.abs(np.asarray(ref_S)).max()
    assert np.allclose(S, np.asarray(ref_S), atol=bar)
    assert np.allclose(dS, np.asarray(ref_dS),
                       atol=5e-14 * np.abs(np.asarray(ref_dS)).max())
    # reset() reuses the compiled step
    s.reset()
    S2, _ = _stream(s, x, sizes=[499, 3])
    assert np.allclose(S2, S, atol=0)


def test_streaming_stft_short_stream_edges():
    """Stream shorter than one block (and than the prefix) still matches
    offline (flush builds both reflect pads)."""
    x, _ = _chirp(200, seed=2)
    ref = np.asarray(stft(x, n_fft=64, dtype="float64"))
    s = StreamingSTFT(block=512, n_fft=64, dtype="float64")
    got = _stream(s, x, sizes=[200])
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=5e-14 * np.abs(ref).max())


def test_streaming_ssq_stft_exact():
    N = 2048
    fs = 1000.0
    x, _ = _chirp(N, fs=fs)
    ref_Tx, ref_Sx, ref_freqs, _ = ssq_stft(x, n_fft=128, fs=fs,
                                            dtype="float64")
    s = StreamingSSQSTFT(block=512, n_fft=128, fs=fs, dtype="float64")
    Tx, Sx = _stream(s, x, sizes=[300, 512, 100])
    assert np.allclose(np.asarray(s.ssq_freqs), np.asarray(ref_freqs))
    assert np.allclose(Sx, np.asarray(ref_Sx),
                       atol=5e-14 * np.abs(np.asarray(ref_Sx)).max())
    assert np.allclose(Tx, np.asarray(ref_Tx),
                       atol=1e-12 * np.abs(np.asarray(ref_Tx)).max())
    assert s.latency_samples == (128 - 1) // 2


def test_streaming_cwt_interior_bounded():
    """Interior streamed CWT columns approach the offline transform; the
    bound tightens as the halo grows (tail-mass argument, same contract as
    chunked_cwt's approximate mode)."""
    N = 4096
    x, _ = _chirp(N, seed=3)
    Wx_ref, scales = cwt(x, fs=1000.0, dtype="float64",
                         scales="log-piecewise", nv=16)
    Wx_ref = np.asarray(Wx_ref)

    s = StreamingCWT(block=1024, fs=1000.0, nv=16, plan_N=N, halo=448,
                     dtype="float64")
    got = _stream(s, x, sizes=[1024])
    assert got.shape == Wx_ref.shape
    assert np.allclose(np.asarray(s.scales), np.asarray(scales))

    # rows whose kernel fits the halo (row_tail_mass) must match the
    # offline transform almost exactly on interior columns; the
    # near-Nyquist ringing rows are bounded loosely (same split as
    # chunked_cwt's hybrid exact mode)
    interior = slice(s.halo, N - s.halo)
    tight = s.row_tail_mass < 1e-8
    assert tight.sum() > 0.25 * len(tight)
    den = np.abs(Wx_ref).max()
    num_tight = np.abs(got[tight][:, interior]
                       - Wx_ref[tight][:, interior]).max()
    assert num_tight / den < 5e-9   # measured 7.9e-10; bound ~0.15*mass
    num_all = np.abs(got[:, interior] - Wx_ref[:, interior]).max()
    assert num_all / den < 5e-2


def test_streaming_ssq_cwt_runs_and_concentrates():
    """Streamed ssq_cwt energy concentrates at the tone frequency and the
    row grids match the offline planning at plan_N."""
    N = 2048
    fs = 1000.0
    t = np.arange(N) / fs
    x = np.cos(2 * np.pi * 100.0 * t)

    s = StreamingSSQCWT(block=512, fs=fs, nv=16, plan_N=N, halo=256,
                        dtype="float64")
    Tx, Wx = _stream(s, x, sizes=[512])
    assert Tx.shape[-1] == N and Wx.shape[-1] == N

    interior = slice(s.halo, N - s.halo)
    assert interior.stop > interior.start
    E_rows = np.abs(Tx[:, interior]).sum(axis=1)
    f_peak = np.asarray(s.ssq_freqs)[np.argmax(E_rows)]
    assert abs(f_peak - 100.0) / 100.0 < 0.05

    # the default (capped) halo warns but still peaks correctly
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s_def = StreamingSSQCWT(block=512, fs=fs, nv=16, plan_N=N,
                                dtype="float64")
    Tx_d, _ = _stream(s_def, x, sizes=[512])
    E_d = np.abs(Tx_d).sum(axis=1)
    assert abs(np.asarray(s_def.ssq_freqs)[np.argmax(E_d)] - 100.0) < 5.0


def test_streaming_multichannel():
    """2D (channels, time) feeds stream exactly; empty feeds keep the
    channel dims in the result shape."""
    C, N = 3, 1200
    rng = np.random.default_rng(7)
    x = rng.standard_normal((C, N))
    ref = np.asarray(stft(x, n_fft=64, dtype="float64"))

    s = StreamingSTFT(block=256, n_fft=64, dtype="float64")
    small = s.feed(x[:, :10])          # below one block: empty, right dims
    assert small.shape == (C, 64 // 2 + 1, 0)
    rest = _stream(s, x[:, 10:], sizes=[256, 100])
    got = np.concatenate([small, rest], axis=-1)
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=5e-14 * np.abs(ref).max())

    import pytest
    s.reset()
    s.feed(x[:, :10])
    with pytest.raises(ValueError, match="channel shape changed"):
        s.feed(x[:2, :10])


def test_streaming_ssq_cwt_freq_labels_flipud_false():
    """flipud=False must label rows exactly like offline ssq_cwt (CWT
    ssq_freqs flip unconditionally — code-review r3 finding)."""
    from ssqueeze_rs_tpu import ssq_cwt
    N, fs = 1024, 1000.0
    t = np.arange(N) / fs
    x = np.cos(2 * np.pi * 100.0 * t)
    _, _, freqs_ref, _ = ssq_cwt(x, fs=fs, nv=16, flipud=False)
    s = StreamingSSQCWT(block=256, fs=fs, nv=16, plan_N=N, halo=128,
                        flipud=False, dtype="float64")
    assert np.allclose(np.asarray(s.ssq_freqs), np.asarray(freqs_ref))
    s2 = StreamingSSQCWT(block=256, fs=fs, nv=16, plan_N=N, halo=128,
                         flipud=True, dtype="float64")
    from ssqueeze_rs_tpu import ssq_cwt as _sc
    _, _, freqs_ref2, _ = _sc(x, fs=fs, nv=16, flipud=True)
    assert np.allclose(np.asarray(s2.ssq_freqs), np.asarray(freqs_ref2))


def test_streaming_squeezing_modes_match_offline():
    """squeezing='lebesgue'/'abs' must transform Wx exactly as ssqueeze()
    does (was silently ignored — code-review r3 finding)."""
    N, fs = 1024, 1000.0
    x, _ = _chirp(N, fs=fs, seed=9)
    for sq in ("lebesgue", "abs"):
        ref_Tx, *_ = ssq_stft(x, n_fft=128, fs=fs, squeezing=sq,
                              dtype="float64")
        s = StreamingSSQSTFT(block=256, n_fft=128, fs=fs, squeezing=sq,
                             dtype="float64")
        Tx, _ = _stream(s, x, sizes=[256])
        ref = np.asarray(ref_Tx)
        assert np.allclose(Tx, ref, atol=1e-12 * max(np.abs(ref).max(), 1)), sq

    import pytest
    with pytest.raises(ValueError):
        StreamingSSQSTFT(block=256, n_fft=128, squeezing="bogus")


def test_streaming_stft_tiny_stream_right_edge_exact():
    """Streams shorter than the right pad reflect-extend repeatedly, same
    as offline padsignal (was 'symmetric' — code-review r3 finding)."""
    x, _ = _chirp(50, seed=11)
    ref = np.asarray(stft(x, n_fft=256, dtype="float64"))
    s = StreamingSTFT(block=512, n_fft=256, dtype="float64")
    got = _stream(s, x, sizes=[50])
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=5e-14 * np.abs(ref).max())


def test_streaming_stft_geometry_sweep():
    """Randomized bookkeeping fuzz: n_fft parity x hop x block x ragged
    feed sizes x stream lengths all reproduce offline columns."""
    rng = np.random.default_rng(42)
    for trial in range(12):
        hop = int(rng.choice([1, 2, 3, 5, 8]))
        n_fft = int(rng.choice([32, 63, 64, 129, 200]))
        if n_fft < hop:
            continue
        block = hop * int(rng.integers(8, 64))
        N = int(rng.integers(1, 2000))
        x = rng.standard_normal(N)
        ref = np.asarray(stft(x, n_fft=n_fft, hop_len=hop,
                              dtype="float64"))
        s = StreamingSTFT(block=block, n_fft=n_fft, hop_len=hop,
                          dtype="float64")
        sizes = [int(rng.integers(1, max(2, 2 * block)))
                 for _ in range(4)]
        got = _stream(s, x, sizes=sizes)
        assert got.shape == ref.shape, (trial, hop, n_fft, block, N)
        bar = 5e-14 * max(np.abs(ref).max(), 1.0)
        assert np.allclose(got, ref, atol=bar), (trial, hop, n_fft,
                                                 block, N)
