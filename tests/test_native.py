"""Native C++ runtime: mmap chunk reader, OpenMP reassignment oracle, TKEO.

Skipped when the toolchain can't build the library.
"""
import numpy as np
import pytest

from ssqueeze_rs_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_mapped_recording_chunks(tmp_path):
    C, N = 3, 10000
    rng = np.random.default_rng(0)
    data = rng.standard_normal((C, N)).astype(np.float32)
    p = tmp_path / "rec.f32"
    data.tofile(p)

    with native.MappedRecording(p, n_channels=C) as rec:
        assert rec.n_samples == N
        chunk = rec.read_chunk(1000, 500, halo_left=64, halo_right=64)
        assert chunk.shape == (C, 628)
        assert np.array_equal(chunk[:, 64:-64], data[:, 1000:1500])
        assert np.array_equal(chunk[:, :64], data[:, 1000 - 64:1000])

        # reflect at left edge: chunk at start 0
        chunk0 = rec.read_chunk(0, 500, halo_left=4, halo_right=0)
        assert np.array_equal(chunk0[:, :4], data[:, 4:0:-1])

        # reflect at right edge
        chunkN = rec.read_chunk(N - 500, 500, halo_left=0, halo_right=4)
        assert np.array_equal(chunkN[:, -4:], data[:, N - 2:N - 6:-1])

        # full iteration covers everything
        total = sum(c.shape[1] - 128 for _, c in rec.iter_chunks(2000, 64))
        assert total == N


def test_native_reassign_matches_jnp():
    import jax.numpy as jnp
    from ssqueeze_rs_tpu import cwt
    from ssqueeze_rs_tpu.ops.ssqueeze import reassign, bin_params

    N = 512
    t = np.linspace(0, 10, N, endpoint=False)
    x = np.cos(2 * np.pi * 3 * np.exp(t / 3))
    Wx, scales, dWx = cwt(x, ("gmw", {"beta": 8.0}), scales="log",
                          fs=N / 10, derivative=True, dtype="float64")
    Wx, dWx = np.asarray(Wx), np.asarray(dWx)
    na = Wx.shape[0]
    ssq_freqs = np.geomspace(0.05, 25.0, 180)
    const = np.full(na, 0.0217)
    gamma = 1e-8

    out = native.reassign_cpu(Wx, dWx, ssq_freqs, const, gamma, "log",
                              flipud=True)

    mode, params = bin_params(ssq_freqs, True)
    params_j = {k: jnp.asarray(v) for k, v in params.items()}
    ref = np.asarray(reassign(
        jnp.asarray(Wx), jnp.asarray(dWx), jnp.asarray(const),
        jnp.asarray(gamma), jnp.zeros(na), params_j, mode=mode, flipud=True,
        fused=True, transform="cwt", nf=len(ssq_freqs)))

    assert np.abs(out - ref).max() < 1e-12 * max(1, np.abs(ref).max())


def test_native_tkeo():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    y = native.tkeo_cpu(x)
    ref = x[:, 1:-1] ** 2 - x[:, :-2] * x[:, 2:]
    # g++ -march=native emits FMA; allow reassociation ulps
    assert np.allclose(y, ref, rtol=1e-4, atol=1e-5)
    ym = native.tkeo_modified_cpu(x)
    ref_m = x[:, 2:-1] * x[:, 1:-2] - x[:, 3:] * x[:, :-3]
    assert np.allclose(ym, ref_m, rtol=1e-4, atol=1e-5)


def test_prefetch_matches_direct_reads(tmp_path):
    """C++ prefetch scheduler yields the same chunks as read_chunk, in
    order, including the short last chunk."""
    from ssqueeze_rs_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    C, N = 3, 10_000
    data = rng.standard_normal((C, N)).astype(np.float32)
    path = tmp_path / "rec.bin"
    data.tofile(path)

    with native.MappedRecording(path, n_channels=C) as rec:
        chunk_len, halo = 3_000, 128
        got = list(rec.iter_chunks_prefetch(chunk_len, halo, depth=3))
        want = list(rec.iter_chunks(chunk_len, halo))
    assert [s for s, _ in got] == [s for s, _ in want]
    for (s1, a), (s2, b) in zip(got, want):
        assert a.shape == b.shape, (s1, a.shape, b.shape)
        assert np.array_equal(a, b), s1


def test_pipeline_prefetch_matches_nonprefetch(tmp_path):
    """process_recording(prefetch=True) == prefetch=False on a file."""
    from ssqueeze_rs_tpu import native
    from ssqueeze_rs_tpu.parallel.pipeline import process_recording
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    C, N = 2, 4096
    data = rng.standard_normal((C, N)).astype(np.float32)
    path = tmp_path / "rec2.bin"
    data.tofile(path)

    kw = dict(transform="stft", n_channels=C, chunk_len=1500, n_fft=128,
              hop_len=1, fs=100.0)
    r1, m1 = process_recording(path, prefetch=True, **kw)
    r2, m2 = process_recording(path, prefetch=False, **kw)
    assert r1.shape == r2.shape
    assert np.array_equal(r1, r2)


def test_native_wide_halo_repeated_reflection(tmp_path):
    """Halos wider than the recording repeat-reflect like np.pad — the
    same contract as io._reflect_indices (code-review r3)."""
    from ssqueeze_rs_tpu.native import MappedRecording, available
    if not available():
        import pytest
        pytest.skip("native lib not built")
    N, C = 5, 2
    x = np.arange(C * N, dtype=np.float32).reshape(C, N)
    p = tmp_path / "tiny.raw"
    x.tofile(p)
    with MappedRecording(str(p), n_channels=C) as rec:
        halo = 2 * N + 3
        got = rec.read_chunk(0, N, halo_left=halo, halo_right=halo)
        want = np.pad(x, ((0, 0), (halo, halo)), mode="reflect")
        assert np.array_equal(got, want)
