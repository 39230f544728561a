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
