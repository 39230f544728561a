"""Parquet ingestion (reference data path: pyarrow memory_map parquet ->
per-channel transforms, tests/stft_test.py:374-377,
tests/ssq_cwt_test.py:352-380)."""
import numpy as np
import pytest

pytest.importorskip("pyarrow")

from ssqueeze_rs_tpu.io import ParquetRecording, parquet_to_raw


@pytest.fixture(scope="module")
def parquet_file(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(0)
    C, N = 3, 5000
    data = rng.standard_normal((C, N)).astype(np.float32)
    tbl = pa.table({f"ch{c}": data[c] for c in range(C)})
    path = tmp_path_factory.mktemp("pq") / "rec.parquet"
    # several row groups so selective reads are exercised
    pq.write_table(tbl, path, row_group_size=700)
    return str(path), data


def test_parquet_basic(parquet_file):
    path, data = parquet_file
    rec = ParquetRecording(path)
    assert rec.n_channels == 3
    assert rec.n_samples == 5000
    assert np.array_equal(rec.to_numpy(), data)


def test_parquet_column_selection(parquet_file):
    path, data = parquet_file
    rec = ParquetRecording(path, columns=["ch2", "ch0"])
    got = rec.read_chunk(100, 50)
    assert np.array_equal(got, data[[2, 0], 100:150])


def test_parquet_read_chunk_matches_reflect(parquet_file):
    """Halo reads across row-group boundaries and recording edges match
    numpy reflect indexing (the map_overlap boundary='reflect'
    semantics)."""
    path, data = parquet_file
    rec = ParquetRecording(path)
    N = rec.n_samples
    for start, cl, hl, hr in [(0, 1000, 64, 64), (650, 700, 128, 128),
                              (4500, 500, 256, 256), (0, 5000, 300, 300)]:
        got = rec.read_chunk(start, cl, hl, hr)
        idx = np.arange(start - hl, start + cl + hr)
        idx = np.abs(idx)
        idx = np.where(idx >= N, 2 * N - 2 - idx, idx)
        want = data[:, np.clip(idx, 0, N - 1)]
        assert np.array_equal(got, want), (start, cl)


def test_parquet_process_recording_matches_array(parquet_file):
    """process_recording on a parquet path == on the in-memory array."""
    from ssqueeze_rs_tpu.parallel import process_recording

    path, data = parquet_file
    kw = dict(transform="stft", fs=1000.0, n_fft=128, chunk_len=2500,
              dtype="float64")
    got, meta = process_recording(path, **kw)
    want, _ = process_recording(data, **kw)
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_parquet_to_raw_roundtrip(parquet_file, tmp_path):
    path, data = parquet_file
    out = tmp_path / "rec.f32"
    _, C, N = parquet_to_raw(path, out, chunk_len=1024)
    raw = np.fromfile(out, np.float32).reshape(C, N)
    assert np.array_equal(raw, data)

    # the converted file feeds the native mmap reader + C++ prefetcher
    from ssqueeze_rs_tpu import native
    if native.available():
        with native.MappedRecording(out, n_channels=C) as rec:
            assert rec.n_samples == N
            got = rec.read_chunk(100, 200, 32, 32)
            idx = np.arange(100 - 32, 300 + 32)
            assert np.array_equal(got, data[:, np.clip(np.abs(idx), 0,
                                                       N - 1)])
            chunks = list(rec.iter_chunks_prefetch(1500, 64))
            assert sum(c.shape[-1] - 128 for _, c in chunks) == N


def test_reflect_indices_repeated_reflection():
    """Halos wider than the recording repeat-reflect like np.pad
    (was edge-replication — code-review r3)."""
    from ssqueeze_rs_tpu.io import _reflect_indices
    for N in (2, 3, 5, 11):
        x = np.arange(N, dtype=float)
        for halo in (1, N - 1, N, 2 * N + 3):
            want = np.pad(x, (halo, halo), mode="reflect")
            idx = _reflect_indices(-halo, N + halo, N)
            assert np.array_equal(x[idx], want), (N, halo)
