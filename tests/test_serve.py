"""TransformServer: shape-bucketed serving dispatch."""
import numpy as np
import pytest

from ssqueeze_rs_tpu.serve import TransformServer


def test_bucket_reuse_and_correctness():
    from ssqueeze_rs_tpu import ssq_cwt
    srv = TransformServer("ssq_cwt", buckets=(512, 1024), fs=100.0,
                          dtype="float64")
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal(300)
    x2 = rng.standard_normal(450)     # same bucket (512)
    o1 = srv(x1)
    o2 = srv(x2)
    assert srv.n_compiled == 1        # one program for both lengths
    assert o1["Tx"].shape[-1] == 300 and o2["Tx"].shape[-1] == 450

    # equals direct transform of the padded request, trimmed
    xp = np.pad(x1[None], ((0, 0), (0, 212)), mode="reflect")
    Tx_ref, *_ = ssq_cwt(xp, "gmw", fs=100.0, dtype="float64")
    assert np.allclose(o1["Tx"], np.asarray(Tx_ref)[0, :, :300], atol=1e-12)

    o3 = srv(rng.standard_normal(700))   # second bucket
    assert srv.n_compiled == 2
    assert o3["Tx"].shape[-1] == 700

    with pytest.raises(ValueError):
        srv(rng.standard_normal(5000))


def test_server_stft_and_channels():
    srv = TransformServer("stft", buckets=(512,), n_fft=64, hop_len=4)
    x = np.random.default_rng(1).standard_normal((3, 333))
    out = srv(x)
    assert out["Sx"].shape[0] == 3
    assert out["Sx"].shape[-2] == 33
    # trimmed proportionally to the request length
    assert out["Sx"].shape[-1] <= 333 // 4 + 2
    srv(np.random.default_rng(2).standard_normal((3, 500)))
    assert srv.n_compiled == 1


def test_server_warmup():
    srv = TransformServer("cwt", buckets=(256, 512), dtype="float64")
    srv.warmup(channels=(1, 2))
    assert srv.n_compiled == 4
    out = srv(np.random.default_rng(3).standard_normal(200))
    assert srv.n_compiled == 4          # no new compiles
    assert out["Wx"].shape[-1] == 200


def test_server_hop_exact_column_count():
    """Served STFT column count equals the direct transform's for hop>1
    even when hop does not divide the bucket (ADVICE r1: proportional
    rounding was off by one at e.g. hop=3, bucket=512, N=510)."""
    from ssqueeze_rs_tpu import stft

    srv = TransformServer("stft", buckets=(512,), n_fft=64, hop_len=3)
    for N in (510, 511, 512, 333, 100):
        x = np.random.default_rng(N).standard_normal(N)
        out = srv(x)
        direct = np.asarray(stft(x, n_fft=64, hop_len=3))
        assert out["Sx"].shape[-1] == direct.shape[-1], N
