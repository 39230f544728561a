"""Pallas fused reassignment kernel vs the jnp scatter engine
(kernel-equivalence strategy of old/tests/fft_test.py:351-377)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ssqueeze_rs_tpu import cwt
from ssqueeze_rs_tpu.ops.ssqueeze import reassign, bin_params
from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas


def _setup(N=1024, dtype="complex64"):
    rng = np.random.default_rng(0)
    t = np.linspace(0, 10, N, endpoint=False)
    x = np.cos(2 * np.pi * 3 * np.exp(t / 3)) + 0.1 * rng.standard_normal(N)
    Wx, scales, dWx = cwt(x, ("gmw", {"beta": 8.0}), scales="log",
                          fs=N / 10, derivative=True,
                          dtype="float32" if dtype == "complex64"
                          else "float64")
    return np.asarray(Wx).astype(dtype), np.asarray(dWx).astype(dtype), scales


@pytest.mark.parametrize("flipud", [False, True])
@pytest.mark.parametrize("mode_freqs", [
    ("log", np.geomspace(0.05, 50.0, 200)),
    ("lin", np.linspace(0.05, 50.0, 200)),
])
def test_pallas_matches_scatter(mode_freqs, flipud):
    mode_expect, ssq_freqs = mode_freqs
    Wx, dWx, scales = _setup()
    na, n = Wx.shape
    nf = len(ssq_freqs)
    gamma = 1e-5
    const = np.full(na, 0.021, np.float64)

    mode, params = bin_params(ssq_freqs, mode_expect == "log")
    assert mode == mode_expect

    params_j = {k: jnp.asarray(v) for k, v in params.items()}
    Sfs = jnp.zeros((na,), jnp.float32)
    ref = np.asarray(reassign(
        jnp.asarray(Wx), jnp.asarray(dWx), jnp.asarray(const, jnp.float32),
        jnp.asarray(gamma, jnp.float32), Sfs, params_j, mode=mode,
        flipud=flipud, fused=True, transform="cwt", nf=nf))

    out = np.asarray(reassign_pallas(
        jnp.asarray(Wx), jnp.asarray(dWx), jnp.asarray(const, jnp.float32),
        gamma, Sfs, params, mode=mode, flipud=flipud, transform="cwt",
        nf=nf, interpret=True))

    assert out.shape == ref.shape
    # identical binning decisions on ~all elements; allow ulp-level strays
    # from f32 expression reassociation at bin boundaries
    diff = np.abs(out - ref)
    denom = np.abs(ref).sum()
    assert diff.sum() / denom < 1e-4, diff.sum() / denom


def test_pallas_log_piecewise():
    Wx, dWx, scales = _setup()
    na, n = Wx.shape
    # construct a log-piecewise ssq_freqs grid: dense low, sparse high
    f1 = np.geomspace(0.05, 1.0, 150, endpoint=False)
    f2 = np.geomspace(1.0, 50.0, 50)
    ssq_freqs = np.hstack([f1, f2])
    mode, params = bin_params(ssq_freqs, True)
    assert mode == "log-piecewise"
    nf = len(ssq_freqs)
    gamma = 1e-5
    const = np.full(na, 0.03, np.float64)

    params_j = {k: (jnp.asarray(v) if k != "idx1" else
                    jnp.asarray(v, jnp.int32)) for k, v in params.items()}
    Sfs = jnp.zeros((na,), jnp.float32)
    ref = np.asarray(reassign(
        jnp.asarray(Wx), jnp.asarray(dWx), jnp.asarray(const, jnp.float32),
        jnp.asarray(gamma, jnp.float32), Sfs, params_j, mode=mode,
        flipud=True, fused=True, transform="cwt", nf=nf))
    out = np.asarray(reassign_pallas(
        jnp.asarray(Wx), jnp.asarray(dWx), jnp.asarray(const, jnp.float32),
        gamma, Sfs, params, mode=mode, flipud=True, transform="cwt", nf=nf,
        interpret=True))
    assert np.abs(out - ref).sum() / np.abs(ref).sum() < 1e-4


def test_pallas_stft_mode():
    rng = np.random.default_rng(1)
    na, n = 65, 500
    Sx = (rng.standard_normal((na, n)) +
          1j * rng.standard_normal((na, n))).astype(np.complex64)
    dSx = (rng.standard_normal((na, n)) +
           1j * rng.standard_normal((na, n))).astype(np.complex64)
    Sfs = np.linspace(0, 0.5, na).astype(np.float32)
    mode, params = bin_params(Sfs, False)
    const = np.full(na, float(Sfs[1] - Sfs[0]), np.float64)
    gamma = 1e-6

    params_j = {k: jnp.asarray(v) for k, v in params.items()}
    ref = np.asarray(reassign(
        jnp.asarray(Sx), jnp.asarray(dSx), jnp.asarray(const, jnp.float32),
        jnp.asarray(gamma, jnp.float32), jnp.asarray(Sfs), params_j,
        mode=mode, flipud=False, fused=True, transform="stft", nf=na))
    out = np.asarray(reassign_pallas(
        jnp.asarray(Sx), jnp.asarray(dSx), jnp.asarray(const, jnp.float32),
        gamma, jnp.asarray(Sfs), params, mode=mode, flipud=False,
        transform="stft", nf=na, interpret=True))
    assert np.abs(out - ref).sum() / np.abs(ref).sum() < 1e-4


import pytest


@pytest.mark.parametrize("skip", ["row", "tile"])
def test_skip_variants_match_baseline(monkeypatch, skip):
    """gamma-sparsity skip modes are output-identical to the baseline
    kernel (they only branch out all-masked work)."""
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas
    from ssqueeze_rs_tpu.ops.ssqueeze import plan_reassignment

    rng = np.random.default_rng(5)
    na, n = 16, 700
    nf = na
    ssq_freqs = 0.01 * 2.0 ** (np.arange(na) / 4)
    const_arr, mode, params = plan_reassignment(
        ssq_freqs, na, True, transform="cwt", cwt_scaletype="log", nv=4,
        scales=ssq_freqs.reshape(-1, 1))
    Wx = (rng.standard_normal((na, n)) + 1j * rng.standard_normal((na, n)))
    dWx = (rng.standard_normal((na, n)) + 1j * rng.standard_normal((na, n)))
    # force sub-gamma rows so the skip actually triggers
    Wx[3:7] *= 1e-12
    Wx[12:] *= 1e-12
    gamma = 1e-6
    const_j = jnp.asarray(const_arr)
    Sfs = jnp.zeros(na)
    kw = dict(mode=mode, flipud=True, transform="cwt", nf=nf,
              interpret=True)

    base = np.asarray(reassign_pallas(jnp.asarray(Wx), jnp.asarray(dWx),
                                      const_j, gamma, Sfs, params, **kw))
    monkeypatch.setenv("SSQ_TPU_REASSIGN_SKIP", skip)
    jax.clear_caches()   # env flag is baked into the traced kernel
    got = np.asarray(reassign_pallas(jnp.asarray(Wx), jnp.asarray(dWx),
                                     const_j, gamma, Sfs, params, **kw))
    monkeypatch.delenv("SSQ_TPU_REASSIGN_SKIP")
    jax.clear_caches()
    assert np.array_equal(got, base)


@pytest.mark.parametrize("flipud", [False, True])
@pytest.mark.parametrize("mode_freqs", [
    ("log", np.geomspace(0.05, 50.0, 200)),
    ("log-piecewise", None),
    ("lin", np.linspace(0.05, 50.0, 200)),
])
def test_mxu_impl_matches_vpu(monkeypatch, mode_freqs, flipud):
    """The MXU digit-split implementation (SSQ_TPU_REASSIGN_IMPL=mxu)
    makes the same binning decisions as the one-hot row loop; values
    agree to the bf16x3 split error."""
    mode_expect, ssq_freqs = mode_freqs
    Wx, dWx, scales = _setup()
    if ssq_freqs is None:   # log-piecewise grid from two dvl segments
        ssq_freqs = np.concatenate([np.geomspace(0.05, 5.0, 150),
                                    np.geomspace(5.1, 50.0, 50)])
    na, n = Wx.shape
    nf = len(ssq_freqs)
    gamma = 1e-5
    const = np.full(na, 0.021, np.float64)

    mode, params = bin_params(ssq_freqs, mode_expect.startswith("log"))
    Sfs = jnp.zeros((na,), jnp.float32)
    args = (jnp.asarray(Wx), jnp.asarray(dWx),
            jnp.asarray(const, jnp.float32), gamma, Sfs, params)
    kw = dict(mode=mode, flipud=flipud, transform="cwt", nf=nf,
              interpret=True)

    monkeypatch.delenv("SSQ_TPU_REASSIGN_IMPL", raising=False)
    ref = np.asarray(reassign_pallas(*args, **kw))
    monkeypatch.setenv("SSQ_TPU_REASSIGN_IMPL", "mxu")
    out = np.asarray(reassign_pallas(*args, **kw))

    assert out.shape == ref.shape
    diff = np.abs(out - ref)
    denom = np.abs(ref).sum()
    assert diff.sum() / denom < 2e-5, diff.sum() / denom
    # binning structure identical: nonzero patterns match
    assert ((np.abs(out) > 0) == (np.abs(ref) > 0)).mean() > 0.9999


def test_mxu_splits_env_validated():
    """SSQ_TPU_REASSIGN_SPLITS outside (2, 3) raises instead of silently
    mis-partitioning the stacked dot (code-review r3)."""
    import os
    import pytest
    from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas
    from ssqueeze_rs_tpu.ops.ssqueeze import plan_reassignment

    Sfs = np.linspace(0.01, 0.5, 8)
    const, mode, params = plan_reassignment(Sfs, 8, False, transform="stft")
    Wx = jnp.asarray(np.random.default_rng(0).standard_normal((8, 64))
                     + 1j * np.random.default_rng(1).standard_normal((8, 64)),
                     jnp.complex64)
    old = os.environ.get("SSQ_TPU_REASSIGN_SPLITS")
    try:
        os.environ["SSQ_TPU_REASSIGN_SPLITS"] = "1"
        with pytest.raises(ValueError, match="SPLITS"):
            reassign_pallas(Wx, Wx, jnp.asarray(const, jnp.float32), 1e-6,
                            jnp.asarray(Sfs, jnp.float32), params,
                            mode=mode, flipud=False, transform="stft", nf=8)
    finally:
        if old is None:
            os.environ.pop("SSQ_TPU_REASSIGN_SPLITS", None)
        else:
            os.environ["SSQ_TPU_REASSIGN_SPLITS"] = old


@pytest.mark.parametrize("na", [96, 92])   # 92 % 8 != 0: the r5 strip-
                                           # alignment fix (bench nf=293
                                           # class — ADVICE r4 high)
@pytest.mark.parametrize("case", ["banded", "fallback", "near_strip"])
def test_banded_variant_matches_baseline(monkeypatch, case, na):
    """SSQ_TPU_REASSIGN_BAND (r4): the per-tile dynamic band + static
    low-frequency strip is BITWISE-equal to the full loop — in the
    banded branch (concentrated phases; it only skips adds that are
    identically zero, same row order), in the zero-out-of-band-test
    fallback (scattered phases -> full loop), and when the band center
    sits against the strip so the 8-aligned clamp BINDS (the geometry
    that was misaligned for nf % 8 != 0 before r5)."""
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas
    from ssqueeze_rs_tpu.ops.ssqueeze import plan_reassignment

    rng = np.random.default_rng(9)
    n = 1200                               # nf >= STRIP + B + 16
    nf = na
    ssq_freqs = 0.001 * 2.0 ** (np.arange(na) / 8)
    const_arr, mode, params = plan_reassignment(
        ssq_freqs, na, True, transform="cwt", cwt_scaletype="log", nv=8,
        scales=ssq_freqs.reshape(-1, 1))
    Wx = (rng.standard_normal((na, n)) + 1j * rng.standard_normal((na, n)))
    if case == "banded":
        # concentrated phase: dWx = 2*pi*f0*i*Wx -> w ~ f0 for every
        # unmasked entry (one band), plus a few rows driven to tiny w
        # (the flipud low-frequency strip)
        f0 = ssq_freqs[na // 2]
        dWx = 2 * np.pi * f0 * 1j * Wx
        dWx[:4] = 2 * np.pi * ssq_freqs[0] * 1j * Wx[:4]
        Wx[70:80] *= 1e-12                 # sub-gamma rows too
    elif case == "near_strip":
        # band center just below the static strip: lo's clip upper
        # bound binds. With flipud, small w -> high k; pick f0 so the
        # flipped bin lands ~2 rows below the 8-aligned strip start.
        sk = ((nf - 32) // 8) * 8
        f0 = ssq_freqs[nf - 1 - (sk - 2)]
        dWx = 2 * np.pi * f0 * 1j * Wx
    else:
        dWx = (rng.standard_normal((na, n))
               + 1j * rng.standard_normal((na, n)))
    gamma = 1e-6
    const_j = jnp.asarray(const_arr)
    Sfs = jnp.zeros(na)
    kw = dict(mode=mode, flipud=True, transform="cwt", nf=nf,
              interpret=True)

    # band default is ON (r4) — the baseline must disable it explicitly
    monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", "off")
    jax.clear_caches()
    base = np.asarray(reassign_pallas(jnp.asarray(Wx), jnp.asarray(dWx),
                                      const_j, gamma, Sfs, params, **kw))
    monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", "32,32")
    jax.clear_caches()   # env flag is baked into the traced kernel
    got = np.asarray(reassign_pallas(jnp.asarray(Wx), jnp.asarray(dWx),
                                     const_j, gamma, Sfs, params, **kw))
    # and through the 3-plane phase_in contract as well: w_pre computed
    # with the SAME float ops as the kernel's 4-plane branch
    # ((B*C - A*D) / (mag2 * 2pi), mask by mag2 > gamma^2) so the
    # comparison against base is BITWISE, not just finite (ADVICE r4)
    C, D = Wx.real, Wx.imag
    A, B = dWx.real, dWx.imag
    mag2 = C * C + D * D
    w_pre = np.abs((B * C - A * D) / (mag2 * 6.283185307179586))
    w_pre = np.where(mag2 > gamma * gamma, w_pre, np.inf)
    got_ph = np.asarray(reassign_pallas(
        (jnp.asarray(Wx.real), jnp.asarray(Wx.imag)),
        None, const_j, gamma, Sfs, params,
        w_plane=jnp.asarray(w_pre), **kw))
    monkeypatch.delenv("SSQ_TPU_REASSIGN_BAND")
    jax.clear_caches()
    assert np.array_equal(got, base)
    assert np.array_equal(got_ph, base)


def test_band_mode_default_and_spellings(monkeypatch):
    """Unset -> the measured default (32, 32); 'off'/'0' disable;
    malformed values raise (r4 default-on flip)."""
    from ssqueeze_rs_tpu.ops.reassign_pallas import _band_mode

    monkeypatch.delenv("SSQ_TPU_REASSIGN_BAND", raising=False)
    assert _band_mode() == (32, 32)
    for off in ("off", "0"):
        monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", off)
        assert _band_mode() is None
    monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", "64,96")
    assert _band_mode() == (64, 96)
    monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", "12,8")
    with pytest.raises(ValueError):
        _band_mode()


@pytest.mark.parametrize("G", ["4", "8"])   # na=92: 92 % 8 = 4 tail rows
def test_grouped_accumulate_matches_ungrouped(monkeypatch, G):
    """SSQ_TPU_REASSIGN_GROUP (r5): G rows' one-hot contributions summed
    in vregs before ONE output += per group (the RMW-volume fix from the
    ablation roofline). Within a group the add association changes, so
    vs G=1 the comparison is tight-allclose, not bitwise; band-vs-full
    at the SAME G stays BITWISE (identical row partition + in-group
    order on both branches)."""
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas
    from ssqueeze_rs_tpu.ops.ssqueeze import plan_reassignment

    rng = np.random.default_rng(11)
    na = nf = 92
    n = 1200
    ssq_freqs = 0.001 * 2.0 ** (np.arange(na) / 8)
    const_arr, mode, params = plan_reassignment(
        ssq_freqs, na, True, transform="cwt", cwt_scaletype="log", nv=8,
        scales=ssq_freqs.reshape(-1, 1))
    Wx = (rng.standard_normal((na, n)) + 1j * rng.standard_normal((na, n)))
    # mixed: half the rows concentrated on one bin (multi-hit bins in
    # every group), half scattered
    f0 = ssq_freqs[na // 2]
    dWx = (rng.standard_normal((na, n))
           + 1j * rng.standard_normal((na, n)))
    dWx[::2] = (2 * np.pi * f0 * 1j * Wx)[::2]
    gamma = 1e-6
    const_j = jnp.asarray(const_arr)
    Sfs = jnp.zeros(na)
    kw = dict(mode=mode, flipud=True, transform="cwt", nf=nf,
              interpret=True)

    def run():
        jax.clear_caches()
        return np.asarray(reassign_pallas(
            jnp.asarray(Wx), jnp.asarray(dWx), const_j, gamma, Sfs,
            params, **kw))

    monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", "off")
    monkeypatch.setenv("SSQ_TPU_REASSIGN_GROUP", "1")
    base = run()
    monkeypatch.setenv("SSQ_TPU_REASSIGN_GROUP", G)
    got = run()
    bar = 1e-6 * np.abs(base).max()
    assert np.allclose(got, base, atol=bar), np.abs(got - base).max()
    assert not np.array_equal(got, base) or np.abs(base).max() == 0, \
        "grouping changed nothing — the grouped path was not taken"

    # band-vs-full BITWISE at the same G (banded-branch signal)
    dWb = 2 * np.pi * f0 * 1j * Wx
    def run_b():
        jax.clear_caches()
        return np.asarray(reassign_pallas(
            jnp.asarray(Wx), jnp.asarray(dWb), const_j, gamma, Sfs,
            params, **kw))

    monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", "off")
    full_g = run_b()
    monkeypatch.setenv("SSQ_TPU_REASSIGN_BAND", "32,32")
    band_g = run_b()
    assert np.array_equal(band_g, full_g), (
        "banded != full at G=" + G + " (max diff "
        f"{np.abs(band_g - full_g).max():.3e})")
    monkeypatch.delenv("SSQ_TPU_REASSIGN_GROUP")
    monkeypatch.delenv("SSQ_TPU_REASSIGN_BAND")
    jax.clear_caches()


def test_n_out_slices_tile_alignment_slack():
    """n_out (r5 keep_align contract): inputs carry tile-alignment slack
    columns; the scatter is column-local, so Tx[:, :n_out] must be
    BITWISE-equal to reassigning the sliced inputs directly, and the
    slack columns must never leak in."""
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu.ops.reassign_pallas import reassign_pallas

    rng = np.random.default_rng(3)
    na = nf = 40
    n_out, slack = 1000, 24
    n2 = n_out + slack
    params = dict(vlmin=-7.0, dvl=0.05)
    const_j = jnp.ones((na,), jnp.float32)
    Sfs = jnp.zeros((na,), jnp.float32)
    Wx = (rng.standard_normal((na, n2)) +
          1j * rng.standard_normal((na, n2)))
    dWx = (rng.standard_normal((na, n2)) +
           1j * rng.standard_normal((na, n2)))
    kw = dict(mode="log", flipud=True, transform="cwt", nf=nf,
              interpret=True)

    full = np.asarray(reassign_pallas(
        jnp.asarray(Wx), jnp.asarray(dWx), const_j, 1e-8, Sfs, params,
        n_out=n_out, **kw))
    assert full.shape == (nf, n_out)
    ref = np.asarray(reassign_pallas(
        jnp.asarray(Wx[:, :n_out]), jnp.asarray(dWx[:, :n_out]), const_j,
        1e-8, Sfs, params, **kw))
    assert np.array_equal(full, ref), np.abs(full - ref).max()

    # batched route too
    Wb = np.stack([Wx, 2 * Wx])
    dWb = np.stack([dWx, dWx])
    fb = np.asarray(reassign_pallas(
        jnp.asarray(Wb), jnp.asarray(dWb), const_j, 1e-8, Sfs, params,
        n_out=n_out, **kw))
    rb = np.asarray(reassign_pallas(
        jnp.asarray(Wb[..., :n_out]), jnp.asarray(dWb[..., :n_out]),
        const_j, 1e-8, Sfs, params, **kw))
    assert fb.shape == (2, nf, n_out) and np.array_equal(fb, rb)
