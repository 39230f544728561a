"""Grid-step overhead slope probe.

mxu_probe2's q_floor (4.68 ms at GRID=128) is ambiguous: per-call
dispatch and per-step sequencing are conflated. Timing the SAME trivial
kernel at GRID in {64, 256, 1024} gives the per-step cost as the slope,
independent of dispatch. Also times a variant whose output block index
map VARIES per step (the real kernels' pattern) vs the constant-map
floor kernel, and a 2.56 MB/step output-DMA variant matching the cwt
kernel's per-step write volume.

Run: python tools/grid_slope_probe.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, args, K=8, reps=3, tag=""):
    out = fn(*args, 0)
    _ = float(out)
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args, r * K + i + 1) for i in range(K)]
        _ = float(outs[-1])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag:28s} {best*1e3:8.3f} ms/call", flush=True)
    return best


def build(grid, per_step_rows, L, vary_out):
    """Trivial kernel: grid steps, each writing (per_step_rows, L) f32."""
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    if vary_out:
        out_shape = (grid * per_step_rows, L)
        omap = lambda i: (i, 0)
    else:
        out_shape = (per_step_rows, L)
        omap = lambda i: (0, 0)
    f = pl.pallas_call(
        kernel, grid=(grid,),
        in_specs=[pl.BlockSpec((per_step_rows, L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((per_step_rows, L), omap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )

    @jax.jit
    def wrapped(x, i):
        return jnp.sum(f(x + jnp.asarray(i, jnp.float32) * 0)[0])

    return wrapped


def main():
    print(f"device {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # slope of the tiny constant-map kernel
    X = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    ts = {}
    for g in (64, 256, 1024):
        ts[g] = timed(build(g, 8, 128, False), (X,), tag=f"tiny const g={g}")
    slope = (ts[1024] - ts[64]) / (1024 - 64)
    print(f"per-step cost (tiny, const out map): {slope*1e6:.2f} us",
          flush=True)

    # varying output map (real-kernel pattern), still tiny blocks
    ts2 = {}
    for g in (64, 256, 1024):
        ts2[g] = timed(build(g, 8, 128, True), (X,), tag=f"tiny vary g={g}")
    slope2 = (ts2[1024] - ts2[64]) / (1024 - 64)
    print(f"per-step cost (tiny, varying out map): {slope2*1e6:.2f} us",
          flush=True)

    # cwt-like output volume: (1, 160000)-ish f32 per step, varying map
    L = 163840  # 1280 lanes x 128, ~the headline's 160k row
    X2 = jnp.asarray(rng.standard_normal((1, L)), jnp.float32)
    ts3 = {}
    for g in (37, 148, 293):
        ts3[g] = timed(build(g, 1, L, True), (X2,), K=4,
                       tag=f"row-out vary g={g}")
    slope3 = (ts3[293] - ts3[37]) / (293 - 37)
    print(f"per-step cost (640 KB/step out): {slope3*1e6:.2f} us "
          f"(pure DMA would be ~0.8 us)", flush=True)


if __name__ == "__main__":
    main()
