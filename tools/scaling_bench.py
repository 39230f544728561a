"""Scaling-efficiency harness: throughput of the sharded transforms at
1/2/4/8 devices (strong + weak scaling), BENCH-style JSON output.

Measures `chunked_stft` and `chunked_ssq_cwt` over a (1, n_time) mesh:

  strong scaling: fixed global N, more time shards;
  weak scaling:   N grows with the shard count (fixed N per shard).

Efficiency = throughput(n) / (n * throughput(1)) for weak scaling and
throughput(n) / throughput(1) / 1 for strong (ideal = 1.0 in both).

On a CPU host the "devices" are virtual (xla_force_host_platform_
device_count) and share the same cores, so CPU numbers are a PROXY:
they bound the sharding/collective OVERHEAD (efficiency ~1.0 means the
halo exchange and hybrid global-FFT path add negligible cost), not real
chip speedup. Run the same script on a TPU pod slice for true scaling
(tools/launch_pod.sh): the mesh comes from jax.devices() either way.
Multi-process rows (2/4 processes via tools/multihost_test.py infra)
are included with --procs.

Targets BASELINE.md:38-41 (>= 90% multi-host scaling efficiency).

Usage:
  python tools/scaling_bench.py                  # single process
  python tools/scaling_bench.py --procs 2 4      # add multi-process rows
  python tools/scaling_bench.py --out SCALING.json
Internal: `worker <n_procs> <pid> <port> <n_time>` runs one member of a
multi-process measurement and prints its local wall time.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BASE = int(os.environ.get("SCALING_N_BASE", 8192))   # per-shard (weak)
N_STRONG = int(os.environ.get("SCALING_N_STRONG", 16384))  # global (strong)
NV = 8
HOP = 4                 # hop=1 on the CPU proxy is compute-dominated
K = int(os.environ.get("SCALING_K", 3))   # timed iterations (best-of)


def _setup_cpu(n_devices: int):
    # NOTE: the axon sitecustomize imports jax at interpreter start, so
    # env vars set here are too late for jax's import-time config read —
    # use jax.config.update (backends initialize lazily at first use,
    # same trick as tests/conftest.py)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{n_devices}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def _bench_one(mesh, transform: str, N: int, axis="time"):
    """Best-of-K wall seconds for one sharded transform at global N."""
    import jax
    import jax.numpy as jnp
    from ssqueeze_rs_tpu.parallel import (chunked_stft, chunked_ssq_cwt,
                                          chunked_istft)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    if transform == "istft":
        # inverse leg of the round trip: shard the forward ONCE at
        # setup, time the frame-halo OLA inverse
        Sx = chunked_stft(x, mesh, n_fft=256, hop_len=HOP,
                          dtype="float32")
        Sx = jax.block_until_ready(Sx)

    # big arrays as jit ARGUMENTS, never closure constants (CLAUDE.md:
    # closure-captured device arrays re-fetch for constant embedding)
    def run(big, i):
        if transform == "istft":
            out = chunked_istft(big * (1.0 + i * 1e-12), mesh, n_fft=256,
                                hop_len=HOP, N=N)
            return jnp.sum(jnp.abs(out))
        xx = big + i * 1e-12
        if transform == "stft":
            out = chunked_stft(xx, mesh, n_fft=256, hop_len=HOP,
                               dtype="float32")
            return jnp.sum(jnp.abs(out))
        out = chunked_ssq_cwt(xx, mesh, scales="log", nv=NV,
                              dtype="float32")[0]
        return jnp.sum(jnp.abs(out))

    big = Sx if transform == "istft" else x
    jitted = jax.jit(run)
    float(jitted(big, 0))               # compile
    best = float("inf")
    for i in range(K):
        t0 = time.perf_counter()
        float(jitted(big, i + 1))
        best = min(best, time.perf_counter() - t0)
    return best


def single_process(device_counts, transforms):
    import jax
    from ssqueeze_rs_tpu.parallel import make_mesh

    rows = []
    avail = len(jax.devices())
    for transform in transforms:
        base_strong = base_weak = None
        for n in device_counts:
            if n > avail:
                continue
            mesh = make_mesh((1, n), ("data", "time"),
                             devices=jax.devices()[:n])
            t_s = _bench_one(mesh, transform, N_STRONG)
            t_w = _bench_one(mesh, transform, N_BASE * n)
            if n == device_counts[0]:
                base_strong, base_weak = t_s * n, t_w  # normalize to n=1
            rows.append(dict(
                transform=transform, devices=n, processes=1,
                strong_s=round(t_s, 4),
                strong_msps=round(N_STRONG / t_s / 1e6, 3),
                # strong: ideal t(n) = t(1)/n -> eff = t(1) / (n * t(n))
                strong_eff=round(base_strong / (n * t_s), 3),
                weak_s=round(t_w, 4),
                weak_msps=round(N_BASE * n / t_w / 1e6, 3),
                # weak: ideal t(n) = t(1) -> eff = t(1) / t(n)
                weak_eff=round(base_weak / t_w, 3),
            ))
            print(json.dumps(rows[-1]), flush=True)
    return rows


def mp_worker(n_procs: int, pid: int, port: int, n_time: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    # (workers are spawned with JAX_PLATFORMS=cpu in their env too)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_procs, process_id=pid)
    from jax.sharding import PartitionSpec as P
    from ssqueeze_rs_tpu.parallel import (make_host_chip_mesh,
                                          global_from_local)
    from ssqueeze_rs_tpu.parallel import chunked_ssq_cwt
    import jax.numpy as jnp

    mesh = make_host_chip_mesh(time_parallel=n_time)
    N = N_BASE * n_time
    S_loc = N // n_procs
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N).astype(np.float32)
    xg = global_from_local(x[pid * S_loc:(pid + 1) * S_loc], mesh,
                           P("time"))

    def run(xx):
        out = chunked_ssq_cwt(xx, mesh, scales="log", nv=NV,
                              dtype="float32")[0]
        return jnp.sum(jnp.abs(out))

    jitted = jax.jit(run)
    float(jitted(xg))
    best = float("inf")
    for _ in range(K):
        t0 = time.perf_counter()
        float(jitted(xg))
        best = min(best, time.perf_counter() - t0)
    if pid == 0:
        print(f"MPRESULT {json.dumps(dict(n_procs=n_procs, n_time=n_time, N=N, best_s=round(best, 4)))}",
              flush=True)


def multi_process(n_procs: int):
    """Spawn an n_procs ssq_cwt measurement (8 virtual devices total)."""
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    dev_per_proc = 8 // n_procs
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                          f" --xla_force_host_platform_device_count="
                          f"{dev_per_proc}"),
               PYTHONPATH=REPO)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker",
         str(n_procs), str(i), str(port), "8"],
        env=env, stdout=subprocess.PIPE, text=True) for i in range(n_procs)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), \
        [p.returncode for p in procs]
    for o in outs:
        for line in o.splitlines():
            if line.startswith("MPRESULT "):
                r = json.loads(line[len("MPRESULT "):])
                t = r["best_s"]
                return dict(transform="ssq_cwt", devices=8,
                            processes=n_procs, weak_s=t,
                            weak_msps=round(r["N"] / t / 1e6, 3))
    raise RuntimeError("no MPRESULT line")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        mp_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                  int(sys.argv[5]))
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", nargs="*", type=int, default=[])
    ap.add_argument("--out", default=None)
    ap.add_argument("--devices", nargs="*", type=int,
                    default=[1, 2, 4, 8])
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS", "") != "tpu":
        _setup_cpu(max(args.devices))

    import jax
    rows = single_process(args.devices, ("stft", "istft", "ssq_cwt"))
    mp_rows = []
    for np_ in args.procs:
        r = multi_process(np_)
        # efficiency vs the single-process 8-device weak row
        base = next((x for x in rows
                     if x["transform"] == "ssq_cwt" and x["devices"] == 8),
                    None)
        if base:
            r["eff_vs_1proc"] = round(r["weak_msps"] / base["weak_msps"], 3)
        mp_rows.append(r)
        print(json.dumps(r), flush=True)

    result = dict(
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        note=("virtual CPU devices share host cores: efficiencies bound "
              "sharding/collective overhead, not real chip speedup "
              "(run on a pod slice for true scaling)"),
        n_base=N_BASE, n_strong=N_STRONG, nv=NV,
        rows=rows + mp_rows,
    )
    out = args.out or os.path.join(REPO, "SCALING.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
