"""Predicted-vs-measured collective-overhead model (VERDICT r3 #4).

The one REAL scaling signal this environment can produce is the
multi-process CPU-mesh weak-scaling row set (the virtual single-process
rows share host cores and bound nothing). This tool closes the loop on
it:

1. `comm_report` (parallel/chunked.py) counts the bytes each device
   sends per collective for the bench config (ssq_cwt weak scaling,
   N = 8192 * 8, 8 devices, scales='log', nv=8 — the same config the
   SCALING.json rows measure).
2. The cross-process traffic model: with P processes over an 8-device
   ring, ring collectives (ppermute halos, all_gather) cross process
   boundaries on exactly P edges; the all_to_all's uniform pairwise
   traffic crosses on (n - n/P)/(n-1) of its bytes. Everything else is
   intra-process memcpy, charged to the 1-process baseline.

       overhead = T_weak(P procs) - T_weak(1 proc)
                = X_cross / BW + C

   BW = effective cross-process bandwidth (localhost TCP/shm transport
   of jax.distributed), C = fixed distributed-mode cost per step.
3. THIS HOST HAS ONE CORE, so varying P confounds comm with core
   thrash (measured: P=8 overhead 4.1 s vs ~0.45 s from the byte
   model — pure oversubscription). The fit therefore varies the BYTES
   at FIXED P=2 (three weak-scaling sizes; the contention term is a
   constant absorbed into C): fit (BW, C) on the outer two sizes,
   VALIDATE on the middle one, plus a P=4 consistency check. Rows +
   fit + prediction errors go into SCALING.json.
4. The same comm model with v5p ICI constants produces the shard-length
   statement for the >= 90% BASELINE target (printed + SCALING.json).

Run: python tools/comm_model.py [--skip-measure]
"""
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DEV = 8
N_BASE = 8192
NV = 8


def cross_bytes(rep: dict, P: int, n: int = N_DEV) -> int:
    """Bytes crossing process boundaries per weak-scaling step, from a
    comm_report dict, for P processes over an n-device ring."""
    if P <= 1:
        return 0
    total = 0
    S = rep["S"]
    item = np.dtype(rep["dtype"]).itemsize
    for e in rep["collectives"]:
        if e["op"] == "ppermute":
            # per ring edge: the halo samples that edge carries (both
            # directions combined = the per-device send total)
            per_edge = e["bytes_per_device"] * e["calls"]
            total += P * per_edge
        elif e["op"] == "all_gather":
            # ring all_gather: every edge carries (n-1) shard blocks
            per_edge = e["bytes_per_device"]      # = (n-1) * S * item
            total += P * per_edge
        elif e["op"] == "all_to_all":
            # uniform pairwise: fraction of bytes with the peer in
            # another process = (n - n/P) / (n - 1)
            frac = (n - n // P) / (n - 1)
            total += int(e["calls"] * n * e["bytes_per_device"] * frac)
    return total


def fit_line(points):
    """points: list of (cross_bytes, overhead_s). Least-squares
    overhead = bytes/BW + C. Returns (inv_bw, C)."""
    X = np.array([p[0] for p in points], float)
    Y = np.array([p[1] for p in points], float)
    A = np.stack([X, np.ones_like(X)], axis=1)
    (inv_bw, C), *_ = np.linalg.lstsq(A, Y, rcond=None)
    return float(inv_bw), float(C)


def v5p_statement(bw_ici=9e10, lat_coll=1e-6, msps_chip=4.45e6,
                  n_chips=16):
    """Shard length S at which a v5p-16 weak-scaling ssq_cwt hits 90%.

    Assumptions (documented, not measured — no pod hardware here):
    ICI ~90 GB/s usable per link (public v5p: 4.8 Tb/s total across 6
    links; one ring direction), ~1 us per collective hop, single-chip
    ssq_cwt throughput = the measured BENCH headline (4.45 MSamples/s).
    eff(S) = 1 / (1 + comm(S)/compute(S)) with comm = bytes/BW + calls*lat.
    """
    from ssqueeze_rs_tpu.parallel.chunked import comm_report
    rows = []
    S_star = None
    for S in (4096, 8192, 16384, 32768, 65536, 131072, 262144):
        rep = comm_report("ssq_cwt", S * n_chips, n_chips,
                          scales="log", nv=NV, dtype="float32")
        comm = (rep["total_bytes_per_device"] / bw_ici
                + rep["total_calls"] * lat_coll)
        compute = S / msps_chip
        eff = 1.0 / (1.0 + comm / compute)
        rows.append(dict(S=S, comm_ms=round(comm * 1e3, 3),
                         compute_ms=round(compute * 1e3, 3),
                         eff=round(eff, 4)))
        if S_star is None and eff >= 0.90:
            S_star = S
    return dict(assumptions=dict(bw_ici_gbps=bw_ici / 1e9,
                                 lat_per_collective_us=lat_coll * 1e6,
                                 chip_msps=msps_chip / 1e6,
                                 n_chips=n_chips),
                rows=rows, S_90pct=S_star)


def main():
    skip = "--skip-measure" in sys.argv
    from ssqueeze_rs_tpu.parallel.chunked import comm_report
    rep = comm_report("ssq_cwt", N_BASE * N_DEV, N_DEV,
                      scales="log", nv=NV, dtype="float32")
    print("comm_report:", json.dumps(rep), flush=True)

    path = os.path.join(REPO, "SCALING.json")
    data = json.load(open(path))

    if not skip:
        import scaling_bench as sb
        # This host has ONE core (nproc=1): varying the PROCESS COUNT
        # confounds comm with core thrash (measured: P=8 overhead 4.1 s
        # vs 0.45 s extrapolated — pure oversubscription). So the model
        # is fitted/validated by varying the BYTES at FIXED P=2 (three
        # weak-scaling sizes; contention is then a constant absorbed
        # into C), with the P=4 point reported as a byte-model
        # consistency check, not a validation point.
        sb._setup_cpu(N_DEV)
        from ssqueeze_rs_tpu.parallel import make_mesh
        import jax
        mesh = make_mesh((1, N_DEV), ("data", "time"),
                         devices=jax.devices()[:N_DEV])

        sizes = (4096, 8192, 16384)
        points = []      # (cross_bytes, overhead, dict-row)
        os.environ["SCALING_K"] = "8"   # workers read it at import
        sb.K = 8                        # this process already imported
        for NB in sizes:
            # interleave baseline around the 2-proc run (1-core host:
            # scheduler/thermal drift between runs exceeds the comm
            # signal; min over surrounding baselines cancels the bias)
            t1a = sb._bench_one(mesh, "ssq_cwt", NB * N_DEV)
            os.environ["SCALING_N_BASE"] = str(NB)
            r2 = sb.multi_process(2)
            t1b = sb._bench_one(mesh, "ssq_cwt", NB * N_DEV)
            t1 = min(t1a, t1b)
            repN = comm_report("ssq_cwt", NB * N_DEV, N_DEV,
                               scales="log", nv=NV, dtype="float32")
            xb = cross_bytes(repN, 2)
            ov = r2["weak_s"] - t1
            row = dict(transform="ssq_cwt", devices=N_DEV, processes=2,
                       n_base=NB, weak_s=r2["weak_s"],
                       weak_1proc_s=round(t1, 4),
                       eff_vs_1proc=round(t1 / r2["weak_s"], 3),
                       cross_bytes=xb,
                       measured_overhead_s=round(ov, 4))
            points.append((xb, ov, row))
            print(f"NB={NB}: t1={t1:.4f} t2={r2['weak_s']:.4f} "
                  f"ov={ov:.4f} xbytes={xb}", flush=True)
        os.environ["SCALING_N_BASE"] = str(N_BASE)

        # fit on the outer two sizes, validate on the middle
        inv_bw, C = fit_line([(points[0][0], points[0][1]),
                              (points[2][0], points[2][1])])
        for xb, ov, row in points:
            row["predicted_overhead_s"] = round(xb * inv_bw + C, 4)
        mid = points[1]
        val_err = abs((mid[0] * inv_bw + C) - mid[1]) / max(abs(mid[1]),
                                                            1e-12)
        # consistency check at P=4 (same bytes model, different P)
        t1_8k = points[1][2]["weak_1proc_s"]
        r4 = sb.multi_process(4)
        rep8k = comm_report("ssq_cwt", 8192 * N_DEV, N_DEV,
                            scales="log", nv=NV, dtype="float32")
        ov4 = r4["weak_s"] - t1_8k
        pred4 = cross_bytes(rep8k, 4) * inv_bw + C
        r4.update(n_base=8192, eff_vs_1proc=round(t1_8k / r4["weak_s"], 3),
                  cross_bytes=cross_bytes(rep8k, 4),
                  measured_overhead_s=round(ov4, 4),
                  predicted_overhead_s=round(pred4, 4))
        print(f"P=4 check: ov={ov4:.4f} pred={pred4:.4f}", flush=True)

        fit = dict(
            method="vary bytes at fixed P=2 (1-core host: varying P "
                   "confounds comm with core thrash)",
            note="SNR ~1: per-step overhead is 2-4% of weak_s while "
                 "1-core run variance is the same order, so bw_gbps is "
                 "order-of-magnitude only. The BYTE accounting "
                 "(comm_report/cross_bytes) is exact by construction; "
                 "the v5p projection rests on it + documented ICI "
                 "constants, not on this fit.",
            fit_on_n_base=[sizes[0], sizes[2]],
            bw_gbps=round(1e-9 / inv_bw, 4) if inv_bw > 0 else None,
            fixed_cost_s=round(C, 4),
            validation_n_base=sizes[1],
            validation_rel_err=round(val_err, 3),
            p4_consistency=dict(measured=round(ov4, 4),
                                predicted=round(pred4, 4)),
        )
        mp_rows = [p[2] for p in points] + [r4]
        # replace old multi-process rows with the fresh, modeled set
        data["rows"] = ([r for r in data["rows"]
                         if r.get("processes", 1) == 1] + mp_rows)
        data["comm_model"] = dict(config=rep, fit=fit)
        print("fit:", json.dumps(fit), flush=True)

    data["v5p16_projection"] = v5p_statement()
    json.dump(data, open(path, "w"), indent=1)
    print("v5p16:", json.dumps(data["v5p16_projection"]), flush=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
