"""Regenerate every published benchmark table from driver-captured JSON.

VERDICT r2 weak #2: docs must never claim numbers the driver didn't
measure. This script is the ONLY way headline tables change:

  * finds the newest BENCH_r*.json (the driver's record of `python
    bench.py` on the real chip), parses the extras line (per-transform
    seconds + speedups),
  * rewrites the README block between BENCH_TABLE_START/END markers,
  * prints the one-line summary to paste anywhere else numbers are
    quoted (CLAUDE.md bench-status, docs/DESIGN.md).

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


if __name__ == "__main__":
    main()
