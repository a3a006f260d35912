#!/usr/bin/env python
"""A/B harness for the granted-CPU scaling levers (VERDICT r3 #5).

Runs scaling_flagship.py in fresh subprocesses over a config matrix,
interleaving local[8] and local[32] within each config so the VM's
minute-scale steal-time swings hit both sides of every ratio. Appends one
JSON line per run to the --out file; a summary per config prints at the end:

    eff_granted = (img_s_hi / img_s_lo) / (cpu_busy_hi / cpu_busy_lo)

Never run other Spark jobs concurrently with this (NOTES.md: ±30% steal).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

PROBE = str(pathlib.Path(__file__).parent / "scaling_flagship.py")

CONFIGS = {
    "base64m": [],
    "arrow32m": ["--conf", "spark.sql.execution.arrow.maxBytesPerBatch=33554432"],
    "arrow128m": ["--conf", "spark.sql.execution.arrow.maxBytesPerBatch=134217728"],
    "split4m": ["--split-bytes", "4m"],
    "split8m": ["--split-bytes", "8m"],
    "split4m_arrow32m": ["--split-bytes", "4m", "--conf",
                         "spark.sql.execution.arrow.maxBytesPerBatch=33554432"],
    "split8m_arrow32m": ["--split-bytes", "8m", "--conf",
                         "spark.sql.execution.arrow.maxBytesPerBatch=33554432"],
}


def run_probe(cores: int, extra_args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, PROBE, "--cores", str(cores)] + extra_args,
        capture_output=True, text=True, timeout=1200)
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    if not line:
        raise RuntimeError(f"probe produced no output:\n{out.stderr[-2000:]}")
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scaling_ab.jsonl")
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()
    names = [n for n in args.configs.split(",") if n]
    outp = pathlib.Path(args.out)

    results: dict[str, list[tuple[dict, dict]]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            lo = run_probe(8, CONFIGS[name])
            hi = run_probe(32, CONFIGS[name])
            for rec in (lo, hi):
                rec["config"] = name
                rec["rep"] = rep
                with outp.open("a") as f:
                    f.write(json.dumps(rec) + "\n")
            results[name].append((lo, hi))
            eff_g = (hi["img_s"] / lo["img_s"]) / (hi["avg_cpus_busy"] / lo["avg_cpus_busy"])
            print(json.dumps({
                "config": name, "rep": rep,
                "img_s_8": lo["img_s"], "img_s_32": hi["img_s"],
                "busy_8": lo["avg_cpus_busy"], "busy_32": hi["avg_cpus_busy"],
                "eff_raw": round((hi["img_s"] / lo["img_s"]) / 4, 3),
                "eff_granted": round(eff_g, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
