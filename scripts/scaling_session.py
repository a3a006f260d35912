#!/usr/bin/env python
"""One full scaling-evidence session for the north rule (run 3x, ~10 min
each): the flagship probe at local[8] and local[32], two reps per level
interleaved (lo,hi,lo,hi — the VM's minute-scale steal swings then hit both
sides), plus the in-session framework-free multiprocessing control. Appends
one session record to --out; BENCH/BASELINE.md is written from those
records.

Config under test: split4m (spark.sql.files.maxPartitionBytes=4m for the
pixel scan) — the r4 A/B winner: ~4x fewer scan tasks cuts JVM busy-CPU
~12% at both levels with equal-or-better wall time (scripts/scaling_ab.py,
/tmp/scaling_ab_r4*.jsonl).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

PROBE = str(pathlib.Path(__file__).parent / "scaling_flagship.py")
IMAGES = "/tmp/cogger_bench_19200/images.parquet"


def probe(cores: int, split: str) -> dict:
    out = subprocess.run(
        [sys.executable, PROBE, "--cores", str(cores), "--split-bytes", split],
        capture_output=True, text=True, timeout=1200)
    if not out.stdout.strip():
        raise RuntimeError(f"probe failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scaling_sessions_r4.jsonl")
    ap.add_argument("--split", default="4m")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    runs: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(args.reps):
        for cores in (8, 32):
            runs[cores].append(probe(cores, args.split))

    from bench_scaling import mp_baseline
    ctrl = {c: mp_baseline(IMAGES, c) for c in (8, 32)}

    best = {c: max(rs, key=lambda r: r["img_s"]) for c, rs in runs.items()}
    granted = best[32]["avg_cpus_busy"] / best[8]["avg_cpus_busy"]
    ratio = best[32]["img_s"] / best[8]["img_s"]
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "split": args.split,
        "runs": runs,
        "best": best,
        "control_wall_s": ctrl,
        "throughput_ratio": round(ratio, 3),
        "granted_cpu_ratio": round(granted, 3),
        "eff_raw": round(ratio / 4, 3),
        "eff_granted": round(ratio / granted, 3),
        "control_speedup": round(ctrl[8] / ctrl[32], 3),
    }
    with pathlib.Path(args.out).open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("throughput_ratio", "granted_cpu_ratio", "eff_raw",
                       "eff_granted", "control_speedup")} |
                     {"img_s_8": best[8]["img_s"], "img_s_32": best[32]["img_s"],
                      "busy_8": best[8]["avg_cpus_busy"],
                      "busy_32": best[32]["avg_cpus_busy"]}))


if __name__ == "__main__":
    main()
