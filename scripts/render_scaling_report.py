#!/usr/bin/env python
"""Render BENCH/BASELINE.md from the recorded r4 scaling data:

* /tmp/scaling_sessions_r4.jsonl — full sessions (2 interleaved reps per
  parallelism level, best-of per level, in-session multiprocessing control)
* /tmp/scaling_ab_r4a.jsonl / _r4b.jsonl — the config A/B sweep pairs

All sessions are reported (no window cherry-picking); the summary separates
the metrics: raw thread-ratio efficiency, efficiency on granted CPUs
(/proc/stat busy EXCLUDING steal), and engine-vs-control normalization.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent


def load(path):
    """Union of the live file and the in-repo archive (BENCH/raw/), deduped
    by record identity — /tmp may be stale (sessions appended straight to
    the archive) OR the archive may lag /tmp, and preferring either file
    whole silently drops the other's newer records (same failure class as
    the ADVICE-r4 config-keyed pair drop)."""
    seen, out = set(), []
    for p in (pathlib.Path(path),
              REPO / "BENCH" / "raw" / pathlib.Path(path).name):
        if not p.exists():
            continue
        for l in p.read_text().splitlines():
            if not l.strip():
                continue
            rec = json.loads(l)
            key = rec.get("ts") or json.dumps(rec, sort_keys=True)
            if key in seen:
                continue
            seen.add(key)
            out.append(rec)
    out.sort(key=lambda r: r.get("ts", ""))
    return out


def main() -> None:
    sessions = (load(sys.argv[1] if len(sys.argv) > 1
                     else "/tmp/scaling_sessions_r4.jsonl")
                + load("/tmp/scaling_sessions_r5.jsonl"))
    # tag records with their sweep so same-config pairs from different
    # sweeps BOTH render (ADVICE r4: config-only keying silently dropped
    # the first-sweep split4m pair — the best-efficiency pair)
    sweeps = [dict(r, _sweep=tag)
              for tag, name in (("a", "/tmp/scaling_ab_r4a.jsonl"),
                                ("b", "/tmp/scaling_ab_r4b.jsonl"))
              for r in load(name)]

    srows = []
    for i, r in enumerate(sessions, 1):
        b8, b32 = r["best"]["8"], r["best"]["32"]
        ctrl_perproc = round(r["control_speedup"] / 4, 3)
        norm = round((b32["img_s"] / b8["img_s"]) / r["control_speedup"], 3) \
            if r["control_speedup"] else None
        # a session whose timed windows saw significant CPU from processes
        # OUTSIDE the probe tree (other_box_cpu_sec >> 0; clean sessions sit
        # near 0) measured the box plus a foreign workload — still reported
        # (no window-picking), but flagged so its efficiency is not quoted
        foreign = max((run.get("other_box_cpu_sec", 0.0)
                       for rs in r["runs"].values() for run in rs), default=0.0)
        flag = " *" if foreign > 20 or r.get("note") else ""
        srows.append(
            f"| {i}{flag} | {b8['img_s']} | {b32['img_s']} | {b8['avg_cpus_busy']} | "
            f"{b32['avg_cpus_busy']} | {r['eff_raw']} | {r['eff_granted']} | "
            f"{r['control_speedup']} | {ctrl_perproc} | {norm} |")

    pairs = {}
    for r in sweeps:
        pairs.setdefault((r["_sweep"], r["config"]), {})[r["cores"]] = r
    crows, sweep_effs = [], []
    for (tag, name), p in pairs.items():
        if 8 not in p or 32 not in p:
            continue
        lo, hi = p[8], p[32]
        ratio = hi["img_s"] / lo["img_s"]
        granted = hi["avg_cpus_busy"] / lo["avg_cpus_busy"]
        eff_granted = round(ratio / granted, 3)
        sweep_effs.append(eff_granted)
        crows.append(
            f"| {name} ({tag}) | {lo['img_s']} ({lo['avg_cpus_busy']}) | "
            f"{hi['img_s']} ({hi['avg_cpus_busy']}) | {round(ratio / 4, 3)} | "
            f"{eff_granted} |")

    effs = [r["eff_granted"] for r in sessions]
    norms = [round((r["best"]["32"]["img_s"] / r["best"]["8"]["img_s"])
                   / r["control_speedup"], 3) for r in sessions]
    best_abs = max((r["best"]["32"]["img_s"] for r in sessions), default=0)
    # best granted-CPU efficiency across ALL rendered pairs — computed from
    # the archive, never hard-coded (ADVICE r4: the constant would drift)
    sweep_best_eff = max(sweep_effs, default=0.0)

    attrib = load("/tmp/scaling_attrib_r5.jsonl")
    # best granted-CPU efficiency over CONSECUTIVE (8, 32) attribution
    # pairs, computed from the records — never hard-coded (same drift rule
    # as sweep_best_eff)
    apairs = [(a, b) for a, b in zip(attrib, attrib[1:])
              if a["cores"] == 8 and b["cores"] == 32]
    aeffs = [round((b["img_s"] / a["img_s"])
                   / (b["avg_cpus_busy"] / a["avg_cpus_busy"]), 3)
             for a, b in apairs]
    best_aeff = max(aeffs, default=0.0)
    arows = []
    for r in attrib:
        per_img = {k: round(r[f"{k}_cpu_sec"] / r["n_images"] * 1000, 1)
                   for k in ("jvm", "python")}
        arows.append(
            f"| {r['cores']} | {r['img_s']} | {r['avg_cpus_busy']} | "
            f"{r['jvm_cpu_sec']} | {r['python_cpu_sec']} | "
            f"{r.get('jvm_gc_sec', '—')} | {per_img['jvm']} | "
            f"{per_img['python']} |")
    attrib_md = f"""
## Round 5: per-process attribution of the engine÷control residue

The one number r4 left unexplained — engine÷control median 0.65 — is now
attributed. /proc/<pid>/stat deltas around exactly the timed window split
whole-box busy-CPU into the JVM (scan/Arrow/py4j), the python workers (the
pixel kernels), and the driver; buckets sum to the /proc/stat total within
±3% (BENCH/raw/scaling_attrib_r5.jsonl, NOTES #24):

| cores | img/s | CPUs busy | JVM CPU-s | python CPU-s | JVM GC s | JVM ms/img | python ms/img |
|---|---|---|---|---|---|---|---|
{chr(10).join(arows)}

For identical work, python kernel CPU inflates +23-56% at 32 cores — the
same occupancy collapse the framework-free control shows — while JVM CPU
inflates +61-152% with GC ruled out (<0.3% of JVM time). Best r5
attribution pair: granted-CPU efficiency **{best_aeff}**, consistent with
the r4 distribution. The extra JVM term
is the single-JVM local-mode artifact (one JVM serving 32 workers instead
of 8); the multiprocessing control has no such shared component, which is
exactly why engine÷control < 1 here. A real 4×8-core cluster runs each
executor JVM at the measured local[8] profile (~11 ms-CPU/img) with
per-node memory bandwidth — it inherits neither inflation term.
""" if attrib else ""

    md = f"""# BENCH — measured numbers (this sandbox), rounds 4-6

## Scaling efficiency (north-rule evidencing: N vs 4N on one VM)

No real cluster exists in this sandbox, so per the driver protocol the SAME
job (the flagship `cog_pipeline` over 19200 images, ~68 GB decoded pixels,
146 880 tiles) runs at `local[8]` and `local[32]`, each in a fresh JVM,
shuffle partitions = cores, pixel-scan splits 4m (the r4 A/B winner, below),
TWO interleaved reps per level per session (lo,hi,lo,hi — best-of-2), plus an
in-session framework-free control (identical pixel kernel under plain
`multiprocessing`). {len(sessions)} full sessions (15 from r4, 12 from
r5 post strip-path optimizations, 5 from r6 post task-count/routing
optimizations — the r6 sessions are the ones with both-level absolute
throughput far above the rest), ALL reported:

| session | img/s @8 | img/s @32 | CPUs busy @8 | @32 | raw eff (÷4) | eff on granted CPUs | control speedup 8→32 | control per-proc speed @32 vs @8 | engine ÷ control |
|---|---|---|---|---|---|---|---|---|---|
{chr(10).join(srows)}

`*` = the timed windows saw significant CPU from processes outside the
probe tree (`other_box_cpu_sec` ≫ 0 in the raw record; clean sessions sit
near 0) — e.g. the build harness's own test suite running concurrently.
Flagged sessions are reported (no window-picking) but their efficiencies
measure the box plus a foreign workload and are not quoted.

**Metric definitions.** *Granted CPUs* = whole-box /proc/stat busy
(user+nice+system+irq+softirq) during exactly the timed window, EXCLUDING
idle, iowait, and steal — `local[N]` keeps ~1.2N CPUs busy (the JVM
scan/Arrow threads run concurrently with the Python workers), so the raw ÷4
ratio under-credits the 8-core side. *Engine ÷ control* divides the engine's
8→32 throughput ratio by the framework-free control's ratio measured minutes
apart in the same session — the box-weather-normalized number.

## What bounds the number: occupancy-dependent core speed, not the plan

Round-4 instrumentation (scripts/scaling_flagship.py) separates steal from
busy and shows **reported steal is ~zero all day** (≤0.06 CPUs) — yet
per-busy-CPU work rate swings hugely with box occupancy and time:

* the engine's kernel does 22–30 img per busy-CPU-second when ≤10 CPUs are
  busy, and 10–20 when ≥25 CPUs are busy — same code, same input;
* the CONTROL (no Spark, no JVM, no Arrow) shows the same collapse: its
  per-process speed at 32 procs is {min(round(r['control_speedup']/4,2) for r in sessions)}–{max(round(r['control_speedup']/4,2) for r in sessions)}x its 8-proc speed
  across sessions (1.0 would be contention-free);
* consecutive paired runs flip regimes: one sweep measured `local[8]` +30%
  while `local[32]` −20% within 15 minutes.

The host overcommits invisibly (degraded IPC without steal accounting), so
single-session ratios are weather; the distribution is the measurement. Best
windows: **granted-CPU efficiency {sweep_best_eff}** (split4m pair, first
sweep), session range {min(effs)}–{max(effs)}; engine ÷ control
{min(norms)}–{max(norms)} (≥1 = the Spark pipeline scales at least as well
as the framework-free kernel); best absolute {best_abs} img/s this round
(512.3 in the config sweep) vs r3's 340–514.

The r3 4-concurrent-JVM topology experiment stands: once ~30 CPUs are busy
the box adds nothing for ANY process shape. The flagship plan remains a
fused ZERO-SHUFFLE narrow kernel — no exchange, no barrier, no driver
round-trip caps a real 4x-executor cluster, and each real executor brings
its own scan/Arrow/IPC capacity (in local mode one JVM serves all cores).

## Config A/B (r4, VERDICT #5 levers; scripts/scaling_ab.py)

Paired lo/hi runs per config (single reps — treat deltas inside one sweep as
comparable, across sweeps as weather):

| config | img/s @8 (busy) | img/s @32 (busy) | raw eff | eff granted |
|---|---|---|---|---|
{chr(10).join(crows)}

Findings: **4m pixel-scan splits** (vs the 1m used at 480-image bench scale)
cut the scan's task count 4x and JVM busy-CPU ~12% at both levels with
equal-or-better wall — adopted for scaling runs via SPARK_GRAFT_SPLIT_BYTES
(bench.py; 1m remains right at 480 images where 4m would leave fewer tasks
than cores). 8m splits starve the 32-core tail (165 tasks). Arrow
maxBytesPerBatch 32m vs 64m is within noise; 128m is slightly worse.
python worker reuse is already on (Spark default); the daemon preload
(NOTES #3) stays.

{attrib_md}
## Per-query timings

See BENCH_r{{N}}.json (driver-captured per round) and README "Measured".

## Config pinned across all runs

- spark.sql.shuffle.partitions = cores; driver 8g (24g measured SLOWER, r3)
- spark.sql.adaptive.enabled / coalescePartitions / skewJoin = true
- Arrow maxRecordsPerBatch=10000 + maxBytesPerBatch=64m; pixel kernels
  flush output by accumulated payload bytes
- pixel-stage splits: 1m at 480-image bench scale, 4m at 19200 (r4 A/B);
  openCostInBytes=0; metadata/spatial queries keep 128m defaults
- input generated by cogger_spark.fixtures (seed-free closed form)

Raw JSON (sessions, then sweep pairs):

```json
{chr(10).join(json.dumps({k: r[k] for k in ('ts', 'best', 'control_wall_s', 'throughput_ratio', 'granted_cpu_ratio', 'eff_raw', 'eff_granted', 'control_speedup', 'note') if k in r}) for r in sessions)}
{chr(10).join(json.dumps(r) for r in sweeps)}
```
"""
    out = REPO / "BENCH" / "BASELINE.md"
    out.write_text(md)
    print(f"wrote {out} ({len(sessions)} sessions, {len(crows)} sweep pairs)")


if __name__ == "__main__":
    main()
