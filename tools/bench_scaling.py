"""Scaling-efficiency evidence: the SAME KG job on the SAME input at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for N vs
4N executors per BASELINE.json). Writes BENCH/BASELINE.md.

Method: a deterministic transcript corpus is materialized to parquet
once; each run starts a fresh JVM (subprocess), warms the Python worker
pool and codegen with a small pass, then times the full extraction job
(read -> distant tagging -> frozen-scorer inference -> triple assembly
-> count). Efficiency = T_low / (scale * T_high).

Usage: python tools/bench_scaling.py [n_convs] [--quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_ONE = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from denrl_spark.session import get_spark
from denrl_spark.sources.kb import KB
from denrl_spark.operators.fused import extract_triples_fused

cpus = {cpus}
spark = get_spark(cpus, app_name="scaling", extra_conf={{"spark.ui.showConsoleProgress": "false"}})
kb = KB.default()

# warm-up: spin up Python workers + codegen on a small slice
extract_triples_fused(spark.read.parquet({inp!r}).limit(2000), kb, mode="pred").count()

tr = spark.read.parquet({inp!r})
t0 = time.time()
# fused extraction: text in, triples out, one Arrow pass (prediction path)
n_triples = extract_triples_fused(tr, kb, mode="pred").count()
dt = time.time() - t0
n_turns = tr.count()
print(json.dumps({{"cpus": cpus, "sec": round(dt, 3), "turns": n_turns,
                   "triples": n_triples,
                   "turns_per_sec": round(n_turns / dt, 1),
                   "triples_per_sec": round(n_triples / dt, 1)}}))
"""


def materialize_input(n_convs: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    code = f"""
import sys; sys.path.insert(0, {ROOT!r})
from denrl_spark.session import get_spark
from denrl_spark.sources.corpus import transcripts
spark = get_spark(32, app_name="gen", extra_conf={{"spark.ui.showConsoleProgress": "false"}})
transcripts(spark, {n_convs}, seed=42).write.mode("overwrite").parquet({path!r})
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def run_at(cpus: int, inp: str) -> dict:
    """One fresh-JVM run pinned to exactly ``cpus`` hardware cores via
    taskset. Pinning: in local mode, chained Arrow-UDF stages spawn
    multiple Python workers per task, which would otherwise borrow the
    idle cores and silently inflate the low-parallelism run."""
    code = RUN_ONE.format(root=ROOT, cpus=cpus, inp=inp)
    cmd = [sys.executable, "-c", code]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, check=True, capture_output=True, text=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_pair(c_lo: int, c_hi: int, inp: str, reps: int = 3) -> dict:
    """Median-of-``reps`` PER-REP efficiency with lo/hi runs interleaved
    (lo,hi,lo,hi,...). This shared VM shows +/-30% wall-time spread at
    full 32-core width and drifts on minute timescales, so (a) single
    samples routinely fake +/-0.15 efficiency either way and (b)
    running all lo reps then all hi reps lets a slow period land
    entirely on one end. Interleaving pairs each lo with a
    temporally-adjacent hi so drift cancels inside each rep."""
    reps_out = []
    for _ in range(reps):
        lo = run_at(c_lo, inp)
        hi = run_at(c_hi, inp)
        eff = lo["sec"] / ((c_hi / c_lo) * hi["sec"])
        reps_out.append({"lo": lo, "hi": hi, "efficiency": round(eff, 3)})
    reps_out.sort(key=lambda r: r["efficiency"])
    med = dict(reps_out[len(reps_out) // 2])
    med["all_efficiencies"] = [r["efficiency"] for r in reps_out]
    med["lo_secs"] = [r["lo"]["sec"] for r in reps_out]
    med["hi_secs"] = [r["hi"]["sec"] for r in reps_out]
    return med


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = [a for a in sys.argv[1:] if a.startswith("--")]
    n_convs = int(args[0]) if args else 240000
    pair_spec = [(4, 16), (8, 32)]
    reps = 3
    write_md = True
    for o in opts:
        if o.startswith("--pairs="):
            # e.g. --pairs=2:8,8:32 — custom pairs; the curated
            # BENCH/BASELINE.md is NOT overwritten in this mode
            pair_spec = [
                tuple(int(x) for x in p.split(":")) for p in o[8:].split(",")
            ]
            write_md = False
        elif o.startswith("--reps="):
            reps = int(o[7:])
        elif o == "--no-md":
            write_md = False
    inp = f"/tmp/denrl_scaling_input_{n_convs}"
    materialize_input(n_convs, inp)

    pairs = []
    for c_lo, c_hi in pair_spec:
        pairs.append(run_pair(c_lo, c_hi, inp, reps=reps))
    report = {"input_turns": pairs[0]["lo"]["turns"], "pairs": pairs, "target": 0.8}
    print(json.dumps(report, indent=2))
    if not write_md:
        return

    p0, p1 = pairs
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    md = os.path.join(ROOT, "BENCH", "BASELINE.md")
    # BENCH/BASELINE.md is hand-curated across rounds (methodology,
    # control decomposition, sf1 table). Never clobber it: the
    # auto-generated two-pair report goes to the side file unless
    # BASELINE.md is absent or still carries the auto-generated marker.
    if os.path.exists(md):
        with open(md) as f:
            head = f.read(4096)
        if "Methodology" in head or "curated" in head:
            md = os.path.join(ROOT, "BENCH", "scaling_last_run.md")
            print(f"BASELINE.md is curated; writing auto report to {md}")
    with open(md, "w") as f:
        f.write(
            f"""# BENCH baseline — scaling evidence (N vs 4N parallelism)

Same job (read transcripts -> distant tagging -> frozen-scorer inference
-> batched Viterbi decode -> triple assembly -> count) on the SAME parquet
input ({p0['lo']['turns']:,} turns, seed-deterministic corpus). One fresh
JVM per run, pinned to exactly N cores with taskset (unpinned local-mode
runs let Python UDF workers borrow idle cores and fake the low-N number);
Python worker pool + codegen warmed before timing. N vs 4N pinned cores
stands in for N vs 4N executors (task instructions; BASELINE.json).

| pair | wall sec (N) | wall sec (4N) | turns/s (N) | turns/s (4N) | triples/s (4N) | efficiency |
|---|---|---|---|---|---|---|
| 4 -> 16 cores | {p0['lo']['sec']} | {p0['hi']['sec']} | {p0['lo']['turns_per_sec']} | {p0['hi']['turns_per_sec']} | {p0['hi']['triples_per_sec']} | **{p0['efficiency']}** |
| 8 -> 32 cores | {p1['lo']['sec']} | {p1['hi']['sec']} | {p1['lo']['turns_per_sec']} | {p1['hi']['turns_per_sec']} | {p1['hi']['triples_per_sec']} | **{p1['efficiency']}** |

Efficiency = throughput_4N / (4 x throughput_N). Target >= 0.8.
The 8->32 pair is the configuration named by the task (local[8] vs
local[32]). Run-to-run variance on this shared host is roughly +/-10-15%
per pair; measurements across tuning iterations ranged 0.68-0.87 once
the optimizations below landed. Single-box caveats that a real N vs 4N
executor cluster would not have: all-core turbo downclocking and shared
memory bandwidth at the 4N end, and (before pinning) idle-core borrowing
at the N end.

Optimization history that got here (each step verified equivalent by the
pytest suite): structured O(B*V) Viterbi step instead of the dense
(B,V,V) candidate tensor; fused text->triples extraction (one Arrow pass
instead of three, no duplicated token arrays crossing the JVM/Python
boundary); length-sorted DP chunks so padding waste ~1 despite long-tail
turns; int16 backpointers; KB matcher indexed by first token; entity
spans computed once per sentence instead of once per instance.

Reproduce: `python tools/bench_scaling.py {n_convs}`.
Per-query timings at sf0.1 live in the driver's BENCH_r*.json (bench.py).
"""
        )
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
