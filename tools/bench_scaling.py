"""Scaling-efficiency evidence for the north rule: the same PageRank job at
two parallelism levels (local[N] vs local[4N]) on the same synthetic edge
graph; reports throughput at both and efficiency = speedup / 4.

Each level runs in a fresh subprocess (a JVM's master is fixed at startup).

Usage: python tools/bench_scaling.py [--low 8] [--high 32] [--edges 5000000]
Writes BENCH/SCALING_LATEST.md (raw result; BENCH/BASELINE.md is the curated
evidence document — merge headline numbers there by hand) and prints the
JSON result.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from graphscope_spark.session import get_spark
from bench import pagerank_throughput
spark = get_spark("scaling-bench", master="local[{cpus}]",
                  shuffle_partitions={parts},
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.local.dir": "/dev/shm/spark-local"}})
thr = pagerank_throughput(spark, n_vertices={verts}, n_edges={edges}, P={parts}, rounds={rounds})
print("RESULT " + json.dumps(thr))
spark.stop()
"""


def run_level(cpus: int, edges: int, rounds: int, parts: int) -> dict:
    """`parts` is held CONSTANT across levels so both run the identical
    physical plan — only executor-thread parallelism varies (the controlled
    variable a real N-vs-4N-executor comparison isolates)."""
    code = CHILD.format(
        repo=str(REPO),
        cpus=cpus,
        parts=parts,
        verts=edges // 5,
        edges=edges,
        rounds=rounds,
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=str(REPO)
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            out = json.loads(line[len("RESULT "):])
            out["cpus"] = cpus
            out["proc_wall_s"] = round(time.time() - t0, 1)
            return out
    raise RuntimeError(f"child local[{cpus}] failed:\n{proc.stdout}\n{proc.stderr}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--alternate",
        type=int,
        default=1,
        help="repeat low/high alternately N times, keep each level's best "
        "median round — averages out sandbox CPU-allocation drift",
    )
    args = ap.parse_args()

    parts = 2 * args.high
    lo = hi = None
    for i in range(args.alternate):
        l = run_level(args.low, args.edges, args.rounds, parts)
        h = run_level(args.high, args.edges, args.rounds, parts)
        print(
            f"# pass {i}: low={l['median_round_s']}s high={h['median_round_s']}s",
            file=sys.stderr,
        )
        if lo is None or l["median_round_s"] < lo["median_round_s"]:
            lo = l
        if hi is None or h["median_round_s"] < hi["median_round_s"]:
            hi = h
    speedup = lo["median_round_s"] / hi["median_round_s"]
    ratio = args.high / args.low
    eff = speedup / ratio
    result = {
        "edges": args.edges,
        "rounds": args.rounds,
        "low": lo,
        "high": hi,
        "speedup": round(speedup, 3),
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=2))

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = f"""# BENCH/SCALING_LATEST.md — raw scaling-run output

North rule: "throughput scaling efficiency ≥ 0.8 between N and 4N
executors". No real cluster exists in this sandbox, so the evidence is the
same PageRank job (same synthetic edge graph, {args.edges:,} edges,
{args.rounds} supersteps, identical code path: hash-partitioned edges ⋈
ranks → groupBy(dst).sum, dangling-mass allreduce, per-round
localCheckpoint) at two parallelism levels on one machine.

| level | cores | median sec/superstep | edges/s/superstep |
|---|---|---|---|
| low  | {lo["cpus"]} | {lo["median_round_s"]} | {lo["edges_per_sec_per_superstep"]:,} |
| high | {hi["cpus"]} | {hi["median_round_s"]} | {hi["edges_per_sec_per_superstep"]:,} |

* speedup (low→high): **{speedup:.2f}×** over a {ratio:.0f}× core ratio
* **scaling efficiency: {eff:.3f}** (rule target ≥ 0.8)

Caveats: single-JVM local mode shares one shuffle service, one driver and
one memory pool across both levels, so this under-states multi-executor
scaling (no network, but also no partition-local input placement and heavy
GC sharing at local[{hi["cpus"]}]). On a real cluster the same explicit
hash partitioning (`pmod(vid, P)`) keeps every superstep's join
co-partitioned, which is the property the rule is probing.

Reference baseline (BASELINE.md): GAE WCC ≈ 6×10⁹ edges/s, PageRank ≈
1.8×10⁹ edges/s/superstep on 128 C++ cores — PySpark/JVM per-core
throughput here: {hi["edges_per_sec_per_superstep"]:,} edges/s/superstep
on {hi["cpus"]} local threads.

Generated by tools/bench_scaling.py; raw JSON below.

```json
{json.dumps(result, indent=2)}
```
"""
    (bench_dir / "SCALING_LATEST.md").write_text(md)
    print(f"wrote {bench_dir / 'SCALING_LATEST.md'}")


if __name__ == "__main__":
    main()
