"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N→4N-executor comparison can't run in this sandbox, so the
stand-in (per BASELINE.md) is the same job on the same input at
local[8] vs local[32]. Each parallelism level runs in its own
subprocess (a JVM's master is fixed at startup); the measured section
is the PageRank superstep loop only (the corpus is generated
identically in both, excluded from the throughput).

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python BENCH/scaling.py [n_pages] [n_iters]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from xdata_igraph_spark.session import get_spark
from xdata_igraph_spark.sources.corpus import synthetic_pages
from xdata_igraph_spark.pipeline import pages_to_graph
from xdata_igraph_spark.operators.pagerank import pagerank
from xdata_igraph_spark.plans.superstep import SuperstepRunner

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2]); n_iters = int(sys.argv[3])
spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus)
t0 = time.monotonic()
g = pages_to_graph(synthetic_pages(spark, n_pages))
m = g.ecount()
ingest = time.monotonic() - t0
r = SuperstepRunner(spark, "scaling")
t0 = time.monotonic()
pr = pagerank(g, tol=0.0, max_iter=n_iters, norm="l1", runner=r)
pr.count()
loop = time.monotonic() - t0
print("RESULT " + json.dumps({
    "cpus": cpus, "pages": n_pages, "edges": m,
    "ingest_sec": round(ingest, 2), "loop_sec": round(loop, 2),
    "iters": len(r.history),
    "iters_per_sec": round(len(r.history) / loop, 4),
    "edges_per_sec": round(len(r.history) * m / loop, 1),
}))
"""


def run(cpus: int, n_pages: int, n_iters: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cpus), str(n_pages), str(n_iters)],
        capture_output=True,
        text=True,
        timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    r8 = run(8, n_pages, n_iters)
    r32 = run(32, n_pages, n_iters)
    eff = r32["edges_per_sec"] / (4 * r8["edges_per_sec"])
    result = {
        "metric": "pagerank_scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "n_pages": n_pages,
        "n_iters": n_iters,
        "local8": r8,
        "local32": r32,
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox stand-in (per BASELINE.md): identical job + input at
local[8] vs local[32], measuring the PageRank superstep loop
(synchronous power iteration, L1-norm convergence criterion, fixed
{n_iters} supersteps for a like-for-like comparison).

Input: deterministic synthetic web corpus (FIXTURES.md §1),
{n_pages:,} pages → {r8["edges"]:,} edges (seed 42).

| parallelism | loop sec | iters | iters/sec | edges/sec |
|---|---|---|---|---|
| local[8]  | {r8["loop_sec"]} | {r8["iters"]} | {r8["iters_per_sec"]} | {r8["edges_per_sec"]:,} |
| local[32] | {r32["loop_sec"]} | {r32["iters"]} | {r32["iters_per_sec"]} | {r32["edges_per_sec"]:,} |

**Scaling efficiency (8→32 threads) = {eff:.3f}**
(= edges/sec at 32 / (4 x edges/sec at 8))

Corpus ingest (not part of the scaled metric): {r8["ingest_sec"]}s at
local[8], {r32["ingest_sec"]}s at local[32].

Caveats of the stand-in: a single-host local-mode JVM shares one
memory bus, disk, and driver among all task threads, so 8→32 threads
is a *weaker* setup than 8→32 executors on separate hosts (no extra
memory bandwidth or shuffle service capacity is added). The per-
superstep fixed cost (driver scheduling of ~3 stages) is constant and
amortizes further as per-iteration work grows with corpus size.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
