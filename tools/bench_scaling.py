"""Two-parallelism scaling-efficiency protocol (BASELINE.md target table).

The north rule's ≥0.8 scaling efficiency between N and 4N executors cannot
use a real cluster in this sandbox; the sanctioned proxy is the same job on
the same input at two core counts:

    efficiency = (T_N / T_4N) / 4

Parallelism pair: **local[2] vs local[8]** (N=2, 4N=8), with a secondary
local[4] vs local[16] pair for transparency. Measured saturation data for
this box (see BASELINE.md): Spark workloads stop scaling between 16 and 32
threads in one JVM (memory bandwidth for shuffles, GC/arrow overheads)
even though pure-Python multiprocessing scales to 32 procs at 0.85
efficiency — 8-vs-32 would measure host saturation, not the engine's plans.

Each level runs in a fresh JVM (tools/scaling_worker.py) and reports the
**median of 3** measured runs after warmup — the reference's own protocol
is median-of-10 (script.py:123-142); single runs on a shared box have
±2× noise from GC/JIT/page-cache timing.

Writes BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_worker(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_worker.py"), str(cpus)],
        capture_output=True,
        text=True,
        env=dict(os.environ),
        cwd=REPO,
        timeout=2400,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def pair_result(low: dict, high: dict) -> dict:
    factor = high["cpus"] / low["cpus"]
    return {
        "pair": f"local[{low['cpus']}] vs local[{high['cpus']}]",
        "pagerank": {
            "edges": high["pagerank_edges"],
            "supersteps": high["supersteps"],
            "loop_sec": {str(low["cpus"]): low["pagerank_loop_sec_median"],
                         str(high["cpus"]): high["pagerank_loop_sec_median"]},
            "edges_per_sec": {str(low["cpus"]): low["pagerank_edges_per_sec"],
                              str(high["cpus"]): high["pagerank_edges_per_sec"]},
            "scaling_efficiency": round(
                (low["pagerank_loop_sec_median"] / high["pagerank_loop_sec_median"]) / factor, 3
            ),
        },
        "pipeline_extract": {
            "pages": high["pages"],
            "sec": {str(low["cpus"]): low["extract_sec_median"],
                    str(high["cpus"]): high["extract_sec_median"]},
            "pages_per_sec": {str(low["cpus"]): low["pages_per_sec"],
                              str(high["cpus"]): high["pages_per_sec"]},
            "scaling_efficiency": round(
                (low["extract_sec_median"] / high["extract_sec_median"]) / factor, 3
            ),
        },
        "raw": {"low": low, "high": high},
    }


def main() -> None:
    results = {}
    primary = [int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_PAIR", "2,8").split(",")]
    results["primary"] = pair_result(run_worker(primary[0]), run_worker(primary[1]))
    if os.environ.get("SPARK_GRAFT_SCALE_SECONDARY", "1") == "1":
        results["secondary"] = pair_result(run_worker(4), run_worker(16))
    results["protocol"] = (
        "same job, same input, fresh JVM per parallelism level; median of 3"
        " measured runs after warmup; efficiency = (T_N / T_4N) / (4N/N);"
        " pagerank timing is the superstep loop only (one-time CSR setup"
        " excluded, matching the reference's decode-only ns/arc accounting)"
    )
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
