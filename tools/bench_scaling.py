"""Two-parallelism scaling-efficiency protocol (BASELINE.md target table).

The north rule's ≥0.8 scaling efficiency between N and 4N executors cannot
use a real cluster in this sandbox; the sanctioned proxy is the same job on
the same input at local[8] vs local[32]:

    efficiency = (T_8 / T_32) / 4

Runs bench.py in a fresh subprocess per parallelism level (separate JVMs —
no shared-session contamination), writes BENCH_SCALING.json, and rewrites
the measured-numbers section of BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    low, high = 8, 32
    r_low = run_bench(low)
    r_high = run_bench(high)
    t_low = r_low["queries"]["pagerank_supersteps"]
    t_high = r_high["queries"]["pagerank_supersteps"]
    eff = (t_low / t_high) / (high / low)
    result = {
        "protocol": f"same job, same input, local[{low}] vs local[{high}]",
        "pagerank_edges": r_high["pagerank_edges"],
        "supersteps": r_high["pagerank_supersteps"],
        f"t_{low}_sec": t_low,
        f"t_{high}_sec": t_high,
        f"edges_per_sec_{low}": r_low["pagerank_edges_per_sec"],
        f"edges_per_sec_{high}": r_high["pagerank_edges_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "pipeline_extract": {
            f"t_{low}_sec": r_low["queries"]["pipeline_extract"],
            f"t_{high}_sec": r_high["queries"]["pipeline_extract"],
            "efficiency": round(
                (r_low["queries"]["pipeline_extract"] / r_high["queries"]["pipeline_extract"])
                / (high / low),
                3,
            ),
        },
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
