#!/usr/bin/env python
"""Scaling-efficiency evidence for the north_rule (N vs 4N).

No multi-node cluster exists in this sandbox, so the rule's two-cluster-size
criterion is evidenced by running the *identical* extraction job on the
*identical* synthetic corpus at two parallelism levels — local[8] (N) and
local[32] (4N) — each in its own fresh JVM (subprocess), and reporting
throughput at both plus efficiency = speedup / 4.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("SCALING_N_DOCS", "500000"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))


def run_once(cpus: int) -> dict:
    # taskset pins the WHOLE process tree (JVM + Python workers) to `cpus`
    # cores — local[N] alone only caps JVM task slots while the N Python
    # workers land on extra cores, which would overstate the small-cluster
    # leg and understate scaling. Affinity-bound local[N] is the faithful
    # stand-in for an N-core cluster.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, os.path.join(REPO, "bench.py"),
         "--extract-only", "--cpus", str(cpus), "--n-docs", str(N_DOCS)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def best_of(cpus: int) -> dict:
    runs = [run_once(cpus) for _ in range(REPEATS)]
    return max(runs, key=lambda r: r["docs_per_sec"])


def main() -> None:
    lo = best_of(8)
    hi = best_of(32)
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    eff = speedup / 4.0
    result = {
        "n_docs": N_DOCS,
        "docs_per_sec_local8": lo["docs_per_sec"],
        "docs_per_sec_local32": hi["docs_per_sec"],
        "seconds_local8": lo["queries"]["extract_pipeline"],
        "seconds_local32": hi["queries"]["extract_pipeline"],
        "speedup_4x_cores": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# Scaling evidence (north_rule: efficiency >= 0.8 between N and 4N)\n\n"
            "Identical end-to-end extraction job (read -> sha2 dedup -> salted\n"
            "size-bucket repartition -> Arrow tokenize kernels -> reading-order\n"
            "assembly -> spans parquet + lineage checkpoint) on the identical\n"
            f"deterministic synthetic corpus ({N_DOCS:,} interleaved text+media\n"
            "docs, ~10% exact duplicates, 1% megabyte-scale skew tail), each\n"
            "parallelism level in a fresh JVM:\n\n"
            "| parallelism | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[8] (N) | {result['seconds_local8']} | {result['docs_per_sec_local8']} |\n"
            f"| local[32] (4N) | {result['seconds_local32']} | {result['docs_per_sec_local32']} |\n\n"
            f"**speedup at 4x cores: {result['speedup_4x_cores']}x -> scaling "
            f"efficiency {result['scaling_efficiency']}**\n\n"
            "Measured via `python tools/scaling_bench.py` (best of "
            f"{REPEATS} per level).\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
