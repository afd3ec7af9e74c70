#!/usr/bin/env python
"""Per-core memory-bandwidth envelope of THIS box, engine-free.

The extraction kernel is shuffle-free and embarrassingly parallel, so any
sub-linear N -> 4N scaling on one machine is either engine overhead or the
socket itself. This probe separates the two: N worker PROCESSES (no GIL, no
Spark, no Python-level shared state) each stream-copy a 256 MB numpy buffer
for a fixed wall window, pinned to cores 0..N-1 — the same pinning the
bench legs use. Reported GB/s/core at each N is the hardware's own
per-core decay curve under full-socket load; if the engine's per-core
docs/s decays no faster than this envelope, the sub-0.8 full-socket octave
is the silicon's memory subsystem, not the engine's scalability.

Usage: python tools/membw_probe.py [N ...]    (default: 4 8 16 24 32)
Appends one JSON line per N to BENCH/membw.jsonl.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "membw.jsonl")
BUF_MB = 256
WINDOW_S = 8.0


def _worker(core: int, q) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    src = np.random.default_rng(core).integers(
        0, 255, size=BUF_MB << 20, dtype=np.uint8
    )
    dst = np.empty_like(src)
    # warm both buffers through the caches/TLB before timing
    np.copyto(dst, src)
    t0 = time.perf_counter()
    n = 0
    while True:
        np.copyto(dst, src)
        n += 1
        t = time.perf_counter() - t0
        if t >= WINDOW_S:
            break
    # a copy reads + writes the buffer: 2x bytes moved per pass
    q.put((core, 2 * n * BUF_MB / 1024.0 / t))


def run(cores: int) -> dict:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(c, q)) for c in range(cores)]
    for p in procs:
        p.start()
    # bounded get: a worker that dies before q.put (e.g. sched_setaffinity
    # OSError when a leg exceeds the machine's core count) must not leave
    # the parent blocked in q.get() forever
    rates = []
    for _ in procs:
        try:
            rates.append(q.get(timeout=WINDOW_S * 4 + 30)[1])
        except Exception:
            for p in procs:
                p.terminate()
            raise SystemExit(
                f"membw worker died before reporting (leg={cores} cores; "
                f"machine has {mp.cpu_count()})"
            )
    for p in procs:
        p.join()
    total = sum(rates)
    return {
        "cores": cores,
        "gb_per_sec_total": round(total, 2),
        "gb_per_sec_per_core": round(total / cores, 3),
        "buf_mb": BUF_MB,
        "window_s": WINDOW_S,
    }


def main() -> None:
    legs = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 24, 32]
    results = []
    for n in legs:
        r = run(n)
        results.append(r)
        with open(OUT, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r))
    if len(results) > 1:
        base = results[0]
        for r in results[1:]:
            rel = r["gb_per_sec_per_core"] / base["gb_per_sec_per_core"]
            print(
                f"# per-core bandwidth at {r['cores']}c = "
                f"{rel:.3f}x of {base['cores']}c"
            )


if __name__ == "__main__":
    main()
