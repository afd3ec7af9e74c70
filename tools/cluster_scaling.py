#!/usr/bin/env python
"""Multi-EXECUTOR scaling evidence (north_rule, literal form).

tools/scaling_bench.py evidences N-vs-4N with pinned local[N] threads; this
harness runs the IDENTICAL job in the rule's literal deployment shape:

    spark-submit --py-files engine.zip --master local-cluster[E,4,mem]

``local-cluster`` is Spark's one-box standalone cluster: E real executor
JVMs, each a separate process with its own heap, GC, shuffle server and
Python workers, talking to the driver over the standalone-master RPC path —
the same execution topology as a multi-node cluster minus the NIC. Each leg
is pinned via ``taskset`` to exactly E*4 cores so executors compete for the
same silicon a real node would give them.

Legs (executor counts) come from CLUSTER_LEGS (default "1,2,4,8" → 4, 8,
16, 32 cores), corpus size from CLUSTER_N_DOCS (default 2,000,000 — the
same corpus as the thread-leg table, so the two evidence paths are directly
comparable). Timing happens INSIDE the submitted job (tools/run_job.py
--bench-repeats), so no leg's figure includes JVM/executor spin-up.

Results append to BENCH/cluster_runs.jsonl; BENCH/BASELINE.md is then
regenerated (tools/scaling_bench.write_report picks the cluster table up).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("CLUSTER_N_DOCS", "2000000"))
REPEATS = int(os.environ.get("CLUSTER_REPEATS", "1"))
LEGS = [int(x) for x in os.environ.get("CLUSTER_LEGS", "1,2,4,8").split(",")]
CORES_PER_EXEC = int(os.environ.get("CLUSTER_CORES_PER_EXEC", "4"))
EXEC_MEM_MB = int(os.environ.get("CLUSTER_EXEC_MEM_MB", "6144"))
RUNS_PATH = os.path.join(REPO, "BENCH", "cluster_runs.jsonl")
CORPUS_CACHE = os.environ.get("SPARK_GRAFT_CORPUS_CACHE", "/tmp/spark_graft_corpus")


def ensure_corpus() -> str:
    path = os.path.join(CORPUS_CACHE, f"n{N_DOCS}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pdf_extractor_spark.corpus import materialize_corpus
        from pdf_extractor_spark.pipeline import build_session

        spark = build_session(master="local[32]", shuffle_partitions=32)
        files = min(512, max(128, N_DOCS // 2000))
        materialize_corpus(spark, N_DOCS, path, partitions=min(N_DOCS, files))
        spark.stop()
    return path


def build_zip() -> str:
    zip_path = "/tmp/engine.zip"
    if os.path.exists(zip_path):
        os.remove(zip_path)
    subprocess.run(
        ["zip", "-qr", zip_path, "pdf_extractor_spark", "-x", "*__pycache__*"],
        cwd=REPO, check=True,
    )
    return zip_path


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, names in os.walk(path):
        for n in names:
            total += os.path.getsize(os.path.join(root, n))
    return total


def run_leg(executors: int, corpus: str, zip_path: str) -> dict:
    cores = executors * CORES_PER_EXEC
    # same split-size rule as bench.py: ~4 scan tasks per core
    split = max(4 << 20, min(128 << 20, dir_bytes(corpus) // (cores * 4) or 4 << 20))
    out = tempfile.mkdtemp(prefix=f"cluster_e{executors}_")
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local-cluster[{executors},{CORES_PER_EXEC},{EXEC_MEM_MB}]",
        "--py-files", zip_path,
        "--conf", "spark.driver.memory=4g",
        # local-cluster[E,C,mem]'s mem caps the WORKER; the executor JVM
        # heap itself comes from spark.executor.memory (default 1g → OOMs
        # on the megabyte-PDF skew tail)
        "--conf", f"spark.executor.memory={EXEC_MEM_MB - 1024}m",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=1024",
        "--conf", "spark.python.worker.reuse=true",
        # same fat-binary-row hardening as SESSION_DEFAULTS, applied to the
        # executor side: small columnar batches (the 4096-row default times
        # megabyte PDF cells OOMs the executor heap on the skew tail) and
        # ZGC (no humongous-region / GCLocker stalls under Arrow JNI)
        "--conf", "spark.sql.parquet.columnarReaderBatchSize=128",
        "--conf", "spark.executor.extraJavaOptions=-XX:+UseZGC",
        "--conf", f"spark.sql.files.maxPartitionBytes={split}",
        os.path.join(REPO, "tools", "run_job.py"),
        corpus, out,
        "--partitions", str(cores * 2),
        "--no-resume",
        "--bench-repeats", str(REPEATS),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-4000:])
        raise SystemExit(f"leg executors={executors} failed")
    line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    row = {
        "n_docs": N_DOCS,
        "executors": executors,
        "cores_per_executor": CORES_PER_EXEC,
        "cores": cores,
        "seconds": d["seconds"],
        "docs_per_sec": d["docs_per_sec"],
        "legs": d["legs"],
    }
    os.makedirs(os.path.dirname(RUNS_PATH), exist_ok=True)
    with open(RUNS_PATH, "a") as f:
        f.write(json.dumps(row) + "\n")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    return row


def main() -> None:
    sys.path.insert(0, REPO)
    corpus = ensure_corpus()
    zip_path = build_zip()
    for executors in LEGS:
        row = run_leg(executors, corpus, zip_path)
        print(json.dumps(row))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_bench import write_report

    print(json.dumps(write_report(N_DOCS)))


if __name__ == "__main__":
    main()
