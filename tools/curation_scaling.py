#!/usr/bin/env python
"""Two-parallelism scaling evidence for the CURATION pipeline (north-rule
N vs 4N clause, applied to the decision-record job, complementing the
extraction legs in tools/scaling_bench.py).

Runs `corpus_curation_record` — the end-to-end gate composition: quality
filter + langid + LSH near-dup keep-list (incl. iterative connected
components) + mixture sampling + decontamination + split — over an
n-doc synthetic `documents` table at two parallelism levels in FRESH JVM
subprocesses, and reports docs/sec at each plus the scaling efficiency.

The input table is generated DETERMINISTICALLY in pure SQL (zero Python
rows): each document's tokens are md5-indexed picks from a 256-word
vocabulary, seeded so every 10th document is a near-duplicate of the
stream head 9 ids earlier (exercises the LSH/CC path with real clusters);
sources are uniform over 20 so the mixture/shard stages see real groups.

Usage:
  python tools/curation_scaling.py                 # orchestrate both legs
  python tools/curation_scaling.py --leg --cpus 8  # one timed leg (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.environ.get("SPARK_GRAFT_CURATION_CACHE", "/tmp/spark_graft_curation")
N_DOCS = int(os.environ.get("SPARK_GRAFT_CURATION_DOCS", "100000"))
# N and 4N total cores. Default (8, 32) spans the socket's bandwidth
# plateau (BENCH/membw.jsonl: ~330 GB/s flat past ~8 busy cores);
# override with e.g. SPARK_GRAFT_CURATION_LEGS=4,16 to keep BOTH legs
# below the plateau and measure the engine's scaling with the memory
# wall out of the picture.
LEGS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_CURATION_LEGS", "8,32").split(",")
)
RUNS_LOG = os.path.join(REPO, "BENCH", "curation_runs.jsonl")

_H32 = "cast(conv(substring(md5({0}), 1, 8), 16, 10) as bigint)"


def gen_documents(spark, n_docs: int, out_path: str, dup_mod: int = 10) -> None:
    """documents-table-shaped corpus, one narrow SQL projection per row.
    Every ``dup_mod``-th doc near-duplicates the doc ``dup_mod - 1`` ids
    earlier — dup_mod=10 is the default 10%-dup corpus; dup_mod=2 is the
    dup-heavy (50% near-dup) corpus for the unhinted-broadcast leg
    (VERDICT r4 task #5: `picks` at corpus scale, not dim scale)."""
    from pyspark.sql import functions as F

    seed = f"CASE WHEN id % {dup_mod} = {dup_mod - 1} THEN id - {dup_mod - 1} ELSE id END"
    n_words = f"150 + ({seed}) % 250"
    pick = _H32.format(f"concat({seed}, ':', i)")
    body = (
        f"array_join(transform(sequence(1, {n_words}), "
        f"i -> concat('w', ({pick}) % 256)), ' ')"
    )
    text = (
        f"CASE WHEN id % {dup_mod} = {dup_mod - 1} "
        f"THEN concat({body}, ' dupmark', id) ELSE {body} END"
    )
    df = spark.range(0, n_docs, numPartitions=128).select(
        F.col("id").alias("doc_id"),
        F.expr(text).alias("text"),
        F.lit("en").alias("lang"),
        F.expr("concat('src', id % 20)").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    df.write.mode("overwrite").parquet(os.path.join(out_path, "documents.parquet"))


def ensure_corpus(spark, n_docs: int, dup_mod: int = 10) -> str:
    suffix = "" if dup_mod == 10 else f"_dup{dup_mod}"
    path = os.path.join(CACHE, f"n{n_docs}{suffix}")
    marker = os.path.join(path, "documents.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        gen_documents(spark, n_docs, path, dup_mod=dup_mod)
    return path


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, names in os.walk(path):
        for nm in names:
            total += os.path.getsize(os.path.join(root, nm))
    return total


def run_leg(cpus: int, n_docs: int, cluster: bool = False,
            dup_mod: int = 10) -> dict:
    from pdf_extractor_spark.pipeline import build_session
    from pdf_extractor_spark.pipeline_queries import corpus_curation_record

    # cluster mode: the master comes from spark-submit (local-cluster[E,C,m]
    # — E real executor JVMs); build_session(master=None) inherits it.
    # Shuffle partitions default to the leg's core count (the historic
    # protocol). SPARK_GRAFT_CURATION_SP overrides with a DATA-sized count
    # identical across legs: shuffle partitions should track shuffle bytes,
    # not cores — at 2.4M docs, sp=4 on the 4-core leg puts ~600k docs of
    # band-join rows in each shuffle partition (spill regime), while AQE
    # coalescing makes a larger initial count safe on any core count.
    sp = int(os.environ.get("SPARK_GRAFT_CURATION_SP", "0")) or cpus
    spark = build_session(
        master=None if cluster else f"local[{cpus}]", shuffle_partitions=sp,
        app_name=f"curation-scaling-{cpus}",
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_corpus(spark, n_docs, dup_mod=dup_mod)
    # Size scan splits to the corpus (same rationale as bench.py): the
    # ~140 MB local corpus otherwise bin-packs into ~2 default-128MB
    # splits, serializing every narrow stage on 2 tasks at ANY core count
    # (measured: langid 18.4 s at 8 cores -> 16.5 s at 32). At 100 TB the
    # input has thousands of natural splits and the default stands.
    split = max(1 << 20, min(128 << 20, _dir_bytes(sf_dir) // (cpus * 4)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    best, legs = None, []
    for _ in range(2):  # best-of-2: first pass pays codegen + CC warmup
        # every rep rebuilds the memoized side inputs — a memo hit would
        # time a checkpoint read, not the curation pipeline
        import pdf_extractor_spark.pipeline_queries as _pq
        _pq.reset_side_memo()
        t0 = time.time()
        corpus_curation_record(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        elapsed = time.time() - t0
        legs.append(round(elapsed, 3))
        best = elapsed if best is None else min(best, elapsed)
        spark.catalog.clearCache()
    spark.stop()
    import pdf_extractor_spark.pipeline_queries as _pqmod

    row = {
        "op": "corpus_curation_record", "n_docs": n_docs, "cpus": cpus,
        "shuffle_partitions": sp,
        "seconds": round(best, 3), "docs_per_sec": round(n_docs / best, 2),
        "legs": legs,
        "dup_mod": dup_mod,
        "broadcast_row_limit": _pqmod._BROADCAST_ROW_LIMIT,
    }
    if cluster:
        row["executors"] = cpus // CLUSTER_CORES_PER_EXEC
        row["cores_per_executor"] = CLUSTER_CORES_PER_EXEC
    return row


CLUSTER_CORES_PER_EXEC = int(os.environ.get("CLUSTER_CORES_PER_EXEC", "4"))
CLUSTER_EXEC_MEM_MB = int(os.environ.get("CLUSTER_EXEC_MEM_MB", "6144"))


def run_cluster_leg(executors: int, n_docs: int) -> dict:
    """One timed leg in the north rule's literal deployment shape:
    spark-submit --py-files engine.zip --master local-cluster[E,C,mem] —
    E separate executor JVMs, each with its own heap, GC and Python
    workers (see tools/cluster_scaling.py for the extraction twin)."""
    zip_path = "/tmp/engine.zip"
    if os.path.exists(zip_path):
        os.remove(zip_path)
    subprocess.run(
        ["zip", "-qr", zip_path, "pdf_extractor_spark", "-x", "*__pycache__*"],
        cwd=REPO, check=True,
    )
    cores = executors * CLUSTER_CORES_PER_EXEC
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local-cluster[{executors},{CLUSTER_CORES_PER_EXEC},{CLUSTER_EXEC_MEM_MB}]",
        "--py-files", zip_path,
        "--conf", "spark.driver.memory=4g",
        "--conf", f"spark.executor.memory={CLUSTER_EXEC_MEM_MB - 1024}m",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.python.worker.reuse=true",
        "--conf", "spark.executor.extraJavaOptions=-XX:+UseZGC",
        os.path.abspath(__file__),
        "--leg", "--cluster", "--cpus", str(cores), "--n-docs", str(n_docs),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-4000:])
        raise SystemExit(f"cluster leg executors={executors} failed")
    line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", action="store_true")
    ap.add_argument("--cluster", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--n-docs", type=int, default=N_DOCS)
    ap.add_argument(
        "--dup-mod", type=int, default=10,
        help="every dup_mod-th doc near-duplicates an earlier one "
             "(10 = 10%% dups; 2 = the 50%%-dup-heavy corpus)",
    )
    ap.add_argument(
        "--unhinted", action="store_true",
        help="force SPARK_GRAFT_BROADCAST_ROWS=0 in the timed legs: every "
             "size-gated broadcast hint is stripped and the AQE shuffle-join "
             "fallback path is what gets measured (VERDICT r4 task #5)",
    )
    args = ap.parse_args()

    if args.leg:
        print(json.dumps(run_leg(args.cpus, args.n_docs, cluster=args.cluster,
                                 dup_mod=args.dup_mod)))
        return

    # materialize the corpus once (any session), then time each leg in a
    # fresh JVM subprocess — the same process isolation bench.py uses
    from pdf_extractor_spark.pipeline import build_session

    spark = build_session(master="local[16]", app_name="curation-gen")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_corpus(spark, args.n_docs, dup_mod=args.dup_mod)
    spark.stop()

    leg_env = dict(os.environ)
    if args.unhinted:
        leg_env["SPARK_GRAFT_BROADCAST_ROWS"] = "0"

    if args.cluster:
        # multi-EXECUTOR legs: the same 8-vs-32-core octave as the thread
        # legs, but with independent heaps/GC/Python workers per executor
        # (the real-cluster topology). Leg core counts must be a multiple
        # of the executor size or the lookup below would miskey AFTER the
        # expensive legs already ran.
        for cores in LEGS:
            assert cores % CLUSTER_CORES_PER_EXEC == 0 and cores > 0, (
                f"LEGS {LEGS} not divisible by "
                f"CLUSTER_CORES_PER_EXEC={CLUSTER_CORES_PER_EXEC}"
            )
        results = {}
        for cores in LEGS:
            results[cores] = row = run_cluster_leg(
                cores // CLUSTER_CORES_PER_EXEC, args.n_docs)
            with open(RUNS_LOG, "a") as f:
                f.write(json.dumps(row) + "\n")
        n, n4 = LEGS
        speedup = results[n4]["docs_per_sec"] / results[n]["docs_per_sec"]
        print(json.dumps({
            "legs": results,
            "octave": {"n": n, "4n": n4, "speedup": round(speedup, 3),
                       "efficiency": round(speedup / (n4 // n), 3),
                       "topology": "local-cluster multi-executor"},
        }))
        return

    results = {}
    for cpus in LEGS:
        # Pin the whole process tree (JVM + GC threads + Python workers) to
        # exactly `cpus` cores — same protocol as tools/scaling_bench.py.
        # local[N] alone only bounds task slots; GC and Python workers spill
        # onto every core, letting the small leg borrow the whole socket and
        # corrupting the N-vs-4N ratio.
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}",
             sys.executable, os.path.abspath(__file__), "--leg",
             "--cpus", str(cpus), "--n-docs", str(args.n_docs),
             "--dup-mod", str(args.dup_mod)],
            capture_output=True, text=True, check=True, env=leg_env,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        with open(RUNS_LOG, "a") as f:
            f.write(json.dumps(results[cpus]) + "\n")
    n, n4 = LEGS
    speedup = results[n4]["docs_per_sec"] / results[n]["docs_per_sec"]
    print(json.dumps({
        "legs": results,
        "octave": {"n": n, "4n": n4, "speedup": round(speedup, 3),
                   "efficiency": round(speedup / (n4 // n), 3)},
    }))


if __name__ == "__main__":
    main()
