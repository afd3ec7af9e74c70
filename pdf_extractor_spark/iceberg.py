"""Iceberg table wiring, feature-flagged for jar-less sandboxes.

The production layout (north_rule: "Iceberg tables of interleaved text +
media documents") is:

  docs    — RAW_DOC_SCHEMA, partitioned by ``bucket(256, doc_id)``
            (uniform id hashing; no hot partitions under any arrival order)
  spans   — (doc_id, content_hash, spans, span_count),
            partitioned by ``bucket(256, doc_id)`` so spans co-bucket with
            docs and a doc_id-keyed join of the two is shuffle-free
  lineage — CHECKPOINT_SCHEMA, partitioned by ``run_id`` (small, pruned by
            the resume anti-join's run filter)

No Iceberg runtime jar ships in this container (no network), so
:func:`use_iceberg` is False here and every writer falls back to plain
parquet with the SAME logical layout (subdirectory-per-bucket is left to
Iceberg; parquet fallback keeps one directory per table — the checkpoint
protocol was designed to not need Iceberg transactions: idempotent
``(run_id, partition_id, doc_id)`` keys + file-granularity atomicity, see
checkpoint.py). When the jar is present, set ``SPARK_GRAFT_ICEBERG=1`` and
the same code paths emit real Iceberg DDL/append.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

CATALOG = "graft"
WAREHOUSE_ENV = "SPARK_GRAFT_WAREHOUSE"

ICEBERG_CONFS = {
    f"spark.sql.catalog.{CATALOG}": "org.apache.iceberg.spark.SparkCatalog",
    f"spark.sql.catalog.{CATALOG}.type": "hadoop",
    # warehouse dir comes from $SPARK_GRAFT_WAREHOUSE at session build
    "spark.sql.extensions":
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
}

DDL = {
    "docs": (
        f"CREATE TABLE IF NOT EXISTS {CATALOG}.db.docs ("
        " doc_id string, content binary, content_type string, label string,"
        " extraction_schema map<string,string>, size_bytes bigint)"
        " USING iceberg PARTITIONED BY (bucket(256, doc_id))"
    ),
    "spans": (
        f"CREATE TABLE IF NOT EXISTS {CATALOG}.db.spans ("
        " doc_id string, content_hash string,"
        " spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
        " span_count int)"
        " USING iceberg PARTITIONED BY (bucket(256, doc_id))"
    ),
    "lineage": (
        f"CREATE TABLE IF NOT EXISTS {CATALOG}.db.lineage ("
        " run_id string, partition_id int, doc_id string, content_hash string,"
        " status string, span_count int, byte_count bigint,"
        " committed_at timestamp)"
        " USING iceberg PARTITIONED BY (run_id)"
    ),
}


def use_iceberg(spark: SparkSession) -> bool:
    """True only when the flag is set AND the runtime actually has Iceberg."""
    if os.environ.get("SPARK_GRAFT_ICEBERG") != "1":
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def ensure_tables(spark: SparkSession) -> None:
    for ddl in DDL.values():
        spark.sql(ddl)


def append(spark: SparkSession, df: DataFrame, table: str, parquet_path: str) -> None:
    """Append to the Iceberg table when available, else the parquet layout."""
    if use_iceberg(spark):
        df.writeTo(f"{CATALOG}.db.{table}").append()
    else:
        df.write.mode("append").parquet(parquet_path)
