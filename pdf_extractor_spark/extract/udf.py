"""Spark wrappers for the field-extraction kernel.

Dataflow (SURVEY.md §2.3 J1/J3): the KB dimension table is tiny (labels ×
fields), so it is pre-aggregated per label and **broadcast-joined** onto the
document stream; the per-document anchor/zone geometry (a theta-join of spans
on spans) runs inside one Arrow batch kernel — spans per doc are small, the
cross-doc axis is the DataFrame, so no shuffle-level range join is needed."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, MapType, StringType, StructField, StructType,
)

from pdf_extractor_spark.extract import engine

EXTRACT_RESULT_TYPE = StructType(
    [
        StructField("result", MapType(StringType(), StringType())),
        StructField("failed_fields", ArrayType(StringType())),
    ]
)


def _as_dict(m: Any) -> Dict[str, Any]:
    """Arrow hands MapType to pandas as dict OR list of (k, v); normalize."""
    if m is None:
        return {}
    if isinstance(m, dict):
        return m
    return dict(m)


def _kernel(
    spans: Any, pw: float, ph: float, schema: Any, heuristics: Any
) -> Dict[str, Any]:
    spans = [] if spans is None else list(spans)
    heuristics = [] if heuristics is None else list(heuristics)
    doc = engine.doc_from_spans(spans, float(pw or 0), float(ph or 0))
    schema_d = {k: (v or "") for k, v in _as_dict(schema).items()}
    kb_fields: Dict[str, Dict[str, Any]] = {}
    for h in heuristics:
        hd = dict(h) if not isinstance(h, dict) else h
        kb_fields[hd["field"]] = {
            "type": hd.get("type"),
            "zone": list(hd["zone"]) if hd.get("zone") is not None else None,
            "metadata": _as_dict(hd.get("metadata")),
        }
    result, failed = engine.extract_doc(doc, schema_d, kb_fields)
    return {"result": result, "failed_fields": failed}


@pandas_udf(EXTRACT_RESULT_TYPE)
def extract_fields_udf(
    spans: pd.Series, pw: pd.Series, ph: pd.Series,
    schema: pd.Series, heuristics: pd.Series,
) -> pd.DataFrame:
    rows = [
        _kernel(sp, w, h, sc, he)
        for sp, w, h, sc, he in zip(spans, pw, ph, schema, heuristics)
    ]
    return pd.DataFrame(
        {"result": [r["result"] for r in rows],
         "failed_fields": [r["failed_fields"] for r in rows]}
    )


def kb_per_label(kb: DataFrame) -> DataFrame:
    """Aggregate the KB dim table to one row per label (broadcast side).

    META sentinel rows (per-label template metadata, repair.LABEL_META_FIELD)
    carry the template flag but are not extraction rules — collect_list
    drops them via the when()'s null."""
    rule = F.when(
        F.col("type") != "META",
        F.struct("field", "type", "zone", "confidence", "metadata"),
    )
    return kb.groupBy("label").agg(
        F.collect_list(rule).alias("heuristics"),
        F.any_value("template_fixo").alias("template_fixo"),
    )


def extract_fields(docs: DataFrame, kb: DataFrame) -> DataFrame:
    """docs(doc_id, label, extraction_schema, ordered_spans, page_width,
    page_height, …) ⋈ broadcast(kb) → + result, failed_fields columns.

    J1 of SURVEY.md §2.3: broadcast hash join on label — never a shuffle."""
    joined = docs.join(F.broadcast(kb_per_label(kb)), "label", "left")
    out = joined.withColumn(
        "_ext",
        extract_fields_udf(
            F.col("ordered_spans"),
            F.col("page_width"),
            F.col("page_height"),
            F.col("extraction_schema"),
            F.col("heuristics"),
        ),
    )
    return (
        out.withColumn("result", F.col("_ext.result"))
        .withColumn("failed_fields", F.col("_ext.failed_fields"))
        .drop("_ext", "heuristics")
    )
