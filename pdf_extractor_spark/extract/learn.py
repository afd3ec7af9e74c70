"""Distributed KB learning — the reference's plan-caching stage, Spark-shaped.

The reference learns heuristics once per *label* on first sight (the
LLM-free path: `_learn_from_anchor`, /root/reference/extractor.py:366-422,
invoked from the bootstrap at :627-637) and then reuses them for every later
document of that label. Here learning is a grouped stage:

  docs (label, extraction_schema, ordered spans+geometry)
    → per-doc Arrow kernel: learn (field → candidate kb_row) for every
      requested field (U6; optionally U7 when ground-truth values exist)
    → explode candidates → groupBy (label, field)
    → pick the highest-confidence candidate, majority-tie-broken by
      earliest doc_id (deterministic)
    → KB dimension table (KB_SCHEMA), broadcast back into extract_fields.

One shuffle total, on (label, field) — the candidate rows are tiny (the
heuristic metadata, never the spans), so learning cost is the kernel pass.
The reference's adaptive repair (O2: failed field → re-derive → replace in
KB) is the same stage re-run over the failure set with `values` from
whatever richer source adjudicated the failure.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, DoubleType, MapType, StringType, StructField, StructType,
)

from pdf_extractor_spark.extract import engine

CANDIDATE_TYPE = ArrayType(
    StructType(
        [
            StructField("field", StringType()),
            StructField("type", StringType()),
            StructField("zone", ArrayType(DoubleType())),
            StructField("confidence", DoubleType()),
            StructField("metadata", MapType(StringType(), StringType())),
        ]
    )
)


def _learn_one(
    spans: Any, pw: float, ph: float, schema: Any, values: Any,
    derive_only: bool = False,
) -> List[Dict[str, Any]]:
    doc = engine.doc_from_spans(
        [] if spans is None else list(spans), float(pw or 0), float(ph or 0)
    )
    schema_d = dict(schema) if schema is not None else {}
    values_d = dict(values) if values is not None else {}
    out: List[Dict[str, Any]] = []
    for field, desc in schema_d.items():
        row: Optional[Dict[str, Any]] = None
        known = values_d.get(field)
        if known:  # U7: ground truth available → derive from the value
            row = engine.derive_heuristic_for_value(doc, field, known)
        if row is None and not derive_only:
            # U6: anchor learning from the field name/description
            _, row, found = engine.learn_from_anchor(doc, field, desc or "")
            if not found:
                row = None
        if row is not None:
            out.append(
                {
                    "field": field,
                    "type": row["type"],
                    "zone": [float(z) for z in row["zone"]] if row.get("zone") else None,
                    "confidence": float(row.get("confidence", 0.5)),
                    "metadata": {
                        k: str(v) for k, v in (row.get("metadata") or {}).items()
                    },
                }
            )
    return out


def _make_learn_udf(derive_only: bool):
    @pandas_udf(CANDIDATE_TYPE)
    def learn_candidates_udf(
        spans: pd.Series, pw: pd.Series, ph: pd.Series,
        schema: pd.Series, values: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                _learn_one(sp, w, h, sc, va, derive_only=derive_only)
                for sp, w, h, sc, va in zip(spans, pw, ph, schema, values)
            ]
        )

    return learn_candidates_udf


learn_candidates_udf = _make_learn_udf(derive_only=False)


def learn_kb(
    docs: DataFrame, values_col: Optional[str] = None, derive_only: bool = False
) -> DataFrame:
    """docs(doc_id, label, extraction_schema, ordered_spans, page_width,
    page_height[, <values_col> map<field,string>]) → KB_SCHEMA table.

    Deterministic: per (label, field) the winner is the max-confidence
    candidate, ties broken by earliest doc_id.

    ``derive_only=True`` is the adaptive-repair mode (O2,
    extractor.py:733-738): a rule is emitted ONLY when it can be derived
    from the adjudicated value (U7); the U6 anchor-name fallback is off so
    a failed derivation leaves the existing KB rule in place instead of
    replacing it with a name-probe guess."""
    values = F.col(values_col) if values_col else F.lit(None).cast(
        "map<string,string>"
    )
    udf = _make_learn_udf(derive_only) if derive_only else learn_candidates_udf
    cands = docs.select(
        "doc_id",
        "label",
        F.explode(
            udf(
                F.col("ordered_spans"),
                F.col("page_width"),
                F.col("page_height"),
                F.col("extraction_schema"),
                values,
            )
        ).alias("c"),
    )
    w = Window.partitionBy("label", F.col("c.field")).orderBy(
        F.col("c.confidence").desc(), F.col("doc_id").asc()
    )
    return (
        cands.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "label",
            F.col("c.field").alias("field"),
            F.col("c.type").alias("type"),
            F.col("c.zone").alias("zone"),
            F.col("c.confidence").alias("confidence"),
            F.col("c.metadata").alias("metadata"),
            F.lit(True).alias("template_fixo"),
        )
    )
