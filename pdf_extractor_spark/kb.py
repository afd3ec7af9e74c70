"""Knowledge-base dimension table: load/save + schema helpers.

The reference persists its KB as ``knowledge_base.json``
(`/root/reference/extractor.py:764-808`); here the KB is a small Spark
dimension table (KB_SCHEMA) that broadcasts onto the document stream. JSON
import/export is kept for interchange with the reference format: legacy
``TABLE`` heuristics are skipped on import (extractor.py:796-797)."""

from __future__ import annotations

import json
from typing import Any, Dict, List

from pyspark.sql import DataFrame, SparkSession

from pdf_extractor_spark.schema import KB_SCHEMA


def kb_rows_from_json(data: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Reference KB JSON → flat rows for KB_SCHEMA."""
    meta = data.get("metadata", {})
    kb = data.get("kb", data)
    rows: List[Dict[str, Any]] = []
    # labels present only in metadata (e.g. variable templates with no
    # rules) still need a sentinel row so their template flag survives
    for label in meta:
        if label not in kb:
            rows.append(
                {"label": label, "field": "__label__", "type": "META",
                 "zone": None, "confidence": 0.0, "metadata": {},
                 "template_fixo": bool(meta[label].get("template_fixo", True))}
            )
    for label, fields in kb.items():
        fixed = bool(meta.get(label, {}).get("template_fixo", True))
        if not fields:  # known label, empty rule set → metadata row only
            rows.append(
                {"label": label, "field": "__label__", "type": "META",
                 "zone": None, "confidence": 0.0, "metadata": {},
                 "template_fixo": fixed}
            )
        for field_name, h in fields.items():
            if h.get("type") == "TABLE":  # legacy skip
                continue
            md = {
                k: (str(v).lower() if isinstance(v, bool) else str(v))
                for k, v in (h.get("metadata") or {}).items()
                if v is not None
            }
            zone = h.get("value") if h.get("type") == "ZONE" else None
            rows.append(
                {
                    "label": label,
                    "field": field_name,
                    "type": h["type"],
                    "zone": [float(z) for z in zone] if zone else None,
                    "confidence": float(h.get("confidence", 1.0)),
                    "metadata": md,
                    "template_fixo": fixed,
                }
            )
    return rows


def load_kb_json(spark: SparkSession, path: str) -> DataFrame:
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    return spark.createDataFrame(kb_rows_from_json(data), KB_SCHEMA)


def kb_df(spark: SparkSession, rows: List[Dict[str, Any]]) -> DataFrame:
    return spark.createDataFrame(rows, KB_SCHEMA)


def export_kb_json(kb: DataFrame, path: str) -> None:
    """KB table → reference-format JSON (extractor.py:764-783). META
    sentinel rows become label_metadata entries, not fields."""
    out: Dict[str, Any] = {"kb": {}, "metadata": {}}
    for r in kb.collect():
        label_kb = out["kb"].setdefault(r["label"], {})
        if r["type"] != "META":
            label_kb[r["field"]] = {
                "type": r["type"],
                "value": list(r["zone"]) if r["zone"] is not None else None,
                "confidence": r["confidence"],
                "metadata": dict(r["metadata"] or {}),
            }
        out["metadata"][r["label"]] = {"template_fixo": bool(r["template_fixo"])}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=2, ensure_ascii=False)
