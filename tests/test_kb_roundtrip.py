"""KB JSON interchange round-trip, including the label-metadata sentinel
rows (variable-template labels and empty rule sets must survive
export→import — the reference's label_metadata contract)."""

from __future__ import annotations

import json

from pdf_extractor_spark.kb import export_kb_json, kb_df, load_kb_json

ROWS = [
    {"label": "carta", "field": "numero", "type": "ANCHOR", "zone": None,
     "confidence": 0.9,
     "metadata": {"anchor_text": "Numero", "direction": "below"},
     "template_fixo": True},
    {"label": "carta", "field": "cidade", "type": "ZONE",
     "zone": [1.0, 2.0, 3.0, 4.0], "confidence": 0.7, "metadata": {},
     "template_fixo": True},
    # variable-template label: metadata-only presence
    {"label": "nota", "field": "__label__", "type": "META", "zone": None,
     "confidence": 0.0, "metadata": {}, "template_fixo": False},
]


def _canon(df):
    out = {}
    for r in df.collect():
        d = r.asDict(recursive=True)
        out[(d["label"], d["field"])] = (
            d["type"], tuple(d["zone"]) if d["zone"] else None,
            dict(d["metadata"] or {}), d["template_fixo"],
        )
    return out


def test_kb_json_roundtrip_with_meta(spark, tmp_path):
    path = str(tmp_path / "kb.json")
    kb = kb_df(spark, ROWS)
    export_kb_json(kb, path)

    data = json.load(open(path))
    # META rows surface as label metadata, never as fields
    assert data["metadata"]["nota"] == {"template_fixo": False}
    assert data["kb"]["nota"] == {}
    assert data["metadata"]["carta"] == {"template_fixo": True}
    assert set(data["kb"]["carta"]) == {"numero", "cidade"}

    back = load_kb_json(spark, path)
    got, want = _canon(back), _canon(kb)
    # rule rows identical; the variable label keeps its META presence
    # (confidence on META rows is not semantic)
    assert {k: v for k, v in got.items() if v[0] != "META"} == {
        k: v for k, v in want.items() if v[0] != "META"
    }
    assert got[("nota", "__label__")][0] == "META"
    assert got[("nota", "__label__")][3] is False


def test_kb_json_import_skips_legacy_table(spark, tmp_path):
    path = str(tmp_path / "kb.json")
    json.dump(
        {"kb": {"x": {"f": {"type": "TABLE", "value": None,
                            "confidence": 1.0, "metadata": {}},
                      "g": {"type": "ANCHOR", "value": None,
                            "confidence": 0.8,
                            "metadata": {"anchor_text": "G"}}}},
         "metadata": {"x": {"template_fixo": True}}},
        open(path, "w"),
    )
    kb = load_kb_json(spark, path)
    fields = {r["field"] for r in kb.collect()}
    assert "f" not in fields  # legacy TABLE skipped (extractor.py:796-797)
    assert "g" in fields
