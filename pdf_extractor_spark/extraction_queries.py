"""Driver-checkable registry entries for the extraction pipeline itself.

Three queries the per-operator registry (queries.py / pipeline_queries.py)
did not cover directly:

* ``s1_extract_spans`` — the flagship S1 span pipeline over the
  deterministic synthetic corpus, with a per-doc span-sequence hash, so the
  driver's per-query gate sees the tokenizer/assembly kernel directly
  instead of only through ``entry()``. Rows-only by nature (the kernel's
  PDF/HTML parse has no single-statement SQL equivalent); pytest
  (tests/test_corpus.py) separately asserts distributed == local-kernel
  output on the same corpus.
* ``o2_repair_loop`` — the adaptive repair loop (extractor.py:733-738):
  a label whose KB rule is broken, one replayed LLM adjudication, the rule
  re-derived and transferred to a second document heuristically. Rows-only
  (stateful multi-stage loop), deterministic end to end.
* ``a4_kb_stats`` — A4 (extractor.py:748-762): per-label heuristic counts
  + totals over a KB dimension table, oracle-checked against DuckDB on the
  identical inline KB rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.extraction_golden import S1_GOLDEN
from pdf_extractor_spark.queries import register

_S1_VALUES = ",\n          ".join(
    f"('{d}', {c}, '{h}')" for d, c, h in S1_GOLDEN
)


@register(
    "s1_extract_spans",
    f"""SELECT doc_id, span_count, span_seq_hash
        FROM (VALUES {_S1_VALUES})
          t(doc_id, span_count, span_seq_hash)
        ORDER BY doc_id""",
)
def s1_extract_spans(spark, sf_dir):
    """S1 flagship: deterministic interleaved PDF+HTML corpus → fused Arrow
    tokenize/assemble kernel (narrow, zero-shuffle) → one row per doc with
    the span-sequence hash over the public contract (kind, text, media_ref,
    offset). Deterministic: same corpus seed ⇒ same 200 hashes — frozen as
    an inline-VALUES oracle (extraction_golden.py), which puts the kernel
    under the driver's full row/schema/hash gate."""
    from pdf_extractor_spark.corpus import generate_corpus
    from pdf_extractor_spark.pipeline import extract_spans

    docs = generate_corpus(spark, 200, partitions=8)
    spans = extract_spans(docs, partitions=8, columns="public")
    return spans.select(
        "doc_id",
        F.size("spans").alias("span_count"),
        F.md5(F.to_json("spans")).alias("span_seq_hash"),
    ).orderBy("doc_id")


def _repair_fixture(spark):
    """Two labeled cards sharing a layout + a KB whose rule cannot match."""
    from pdf_extractor_spark.corpus import make_labeled_pdf
    from pdf_extractor_spark.kb import kb_df
    from pdf_extractor_spark.pipeline import tokenize_stage
    from pdf_extractor_spark.schema import RAW_DOC_SCHEMA

    fields = {"Registro": "88421", "Cidade": "Curitiba"}
    rows = [
        (f"card_{i}", make_labeled_pdf(fields, title=f"FICHA {i}"),
         "application/pdf", "ficha", None, 0)
        for i in range(2)
    ]
    docs = tokenize_stage(
        spark.createDataFrame(rows, RAW_DOC_SCHEMA).withColumn(
            "extraction_schema",
            F.create_map(F.lit("registro"), F.lit("Numero de registro")),
        )
    )
    kb = kb_df(
        spark,
        [
            {"label": "ficha", "field": "registro", "type": "ANCHOR",
             "zone": None, "confidence": 0.9,
             "metadata": {"anchor_text": "Matricula", "direction": "below",
                          "layout": "column"},
             "template_fixo": True},
        ],
    )
    return docs, kb


@register(
    "o2_repair_loop",
    """SELECT stage, doc_id, registro, llm_used
       FROM (VALUES
         ('repair', 'card_0', '88421', TRUE),
         ('transfer', 'card_1', '88421', FALSE))
         t(stage, doc_id, registro, llm_used)
       ORDER BY stage, doc_id""",
)
def o2_repair_loop(spark, sf_dir):
    """O2: card_0 fails under the broken rule → replayed fallback
    adjudicates '88421' → rule re-derived from the value (U7) and upserted →
    card_1 extracts heuristically under the repaired KB. Emits one row per
    (stage, doc) with the extracted value — deterministic end to end, so
    the expected rows are frozen as an inline-VALUES oracle (full driver
    hash gate instead of rows-only)."""
    from pdf_extractor_spark.extract.llm import replay_response
    from pdf_extractor_spark.extract.repair import extract_with_repair
    from pdf_extractor_spark.extract.udf import extract_fields

    docs, kb = _repair_fixture(spark)
    replay = {"card_0": replay_response({"registro": "88421"})}
    repaired, kb2 = extract_with_repair(
        docs.where(F.col("doc_id") == "card_0"), kb, replay
    )
    transferred = extract_fields(docs.where(F.col("doc_id") == "card_1"), kb2)
    out = repaired.select(
        F.lit("repair").alias("stage"),
        "doc_id",
        F.element_at("result", "registro").alias("registro"),
        (F.col("llm_cost") > 0).alias("llm_used"),
    ).unionByName(
        transferred.select(
            F.lit("transfer").alias("stage"),
            "doc_id",
            F.element_at("result", "registro").alias("registro"),
            F.lit(False).alias("llm_used"),
        )
    )
    return out.orderBy("stage", "doc_id")


_A4_KB_ROWS = [
    ("carteira_oab", "nome", "ZONE"),
    ("carteira_oab", "inscricao", "ANCHOR"),
    ("carteira_oab", "situacao", "ANCHOR"),
    ("tela_sistema", "data_base", "ANCHOR"),
    ("tela_sistema", "total", "ZONE"),
]

_A4_VALUES = ", ".join(f"('{l}', '{f}', '{t}')" for l, f, t in _A4_KB_ROWS)


@register(
    "a4_kb_stats",
    f"""WITH kb(label, field, type) AS (VALUES {_A4_VALUES})
        SELECT label,
               count(*) AS n_heuristics,
               count(*) FILTER (type = 'ANCHOR') AS n_anchor,
               count(*) FILTER (type = 'ZONE') AS n_zone
        FROM kb GROUP BY label""",
)
def a4_kb_stats(spark, sf_dir):
    """A4 (extractor.py:748-762): labels learned + heuristic counts — a
    grouped count over the KB dimension table (identical inline rows feed
    both engines; in production this runs over the persisted KB table)."""
    kb = spark.createDataFrame(_A4_KB_ROWS, "label string, field string, type string")
    return kb.groupBy("label").agg(
        F.count("*").alias("n_heuristics"),
        F.count(F.when(F.col("type") == "ANCHOR", 1)).alias("n_anchor"),
        F.count(F.when(F.col("type") == "ZONE", 1)).alias("n_zone"),
    )
