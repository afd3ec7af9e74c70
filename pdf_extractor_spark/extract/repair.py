"""Three-way extraction planner + adaptive KB repair (O2).

This is the Spark restatement of the reference's per-document planner and
its most distinctive runtime behavior — adaptive re-optimization:

* planner branch (`/root/reference/extractor.py:905-925`):
  label unseen → LLM bootstrap (U1); label known but template variable →
  whole-doc LLM (U2); else per-field heuristics (U5) with a single per-doc
  LLM fallback for the failed fields (U3);
* adaptive repair (`extractor.py:733-738`): every value the fallback
  recovers is fed back through `_derive_heuristic_for_value` and REPLACES
  the failing KB rule, so the next document of that label extracts
  heuristically.

Spark shape: the branch tag is a broadcast join on the (tiny) KB label
table — no per-row Python; each LLM stage is one batched iterator-UDF call
per document (O8); repair is one `learn_kb(derive_only=True)` pass over the
failure set followed by a KB anti-join/union upsert. The whole loop is
deterministic given a replay table (see extract.llm), which is exactly how
the reference behaves once its LLM answers are fixed.

Scale notes: every join here is broadcast (KB labels, repaired rules — both
dimension-sized); the only per-doc work is the Arrow kernels. The failure
set is typically a small fraction of the corpus, so the repair pass costs
O(failures), not O(corpus).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdf_extractor_spark.extract import llm as llm_mod
from pdf_extractor_spark.extract.learn import learn_kb
from pdf_extractor_spark.extract.udf import extract_fields

# result columns every branch emits (union surface)
RESULT_COLS = ["doc_id", "label", "plan_branch", "result",
               "llm_in_tokens", "llm_out_tokens", "llm_cost"]

# sentinel KB row carrying per-label metadata (the reference's
# label_metadata dict, extractor.py:50,607-608): never a real schema field
LABEL_META_FIELD = "__label__"


def plan_documents(docs: DataFrame, kb: DataFrame) -> DataFrame:
    """Tag each document with its planner branch (extractor.py:905-925):
    ``bootstrap`` (label not in KB), ``llm_full`` (label known, template
    variable), ``heuristics`` (label known, template fixed). Broadcast join
    on the label dimension — never a shuffle of the docs."""
    labels = kb.groupBy("label").agg(
        F.any_value("template_fixo").alias("_fixo")
    )
    return (
        docs.join(F.broadcast(labels), "label", "left")
        .withColumn(
            "plan_branch",
            F.when(F.col("_fixo").isNull(), F.lit("bootstrap"))
            .when(~F.col("_fixo"), F.lit("llm_full"))
            .otherwise(F.lit("heuristics")),
        )
        .drop("_fixo")
    )


def _collapse(col: Column) -> Column:
    """F3 presentation contract (extractor.py:975)."""
    return F.regexp_replace(col, r"\s*\n\s*", ", ")


def _patched_result(schema_col: Column, base: Column, patch: Column) -> Column:
    """result ∪ patch over the schema's keys: patch wins where non-null,
    values newline-collapsed; every schema key present (P1 null-fill,
    extractor.py:964-966)."""
    keys = F.map_keys(schema_col)
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.coalesce(
                _collapse(F.element_at(patch, k)), F.element_at(base, k)
            ),
        ),
    )


def _zero_cost(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("llm_in_tokens", F.lit(0).cast("long"))
        .withColumn("llm_out_tokens", F.lit(0).cast("long"))
        .withColumn("llm_cost", F.lit(0.0))
    )


def extract_with_repair(
    docs: DataFrame, kb: DataFrame, replay: Dict[str, str],
    caches: Optional[list] = None,
) -> Tuple[DataFrame, DataFrame]:
    """U5 heuristics → U3 fallback on the failed fields → O2 KB repair.

    ``docs``: tokenized documents (ordered_spans, page_width, page_height,
    full_text, label, extraction_schema). ``replay``: canned fallback
    responses keyed by doc_id (see extract.llm). ``caches``: when given,
    every frame this stage persists is appended so the caller can unpersist
    after materializing results + KB (a long-lived session would otherwise
    pin storage memory per job run).

    Returns (results, repaired_kb): results carries one row per doc with
    the final field map + per-doc LLM cost columns; repaired_kb is ``kb``
    with every fallback-recovered field's rule replaced by the re-derived
    one (extractor.py:733-738)."""
    extracted = extract_fields(docs, kb).withColumn(
        "plan_branch", F.lit("heuristics")
    )
    ok = _zero_cost(extracted.where(F.size("failed_fields") == 0))
    failures = extracted.where(F.size("failed_fields") > 0)

    # U3: ONE call per failed document covering all its failed fields (O8);
    # the prompt restricts the schema to the failures (extractor.py:695-700)
    failed_schema = F.map_filter(
        F.col("extraction_schema"),
        lambda k, v: F.array_contains(F.col("failed_fields"), k),
    )
    called = llm_mod.llm_stage(
        failures.withColumn("_failed_schema", failed_schema),
        replay,
        key_col=F.col("doc_id"),
        prompt_col=llm_mod.extract_prompt(F.col("_failed_schema"), F.col("full_text")),
    )
    recovered = called.withColumn(
        "recovered",
        F.map_filter(
            llm_mod.parse_fields_response(F.col("llm_response")),
            lambda k, v: F.array_contains(F.col("failed_fields"), k)
            & v.isNotNull(),
        ),
    )
    # persisted: three consumers (recovered-ok split, re-extract split, the
    # repair learner) — without the cache each branch re-executes the LLM
    # stage, i.e. a real client would re-issue (and re-pay) every fallback
    # call per branch, and a temperature>0 response could split a doc
    # inconsistently between branches
    patched = recovered.withColumn(
        "result",
        _patched_result(
            F.col("extraction_schema"), F.col("result"), F.col("recovered")
        ),
    ).persist()
    if caches is not None:
        caches.append(patched)

    # O2: derive replacement rules from the recovered values only
    # (derive_only — a value U7 cannot locate leaves the old rule in place)
    repair_docs = patched.where(F.size("recovered") > 0).withColumn(
        "extraction_schema",
        F.map_filter(
            F.col("extraction_schema"),
            lambda k, v: F.element_at(F.col("recovered"), k).isNotNull(),
        ),
    )
    repaired_rows = learn_kb(repair_docs, values_col="recovered", derive_only=True)
    repaired_kb = kb_upsert(kb, repaired_rows)

    # Second pass: docs whose failures the fallback did NOT adjudicate get
    # re-extracted under the repaired KB. The reference reaches this state
    # sequentially — document i+1 extracts with the rule document i's
    # fallback just repaired (extractor.py:733-738 mutates the live KB
    # mid-batch); in batch form that is one extra kernel pass over the
    # still-failing subset only.
    unrec = F.filter(
        F.col("failed_fields"),
        lambda f: F.element_at(F.col("recovered"), f).isNull(),
    )
    patched = patched.withColumn("_unrec", unrec)
    rec_ok = patched.where(F.size("_unrec") == 0)
    still = patched.where(F.size("_unrec") > 0)
    reex_in = (
        still.withColumnRenamed("result", "_base_result")
        .withColumnRenamed("extraction_schema", "_full_schema")
        .withColumn(
            "extraction_schema",
            F.map_filter(
                F.col("_full_schema"),
                lambda k, v: F.array_contains(F.col("_unrec"), k),
            ),
        )
        .drop("failed_fields")
    )
    reex = extract_fields(reex_in, repaired_kb).withColumn(
        "result",
        _patched_result(
            F.col("_full_schema"), F.col("_base_result"), F.col("result")
        ),
    )
    results = (
        ok.select(*RESULT_COLS)
        .unionByName(rec_ok.select(*RESULT_COLS))
        .unionByName(reex.select(*RESULT_COLS))
    )
    return results, repaired_kb


def kb_upsert(kb: DataFrame, new_rows: DataFrame) -> DataFrame:
    """Replace (label, field) rules with new ones, keep the rest (the
    reference mutates KB[label][field] in place; the table analog is an
    anti-join + union — new_rows is dimension-sized, so broadcast)."""
    keep = kb.join(
        F.broadcast(new_rows.select("label", "field").distinct()),
        ["label", "field"],
        "left_anti",
    )
    return keep.unionByName(new_rows.select(*kb.columns))


def bootstrap_labels(
    docs: DataFrame, replay: Dict[str, str], caches: Optional[list] = None
) -> Tuple[DataFrame, DataFrame]:
    """U1: one LLM call for the FIRST document of each unseen label; its
    values drive heuristic learning (U7 first, U6 for null fields —
    extractor.py:617-637). Returns (bootstrap_doc_results, learned_kb_rows).

    The reference bootstraps on whichever doc of a new label arrives first;
    batch-deterministically that is the min doc_id per label."""
    w = Window.partitionBy("label").orderBy("doc_id")
    first = docs.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") == 1
    ).drop("_rk")
    called = llm_mod.llm_stage(
        first,
        replay,
        key_col=F.col("label"),
        prompt_col=llm_mod.bootstrap_prompt(
            F.col("extraction_schema"), F.col("full_text")
        ),
    )
    fixo, fields = llm_mod.parse_bootstrap_response(F.col("llm_response"))
    # persisted: consumed by the doc results, the rule learner, and the
    # label-metadata rows — one LLM execution per bootstrap doc
    parsed = (
        called.withColumn("_fixo", fixo).withColumn("values", fields).persist()
    )
    if caches is not None:
        caches.append(parsed)

    # result for the bootstrap doc itself = the LLM's values, collapsed,
    # null-filled over the schema (extractor.py:611-643,964-966)
    results = parsed.withColumn(
        "result",
        _patched_result(
            F.col("extraction_schema"),
            F.lit(None).cast("map<string,string>"),
            F.col("values"),
        ),
    ).withColumn("plan_branch", F.lit("bootstrap"))

    # learning: U7 from values, U6 for the null fields — exactly learn_kb's
    # candidate order; rules are kept only for fixed templates
    # (extractor.py:628,636 guard `if ... and is_fixed`) and only when the
    # bootstrap call actually answered (a failed call returns all-None and
    # learns nothing, :601-604 — the label stays unseen for the next batch)
    answered = parsed.where(F.col("llm_response").isNotNull())
    learned = learn_kb(answered.where(F.col("_fixo")), values_col="values")
    # every ANSWERED label also records a metadata row carrying its
    # template flag (the reference's label_metadata, extractor.py:607-608)
    # — without it a variable-template label has no KB presence and would
    # re-bootstrap (another paid LLM call) on every future batch instead
    # of routing to the whole-doc branch. The sentinel field never matches
    # a schema key, so the extraction kernel ignores it.
    meta_rows = answered.select(
        "label",
        F.lit(LABEL_META_FIELD).alias("field"),
        F.lit("META").alias("type"),
        F.lit(None).cast("array<double>").alias("zone"),
        F.lit(0.0).alias("confidence"),
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.col("_fixo").alias("template_fixo"),
    ).dropDuplicates(["label"])  # distinct() rejects MAP columns
    return results.select(*RESULT_COLS), learned.unionByName(meta_rows)


def llm_full_extract(
    docs: DataFrame, replay: Dict[str, str]
) -> DataFrame:
    """U2: whole-document LLM extraction for variable templates — one call
    per doc, results normalized over the schema (extractor.py:647-688)."""
    called = llm_mod.llm_stage(
        docs,
        replay,
        key_col=F.col("doc_id"),
        prompt_col=llm_mod.extract_prompt(
            F.col("extraction_schema"), F.col("full_text")
        ),
    )
    out = called.withColumn(
        "result",
        _patched_result(
            F.col("extraction_schema"),
            F.lit(None).cast("map<string,string>"),
            llm_mod.parse_fields_response(F.col("llm_response")),
        ),
    ).withColumn("plan_branch", F.lit("llm_full"))
    return out.select(*RESULT_COLS)


def extract_planned(
    docs: DataFrame,
    kb: DataFrame,
    replay: Optional[Dict[str, str]] = None,
    caches: Optional[list] = None,
) -> Tuple[DataFrame, DataFrame]:
    """The full three-way planner over a tokenized doc table.

    Returns (results, kb_out). kb_out = input KB + bootstrap-learned rules
    + repair-replaced rules — the state the reference persists after a
    batch (app.py:86, batch_extract.py:196).

    Branch routing of post-bootstrap docs: the remaining documents of a
    bootstrapped label follow the learned template flag — fixed → the
    heuristic branch with the just-learned rules (the reference reaches the
    same state on its next iteration once the KB holds the label), variable
    → whole-doc LLM."""
    replay = replay or {}
    planned = plan_documents(docs, kb)

    boot_docs = planned.where(F.col("plan_branch") == "bootstrap")
    boot_results, learned = bootstrap_labels(boot_docs, replay, caches=caches)
    kb_aug = kb.unionByName(learned)

    # fixed = labels whose metadata/rule rows carry template_fixo=true; a
    # variable label contributes only its META row (fixo=false) and routes
    # to the whole-doc branch
    fixed_labels = (
        learned.where(F.col("template_fixo")).select("label").distinct()
    )
    w = Window.partitionBy("label").orderBy("doc_id")
    boot_rest = (
        boot_docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") > 1)
        .drop("_rk")
    )
    rest_fixed = boot_rest.join(F.broadcast(fixed_labels), "label", "left_semi")
    rest_variable = boot_rest.join(
        F.broadcast(fixed_labels), "label", "left_anti"
    )

    heur_docs = planned.where(F.col("plan_branch") == "heuristics").unionByName(
        rest_fixed.withColumn("plan_branch", F.lit("heuristics"))
    )
    heur_results, kb_out = extract_with_repair(
        heur_docs.drop("plan_branch"), kb_aug, replay, caches=caches
    )

    llm_docs = planned.where(F.col("plan_branch") == "llm_full").unionByName(
        rest_variable.withColumn("plan_branch", F.lit("llm_full"))
    )
    llm_results = llm_full_extract(llm_docs, replay)

    results = boot_results.unionByName(heur_results).unionByName(llm_results)
    return results, kb_out
