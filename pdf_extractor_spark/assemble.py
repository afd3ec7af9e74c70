"""Reading-order assembly — pure Column expressions, no Python UDFs.

Implements the reference's ``page.get_text("text", sort=True)`` reading order
(`/root/reference/extractor.py:103-107`): top-to-bottom (y descending in PDF
user space, origin bottom-left), then left-to-right (x ascending). Offsets
are assigned post-sort; the 4000-word truncation of the assembled full text
mirrors `/root/reference/extractor.py:126-128`.

Everything here stays inside whole-stage codegen (array_sort / transform /
aggregate are Catalyst expressions), so assembly adds no Python round-trip —
the only Python in the pipeline is the tokenizer kernel itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRUNCATE_WORDS = 4000  # extractor.py:127
TRUNCATE_SENTINEL = "\n[...texto truncado...]"  # extractor.py:128


def ordered_spans(spans: Column) -> Column:
    """Sort a geo-span array into reading order and assign offsets.

    Sort key: (-round(y0,2), round(x0,2)) — struct natural ordering gives us
    the composite sort without a comparator lambda (cheaper in codegen).
    Returns an array<struct> with the same geo fields and ``offset`` filled.
    """
    keyed = F.transform(
        spans,
        lambda s: F.struct(
            (-F.round(s["y0"], 2)).alias("_k1"),
            F.round(s["x0"], 2).alias("_k2"),
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["x0"].alias("x0"),
            s["y0"].alias("y0"),
            s["x1"].alias("x1"),
            s["y1"].alias("y1"),
            s["size"].alias("size"),
        ),
    )
    sorted_ = F.array_sort(keyed)
    return F.transform(
        sorted_,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
            s["x0"].alias("x0"),
            s["y0"].alias("y0"),
            s["x1"].alias("x1"),
            s["y1"].alias("y1"),
            s["size"].alias("size"),
        ),
    )


def public_spans(ordered: Column) -> Column:
    """Project ordered geo spans down to the public contract
    array<struct<kind,text,media_ref,offset>> (input_hint shape)."""
    return F.transform(
        ordered,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )


def full_text(ordered: Column, truncate_words: int = TRUNCATE_WORDS) -> Column:
    """Assemble reading-order text from ordered spans, one line per text run,
    truncated to the first ``truncate_words`` whitespace words with the
    reference's sentinel (extractor.py:126-128)."""
    joined = F.array_join(
        F.transform(
            F.filter(ordered, lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
        "\n",
    )
    words = F.split(joined, r"\s+")
    return F.when(
        F.size(words) > truncate_words,
        F.concat(
            F.array_join(F.slice(words, 1, truncate_words), " "),
            F.lit(TRUNCATE_SENTINEL),
        ),
    ).otherwise(joined)
