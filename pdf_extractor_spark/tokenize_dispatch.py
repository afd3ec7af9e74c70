"""Single-pass tokenizer dispatch kernel.

One Arrow ``pandas_udf`` that sniffs magic bytes per row and routes to the
PDF or HTML kernel. Branching INSIDE the kernel matters: the obvious
``F.when(is_pdf, pdf_udf(c)).otherwise(html_udf(c))`` plan evaluates BOTH
pandas UDFs over every row — the full content column crosses the Arrow
boundary twice and each kernel burns cycles rejecting the other's format.
Measured ~2x wall-clock on the mixed corpus; the fused kernel ships each
byte exactly once.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

from pdf_extractor_spark.schema import TOKENIZED_STRUCT
from pdf_extractor_spark.pdf.tokenizer import tokenize_pdf
from pdf_extractor_spark.html.boilerplate import tokenize_html


def tokenize_any(data) -> dict:
    b = bytes(data) if data is not None else b""
    if b.startswith(b"%PDF"):
        return tokenize_pdf(b)
    return tokenize_html(b)


@pandas_udf(TOKENIZED_STRUCT)
def tokenize_any_udf(content: pd.Series) -> pd.DataFrame:
    rows = [tokenize_any(b) for b in content]
    return pd.DataFrame(
        {
            "page_width": [r["page_width"] for r in rows],
            "page_height": [r["page_height"] for r in rows],
            "spans": [r["spans"] for r in rows],
        }
    )
