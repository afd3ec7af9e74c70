"""Arrow-vectorized Spark wrappers around the pure PDF tokenizer.

The hot path is a single ``pandas_udf``: ``Series[binary] → Series[struct]``
per Arrow batch (no per-row Python dispatch at the Spark layer — the
input_hint mandate). Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; for fat multi-MB PDFs tune
it down (see pipeline.session_defaults)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pdf_extractor_spark.schema import TOKENIZED_STRUCT
from pdf_extractor_spark.pdf.tokenizer import tokenize_pdf


@pandas_udf(TOKENIZED_STRUCT)
def tokenize_pdf_udf(content: pd.Series) -> pd.DataFrame:
    rows = [tokenize_pdf(b if b is not None else b"") for b in content]
    return pd.DataFrame(
        {
            "page_width": [r["page_width"] for r in rows],
            "page_height": [r["page_height"] for r in rows],
            "spans": [r["spans"] for r in rows],
        }
    )


def tokenize(content: Column) -> Column:
    """Column API: binary content → struct(page_width, page_height, spans)."""
    return tokenize_pdf_udf(content)


