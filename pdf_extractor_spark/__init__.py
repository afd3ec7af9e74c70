"""pdf_extractor_spark — a PySpark-native document extraction engine.

Brand-new implementation (NOT a port) of the capabilities of the reference
``laysearaujo/pdf-extractor`` (see /root/reference, SURVEY.md):

* PDF content-stream tokenization into ordered (kind, text, media_ref, offset)
  span sequences — vectorized Arrow pandas_udf, stdlib-only parser
  (reference semantics: extractor.py:93-144).
* HTML boilerplate stripping (text-density / link-density heuristics,
  Kohlschütter-style) emitting the same span contract.
* Anchor/zone/regex field extraction driven by a broadcast knowledge-base
  dimension table (reference semantics: extractor.py:193-362).
* Content-hash dedup, checkpoint/lineage resume, skew-aware repartitioning.
* Training-data pipeline ops: dedup (exact/MinHash-LSH/SimHash/ngram),
  embedding similarity search, text quality analysis, multimodal plumbing.

Everything is expressed with the DataFrame API so Catalyst handles pushdown,
pruning and join planning; Python appears only inside Arrow-batched kernels.
"""

__version__ = "0.1.0"
