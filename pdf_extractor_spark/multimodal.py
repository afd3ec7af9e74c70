"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched kernels over ``mapInPandas``. The
image/audio codec libraries are not available in this container, so the
actual decoders are gated behind import-tries with a deterministic fake
fallback — the Spark-side contract (schema, batch shape, partitioning) is
real and tested either way."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

def _meta_schema(id_field: StructField) -> StructType:
    """Output schema mirrors the caller's id column type (string ids stay
    string, int64 ids stay int64) so oracle comparisons see identical types."""
    return StructType(
        [
            StructField("doc_id", id_field.dataType),
            StructField("byte_len", LongType()),
            StructField("fake_width", LongType()),
            StructField("fake_frames", LongType()),
        ]
    )

try:  # real decoders, if the environment ever provides them
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _decode_one(blob: bytes) -> dict:
    """Decode one blob's metadata.

    With PIL present, real image containers are parsed (width, frame count
    for animated formats); anything PIL rejects — and every blob when PIL
    is absent, as in this sandbox — falls back to the deterministic fake
    derived from byte length, which keeps the pipeline shape testable (and
    oracle-checkable: the oracle feeds text bytes, which no codec accepts,
    so both environments agree)."""
    n = len(blob) if blob is not None else 0
    if _HAS_PIL and blob:
        try:
            import io

            with Image.open(io.BytesIO(bytes(blob))) as im:
                return {
                    "byte_len": n,
                    "fake_width": int(im.width),
                    "fake_frames": int(getattr(im, "n_frames", 1)),
                }
        except Exception:
            pass  # not a decodable image container → deterministic fake
    return {"byte_len": n, "fake_width": n % 64 + 16, "fake_frames": n % 7 + 1}


def decode_metadata(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """binary column → typed metadata via mapInPandas (Arrow batches)."""

    projected = df.select(F.col(id_col).alias("doc_id"), blob_col)
    schema = _meta_schema(projected.schema["doc_id"])

    def run_named(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_one(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [m["byte_len"] for m in metas],
                    "fake_width": [m["fake_width"] for m in metas],
                    "fake_frames": [m["fake_frames"] for m in metas],
                }
            )

    return projected.mapInPandas(run_named, schema)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id",
                  every: int = 2) -> DataFrame:
    """1 blob → N frame rows (UDTF shape): deterministic fake frame sampling;
    a real video path would decode at `every`-frame stride.

    The fake frame hash digests the LOWERCASE HEX of the strided bytes
    (not the raw bytes): hex is always valid ASCII, so the SQL oracle can
    state the identical computation on an engine whose sha256 only accepts
    strings (raw stride-split bytes can be invalid UTF-8)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, hashes = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else b""
                n_frames = len(blob) % 7 + 1
                for i in range(0, n_frames, every):
                    frame = blob[i :: max(n_frames, 1)]
                    ids.append(str(doc_id))
                    nos.append(i)
                    hashes.append(
                        hashlib.sha256(frame.hex().encode("ascii"))
                        .hexdigest()[:16]
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame_hash": hashes})

    return df.select(F.col(id_col).cast("string").alias(id_col), blob_col).mapInPandas(
        run, FRAME_SCHEMA
    )
