"""Multimodal (binary) column plumbing — SURVEY §2.2 C25.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing here is real and tested: schema, Arrow batch
shape, ``mapInPandas`` signature, partition behavior. The actual media
decoding is STUBBED (``decode_image`` raises) because no imaging library
ships in this container; ``extract_binary_meta`` uses deterministic
byte-level features in its place so the pipeline is end-to-end testable.

100 TB notes: binary payloads ride the Arrow stream in batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low enough that
batch_bytes = records x payload fits executor memory. Feature extraction
is stateless per-partition Python — scales linearly, no shuffle. Column
pruning matters most here: never scan the binary column for
metadata-only queries (project before the UDF).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id bigint, n_bytes int, sha256 string, fake_width int, fake_height int"
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Decode an image payload to pixels. STUB: imaging libraries (PIL,
    opencv) are not available in this environment."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; extract_binary_meta provides deterministic byte-level "
        "features through the same pipeline instead"
    )


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                # deterministic stand-ins for decoded dimensions
                "fake_width": payloads.map(lambda b: len(b) % 640).astype("int32"),
                "fake_height": payloads.map(lambda b: (len(b) * 7) % 480).astype(
                    "int32"
                ),
            }
        )


def extract_binary_meta(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload binary)."""
    return df.select("doc_id", "payload").mapInPandas(_meta_batches, META_SCHEMA)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Make an opaque binary column from text (the fixture has no real
    media; UTF-8 bytes exercise identical plumbing)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
