"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are
STUBS behind ``decode_stub`` (clearly-marked NotImplementedError) and
a deterministic fake used by tests — but the Spark-side plumbing is
real: schema shape, partition-preserving mapInPandas, Arrow batch
iteration, and metadata extraction all run exactly as they would with
a real codec dropped in.

Scale notes: payload bytes never hit a shuffle — feature extraction is
map-only over Arrow batches; only the (small) extracted features move.
Batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
for 100 MB-scale blobs set it low (e.g. 32) so a batch fits executor
memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, modality string, decoded_ok boolean"
)

_MOD = 1_000_000_007


def as_blob_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap any text column as a binary payload + typed metadata —
    the shape a real image/audio ingest would produce."""
    content = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("text").alias("modality"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(content).cast("long").alias("n_bytes"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        content.alias("content"),
        meta.alias("meta"),
    )


def decode_stub(payload: bytes, modality: str) -> object:
    """Real decode kernel slot. Image/audio libraries are not in this
    container — drop in PIL / torchaudio here on a real cluster."""
    raise NotImplementedError(
        f"no codec for modality {modality!r} in this environment; "
        "install the codec and replace decode_stub"
    )


def extract_features(blobs: DataFrame, use_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    With ``use_decoder=False`` (default in this environment) only
    byte-level features are computed — length and an additive checksum
    (sum of byte values mod 1e9+7), both deterministic so the pipeline
    is oracle-checkable. ``use_decoder=True`` routes through
    ``decode_stub`` (NotImplementedError until a codec exists).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = pdf["content"]
            modality = pdf["meta"].apply(lambda m: m["modality"])
            if use_decoder:
                for payload, mod in zip(contents, modality):
                    decode_stub(bytes(payload), mod)  # raises: no codec here
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": contents.apply(len).astype("int64"),
                    "checksum": contents.apply(
                        lambda b: sum(bytes(b)) % _MOD
                    ).astype("int64"),
                    "modality": modality,
                    "decoded_ok": use_decoder,
                }
            )

    return blobs.mapInPandas(batches, schema=FEATURE_SCHEMA)
