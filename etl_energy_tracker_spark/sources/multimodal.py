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


FRAME_SCHEMA = "doc_id long, frame_idx long, n_bytes long, checksum long"


def sample_frames(
    blobs: DataFrame,
    frame_size: int = 256,
    every_n: int = 2,
    max_frames: int = 3,
) -> DataFrame:
    """Frame sampling over binary payloads — the 1→N mapInPandas shape
    a video pipeline needs (output rows ≠ input rows, still map-only:
    payloads never shuffle, each Arrow batch explodes locally).

    The deterministic stand-in kernel treats the payload as
    fixed-size byte windows: sampled frame j (j < max_frames) is the
    window starting at ``j·every_n·frame_size``; empty windows are
    dropped. A real video pipeline drops a container demuxer
    (e.g. PyAV) into the same iterator — the schema, batching, and
    fan-out plumbing are unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(payload)
                for j in range(max_frames):
                    start = j * every_n * frame_size
                    frame = data[start : start + frame_size]
                    if not frame:
                        break
                    ids.append(doc_id)
                    idxs.append(j)
                    lens.append(len(frame))
                    sums.append(sum(frame) % _MOD)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_bytes": lens, "checksum": sums}
            )

    return blobs.mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
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
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_images(
    blobs: DataFrame, width: int, height: int, use_decoder: bool = False
) -> DataFrame:
    """Image resize plumbing: binary in → binary out with updated typed
    metadata, Arrow-batched, map-only. The deterministic stand-in
    "resize" tiles/truncates the payload to exactly width·height bytes
    (a real kernel decodes via ``decode_stub`` → PIL resize → re-encode
    in the same slot); downstream operators see the true post-resize
    schema and byte sizes either way."""
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_content = []
            for payload, meta in zip(pdf["content"], pdf["meta"]):
                data = bytes(payload)
                if use_decoder:
                    decode_stub(data, meta["modality"])  # raises: no codec here
                if not data:
                    out_content.append(b"\x00" * target)
                else:
                    reps = -(-target // len(data))
                    out_content.append((data * reps)[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": out_content,
                    "meta": [
                        {
                            "modality": m["modality"],
                            "mime": m["mime"],
                            "n_bytes": target,
                            "width": width,
                            "height": height,
                        }
                        for m in pdf["meta"]
                    ],
                }
            )

    return blobs.mapInPandas(batches, schema=RESIZED_SCHEMA)
