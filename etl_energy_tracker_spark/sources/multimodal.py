"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

Image decode is REAL: ``decode_image`` uses PIL when the cluster has
it and otherwise falls back to a stdlib-only PNG decoder
(``decode_png``: zlib inflate + full spec filter reconstruction).
Audio decode is REAL for PCM WAV: ``decode_wav`` (stdlib ``wave`` +
``array``) feeds ``extract_audio_features`` with sample-rate /
duration / RMS features. Video and compressed audio remain STUBS
behind ``decode_stub`` (clearly-marked NotImplementedError) — but the
Spark-side plumbing is real either way: schema shape,
partition-preserving mapInPandas, Arrow batch iteration, and metadata
extraction all run exactly as they would with every codec present.

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
    """Real decode kernel slot for modalities with no codec here
    (video; compressed audio beyond WAV). Drop in torchaudio / PyAV
    on a real cluster."""
    raise NotImplementedError(
        f"no codec for modality {modality!r} in this environment; "
        "install the codec and replace decode_stub"
    )


_RIFF_MAGIC = b"RIFF"


def decode_wav(payload: bytes) -> dict:
    """Real audio decode on the standard library alone: RIFF/WAVE PCM
    via the ``wave`` module, sample math via ``array``. Returns
    {sample_rate, n_channels, n_frames, duration_s, rms} — the
    loudness/length features an audio-corpus quality filter keys on.
    16-bit and 8-bit PCM supported (the formats ``wave`` emits);
    compressed codecs (mp3/flac/ogg) stay behind ``decode_stub``."""
    import array
    import io
    import math
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        n_channels = w.getnchannels()
        sample_rate = w.getframerate()
        n_frames = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n_frames)
    if width == 2:
        samples = array.array("h", raw)
    elif width == 1:  # unsigned 8-bit PCM, centre at 128
        # bytes() rejects negative ints; iterate the raw bytes (ints in
        # py3) and recentre into a signed 16-bit array instead
        samples = array.array("h", (b - 128 for b in raw))
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    rms = (
        math.sqrt(sum(s * s for s in samples) / len(samples)) if samples else 0.0
    )
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": n_frames,
        "duration_s": n_frames / sample_rate if sample_rate else 0.0,
        "rms": rms,
    }


def synth_wav_blobs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sample_rate: int = 8000,
    max_samples: int = 256,
) -> DataFrame:
    """Deterministic REAL WAV payloads derived from a text column:
    sample i = ((codepoint_i % 256) - 128) * 128 (int16 PCM), wrapped
    in a genuine RIFF container by the stdlib ``wave`` writer. This is
    the audio-ingest fixture generator — the payloads are real WAV
    files any decoder accepts, yet every sample is a pure function of
    the text, so downstream decoded features are oracle-computable."""
    import io
    import struct
    import wave

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = []
            for t in pdf[text_col]:
                s = [((ord(c) % 256) - 128) * 128 for c in str(t)[:max_samples]]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(struct.pack(f"<{len(s)}h", *s))
                contents.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content": contents,
                    "meta": [
                        {"modality": "audio", "mime": "audio/wav", "n_bytes": len(b)}
                        for b in contents
                    ],
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), text_col
    ).mapInPandas(batches, schema=MULTIMODAL_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate long, n_channels long, "
    "n_frames long, duration_s double, rms double"
)


def extract_audio_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio feature extraction: WAV payloads
    decode through the stdlib kernel (``decode_wav``); non-RIFF
    payloads raise through ``decode_stub``. Same scale shape as the
    image path — map-only, payload bytes never shuffle, only the tiny
    feature rows move."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = pdf["content"]
            decoded = [
                decode_wav(p)
                if bytes(p)[:4] == _RIFF_MAGIC
                else decode_stub(bytes(p), "audio")  # raises: no codec
                for p in contents
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": contents.apply(len).astype("int64"),
                    "sample_rate": pd.Series(
                        [d["sample_rate"] for d in decoded], dtype="int64"
                    ),
                    "n_channels": pd.Series(
                        [d["n_channels"] for d in decoded], dtype="int64"
                    ),
                    "n_frames": pd.Series(
                        [d["n_frames"] for d in decoded], dtype="int64"
                    ),
                    "duration_s": pd.Series(
                        [d["duration_s"] for d in decoded], dtype="float64"
                    ),
                    "rms": pd.Series([d["rms"] for d in decoded], dtype="float64"),
                }
            )

    return blobs.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> dict:
    """Real PNG decode on the standard library alone (zlib inflate +
    spec filter reconstruction, PNG spec §9 / §13): 8-bit depth,
    grey / RGB / grey-alpha / RGBA, non-interlaced — the common case
    PIL-free containers still need. Returns width/height/channels and
    the mean sample value over the reconstructed raster (a cheap but
    decode-proving feature: it is wrong unless every filter byte was
    undone correctly)."""
    width, height, channels, raster = decode_png_raster(payload)
    n = height * width * channels
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "mean_px": sum(raster) / n if n else 0.0,
    }


def decode_png_raster(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Like :func:`decode_png` but returns the full reconstructed
    raster (width, height, channels, row-major sample bytes) for
    kernels that transform pixels (resize, crop)."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat = 8, bytearray()
    width = height = bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG shape (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); use the PIL path"
        )
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG raster length mismatch")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        filt = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if filt == 1:
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif filt == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif filt == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad PNG filter byte {filt}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, out


def encode_png(width: int, height: int, channels: int, raster: bytes) -> bytes:
    """Minimal spec-conformant PNG encoder (8-bit, non-interlaced,
    filter 0 on every row) — the re-encode half of the stdlib image
    path."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(raster) != height * stride:
        raise ValueError("raster length does not match dimensions")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += raster[y * stride : (y + 1) * stride]

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """Real PNG resize on the standard library alone: decode raster,
    nearest-neighbor resample to (width, height), re-encode. PIL, when
    installed, replaces this with its richer resampling in
    :func:`resize_images`."""
    sw, sh, channels, raster = decode_png_raster(bytes(payload))
    sstride = sw * channels
    out = bytearray(width * height * channels)
    for y in range(height):
        sy = min(y * sh // height, sh - 1)
        row = sy * sstride
        dst = y * width * channels
        for x in range(width):
            sx = min(x * sw // width, sw - 1)
            s = row + sx * channels
            d = dst + x * channels
            out[d : d + channels] = raster[s : s + channels]
    return encode_png(width, height, channels, bytes(out))


def decode_image(payload: bytes) -> dict:
    """Image decode kernel: PIL when the cluster has it (any format),
    else the built-in stdlib PNG decoder, else decode_stub raises.
    Returns {width, height, channels, mean_px}."""
    payload = bytes(payload)
    try:
        import io

        from PIL import Image
    except ImportError:
        pass
    else:
        im = Image.open(io.BytesIO(payload))
        im.load()
        channels = len(im.getbands())
        flat = [
            v
            for px in im.getdata()
            for v in (px if isinstance(px, tuple) else (px,))
        ]
        return {
            "width": im.width,
            "height": im.height,
            "channels": channels,
            "mean_px": sum(flat) / len(flat) if flat else 0.0,
        }
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    return decode_stub(payload, "image")  # raises


# decoder-path output: byte features plus real decoded image features
# (NULL for rows whose modality has no decoder)
IMAGE_FEATURE_SCHEMA = (
    FEATURE_SCHEMA + ", width long, height long, channels long, mean_px double"
)


def extract_features(blobs: DataFrame, use_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    With ``use_decoder=False`` (default) only byte-level features are
    computed — length and an additive checksum (sum of byte values mod
    1e9+7), both deterministic so the pipeline is oracle-checkable.
    ``use_decoder=True`` adds REAL decoded image features
    (width/height/channels/mean pixel via ``decode_image`` — PIL when
    installed, stdlib PNG decoder otherwise); rows whose modality has
    no decoder (audio/video) keep their byte features and get NULL
    decoded columns with ``decoded_ok=false`` — a mixed-modality table
    flows through in one pass instead of failing the whole batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = pdf["content"]
            modality = pdf["meta"].apply(lambda m: m["modality"])
            cols = {
                "doc_id": pdf["doc_id"],
                "n_bytes": contents.apply(len).astype("int64"),
                "checksum": contents.apply(
                    lambda b: sum(bytes(b)) % _MOD
                ).astype("int64"),
                "modality": modality,
                "decoded_ok": [
                    bool(use_decoder) and m == "image" for m in modality
                ],
            }
            if use_decoder:
                decoded = [
                    decode_image(p) if m == "image" else None
                    for p, m in zip(contents, modality)
                ]
                for k in ("width", "height", "channels"):
                    cols[k] = pd.Series(
                        [d[k] if d is not None else None for d in decoded],
                        dtype="Int64",  # nullable: non-image rows -> NULL
                    )
                cols["mean_px"] = pd.Series(
                    [d["mean_px"] if d is not None else None for d in decoded],
                    dtype="float64",
                )
            yield pd.DataFrame(cols)

    schema = IMAGE_FEATURE_SCHEMA if use_decoder else FEATURE_SCHEMA
    return blobs.mapInPandas(batches, schema=schema)


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
    metadata, Arrow-batched, map-only.

    ``use_decoder=False`` (default): the deterministic stand-in
    "resize" tiles/truncates the payload to exactly width·height bytes
    — oracle-checkable without codecs. ``use_decoder=True``: REAL
    resize — PIL when installed; else PNG payloads go through the
    stdlib decode → nearest-neighbor resample → re-encode path
    (:func:`resize_png`); other modalities raise through
    ``decode_stub``. Downstream operators see the true post-resize
    schema and byte sizes either way."""
    target = width * height

    def _real_resize(data: bytes, modality: str) -> bytes:
        try:
            import io

            from PIL import Image
        except ImportError:
            pass
        else:
            im = Image.open(io.BytesIO(data))
            buf = io.BytesIO()
            im.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue()
        if modality == "image" and data[:8] == _PNG_MAGIC:
            return resize_png(data, width, height)
        return decode_stub(data, modality)  # raises: no codec

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_content = []
            for payload, meta in zip(pdf["content"], pdf["meta"]):
                data = bytes(payload)
                if use_decoder:
                    out_content.append(_real_resize(data, meta["modality"]))
                elif not data:
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
                            "n_bytes": len(c),
                            "width": width,
                            "height": height,
                        }
                        for m, c in zip(pdf["meta"], out_content)
                    ],
                }
            )

    return blobs.mapInPandas(batches, schema=RESIZED_SCHEMA)
