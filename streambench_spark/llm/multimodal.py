"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A multimodal training pipeline stores image/audio/video as ``binary``
columns beside typed metadata and runs decode / feature-extraction /
resize / frame-sampling as Arrow-batched Python over ``mapInPandas``.
This container has no codec libraries, so the decode step is STUBBED
(deterministic fake parser for a self-describing fake header, else
``NotImplementedError``) — but everything Spark-side is real and tested:
the schema, the mapInPandas batch shape (pandas.Series of bytes in,
DataFrame out), partition-preserving execution, and Arrow binary
round-tripping.

Scale posture: mapInPandas streams Arrow record batches through one
Python worker per core with NO shuffle — decode/feature-extract is
embarrassingly parallel, so the plan is a single mapPartitions-like stage
whose throughput scales linearly with executors. Batch size is governed
by spark.sql.execution.arrow.maxRecordsPerBatch (set in session.py).
"""

from __future__ import annotations

from collections.abc import Iterator
import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata schema for a multimodal asset column.
ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

# Self-describing fake header: b"FAKEIMG:<width>x<height>:" prefix.
_FAKE_MAGIC = b"FAKEIMG:"

# Optional real codec: used when Pillow is installed (it is not in this
# container — the FAKEIMG path keeps everything testable without it, and
# the same operators become real decoders wherever PIL exists).
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def decode_image(payload: bytes) -> tuple[int, int]:
    """Decode image dimensions: FAKEIMG header first (deterministic test
    path), then Pillow when installed, else refuse."""
    if payload.startswith(_FAKE_MAGIC):
        dims = payload[len(_FAKE_MAGIC) :].split(b":", 1)[0]
        w, h = dims.split(b"x")
        return int(w), int(h)
    if HAS_PIL:
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return im.size
    raise NotImplementedError(
        "real image decoding requires Pillow, not present in this "
        "environment; payloads must carry the FAKEIMG header in tests"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Per batch: byte length + sha256 (always computable) and decoded
    dimensions when the payload is a (fake-)image; width/height are NULL
    for non-images. One narrow stage, no shuffle."""

    # Self-contained closure: only stdlib/pandas imports inside, no
    # references to this module's globals — cloudpickle then ships it by
    # value, so executors need no PYTHONPATH entry for this package
    # (matters when the driver process runs from an arbitrary cwd).
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import io as _io

        import pandas as _pd

        # worker-side optional codec probe (the closure stays
        # self-contained: no reference to this module's globals)
        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None

        magic = b"FAKEIMG:"

        def _dims(row):
            payload, media = row["payload"], row["media_type"]
            if media != "image":
                return (None, None)
            if payload.startswith(magic):
                w, h = payload[len(magic):].split(b":", 1)[0].split(b"x")
                return int(w), int(h)
            if _Image is not None:
                try:
                    with _Image.open(_io.BytesIO(bytes(payload))) as im:
                        return im.size
                except Exception:
                    return (None, None)  # undecodable real payload
            return (None, None)

        for pdf in batches:
            out = _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_sha256": pdf["payload"].map(
                        lambda b: _hashlib.sha256(b).hexdigest()
                    ),
                }
            )
            dims = pdf.apply(_dims, axis=1)
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            yield out

    return assets.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def documents_as_binary_assets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapt the documents table into a binary-asset table (payload =
    UTF-8 bytes of the text). Lets the binary path be driver-verified
    against a SQL oracle without codec libraries: the oracle recomputes
    octet length + sha256 over the same encoding."""
    return docs.select(
        "doc_id",
        F.lit("text").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


_FAKE_AUDIO_MAGIC = b"FAKEAUD:"


def decode_audio(payload: bytes) -> tuple[int, int]:
    """Decode (sample_rate, n_samples). Same stub contract as
    decode_image: parse the self-describing fake header
    (b"FAKEAUD:<rate>:<n_samples>:"), refuse real codecs."""
    if payload.startswith(_FAKE_AUDIO_MAGIC):
        rate, n, _rest = payload[len(_FAKE_AUDIO_MAGIC) :].split(b":", 2)
        return int(rate), int(n)
    raise NotImplementedError(
        "real audio decoding requires a codec library not present in this "
        "environment; payloads must carry the FAKEAUD header in tests"
    )


def fit_box(w: int, h: int, target: int) -> tuple[int, int]:
    """Aspect-preserving integer fit of (w, h) into a target×target box:
    the longer edge becomes `target`, the shorter scales proportionally
    (floor, min 1). Pure integer arithmetic so a SQL oracle can replicate
    it exactly."""
    m = max(w, h)
    return max(1, (w * target) // m), max(1, (h * target) // m)


def resize_images(assets: DataFrame, target: int = 16) -> DataFrame:
    """Arrow-batched image resize over binary payloads (binary in, binary
    out — the same plumbing a real thumbnailing stage uses; only the pixel
    resample is faked). Output payload: FAKEIMG header with the fitted
    dimensions + a body of exactly width*height bytes, deterministically
    tiled from the source body (a real pipeline puts the decoded+resampled
    pixels here). One narrow stage, no shuffle; non-images pass through
    with NULL dims."""

    # Self-contained closure (shipped by value — see extract_features).
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io

        import pandas as _pd

        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None

        magic = b"FAKEIMG:"

        def _one(row):
            payload, media = row["payload"], row["media_type"]
            if media == "image" and not payload.startswith(magic) and _Image is not None:
                # real codec path (wherever Pillow exists): decode,
                # aspect-fit resample, re-encode PNG
                try:
                    with _Image.open(_io.BytesIO(bytes(payload))) as im:
                        w, h = im.size
                        m = max(w, h)
                        nw = max(1, (w * target) // m)
                        nh = max(1, (h * target) // m)
                        buf = _io.BytesIO()
                        im.resize((nw, nh)).save(buf, format="PNG")
                        return (w, h, nw, nh, buf.getvalue())
                except Exception:
                    return (None, None, None, None, payload)
            if media != "image" or not payload.startswith(magic):
                return (None, None, None, None, payload)
            head, body = payload[len(magic):].split(b":", 1)
            w, h = (int(x) for x in head.split(b"x"))
            m = max(w, h)
            nw = max(1, (w * target) // m)
            nh = max(1, (h * target) // m)
            need = nw * nh
            src = body if body else b"\x00"
            tiled = (src * (need // len(src) + 1))[:need]
            out = magic + f"{nw}x{nh}".encode() + b":" + tiled
            return (w, h, nw, nh, out)

        for pdf in batches:
            res = pdf.apply(_one, axis=1)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": _pd.Series([r[0] for r in res], dtype="Int32"),
                    "src_h": _pd.Series([r[1] for r in res], dtype="Int32"),
                    "width": _pd.Series([r[2] for r in res], dtype="Int32"),
                    "height": _pd.Series([r[3] for r in res], dtype="Int32"),
                    "payload": [r[4] for r in res],
                }
            )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("src_w", IntegerType()),
            StructField("src_h", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("payload", BinaryType()),
        ]
    )
    return assets.mapInPandas(_resize, schema=out_schema)


def frame_sample_indices(n_frames_col: str, every_n: int) -> Column:
    """Video frame-sampling plan helper: indices 0, every_n, 2·every_n …
    below n_frames — pure expression (the decode of those frames is the
    stubbed step)."""
    return F.expr(
        f"CASE WHEN {n_frames_col} > 0 THEN "
        f"sequence(0, {n_frames_col} - 1, {every_n}) ELSE array() END"
    )


def documents_as_audio_assets(docs: DataFrame, rate: int = 16000) -> DataFrame:
    """Adapt documents into fake-audio binary assets (payload carries the
    self-describing FAKEAUD header; n_samples derived from n_chars) so
    the audio decode path is driver-verifiable without codec libraries."""
    n_samples = (F.lit(8000) + F.col("n_chars") * 10).cast("long")
    payload = F.concat(
        F.lit("FAKEAUD:"), F.lit(str(rate)), F.lit(":"),
        n_samples.cast("string"), F.lit(":pcm"),
    ).cast("binary")
    return docs.select("doc_id", payload.alias("payload"))


def segment_audio(assets: DataFrame, seg_samples: int = 16000) -> DataFrame:
    """Fixed-duration audio segmentation over binary payloads: decode the
    (rate, n_samples) header per asset inside an Arrow-batched
    mapInPandas, emit one row per segment (last one partial) — the
    standard pre-training splitter for speech corpora. Row expansion
    happens Python-side (bounded by n_samples/seg_samples per asset);
    partitioning of the input carries through, no shuffle."""
    out_schema = (
        "doc_id long, seg_idx long, start_sample long, seg_len long, sample_rate long"
    )

    # Self-contained closure (shipped by value — see extract_features):
    # the header parse is inlined rather than calling the module-level
    # decode_audio, which would make cloudpickle serialize by REFERENCE
    # and require this package on the executor workers' import path.
    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        magic = b"FAKEAUD:"

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if not b.startswith(magic):
                    raise NotImplementedError(
                        "real audio decoding requires a codec library not "
                        "present in this environment"
                    )
                rate_b, n_b, _rest = b[len(magic):].split(b":", 2)
                rate, n = int(rate_b), int(n_b)
                for i, start in enumerate(range(0, n, seg_samples)):
                    rows.append(
                        (int(doc_id), i, start, min(seg_samples, n - start), rate)
                    )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "seg_idx", "start_sample", "seg_len", "sample_rate"],
            )

    return assets.mapInPandas(_segment, schema=out_schema)
