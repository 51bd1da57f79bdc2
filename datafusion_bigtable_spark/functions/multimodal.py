"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The wide-column cells model already carries arbitrary bytes (a qualifier
declared ``binary`` passes raw cell values through — config.py ColumnSpec),
so multimodal payloads ride the same storage path as every other column.
What this module adds is the compute plumbing a 100 TB media pipeline
needs on Spark:

- a canonical asset schema (payload + mime + metadata),
- ``extract_features`` / ``decode_image`` / ``sample_frames`` operators as
  ``mapInPandas`` stages: executors stream Arrow batches through pandas,
  so memory is bounded by batch size, not partition size, and the ops
  parallelize per input split like any scan,
- real codecs STUBBED: PIL/ffmpeg/torchaudio are not in this container,
  so decode raises ``NotImplementedError`` unless ``fake=True``
  (deterministic metadata derived from the bytes) — the Spark-side
  plumbing (schema, partitioning, UDF signature, batch shape) is real
  and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into binary assets (UTF-8 payload standing
    in for encoded media) — lets the plumbing run on driver testdata."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def synthesize_media_assets(docs: DataFrame) -> DataFrame:
    """REAL media containers from the documents table: every doc becomes a
    valid minimal PNG / JPEG / WAV (by doc_id mod 3) whose header metadata
    derives ARITHMETICALLY from doc_id — so the downstream header parse is
    genuine container decoding AND an SQL oracle can recompute the
    expected metadata.  The text bytes ride along as the container body
    (the part a full decoder would decompress; header parsing never reads
    it)."""
    from datafusion_bigtable_spark.functions.media_codecs import build_jpeg, build_png, build_wav

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"asset_id": [], "mime": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                body = (text or "").encode("utf-8")
                kind = i % 3
                if kind == 0:
                    payload, mime = build_png(16 + i % 241, 16 + (i * 7) % 241, body), "image/png"
                elif kind == 1:
                    payload, mime = build_jpeg(16 + i % 241, 16 + (i * 7) % 241, body), "image/jpeg"
                else:
                    payload, mime = build_wav(8000 + (i % 8) * 1000, 1 + i % 2, body), "audio/wav"
                rows["asset_id"].append(i)
                rows["mime"].append(mime)
                rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(op, ASSET_SCHEMA)


def _decode_dims(payload: bytes) -> tuple[int, int]:
    """STUB for a real image decode.  Deterministic fake dimensions from a
    stable digest, so tests and oracles are reproducible."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 241, 16 + d[1] % 241


def extract_features(assets: DataFrame, *, fake: bool = True, mode: str | None = None) -> DataFrame:
    """Binary payload → typed metadata row per asset via mapInPandas.

    Modes (``mode`` wins over the legacy ``fake`` flag):
    - ``"headers"`` — REAL container parsing (PNG IHDR / JPEG SOF / WAV
      fmt, functions/media_codecs.py) — pure Python, no media libs; the
      metadata tier a curation pipeline filters on before decoding pixels.
    - ``"fake"`` — digest-derived stub dims (for non-container payloads).
    - ``"full"`` — pixel/sample decode; requires PIL/ffmpeg, which are not
      in this container → NotImplementedError (the remaining honest stub).

    Arrow-batched: each pandas chunk is one Arrow batch (~10k rows), so an
    executor never holds more than a batch of payloads in Python memory.
    """
    mode = mode or ("fake" if fake else "full")

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        from datafusion_bigtable_spark.functions.media_codecs import parse_media

        for pdf in batches:
            if mode == "full":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in this container); "
                    "use mode='headers' for real container-header parsing"
                )
            payloads = pdf["payload"]
            out = {
                "asset_id": pdf["asset_id"],
                "mime": pdf["mime"],
                "byte_len": payloads.map(lambda b: len(b) if b is not None else None),
                "sha256": payloads.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest() if b is not None else None
                ),
            }
            if mode == "headers":
                meta = payloads.map(lambda b: parse_media(bytes(b)) if b is not None else {})
                out["mime"] = meta.map(lambda m: m.get("mime", "application/octet-stream"))
                for f in ("width", "height", "sample_rate", "channels"):
                    out[f] = meta.map(lambda m, f=f: m.get(f))
            else:
                dims = payloads.map(
                    lambda b: _decode_dims(bytes(b)) if b is not None else (None, None)
                )
                out["width"] = dims.map(lambda t: t[0])
                out["height"] = dims.map(lambda t: t[1])
                out["sample_rate"] = None
                out["channels"] = None
            yield pd.DataFrame(out)

    return assets.mapInPandas(op, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("scale_x", T.DoubleType(), True),
        T.StructField("scale_y", T.DoubleType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize_images(
    assets: DataFrame, width: int = 64, height: int = 64, mode: str = "fake"
) -> DataFrame:
    """Image resize over binary asset columns — the standard normalization
    step before a vision encoder.

    The Spark-side plumbing is REAL and tested: Arrow-batched mapInPandas
    (an executor holds one batch of payloads, never the column), typed
    output schema, source dimensions from the REAL container-header parse
    (media_codecs.py) with the scale factors a resampler would use.  The
    PIXEL resample itself is the honest stub, exactly like
    extract_features' decode tier:
    - ``mode="fake"`` — deterministic digest-expanded payload of exactly
      width·height·3 bytes (a stand-in RGB buffer; reproducible, so tests
      can pin batch shapes and sizes).
    - ``mode="full"`` — requires PIL, not in this container →
      NotImplementedError.
    """
    if width <= 0 or height <= 0:
        raise ValueError("target width/height must be positive")

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        from datafusion_bigtable_spark.functions.media_codecs import parse_media

        n_bytes = width * height * 3
        for pdf in batches:
            if mode == "full":
                raise NotImplementedError(
                    "real pixel resample requires PIL (not in this container); "
                    "use mode='fake' — header parsing and scale math stay real"
                )
            rows = {k: [] for k in ("asset_id", "src_width", "src_height",
                                    "width", "height", "scale_x", "scale_y", "resized")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                meta = parse_media(bytes(payload)) if payload is not None else {}
                sw, sh = meta.get("width"), meta.get("height")
                rows["asset_id"].append(aid)
                rows["src_width"].append(sw)
                rows["src_height"].append(sh)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["scale_x"].append(width / sw if sw else None)
                rows["scale_y"].append(height / sh if sh else None)
                if payload is None:
                    rows["resized"].append(None)
                else:
                    # digest-expanded deterministic stand-in pixel buffer
                    seed = hashlib.sha256(bytes(payload)).digest()
                    reps = (n_bytes + len(seed) - 1) // len(seed)
                    rows["resized"].append((seed * reps)[:n_bytes])
            yield pd.DataFrame(rows)

    return assets.mapInPandas(op, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(assets: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Video-style frame sampling STUB: chunk the payload every N bytes
    (standing in for ffmpeg keyframe extraction), capped at max_frames.
    One input row → up to max_frames output rows; mapInPandas keeps the
    fan-out executor-side and Arrow-batched."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame"].append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(out)

    return assets.mapInPandas(op, FRAME_SCHEMA)
