"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself needs codec libraries that are not in this
container, so it is STUBBED behind ``decode_available()`` — everything
Spark-side (schema, partitioning, UDF signature, batch shape) is real
and tested. A deployment swaps ``_decode_image_real`` for a PIL/ffmpeg
call without touching the plumbing.

Design for 100 TB of media:
- binary payloads stay in their own column so Parquet column pruning
  skips them unless the query touches pixels;
- feature extraction runs in ``mapInPandas`` over Arrow batches — one
  Python crossing per batch, not per row;
- derived features land in narrow typed columns so downstream
  analytics never reshuffle the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_available() -> bool:
    """True when a real image codec is importable."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_real(payload: bytes) -> dict:
    """Real decode: PNG through the hermetic stdlib codec
    (``pngcodec.py`` — round-5), baseline JPEG through the hermetic
    T.81 codec (``jpegcodec.py`` — round-9) — both with a TRUE mean
    pixel and a real pixel-derived 64-bit average-hash. PIL, when
    importable (the ``[multimodal]`` extra), takes the non-PNG formats
    first (it also covers progressive JPEG and WEBP). Only formats no
    hermetic or installed codec can read stay behind the narrow
    NotImplementedError seam."""
    from leader_graph_spark.operators import jpegcodec, pngcodec

    if payload[:8] == pngcodec.PNG_MAGIC:
        w, h, ch, px = pngcodec.decode_png(payload)
        return {
            "mean_pixel": sum(px) / len(px) / 255.0,
            "phash": pngcodec.average_hash(px, w, h, ch),
            "n_bytes": len(payload),
        }
    try:
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        px = img.tobytes()
        return {
            "mean_pixel": sum(px) / len(px) / 255.0,
            "phash": hashlib.md5(px).hexdigest()[:16],
            "n_bytes": len(payload),
        }
    except ImportError:
        pass
    if payload[:2] == jpegcodec.JPEG_MAGIC:
        w, h, ch, px = jpegcodec.decode_jpeg(payload)
        return {
            "mean_pixel": sum(px) / len(px) / 255.0,
            "phash": pngcodec.average_hash(px, w, h, ch),
            "n_bytes": len(payload),
        }
    raise NotImplementedError(
        "image format without a hermetic codec requires PIL/opencv "
        "(pip install leader-graph-spark[multimodal])"
    )


def _decode_image_fake(payload: bytes) -> dict:
    """Deterministic fake decode: derives stable pseudo-features from
    the payload bytes so tests exercise the full plumbing."""
    digest = hashlib.md5(payload).digest()
    return {
        "mean_pixel": digest[0] / 255.0,
        "phash": digest.hex()[:16],
        "n_bytes": len(payload),
    }


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("phash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_fake_payloads(df: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal table from a text table: payload = utf-8 bytes
    (opaque binary stand-in), typed metadata derived deterministically."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.element_at(F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")), (F.col(id_col) % 3 + 1).cast("int")).alias("format"),
            ((F.col(id_col) % 8 + 1) * 64).cast("int").alias("width"),
            ((F.col(id_col) % 5 + 1) * 64).cast("int").alias("height"),
        ).alias("meta"),
    )


def extract_image_features(
    df: DataFrame, *, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Decode/feature-extract over mapInPandas. Uses the real decoder
    when available, else the deterministic fake (clearly marked)."""
    def decode(payload: bytes) -> dict:
        # per-PAYLOAD routing: PNG (round-5) and baseline JPEG
        # (round-9) decode for real through the hermetic codecs
        # regardless of PIL; remaining formats decode for real only
        # under PIL, else the clearly-marked deterministic fake keeps
        # the plumbing testable.
        from leader_graph_spark.operators.jpegcodec import JPEG_MAGIC
        from leader_graph_spark.operators.pngcodec import PNG_MAGIC

        if (
            payload[:8] == PNG_MAGIC
            or payload[:2] == JPEG_MAGIC
            or decode_available()
        ):
            try:
                return _decode_image_real(payload)
            except ValueError:
                # corrupt/truncated/progressive payload the hermetic
                # codec rejects (e.g. a JPEG-magic blob with no SOS):
                # fall back to the clearly-marked deterministic fake
                # instead of failing the Spark task — the pre-round-9
                # routing contract for undecodable external data
                return _decode_image_fake(payload)
        return _decode_image_fake(payload)

    out_schema = T.StructType([df.schema[id_col]] + list(FEATURE_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(lambda b: decode(bytes(b)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "mean_pixel": feats.map(lambda d: d["mean_pixel"]),
                    "phash": feats.map(lambda d: d["phash"]),
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    *,
    id_col: str,
    payload_col: str = "payload",
    meta_col: str = "meta",
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Resize step of the media pipeline (model-input normalization).
    The pixel transform is behind the same codec seam as decode — real
    deployments call PIL/opencv here — but everything the engine is
    responsible for is real: the payload column is REPLACED (a resized
    blob, here a deterministic digest-derived stand-in of plausible
    size), the metadata struct is rewritten to the target dimensions
    with the original size preserved, and the work is a map-side
    ``mapInPandas`` — no shuffle, blobs never leave their partition.
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "meta",
                T.StructType(
                    list(IMAGE_META_SCHEMA.fields)
                    + [
                        T.StructField("orig_width", T.IntegerType()),
                        T.StructField("orig_height", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            from leader_graph_spark.operators import pngcodec

            for rid, payload, meta in zip(pdf[id_col], pdf[payload_col], pdf[meta_col]):
                raw = bytes(payload)
                real = None
                try:
                    if raw[:8] == pngcodec.PNG_MAGIC:
                        # REAL resize path (round-5): stdlib PNG decode →
                        # nearest-neighbor resample → re-encode. Actual
                        # source dimensions override the metadata claim.
                        w, h, ch, px = pngcodec.decode_png(raw)
                        real = (
                            pngcodec.encode_png(
                                target_w,
                                target_h,
                                pngcodec.resize_nearest(px, w, h, ch, target_w, target_h),
                                channels=ch,
                            ),
                            w,
                            h,
                        )
                    elif decode_available():
                        # REAL non-PNG path (JPEG/WEBP…) under the
                        # [multimodal] extra: PIL decode → nearest resample
                        # (deterministic) → re-encode in the source format.
                        import io

                        from PIL import Image

                        img = Image.open(io.BytesIO(raw))
                        fmt = img.format or "JPEG"
                        ow, oh = img.size
                        out = io.BytesIO()
                        img.convert("RGB").resize(
                            (target_w, target_h), Image.NEAREST
                        ).save(out, format=fmt)
                        real = (out.getvalue(), ow, oh)
                    elif raw[:2] == b"\xff\xd8":
                        # REAL JPEG path without PIL (round-9): hermetic
                        # baseline T.81 decode → nearest resample →
                        # hermetic re-encode.
                        from leader_graph_spark.operators import jpegcodec

                        w, h, ch, px = jpegcodec.decode_jpeg(raw)
                        real = (
                            jpegcodec.encode_jpeg(
                                target_w,
                                target_h,
                                pngcodec.resize_nearest(px, w, h, ch, target_w, target_h),
                                channels=ch,
                                quality=90,
                            ),
                            w,
                            h,
                        )
                except ValueError:
                    # corrupt/truncated payload the codec rejects:
                    # fall to the deterministic stand-in rather than
                    # failing the Spark task
                    real = None
                if real is not None:
                    resized, orig_w, orig_h = real
                else:
                    # deterministic stand-in: digest-seeded bytes scaled
                    # to ~3 bytes/pixel of the TARGET size so downstream
                    # size accounting behaves like a real resize.
                    seed = hashlib.md5(raw + f"|{target_w}x{target_h}".encode()).digest()
                    resized = (seed * (target_w * target_h * 3 // len(seed) + 1))[
                        : target_w * target_h * 3
                    ]
                    orig_w, orig_h = meta["width"], meta["height"]
                rows.append(
                    (
                        rid,
                        resized,
                        {
                            "format": meta["format"],
                            "width": target_w,
                            "height": target_h,
                            "orig_width": orig_w,
                            "orig_height": orig_h,
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload", "meta"])

    return df.select(id_col, payload_col, meta_col).mapInPandas(run, out_schema)


FRAME_SCHEMA_FIELDS = [
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("frame_phash", T.StringType()),
]


def sample_video_frames(
    df: DataFrame,
    *,
    id_col: str,
    payload_col: str = "payload",
    n_frames: int = 4,
    fps: int = 25,
    frame_bytes: int = 32,
) -> DataFrame:
    """Frame sampling for video blobs: one input row fans out to
    ``n_frames`` rows at UNIFORM stride over the clip (the standard
    training-data sampling policy), each with its frame index, its
    timestamp from the frame rate, and a per-frame fingerprint. The
    blob is modeled as a sequence of fixed-size frames (real codecs
    replace the slicing, not the shape); short clips yield every frame
    they have. flatMap-shaped ``mapInPandas`` — map-side, one Python
    crossing per Arrow batch, and only the NARROW frame rows continue
    downstream (the blob is dropped right here, which is the point:
    per-frame analytics never reshuffle video bytes).
    """
    out_schema = T.StructType([df.schema[id_col]] + FRAME_SCHEMA_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                total = max(len(raw) // frame_bytes, 1)
                k = min(n_frames, total)
                # uniform stride, first frame always included
                idxs = sorted({(i * total) // k for i in range(k)})
                for fi in idxs:
                    frame = raw[fi * frame_bytes : (fi + 1) * frame_bytes]
                    rows.append(
                        (
                            rid,
                            fi,
                            fi * 1000 // fps,
                            hashlib.md5(frame).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "ts_ms", "frame_phash"])

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


AUDIO_WINDOW_FIELDS = [
    T.StructField("window_idx", T.IntegerType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("peak", T.IntegerType()),
    T.StructField("zero_crossings", T.IntegerType()),
]


def audio_window_stats(
    df: DataFrame,
    *,
    id_col: str,
    payload_col: str = "payload",
    window_samples: int = 64,
) -> DataFrame:
    """Windowed PCM statistics for audio blobs — the energy/activity
    features a training pipeline gates speech data on (silence
    trimming, clipping detection, voice-activity heuristics). The blob
    is modeled as offset-binary 16-bit big-endian PCM; real audio
    codecs (wav/mp3 via soundfile/ffmpeg) slot in at the same decode
    seam as the image path. Per non-overlapping window of
    ``window_samples`` samples: sum of squares (energy, exact int64),
    absolute peak, and the zero-crossing count (adjacent-sample sign
    products < 0, within the window only). All-integer outputs so the
    SQL oracle can reproduce them byte-exactly — no float tolerance.

    flatMap-shaped ``mapInPandas``: map-side, one numpy pass per clip,
    and only the narrow window rows continue downstream — audio bytes
    never reshuffle (the same 100 TB rule as image/video)."""
    import numpy as np

    out_schema = T.StructType([df.schema[id_col]] + AUDIO_WINDOW_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                usable = len(raw) // 2 * 2
                s = np.frombuffer(raw[:usable], dtype=">u2").astype(np.int64) - 32768
                for w0 in range(0, len(s), window_samples):
                    win = s[w0 : w0 + window_samples]
                    rows.append(
                        (
                            rid,
                            w0 // window_samples,
                            int((win * win).sum()),
                            int(np.abs(win).max()),
                            int((win[1:] * win[:-1] < 0).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "window_idx", "sum_sq", "peak", "zero_crossings"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)
