"""Multimodal columns: opaque binary media + typed metadata (EXT).

The 100 TB training-data pattern: image/audio/video payloads ride as
``binary`` columns next to typed metadata structs; decode / feature
extraction / resize / frame sampling run as Arrow-batched
``mapInPandas`` stages so each executor processes whole record batches
without per-row Python overhead, and fan-out stages (frame sampling)
change the batch shape 1→N inside the same Arrow pass.

No image/audio codec libraries exist in this environment, so the
decode kernels are import-gated: the real path raises
``NotImplementedError`` without Pillow, and a **deterministic fake
decoder** (metadata + hash-derived statistics) stands in for tests —
the Spark-side plumbing (schemas, UDF signatures, Arrow batch shapes,
partitioning) is the real, tested part.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # type: ignore
except ImportError:
    Image = None

#: Media corpus schema: opaque payload + typed metadata (never decode
#: into columns until a stage needs to).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def synth_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media corpus: payload bytes are a
    hash-chain keyed by media_id (stable across runs/engines), metadata
    follows from the id — no RNG anywhere."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = b"".join(
            hashlib.md5(f"{i}:{j}".encode()).digest() for j in range(8 + i % 5)
        )
        meta = {
            "width": 64 + (i % 8) * 16 if kind == "image" else None,
            "height": 48 + (i % 8) * 12 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + (i % 10) * 500 if kind != "image" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SF-PROPORTIONAL media corpus derived from the driver's documents
    table (r7 VERDICT item #3): one media row per document, media_id =
    doc_id, payload/metadata a pure function of the id — byte-identical
    to ``synth_media_df`` for the same id (pinned in
    tests/test_multimodal.py), so the goldens transfer.

    Scale shape: everything is JVM-side column expressions over the
    documents scan (md5 → unhex hash-chain for the payload, modular
    arithmetic for metadata) — no driver-side row building, so the
    corpus construction itself scales with the table. At sf0.1 that is
    5,000 media rows; at 100 TB it is one row per document, built where
    the documents live."""
    from .tables import load_table

    mid = F.col("media_id")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("media_id")
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(mid, F.lit(3)) + F.lit(1)).cast("int"),
    )
    # payload = concat of md5 digests "{id}:{j}" for j < 8 + id%5 — the
    # exact hash-chain synth_media_df builds in Python
    n_blocks = (F.lit(8) + F.pmod(mid, F.lit(5))).cast("int")
    blocks = [
        F.when(
            F.lit(j) < n_blocks,
            F.unhex(F.md5(F.concat(mid.cast("string"), F.lit(f":{j}")))),
        ).otherwise(F.lit(b""))
        for j in range(13)
    ]
    is_img = kind == "image"
    meta = F.struct(
        F.when(is_img, (F.lit(64) + F.pmod(mid, F.lit(8)) * 16).cast("int"))
        .alias("width"),
        F.when(is_img, (F.lit(48) + F.pmod(mid, F.lit(8)) * 12).cast("int"))
        .alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(
            ~is_img, (F.lit(1000) + F.pmod(mid, F.lit(10)) * 500).cast("int")
        ).alias("duration_ms"),
        F.when(is_img, F.lit("png"))
        .when(kind == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
    )
    return docs.select(
        "media_id",
        kind.alias("kind"),
        F.concat(*blocks).alias("data"),
        meta.alias("meta"),
    )


def decode_image(data: bytes):  # pragma: no cover - requires Pillow
    """Real decode path — import-gated on Pillow."""
    if Image is None:
        raise NotImplementedError(
            "no image codec available in this environment; stages use "
            "fake_image_stats for deterministic tests"
        )
    import io

    return Image.open(io.BytesIO(data))


def fake_image_stats(data: bytes) -> tuple[float, str]:
    """Deterministic stand-in for pixel statistics: mean payload byte
    and a content hash — same dataflow, no codec."""
    mean = sum(data) / len(data) if data else 0.0
    return mean, hashlib.md5(data).hexdigest()


def real_image_stats(data: bytes) -> tuple[int, int, float, str]:
    """Real decode path: (width, height, mean grayscale pixel, content
    hash) from actual pixels — requires Pillow (``decode_image``)."""
    img = decode_image(bytes(data)).convert("L")
    px = list(img.getdata())
    mean = sum(px) / len(px) if px else 0.0
    return img.width, img.height, mean, hashlib.md5(data).hexdigest()


def extract_image_features(media: DataFrame, use_codec: bool = False) -> DataFrame:
    """Feature-extraction stage: images only, Arrow-batched. The filter
    sits BEFORE the Python boundary so non-image rows never cross.

    ``use_codec=True`` swaps the deterministic fake kernel for the real
    Pillow decode (dims and mean from actual pixels) with the identical
    dataflow — payloads must then be real encoded images. Exercised by
    tests/test_real_deps_integration.py when Pillow is installed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_codec:
                stats = pdf["data"].map(real_image_stats)
                out = {
                    "media_id": pdf["media_id"],
                    "width": stats.map(lambda s: s[0]),
                    "height": stats.map(lambda s: s[1]),
                    "n_bytes": pdf["data"].map(len),
                    "mean_byte": stats.map(lambda s: s[2]),
                    "content_hash": stats.map(lambda s: s[3]),
                }
            else:
                out = {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "n_bytes": pdf["data"].map(len),
                    "mean_byte": pdf["data"].map(lambda d: fake_image_stats(d)[0]),
                    "content_hash": pdf["data"].map(lambda d: fake_image_stats(d)[1]),
                }
            yield pd.DataFrame(out)

    images = media.filter(media.kind == "image").select("media_id", "data", "meta")
    return images.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, use_codec: bool = False
) -> DataFrame:
    """Resize stage: images only, Arrow-batched, 1→1. The pixel kernel
    is stubbed by default (no codec in this environment): the output
    payload is a deterministic hash-chain of (source bytes, target
    dims) sized ``width × height`` bytes — byte-for-byte reproducible,
    so tests pin the full stage contract (schema, batch shape, payload
    size). ``use_codec=True`` runs the real ``decode_image → resize →
    re-encode PNG`` kernel over real encoded payloads (exercised by
    tests/test_real_deps_integration.py when Pillow is installed)."""

    def _fake_resized(data: bytes) -> bytes:
        need = width * height
        out = bytearray()
        seed = hashlib.md5(data + f"{width}x{height}".encode()).digest()
        while len(out) < need:
            out.extend(seed)
            seed = hashlib.md5(seed).digest()
        return bytes(out[:need])

    def _real_resized(data: bytes) -> tuple[int, int, bytes]:
        import io

        img = decode_image(bytes(data))
        sw, sh = img.width, img.height
        buf = io.BytesIO()
        img.resize((width, height)).save(buf, format="PNG")
        return sw, sh, buf.getvalue()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_codec:
                rs = pdf["data"].map(_real_resized)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "src_width": rs.map(lambda r: r[0]),
                        "src_height": rs.map(lambda r: r[1]),
                        "width": width,
                        "height": height,
                        "data": rs.map(lambda r: r[2]),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "src_width": pdf["meta"].map(lambda m: m["width"]),
                        "src_height": pdf["meta"].map(lambda m: m["height"]),
                        "width": width,
                        "height": height,
                        "data": pdf["data"].map(lambda d: _fake_resized(bytes(d))),
                    }
                )

    images = media.filter(media.kind == "image").select("media_id", "data", "meta")
    return images.mapInPandas(batches, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_windows", T.IntegerType(), False),
        T.StructField("mean_amplitude", T.DoubleType(), False),
        T.StructField("peak_window", T.IntegerType(), False),
    ]
)


def fake_audio_windows(data: bytes, window_bytes: int = 32) -> list[float]:
    """Deterministic stand-in for per-window RMS amplitude: mean byte of
    each fixed-size payload window (a real decoder would emit PCM RMS
    per hop — same dataflow, no codec)."""
    return [
        sum(w) / len(w)
        for i in range(0, len(data), window_bytes)
        if (w := data[i : i + window_bytes])
    ]


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio feature-extraction stage: windowed amplitude statistics,
    Arrow-batched, kind-filter pushed before the Python boundary (same
    contract as the image stage — the codec is stubbed, the Spark-side
    schema/partitioning/batch shape is real)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            win = pdf["data"].map(lambda d: fake_audio_windows(bytes(d)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pdf["meta"].map(lambda m: m["sample_rate"]),
                    "duration_ms": pdf["meta"].map(lambda m: m["duration_ms"]),
                    "n_windows": win.map(len),
                    "mean_amplitude": win.map(
                        lambda ws: sum(ws) / len(ws) if ws else 0.0
                    ),
                    "peak_window": win.map(
                        lambda ws: max(range(len(ws)), key=ws.__getitem__)
                        if ws
                        else 0
                    ),
                }
            )

    audio = media.filter(media.kind == "audio").select("media_id", "data", "meta")
    return audio.mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling stage: 1→N fan-out inside the Arrow pass — one
    output row per sampled timestamp, frame payload stubbed as a
    deterministic hash of (payload, ts)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, data, meta in zip(
                pdf["media_id"], pdf["data"], pdf["meta"]
            ):
                duration = meta["duration_ms"] or 0
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    fh = hashlib.md5(bytes(data) + ts.to_bytes(4, "little"))
                    rows.append((int(media_id), idx, ts, fh.hexdigest()))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_hash"]
            )

    videos = media.filter(media.kind == "video").select("media_id", "data", "meta")
    return videos.mapInPandas(batches, schema=FRAME_SCHEMA)
