"""Multimodal columns: images/audio/video as opaque binary payloads with
typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side plumbing here is real and tested — schema, partitioning,
mapInPandas batch shapes, metadata extraction.  The actual media DECODE is
stubbed: the container has no image/audio libraries, so ``decode_image``
falls back to a clearly-marked deterministic fake when PIL is absent and
raises NotImplementedError when asked for a strict real decode.  Swapping
in a real decoder changes ONE function body, not the pipeline.

Batch shape matters at scale: mapInPandas streams Arrow record batches,
so a 100 TB corpus of ~1 MB payloads flows through Python in bounded
memory chunks (spark.sql.execution.arrow.maxRecordsPerBatch) instead of
row-at-a-time pickling.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "mode string, decoder string"
)


def attach_media(df: DataFrame, id_col: str, payload_text_col: str, kind: str, source_col: str) -> DataFrame:
    """Wrap an existing column as an opaque binary payload with typed
    metadata — the ingestion shape for any media table."""
    payload = F.encode(F.col(payload_text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.col(source_col).alias("source"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic FAKE decode: derives a plausible (width, height,
    mode) from payload bytes.  Stands in for PIL.Image.open until a real
    decoder is available in the runtime."""
    n = len(payload)
    width = 64 + (n % 193)
    height = 64 + ((n * 31) % 129)
    mode = "RGB" if n % 2 == 0 else "L"
    return width, height, mode


def decode_image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Extract image features via mapInPandas (Arrow batches).

    strict=True demands a real decoder and raises NotImplementedError if
    none is importable; strict=False uses the deterministic fake so the
    distributed plumbing stays testable in this container.
    """

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        try:  # real decoder if the runtime has it
            from PIL import Image  # noqa: F401
            import io

            def decode(p: bytes) -> tuple[int, int, str, str]:
                img = Image.open(io.BytesIO(p))
                return img.width, img.height, img.mode, "pil"

        except ImportError:
            if strict:
                raise NotImplementedError(
                    "real image decode requires PIL; install pillow or use strict=False"
                )

            def decode(p: bytes) -> tuple[int, int, str, str]:
                w, h, m = _fake_decode(p)
                return w, h, m, "fake"

        for pdf in it:
            payloads = pdf["payload"]
            decoded = [decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mode": [d[2] for d in decoded],
                    "decoder": [d[3] for d in decoded],
                }
            )

    return media.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sample_rate int, n_samples long, "
    "duration_ms long, decoder string"
)


def decode_audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Audio twin of decode_image_features: mapInPandas feature extraction
    with a deterministic fake decode (sample rate / duration derived from
    payload size) standing in for soundfile/librosa."""

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        try:
            import soundfile  # noqa: F401

            have_real = True
        except ImportError:
            have_real = False
            if strict:
                raise NotImplementedError(
                    "real audio decode requires soundfile; install it or "
                    "use strict=False"
                )

        for pdf in it:
            n_bytes = [len(bytes(p)) for p in pdf["payload"]]
            rate = [16000 if n % 2 == 0 else 22050 for n in n_bytes]
            samples = [n * 4 for n in n_bytes]  # fake: 4 samples per byte
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes,
                    "sample_rate": rate,
                    "n_samples": samples,
                    "duration_ms": [s * 1000 // r for s, r in zip(samples, rate)],
                    "decoder": ["soundfile" if have_real else "fake"] * len(n_bytes),
                }
            )

    return media.mapInPandas(_batches, AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """Frame-sampling shape for video payloads: one output row per sampled
    frame offset.  Pure column ops (sequence+explode) — the decode of each
    frame would plug into decode_image_features downstream."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.select(
        "media_id",
        "kind",
        n.alias("n_bytes"),
        F.posexplode(offsets).alias("frame_no", "byte_offset"),
    )
