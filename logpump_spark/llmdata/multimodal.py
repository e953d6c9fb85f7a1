"""Multimodal columns: images/audio/video as opaque binary payloads with
typed metadata, processed by Arrow-batched Pandas UDFs.

Decode resolution order, per payload format:

1. magic-byte-matched PNG/WAV payloads use the pure-stdlib codecs in
   ``codecs.py`` FIRST — a REAL decode (chunk walk, CRC check, zlib
   inflate, scanline unfilter / RIFF parse) whose decoder column is
   environment-independent, so ``strict=True`` is an exercised path in
   this dependency-free container, not an aspirational one;
2. payloads the stdlib codec cannot read (other formats, or PNG/RIFF
   variants outside its subset — 16-bit, interlaced, WebP/AVI RIFF)
   fall through to PIL / soundfile when importable;
3. with ``strict=False`` only, a clearly-marked deterministic fake for
   payloads no decoder understands; ``strict=True`` raises instead —
   but ``strict=False`` NEVER raises, whatever the payload.

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

from .codecs import PNG_SIGNATURE, decode_png, decode_wav, encode_png, encode_wav

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
    mode) from payload bytes.  Reached only with strict=False for
    payloads in formats neither PIL nor the stdlib PNG codec can read
    (e.g. text standing in for media in plumbing tests); the decoder
    column marks these rows 'fake'."""
    n = len(payload)
    width = 64 + (n % 193)
    height = 64 + ((n * 31) % 129)
    mode = "RGB" if n % 2 == 0 else "L"
    return width, height, mode


def decode_image_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Extract image features via mapInPandas (Arrow batches).

    PNG-signature payloads take the stdlib decoder FIRST (CRC walk,
    inflate, unfilter; decoder column 'png' in any environment); a PNG
    outside its subset (16-bit, interlaced, corrupt) falls through to
    PIL when importable, then to the strict-raise/fake logic — so
    strict=False never raises.  Non-PNG formats go straight to PIL,
    then the same strict/fake tail.
    """

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        try:  # broad-coverage decoder if the runtime has it
            import io

            from PIL import Image

            def pil_decode(p: bytes) -> tuple[int, int, str, str]:
                img = Image.open(io.BytesIO(p))
                return img.width, img.height, img.mode, "pil"

        except ImportError:
            pil_decode = None

        def decode(p: bytes) -> tuple[int, int, str, str]:
            # stdlib codec FIRST for formats it understands: the decoder
            # column stays 'png' whether or not PIL is installed, so
            # oracle-checked results are environment-independent
            if p[:8] == PNG_SIGNATURE:
                try:
                    d = decode_png(p)
                    return d["width"], d["height"], d["mode"], "png"
                except Exception:
                    pass  # outside the stdlib subset -> PIL / strict / fake
            if pil_decode is not None:
                try:
                    return pil_decode(p)
                except Exception:
                    if strict:
                        raise
            if strict:
                raise ValueError(
                    "strict decode: no decoder (stdlib PNG subset, PIL) "
                    "could read this payload"
                )
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


RESIZED_SCHEMA = (
    "media_id long, src_width int, src_height int, width int, height int, "
    "mode string, pixel_sum long"
)


def resize_image_features(
    media: DataFrame, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """Nearest-neighbor thumbnail resize over REAL decoded pixels — the
    preprocessing step a vision-language pipeline runs before feature
    extraction (fixed input resolution).

    Decodes each PNG payload with the stdlib codec (raising on non-PNG:
    resize is only meaningful on pixels we actually have), maps target
    pixel (x, y) to source pixel (x*w // tw, y*h // th) — the integer
    floor convention, so the oracle can replay it exactly — and emits
    the resized dimensions plus the integer sum of all resized channel
    bytes as the content witness.  The resized pixel block itself stays
    executor-side; only O(1) features leave the UDF.

    Scale shape: identical to the decode path — Arrow record batches
    through mapInPandas, numpy fancy-indexing per payload (no per-pixel
    Python loop), no shuffle introduced."""

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def resize(p: bytes) -> tuple[int, int, int, int, str, int]:
            d = decode_png(p)
            w, h, mode = d["width"], d["height"], d["mode"]
            nch = len(d["pixels"]) // (w * h)
            arr = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, nch)
            sx = (np.arange(target_w) * w) // target_w
            sy = (np.arange(target_h) * h) // target_h
            resized = arr[sy][:, sx]
            return (
                w,
                h,
                target_w,
                target_h,
                mode,
                int(resized.sum(dtype=np.int64)),
            )

        for pdf in it:
            out = [resize(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_width": [o[0] for o in out],
                    "src_height": [o[1] for o in out],
                    "width": [o[2] for o in out],
                    "height": [o[3] for o in out],
                    "mode": [o[4] for o in out],
                    "pixel_sum": [o[5] for o in out],
                }
            )

    return media.mapInPandas(_batches, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sample_rate int, n_samples long, "
    "duration_ms long, decoder string"
)


def decode_audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Audio twin of decode_image_features: RIFF/WAVE payloads take the
    stdlib RIFF parse FIRST (decoder column 'wav' in any environment);
    non-WAVE RIFF containers (WebP, AVI, RF64) and malformed chunks fall
    through to soundfile when importable, then to the strict-raise/fake
    logic — so strict=False never raises."""

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        try:
            import io

            import soundfile

            def sf_decode(p: bytes) -> tuple[int, int, str]:
                with soundfile.SoundFile(io.BytesIO(p)) as f:
                    return f.samplerate, len(f), "soundfile"

        except ImportError:
            sf_decode = None

        def decode(p: bytes) -> tuple[int, int, str]:
            # stdlib RIFF parse first, same environment-independence
            # contract as the PNG path
            if p[:4] == b"RIFF":
                try:
                    d = decode_wav(p)
                    return d["sample_rate"], d["n_samples"], "wav"
                except Exception:
                    pass  # non-WAVE RIFF / malformed -> soundfile / strict / fake
            if sf_decode is not None:
                try:
                    return sf_decode(p)
                except Exception:
                    if strict:
                        raise
            if strict:
                raise ValueError(
                    "strict decode: no decoder (stdlib WAV parse, soundfile) "
                    "could read this payload"
                )
            n = len(p)
            return (16000 if n % 2 == 0 else 22050), n * 4, "fake"

        for pdf in it:
            payloads = [bytes(p) for p in pdf["payload"]]
            decoded = [decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "sample_rate": [d[0] for d in decoded],
                    "n_samples": [d[1] for d in decoded],
                    # rate 0 (declarable in a fmt chunk) -> duration 0,
                    # not ZeroDivisionError
                    "duration_ms": [d[1] * 1000 // d[0] if d[0] else 0 for d in decoded],
                    "decoder": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(_batches, AUDIO_FEATURES_SCHEMA)


def synthesize_png_media(df: DataFrame, id_col: str, width_col: str, height_col: str, mode_col: str, source_col: str) -> DataFrame:
    """Build REAL PNG payloads from per-row dimensions via mapInPandas —
    the test/demo producer for the decode path (the encoder is the
    stdlib codec, so the payloads are genuine zlib-compressed PNGs)."""

    cols = df.select(
        F.col(id_col).alias("media_id"),
        F.col(width_col).cast("int").alias("w"),
        F.col(height_col).cast("int").alias("h"),
        F.col(mode_col).alias("m"),
        F.col(source_col).alias("source"),
    )

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = [
                encode_png(int(w), int(h), str(m))
                for w, h, m in zip(pdf["w"], pdf["h"], pdf["m"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                    "source": pdf["source"],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = cols.mapInPandas(
        _batches,
        "media_id long, kind string, payload binary, source string, n_bytes long",
    )
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct("source", "n_bytes").alias("meta"),
    )


def synthesize_wav_media(df: DataFrame, id_col: str, rate_col: str, n_samples_col: str, source_col: str) -> DataFrame:
    """Build REAL PCM16 WAV payloads (deterministic triangle-ish samples)
    from per-row (sample_rate, n_samples)."""

    cols = df.select(
        F.col(id_col).alias("media_id"),
        F.col(rate_col).cast("int").alias("rate"),
        F.col(n_samples_col).cast("int").alias("n"),
        F.col(source_col).alias("source"),
    )

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = [
                encode_wav(int(r), [(i * 257) % 1024 - 512 for i in range(int(n))])
                for r, n in zip(pdf["rate"], pdf["n"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["audio"] * len(payloads),
                    "payload": payloads,
                    "source": pdf["source"],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = cols.mapInPandas(
        _batches,
        "media_id long, kind string, payload binary, source string, n_bytes long",
    )
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct("source", "n_bytes").alias("meta"),
    )


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


PHASH_SCHEMA = "media_id long, src_width int, src_height int, dhash long"


def dhash_features(media: DataFrame, hash_w: int = 8, hash_h: int = 7) -> DataFrame:
    """Difference-hash (dHash) over REAL decoded pixels — the standard
    perceptual image fingerprint for near-duplicate image dedup: resize
    channel 0 to (hash_w+1) x hash_h with the same nearest-neighbor
    floor map as ``resize_image_features``, then bit (y*hash_w + x) = 1
    iff g[y][x] < g[y][x+1].  8x7 = 56 bits keeps the hash a
    nonnegative int64.  Visually-similar images (crops/resizes of the
    same content) collide; a downstream groupBy on dhash (or a banded
    hamming join, same shape as SimHash bands in dedup.py) yields the
    duplicate clusters.

    Channel 0 stands in for luma: the oracle replays it exactly, and
    for the grayscale mode it IS the luma.  Arrow batches through
    mapInPandas, numpy comparisons per payload, no shuffle introduced."""

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        tw, th = hash_w + 1, hash_h

        def dhash(p: bytes) -> tuple[int, int, int]:
            d = decode_png(p)
            w, h = d["width"], d["height"]
            nch = len(d["pixels"]) // (w * h)
            arr = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, nch)
            sx = (np.arange(tw) * w) // tw
            sy = (np.arange(th) * h) // th
            g = arr[sy][:, sx, 0].astype(np.int64)
            bits = (g[:, :-1] < g[:, 1:]).astype(np.int64)  # (th, hash_w)
            weights = np.int64(1) << (
                np.arange(th)[:, None] * hash_w + np.arange(hash_w)[None, :]
            )
            return (w, h, int((bits * weights).sum()))

        for pdf in it:
            out = [dhash(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_width": [o[0] for o in out],
                    "src_height": [o[1] for o in out],
                    "dhash": [o[2] for o in out],
                }
            )

    return media.mapInPandas(_batches, PHASH_SCHEMA)


AUDIO_FP_SCHEMA = "media_id long, n_samples long, fp long"

_AFP_WINDOWS = 8


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Temporal difference-fingerprint over REAL decoded PCM16 samples —
    the audio twin of ``dhash_features``: split the waveform into 8
    equal windows (floor boundaries), window energy = integer sum of
    |sample|, bit j = energy[j] < energy[j+1] (7 bits).  Robust to
    uniform gain changes (monotone energy comparisons), which is what
    an audio near-dup pass needs.  Arrow batches through mapInPandas,
    numpy per payload, no shuffle introduced."""

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def fp(p: bytes) -> tuple[int, int]:
            d = decode_wav(p)
            s = np.asarray(d["samples"], dtype=np.int64)
            n = len(s)
            # sample i -> window (i*8)//n: the direct integer map both
            # engines express identically (exact for n*8 < 2^53)
            win = (np.arange(n) * _AFP_WINDOWS) // n
            e = np.bincount(win, weights=np.abs(s), minlength=_AFP_WINDOWS).astype(
                np.int64
            )
            bits = (e[:-1] < e[1:]).astype(np.int64)
            return (n, int((bits << np.arange(_AFP_WINDOWS - 1)).sum()))

        for pdf in it:
            out = [fp(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": [o[0] for o in out],
                    "fp": [o[1] for o in out],
                }
            )

    return media.mapInPandas(_batches, AUDIO_FP_SCHEMA)
