"""Pure-stdlib PNG/WAV codecs + the strict multimodal decode path.

These prove the strict path is REAL: genuine zlib streams, CRC checks,
scanline unfiltering, RIFF parsing — no fakes anywhere in the loop.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from logpump_spark.llmdata.codecs import (
    PNG_SIGNATURE,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)

CH = {"L": 1, "RGB": 3, "RGBA": 4}


@pytest.mark.parametrize(
    "w,h,mode", [(1, 1, "L"), (5, 3, "RGB"), (16, 9, "RGBA"), (200, 1, "L"), (1, 64, "RGB")]
)
def test_png_roundtrip(w, h, mode):
    payload = encode_png(w, h, mode)
    d = decode_png(payload)
    assert (d["width"], d["height"], d["mode"]) == (w, h, mode)
    expected = bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(CH[mode])
    )
    assert d["pixels"] == expected


def test_png_all_filter_types_unfilter_correctly():
    # hand-encode one scanline per filter type (0..4) and check the
    # decoder reconstructs the exact pixel bytes
    w, h = 4, 5
    px = [[(x * 11 + y * 3) % 256 for x in range(w)] for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for y, ftype in enumerate(range(5)):
        raw.append(ftype)
        line, prev = px[y], (px[y - 1] if y else [0] * w)
        for i in range(w):
            left = line[i - 1] if i else 0
            ul = prev[i - 1] if i else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] - left
            elif ftype == 2:
                v = line[i] - prev[i]
            elif ftype == 3:
                v = line[i] - (left + prev[i]) // 2
            else:
                v = line[i] - paeth(left, prev[i], ul)
            raw.append(v & 0xFF)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    payload = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    d = decode_png(payload)
    assert d["pixels"] == bytes(v for row in px for v in row)


def test_png_rejects_bad_bytes():
    good = encode_png(4, 4, "L")
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # flip one IDAT byte: CRC must catch it
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated


def test_wav_roundtrip_and_size_formula():
    samples = [(i * 257) % 1024 - 512 for i in range(75)]
    payload = encode_wav(22050, samples)
    assert len(payload) == 44 + 2 * len(samples)
    d = decode_wav(payload)
    assert d["sample_rate"] == 22050
    assert d["n_samples"] == 75
    assert d["channels"] == 1 and d["bits"] == 16
    assert d["samples"] == samples
    assert d["duration_ms"] == 75 * 1000 // 22050
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxx")


def test_strict_spark_decode_real_png(spark):
    from pyspark.sql import functions as F

    from logpump_spark.llmdata.multimodal import (
        decode_image_features,
        synthesize_png_media,
    )

    df = spark.range(12).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("source"),
        (1 + F.col("id") % 7).alias("w"),
        (2 + F.col("id") % 5).alias("h"),
        F.when(F.col("id") % 2 == 0, "L").otherwise("RGB").alias("m"),
    )
    media = synthesize_png_media(df, "doc_id", "w", "h", "m", "source")
    feats = {r.media_id: r for r in decode_image_features(media, strict=True).collect()}
    assert len(feats) == 12
    for i in range(12):
        assert feats[i].width == 1 + i % 7
        assert feats[i].height == 2 + i % 5
        assert feats[i].mode == ("L" if i % 2 == 0 else "RGB")
        assert feats[i].decoder in ("png", "pil")
        assert feats[i].n_bytes > 50  # real container overhead, not raw text


def test_strict_spark_decode_real_wav(spark):
    from pyspark.sql import functions as F

    from logpump_spark.llmdata.multimodal import (
        decode_audio_features,
        synthesize_wav_media,
    )

    df = spark.range(8).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("source"),
        F.when(F.col("id") % 2 == 0, 16000).otherwise(8000).alias("rate"),
        (10 + F.col("id") * 3).alias("n"),
    )
    media = synthesize_wav_media(df, "doc_id", "rate", "n", "source")
    feats = {r.media_id: r for r in decode_audio_features(media, strict=True).collect()}
    for i in range(8):
        n = 10 + i * 3
        rate = 16000 if i % 2 == 0 else 8000
        assert feats[i].n_samples == n
        assert feats[i].sample_rate == rate
        assert feats[i].n_bytes == 44 + 2 * n
        assert feats[i].duration_ms == n * 1000 // rate
        assert feats[i].decoder in ("wav", "soundfile")


def _media_df(spark, payload: bytes, kind: str):
    from pyspark.sql import functions as F

    return spark.range(1).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(bytearray(payload)).alias("payload"),
        F.struct(
            F.lit("t").alias("source"), F.lit(len(payload)).cast("long").alias("n_bytes")
        ).alias("meta"),
    )


def test_corrupt_png_falls_through_not_raises(spark):
    # a payload carrying the PNG signature but garbage chunks is outside
    # the stdlib codec's subset: strict=False must fall through to the
    # fake (never raise); strict=True must raise
    from logpump_spark.llmdata.codecs import PNG_SIGNATURE
    from logpump_spark.llmdata.multimodal import decode_image_features

    bad = PNG_SIGNATURE + b"\x00garbage-not-chunks\xff" * 3
    media = _media_df(spark, bad, "image")
    rows = decode_image_features(media, strict=False).collect()
    assert rows[0].decoder in ("fake", "pil")
    with pytest.raises(Exception):
        decode_image_features(media, strict=True).collect()


def test_non_wave_riff_falls_through_not_raises(spark):
    # RIFF container that is not WAVE (e.g. AVI): strict=False -> fake,
    # strict=True -> raise (previously raised unconditionally)
    from logpump_spark.llmdata.multimodal import decode_audio_features

    avi = b"RIFF" + (1000).to_bytes(4, "little") + b"AVI LIST" + b"\x00" * 32
    media = _media_df(spark, avi, "audio")
    rows = decode_audio_features(media, strict=False).collect()
    assert rows[0].decoder in ("fake", "soundfile")
    with pytest.raises(Exception):
        decode_audio_features(media, strict=True).collect()


def test_zero_rate_wav_duration_guard(spark):
    # a fmt chunk may declare sample_rate 0: decode returns rate 0 and
    # the caller must emit duration 0, not ZeroDivisionError
    from logpump_spark.llmdata.multimodal import decode_audio_features

    payload = encode_wav(0, [1, 2, 3, 4])
    media = _media_df(spark, payload, "audio")
    rows = decode_audio_features(media, strict=False).collect()
    assert rows[0].decoder == "wav"
    assert rows[0].sample_rate == 0
    assert rows[0].n_samples == 4
    assert rows[0].duration_ms == 0
